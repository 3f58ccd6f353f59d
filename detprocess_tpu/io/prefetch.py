"""Background-thread event prefetching.

The TPU-native replacement for the reference's synchronous
``H5Reader.read_next_event`` loop (processing_data.py:506-705, SURVEY.md
§2.2 "host-side async input pipeline"): a reader thread keeps a bounded
queue of (traces, admin) events filled while the device computes, so HDF5
decompression and disk latency overlap with dispatch instead of
serializing with it.

Used by TriggerProcessing / FeatureProcessing through
``prefetch_events(reader)``; salting injection stays on the consumer side
(it is cheap and must see the final admin dict).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional, Sequence


_SENTINEL = object()


class EventPrefetcher:
    """Iterate (traces, admin) pairs read ahead by a daemon thread.

    Parameters
    ----------
    reader : RawReader (or anything with ``read_next_event``)
    depth : queue capacity in events; bounds host memory at
        depth × trace size.
    channels : optional channel subset forwarded to the reader.
    """

    def __init__(self, reader, depth: int = 32,
                 channels: Optional[Sequence[str]] = None,
                 dtype=None, raw: bool = False):
        self._reader = reader
        self._channels = channels
        self._dtype = dtype
        self._raw = raw
        self._queue: queue.Queue = queue.Queue(maxsize=max(depth, 1))
        self._error: Optional[BaseException] = None
        self._done = False
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        try:
            while not self._stop.is_set():
                if self._raw:
                    # stored-dtype reads (int16 ADC codes stay int16);
                    # admin carries "adc_conv" for on-device conversion
                    kw = {"dtype": None, "adctoamp": False}
                else:
                    kw = ({} if self._dtype is None
                          else {"dtype": self._dtype})
                traces, admin = self._reader.read_next_event(
                    channels=self._channels, **kw)
                if traces is None:
                    break
                # block (rather than drop) when the consumer lags
                while not self._stop.is_set():
                    try:
                        self._queue.put((traces, admin), timeout=0.2)
                        break
                    except queue.Full:
                        continue
        except BaseException as exc:   # surfaced on the consumer side
            self._error = exc
        finally:
            # the sentinel must NEVER be dropped: a full queue while the
            # consumer is busy (e.g. minutes-long first jit compile) would
            # otherwise deadlock the consumer's blocking get() forever and
            # swallow any stored reader error. Keep retrying until it fits
            # or close() asks us to stop (close() drains the queue, so the
            # retry loop terminates then too).
            while not self._stop.is_set():
                try:
                    self._queue.put(_SENTINEL, timeout=0.2)
                    break
                except queue.Full:
                    continue

    def __iter__(self) -> Iterator:
        return self

    def __next__(self):
        # stays exhausted once the sentinel is seen — callers following
        # the RawReader contract may probe again after end-of-data
        if self._done:
            raise StopIteration
        item = self._queue.get()
        if item is _SENTINEL:
            self._done = True
            if self._error is not None:
                raise self._error
            raise StopIteration
        return item

    def read_next_event(self, channels=None):
        """Drop-in for RawReader.read_next_event (returns (None, None)
        at end of data)."""
        try:
            return next(self)
        except StopIteration:
            return None, None

    def close(self):
        """Stop the reader thread and drain the queue."""
        self._stop.set()
        try:
            while True:
                self._queue.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=5.0)


def prefetch_events(reader, depth: int = 32,
                    channels: Optional[Sequence[str]] = None,
                    dtype=None, raw: bool = False) -> EventPrefetcher:
    """Wrap a RawReader in a background prefetcher. ``dtype`` forwards
    to ``read_next_event`` (None = the reader's float64 default);
    ``raw=True`` reads stored-dtype traces with no host ADC conversion
    (``adctoamp=False, dtype=None`` — see RawReader.read_next_event)."""
    return EventPrefetcher(reader, depth=depth, channels=channels,
                           dtype=dtype, raw=raw)
