"""Channel-name algebra.

The processing YAML addresses detector channels with a small algebra of
separators (behavior mirrors the reference's
detprocess/utils/utils.py:70-184 `split_channel_name`):

- ``,``  apply independently to each listed channel
- ``+``  weighted sum of channel traces (one combined trace)
- ``-``  weighted difference of channel traces (one combined trace)
- ``|``  multi-channel (NxM optimal filter), order matters

This module is pure host-side string logic; the resulting channel lists and
weights are compiled into static gather/matmul operations on device.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence

ALLOWED_SEPARATORS = (",", "|", "+", "-")


def split_channel_name(
    channel_name: str,
    available_channels: Optional[Sequence[str]] = None,
    separator: Optional[str] = None,
):
    """Split a compound channel name into individual channels + separator.

    Returns ``(channel_list, separator_or_None)``. Matches the semantics of
    the reference implementation (detprocess/utils/utils.py:70): when
    ``available_channels`` is given, channels are identified by greedy
    substring matching so that channel names containing separator-like
    characters still resolve; otherwise the name is split on ``separator``.
    """
    channel_name = channel_name.replace(" ", "")

    if separator is not None and separator not in ALLOWED_SEPARATORS:
        raise ValueError(
            f'separator "{separator}" not recognized; allowed: {ALLOWED_SEPARATORS}'
        )

    if not any(sep in channel_name for sep in ALLOWED_SEPARATORS):
        return [channel_name], None

    if available_channels is None:
        if separator is None:
            raise ValueError(
                'separator required when "available_channels" not provided'
            )
        if separator == "-":
            raise ValueError('"available_channels" required when using separator "-"')
        return channel_name.split(separator), separator

    # available_channels provided
    if channel_name in available_channels or channel_name == "all":
        return [channel_name], None

    # identify channels by greedy substring removal (longest names first so
    # that e.g. "Mv1" is matched before "v1")
    channel_check = channel_name
    channel_list = []
    for chan in sorted(available_channels, key=len, reverse=True):
        if chan in channel_check:
            channel_check = channel_check.replace(chan, "")
            channel_list.append(chan)

    # restore YAML order: sort found channels by their position in the name
    channel_list.sort(key=lambda c: channel_name.find(c))

    separator_list = sorted(set(channel_check))
    unknown = [s for s in separator_list if s not in ALLOWED_SEPARATORS]
    if unknown:
        raise ValueError(
            f'unidentified channel "{channel_name}"; available: {list(available_channels)}'
        )

    if separator is None:
        if len(separator_list) == 1:
            sep = separator_list[0]
            if sep != "-":
                channel_list = channel_name.split(sep)
            return channel_list, sep
        return channel_list, separator_list

    if separator not in channel_name:
        return [channel_name], None

    if separator != "-":
        return channel_name.split(separator), separator

    if any(s in channel_name for s in ("|", "+", ",")):
        raise ValueError(
            'multiple separators present: split with other separators before "-"'
        )
    return channel_list, separator


def channel_combination_weights(
    channel_name: str,
    available_channels: Sequence[str],
):
    """Resolve a ``+``/``-`` channel combination into (channels, weights).

    ``"chanA+chanB"``  -> (["chanA", "chanB"], [+1, +1])
    ``"chanA-chanB"``  -> (["chanA", "chanB"], [+1, -1])

    Plain channel names return ([name], [1.0]). Mirrors the trace-combination
    logic of the reference (detprocess/process/processing_data.py:1033-1047).
    """
    chans, sep = split_channel_name(channel_name, available_channels)
    if sep is None:
        return chans, [1.0]
    if sep == "+":
        return chans, [1.0] * len(chans)
    if sep == "-":
        # sign follows position of '-' in the original string
        weights = []
        pos = 0
        for chan in chans:
            idx = channel_name.find(chan, pos)
            sign = -1.0 if idx > 0 and channel_name[idx - 1] == "-" else 1.0
            weights.append(sign)
            pos = idx + len(chan)
        return chans, weights
    raise ValueError(
        f'channel "{channel_name}" uses separator "{sep}", not a +/- combination'
    )


_SERIES_RE = re.compile(r"I(\d+)_D(\d{8})_T(\d{6})")


def series_name_to_number(series_name: str) -> int:
    """Convert 'I{fac}_D{yyyymmdd}_T{hhmmss}' to a sortable integer.

    Format follows the reference file-naming convention
    (detprocess/core/rawdata.py:443-548).
    """
    m = _SERIES_RE.search(series_name)
    if not m:
        raise ValueError(f"unrecognized series name: {series_name}")
    fac, day, tme = m.groups()
    return int(fac) * 10**14 + int(day) * 10**6 + int(tme)
