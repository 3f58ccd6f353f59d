"""Fault-injection hardening (round-4 VERDICT item 7).

Each failure mode must produce a clear, actionable error NAMING the
file/channel involved, must not hang, and must never let a partially
written dump be counted by resume:

  * truncated/corrupt raw HDF5 mid-series
  * sample-rate mismatch between raw data and filter data (template /
    psd / csd) — reference consistency checks
    processing_data.py:303-318
  * template/psd length mismatch
  * missing channel in the raw file (trigger and feature configs)
  * zero-trigger series end-to-end (trigger → feature)
  * OSError (disk-full class) inside AsyncWriter mid-run: on-disk
    dumps stay a gapless prefix and resume continues from the last
    good dump
"""

import os

import numpy as np
import pandas as pd
import pytest
import yaml

from detprocess_tpu.io import tables
from detprocess_tpu.io.filterfile import FilterData
from detprocess_tpu.io.rawdata import RawReader, RawWriter
from detprocess_tpu.models import pulse
from detprocess_tpu.pipelines.features import FeatureProcessing
from detprocess_tpu.pipelines.triggers import TriggerProcessing

FS = 1.25e6
NT, PRE = 512, 128
L = 20_000


def _write_raw(root, nev=2, ndump=1, pulses=(), seed=1):
    rng = np.random.default_rng(seed)
    tmpl = pulse.make_template(FS, NT, PRE, A=1.0, tau_r=20e-6,
                               tau_f1=60e-6)
    w = RawWriter(str(root), "I1_D20260820_T250000", FS, ["chan1"],
                  data_type="continuous", nb_pretrigger_samples=PRE)
    for d in range(1, ndump + 1):
        traces = rng.standard_normal((nev, 1, L)) * 1e-9
        for ev in range(nev):
            for p in pulses:
                traces[ev, 0, p - PRE:p - PRE + NT] += 2e-9 * tmpl
        w.write_dump(traces, dump_num=d)
    files = sorted(str(p) for p in root.glob("*.hdf5"))
    return files, tmpl


def _fd(tmpl, fs=FS, psd_len=NT, psd_fs=None):
    fd = FilterData(verbose=False)
    fd.set_template("chan1", tmpl, fs, pretrigger_length_samples=PRE)
    fd.set_psd("chan1", np.full(psd_len, 1e-9 ** 2 / FS), psd_fs or fs)
    return fd


def _tcfg(tmp_path, chan="chan1", thresh=7.0):
    cpath = str(tmp_path / f"t_{chan}_{thresh}.yaml")
    yaml.safe_dump({"trigger": {chan: {
        "run": True, "template_tag": "default",
        "threshold_sigma": thresh, "pileup_window_msec": 0.04}}},
        open(cpath, "w"))
    return cpath


def test_truncated_raw_file_names_the_file(tmp_path):
    files, tmpl = _write_raw(tmp_path / "raw", ndump=2,
                             pulses=(9000,))
    sz = os.path.getsize(files[1])
    with open(files[1], "r+b") as fh:
        fh.truncate(sz // 3)
    tp = TriggerProcessing(files, _tcfg(tmp_path), filter_data=_fd(tmpl),
                           verbose=False, auto_prewarm=False)
    with pytest.raises(OSError, match=os.path.basename(files[1])):
        tp.process(capacity=16, event_batch=2)


def test_fs_mismatch_trigger(tmp_path):
    files, tmpl = _write_raw(tmp_path / "raw")
    fd = _fd(tmpl, fs=1e6, psd_fs=1e6)      # filter data at 1 MHz
    with pytest.raises(ValueError,
                       match="sample rate.*chan1"):
        TriggerProcessing(files, _tcfg(tmp_path), filter_data=fd,
                          verbose=False, auto_prewarm=False)


def test_length_mismatch_trigger(tmp_path):
    files, tmpl = _write_raw(tmp_path / "raw")
    fd = _fd(tmpl, psd_len=256)
    with pytest.raises(ValueError,
                       match="number of samples.*chan1"):
        TriggerProcessing(files, _tcfg(tmp_path), filter_data=fd,
                          verbose=False, auto_prewarm=False)


def test_missing_channel_trigger(tmp_path):
    files, tmpl = _write_raw(tmp_path / "raw")
    fd = FilterData(verbose=False)
    fd.set_template("chanX", tmpl, FS, pretrigger_length_samples=PRE)
    fd.set_psd("chanX", np.full(NT, 1e-9 ** 2 / FS), FS)
    with pytest.raises(ValueError,
                       match="chanX.*not present in the raw data"):
        TriggerProcessing(files, _tcfg(tmp_path, chan="chanX"),
                          filter_data=fd, verbose=False,
                          auto_prewarm=False)


def _fcfg(tmp_path, chan="chan1"):
    fcfg = {"feature": {"trace_length_samples": NT,
                        "pretrigger_length_samples": PRE,
                        chan: {"of1x1_nodelay": {"run": True}}}}
    fpath = str(tmp_path / f"f_{chan}.yaml")
    yaml.safe_dump(fcfg, open(fpath, "w"))
    return fpath


def test_missing_channel_feature(tmp_path):
    files, tmpl = _write_raw(tmp_path / "raw")
    fd = FilterData(verbose=False)
    fd.set_template("chanX", tmpl, FS, pretrigger_length_samples=PRE)
    fd.set_psd("chanX", np.full(NT, 1e-9 ** 2 / FS), FS)
    with pytest.raises(ValueError,
                       match="chanX.*not present in the raw data"):
        FeatureProcessing(files, _fcfg(tmp_path, chan="chanX"),
                          filter_data=fd, verbose=False)


def test_fs_mismatch_feature(tmp_path):
    files, tmpl = _write_raw(tmp_path / "raw")
    fd = _fd(tmpl, fs=1e6, psd_fs=1e6)
    with pytest.raises(ValueError, match="sample rate.*chan1"):
        FeatureProcessing(files, _fcfg(tmp_path), filter_data=fd,
                          verbose=False)


def test_zero_trigger_series_end_to_end(tmp_path):
    """A series with no triggers completes cleanly: empty trigger
    frame, no trigger dump on disk (only the job summary), and the
    feature pipeline on the empty frame yields zero rows."""
    files, tmpl = _write_raw(tmp_path / "raw")
    cpath = _tcfg(tmp_path, thresh=200.0)    # nothing crosses 200 sigma
    tp = TriggerProcessing(files, cpath, filter_data=_fd(tmpl),
                           verbose=False, auto_prewarm=False)
    out = str(tmp_path / "out")
    df = tp.process(capacity=16, event_batch=2, lgc_save=True,
                    output_path=out)
    assert len(df) == 0
    assert not [f for f in os.listdir(out) if f.endswith(".hdf5")]
    fp = FeatureProcessing(files, _fcfg(tmp_path), filter_data=_fd(tmpl),
                           trigger_dataframe=df, verbose=False)
    fdf = fp.process(batch_size=8)
    assert len(fdf) == 0


def test_writer_oserror_gapless_prefix_and_resume(tmp_path, monkeypatch):
    """Disk-full-class OSError on the SECOND dump: the run raises, disk
    holds exactly the first (good) dump, and resume=True continues from
    it — the union equals a clean run frame-for-frame (minus the
    per-run prod-id counter, which restarts on resume like the
    reference's per-process counters)."""
    files, tmpl = _write_raw(tmp_path / "raw", nev=4, ndump=1,
                             pulses=(5000, 12000), seed=3)
    fd = _fd(tmpl)
    cpath = _tcfg(tmp_path)
    out_fail = str(tmp_path / "out_fail")
    out_clean = str(tmp_path / "out_clean")

    tp = TriggerProcessing(files, cpath, filter_data=fd, verbose=False,
                           auto_prewarm=False)
    clean = tp.process(capacity=16, event_batch=1, lgc_save=True,
                       output_path=out_clean, nb_events_per_dump=1,
                       series_name="I1_D20260820_T260000")

    real_write = tables.write_table
    calls = {"n": 0}

    def flaky_write(df, path, fmt="hdf5"):
        calls["n"] += 1
        if calls["n"] == 2:
            raise OSError(28, "No space left on device", path)
        return real_write(df, path, fmt=fmt)

    monkeypatch.setattr(tables, "write_table", flaky_write)
    tp2 = TriggerProcessing(files, cpath, filter_data=fd, verbose=False,
                            auto_prewarm=False)
    with pytest.raises(OSError, match="No space left"):
        tp2.process(capacity=16, event_batch=1, lgc_save=True,
                    output_path=out_fail, nb_events_per_dump=1,
                    series_name="I1_D20260820_T260000")
    monkeypatch.setattr(tables, "write_table", real_write)

    on_disk = sorted(f for f in os.listdir(out_fail)
                     if f.endswith(".hdf5"))
    assert len(on_disk) == 1 and "_F0001" in on_disk[0], \
        f"expected exactly the first good dump, got {on_disk}"

    tp3 = TriggerProcessing(files, cpath, filter_data=fd, verbose=False,
                            auto_prewarm=False)
    tp3.process(capacity=16, event_batch=1, lgc_save=True,
                output_path=out_fail, nb_events_per_dump=1,
                resume=True)
    resumed = sorted(f for f in os.listdir(out_fail)
                     if f.endswith(".hdf5"))
    assert len(resumed) == len(sorted(
        f for f in os.listdir(out_clean) if f.endswith(".hdf5")))
    union = pd.concat([tables.read_table(os.path.join(out_fail, f))
                       for f in resumed], ignore_index=True)
    # the vaex-layout HDF5 reader returns columns alphabetically —
    # align order (content is what resume correctness is about)
    cols = [c for c in clean.columns if c != "trigger_prod_id"]
    # normalize through object dtype with None for missing: the HDF5
    # round trip reads strings back as pandas StringDtype whose pd.NA
    # compares unequal to the in-memory None (values unchanged)
    def norm(df):
        df = df[cols].reset_index(drop=True).astype(object)
        return df.where(pd.notnull(df), None)

    pd.testing.assert_frame_equal(norm(union), norm(clean),
                                  check_exact=True)
