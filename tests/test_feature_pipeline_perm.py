"""Feature pipeline equality with the permuted-FFT path on vs off.

At trace lengths where the four-step matmul FFT engages (n//2 >
MAX_NATIVE_FFT) the plan compiler switches the of1x1 half-spectrum chain
AND the NxM full-spectrum chain to the transpose-free permuted storage
layout (ops/fft.rfft_perm / fft_perm + the spec_perm kernels). The
output tables must be identical to the natural-order path
bit-for-bit-close; this drives the FULL pipeline both ways and diffs
every column.
"""

import numpy as np
import pytest
import yaml

from detprocess_tpu.io.filterfile import FilterData
from detprocess_tpu.io.rawdata import RawWriter
from detprocess_tpu.models import pulse
from detprocess_tpu.ops import fft as dfft
from detprocess_tpu.pipelines.features import FeatureProcessing

from reference_impl import generate_noise

FS = 1.25e6
N = 16384               # n//2 = 8192 > MAX_NATIVE_FFT → perm path engages
PRETRIG = 4096
NB_EVENTS = 8


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("perm_e2e")
    rng = np.random.default_rng(321)
    tmpl1 = pulse.make_template(FS, N, PRETRIG, A=1.0, tau_r=20e-6,
                                tau_f1=200e-6)
    tmpl2 = pulse.make_template(FS, N, PRETRIG, A=1.0, tau_r=15e-6,
                                tau_f1=120e-6)
    f = np.abs(np.fft.fftfreq(N, 1 / FS))
    f[0] = f[1]
    psd1 = 1e-20 * (1 + 50 / f)
    psd2 = 2e-20 * np.ones(N)
    amps = rng.uniform(1e-6, 4e-6, (NB_EVENTS, 2))
    # chan2 carries a 25 kHz line for the psd features
    line = 5e-7 * np.sin(2 * np.pi * 25e3 * np.arange(N) / FS + 0.7)
    traces = np.stack([generate_noise(psd1, FS, NB_EVENTS, rng)
                       + amps[:, :1] * tmpl1
                       + 0.5 * amps[:, 1:] * np.roll(tmpl2, 50),
                       generate_noise(psd2, FS, NB_EVENTS, rng)
                       + amps[:, 1:] * tmpl2 + line], axis=1)

    raw_dir = root / "raw"
    writer = RawWriter(str(raw_dir), "I1_D20260817_T010000", FS,
                       ["chan1", "chan2"],
                       detector_config={"chan1": {"tes_bias": 1e-7},
                                        "chan2": {"tes_bias": 2e-7}})
    writer.write_dump(traces, dump_num=1)

    fd = FilterData(verbose=False)
    fd.set_template("chan1", tmpl1, FS, pretrigger_length_samples=PRETRIG)
    fd.set_template("chan2", tmpl2, FS, pretrigger_length_samples=PRETRIG)
    fd.set_template("chan1", tmpl1, FS, pretrigger_length_samples=PRETRIG,
                    tag="Scintillation")
    fd.set_template("chan1", tmpl2, FS, pretrigger_length_samples=PRETRIG,
                    tag="Evaporation")
    fd.set_psd("chan1", psd1, FS)
    fd.set_psd("chan2", psd2, FS)
    csd = np.zeros((2, 2, N), dtype=complex)
    csd[0, 0] = psd1
    csd[1, 1] = psd2
    fd.set_csd("chan1|chan2", csd, FS)
    tmpl_nxm = np.zeros((2, 2, N))
    tmpl_nxm[0, 0] = tmpl1
    tmpl_nxm[1, 1] = tmpl2
    fd.set_template("chan1|chan2", tmpl_nxm, FS,
                    pretrigger_length_samples=PRETRIG)
    filter_path = str(root / "filter.h5")
    fd.save_hdf5(filter_path)

    config = {
        "filter_file": filter_path,
        "chan1": {
            "of1x1_nodelay": {"run": True, "template_tag": "default"},
            "of1x1_unconstrained": {"run": True, "template_tag": "default",
                                    "interpolate": True},
            "of1x1_constrained": {"run": True, "template_tag": "default",
                                  "window_min_from_trig_usec": -80.0,
                                  "window_max_from_trig_usec": 80.0},
            # wide window → masked full-scan path, not the direct kernel
            "of1x1_wide": {"run": True, "base_algorithm":
                           "of1x1_constrained", "template_tag": "default",
                           "window_min_from_trig_usec": -2000.0,
                           "window_max_from_trig_usec": 2000.0},
            "baseline": {"run": True,
                         "window_min_from_start_usec": 0.0,
                         "window_max_from_trig_usec": -400.0},
            # joint two-template fit on the half-spectrum perm path
            "of1x2x2": {"run": True, "template_tag_1": "Scintillation",
                        "template_tag_2": "Evaporation",
                        "delta_window_min_usec": 0.0,
                        "delta_window_max_usec": 100.0},
        },
        "chan2": {
            # psd features unpermute the half spectrum once per channel
            "psd_amp": {"run": True, "f_lims": [[1000.0, 10000.0]]},
            "psd_peaks": {"run": True, "f_lims": [[10e3, 50e3]],
                          "npeaks": 2, "min_separation_hz": 2000.0},
            "phase": {"run": True, "f_lims": [[10e3, 50e3]],
                      "npeaks": 1},
        },
        "chan1|chan2": {
            # unconstrained → permuted full ifft scan
            "ofnxm": {"run": True, "template_tag": "default"},
            # narrow window → direct DFT matmul with permuted rows
            "ofnxm_win": {"run": True, "base_algorithm": "ofnxm",
                          "template_tag": "default",
                          "window_min_from_trig_usec": -40.0,
                          "window_max_from_trig_usec": 40.0},
            # two-group joint fit (direct union branch)
            "ofnxmx2": {"run": True, "template_tag": "default",
                        "template_group_ids": [0, 1],
                        "fit_window": [[PRETRIG - 30, PRETRIG + 30],
                                       [PRETRIG - 40, PRETRIG + 40]]},
        },
    }
    config_path = str(root / "process.yaml")
    with open(config_path, "w") as fh:
        yaml.safe_dump(config, fh)
    raw_files = sorted(str(p) for p in raw_dir.glob("*.hdf5"))
    return dict(raw_files=raw_files, config_path=config_path,
                filter_path=filter_path)


def _run(dataset):
    proc = FeatureProcessing(dataset["raw_files"], dataset["config_path"],
                             filter_data=dataset["filter_path"],
                             verbose=False)
    return proc.process(batch_size=4, dtype=np.float64)


def test_pipeline_equal_across_layouts(dataset, monkeypatch):
    """All three feature-site layouts produce the same table: the packed
    Z-domain chain (shipping default), the permuted half/full-spectrum
    chain, and the natural-order chain."""
    assert dfft.half_perm_indices(N) is not None   # engages at this N
    assert dfft.PERM_SITES["feature"] == "packed"  # shipping default
    df_packed = _run(dataset)
    monkeypatch.setitem(dfft.PERM_SITES, "feature", True)
    df_perm = _run(dataset)
    monkeypatch.setattr(dfft, "half_perm_indices", lambda n: None)
    monkeypatch.setattr(dfft, "perm_indices", lambda n: None)
    df_nat = _run(dataset)
    assert sorted(df_perm.columns) == sorted(df_nat.columns)
    assert sorted(df_packed.columns) == sorted(df_nat.columns)
    for label, df in (("perm", df_perm), ("packed", df_packed)):
        for col in df_nat.columns:
            a = df_nat[col].to_numpy()
            b = df[col].to_numpy()
            if a.dtype.kind in "fc":
                np.testing.assert_allclose(
                    b, a, rtol=1e-9,
                    atol=1e-12 * max(1.0, np.abs(a).max()),
                    err_msg=f"column {col} ({label} vs natural)")
            else:
                assert np.array_equal(a, b), f"column {col} ({label})"
