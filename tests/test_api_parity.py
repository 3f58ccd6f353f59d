"""API-parity tail: accessors and small utilities that exist on the
reference classes (core/rawdata.py, core/noise.py, utils/utils.py,
utils/arg_utils.py) and that a migrating user will reach for."""

import numpy as np
import pytest

from detprocess_tpu.io.rawdata import (
    RawData, RawWriter, series_to_number, series_number_to_name)
from detprocess_tpu.utils.misc import build_range_str, hyphen_range, twopole

FS = 1.25e6
N = 4096
CHANNELS = ["chan1", "chan2"]


class TestSeriesNames:
    def test_roundtrip(self):
        for name in ("I1_D20260816_T160000", "I23_D20200101_T000001"):
            assert series_number_to_name(series_to_number(name)) == name

    def test_known_value(self):
        # I1_D20260816_T160000 -> 1*10^14 + 20260816*10^6 + 160000
        assert series_to_number("I1_D20260816_T160000") == 120260816160000
        assert series_number_to_name(120260816160000) == \
            "I1_D20260816_T160000"


class TestRangeStr:
    def test_compress_runs(self):
        assert build_range_str([1, 2, 3, 5]) == "1-3_5"
        assert build_range_str([7]) == "7"
        assert build_range_str([3, 1, 2]) == "1-3"

    def test_inverse_of_hyphen_range(self):
        vals = [1, 2, 3, 7, 9, 10]
        s = build_range_str(vals)
        assert hyphen_range(s.replace("_", ",")) == vals


class TestTwopole:
    def test_zero_before_t0_positive_after(self):
        t = np.linspace(0, 1e-2, 1000)
        p = twopole(t, rtau=1e-4, ftau=1e-3, amp0=1.0, t0=2e-3)
        assert (p[t < 2e-3] == 0).all()
        assert p[t > 2.5e-3][:100].max() > 0

    def test_falltime_error_trap(self):
        # ftau <= rtau must not produce a negative-everywhere pulse
        t = np.linspace(0, 1e-2, 1000)
        p = twopole(t, rtau=1e-3, ftau=1e-4, amp0=1.0, t0=1e-3)
        assert p.max() > 0


@pytest.fixture(scope="module")
def rawgroup(tmp_path_factory):
    root = tmp_path_factory.mktemp("apiparity") / "run12_group1"
    rng = np.random.default_rng(3)
    series = ["I1_D20260816_T160000", "I1_D20260816_T170000"]
    all_traces = {}
    for k, ser in enumerate(series):
        traces = rng.standard_normal((3, 2, N)) * 1e-6 + k * 1e-5
        w = RawWriter(str(root), ser, FS, CHANNELS,
                      data_type="continuous", group_name="run12_group1",
                      detector_config={
                          "chan1": {"close_loop_norm": 2.0},
                          "chan2": {"close_loop_norm": 4.0}})
        w.write_dump(traces, dump_num=1)
        all_traces[ser] = traces
    return dict(root=str(root), series=series, traces=all_traces)


class TestRawDataAccessors:
    def test_group_identity(self, rawgroup):
        import os
        rd = RawData(rawgroup["root"])
        assert rd.get_group_name() == "run12_group1"
        assert rd.get_base_path() == os.path.dirname(rawgroup["root"])
        assert rd.get_facility() == 1
        assert rd.verbose in (True, False)

    def test_sample_rate_and_channels(self, rawgroup):
        rd = RawData(rawgroup["root"])
        assert rd.get_sample_rate() == FS
        assert rd.get_available_channels() == CHANNELS

    def test_data_config(self, rawgroup):
        rd = RawData(rawgroup["root"])
        cfg = rd.get_data_config()
        assert set(cfg) == set(rawgroup["series"])
        one = cfg[rawgroup["series"][0]]
        assert one["channel_list"] == CHANNELS
        assert one["detector_config"]["chan1"]["close_loop_norm"] == 2.0
        assert float(one["overall"]["sample_rate"]) == FS

    def test_describe_smoke(self, rawgroup, capsys):
        RawData(rawgroup["root"]).describe()
        out = capsys.readouterr().out
        assert "run12_group1" in out and "continuous" in out

    def test_get_traces_by_series_number(self, rawgroup):
        rd = RawData(rawgroup["root"])
        ser = rawgroup["series"][1]
        snum = series_to_number(ser)
        tr = rd.get_traces([snum, snum], [1, 3])
        assert tr.shape == (2, 2, N)
        # traces stored in amps with cal=1; amps = adc / close_loop_norm
        want0 = rawgroup["traces"][ser][0] / np.array([[2.0], [4.0]])
        np.testing.assert_allclose(tr[0], want0, rtol=1e-6)

    def test_get_traces_broadcast_series_and_channels(self, rawgroup):
        rd = RawData(rawgroup["root"])
        ser = rawgroup["series"][0]
        tr, admins = rd.get_traces(ser, [1, 2], channels=["chan2"],
                                   include_metadata=True)
        assert tr.shape == (2, 1, N)
        assert [a["event_number"] for a in admins] == [1, 2]
        assert admins[0]["series_name"] == ser

    def test_get_traces_adc_counts(self, rawgroup):
        rd = RawData(rawgroup["root"])
        ser = rawgroup["series"][0]
        raw = rd.get_traces(ser, [1], adctoamp=False)
        amps = rd.get_traces(ser, [1], adctoamp=True)
        np.testing.assert_allclose(
            raw[0], amps[0] * np.array([[2.0], [4.0]]), rtol=1e-6)

    def test_get_traces_missing_event(self, rawgroup):
        rd = RawData(rawgroup["root"])
        with pytest.raises(KeyError):
            rd.get_traces(rawgroup["series"][0], [99])
        with pytest.raises(KeyError):
            rd.get_traces("I9_D20200101_T000000", [1])


class TestNoiseAccessors:
    def test_offset_and_fs(self, tmp_path):
        from detprocess_tpu.pipelines.noise import Noise
        rng = np.random.default_rng(5)
        L = 50000
        traces = rng.standard_normal((4, 2, L)) * 2e-6 + 3e-5
        w = RawWriter(str(tmp_path / "raw"), "I1_D20260816_T160000", FS,
                      CHANNELS, data_type="continuous")
        w.write_dump(traces, dump_num=1)
        files = sorted(str(p) for p in (tmp_path / "raw").glob("*.hdf5"))
        noise = Noise(files, verbose=False)
        assert noise.get_sample_rate() is None
        assert noise.get_offset("chan1") is None  # warns, returns None
        noise.generate_randoms(nrandoms=20, random_rate=200.0,
                               min_separation_msec=1.0,
                               edge_exclusion_msec=1.0, seed=7)
        noise.calc_psd(["chan1"], trace_length_samples=512,
                       nsigma_cut=10.0)
        assert noise.get_sample_rate() == FS
        off = noise.get_offset("chan1")
        assert off == pytest.approx(3e-5, rel=0.05)
        noise.clear_randoms()
        assert noise.get_sample_rate() is None
        assert noise.get_offset("chan1") is None
        # filter data survives clear_randoms
        assert noise.get_psd("chan1") is not None


class TestNoiseModelSetters:
    """Reference-parity NoiseModel surface (core/noisemodel.py:50-360,
    :695-746): external-result setters, stored defaults, state-slot PSDs,
    and the sim-slot getters."""

    def _ssp_bias(self):
        ssp = {"beta": 2.0, "l": 10.0, "L": 4e-7, "tau0": 1e-3}
        bias = {"r0": 0.1, "rp": 4e-3, "rshunt": 5e-3, "i0": 2e-6,
                "p0": 4e-13, "rn": 0.3}
        return ssp, bias

    def test_stored_defaults_drive_analyze_noise(self):
        from detprocess_tpu.pipelines.noisemodel import NoiseModel
        nm = NoiseModel(verbose=False)
        ssp, bias = self._ssp_bias()
        nm.set_iv_didv_results_from_dict(
            "chan1", didv_results={"smallsignalparams": ssp}, poles=2,
            ivsweep_results=bias)
        nm.set_tc("chan1", 0.040)
        nm.set_tbath(0.020)
        freqs = np.linspace(100.0, 1e5, 200)
        budget = nm.analyze_noise("chan1", freqs)
        assert np.all(budget["s_itot"] > 0)
        # get_noise_data returns the sim transition slot
        sim = nm.get_noise_data("chan1", mode="transition")
        np.testing.assert_allclose(sim["s_itot"], budget["s_itot"])
        with pytest.raises(ValueError):
            nm.get_noise_data("chan1", mode="sc")
        with pytest.raises(ValueError):
            nm.get_noise_data("nope")
        with pytest.raises(ValueError):
            nm.get_noise_data()

    def test_missing_rn_rejected(self):
        from detprocess_tpu.pipelines.noisemodel import NoiseModel
        nm = NoiseModel(verbose=False)
        ssp, _ = self._ssp_bias()
        with pytest.raises(ValueError, match="No Rn"):
            nm.set_iv_didv_results_from_dict(
                "chan1", didv_results={"smallsignalparams": ssp},
                ivsweep_results={"rp": 4e-3, "rshunt": 5e-3})

    def test_state_psd_slot_and_validation(self):
        from detprocess_tpu.pipelines.noisemodel import NoiseModel
        nm = NoiseModel(verbose=False)
        n = 256
        psd = np.ones(n)
        freqs = np.fft.fftfreq(n, d=1.0 / FS)
        nm.set_psd("chan1", psd, freqs, "normal")
        assert "psd" in nm._noise_data["chan1"]["normal"]
        with pytest.raises(ValueError, match="folded"):
            nm.set_psd("chan1", psd[:128], np.abs(freqs[:128]), "sc")
        with pytest.raises(ValueError, match="state"):
            nm.set_psd("chan1", psd, freqs, "superduper")
        # state=None falls through to the FilterData tagged store
        nm.set_psd("chan1", psd, FS, tag="default")
        assert nm.get_psd("chan1") is not None

    def test_fit_results_setters(self):
        from detprocess_tpu.pipelines.noisemodel import NoiseModel
        nm = NoiseModel(verbose=False)
        nm.set_normal_fit_results("chan1", squiddc=6e-12, squidpole=200.0,
                                  squidn=0.7)
        assert nm._noise_data["chan1"]["normal"]["fit"]["squidpole"] == 200.0
        with pytest.raises(ValueError):
            nm.set_normal_fit_results("chan1", squiddc=6e-12)
        nm.set_sc_fit_results("chan1", tload=0.03)
        assert nm.get_tload("chan1") == 0.03
        with pytest.raises(ValueError):
            nm.set_sc_fit_results("chan1")
        nm.set_inductance("chan1", 4e-7, "normal")
        with pytest.raises(ValueError):
            nm.set_inductance("chan1", 4e-7, "transition")

    def test_squid_noise_setter_feeds_analyze(self):
        from detprocess_tpu.pipelines.noisemodel import NoiseModel
        nm = NoiseModel(verbose=False)
        ssp, bias = self._ssp_bias()
        freqs = np.linspace(100.0, 1e5, 200)
        squid = np.full(200, 25e-24)  # (5 pA/rtHz)^2
        nm.set_squid_noise("chan1", squid, freqs)
        budget = nm.analyze_noise("chan1", freqs, ssp, bias,
                                  tc=0.040, tbath=0.020)
        np.testing.assert_allclose(budget["s_isquid"], 25e-24, rtol=1e-6)
        sim_n = nm.get_noise_data("chan1", mode="normal")
        np.testing.assert_allclose(sim_n["s_isquid"], squid)

    def test_squid_fit_formula(self):
        from detprocess_tpu.pipelines.noisemodel import NoiseModel
        freqs = np.array([100.0, 1000.0])
        out = NoiseModel.get_squid_noise_from_fit(freqs, 6e-12, 200.0, 0.7)
        want = (6e-12 * (1 + (200.0 / freqs) ** 0.7)) ** 2
        np.testing.assert_allclose(out, want)

    def test_roundtrip_through_file(self, tmp_path):
        from detprocess_tpu.pipelines.noisemodel import NoiseModel
        ssp, bias = self._ssp_bias()
        nm = NoiseModel(verbose=False)
        nm.set_iv_didv_results_from_dict(
            "chan1", didv_results={"smallsignalparams": ssp}, poles=2,
            ivsweep_results=bias)
        path = str(tmp_path / "filter.h5")
        nm.save_hdf5(path)
        nm2 = NoiseModel(verbose=False)
        nm2.set_iv_didv_results_from_file(path, poles=2)
        assert nm2._noise_data["chan1"]["smallsignalparams"][
            "beta"] == pytest.approx(2.0)
        assert nm2._noise_data["chan1"]["biasparams"]["rn"] == \
            pytest.approx(0.3)
