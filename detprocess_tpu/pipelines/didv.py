"""dIdV analysis driver: raw square-wave data → fits → TES parameters.

Replacement for the reference DIDVAnalysis (detprocess/core/didv.py):
process raw traces (cuts + lock-in), run 1/2/3-pole fits, derive
small-signal parameters with uncertainties, infinite-loop-gain bias
parameters, dPdI, and energy resolution; persist everything into the
FilterData store under the reference's key schema
(``didv_results_{poles}poles_{tag}``).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

from detprocess_tpu.io.filterfile import FilterData
from detprocess_tpu.io.rawdata import RawReader
from detprocess_tpu.models import didv as didv_models
from detprocess_tpu.ops import lockin


class DIDVAnalysis(FilterData):
    """Per-channel dIdV analysis (core/didv.py:63-1800)."""

    def __init__(self, verbose: bool = True):
        super().__init__(verbose=verbose)
        self._didv_data: Dict[str, lockin.DIDVData] = {}
        self._fits: Dict[str, Dict[int, didv_models.DIDVFit]] = {}
        self._bias_params: Dict[str, dict] = {}
        self._ssp: Dict[str, Dict[int, dict]] = {}

    # ------------------------------------------------------------------
    def process_raw_data(self, channels: Sequence[str] | str,
                         raw_files, sgfreq: float, sgamp: float,
                         rsh: float, nsigma_cut: float = 2.5,
                         nevents: Optional[int] = None):
        """Read raw dIdV events, apply cuts, lock-in average
        (core/didv.py:159-206, :1521-1645)."""
        if isinstance(channels, str):
            channels = [channels]
        reader = RawReader(raw_files)
        fs = reader.sample_rate
        traces, _ = reader.read_many_events(nevents)
        chan_list = reader.channels
        for chan in channels:
            ci = chan_list.index(chan)
            data = lockin.process_didv_traces(
                traces[:, ci, :], fs, sgfreq, sgamp, rsh,
                nsigma_cut=nsigma_cut)
            self.set_processed_data(chan, data)
        return self

    def set_processed_data(self, channel: str, data: lockin.DIDVData):
        """Inject already-processed dIdV data (core/didv.py:207 —
        qetpy.didvinitfromdata equivalent)."""
        self._didv_data[channel] = data

    def get_didv_data(self, channel: str) -> lockin.DIDVData:
        return self._didv_data[channel]

    # ------------------------------------------------------------------
    def set_ivsweep_results(self, channel: str, results: dict,
                            iv_type: str = "noise", tag: str = "default"):
        """Attach IV-sweep results (i0/r0/p0/rp/rshunt) needed for the
        small-signal conversion (core/didv.py:239-303).

        Harmonized with the inherited FilterData accessor (``iv_type``
        plays the ``measurement`` role): the results are ALSO persisted
        into the store under ``ivsweep_results_{iv_type}_{tag}`` so
        save_hdf5/auto-save carries them, and 'noise' vs 'didv' results
        do not overwrite each other on disk.
        """
        self._bias_params[channel] = dict(results)
        FilterData.set_ivsweep_results(self, channel, dict(results),
                                       measurement=iv_type, tag=tag)
        return self

    def set_ivsweep_results_from_data(self, channel: str, results: dict,
                                      iv_type: str = "noise"):
        """Alias matching the reference API (core/didv.py:239)."""
        return self.set_ivsweep_results(channel, results, iv_type)

    def set_ivsweep_results_from_file(self, channel: str, file_name: str,
                                      iv_type: str = "noise",
                                      tag: str = "default"):
        """Load IV-sweep results for a channel from a filter/ivsweep
        HDF5 file (core/didv.py:303). Accepts per-bias-point results
        (picks the stored summary dict) written by IVSweepAnalysis."""
        from detprocess_tpu.io.filterfile import FilterData

        fd = FilterData(verbose=False).load_hdf5(file_name)
        results = fd._get(channel, f"ivsweep_results_{iv_type}_{tag}")
        if isinstance(results, dict):
            self._bias_params[channel] = dict(results)
        else:
            raise ValueError(
                f"ivsweep_results_{iv_type}_{tag} for {channel} in "
                f"{file_name} is not a result dict")
        return self

    def dofit(self, channels: Sequence[str] | str, poles=(2, 3),
              nharmonics: Optional[int] = 200):
        """Fit the measured dIdV(f) with the requested pole models
        (core/didv.py:489-560)."""
        if isinstance(channels, str):
            channels = [channels]
        if isinstance(poles, int):
            poles = [poles]
        for chan in channels:
            data = self._didv_data[chan]
            nh = (len(data.freqs) if nharmonics is None
                  else min(nharmonics, len(data.freqs)))
            fits = self._fits.setdefault(chan, {})
            for p in poles:
                fits[p] = didv_models.fit_didv(
                    data.freqs[:nh], data.didv[:nh], poles=p,
                    weights=data.weights[:nh])
                tag = "default"
                self._set(chan, f"didv_results_{p}poles_fit_{tag}", {
                    "params": fits[p].params,
                    "cov": fits[p].cov,
                    "cost": fits[p].cost,
                    "poles": p,
                }, {"sgfreq": data.sgfreq, "sgamp": data.sgamp,
                    "rsh": data.rsh})
        self._maybe_auto_save()
        return self

    def get_fit(self, channel: str, poles: int) -> didv_models.DIDVFit:
        return self._fits[channel][poles]

    def dofit_prior(self, channels: Sequence[str] | str,
                    prior_mean, prior_cov, poles: int = 2,
                    nharmonics: Optional[int] = 200):
        """Prior-constrained fit (qetpy.DIDVPriors; core/didv.py:867-904)."""
        if isinstance(channels, str):
            channels = [channels]
        for chan in channels:
            data = self._didv_data[chan]
            nh = (len(data.freqs) if nharmonics is None
                  else min(nharmonics, len(data.freqs)))
            fit = didv_models.fit_didv_prior(
                data.freqs[:nh], data.didv[:nh], prior_mean, prior_cov,
                poles=poles, weights=data.weights[:nh])
            self._fits.setdefault(chan, {})[poles] = fit
            self._set(chan, f"didv_results_{poles}poles_priorfit_default",
                      {"params": fit.params, "cov": fit.cov,
                       "cost": fit.cost, "poles": poles}, None)
        return self

    def enable_auto_save(self, path: str):
        """Save the filter-data store after each analysis step
        (auto_save_hdf5 behavior, core/didv.py:1320-1408)."""
        self._auto_save_path = path

    def _maybe_auto_save(self):
        path = getattr(self, "_auto_save_path", None)
        if path:
            self.save_hdf5(path)

    # ------------------------------------------------------------------
    def calc_smallsignal_params(self, channels: Sequence[str] | str,
                                poles=(2, 3), tag: str = "default"):
        """Small-signal parameters + errors (core/didv.py:561-645).
        Requires IV-sweep bias results (r0, rp, rshunt)."""
        if isinstance(channels, str):
            channels = [channels]
        if isinstance(poles, int):
            poles = [poles]
        for chan in channels:
            bias = self._bias_params.get(chan)
            if bias is None:
                raise ValueError(
                    f"IV sweep results required for channel {chan} — call "
                    "set_ivsweep_results first")
            r0 = bias["r0"]
            rl = bias.get("rshunt", bias.get("rsh", 0.0)) + bias.get("rp",
                                                                     0.0)
            for p in poles:
                if p not in self._fits.get(chan, {}):
                    continue
                fit = self._fits[chan][p]
                ssp = didv_models.smallsignal_with_errors(fit, r0, rl)
                self._ssp.setdefault(chan, {})[p] = ssp
                light = {k: v for k, v in ssp.items() if k != "cov"}
                self._set(chan,
                          f"didv_results_{p}poles_smallsignalparams_{tag}",
                          light, {"r0": r0, "rl": rl})
        self._maybe_auto_save()
        return self

    def get_smallsignal_params(self, channel: str, poles: int) -> dict:
        return self._ssp[channel][poles]

    def calc_bias_params_infinite_loop_gain(self, channels, poles: int = 2,
                                            tag: str = "default"):
        """ILG bias point from the dIdV fit (core/didv.py:646-744)."""
        if isinstance(channels, str):
            channels = [channels]
        out = {}
        for chan in channels:
            bias = self._bias_params.get(chan, {})
            rsh = bias.get("rshunt", bias.get("rsh", 5e-3))
            rp = bias.get("rp", 0.0)
            ibias = bias.get("ibias", bias.get("tes_bias", 0.0))
            fit = self._fits[chan][poles]
            ilg = didv_models.biasparams_ilg(fit.params, rsh + rp, rsh,
                                            ibias, poles)
            self._set(chan, f"didv_results_{poles}poles_biasparams_{tag}",
                      ilg, {"method": "infinite_loop_gain"})
            out[chan] = ilg
        return out

    # ------------------------------------------------------------------
    def calc_dpdi(self, channels, freqs: np.ndarray, poles: int = 2,
                  tag: str = "default"):
        """dPdI(f) with uncertainties, stored as ``dpdi_{poles}poles_{tag}``
        (core/didv.py:745-797)."""
        if isinstance(channels, str):
            channels = [channels]
        out = {}
        for chan in channels:
            bias = self._bias_params[chan]
            fit = self._fits[chan][poles]
            r0 = bias["r0"]
            rl = (bias.get("rshunt", bias.get("rsh", 0.0))
                  + bias.get("rp", 0.0))
            i0 = bias["i0"]
            dpdi, dpdi_err = didv_models.dpdi_with_uncertainties(
                fit, freqs, i0, r0, rl)
            self.set_dpdi(chan, dpdi, np.asarray(freqs), poles, tag=tag)
            out[chan] = (dpdi, dpdi_err)
        return out

    def calc_energy_resolution(self, channel: str, template: np.ndarray,
                               psd: np.ndarray, fs: float,
                               poles: int = 2) -> float:
        """Baseline energy resolution using the stored dPdI
        (core/didv.py:798-866)."""
        dpdi, freqs = self.get_dpdi(channel, poles)
        if len(dpdi) != len(template):
            raise ValueError(
                f"dPdI length {len(dpdi)} != template length "
                f"{len(template)} — recompute dPdI on the template's "
                "frequency axis")
        return didv_models.energy_resolution(template, psd, dpdi, fs)
