"""IV/dIdV sweep processing + analysis.

Replacement for the reference IVSweepProcessing (process/ivprocess.py) and
IVSweepAnalysis (core/ivsweep.py):

- **IVSweepProcessing**: per-bias-point raw processing — noise-type series
  give autocut PSDs + DC offsets; dIdV-type series give lock-in averages —
  with SC/normal state tagging by linearity of imeas vs ibias.
- **IVSweepAnalysis**: the bias analysis (models.ivbias IBIS), per-state
  dIdV fits (batched over bias points), noise modeling across the sweep,
  and energy-resolution vs %Rn.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np
import pandas as pd

from detprocess_tpu.io.filterfile import FilterData
from detprocess_tpu.io.rawdata import RawReader
from detprocess_tpu.models import didv as didv_models
from detprocess_tpu.models import ivbias
from detprocess_tpu.ops import autocuts as cuts
from detprocess_tpu.ops import lockin, spectral
from detprocess_tpu.utils.misc import find_linear_segment

import jax.numpy as jnp


def discover_bias_points(raw_path: str, channel: str,
                         series: Optional[Sequence[str]] = None,
                         bias_tolerance_percent: float = 1.0) -> List[dict]:
    """Scan an IV/dIdV sweep raw group and build the bias-point map.

    Equivalent of IVSweepProcessing._get_file_list
    (process/ivprocess.py:678-916): series are classified iv (noise) vs
    didv by filename prefix, the per-series ``tes_bias`` is read from the
    detector config, and iv/didv series are matched by bias within a
    tolerance. Returns the ``bias_points`` list consumed by
    IVSweepProcessing.process.
    """
    from detprocess_tpu.io.rawdata import RawData, RawReader

    points: dict = {}

    def scan(data_type, key):
        rd = RawData(raw_path, data_type=data_type, series=series)
        for s, files in rd.get_data_files().items():
            if not files:
                continue
            reader = RawReader(files)
            det = reader.get_detector_config(files[0])
            cfg = det.get(channel, {})
            if "tes_bias" not in cfg:
                continue
            bias = float(cfg["tes_bias"])
            # match an existing point within tolerance
            tol = abs(bias) * bias_tolerance_percent / 100.0 + 1e-15
            for b in points:
                if abs(b - bias) <= tol:
                    bias = b
                    break
            entry = points.setdefault(bias, {"tes_bias": bias,
                                             "noise_files": [],
                                             "didv_files": []})
            entry[key].extend(files)

    scan("iv", "noise_files")
    scan("noise", "noise_files")
    scan("didv", "didv_files")
    # normal-branch first (largest |bias|), matching the analysis ordering
    return [points[b] for b in sorted(points, key=abs, reverse=True)]


class IVSweepProcessing(FilterData):
    """Raw sweep processing (process/ivprocess.py:46-1003).

    The caller supplies, per bias point, the raw files for the noise and/or
    dIdV data (the reference discovers these by scanning file metadata for
    tes_bias changes; here the mapping can also be passed directly).
    """

    def __init__(self, verbose: bool = True):
        super().__init__(verbose=verbose)

    def process(self,
                channel: str,
                bias_points: Sequence[dict],
                sgfreq: Optional[float] = None,
                sgamp: Optional[float] = None,
                rsh: float = 5e-3,
                nsigma_cut: float = 2.5,
                tag: str = "default") -> pd.DataFrame:
        """Process a sweep for one channel.

        bias_points: list of dicts with keys
            ``tes_bias`` [A], and either/both
            ``noise_files`` (list of raw file paths) and
            ``didv_files`` (list of raw file paths).
        Returns (and stores) the per-bias-point dataframe
        (``ivsweep_data_{tag}``).
        """
        rows: List[dict] = []
        for bp in bias_points:
            row: dict = {"tes_bias": bp["tes_bias"]}
            if bp.get("noise_files"):
                reader = RawReader(bp["noise_files"])
                fs = reader.sample_rate
                ci = reader.channels.index(channel)
                traces, _ = reader.read_many_events()
                tr = traces[:, ci, :]
                mask = np.asarray(cuts.autocuts_noise(
                    jnp.asarray(tr), nsigma=nsigma_cut))
                if not mask.any():
                    raise ValueError(
                        f"autocuts rejected all {len(mask)} noise traces "
                        f"at tes_bias={bp.get('tes_bias')} — a NaN PSD/"
                        "offset would poison the whole sweep; loosen "
                        "nsigma_cut or inspect the data")
                kept = tr[mask]
                psd = np.asarray(spectral.welch_psd(jnp.asarray(kept), fs))
                row["psd"] = psd
                row["offset_noise"] = float(kept.mean())
                row["offset_noise_err"] = float(
                    kept.mean(axis=-1).std() / np.sqrt(max(len(kept), 1)))
                row["fs"] = fs
                row["avgtrace_noise"] = kept.mean(axis=0)
            if bp.get("didv_files"):
                if sgfreq is None or sgamp is None:
                    raise ValueError("sgfreq/sgamp required for dIdV data")
                reader = RawReader(bp["didv_files"])
                fs = reader.sample_rate
                ci = reader.channels.index(channel)
                traces, _ = reader.read_many_events()
                data = lockin.process_didv_traces(
                    traces[:, ci, :], fs, sgfreq, sgamp, rsh,
                    nsigma_cut=nsigma_cut)
                row["didv_freqs"] = data.freqs
                row["didv"] = data.didv
                row["didv_weights"] = data.weights
                row["offset_didv"] = data.offset
                row["offset_didv_err"] = data.offset_err
                row["sgfreq"] = sgfreq
                row["sgamp"] = sgamp
                row["fs"] = fs
            rows.append(row)

        # state tagging by linearity (ivprocess.py:291-315)
        df_rows = self._tag_states(rows)
        self._set(channel, f"ivsweep_data_{tag}", df_rows,
                  {"rsh": rsh, "channel": channel})
        return df_rows

    @staticmethod
    def _tag_states(rows: List[dict]) -> pd.DataFrame:
        bias = np.array([r["tes_bias"] for r in rows])
        offs = np.array([r.get("offset_noise", r.get("offset_didv", np.nan))
                         for r in rows])
        order = np.argsort(-np.abs(bias))   # normal branch first
        state = np.array(["transition"] * len(rows), dtype=object)
        x, y = np.abs(bias[order]), offs[order]
        # normal side
        lin_n = find_linear_segment(x, y)
        for idx in lin_n:
            state[order[idx]] = "normal"
        # SC side (reverse)
        lin_s = find_linear_segment(x[::-1], y[::-1])
        for idx in lin_s:
            state[order[::-1][idx]] = "sc"
        simple = []
        for r, s in zip(rows, state):
            rr = dict(r)
            rr["state"] = s
            simple.append(rr)
        return pd.DataFrame(simple)


class IVSweepAnalysis(FilterData):
    """Sweep analysis (core/ivsweep.py:53-2073)."""

    def __init__(self, verbose: bool = True):
        super().__init__(verbose=verbose)
        self._sweep_df: Dict[str, pd.DataFrame] = {}
        self._ibis: Dict[str, ivbias.IBISResult] = {}
        self._rsh: Dict[str, float] = {}
        self._nnorm: Dict[str, int] = {}
        self._nsc: Dict[str, int] = {}

    # ------------------------------------------------------------------
    def set_data_from_dataframe(self, channel: str, df: pd.DataFrame,
                                rsh: float = 5e-3):
        self._sweep_df[channel] = df.reset_index(drop=True)
        self._rsh[channel] = rsh

    def set_data_from_processing(self, channel: str,
                                 proc: IVSweepProcessing,
                                 tag: str = "default", rsh: float = 5e-3):
        self.set_data_from_dataframe(
            channel, proc._get(channel, f"ivsweep_data_{tag}"), rsh)

    def set_data_from_file(self, file_name: str, channel: str = None,
                           tag: str = "default", rsh: float = 5e-3):
        """Load sweep dataframe(s) from an ivsweep/filter HDF5 file
        (ivsweep.py:150-191)."""
        from detprocess_tpu.io.filterfile import FilterData

        fd = FilterData(verbose=False).load_hdf5(file_name)
        channels = ([channel] if channel
                    else [c for c in fd.data
                          if f"ivsweep_data_{tag}" in fd.data[c]])
        if not channels:
            raise ValueError(
                f"no ivsweep_data_{tag} found in {file_name}")
        for chan in channels:
            md = fd.data[chan].get(f"ivsweep_data_{tag}_metadata") or {}
            self.set_data_from_dataframe(
                chan, fd._get(chan, f"ivsweep_data_{tag}"),
                rsh=float(md.get("rsh", rsh)))
        return self

    def set_nb_sc_normal_points(self, channel: str, nnorm: int, nsc: int):
        """Override automatic state counts (ivsweep.py:326-399)."""
        self._nnorm[channel] = nnorm
        self._nsc[channel] = nsc

    # ------------------------------------------------------------------
    def analyze_sweep(self, channel: str, offset_key: str = "offset_noise",
                      rp: Optional[float] = None,
                      tag: str = "default") -> pd.DataFrame:
        """IBIS bias analysis over the sweep (ivsweep.py:401-757)."""
        df = self._sweep_df[channel].copy()
        df = df.sort_values("tes_bias", key=np.abs, ascending=False,
                            ignore_index=True)
        # dIdV-only bias points (discover_bias_points with no matching
        # noise series) carry NaN offsets — a single NaN in the linear
        # fits would poison rn/rp/ioffset and every derived column
        finite = np.isfinite(df[offset_key].to_numpy(dtype=float))
        if not finite.all():
            dropped = int((~finite).sum())
            if self._verbose:
                print(f"INFO: dropping {dropped} bias points without "
                      f"{offset_key} from the IBIS analysis")
            df = df[finite].reset_index(drop=True)
        if len(df) < 3:
            raise ValueError(
                f"only {len(df)} bias points with finite {offset_key}")
        ibias = df["tes_bias"].to_numpy(dtype=float)
        imeas = df[offset_key].to_numpy(dtype=float)
        err_key = offset_key + "_err"
        imeas_err = (df[err_key].to_numpy(dtype=float)
                     if err_key in df else None)

        nnorm = self._nnorm.get(channel, int((df["state"] == "normal").sum())
                                if "state" in df else 3)
        nsc = self._nsc.get(channel, int((df["state"] == "sc").sum())
                            if "state" in df else 3)
        nnorm = max(nnorm, 2)
        nsc = max(nsc, 0)

        res = ivbias.analyze_ibis(ibias, imeas, self._rsh[channel],
                                  nnorm=nnorm, nsc=nsc,
                                  imeas_err=imeas_err, rp=rp)
        self._ibis[channel] = res
        df["i0"] = res.i0
        df["i0_err"] = res.i0_err
        df["r0"] = res.r0
        df["r0_err"] = res.r0_err
        df["p0"] = res.p0
        df["p0_err"] = res.p0_err
        df["percent_rn"] = res.r0 / res.rn * 100.0
        self._sweep_df[channel] = df
        results = {
            "rn": res.rn, "rn_err": res.rn_err,
            "rp": res.rp, "rp_err": res.rp_err,
            "ioffset": res.ioffset, "ioffset_err": res.ioffset_err,
            "rshunt": self._rsh[channel],
            "nnorm": nnorm, "nsc": nsc,
        }
        self.set_ivsweep_results(channel, results, "noise", tag=tag)
        self.set_ivsweep_data(channel, df, tag=tag)
        return df

    def get_ibis(self, channel: str) -> ivbias.IBISResult:
        return self._ibis[channel]

    # ------------------------------------------------------------------
    def analyze_didv(self, channel: str, poles=(2, 3),
                     tag: str = "default",
                     enable_sc: bool = True,
                     enable_normal: bool = True,
                     enable_transition: bool = True,
                     nb_points_sc_max: int = 4,
                     nb_points_normal_max: int = 4,
                     sc_percent_rn_max: float = 0.05,
                     normal_percent_rn_min: float = 99.8,
                     transition_percent_rn_min: float = 5.0,
                     transition_percent_rn_max: float = 70.0) -> pd.DataFrame:
        """State-aware dIdV fits across the sweep (ivsweep.py:762-826,
        dispatch :1600-1799).

        Matches the reference semantics:

        - **SC points** (1-pole fit, :1684-1705, 1-pole case :1775-1780):
          the TES is a short (R0=0), so dVdI(0)=A=Rsh+Rp and
          ``Rp = A − Rsh``. Fitted points are the smallest-|bias| ones,
          up to ``nb_points_sc_max``; the summary carries mean/std across
          points plus the median inductance (:1995-2032).
        - **Normal points** (1-pole): dVdI(0)=A=Rsh+Rp+Rn, so
          ``Rn = A − Rsh − Rp_IV`` (the :1803-1805 subtraction); fitted
          points are the largest-|bias| ones, up to
          ``nb_points_normal_max``.
        - **Transition points** (2/3-pole, :1781-1799): full small-signal
          parameters with covariance errors, infinite-loop-gain bias
          params, and flattened ``didv_{p}poles_*`` dataframe columns
          (:1913-1965).

        The dIdV-derived Rp/Rn are cross-checked against the IBIS sweep
        values (:2035-2046 prints); a disagreement beyond 3σ (combined)
        *and* 10 % relative emits a loud warning. Results are stored in
        the ``ivsweep_results`` "didv" entry as ``sc_didv_fit_rp``,
        ``normal_didv_fit_rn``, ``{sc,normal}_didv_fit_L`` (:2010-2032).
        """
        df = self._sweep_df[channel]
        if "didv" not in df.columns:
            raise ValueError("no dIdV data in the sweep dataframe")
        rsh = self._rsh[channel]
        ibis = self._ibis.get(channel)
        rp_iv = ibis.rp if ibis is not None else 0.0

        def _state(row):
            if isinstance(row.get("state"), str):
                return row["state"]
            # fall back to percent_rn thresholds (reference filters,
            # ivsweep.py:1706-1723) when no linearity tagging is present
            prn = row.get("percent_rn", np.nan)
            if np.isfinite(prn):
                if prn < sc_percent_rn_max:
                    return "sc"
                if prn > normal_percent_rn_min:
                    return "normal"
            return "transition"

        def _has_didv(row):
            return isinstance(row.get("didv"), np.ndarray)

        # --- select fit points per state ---------------------------------
        idx_by_state = {"sc": [], "normal": [], "transition": []}
        for idx, row in df.iterrows():
            if _has_didv(row):
                idx_by_state[_state(row)].append(idx)
        absb = df["tes_bias"].abs()
        # SC: smallest |bias| first; normal: largest |bias| first
        sc_idx = sorted(idx_by_state["sc"],
                        key=lambda i: absb[i])[:nb_points_sc_max]
        norm_idx = sorted(idx_by_state["normal"], key=lambda i: absb[i],
                          reverse=True)[:nb_points_normal_max]
        trans_idx = []
        for i in sorted(idx_by_state["transition"], key=lambda i: absb[i],
                        reverse=True):
            prn = df.loc[i].get("percent_rn", np.nan)
            if (np.isfinite(prn)
                    and not (transition_percent_rn_min <= prn
                             <= transition_percent_rn_max)):
                continue
            trans_idx.append(i)

        df = df.copy()
        fits_col: List[dict] = [{} for _ in range(len(df))]
        pos = {idx: k for k, idx in enumerate(df.index)}
        poles_list = [poles] if isinstance(poles, int) else list(poles)
        results_didv: dict = {"rshunt": rsh, "rp": rp_iv}
        if ibis is not None:
            results_didv.update({"rn": ibis.rn, "rn_err": ibis.rn_err,
                                 "rp_err": ibis.rp_err})

        # --- 1-pole SC / normal fits -------------------------------------
        for data_type, indices, enabled in (("sc", sc_idx, enable_sc),
                                            ("normal", norm_idx,
                                             enable_normal)):
            if not enabled or not indices:
                continue
            rpn_list, rpn_err_list, l_list = [], [], []
            for i in indices:
                row = df.loc[i]
                fit = didv_models.fit_didv(
                    row["didv_freqs"], row["didv"], poles=1,
                    weights=row.get("didv_weights"))
                fits_col[pos[i]]["fit_1poles"] = fit
                a = float(fit.params[0])
                a_err = float(np.sqrt(max(fit.cov[0, 0], 0.0)))
                rpn = a - rsh - (rp_iv if data_type == "normal" else 0.0)
                rpn_list.append(rpn)
                rpn_err_list.append(a_err)
                l_list.append(float(fit.params[0] * fit.params[1]))
                df.loc[i, "didv_1poles_rtot"] = a
                df.loc[i, "didv_1poles_chi2"] = fit.cost
            fit_val = float(np.mean(rpn_list))
            # spread across points if several, else the fit error
            fit_err = (float(np.std(rpn_list)) if len(rpn_list) > 1
                       else rpn_err_list[0])
            fit_err = max(fit_err, float(np.mean(rpn_err_list)))
            name = "rp" if data_type == "sc" else "rn"
            results_didv[f"{data_type}_didv_fit_{name}"] = fit_val
            results_didv[f"{data_type}_didv_fit_{name}_err"] = fit_err
            results_didv[f"{data_type}_didv_fit_L"] = float(
                np.median(l_list))
            # cross-check vs IBIS (reference prints both, :2035-2046;
            # here a real disagreement warns loudly)
            if ibis is not None:
                iv_val = ibis.rp if data_type == "sc" else ibis.rn
                iv_err = ibis.rp_err if data_type == "sc" else ibis.rn_err
                sigma = float(np.hypot(fit_err, iv_err))
                dev = abs(fit_val - iv_val)
                if (dev > 3 * sigma
                        and dev > 0.1 * max(abs(iv_val), 1e-12)):
                    print(f"WARNING: {channel} {name} from "
                          f"{data_type} dIdV fit = {fit_val*1e3:.3f} mOhms "
                          f"disagrees with IV sweep "
                          f"{iv_val*1e3:.3f} ± {iv_err*1e3:.3f} mOhms "
                          f"({dev/max(sigma,1e-30):.1f}σ) — check Rshunt "
                          "or the SC/normal point selection")
                if self._verbose:
                    print(f"{channel} {name} from dIdV fit = "
                          f"{fit_val*1e3:.3f} ± {fit_err*1e3:.3f} mOhms; "
                          f"from IV sweep = {iv_val*1e3:.3f} ± "
                          f"{iv_err*1e3:.3f} mOhms")

        # --- 2/3-pole transition fits ------------------------------------
        if enable_transition:
            for i in trans_idx:
                row = df.loc[i]
                for p in poles_list:
                    if p == 1:
                        continue
                    fit = didv_models.fit_didv(
                        row["didv_freqs"], row["didv"], poles=p,
                        weights=row.get("didv_weights"))
                    fits_col[pos[i]][f"fit_{p}poles"] = fit
                    df.loc[i, f"didv_{p}poles_chi2"] = fit.cost
                    if "r0" not in row or not np.isfinite(row.get("r0",
                                                                  np.nan)):
                        continue
                    ssp = didv_models.smallsignal_with_errors(
                        fit, row["r0"], rsh + rp_iv)
                    fits_col[pos[i]][f"ssp_{p}poles"] = ssp
                    for key in ("l", "beta", "tau0", "L"):
                        df.loc[i, f"didv_{p}poles_{key}"] = ssp[key]
                        df.loc[i, f"didv_{p}poles_{key}_err"] = (
                            ssp[f"{key}_err"])
                    if p == 3:
                        df.loc[i, "didv_3poles_gratio"] = ssp["gratio"]
                    # infinite-loop-gain bias point (:1946-1965)
                    ilg = didv_models.biasparams_ilg(
                        fit.params, rsh + rp_iv, rsh,
                        float(row["tes_bias"]), poles=p)
                    for key in ("r0", "i0", "p0"):
                        df.loc[i, f"didv_{p}poles_{key}_infinite_lgain"] = (
                            ilg[key])

        df["didv_fits"] = fits_col
        self._sweep_df[channel] = df
        self.set_ivsweep_results(channel, results_didv, "didv", tag=tag)
        self.set_ivsweep_data(channel, df, tag=tag)
        return df

    def analyze_noise(self, channel: str, tc: float, tbath: float,
                      tload_guess: float = 0.03,
                      poles: int = 2) -> dict:
        """Noise model across the sweep (ivsweep.py:1231-1599): SQUID+
        electronics noise averaged over the normal points, Tload from the
        SC points, then an Irwin–Hilton budget per transition point from
        that point's dIdV small-signal parameters + bias + measured PSD.

        Requires analyze_sweep + analyze_didv first. Returns
        {"squid_noise", "tload", "normal_fit", "budgets": {bias: budget}}
        and stores a "noise_budget" column in the sweep dataframe.
        """
        from detprocess_tpu.pipelines.noisemodel import NoiseModel

        df = self._sweep_df[channel]
        if "didv_fits" not in df.columns:
            raise ValueError('run "analyze_didv" first')
        if "psd" not in df.columns:
            raise ValueError(f"no PSD available for channel {channel} — "
                             "is it a dIdV-only sweep?")
        ibis = self._ibis[channel]
        rl = self._rsh[channel] + ibis.rp
        nm = NoiseModel(verbose=False)

        # normal points → SQUID noise (averaged over points)
        squid_list, normal_fit = [], None
        for _, row in df[df["state"] == "normal"].iterrows():
            if not isinstance(row.get("psd"), np.ndarray):
                continue
            n = len(row["psd"])
            freqs = np.fft.fftfreq(n, d=1.0 / row["fs"])
            normal_fit = nm.fit_normal_noise(
                channel, row["psd"], freqs, ibis.rn, rl, tc)
            squid_list.append(nm.calc_squid_noise(
                channel, row["psd"], freqs, ibis.rn, rl,
                normal_fit["L"], tc, tload_guess=tload_guess))
        squid = np.mean(squid_list, axis=0) if squid_list else None

        # SC points → Tload
        tload = tload_guess
        for _, row in df[df["state"] == "sc"].iterrows():
            if not isinstance(row.get("psd"), np.ndarray):
                continue
            n = len(row["psd"])
            freqs = np.fft.fftfreq(n, d=1.0 / row["fs"])
            tload = nm.fit_sc_noise(
                channel, row["psd"], freqs, rl,
                normal_fit["L"] if normal_fit else 4e-7,
                squiddc=(float(np.median(squid[freqs != 0]))
                         if squid is not None else None))

        # transition points → full budget
        budgets, col = {}, []
        for _, row in df.iterrows():
            fits = row.get("didv_fits")
            if (row.get("state") != "transition"
                    or not isinstance(fits, dict)
                    or f"ssp_{poles}poles" not in fits
                    or not isinstance(row.get("psd"), np.ndarray)):
                col.append(None)
                continue
            ssp = fits[f"ssp_{poles}poles"]
            n = len(row["psd"])
            freqs = np.fft.fftfreq(n, d=1.0 / row["fs"])
            pos = freqs > 0
            budget = nm.analyze_noise(
                channel, freqs[pos],
                {"beta": ssp["beta"], "l": ssp["l"], "L": ssp["L"],
                 "tau0": ssp["tau0"]},
                {"r0": row["r0"], "i0": row["i0"],
                 "rshunt": self._rsh[channel], "rp": ibis.rp,
                 "p0": row["p0"]},
                tc, tbath, tload=tload,
                squiddc=(float(np.median(squid[freqs != 0]))
                         if squid is not None else None),
                psd_measured=row["psd"][pos])
            budgets[float(row["tes_bias"])] = budget
            col.append(budget)
        df = df.copy()
        df["noise_budget"] = col
        self._sweep_df[channel] = df
        return {"squid_noise": squid, "tload": tload,
                "normal_fit": normal_fit, "budgets": budgets}

    def calc_energy_resolution(self, channel: str, template: np.ndarray,
                               fs: float, poles: int = 2) -> pd.DataFrame:
        """σ_E per transition bias point using each point's dIdV fit + PSD
        (ivsweep.py:1040-1196)."""
        df = self._sweep_df[channel]
        sigmas = []
        n = len(template)
        freqs = np.fft.fftfreq(n, d=1.0 / fs)
        for _, row in df.iterrows():
            fits = row.get("didv_fits")
            if (not isinstance(fits, dict) or f"fit_{poles}poles" not in fits
                    or not isinstance(row.get("psd"), np.ndarray)
                    or row.get("state") != "transition"):
                sigmas.append(np.nan)
                continue
            fit = fits[f"fit_{poles}poles"]
            rl = self._rsh[channel] + (self._ibis[channel].rp
                                       if channel in self._ibis else 0.0)
            dpdi, _ = didv_models.dpdi_with_uncertainties(
                fit, freqs, row["i0"], row["r0"], rl)
            sigmas.append(didv_models.energy_resolution(
                template, row["psd"], dpdi, fs))
        df = self._sweep_df[channel].copy()
        df["energy_resolution"] = sigmas
        self._sweep_df[channel] = df
        return df
