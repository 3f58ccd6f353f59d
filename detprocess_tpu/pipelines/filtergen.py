"""Filter-file generation pipeline: dIdV fits + noise PSD/CSD + templates.

Replacement for the reference FilterDataProcessing
(detprocess/process/filterprocess.py:40-2077): the beginning-of-run
standalone workload that classifies raw series (noise/dIdV), runs per-channel
dIdV fits (with optional IV-sweep inputs), estimates by-series and global
PSDs/CSDs, creates analytic templates from the YAML config, and saves one
filter file feeding triggering + feature extraction.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from detprocess_tpu.config import YamlConfig
from detprocess_tpu.io.filterfile import FilterData
from detprocess_tpu.io.rawdata import RawData, RawReader
from detprocess_tpu.pipelines.didv import DIDVAnalysis
from detprocess_tpu.pipelines.noise import Noise
from detprocess_tpu.pipelines.template import Template
from detprocess_tpu.utils.misc import create_series_name


class FilterDataProcessing:
    """Generate a filter file from raw data + YAML config sections
    (didv / noise / template)."""

    def __init__(self,
                 raw_path: Optional[str] = None,
                 noise_files: Optional[Sequence[str]] = None,
                 didv_files: Optional[Sequence[str]] = None,
                 config: YamlConfig | str | None = None,
                 series: Optional[Sequence[str]] = None,
                 facility: int = 1,
                 verbose: bool = True):
        self._verbose = verbose
        self._facility = facility

        if raw_path is not None:
            rd_cont = RawData(raw_path, data_type="continuous",
                              series=series)
            rd_rand = RawData(raw_path, data_type="rand", series=series)
            rd_didv = RawData(raw_path, data_type="didv", series=series)
            rd_noise = RawData(raw_path, data_type="noise", series=series)
            series_map = (rd_cont.get_data_files()
                          or rd_rand.get_data_files()
                          or rd_noise.get_data_files())
            noise_files = noise_files or self._flatten(series_map)
            didv_files = didv_files or self._flatten(
                rd_didv.get_data_files())
            self._noise_series_map = dict(series_map)
        else:
            self._noise_series_map = (
                {"series": list(noise_files)} if noise_files else {})
        self._noise_files = list(noise_files or [])
        self._didv_files = list(didv_files or [])

        files_for_channels = self._noise_files or self._didv_files
        if not files_for_channels:
            raise ValueError("no raw files found for filter generation")
        probe = RawReader(files_for_channels)
        self._available_channels = probe.channels
        self._fs = probe.sample_rate

        if isinstance(config, str):
            config = YamlConfig(config, self._available_channels,
                                sample_rate=self._fs)
        self._config = config

        self._filter_data = FilterData(verbose=verbose)

    @staticmethod
    def _flatten(series_map: Dict[str, List[str]]) -> List[str]:
        out: List[str] = []
        for files in series_map.values():
            out.extend(files)
        return sorted(out)

    @property
    def filter_data(self) -> FilterData:
        return self._filter_data

    # ------------------------------------------------------------------
    def process(self,
                channels: Optional[Sequence[str]] = None,
                enable_noise: bool = True,
                enable_template: bool = True,
                enable_didv: bool = True,
                nrandoms: Optional[int] = None,
                random_rate: Optional[float] = None,
                lgc_by_series: bool = False,
                lgc_save: bool = False,
                output_path: Optional[str] = None,
                file_name: Optional[str] = None,
                seed: Optional[int] = None) -> FilterData:
        channels = list(channels or self._available_channels)
        noise_cfg = (self._config.get_config("noise")
                     if self._config else {"overall": {}, "channels": {}})
        tmpl_cfg = (self._config.get_config("template")
                    if self._config else {"overall": {}, "channels": {}})
        didv_cfg = (self._config.get_config("didv")
                    if self._config else {"overall": {}, "channels": {}})

        # ---- noise PSDs (+CSD over all configured channels)
        if enable_noise and self._noise_files:
            noise = Noise(self._noise_files, verbose=self._verbose)
            noise._filter_data = self._filter_data.data
            overall = noise_cfg.get("overall", {}) or {}
            n = overall.get("trace_length_samples")
            p = overall.get("pretrigger_length_samples")
            noise.generate_randoms(
                random_rate=random_rate or overall.get("random_rate"),
                nrandoms=nrandoms or overall.get("nrandoms", 500),
                seed=seed)
            chan_sel = [c for c in channels
                        if not noise_cfg.get("channels")
                        or c in noise_cfg["channels"]]
            noise.calc_psd(chan_sel, trace_length_samples=n,
                           pretrigger_length_samples=p)
            if len(chan_sel) > 1:
                noise.calc_csd(chan_sel, trace_length_samples=n,
                               pretrigger_length_samples=p)
            if lgc_by_series and len(self._noise_series_map) > 1:
                # per-series PSDs tagged by series name for stability
                # monitoring (filterprocess.py:1050-1302 by-series branch)
                for sname, sfiles in self._noise_series_map.items():
                    ns = Noise(sorted(sfiles), verbose=False)
                    ns._filter_data = self._filter_data.data
                    ns.generate_randoms(
                        random_rate=random_rate
                        or overall.get("random_rate"),
                        nrandoms=nrandoms or overall.get("nrandoms", 500),
                        seed=seed)
                    ns.calc_psd(chan_sel, trace_length_samples=n,
                                pretrigger_length_samples=p, tag=sname)

        # ---- analytic templates from config
        if enable_template and tmpl_cfg.get("channels"):
            template = Template(verbose=self._verbose)
            template._filter_data = self._filter_data.data
            for chan, ccfg in tmpl_cfg["channels"].items():
                if not isinstance(ccfg, dict):
                    continue
                template.create_template(
                    chan, self._fs,
                    trace_length_samples=ccfg.get("trace_length_samples"),
                    trace_length_msec=ccfg.get("trace_length_msec"),
                    pretrigger_length_samples=ccfg.get(
                        "pretrigger_length_samples"),
                    pretrigger_length_msec=ccfg.get(
                        "pretrigger_length_msec"),
                    A=ccfg.get("A", 1.0), B=ccfg.get("B"), C=ccfg.get("C"),
                    tau_r=ccfg.get("tau_r"),
                    tau_f1=ccfg.get("tau_f1"),
                    tau_f2=ccfg.get("tau_f2"),
                    tau_f3=ccfg.get("tau_f3"),
                    tag=ccfg.get("tag", "default"))

        # ---- dIdV fits
        if enable_didv and self._didv_files and didv_cfg.get("channels"):
            didv = DIDVAnalysis(verbose=self._verbose)
            didv._filter_data = self._filter_data.data
            overall = didv_cfg.get("overall", {}) or {}
            for chan, ccfg in didv_cfg["channels"].items():
                if not isinstance(ccfg, dict):
                    continue
                sgfreq = ccfg.get("sgfreq", overall.get("sgfreq"))
                sgamp = ccfg.get("sgamp", overall.get("sgamp"))
                rsh = ccfg.get("rshunt", overall.get("rshunt", 5e-3))
                if sgfreq is None or sgamp is None:
                    raise ValueError(
                        f"didv config for {chan} requires sgfreq/sgamp")
                didv.process_raw_data(chan, self._didv_files, sgfreq,
                                      sgamp, rsh)
                didv.dofit(chan, poles=ccfg.get("poles", [2, 3]))
                iv_results = ccfg.get("ivsweep_results")
                if iv_results:
                    didv.set_ivsweep_results(chan, iv_results)
                    didv.calc_smallsignal_params(
                        chan, poles=ccfg.get("poles", [2, 3]))

        if lgc_save:
            output_path = output_path or "."
            os.makedirs(output_path, exist_ok=True)
            name = file_name or (
                f"filter_{create_series_name(self._facility)}.hdf5")
            self._filter_data.save_hdf5(os.path.join(output_path, name))
        return self._filter_data
