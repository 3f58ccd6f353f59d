"""Miscellaneous host-side helpers (series names, linear-segment detection,
list utilities). Mirrors behavior of detprocess/utils/utils.py and
detprocess/utils/arg_utils.py where cited.
"""

from __future__ import annotations

import os
import re
from datetime import datetime
from typing import List

import numpy as np


def create_series_name(facility: int, now: datetime | None = None) -> str:
    """'I{facility}_D{yyyymmdd}_T{hhmmss}' (detprocess/utils/utils.py:28-52)."""
    now = now or datetime.now()
    return f"I{facility}_D{now.strftime('%Y%m%d')}_T{now.strftime('%H%M%S')}"


def create_directory(path: str) -> None:
    os.makedirs(path, exist_ok=True)


def unique_list(alist) -> list:
    """Order-preserving dedup (detprocess/utils/utils.py:418-434)."""
    if not isinstance(alist, (list, np.ndarray)):
        alist = [alist]
    seen = set()
    out = []
    for item in alist:
        if item not in seen:
            out.append(item)
        seen.add(item)
    return out


def is_empty(param) -> bool:
    if param is None:
        return True
    try:
        return len(param) == 0
    except TypeError:
        return False


def find_linear_segment(x, y, tolerance: float = 0.05) -> List[int]:
    """Find the initial linear segment of (x, y) within tolerance.

    Standardizes on the first 3 points, fits a line through them, and walks
    forward until deviations exceed tolerance on two consecutive points.
    Used for SC/normal state detection in IV sweeps
    (detprocess/utils/utils.py:304-356).
    """
    x = np.asarray(x, dtype=float)
    y = np.asarray(y, dtype=float)
    if len(x) < 3:
        return []
    if len(x) != len(y):
        raise ValueError("x and y must have the same length")

    xs = (x - np.mean(x[:3])) / np.std(x[:3])
    ys = (y - np.mean(y[:3])) / np.std(y[:3])
    slope, intercept = np.polyfit(xs[:3], ys[:3], 1)
    deviations = np.abs(ys - (slope * xs + intercept))

    index_list: List[int] = []
    n = len(deviations)
    for idx in range(n):
        dev = deviations[idx]
        if idx < 3 and dev > tolerance / 10:
            return []
        if dev > tolerance:
            if n > idx + 1:
                if deviations[idx + 1] > tolerance:
                    break
            else:
                break
        else:
            index_list.append(idx)
    return index_list


def build_range_str(data_list) -> str:
    """Inverse of :func:`hyphen_range`: compress a list of integers into
    an underscore-joined run string, e.g. [1,2,3,5] -> '1-3_5'
    (detprocess/utils/arg_utils.py:6-23 — used to build compact series
    labels for merged-output file names)."""
    data_list = sorted(int(v) for v in data_list)
    runs: List[List[int]] = []
    for val in data_list:
        if runs and val == runs[-1][-1] + 1:
            runs[-1].append(val)
        else:
            runs.append([val])
    return "_".join(f"{r[0]}-{r[-1]}" if len(r) > 1 else str(r[0])
                    for r in runs)


def twopole(t, rtau, ftau, amp0, t0):
    """Two-pole pulse shape clipped at zero
    (detprocess/utils/utils.py:780-786): amp0·(e^-(t-t0)/ftau −
    e^-(t-t0)/rtau), negative values (t < t0) zeroed. The fall time is
    error-trapped to stay strictly above the rise time BEFORE the pulse
    is evaluated (the reference adjusts it after, which has no effect)."""
    t = np.asarray(t, dtype=float)
    if ftau <= rtau:
        ftau = rtau * 1.001
    pulse = amp0 * (np.exp(-(t - t0) / ftau) - np.exp(-(t - t0) / rtau))
    return np.where(pulse > 0, pulse, 0.0)


def hyphen_range(s: str) -> List[int]:
    """Expand '1-3,5' -> [1, 2, 3, 5] (detprocess/utils/arg_utils.py:26)."""
    out: List[int] = []
    for part in s.split(","):
        part = part.strip()
        if "-" in part:
            lo, hi = part.split("-")
            out.extend(range(int(lo), int(hi) + 1))
        elif part:
            out.append(int(part))
    return out


def extract_list(arg) -> List[str]:
    """Normalize CLI list arguments: splits comma-separated entries and
    flattens nested lists (detprocess/utils/arg_utils.py:49)."""
    if arg is None:
        return []
    if isinstance(arg, str):
        arg = [arg]
    out: List[str] = []
    for item in arg:
        out.extend(str(item).split(","))
    return [s.strip() for s in out if s.strip()]


def convert_to_seconds(s: str) -> float:
    """Parse '10s' / '5m' / '2h' / '1d' into seconds
    (detprocess/utils/arg_utils.py:70)."""
    m = re.fullmatch(r"\s*([\d.]+)\s*([smhd]?)\s*", s)
    if not m:
        raise ValueError(f"cannot parse time string: {s}")
    value, unit = float(m.group(1)), m.group(2) or "s"
    mult = {"s": 1.0, "m": 60.0, "h": 3600.0, "d": 86400.0}[unit]
    return value * mult


def get_dataframe_series_list(file_path):
    """Series names of all dataframe dumps in a directory
    (reference utils.get_dataframe_series_list, utils/utils.py:~500):
    file names ``{prefix}_{group}_I{fac}_D{date}_T{time}_F{dump}.hdf5``
    → unique sorted ``I…_D…_T…`` series strings."""
    import glob as _glob
    import os as _os

    if not _os.path.isdir(file_path):
        raise ValueError("ERROR: Expecting a directory!")
    files = sorted(set(_glob.glob(_os.path.join(file_path, "*.hdf5"))))
    if not files:
        raise ValueError(f"ERROR: No HDF5 files found in {file_path}")
    series_list = []
    for afile in files:
        name = _os.path.basename(afile)
        start = name.find("_I")
        end = name.find("_F")
        if start < 0 or end < 0 or end <= start:
            continue
        series = name[start + 1:end]
        if series not in series_list:
            series_list.append(series)
    return series_list


def find_psd_peaks(f, psd, fmin=100.0, fmax=1000.0, npeaks=1,
                   min_separation_hz=0.0, min_prominence=None):
    """Host-side PSD peak finding (reference utils.find_psd_peaks,
    utils/utils.py:559-657): up to ``npeaks`` highest scipy.find_peaks
    peaks within [fmin, fmax], with optional separation/prominence
    constraints. Returns a list of dicts with freq/amplitude/prominence/
    base frequencies/index. (The jit-safe device version used by the
    feature pipeline is ops.psdfeatures.psd_peaks.)"""
    from scipy.signal import find_peaks as _find_peaks

    f = np.asarray(f)
    y = np.asarray(psd)
    band = (f >= fmin) & (f <= fmax)
    if not np.any(band):
        distances = np.where(f < fmin, fmin - f,
                             np.where(f > fmax, f - fmax, 0.0))
        idx = int(np.argmin(distances))
        return [{"freq": float(f[idx]), "amplitude": float(y[idx]),
                 "prominence": 0.0, "left_base_freq": float(f[idx]),
                 "right_base_freq": float(f[idx]), "index": idx}]
    fb = f[band]
    yb = y[band]
    offset = int(np.flatnonzero(band)[0])
    df = np.median(np.diff(fb)) if len(fb) > 1 else 1.0
    distance = max(int(round(min_separation_hz / df)), 1)
    kwargs = {"distance": distance}
    if min_prominence is not None:
        kwargs["prominence"] = min_prominence
    else:
        kwargs["prominence"] = (None, None)
    idxs, props = _find_peaks(yb, **kwargs)
    if len(idxs) == 0:
        # fall back to the band maximum
        imax = int(np.argmax(yb))
        return [{"freq": float(fb[imax]), "amplitude": float(yb[imax]),
                 "prominence": 0.0, "left_base_freq": float(fb[imax]),
                 "right_base_freq": float(fb[imax]),
                 "index": imax + offset}]
    order = np.argsort(yb[idxs])[::-1][:npeaks]
    out = []
    for k in order:
        i = idxs[k]
        prom = props.get("prominences")
        lb = props.get("left_bases")
        rb = props.get("right_bases")
        out.append({
            "freq": float(fb[i]),
            "amplitude": float(yb[i]),
            "prominence": float(prom[k]) if prom is not None else 0.0,
            "left_base_freq": (float(fb[lb[k]]) if lb is not None
                               else float(fb[i])),
            "right_base_freq": (float(fb[rb[k]]) if rb is not None
                                else float(fb[i])),
            "index": int(i) + offset,
        })
    return out
