"""Offline merging of per-channel feature dataframes by global timestamp.

Replacement for the reference example utility
(examples/trigger/merge_feature_files.py:1-206): feature dataframes
produced independently per channel (or per processing run) are merged into
one table by matching a global "spicestamp" timestamp within a merge
window; duplicate matches resolve to the trigger with the largest Δχ²
(merge_feature_files.py:32-75).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
import pandas as pd

from detprocess_tpu.io import tables


def spicestamp(df: pd.DataFrame, fs: float) -> np.ndarray:
    """Global timestamp in samples: event_time·fs + trigger_index offset
    (merge_feature_files.py uses the DAQ's global stamp; we reconstruct it
    from event_time [s] and the in-trace trigger time)."""
    stamp = df["event_time"].to_numpy(dtype=np.float64) * fs
    if "trigger_index" in df:
        stamp = stamp + df["trigger_index"].to_numpy(dtype=np.float64)
    return stamp


def merge_feature_tables(
    frames: Sequence[pd.DataFrame],
    fs: float,
    merge_window_samples: int = 100,
    delta_chi2_column: Optional[str] = None,
) -> pd.DataFrame:
    """Merge feature tables on the global timestamp.

    Rows across tables whose stamps agree within ``merge_window_samples``
    are combined into one output row (columns united; later tables fill
    NaN columns of earlier ones). When several rows of the same table fall
    in one window, the one with the largest ``delta_chi2_column`` (default:
    first column containing 'delta_chi2', else the first 'chi2' column)
    wins.
    """
    frames = [f.reset_index(drop=True) for f in frames if len(f)]
    if not frames:
        return pd.DataFrame()

    def chi2_col(df):
        if delta_chi2_column and delta_chi2_column in df:
            return delta_chi2_column
        for c in df.columns:
            if "delta_chi2" in c:
                return c
        for c in df.columns:
            if "chi2" in c:
                return c
        return None

    # collect (stamp, frame_idx, row_idx)
    records = []
    for fi, df in enumerate(frames):
        stamps = spicestamp(df, fs)
        for ri, s in enumerate(stamps):
            records.append((s, fi, ri))
    records.sort()

    # group by stamp proximity
    groups: List[List[tuple]] = []
    for rec in records:
        if groups and rec[0] - groups[-1][-1][0] <= merge_window_samples:
            groups[-1].append(rec)
        else:
            groups.append([rec])

    rows = []
    for group in groups:
        merged = {}
        # dedup within each frame by max delta chi2
        by_frame: dict = {}
        for s, fi, ri in group:
            by_frame.setdefault(fi, []).append(ri)
        for fi, ris in by_frame.items():
            df = frames[fi]
            if len(ris) > 1:
                col = chi2_col(df)
                if col is not None:
                    vals = df[col].iloc[ris].to_numpy()
                    ris = [ris[int(np.argmax(vals))]]
                else:
                    ris = [ris[0]]
            row = df.iloc[ris[0]]
            for col, val in row.items():
                if col not in merged or pd.isna(merged[col]):
                    merged[col] = val
        merged["merge_nb_matched"] = len(by_frame)
        rows.append(merged)
    return pd.DataFrame(rows)


def merge_feature_files(paths: Sequence[str], fs: float,
                        merge_window_samples: int = 100,
                        output_path: Optional[str] = None) -> pd.DataFrame:
    """File-level wrapper: read tables, merge, optionally write."""
    frames = [tables.read_table(p) for p in paths]
    out = merge_feature_tables(frames, fs, merge_window_samples)
    if output_path:
        tables.write_table(out, output_path)
    return out
