"""Shared numeric helpers.

round_half_away is THE rounding used everywhere a float column is
compared to a DuckDB oracle: DuckDB's round() rounds half away from
zero, numpy/pandas round half to even — with identical float64 inputs on
both sides, matching the rounding MODE removes the .xx5-boundary value-
hash mismatches (CLAUDE.md invariant).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def round_half_away(x, dec: int = 2):
    """Half-away-from-zero rounding for ndarray / Series / scalar."""
    scale = 10.0 ** dec
    arr = np.asarray(x, dtype=np.float64)
    out = np.sign(arr) * np.floor(np.abs(arr) * scale + 0.5) / scale
    if isinstance(x, pd.Series):
        return pd.Series(out, index=x.index, name=x.name)
    if np.isscalar(x):
        return float(out)
    return out


def round_df_half_away(df: pd.DataFrame, cols: list[str], dec: int = 2) -> pd.DataFrame:
    for c in cols:
        df[c] = round_half_away(df[c].to_numpy(dtype=np.float64), dec)
    return df
