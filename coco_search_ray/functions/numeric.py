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


def vec_matrix(col, dtype=np.float64) -> np.ndarray:
    """(n_rows, dim) matrix from an Arrow embedding column — zero-copy
    flatten instead of a Python list-of-lists round-trip (~80x faster
    per batch on the bench embeddings; the per-batch to_pylist was the
    one Python-object conversion left in the vector kernels).

    Accepts fixed_size_list<float> (the encoder's output) and
    variable list<float> (parquet-read embeddings) — the variable case
    is validated uniform-length via the offsets before reshaping, and
    any nulls/ragged rows fall back to the exact to_pylist behavior
    (np.array raises on ragged input, same as before). The returned
    array is a PRIVATE copy (astype always copies here), so hot matmul
    kernels never touch read-only plasma pages (CLAUDE.md lesson).
    """
    import pyarrow as pa

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=dtype)
    t = col.type
    if pa.types.is_fixed_size_list(t) and col.null_count == 0:
        flat = col.flatten()  # offset-aware
        return np.asarray(flat).astype(dtype, copy=True).reshape(n, t.list_size)
    if (pa.types.is_list(t) or pa.types.is_large_list(t)) and col.null_count == 0:
        offs = np.asarray(col.offsets)
        widths = np.diff(offs)
        if (widths == widths[0]).all() and widths[0] > 0:
            # flatten() drops any slice/offset gap the raw values buffer keeps
            flat = col.flatten()
            return np.asarray(flat).astype(dtype, copy=True).reshape(n, int(widths[0]))
    return np.array(col.to_pylist(), dtype=dtype)
