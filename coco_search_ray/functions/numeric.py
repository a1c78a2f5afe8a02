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


# ---------------------------------------------------------------------------
# Exact fixed-point money aggregation (the discrete-quantile move applied
# to SUM/AVG): 2-decimal money stored as float64 is summed as int64 CENTS
# on BOTH engines, so the comparison is exact by construction. Float sums
# are ill-conditioned for a hash gate — accumulation order differs between
# Ray's block-parallel Sum and DuckDB's scan order, the error grows as
# sqrt(n)*ulp(total), and a 4-decimal product sum (price*(1-disc)) lands
# EXACTLY on .xx5 half-away boundaries, where the last ulp decides the
# rounded value (observed: q1 sum_disc_price flipped 2697140231.62/.63 at
# sf0.1 while green at sf0.01).
# ---------------------------------------------------------------------------


def cents_i64(arr):
    """Exact int64 cents from a 2-decimal money column stored as float64.

    SQL mirror: ``CAST(round(col*100) AS BIGINT)``. Rounding-mode
    differences (Arrow half-even vs DuckDB half-away) are irrelevant
    because genuine 2dp data lands within ~1e-8 of an integer after *100
    — and that contract is GUARDED: any value more than 0.01 away from an
    integer (i.e. real 3+-decimal data, where the two modes and the two
    engines could quantize differently) raises instead of silently
    diverging from the oracle. Nulls propagate (both engines' SUM skips
    them). int64 envelope: +-9.2e16 cents = +-$9.2e14 per group sum.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    scaled = pc.multiply(arr, pa.scalar(100.0))
    dev = pc.max(pc.abs(pc.subtract(scaled, pc.round(scaled))))
    if dev.as_py() is not None and dev.as_py() > 0.01:
        raise ValueError(
            f"cents_i64: column is not 2-decimal fixed-point (max deviation "
            f"{dev.as_py():.6f} cents from an integer) — the exact-cents "
            "contract would quantize differently from the SQL mirror"
        )
    return pc.cast(pc.round(scaled), pa.int64())


def e2_dollars(sums) -> np.ndarray:
    """Exact dollars from int64 cent sums: one correctly-rounded division
    shared by both engines. SQL mirror: ``S::BIGINT / 100.0``."""
    return np.asarray(sums, dtype=np.int64) / 100.0


def e4_round2_pos(sums) -> np.ndarray:
    """Half-away-2dp dollars from NONNEGATIVE exact e4 (hundredth-of-cent)
    integer sums, all in integer arithmetic: ``(s + 50) // 100 / 100.0``.

    Positive-domain by contract (prices and (1-discount) are nonnegative)
    and GUARDED: DuckDB's ``//`` truncates toward zero while Python's
    floors, so a negative sum would silently diverge — raise instead.
    SQL mirror: ``((S::BIGINT + 50) // 100) / 100.0``.
    """
    v = np.asarray(sums, dtype=np.int64)
    if (v < 0).any():
        raise ValueError(
            "e4_round2_pos: negative e4 sum — the integer-division rounding "
            "contract is positive-domain (DuckDB // truncates, Python // "
            "floors); use a signed variant with an abs/CASE mirror instead"
        )
    return ((v + 50) // 100) / 100.0
