"""Deterministic dataset splitting — the train/val/test assignment a
training-data pipeline needs: a pure function of the row ID, stable
across runs, machines and engine versions, uncorrelated with the id
sequence (unlike ``id % k``).

Rule: bucket = the first 12 hex digits of md5(str(id)) read as an
integer, uniform on [0, 16^12); split thresholds are cumulative
fractions of that range. md5 (not our sha1-based stable_hash64) is used
deliberately: DuckDB exposes the identical md5() function, so the
assignment is INDEPENDENTLY reproducible in SQL — the oracle recomputes
the hash itself rather than trusting an export.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

_HEX_DIGITS = 12
_SPACE = 16**_HEX_DIGITS


def split_bucket(value) -> int:
    """Uniform bucket in [0, 16^12) from md5 of the stringified id —
    the scalar SPEC; batches use the vectorized ``md5_buckets``."""
    return int(hashlib.md5(str(value).encode()).hexdigest()[:_HEX_DIGITS], 16)


_CON = None


def _con():
    global _CON
    if _CON is None:
        import duckdb

        _CON = duckdb.connect()
        _CON.execute("SET preserve_insertion_order = true")
    return _CON


def md5_buckets(ids: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Vectorized md5 buckets for a whole id column — DuckDB as the
    batch kernel (the jsonops pattern): the EXACT expression the splits
    and quota oracles run, so kernel and oracle share the engine's md5
    and stringification semantics by construction. ~2x the per-row
    hashlib loop, and a NULL id yields NaN -> assigned to the last
    split / never sampled, matching the SQL's NULL CASE fall-through
    (the hashlib path hashed the string 'None' instead — a latent
    parity divergence). 16^12 < 2^53, so float64 buckets are exact."""
    con = _con()
    t = pa.table({"v": ids})
    con.register("_split_batch", t)
    try:
        out = con.execute(
            "SELECT ('0x' || substr(md5(v::VARCHAR), 1, 12))::UBIGINT AS b "
            "FROM _split_batch"
        ).arrow()
    finally:
        con.unregister("_split_batch")
    return out["b"].to_numpy(zero_copy_only=False).astype(np.float64)


def assign_splits(
    ds: ray.data.Dataset,
    id_col: str,
    fractions: dict[str, float],
    out_col: str = "split",
) -> ray.data.Dataset:
    """Append a split label column. ``fractions`` maps label -> fraction
    (must sum to 1.0); labels are assigned over cumulative thresholds in
    the given dict order."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1.0, got {total}")
    labels = list(fractions)
    cuts = np.cumsum([fractions[k] for k in labels]) * _SPACE

    def tag(b: pa.Table) -> pa.Table:
        buckets = md5_buckets(b[id_col])
        # NaN (null id) searchsorts past the end -> clamped to the last
        # label, matching the oracle's CASE fall-through on NULL
        idx = np.searchsorted(cuts, buckets, side="right")
        idx = np.minimum(idx, len(labels) - 1)  # guard the exact top edge
        return b.append_column(out_col, pa.array([labels[i] for i in idx], pa.string()))

    return ds.map_batches(tag, batch_format="pyarrow")


def quota_sample(
    ds: ray.data.Dataset,
    id_col: str,
    group_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
) -> ray.data.Dataset:
    """Deterministic per-group downsampling (domain mixing): keep a row
    iff its md5 bucket falls below the group's rate threshold — the same
    id-hash rule as assign_splits, so membership is a pure function of
    (id, group rate): stable across runs/engines, independently
    reproducible in SQL, and composable with splits (a sampled doc keeps
    its split). The rate table is tiny and ships inside the closure; no
    shuffle — a stateless streaming filter."""

    def keep(b: pa.Table) -> pa.Table:
        # NaN (null id) compares false -> never sampled, matching the
        # oracle's NULL CASE
        buckets = md5_buckets(b[id_col])
        rts = np.array(
            [rates.get(g, default_rate) for g in b[group_col].to_pylist()],
            dtype=np.float64,
        )
        return b.filter(pa.array(buckets < rts * _SPACE))

    return ds.map_batches(keep, batch_format="pyarrow")
