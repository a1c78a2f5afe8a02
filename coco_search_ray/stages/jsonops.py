"""Semi-structured (JSON) column operators — DuckDB as the vectorized
kernel inside ``map_batches``.

Arrow has no JSON-path compute kernel and a per-row ``json.loads`` loop
is exactly the hot-path shape this repo bans, so JSON field extraction
delegates to an embedded DuckDB connection per worker: the Arrow batch
registers ZERO-COPY, one SQL projection runs vectorized C++, and the
result column comes back as Arrow. The same ``json_extract`` expression
is the oracle's replay — kernel and oracle share the engine's JSON
semantics by construction.

Reference analog: the structured-metadata extraction the reference's
handlers attach per chunk (handlers/__init__.py:331-360 emits typed
metadata dicts); here the metadata column is already serialized JSON
and the operator projects typed fields out of it at scale.

Scale notes: the connection is built once per worker process (module
cache), registration is zero-copy, and ``preserve_insertion_order``
keeps row alignment with the input batch. Each task touches only its
own batch — no shared state, fuses with neighboring task stages.
"""

from __future__ import annotations

import re

import pyarrow as pa

_CON = None


def _con():
    global _CON
    if _CON is None:
        import duckdb

        _CON = duckdb.connect()
        # row order must stay aligned with the input batch: the result
        # column is appended positionally
        _CON.execute("SET preserve_insertion_order = true")
    return _CON


def _ident(name: str) -> str:
    return '"' + name.replace('"', '""') + '"'


# key splices into the JSON path literal and sql_type into the cast —
# neither position is quotable, so fail loudly on anything outside the
# shapes this operator supports (user-extension surface: loud guards)
_KEY_RE = re.compile(r"^[A-Za-z0-9_.-]+$", re.ASCII)
_TYPE_RE = re.compile(r"^[A-Za-z0-9_ ()\[\],]+$", re.ASCII)


def extract_json_field(
    batch: pa.Table,
    col: str,
    key: str,
    out: str,
    sql_type: str = "BIGINT",
) -> pa.Table:
    """Append ``out`` = json_extract(col, '$.key')::sql_type.

    Missing keys / malformed JSON yield null (DuckDB json_extract
    semantics — the oracle inherits them verbatim). Empty batches run
    through the same SQL so the appended column's type matches the
    non-empty blocks for ANY sql_type (a hand-mapped empty array only
    covered BIGINT/DOUBLE and would diverge the block schemas on e.g.
    VARCHAR)."""
    if not _KEY_RE.match(key):
        raise ValueError(f"extract_json_field: unsupported key {key!r} "
                         "(expected [A-Za-z0-9_.-]+; nested paths use '.')")
    if not _TYPE_RE.match(sql_type):
        raise ValueError(f"extract_json_field: unsupported sql_type {sql_type!r}")
    con = _con()
    src = batch.select([col])
    con.register("_json_batch", src)
    try:
        res = con.execute(
            f"SELECT json_extract({_ident(col)}, '$.{key}')::{sql_type} AS v "
            "FROM _json_batch"
        ).arrow()
    finally:
        con.unregister("_json_batch")
    return batch.append_column(out, res["v"])
