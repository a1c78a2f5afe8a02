"""M0 — turn normalization: stateless, zero-copy Arrow map_batches.

Conservative by design: role/tool are trimmed + case-folded, text is
PRESERVED BYTE-FOR-BYTE (the per-row invariant is per-turn text equality
under stable ordering — normalization must never rewrite text). Adds a
``turn_uid`` provenance column. Reference analog: the per-file
language/extension normalization pass before chunking
(indexer/embedder.py:26-55) — cheap column derivations, no state.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_VALID_ROLES = {"user", "assistant", "tool", "system"}


def normalize_turns(batch: pa.Table, with_uid: bool = True) -> pa.Table:
    names = set(batch.schema.names)
    # rows with no conversation key or a negative/null turn index are
    # unattributable — drop them up front (vectorized, no-op on clean
    # data). Downstream the conv-local assembly fuses tk = code*T + turn
    # assuming turn >= 0 and a non-null conv code; feeding it such rows
    # would misattribute triples or crash (round-5 review finding). The
    # oracle applies the identical filter.
    valid = pc.and_(
        pc.is_valid(batch["conv_id"]),
        pc.fill_null(pc.greater_equal(batch["turn_idx"], pa.scalar(0)), False),
    )
    if pc.all(valid).as_py() is not True and batch.num_rows:
        batch = batch.filter(valid)
    cols = {"conv_id": batch["conv_id"], "turn_idx": batch["turn_idx"]}
    if "role" in names:  # pruned away on the KG hot path (never consumed)
        # explicit ASCII trim set + ASCII lower: Arrow utf8_trim_whitespace
        # strips \t/\n where DuckDB's default trim does not (it strips Zs
        # spaces like NBSP instead), and utf8_lower diverges from DuckDB
        # lower() on 43 newer-Unicode letters — the oracle replays the same
        # explicit set + 26-char translate (round-5 finding)
        role = pc.ascii_lower(pc.utf8_trim(batch["role"], characters=" \t\n\r\f\v"))
        # unexpected roles -> "other" (skip-and-log semantics: bad records
        # are normalized, never dropped silently; reference flow.py:446-448)
        role_ok = pc.is_in(role, value_set=pa.array(sorted(_VALID_ROLES)))
        cols["role"] = pc.if_else(role_ok, role, pa.scalar("other"))

    tool = pc.ascii_lower(pc.utf8_trim(batch["tool"], characters=" \t\n\r\f\v"))
    tool = pc.if_else(pc.is_valid(tool), tool, pa.scalar(""))
    tool = pc.if_else(pc.equal(tool, pa.scalar("none")), pa.scalar(""), tool)

    cols["text"] = batch["text"]
    cols["tool"] = tool
    if "ts" in names:  # ditto
        cols["ts"] = batch["ts"]
    if with_uid:
        # provenance uid — skipped on the KG hot path (the extraction
        # stage drops it immediately; building 10^7 string concats per
        # block of work for a discarded column is pure waste)
        cols["turn_uid"] = pc.binary_join_element_wise(
            batch["conv_id"], pc.cast(batch["turn_idx"], pa.string()), "#"
        )
    return pa.table(cols)
