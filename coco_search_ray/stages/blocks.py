"""Block/hierarchy segmentation over structured (markdown-ish) text —
the analog of the reference's handler-emitted ``block_type`` /
``hierarchy`` chunk metadata (handlers/hcl.py:59-120,
handlers/__init__.py:331-360: each chunk carries its grammar block type
and enclosing-structure path). Closed-form line rules so a SQL oracle
replays them exactly:

  fence       line starting with ```
  code        any line INSIDE an open fence pair
  heading     ^#{1,6} + space (depth = number of '#')
  list_item   ^-  + space
  blank       empty line
  text        everything else

Every line also carries its ENCLOSING heading (the most recent heading
line at or above it, including the heading line itself) and that
heading's depth (0 when none yet) — the hierarchy column.
"""

from __future__ import annotations

import re

import pyarrow as pa

_HEADING_RE = re.compile(r"^(#{1,6}) (.*)$")

BLOCK_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("line_no", pa.int32()),
        ("block_type", pa.string()),
        ("heading", pa.string()),
        ("depth", pa.int32()),
    ]
)


def doc_blocks(batch: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """1->N explosion: one output row per LINE of each document with
    (block_type, enclosing heading, depth). Stateful only within a doc
    (fence parity + last heading), so any batching is correct."""
    ids = batch[id_col].to_pylist()
    texts = batch[text_col].to_pylist()
    o_id: list[int] = []
    o_line: list[int] = []
    o_type: list[str] = []
    o_head: list[str] = []
    o_depth: list[int] = []
    for did, text in zip(ids, texts):
        if not text:
            continue
        in_fence = False
        heading = ""
        depth = 0
        for ln, line in enumerate(text.split("\n")):
            if line.startswith("```"):
                btype = "fence"
                in_fence = not in_fence
            elif in_fence:
                btype = "code"
            elif line == "":
                btype = "blank"
            else:
                m = _HEADING_RE.match(line)
                if m:
                    btype = "heading"
                    heading = m.group(2)
                    depth = len(m.group(1))
                elif line.startswith("- "):
                    btype = "list_item"
                else:
                    btype = "text"
            o_id.append(did)
            o_line.append(ln)
            o_type.append(btype)
            o_head.append(heading)
            o_depth.append(depth)
    return pa.table(
        {
            "doc_id": pa.array(o_id, pa.int64()),
            "line_no": pa.array(o_line, pa.int32()),
            "block_type": pa.array(o_type, pa.string()),
            "heading": pa.array(o_head, pa.string()),
            "depth": pa.array(o_depth, pa.int32()),
        }
    )
