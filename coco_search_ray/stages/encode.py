"""Embedding stage: an actor-pool encoder over a text column.

Mirrors the reference's embedding stage shape (indexer/embedder.py:
146-195): the model is loaded ONCE per actor (__init__), texts are
encoded in sub-batches of 128 (the reference's API sub-batch constant,
embedder.py:166) with the embedding-input context prefix
("File: {path}\\n" in the reference, add_filename_context embedder.py:
58-76 — stored text stays raw, only the ENCODER input is enriched).

Encoders are pluggable:
- "hash" (default): the deterministic SHA-256 768-d scheme
  (functions/hashing.py) — test/parity mode, no external model;
- any callable(list[str]) -> np.ndarray via ``encoder_factory`` — a real
  sentence-transformer drops in here; the container has no model, so the
  real path stays behind the factory seam.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import EMBED_DIM, hash_embeddings

ENCODE_SUB_BATCH = 128


def add_context_prefix(text: str, context: str | None) -> str:
    """Embedding-input enrichment; output text stays raw."""
    return f"{context}\n{text}" if context else text


class EncoderActor:
    """map_batches(EncoderActor, concurrency=N, batch_size=B) — appends a
    fixed_size_list<float32> embedding column."""

    def __init__(
        self,
        text_col: str = "text",
        context_col: str | None = None,
        out_col: str = "embedding",
        dim: int = EMBED_DIM,
        encoder_factory=None,
    ):
        self.text_col = text_col
        self.context_col = context_col
        self.out_col = out_col
        self.dim = dim
        # model load happens once per actor, here
        self.encode = encoder_factory() if encoder_factory else (
            lambda texts: hash_embeddings(texts, dim)
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        if self.context_col is not None:
            ctxs = batch[self.context_col].to_pylist()
            texts = [add_context_prefix(t or "", c) for t, c in zip(texts, ctxs)]
        else:
            texts = [t or "" for t in texts]
        outs = []
        for lo in range(0, len(texts), ENCODE_SUB_BATCH):
            outs.append(self.encode(texts[lo : lo + ENCODE_SUB_BATCH]))
        vecs = (
            np.concatenate(outs, axis=0)
            if outs
            else np.empty((0, self.dim), dtype=np.float32)
        )
        arr = pa.FixedSizeListArray.from_arrays(
            pa.array(vecs.astype(np.float32).ravel(), pa.float32()), self.dim
        )
        return batch.append_column(self.out_col, arr)


def encode_dataset(
    ds,
    text_col: str = "text",
    context_col: str | None = None,
    concurrency=None,
    batch_size: int = 1024,
    **kwargs,
):
    from ..functions.concurrency import auto_pool

    return ds.map_batches(
        EncoderActor,
        fn_constructor_kwargs={"text_col": text_col, "context_col": context_col, **kwargs},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or auto_pool(),
        num_cpus=1,
    )
