"""Text-analysis stages over a documents table: token counting, quality
scoring, language ID, fingerprinting. All stateless map_batches with the
pure kernels from functions/text.py / functions/hashing.py.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.hashing import rolling_fingerprints, simhash64
from ..functions.text import (
    bpe_ish_token_count,
    detect_language,
    quality_features,
    token_count,
)
from ..functions.tokenize import enrich_text_tokens


def doc_features(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """token counts + quality signals + heuristic language, one pass."""
    texts = batch[text_col].to_pylist()
    n_tokens, n_bpe, langs = [], [], []
    punct, stopr, mwl, upper = [], [], [], []
    for t in texts:
        t = t or ""
        n_tokens.append(token_count(t))
        n_bpe.append(bpe_ish_token_count(t))
        langs.append(detect_language(t))
        q = quality_features(t)
        punct.append(q["punct_ratio"])
        stopr.append(q["stopword_ratio"])
        mwl.append(q["mean_word_len"])
        upper.append(q["upper_ratio"])
    return (
        batch.append_column("n_tokens", pa.array(n_tokens, pa.int64()))
        .append_column("n_bpe_tokens", pa.array(n_bpe, pa.int64()))
        .append_column("lang_detected", pa.array(langs, pa.string()))
        .append_column("punct_ratio", pa.array(punct, pa.float64()))
        .append_column("stopword_ratio", pa.array(stopr, pa.float64()))
        .append_column("mean_word_len", pa.array(mwl, pa.float64()))
        .append_column("upper_ratio", pa.array(upper, pa.float64()))
    )


def doc_fingerprints(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """1->N explosion: one row per winnowed rolling-hash fingerprint.
    (Document fingerprinting for copy detection; fingerprints shared by
    two docs indicate overlapping passages.)"""
    ids = batch[id_col].to_pylist()
    texts = batch[text_col].to_pylist()
    o_id, o_fp = [], []
    for i, t in zip(ids, texts):
        for fp in rolling_fingerprints(t or ""):
            o_id.append(i)
            o_fp.append(fp)
    return pa.table(
        {
            id_col: pa.array(o_id, pa.int64()),
            "fingerprint": pa.array(o_fp, pa.uint64()),
        }
    )


def doc_simhash(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    ids = batch[id_col].to_pylist()
    texts = batch[text_col].to_pylist()
    sh = [simhash64([t.lower() for t in enrich_text_tokens(x or "")]) for x in texts]
    return pa.table(
        {
            id_col: pa.array(ids, pa.int64()),
            "simhash": pa.array(sh, pa.uint64()),
        }
    )
