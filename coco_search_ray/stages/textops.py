"""Text-analysis stages over a documents table: token counting, quality
scoring, language ID, fingerprinting. All stateless map_batches with the
pure kernels from functions/text.py / functions/hashing.py.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.hashing import rolling_fingerprints, simhash64
from ..functions.text import (
    _TOKEN_RE,
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


def unigram_logprob_scores(
    ds, text_col: str = "text", id_col: str = "doc_id"
) -> "ray.data.Dataset":
    """Corpus-trained unigram log-probability per document — the
    perplexity-filter shape for training-data quality: two passes,
    (1) per-block token histograms -> groupby(token) sum -> the unigram
    model (vocabulary is bounded; at web scale keep top-K + an OOV floor
    — documented scale path), (2) broadcast the logprob table and score
    each doc as sum(log p(token)) over its tokens. Docs with no tokens
    emit nothing (matching the SQL oracle's join semantics)."""
    import math

    import numpy as np
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    from ..functions.broadcast import deref_cached

    def block_counts(batch: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for t in batch[text_col].to_pylist():
            c.update(w.lower() for w in _TOKEN_RE.findall(t or ""))
        return pa.table(
            {
                "token": pa.array(list(c.keys()), pa.string()),
                "n": pa.array(list(c.values()), pa.int64()),
            }
        )

    counts = (
        ds.map_batches(block_counts, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    total = float(counts["n"].sum())
    logprob = {t: math.log(n / total) for t, n in zip(counts["token"], counts["n"])}
    lp_ref = ray.put(logprob)

    def score(batch: pa.Table) -> pa.Table:
        lp = deref_cached(lp_ref)
        o_lp, o_n = [], []
        keep_cols = [c for c in batch.schema.names if c not in (text_col,)]
        rows_keep = []
        for i, t in enumerate(batch[text_col].to_pylist()):
            toks = [w.lower() for w in _TOKEN_RE.findall(t or "")]
            if not toks:
                continue
            rows_keep.append(i)
            o_lp.append(float(np.sum([lp[w] for w in toks])))
            o_n.append(len(toks))
        sub = batch.take(rows_keep).select(keep_cols)
        return sub.append_column("logprob", pa.array(o_lp, pa.float64())).append_column(
            "n_tokens", pa.array(o_n, pa.int64())
        )

    return ds.map_batches(score, batch_format="pyarrow")


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
