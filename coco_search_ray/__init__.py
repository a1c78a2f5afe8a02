"""coco_search_ray — a Ray-Data-native knowledge-graph construction engine.

A from-scratch re-expression of the capabilities of the reference system
(VioletCranberry/coco-search, a local-first hybrid semantic search +
dependency-graph tool) as a distributed Ray Data pipeline over Parquet
transcript tables:

    read_parquet(transcripts)
      -> normalize (stateless map_batches, zero-copy Arrow)
      -> mention/triple extraction (1->N row explosion)
      -> entity linking (actor pool: dense hash-embedding cosine top-k
         + keyword BM25 top-k fused via RRF(k=60) + canonical boost x2)
      -> canonicalization (MinHash-blocked union-find over alias pairs)
      -> exact dedup + partitioned Parquet materialization with
         per-partition lineage manifests (checkpoint/resume)

Layout:
    functions/  pure, deterministic scalar/vector kernels (tokenizer,
                hash embeddings, MinHash/SimHash, RRF) shared by the Ray
                pipeline AND the single-process oracle so parity tests
                compare execution, not math.
    sources/    parquet readers + deterministic synthetic generators
                (transcripts, entity catalog) per FIXTURES.md.
    stages/     Ray Data stage implementations (map_batches bodies,
                actor-pool classes, shuffle compositions).
    pipelines/  end-to-end compositions (the KG build, doc analytics,
                dedup suites, ANN).
    state/      lineage manifests, checkpoint/resume helpers.
    oracle/     single-process reference-semantics reimplementation used
                as the golden oracle for P/R >= 0.95 parity tests.
"""

__version__ = "0.1.0"
