"""Config-file surface: a validated YAML config with environment
substitution — the reference's ``cocosearch.yaml`` shape (pydantic
schema config/schema.py:39-123; ``${VAR}`` / ``${VAR:-default}`` env
bridging config/env_substitution.py + config/resolver.py).

Loaded by the CLI (``job.py --config``) and usable programmatically:

    cfg = load_config("pipeline.yaml")
    build_kg(..., **cfg.kg_kwargs())

Unknown keys FAIL FAST (pydantic extra="forbid") — a typo'd option must
never be silently ignored.
"""

from __future__ import annotations

import os
import re

import yaml
from pydantic import BaseModel, Field

_ENV_RE = re.compile(r"\$\{(?P<name>[A-Za-z_][A-Za-z0-9_]*)(?::-(?P<default>[^}]*))?\}")


def substitute_env(value, env: dict[str, str] | None = None):
    """Recursively substitute ``${VAR}`` / ``${VAR:-default}`` in string
    values. An unset variable without a default raises (the reference
    fails configuration early rather than passing '' downstream)."""
    env = os.environ if env is None else env
    if isinstance(value, str):

        def repl(m: re.Match) -> str:
            name = m.group("name")
            if name in env:
                return env[name]
            if m.group("default") is not None:
                return m.group("default")
            raise KeyError(f"config references unset environment variable {name!r}")

        return _ENV_RE.sub(repl, value)
    if isinstance(value, dict):
        return {k: substitute_env(v, env) for k, v in value.items()}
    if isinstance(value, list):
        return [substitute_env(v, env) for v in value]
    return value


class ChunkingConfig(BaseModel, extra="forbid"):
    chunk_size: int = Field(1000, ge=1)
    chunk_overlap: int = Field(300, ge=0)


class EncoderConfig(BaseModel, extra="forbid"):
    name: str = "hash-sha256"
    dim: int = Field(768, ge=1)


class LinkingConfig(BaseModel, extra="forbid"):
    # reference retrieval constants (hybrid.py:29-37): copied exactly —
    # they define matching behavior and hence triple P/R
    rrf_k: int = Field(60, ge=1)
    definition_boost: float = Field(2.0, gt=0)
    prefetch_cap: int = Field(100, ge=1)
    min_score: float = Field(0.0, ge=0)


class CanonicalizationConfig(BaseModel, extra="forbid"):
    jaccard_threshold: float = Field(0.3, ge=0, le=1)
    max_bucket: int = Field(64, ge=2)


class KgConfig(BaseModel, extra="forbid"):
    conv_local_shards: bool = True
    two_phase: bool = True
    distributed_linkmap: bool | None = None
    concurrency: int | None = None
    # directories of user extractor modules (duck-typed, loaded per
    # worker — the reference's override-resolution surface)
    extractor_dirs: list[str] = []


class PipelineConfig(BaseModel, extra="forbid"):
    data_dir: str | None = None
    out_dir: str | None = None
    chunking: ChunkingConfig = ChunkingConfig()
    encoder: EncoderConfig = EncoderConfig()
    linking: LinkingConfig = LinkingConfig()
    canonicalization: CanonicalizationConfig = CanonicalizationConfig()
    kg: KgConfig = KgConfig()

    def kg_kwargs(self) -> dict:
        """kwargs for pipelines.kg.build_kg (incl. the linking constants
        threaded into every EntityIndex the build creates)."""
        return {
            "conv_local_shards": self.kg.conv_local_shards,
            "two_phase": self.kg.two_phase,
            "distributed_linkmap": self.kg.distributed_linkmap,
            "concurrency": self.kg.concurrency,
            "extractor_dirs": list(self.kg.extractor_dirs),
            "link_params": self.link_params(),
        }

    def link_params(self) -> dict:
        """EntityIndex retrieval constants (linking section)."""
        return {
            "rrf_k": self.linking.rrf_k,
            "boost": self.linking.definition_boost,
            "prefetch_cap": self.linking.prefetch_cap,
        }

    def canon_params(self) -> dict:
        """canonical_mapping kwargs (canonicalization section)."""
        return {
            "threshold": self.canonicalization.jaccard_threshold,
            "max_bucket": self.canonicalization.max_bucket,
        }

    def chunk_kwargs(self) -> dict:
        """stages.chunking.chunk_documents kwargs (chunking section)."""
        return {
            "chunk_size": self.chunking.chunk_size,
            "chunk_overlap": self.chunking.chunk_overlap,
        }


def load_config(path: str, env: dict[str, str] | None = None) -> PipelineConfig:
    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    return PipelineConfig.model_validate(substitute_env(raw, env))


# ---------------------------------------------------------------------------
# Config generator / onboarding (reference config/generator.py:85-97
# generate_config writes a documented template and refuses to overwrite;
# this batch-engine analog also INSPECTS the data directory — shard
# count / size, catalog breadth, conversation-disjointness — and bakes
# the findings into the generated values and comments)
# ---------------------------------------------------------------------------


def _inspect_data_dir(data_dir: str, max_probe_files: int = 64) -> dict:
    """Deterministic inspection: shard count + bytes, catalog rows, and
    a conv-disjointness probe (the property the zero-shuffle assembly
    fast path and the resumable runner rely on). The probe reads the
    conv_id column of up to ``max_probe_files`` shards; when the dir is
    larger than that the result is UNVERIFIED (None) — the generator
    must then emit the safe conv_local_shards: false, because a
    wrongly-true value silently produces partial-conversation triples."""
    import os

    import pyarrow.parquet as pq

    from .sources.synth import transcript_files

    files = transcript_files(data_dir)
    total_bytes = sum(os.path.getsize(f) for f in files)
    catalog_rows = None
    cat = os.path.join(data_dir, "catalog.parquet")
    if os.path.exists(cat):
        catalog_rows = pq.read_metadata(cat).num_rows
    conv_disjoint: bool | None = None
    if len(files) >= 2:
        seen: set = set()
        conv_disjoint = True
        for f in files[:max_probe_files]:
            convs = set(pq.read_table(f, columns=["conv_id"])["conv_id"].to_pylist())
            if seen & convs:
                conv_disjoint = False
                break
            seen |= convs
        if conv_disjoint and len(files) > max_probe_files:
            conv_disjoint = None  # probe window exhausted: unverified
    return {
        "n_files": len(files),
        "total_bytes": total_bytes,
        "catalog_rows": catalog_rows,
        "conv_disjoint": conv_disjoint,
    }


def generate_config(data_dir: str, out_path: str) -> str:
    """Write a documented, VALIDATED pipeline config for ``data_dir``.

    Refuses to overwrite (reference generator raises ConfigError on an
    existing file); the generated file round-trips through load_config
    before being reported, so a bad template can never be emitted."""
    import os

    if os.path.exists(out_path):
        raise FileExistsError(f"configuration file already exists: {out_path}")
    info = _inspect_data_dir(data_dir)
    # only a FULLY VERIFIED disjointness probe may enable the
    # zero-shuffle fast path; unknown (single shard / probe window
    # exhausted) gets the safe general path and a comment telling the
    # user how to flip it after verifying
    conv_local = info["conv_disjoint"] is True or info["n_files"] == 1
    gib = info["total_bytes"] / (1 << 30)
    cat = info["catalog_rows"]
    text = f"""\
# coco_search_ray pipeline configuration (generated)
# data inspected: {info['n_files']} transcript shards, {gib:.2f} GiB,
# catalog rows: {cat if cat is not None else 'NO catalog.parquet found'},
# conversation-disjoint shards: {info['conv_disjoint']}
#   (None = unverified: probe window exhausted -> the generator writes
#   the SAFE conv_local_shards: false; a SINGLE shard is trivially
#   conv-local and keeps true. Flip false to true only after verifying
#   your ingest partitions by conv.)

data_dir: {data_dir}
out_dir: {os.path.normpath(data_dir)}_kg

kg:
  # zero-shuffle per-file assembly; valid ONLY while a conversation
  # never spans input files (probe above said {info['conv_disjoint']})
  conv_local_shards: {str(conv_local).lower()}
  # link each DISTINCT mention once, broadcast the map (two_phase);
  # above ~2M distinct surfaces the build escalates to a distributed
  # linkmap join automatically — or force it here
  two_phase: true
  distributed_linkmap: null
  # per-stage parallelism; null = size to the cluster automatically
  concurrency: null
  # directories of drop-in extractor family modules (see examples/)
  extractor_dirs: []

linking:
  # reference retrieval constants (hybrid fusion); changing these
  # changes which surface forms link, hence triple precision/recall
  rrf_k: 60
  definition_boost: 2.0
  prefetch_cap: 100
  min_score: 0.0

canonicalization:
  jaccard_threshold: 0.3
  max_bucket: 64

chunking:
  chunk_size: 1000
  chunk_overlap: 300

encoder:
  name: hash-sha256
  dim: 768
"""
    with open(out_path, "w") as f:
        f.write(text)
    load_config(out_path)  # fail loudly if the template ever drifts
    return out_path
