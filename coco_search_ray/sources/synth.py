"""Deterministic synthetic transcripts + entity catalog (FIXTURES.md F1/F2).

The transcripts table has exactly the authoritative input shape from
BASELINE.json input_hint: (conv_id:string, turn_idx:int32, role:string,
text:string, tool:string, ts:timestamp[us]). Everything is seeded
(seed=42 convention) and pure-function deterministic: same args -> byte
identical tables. No external data.

Design notes (exercised failure modes):
- conv sizes are Zipf-ish: ~1% head conversations hold ~30% of turns
  (skew for the groupby(conv_id) stage / salting story);
- tool names are heavily skewed (two tools dominate) per the north rule;
- rows are written SHUFFLED within each file so the stable-turn-ordering
  logic is actually exercised;
- files are partitioned by conversation (a conv never spans files), which
  is the property the resumable runner relies on (conv-local shards);
- mention surface forms cover canonical names, camelCase / snake_case /
  PascalCase aliases and case-mangled variants so identifier-splitting
  parity (reference tsvector.py:17-50) is covered;
- every ~20th entity has a near-duplicate sibling sharing aliases, which
  drives MinHash blocking + union-find canonicalization.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
EPOCH_US = 1_700_000_000_000_000  # fixed base timestamp (us)

TOOLS = [
    "search", "browser", "bash", "python", "editor", "calculator",
    "mail", "calendar", "db", "api", "files", "chat",
]
# heavily skewed: first two dominate
TOOL_WEIGHTS = np.array([0.35, 0.30, 0.06, 0.06, 0.05, 0.04, 0.04, 0.03, 0.03, 0.02, 0.01, 0.01])

ENTITY_TYPES = ["person", "service", "tool", "concept"]

_VOCAB = [
    "payment", "billing", "invoice", "ledger", "account", "profile", "session",
    "token", "gateway", "router", "worker", "queue", "stream", "batch",
    "report", "metric", "signal", "alert", "policy", "quota", "budget",
    "catalog", "index", "search", "query", "cache", "store", "bucket",
    "shard", "replica", "cluster", "node", "agent", "planner", "runner",
    "parser", "linker", "mapper", "reducer", "sorter", "filter", "window",
    "vector", "graph", "triple", "entity", "mention", "alias", "record",
    "schema", "column", "table", "partition", "manifest", "checkpoint",
]

# member-path segments for qualified-name material (mixed shapes: plain
# words, snake, camel — the extractor accepts any word-char tail)
_QUAL_MEMBERS = [
    "run", "init", "refresh", "validate", "process_item", "handleEvent",
    "flush", "retry_all", "computeScore", "close",
]

_FILLER = (
    "then the user asked about status and we checked the logs before "
    "running another step to confirm the result was stable and correct "
    "after which a summary was produced for review by the team"
).split()


def _two_words(rng: np.random.RandomState) -> tuple[str, str]:
    i = rng.randint(0, len(_VOCAB))
    j = rng.randint(0, len(_VOCAB) - 1)
    if j >= i:
        j += 1
    return _VOCAB[i], _VOCAB[j]


def _entity_forms(w1: str, w2: str) -> dict[str, str]:
    return {
        "canonical": f"{w1.capitalize()} {w2.capitalize()}",
        "camel": w1 + w2.capitalize(),
        "snake": f"{w1}_{w2}",
        "pascal": w1.capitalize() + w2.capitalize(),
        "kebab": f"{w1}-{w2}",
    }


def generate_catalog(n_entities: int = 1000, seed: int = SEED) -> pa.Table:
    """Entity catalog (FIXTURES F2): entity_id, canonical_name,
    aliases:list<string>, entity_type, description."""
    rng = np.random.RandomState(seed + 1)
    ids, names, aliases, types, descs = [], [], [], [], []
    j = 0
    while len(ids) < n_entities:
        w1, w2 = _two_words(rng)
        forms = _entity_forms(w1, w2)
        etype = ENTITY_TYPES[rng.randint(0, len(ENTITY_TYPES))]
        # choose 1-4 aliases deterministically
        alias_pool = [forms["camel"], forms["snake"], forms["pascal"], forms["kebab"]]
        n_alias = 1 + rng.randint(0, 4)
        al = alias_pool[:n_alias]
        w3, w4 = _two_words(rng)
        ids.append(f"E{j:06d}")
        names.append(forms["canonical"])
        aliases.append(al)
        types.append(etype)
        descs.append(f"{forms['canonical']} is a {etype} handling {w3} {w4} work")
        j += 1
        # near-duplicate sibling sharing aliases (drives union-find merge)
        if j % 20 == 1 and len(ids) < n_entities:
            ids.append(f"E{j:06d}")
            names.append(f"{w1.capitalize()} {w2.capitalize()}s")
            aliases.append(al[: max(1, len(al) - 1)] + [f"{w1}_{w2}_v2"])
            types.append(etype)
            descs.append(f"{forms['canonical']}s is a {etype} handling {w3} {w4} work")
            j += 1
    return pa.table(
        {
            "entity_id": pa.array(ids, pa.string()),
            "canonical_name": pa.array(names, pa.string()),
            "aliases": pa.array(aliases, pa.list_(pa.string())),
            "entity_type": pa.array(types, pa.string()),
            "description": pa.array(descs, pa.string()),
        }
    )


def catalog_surface_pool(catalog: pa.Table) -> list[str]:
    """All linkable surface forms (canonical + aliases), catalog order."""
    pool: list[str] = []
    names = catalog.column("canonical_name").to_pylist()
    aliases = catalog.column("aliases").to_pylist()
    for nm, al in zip(names, aliases):
        pool.append(nm)
        pool.extend(al)
    return pool


def _generate_shard(
    out_dir: str,
    si: int,
    num_files: int,
    n_convs: int,
    turns_target: int,
    pool: list[str],
    seed: int,
) -> str:
    """Generate one conv-disjoint shard file (deterministic per (params,
    shard index) — shards are independent so generation parallelizes)."""
    rng = np.random.RandomState(seed + 1000 + si)
    n_head = max(1, n_convs // 100)
    head_mean = max(4, int(0.30 * turns_target / n_head))
    tail_mean = max(2, int(0.70 * turns_target / max(1, n_convs - n_head)))
    roles = ["user", "assistant", "tool"]
    n_filler = len(_FILLER)
    # qualified-name material: identifier-shaped pool surfaces (snake /
    # camel / pascal — the forms whose ROOT the qualified family links)
    # get a dotted member path appended (drives extractors/qualified.py)
    from ..functions.mentions import _is_identifier_mention

    qpool = [s for s in pool if "." not in s and _is_identifier_mention(s)]
    n_qpool = max(1, len(qpool))

    shard: dict[str, list] = {k: [] for k in ("conv_id", "turn_idx", "role", "text", "tool", "ts")}
    for ci in range(si, n_convs, num_files):
        conv_id = f"conv-{ci:08d}"
        if ci < n_head:
            length = rng.randint(max(2, head_mean // 2), head_mean * 2)
        else:
            length = rng.randint(max(1, tail_mean // 2), tail_mean * 2 + 1)
        fill_off = rng.randint(0, n_filler)
        for ti in range(int(length)):
            role = roles[(ti + (ci % 3)) % 3]
            tool = "" if role == "user" else TOOLS[rng.choice(len(TOOLS), p=TOOL_WEIGHTS)]
            n_mentions = int(rng.choice(4, p=[0.25, 0.35, 0.25, 0.15]))
            words: list[str] = []
            for k in range(3 + (ti % 3)):
                words.append(_FILLER[(fill_off + ti * 3 + k) % n_filler])
            for _ in range(n_mentions):
                surface = pool[rng.randint(0, len(pool))]
                if rng.rand() < 0.10 and "_" in surface:
                    surface = surface.capitalize()  # case-mangled variant
                words.append(surface)
                words.append(_FILLER[(fill_off + len(words)) % n_filler])
            # literal-family material: quoted phrases and URLs (drive the
            # quoted_phrases / urls extractor families)
            if rng.rand() < 0.15:
                w = _VOCAB[rng.randint(0, len(_VOCAB))]
                w2 = _VOCAB[rng.randint(0, len(_VOCAB))]
                words.append(f'"{w} {w2} step"')
            if rng.rand() < 0.10:
                w = _VOCAB[rng.randint(0, len(_VOCAB))]
                words.append(f"https://svc.example/{w}")
            if rng.rand() < 0.06:
                w = _VOCAB[rng.randint(0, len(_VOCAB))]
                words.append(f"/var/log/{w}.log")
            if rng.rand() < 0.05:
                w = _VOCAB[rng.randint(0, len(_VOCAB))]
                words.append(f"{w}@svc.example")
            if rng.rand() < 0.05:
                words.append(f"v{rng.randint(0, 4)}.{rng.randint(0, 10)}.{rng.randint(0, 20)}")
            if qpool and rng.rand() < 0.08:
                root = qpool[rng.randint(0, n_qpool)]
                member = _QUAL_MEMBERS[rng.randint(0, len(_QUAL_MEMBERS))]
                if rng.rand() < 0.25:  # some paths nest two levels deep
                    member = f"{member}.{_QUAL_MEMBERS[rng.randint(0, len(_QUAL_MEMBERS))]}"
                words.append(f"{root}.{member}")
            # markdown link / wiki-ref material (drives
            # extractors/md_links.py); the http variant belongs to the
            # urls family and is excluded by md_links on both sides
            if rng.rand() < 0.05:
                w = _VOCAB[rng.randint(0, len(_VOCAB))]
                style = rng.randint(0, 6)
                if style == 0:
                    words.append(f"[{w} docs](docs/{w}.md)")
                elif style == 1:
                    words.append(f"[[{w}_notes]]")
                elif style == 2:
                    words.append(f"[api](https://svc.example/{w})")
                elif style == 3:
                    # fragment target: cleaned to docs/{w}.md (the
                    # reference's _validate_link_path fragment strip)
                    words.append(f"[{w} sec](docs/{w}.md#usage)")
                elif style == 4:
                    words.append(f"[mail](mailto:{w}@svc.example)")
                else:
                    words.append("[top](#overview)")
            # import-statement material (drives extractors/imports.py):
            # python from/import, dotted import, require(), ES import
            if qpool and rng.rand() < 0.06:
                root = qpool[rng.randint(0, n_qpool)]
                member = _QUAL_MEMBERS[rng.randint(0, len(_QUAL_MEMBERS))]
                style = rng.randint(0, 6)
                if style == 0:
                    words.append(f"from {root} import {member} then")
                elif style == 1:
                    words.append(f"import {root}.{member}")
                elif style == 2:
                    words.append(f"require('{root}')")
                elif style == 3:
                    words.append(f"import {{ {member} }} from '{root}'")
                elif style == 4:
                    # leading newline: rule 5 is statement-start anchored
                    # (a mid-prose 'import x as y' is NOT a statement)
                    words.append(f"\nimport {root} as {member}")
                else:
                    words.append(f"from .{root} import {member} now")
            # Go import-declaration material (drives
            # extractors/go_imports.py — the reference's go.py
            # single/grouped/aliased/blank import_spec forms); the
            # comment line inside the grouped block exercises the
            # line-anchored item skip
            if rng.rand() < 0.04:
                w = _VOCAB[rng.randint(0, len(_VOCAB))]
                w2 = _VOCAB[rng.randint(0, len(_VOCAB))]
                style = rng.randint(0, 6)
                if style == 0:
                    words.append(f'import "{w}/{w2}"')
                elif style == 1:
                    words.append(f'import {w} "example.com/{w}/{w2}"')
                elif style == 2:
                    words.append(f'import _ "{w}/driver"')
                elif style == 3:
                    words.append(f'import . "{w}"')
                elif style == 4:
                    words.append(
                        f'import (\n\t"{w}"\n\t{w2} "example.com/{w}/{w2}"\n)'
                    )
                else:
                    words.append(
                        f'import (\n\t// {w} helpers\n\t"{w}/{w2}"\n\t_ "{w2}/driver"\n)'
                    )
            # container-image refs (drives extractors/images.py): yaml
            # image: keys + Dockerfile FROM lines (the reference's
            # docker_compose / gitlab_ci / helm image shapes)
            if rng.rand() < 0.05:
                w = _VOCAB[rng.randint(0, len(_VOCAB))]
                w2 = _VOCAB[rng.randint(0, len(_VOCAB))]
                style = rng.randint(0, 3)
                if style == 0:
                    words.append(f"image: {w}/{w2}:{rng.randint(0, 4)}.{rng.randint(0, 20)}")
                elif style == 1:
                    words.append(f"FROM {w}:{rng.randint(0, 4)}.{rng.randint(0, 20)}")
                else:
                    words.append(f"image: registry.example/{w}/{w2}:latest")
            # symbol-definition material (drives extractors/symbols.py):
            # per-language def / class / function / func / Go-receiver /
            # fn / struct statements (the tree-sitter symbol surface)
            if qpool and rng.rand() < 0.06:
                name = qpool[rng.randint(0, n_qpool)]
                style = rng.randint(0, 7)
                if style == 0:
                    words.append(f"def {name}(x):")
                elif style == 1:
                    words.append(f"class {name.capitalize()}:")
                elif style == 2:
                    words.append(f"function {name}(ev)")
                elif style == 3:
                    words.append(f"func {name.capitalize()}(ctx)")
                elif style == 4:
                    meth = _VOCAB[rng.randint(0, len(_VOCAB))]
                    words.append(f"func (s *{name.capitalize()}) {meth.capitalize()}(ctx)")
                elif style == 5:
                    words.append(f"fn {name}(input)")
                else:
                    words.append(f"struct {name.capitalize()} {{ field }}")
            # CI action refs (drives extractors/ci_uses.py): the
            # github_actions uses: owner/repo@version + local ./workflow
            if rng.rand() < 0.04:
                w = _VOCAB[rng.randint(0, len(_VOCAB))]
                w2 = _VOCAB[rng.randint(0, len(_VOCAB))]
                if rng.rand() < 0.3:
                    words.append(f"uses: ./.ci/{w}.yml")
                else:
                    words.append(f"uses: {w}/{w2}-action@v{rng.randint(1, 9)}")
            # HCL block declarations (drives extractors/hcl_blocks.py):
            # resource/data blocks; identifier-shaped pool types link,
            # plain prose-word types exercise the shape-gate drop path
            if qpool and rng.rand() < 0.04:
                w = _VOCAB[rng.randint(0, len(_VOCAB))]
                kw = "resource" if rng.rand() < 0.7 else "data"
                if rng.rand() < 0.2:
                    words.append(f'{kw} "{w}" "{w}01" {{')
                else:
                    rtype = qpool[rng.randint(0, n_qpool)]
                    words.append(f'{kw} "{rtype}" "{w}-{rng.randint(0, 9)}" {{')
            # GitLab CI config material (drives extractors/gitlab_ci.py
            # include/local/template + extractors/ci_extends.py)
            if rng.rand() < 0.04:
                w = _VOCAB[rng.randint(0, len(_VOCAB))]
                style = rng.randint(0, 4)
                if style == 0:
                    words.append(f"include: ci/{w}.yml")
                elif style == 1:
                    words.append(f"local: /templates/{w}.yaml")
                elif style == 2:
                    words.append(f"template: {w.capitalize()}.gitlab-ci.yml")
                else:
                    words.append(f"extends: .{w}-base")
            # Helm named-template refs (drives extractors/helm_tpl.py);
            # include vs template forms, with and without the '-' trim
            if rng.rand() < 0.03:
                w = _VOCAB[rng.randint(0, len(_VOCAB))]
                w2 = _VOCAB[rng.randint(0, len(_VOCAB))]
                if rng.rand() < 0.5:
                    words.append(f'{{{{ include "{w}.{w2}" . }}}}')
                else:
                    words.append(f'{{{{- template "{w}.{w2}" }}}}')
            # ArgoCD manifest material (drives extractors/argocd.py):
            # the reference's Application repoURL/chart/path/project
            # shapes, https and git@ repo forms
            if rng.rand() < 0.04:
                w = _VOCAB[rng.randint(0, len(_VOCAB))]
                w2 = _VOCAB[rng.randint(0, len(_VOCAB))]
                style = rng.randint(0, 5)
                if style == 0:
                    words.append(f"repoURL: https://git.example.com/{w}/{w2}.git")
                elif style == 1:
                    words.append(f"repoURL: git@git.example.com:{w}/{w2}.git")
                elif style == 2:
                    words.append(f"chart: {w}-{w2}")
                elif style == 3:
                    words.append(f"path: apps/{w}")
                else:
                    words.append(f"project: {w}")
            # reference-style markdown links (drives extractors/
            # md_refs.py): usage + line-anchored definition in the same
            # turn; collapsed, image, http-external and dangling
            # variants exercise the fold/skip paths
            if rng.rand() < 0.04:
                w = _VOCAB[rng.randint(0, len(_VOCAB))]
                w2 = _VOCAB[rng.randint(0, len(_VOCAB))]
                style = rng.randint(0, 5)
                if style == 0:
                    words.append(f"see [{w2} guide][{w}] then")
                    words.append(f"\n[{w}]: docs/{w}-{w2}.md")
                elif style == 1:
                    words.append(f"![{w2} diagram][{w}-img]")
                    words.append(f"\n[{w}-img]: assets/{w}.png")
                elif style == 2:
                    # definition target carries a fragment: resolution
                    # then strips it (clean_target on both sides)
                    words.append(f"[{w.capitalize()}][]")
                    words.append(f"\n[{w}]: guides/{w2}/{w}.md#setup")
                elif style == 3:
                    words.append(f"[{w2} api][{w}-ext]")
                    words.append(f"\n[{w}-ext]: https://svc.example/{w}")
                else:
                    words.append(f"[{w2} notes][{w}-missing]")
            # code-span / comment-line path material (drives
            # extractors/md_code_paths.py — the reference's
            # doc_inline_code + doc_code_block surfaces); the last
            # style exercises the _looks_like_path reject
            if rng.rand() < 0.04:
                w = _VOCAB[rng.randint(0, len(_VOCAB))]
                w2 = _VOCAB[rng.randint(0, len(_VOCAB))]
                style = rng.randint(0, 6)
                if style == 0:
                    words.append(f"`src/{w}/{w2}.py`")
                elif style == 1:
                    words.append(f"`{w}.rs`")
                elif style == 2:
                    words.append(f"\n# see src/{w}/{w2}.py for details")
                elif style == 3:
                    words.append(f"\n// config lives in conf/{w}.yaml now")
                elif style == 4:
                    words.append(f"\n-- from sql/{w}.sql migration")
                else:
                    words.append(f"`{w}({w2})`")
            # frontmatter depends-list material (drives
            # extractors/md_frontmatter.py): file + directory entries,
            # sometimes fenced by --- like real frontmatter
            if rng.rand() < 0.03:
                w = _VOCAB[rng.randint(0, len(_VOCAB))]
                w2 = _VOCAB[rng.randint(0, len(_VOCAB))]
                style = rng.randint(0, 3)
                if style == 0:
                    words.append(f"\n---\ndepends:\n  - src/{w}.py\n  - {w2}/\n---")
                elif style == 1:
                    words.append(f"\ndepends:\n  - conf/{w}.yaml")
                else:
                    words.append(f"\ndepends:\n  - src/{w}.py\n  - src/{w2}.py")
            # docker-compose service-dependency material (drives
            # extractors/compose_deps.py — the reference's
            # docker_compose.py depends_on list/dict + extends.service
            # shapes); the image: line feeds the sibling images family
            if rng.rand() < 0.03:
                w = _VOCAB[rng.randint(0, len(_VOCAB))]
                w2 = _VOCAB[rng.randint(0, len(_VOCAB))]
                style = rng.randint(0, 5)
                if style == 0:
                    words.append(f"\ndepends_on:\n  - {w}\n  - {w2}-db")
                elif style == 1:
                    words.append(f"\ndepends_on:\n  - '{w}'")
                elif style == 2:
                    words.append(
                        f"\ndepends_on:\n  {w}:\n    condition: service_healthy"
                        f"\n  {w2}:\n    condition: service_started"
                    )
                elif style == 3:
                    words.append(f"\nextends:\n  service: {w}-base")
                else:
                    words.append(f"\nextends:\n  file: common/{w}.yml\n  service: {w2}")
            shard["conv_id"].append(conv_id)
            shard["turn_idx"].append(ti)
            shard["role"].append(role)
            shard["text"].append(" ".join(words))
            shard["tool"].append(tool)
            shard["ts"].append(EPOCH_US + ci * 3_600_000_000 + ti * 13_000_000)

    n = len(shard["conv_id"])
    perm = np.random.RandomState(seed + 100 + si).permutation(n)
    table = pa.table(
        {
            "conv_id": pa.array(np.asarray(shard["conv_id"], dtype=object)[perm].tolist(), pa.string()),
            "turn_idx": pa.array(np.asarray(shard["turn_idx"], dtype=np.int64)[perm], pa.int32()),
            "role": pa.array(np.asarray(shard["role"], dtype=object)[perm].tolist(), pa.string()),
            "text": pa.array(np.asarray(shard["text"], dtype=object)[perm].tolist(), pa.string()),
            "tool": pa.array(np.asarray(shard["tool"], dtype=object)[perm].tolist(), pa.string()),
            "ts": pa.array(np.asarray(shard["ts"], dtype=np.int64)[perm], pa.timestamp("us")),
        }
    )
    path = os.path.join(out_dir, f"transcripts-{si:04d}.parquet")
    pq.write_table(table, path, row_group_size=max(4096, n // 4))
    return path


def generate_transcripts(
    out_dir: str,
    n_convs: int = 200,
    turns_target: int = 5000,
    n_entities: int = 200,
    num_files: int = 4,
    seed: int = SEED,
    max_workers: int | None = None,
) -> str:
    """Generate the transcripts table under ``out_dir`` (one parquet file
    per conv-disjoint shard, shards generated in parallel) plus
    ``catalog.parquet``. Idempotent: returns immediately if a
    ``_SYNTH_OK`` marker with matching params exists."""
    marker = os.path.join(out_dir, "_SYNTH_OK")
    stamp = f"{n_convs}|{turns_target}|{n_entities}|{num_files}|{seed}|v22"
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read().strip() == stamp:
                return out_dir
    os.makedirs(out_dir, exist_ok=True)
    # params changed: remove stale shard files so a smaller num_files
    # doesn't leave orphans from a previous layout mixed into the table
    for name in os.listdir(out_dir):
        if name.startswith("transcripts-") and name.endswith(".parquet"):
            os.remove(os.path.join(out_dir, name))
    if os.path.exists(marker):
        os.remove(marker)

    catalog = generate_catalog(n_entities, seed)
    pq.write_table(catalog, os.path.join(out_dir, "catalog.parquet"))
    pool = catalog_surface_pool(catalog)

    workers = max_workers or min(16, num_files, os.cpu_count() or 1)
    if workers <= 1 or num_files == 1:
        for si in range(num_files):
            _generate_shard(out_dir, si, num_files, n_convs, turns_target, pool, seed)
    else:
        from concurrent.futures import ProcessPoolExecutor

        with ProcessPoolExecutor(max_workers=workers) as ex:
            futs = [
                ex.submit(
                    _generate_shard, out_dir, si, num_files, n_convs, turns_target, pool, seed
                )
                for si in range(num_files)
            ]
            for f in futs:
                f.result()

    with open(marker, "w") as f:
        f.write(stamp)
    return out_dir


# ---------------------------------------------------------------------------
# Scale tiers (mirror /root/testdata tiering; cached under /tmp)
# ---------------------------------------------------------------------------

TIERS = {
    # tier: (n_convs, turns_target, n_entities, num_files)
    "smoke": (200, 5_000, 200, 4),
    "correctness": (2_000, 60_000, 1_000, 8),
    # bench sized so compute dominates fixed overheads in the N-vs-4N
    # scaling run (~24M turns ~= 800+ CPU-seconds of pipeline work vs a
    # ~10s catalog-bound floor: canonicalization + unique-mention linking
    # cost is O(catalog), not O(turns))
    "bench": (192_000, 24_000_000, 2_000, 128),
    # one-off headroom evidence: 3x bench (~90M turns, ~285M triples) —
    # exercises object-store pressure and block-count growth; not part
    # of the per-round bench/scaling protocol
    "stress": (576_000, 72_000_000, 2_000, 384),
}

_TIER_ROOT = os.environ.get("COCO_SYNTH_ROOT", "/tmp/coco_synth")


def generate_structured_docs(n: int = 200, seed: int = SEED) -> pa.Table:
    """Deterministic STRUCTURED documents (markdown-ish: headings, list
    items, code fences, paragraphs) with a controlled rate of delimiter
    errors (unbalanced quote / backtick / paren) and some empty docs —
    material for the parse-QA-detail and block-hierarchy queries. NOT
    part of the transcript tiers (no stamp interaction); generated
    per-query like the media table."""
    rng = np.random.RandomState(seed + 7)
    ids, texts = [], []
    nv = len(_VOCAB)
    for i in range(n):
        if rng.rand() < 0.04:
            ids.append(i)
            texts.append("")
            continue
        lines: list[str] = []
        n_lines = 5 + int(rng.randint(0, 26))
        in_fence = False
        for _li in range(n_lines):
            w = _VOCAB[rng.randint(0, nv)]
            w2 = _VOCAB[rng.randint(0, nv)]
            r = rng.rand()
            if in_fence:
                if r < 0.3:
                    lines.append("```")
                    in_fence = False
                else:
                    lines.append(f"{w} = {w2}({w!r})")
            elif r < 0.12:
                lines.append(f"{'#' * (1 + int(rng.randint(0, 3)))} {w.capitalize()} {w2}")
            elif r < 0.22:
                lines.append(f"- {w} {w2} item")
            elif r < 0.30:
                lines.append("```")
                in_fence = True
            elif r < 0.36:
                lines.append("")
            else:
                lines.append(f'{w} {w2} ("{w}" note) and more {w2}')
        if in_fence:
            lines.append("```")
        # delimiter-error injection (~18% of docs get one extra line)
        r = rng.rand()
        if r < 0.18:
            kind = int(rng.randint(0, 4))
            w = _VOCAB[rng.randint(0, nv)]
            bad = [
                f'broken "{w} quote here',
                f"stray ` tick {w}",
                f"open ( paren {w}",
                f"close ) paren {w}",
            ][kind]
            lines.insert(int(rng.randint(0, len(lines) + 1)), bad)
        ids.append(i)
        texts.append("\n".join(lines))
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )


def tier_for_sf_dir(sf_dir: str) -> str:
    base = os.path.basename(os.path.normpath(sf_dir))
    return {"sf0.001": "smoke", "sf0.01": "correctness", "sf0.1": "bench"}.get(base, "correctness")


def ensure_tier(tier: str) -> str:
    """Generate (once) and return the directory of a tier's transcripts."""
    n_convs, turns, n_ent, n_files = TIERS[tier]
    out = os.path.join(_TIER_ROOT, tier)
    return generate_transcripts(out, n_convs, turns, n_ent, n_files)


def transcript_files(data_dir: str) -> list[str]:
    return sorted(
        os.path.join(data_dir, f)
        for f in os.listdir(data_dir)
        if f.startswith("transcripts-") and f.endswith(".parquet")
    )


def load_catalog(data_dir: str) -> pa.Table:
    return pq.read_table(os.path.join(data_dir, "catalog.parquet"))
