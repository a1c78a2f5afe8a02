"""Extractor registry (duck-typed autodiscovery, reference
handlers/__init__.py:45-224 shape) + the literal families end to end."""

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def test_registry_discovery_and_order():
    from coco_search_ray import extractors

    assert set(extractors.REGISTRY) >= {"identifiers", "quoted_phrases", "urls", "emails", "file_paths", "versions"}
    assert [m.KIND for m in extractors.entity_families()] == ["entity"]
    lits = extractors.literal_families()
    assert [m.NAME for m in lits] == sorted(m.NAME for m in lits)
    assert extractors.combined_quick_pattern()


def test_registry_fail_fast_on_bad_module():
    import types

    import pytest

    from coco_search_ray import extractors

    bad = types.ModuleType("bad")
    bad.NAME = "bad"
    bad.KIND = "nonsense"
    bad.QUICK = "x"
    bad.extract = lambda t: []
    with pytest.raises(TypeError):
        extractors._validate(bad)


def test_quoted_and_url_extract():
    from coco_search_ray.extractors import quoted, urls

    t = 'run "payment flow step" then `retry_loop` and "payment flow step" again'
    assert quoted.extract(t) == ["payment flow step", "retry_loop"]
    t2 = "see https://svc.example/billing and https://svc.example/billing plus http://a.b/c."
    got = urls.extract(t2)
    assert got[0] == "https://svc.example/billing"
    assert len(got) == 2


def test_email_and_path_extract():
    from coco_search_ray.extractors import emails, paths

    t = "ping ops@svc.example and ops@svc.example then see /var/log/app.log or (/etc/conf/main.yaml)"
    assert emails.extract(t) == ["ops@svc.example"]
    assert paths.extract(t) == ["/var/log/app.log", "/etc/conf/main.yaml"]
    assert paths.extract("ratio 3/4 and https://a.b/c.d") == []  # prose + urls excluded


def test_imports_extract():
    from coco_search_ray.extractors import imports

    t = (
        "run from payment_service import refresh then import billing.worker "
        "and require('ledger_core') plus import { init } from 'gateway/lib' done"
    )
    assert imports.extract(t) == [
        "payment_service",
        "billing.worker",
        "ledger_core",
        "gateway/lib",
    ]
    # prose 'import' without a dotted module or from-clause is NOT a match
    assert imports.extract("we import data and the import process runs") == []
    # dedupe keep-first across rules
    assert imports.extract("import a.b then from a.b import c") == ["a.b"]
    assert imports.KIND == "literal" and imports.PRED == "imports_module"


def test_md_links_extract():
    from coco_search_ray.extractors import md_links

    t = "see [payment docs](docs/payment.md) and [[billing_notes]] or [api](https://svc.example/x)"
    assert md_links.extract(t) == ["docs/payment.md", "billing_notes"]
    # dedupe keep-first; label with spaces ok; bare brackets are not links
    t2 = "[a b](x.md) then [c](x.md) and [not a link] alone"
    assert md_links.extract(t2) == ["x.md"]
    assert md_links.extract("plain text, no links") == []
    assert md_links.KIND == "literal" and md_links.PRED == "references_doc"


def test_images_extract():
    from coco_search_ray.extractors import images

    t = (
        "deploy image: payment/billing:1.2 then FROM ledger:0.13 and "
        "image: registry.example/gateway/router:latest done"
    )
    assert images.extract(t) == [
        "payment/billing:1.2",
        "ledger:0.13",
        "registry.example/gateway/router:latest",
    ]
    # a bare word after image: is prose, not a ref; lowercase from is not FROM
    assert images.extract("the image: something here, from nginx") == []
    # untagged ref needs a slash; dedupe keep-first across rules
    assert images.extract("image: repo/app then FROM repo/app") == ["repo/app"]
    assert images.KIND == "literal" and images.PRED == "uses_image"


def test_ci_uses_extract():
    from coco_search_ray.extractors import ci_uses

    t = (
        "step uses: actions/checkout@v4 then uses: ./.ci/deploy.yml and "
        "uses: 'google-actions/auth@v2.1.0' again uses: actions/checkout@v4"
    )
    assert ci_uses.extract(t) == [
        "actions/checkout@v4",
        "./.ci/deploy.yml",
        "google-actions/auth@v2.1.0",
    ]
    # a bare word after uses: (no @ref, no ./ path) is prose
    assert ci_uses.extract("this uses: caching and uses: the db") == []
    assert ci_uses.KIND == "literal" and ci_uses.PRED == "uses_action"


def test_symbols_extract():
    from coco_search_ray.extractors import symbols

    t = (
        "here def process_refund(x): and class PaymentGateway: plus "
        "function handleClick(ev) then func Encode(ctx) and "
        "func (s *Server) Start(ctx) also fn parse_input(v) and "
        "struct Config { field } end"
    )
    assert symbols.extract(t) == [
        "process_refund",
        "PaymentGateway",
        "handleClick",
        "Encode",
        "Server.Start",
        "parse_input",
        "Config",
    ]
    # prose forms never match: no trailing delimiter / no def-keyword shape
    assert symbols.extract("the class size is large, struct ure, fn keyword") == []
    # receiver form does not double-fire the plain-func rule; dedupe keep-first
    assert symbols.extract("func (r *Pool) Get( and def Get( again") == ["Pool.Get", "Get"]
    assert symbols.KIND == "literal" and symbols.PRED == "defines_symbol"


def test_qualified_extract():
    from coco_search_ray.extractors import qualified

    # identifier-shaped roots qualify; prose words / URL hosts do not
    t = "call payment_service.process_item then PaymentGateway.run.close x"
    assert qualified.extract(t) == [
        "payment_service.process_item",
        "PaymentGateway.run.close",
    ]
    assert qualified.extract("see svc.example and logs.before v1.2.3") == []
    assert qualified.extract("ops@svc.example https://a.b/c") == []
    # dedupe keep-first; nested member paths kept whole
    t2 = "billingWorker.init again billingWorker.init and billingWorker.init.run"
    assert qualified.extract(t2) == ["billingWorker.init", "billingWorker.init.run"]
    assert qualified.KIND == "qualified" and qualified.PRED == "has_member"


def test_external_extractor_directory(ray_session, smoke_dir, tmp_path):
    """User extractor modules load from a directory (the reference's
    project-override resolution surface) and flow through the full
    distributed pipeline — extraction in workers, pred decoding at
    assembly — via build_kg(extractor_dirs=[...])."""
    import pyarrow.parquet as pq

    from coco_search_ray.pipelines.kg import build_kg
    from coco_search_ray.sources.synth import load_catalog

    ext_dir = tmp_path / "ext"
    ext_dir.mkdir()
    (ext_dir / "tickets.py").write_text(
        'import re\n'
        'NAME = "tickets"\n'
        'KIND = "literal"\n'
        'PRED = "mentions_ticket"\n'
        'QUICK = r"[A-Z]{2,5}-[0-9]+"\n'
        "_RE = re.compile(QUICK)\n"
        "def maybe(text):\n    return '-' in text\n"
        "def extract(text):\n"
        "    out, seen = [], set()\n"
        "    for m in _RE.finditer(text):\n"
        "        t = m.group(0)\n"
        "        if t not in seen:\n"
        "            seen.add(t); out.append(t)\n"
        "    return out\n"
    )
    catalog = load_catalog(smoke_dir)
    surface = catalog.column("canonical_name")[0].as_py()
    t = pa.table(
        {
            "conv_id": pa.array(["c1"], pa.string()),
            "turn_idx": pa.array([0], pa.int32()),
            "role": pa.array(["user"], pa.string()),
            "text": pa.array([f"{surface} tracked in PROJ-123 and PROJ-123"], pa.string()),
            "tool": pa.array([""], pa.string()),
            "ts": pa.array([0], pa.timestamp("us")),
        }
    )
    p = str(tmp_path / "ticket.parquet")
    pq.write_table(t, p)
    df = build_kg([p], catalog, extractor_dirs=[str(ext_dir)]).to_pandas()
    assert ("mentions_ticket", "PROJ-123") in set(zip(df["pred"], df["obj"]))
    # loading again is idempotent; a conflicting NAME fails fast
    from coco_search_ray import extractors

    extractors.ensure_directories([str(ext_dir)])
    import pytest

    with pytest.raises(ValueError):
        extractors.load_directory(str(ext_dir))


def test_literal_triples_end_to_end(ray_session, smoke_dir, tmp_path):
    """A turn with an entity mention + quoted phrase + URL emits
    (entity, quotes, phrase) and (entity, links_to, url); a literal-only
    turn (no entity) emits nothing."""
    from coco_search_ray.pipelines.kg import build_kg
    from coco_search_ray.sources.synth import load_catalog

    catalog = load_catalog(smoke_dir)
    surface = catalog.column("canonical_name")[0].as_py()
    rows = {
        "conv_id": ["c1", "c1", "c2"],
        "turn_idx": [0, 1, 0],
        "role": ["user", "assistant", "user"],
        "text": [
            f'{surface} runs "the daily job" via https://svc.example/run',
            "plain follow-up text with nothing",
            'only "a quoted thing" here, no entity',
        ],
        "tool": ["", "search", ""],
        "ts": [0, 1, 2],
    }
    t = pa.table(
        {
            "conv_id": pa.array(rows["conv_id"], pa.string()),
            "turn_idx": pa.array(rows["turn_idx"], pa.int32()),
            "role": pa.array(rows["role"], pa.string()),
            "text": pa.array(rows["text"], pa.string()),
            "tool": pa.array(rows["tool"], pa.string()),
            "ts": pa.array(rows["ts"], pa.timestamp("us")),
        }
    )
    p = str(tmp_path / "lit.parquet")
    pq.write_table(t, p)
    for conv_local in (True, False):
        df = build_kg([p], catalog, conv_local_shards=conv_local).to_pandas()
        preds = set(zip(df["pred"], df["obj"]))
        assert ("quotes", "the daily job") in preds
        assert ("links_to", "https://svc.example/run") in preds
        assert ("quotes", "a quoted thing") not in preds  # no entity in c2


def test_hcl_blocks_extract():
    from coco_search_ray.extractors import hcl_blocks

    t = (
        'define resource "payment_gateway" "primary" { ports = 1 } then '
        'data "ledger_store" "snapshot-2" { } and resource "payment_gateway" "primary" { again }'
    )
    # keep-first dedupe across rules, match-start order, composed type.name
    assert hcl_blocks.extract(t) == ["payment_gateway.primary", "ledger_store.snapshot-2"]
    # prose-word (non-identifier-shaped) types fail the linkability gate
    assert hcl_blocks.extract('resource "gateway" "one" {') == []
    # QUICK is a sound necessary condition under RE2 for every match
    import re
    assert re.search(hcl_blocks.QUICK, t)
    assert hcl_blocks.maybe(t)


def test_hcl_blocks_link_and_assemble_end_to_end():
    """The composed address's TYPE links against the catalog and emits
    the declares_resource hierarchy triple plus the entity-graph
    membership (the second QUALIFIED family exercises multi-qualified
    kind codes end to end)."""
    import pyarrow as pa
    from coco_search_ray.stages.extract import extract_mention_rows, family_plan
    from coco_search_ray.pipelines.kg import assemble_conv_local_fast, _narrow_assembly_table

    ents, lits, quals = family_plan()
    assert ("hcl_blocks", "declares_resource") in quals

    batch = pa.table(
        {
            "conv_id": ["c1"],
            "turn_idx": pa.array([0], pa.int32()),
            "role": ["user"],
            "text": ['payment_service then resource "payment_gateway" "primary" {'],
            "tool": ["bash"],
        }
    )
    m = extract_mention_rows(batch, entity_names=ents, literal_specs=lits, qualified_specs=quals)
    surfaces = dict(zip(m["mention"].to_pylist(), m["kind_code"].to_pylist()))
    hcl_code = -2 - [n for n, _p in quals].index("hcl_blocks")
    assert surfaces["payment_gateway.primary"] == hcl_code


def test_argocd_extract():
    from coco_search_ray.extractors import argocd

    t = (
        "apply repoURL: https://git.example.com/pay/bill.git with "
        "chart: nginx-ingress at path: apps/guestbook under project: platform"
    )
    assert argocd.extract(t) == [
        "https://git.example.com/pay/bill.git",
        "nginx-ingress",
        "apps/guestbook",
        "platform",
    ]
    # SSH shorthand repo form (reference argocd.py accepts any repoURL string)
    assert argocd.extract("repoURL: git@git.example.com:org/repo.git") == [
        "git@git.example.com:org/repo.git"
    ]
    # quoted values; dedupe keep-first across rules
    assert argocd.extract('chart: "redis" and project: redis') == ["redis"]
    # bare keys with no value emit nothing
    assert argocd.extract("the chart: , path: !") == []
    assert argocd.KIND == "literal" and argocd.PRED == "argo_ref"


def test_md_refs_extract():
    from coco_search_ray.extractors import md_refs

    # full reference link + image reference, defs after usages
    t = (
        "see [billing guide][pay] then\n[pay]: docs/pay-bill.md and "
        "![x diagram][pay-img]\n[pay-img]: assets/pay.png"
    )
    assert md_refs.extract(t) == ["docs/pay-bill.md", "assets/pay.png"]
    # collapsed form is case-folded against the definition table
    assert md_refs.extract("[Payment][]\n[payment]: guides/x/payment.md") == [
        "guides/x/payment.md"
    ]
    # http targets excluded (urls family); dangling refs emit nothing
    assert md_refs.extract("[a api][x]\n[x]: https://svc.example/x") == []
    assert md_refs.extract("[notes][missing] no definitions") == []
    # duplicate definition: keep-first wins (extract()'s dict semantics)
    assert md_refs.extract("[a][r]\n[r]: first/f.md\n[r]: second/s.md") == [
        "first/f.md"
    ]
    # definition must be line-anchored: mid-prose [r]: x is not a definition
    assert md_refs.extract("[a][r] where [r]: notdef/x.md mid-line") == []
    # two refs resolving to the same target dedupe keep-first
    assert md_refs.extract("[a][r1] [b][r2]\n[r1]: same/t.md\n[r2]: same/t.md") == [
        "same/t.md"
    ]
    assert md_refs.KIND == "literal" and md_refs.PRED == "references_doc"


def test_md_links_target_validation():
    """The reference's _validate_link_path semantics (markdown.py:
    308-326): mailto/pure-anchor skipped, fragments stripped."""
    from coco_search_ray.extractors import md_links

    assert md_links.extract("[s](docs/a.md#usage)") == ["docs/a.md"]
    assert md_links.extract("[m](mailto:x@svc.example) [t](#top)") == []
    # fragment-only after strip -> skipped; dedupe happens post-clean
    assert md_links.extract("[a](x.md#f1) [b](x.md#f2) [c](x.md)") == ["x.md"]
    # wiki refs stay verbatim (no URL semantics)
    assert md_links.extract("[[notes#raw]]") == ["notes#raw"]


def test_md_refs_target_validation():
    from coco_search_ray.extractors import md_refs

    assert md_refs.extract("[a][r]\n[r]: guides/x/a.md#setup") == ["guides/x/a.md"]
    assert md_refs.extract("[a][r]\n[r]: mailto:x@svc.example") == []
    assert md_refs.extract("[a][r]\n[r]: #anchor-only") == []


def test_md_code_paths_extract():
    from coco_search_ray.extractors import md_code_paths as mcp

    # code spans: _looks_like_path accepts slash-paths and known-ext
    # bare names; rejects code expressions, CLI flags, spaced text
    t = "check `src/cli.py` then `run(x)` and `app.rs` or `-v` or `a b/c`"
    assert mcp.extract(t) == ["src/cli.py", "app.rs"]
    # comment lines (# / // / --): path regex + known-extension gate
    t2 = (
        "# see src/payment/billing.py for details\n"
        "// config in conf/gateway.yaml\n"
        "-- sql/schema.sql here\n"
        "prose src/mid/line.py is NOT a comment line"
    )
    assert mcp.extract(t2) == [
        "src/payment/billing.py",
        "conf/gateway.yaml",
        "sql/schema.sql",
    ]
    # unknown extension rejected on comment lines; bare dir/name passes
    assert mcp.extract("# a weird/file.xyz but plain dir/name ok") == ["dir/name"]
    # span with unknown ext and no slash rejected; with slash accepted
    assert mcp.extract("`file.unknownext` `dir/file.xyz`") == ["dir/file.xyz"]
    # dedupe keep-first across rules
    assert mcp.extract("`src/a.py`\n# also src/a.py again") == ["src/a.py"]
    assert mcp.KIND == "literal" and mcp.PRED == "references_code"


def test_md_frontmatter_extract():
    from coco_search_ray.extractors import md_frontmatter as mf

    t = "---\ndepends:\n  - src/foo.py\n  - docs/\n---\nprose"
    assert mf.extract(t) == ["src/foo.py", "docs/"]
    # inline (non-block) depends: is not a frontmatter list; indented
    # headers are not top-level YAML keys
    assert mf.extract("depends: inline") == []
    assert mf.extract("  depends:\n  - indented.py") == []
    # multiple blocks merge keep-first; item values are regex-stripped
    assert mf.extract("depends:\n  - a.py  \ndepends:\n  - b.py\n  - a.py") == [
        "a.py",
        "b.py",
    ]
    assert mf.KIND == "literal" and mf.PRED == "depends_on"


def test_compose_deps_extract():
    from coco_search_ray.extractors import compose_deps as cd

    t = (
        "services:\n  web:\n    image: nginx:1.25\n    depends_on:\n"
        "      - db\n      - 'redis'\n  db:\n    image: postgres:16\n"
        "  worker:\n    depends_on:\n      db:\n"
        "        condition: service_healthy\n      queue:\n"
        "        condition: service_started\n  child:\n    extends:\n"
        "      file: common/base.yml\n      service: base-web\n"
        "  other:\n    extends:\n      service: web\n"
    )
    # document order across the three rules, deduped keep-first
    assert cd.extract(t) == ["db", "redis", "queue", "base-web", "web"]
    # gitlab-style same-line extends belongs to ci_extends, not here
    assert cd.extract("extends: .hidden-tpl") == []
    # a bare depends_on: with no block emits nothing
    assert cd.extract("prose about depends_on: nothing") == []
    # a later service-level bare key is NOT swallowed by the dict block
    # (dict entries require the immediately-following condition line)
    assert cd.extract("depends_on:\n  - db\n  cache:\n    image: redis\n") == ["db"]
    # extends with service before file still resolves
    assert cd.extract("extends:\n  service: base\n  file: x.yml") == ["base"]
    assert cd.KIND == "literal" and cd.PRED == "depends_on_svc"


def test_go_imports_extract():
    from coco_search_ray.extractors import go_imports as gi

    # single / aliased / blank / dot forms (reference go.py import_spec)
    assert gi.extract('import "fmt"') == ["fmt"]
    assert gi.extract('import f "net/http"') == ["net/http"]
    assert gi.extract('import _ "database/sql"') == ["database/sql"]
    assert gi.extract('import . "strings"') == ["strings"]
    # grouped block, document order, keep-first dedupe across rules
    t = 'import "a"\nimport (\n\t"a"\n\tlog "example.com/x/log"\n\t_ "y/driver"\n)'
    assert gi.extract(t) == ["a", "example.com/x/log", "y/driver"]
    # a // comment line inside the block emits nothing (line anchor)
    assert gi.extract('import (\n\t// "not real"\n\t"os"\n)') == ["os"]
    # one-liner grouped forms, incl. semicolon-separated specs
    assert gi.extract('import ("fmt")') == ["fmt"]
    assert gi.extract('import ("fmt"; "os")') == ["fmt", "os"]
    assert gi.extract('import ("fmt"; f "net/http"; _ "y/driver")') == [
        "fmt", "net/http", "y/driver"
    ]
    # prose and python/ES shapes stay with the imports family
    assert gi.extract("the import process imports things") == []
    assert gi.extract("import os.path") == []
    assert gi.extract("import { x } from 'mod'") == []
    assert gi.extract('import { x } from "mod"') == []  # brace blocks alias
    # unterminated block / empty forms are inert
    assert gi.extract("import (incomplete") == []
    assert gi.extract("import ()") == []
    assert gi.KIND == "literal" and gi.PRED == "imports_module"
