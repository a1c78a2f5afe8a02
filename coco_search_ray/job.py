"""CLI entry point — run via ``ray job submit -- python -m
coco_search_ray.job <cmd> ...`` on a cluster, or directly (it owns the
Ray session only when one isn't already initialised).

Commands:
  build   --data DIR --out DIR [--no-resume]   resumable KG build
  stats   --out DIR                            grouped triple stats
  search  --data DIR --query Q [--limit K]     hybrid catalog search
  synth   --tier smoke|correctness|bench       generate synthetic data
"""

from __future__ import annotations

import argparse
import json
import os


def _ensure_ray() -> bool:
    """Initialise Ray if nobody has; returns True iff THIS call inited
    (the caller only shuts down a session it created — a driver-owned
    session must survive main())."""
    import ray

    created = False
    if not ray.is_initialized():
        ray.init(
            address=os.environ.get("RAY_ADDRESS", "local"),
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
        created = True
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return created


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="coco_search_ray.job")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build")
    b.add_argument("--data")
    b.add_argument("--out")
    b.add_argument("--config", help="YAML pipeline config (env-substituted)")
    b.add_argument("--no-resume", action="store_true")
    b.add_argument("--group-size", type=int, default=1,
                   help="input files per pipeline run / manifest (resume granularity)")

    s = sub.add_parser("stats")
    s.add_argument("--out", required=True)

    q = sub.add_parser("search")
    q.add_argument("--data", required=True)
    q.add_argument("--query", required=True)
    q.add_argument("--limit", type=int, default=10)

    g = sub.add_parser("synth")
    g.add_argument("--tier", default="smoke")

    r = sub.add_parser("query", help="run a registry query (see list-queries)")
    r.add_argument("--name", required=True)
    r.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    r.add_argument("--limit", type=int, default=20)

    sub.add_parser("list-queries")

    i = sub.add_parser(
        "init", help="inspect a data dir and write a documented pipeline config"
    )
    i.add_argument("--data", required=True)
    i.add_argument("--out", default="coco_search_ray.yaml")

    args = p.parse_args(argv)

    if args.cmd == "init":
        from .config import generate_config

        print(generate_config(args.data, args.out))
        return 0

    if args.cmd == "synth":
        from .sources.synth import ensure_tier

        print(ensure_tier(args.tier))
        return 0

    if args.cmd == "list-queries":
        from .pipelines.queries import REGISTRY

        for name, (_fn, sql) in REGISTRY.items():
            print(f"{name}\t{'sql-checked' if sql else 'rows-only'}")
        return 0

    owns_session = _ensure_ray()
    import ray

    try:
        if args.cmd == "build":
            import shutil

            from .pipelines.materialize import run_resumable

            kg_kwargs = None
            canon_params = None
            data, out = args.data, args.out
            if args.config:
                from .config import load_config

                cfg = load_config(args.config)
                data = data or cfg.data_dir
                out = out or cfg.out_dir
                kg_kwargs = cfg.kg_kwargs()
                canon_params = cfg.canon_params()
            if not data or not out:
                p.error("build requires --data/--out (directly or via --config)")
            if args.no_resume and os.path.isdir(out):
                shutil.rmtree(out)
            stats = run_resumable(
                data, out, kg_kwargs=kg_kwargs, group_size=args.group_size,
                canon_params=canon_params,
            )
            print(json.dumps(stats))
        elif args.cmd == "stats":
            from .pipelines.materialize import read_triples
            from .pipelines.stats import top_entities, triples_by_pred

            triples = read_triples(args.out)
            print(triples_by_pred(triples).to_pandas().to_string(index=False))
            print(top_entities(triples, 10).to_pandas().to_string(index=False))
        elif args.cmd == "query":
            from .pipelines.queries import REGISTRY

            if args.name not in REGISTRY:
                # fail fast with the closest names — the reference's
                # validate_query index-name validation UX
                import difflib

                near = difflib.get_close_matches(args.name, REGISTRY, n=3, cutoff=0.4)
                hint = f" (did you mean: {', '.join(near)}?)" if near else ""
                p.error(f"unknown query {args.name!r}{hint}; see list-queries")
            fn, _sql = REGISTRY[args.name]
            res = fn(args.sf_dir)
            if hasattr(res, "to_pandas"):
                res = res.to_pandas()
            print(res.head(args.limit).to_string(index=False))
            print(f"[{len(res)} rows]")
        elif args.cmd == "search":
            from .pipelines.search import search_catalog
            from .sources.synth import load_catalog

            out = search_catalog(load_catalog(args.data), args.query, limit=args.limit)
            print(out.to_string(index=False))
    finally:
        # only shut down a session this process created (the driver owns
        # its own session when it initialised Ray before importing us)
        if owns_session:
            ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
