"""Bench-tier replica of the gate for the SYNTH-PINNED oracle pairs.

The extraction queries' oracle SQL hardcodes the correctness-tier synth
path (/tmp/coco_synth/correctness — the driver gates at sf0.01 only, see
CLAUDE.md), so tools/check_correctness.py can only value-check them at
that tier. This tool extends the validation to the BENCH tier (sf0.1 ->
29.9M turns, 10x the blocks, different autoswitch branches): it runs each
query at sf0.1 and replays the SAME SQL with the synth path substituted
to the bench tier — mechanically valid because these oracles are pure
SQL over the transcript files (export-backed oracles are excluded; their
exports are gate-tier-only by design).

Usage: python tools/check_correctness_bench_tier.py [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from check_correctness import to_pandas, value_hash  # noqa: E402  (tools/ sibling)

SF_DIR = "/root/testdata/sf0.1"
CORRECTNESS_SYNTH = "/tmp/coco_synth/correctness"


def main() -> int:
    only = set(sys.argv[1:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod
    from coco_search_ray.sources.synth import ensure_tier

    bench_dir = ensure_tier("bench")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    failures = 0
    for name, fn in qs.items():
        sql = oracles.get(name)
        if sql is None or CORRECTNESS_SYNTH not in sql:
            continue  # only the synth-pinned pure-SQL pairs
        if "coco_oracle_export" in sql:
            continue  # export-backed: gate-tier-only by contract
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = to_pandas(fn(SF_DIR))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}", flush=True)
            failures += 1
            continue
        try:
            exp = con.execute(sql.replace(CORRECTNESS_SYNTH, bench_dir)).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle SQL raised {type(e).__name__}: {e}", flush=True)
            failures += 1
            continue
        dt = time.time() - t0
        problems = []
        if len(got) != len(exp):
            problems.append(f"rows {len(got)} != {len(exp)}")
        if sorted(got.columns) != sorted(exp.columns):
            problems.append(f"schema {sorted(got.columns)} != {sorted(exp.columns)}")
        elif value_hash(got) != value_hash(exp):
            problems.append("value hash mismatch")
        if problems:
            failures += 1
            print(f"FAIL {name}: {'; '.join(problems)} ({dt:.1f}s)", flush=True)
            if sorted(got.columns) == sorted(exp.columns) and len(got) == len(exp):
                g = got[sorted(got.columns)].astype(str)
                e = exp[sorted(exp.columns)].astype(str)
                gs = set(map(tuple, g.itertuples(index=False, name=None)))
                es = set(map(tuple, e.itertuples(index=False, name=None)))
                print("   only-in-ray   :", list(gs - es)[:3], flush=True)
                print("   only-in-oracle:", list(es - gs)[:3], flush=True)
        else:
            print(f"ok   {name}: {len(got)} rows match, {dt:.1f}s", flush=True)
    print("FAILURES:", failures, flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
