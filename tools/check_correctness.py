"""Local replica of the driver's correctness gate: run every queries()
entry at a given sf_dir and compare to oracle_sql() via DuckDB
(row count + schema + order-insensitive value hash).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
       python tools/check_correctness.py /root/testdata/sf0.1 --tier-agnostic

--tier-agnostic selects exactly the query/oracle pairs whose SQL reads
no /tmp path (no synth-pinned transcript oracles, no gate-tier export
oracles) — the set that is mechanically valid at ANY sf tier. The
synth-pinned extraction pairs are covered at 10x scale by
tools/check_correctness_bench_tier.py (path-substituted SQL); the
export-backed pairs are gate-tier-only by contract (CLAUDE.md).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def value_hash(df: pd.DataFrame) -> str:
    import hashlib

    df = df[sorted(df.columns)]
    rows = sorted(
        df.astype(str).itertuples(index=False, name=None)
    )
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()[:16]


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--tier-agnostic"]
    tier_agnostic = "--tier-agnostic" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if tier_agnostic:
        names = [n for n in qs if n in oracles and "/tmp/" not in oracles[n]]
        qs = {n: qs[n] for n in names}
        print(f"tier-agnostic pairs: {len(qs)}", flush=True)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok   {name}: rows-only, {len(got)} rows, {dt:.1f}s")
            continue
        try:
            exp = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle SQL raised {type(e).__name__}: {e}")
            failures += 1
            continue
        problems = []
        if len(got) != len(exp):
            problems.append(f"rows {len(got)} != {len(exp)}")
        if sorted(got.columns) != sorted(exp.columns):
            problems.append(f"schema {sorted(got.columns)} != {sorted(exp.columns)}")
        elif value_hash(got) != value_hash(exp):
            problems.append("value hash mismatch")
        if problems:
            failures += 1
            print(f"FAIL {name}: {'; '.join(problems)} ({dt:.1f}s)")
            if sorted(got.columns) == sorted(exp.columns) and len(got) == len(exp):
                g = got[sorted(got.columns)].astype(str)
                e = exp[sorted(exp.columns)].astype(str)
                gs = set(map(tuple, g.itertuples(index=False, name=None)))
                es = set(map(tuple, e.itertuples(index=False, name=None)))
                print("   only-in-ray   :", list(gs - es)[:3])
                print("   only-in-oracle:", list(es - gs)[:3])
        else:
            print(f"ok   {name}: {len(got)} rows match, {dt:.1f}s")
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
