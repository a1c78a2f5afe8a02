"""Stress-tier evidence runs (BASELINE.md protocol): the flagship at
~90M turns under each execution branch, one fresh Ray session per mode.

  python tools/stress_run.py default      # conv-local + pinned stream
  python tools/stress_run.py spill        # file-backed mention stream
  python tools/stress_run.py distributed  # distributed linkmap + general
                                          # (shuffled) assembly

Prints one JSON line per run: mode, wall seconds, triples, triples/s.
Scratch output goes to /dev/shm (cluster-analog: output storage scales
with nodes; the sandbox's one local disk would add an identical serial
term to every mode).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    mode = sys.argv[1] if len(sys.argv) > 1 else "default"
    tier = os.environ.get("COCO_STRESS_TIER", "stress")
    cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=cpus, include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import pyarrow.parquet as pq

    from coco_search_ray.pipelines.kg import build_kg_from_dir
    from coco_search_ray.sources.synth import ensure_tier, transcript_files

    data_dir = ensure_tier(tier)
    turns = sum(pq.read_metadata(f).num_rows for f in transcript_files(data_dir))

    kwargs: dict = {}
    if mode == "spill":
        spill_dir = f"/dev/shm/coco_stress_stream_{tier}"
        shutil.rmtree(spill_dir, ignore_errors=True)
        kwargs = {"spill_stream": True, "stream_spill_dir": spill_dir}
    elif mode == "distributed":
        kwargs = {"distributed_linkmap": True, "conv_local_shards": False}
    elif mode != "default":
        raise SystemExit(f"unknown mode {mode!r}")

    out = f"/dev/shm/coco_stress_out_{mode}"
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.time()
    build_kg_from_dir(data_dir, **kwargs).write_parquet(out)
    wall = time.time() - t0
    triples = sum(
        pq.read_metadata(os.path.join(out, f)).num_rows
        for f in os.listdir(out)
        if f.endswith(".parquet")
    )
    print(
        json.dumps(
            {
                "mode": mode,
                "tier": tier,
                "turns": turns,
                "wall_sec": round(wall, 1),
                "triples": triples,
                "triples_per_sec": round(triples / wall, 1),
                "num_cpus": cpus,
            }
        )
    )
    shutil.rmtree(out, ignore_errors=True)
    if mode == "spill":
        shutil.rmtree(kwargs["stream_spill_dir"], ignore_errors=True)
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
