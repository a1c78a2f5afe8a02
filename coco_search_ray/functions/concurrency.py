"""Actor-pool sizing shared by every stateful map_batches stage.

Two rules (CLAUDE.md perf lessons):
- a pool must never reserve every CPU (the read / explode / groupby
  stages starve and the stream stalls) -> cap at half the cluster;
- a pool must never be capped at a constant below cluster_CPUs/2 (a
  hard-coded (1, 8) leaves a 32-CPU node — let alone a cluster — mostly
  idle in that stage).

Returned as a (1, max) tuple so Ray autoscales the pool up only under
load instead of pre-reserving the slots.
"""

from __future__ import annotations

import ray


def auto_pool(frac: float = 0.5, floor: int = 1, cap: int | None = None) -> tuple[int, int]:
    """(min, max) actor-pool size: max = cluster_CPUs * frac, optionally
    capped (use cap only for stages whose state is expensive to replicate)."""
    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    hi = max(floor, int(cpus * frac))
    if cap is not None:
        hi = min(hi, cap)
    return (floor, hi)


def auto_buckets(floor: int = 64, per_cpu: int = 4) -> int:
    """Coarse-shuffle bucket count that SCALES with the cluster instead of
    a constant: ``max(floor, per_cpu * cluster_CPUs)``. A fixed 64 means
    each map_groups task holds 1/64th of ALL keys regardless of cluster
    size — at 4N nodes the shuffle stops getting narrower per task.
    per_cpu > 1 keeps tasks small enough to pipeline/steal; the bucket
    count never changes OUTPUT (buckets hold complete key groups), only
    task granularity, so results stay hash-identical at any size."""
    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    return max(floor, per_cpu * cpus)
