"""Small runtime helpers shared by stages and pipelines."""

from __future__ import annotations


def auto_pool(frac: float = 0.5, lo: int = 1, hi: int = 64) -> tuple[int, int]:
    """Autoscaling actor-pool bounds sized from the live cluster.

    ``(max(lo, target/4), target)`` with ``target = frac * cpus``: a
    fixed-size pool (`concurrency=N`) RESERVES its CPUs for the stage's
    whole lifetime, and two fixed pools can starve the shuffle tasks
    between them into deadlock on a small cluster (observed at
    num_cpus=4 with two 2-actor pools). An autoscaling pool avoids
    that, but a min of 1 ramps up too slowly for short jobs — a quarter
    of the target as the floor keeps startup latency low while leaving
    >= half the CPUs free for non-actor stages. The reference's
    analogue is its mapper cap (20-40 linker mappers cluster-wide,
    ``docs/reverb-cluster-extraction-indexing.txt:145-147``).
    """
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    target = min(hi, max(lo, int(cpus * frac) or lo))
    return (max(lo, target // 4), target)
