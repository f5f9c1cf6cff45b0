"""Small runtime helpers shared by stages and pipelines."""

from __future__ import annotations


def auto_pool(frac: float = 0.5, lo: int = 1, hi: int = 64) -> tuple[int, int]:
    """Autoscaling actor-pool bounds sized from the live cluster.

    Always ``(1, ceil(frac * cluster_cpus))``: a fixed-size pool
    (`concurrency=N`) RESERVES its CPUs for the stage's whole lifetime,
    and two fixed pools can starve the shuffle tasks between them into
    deadlock on a small cluster (observed at num_cpus=4 with two
    2-actor pools). A (1, max) pool starts at one actor and scales on
    backlog, so the streaming executor always keeps CPUs for the
    non-actor stages. The reference's analogue is its mapper cap
    (20-40 linker mappers cluster-wide,
    ``docs/reverb-cluster-extraction-indexing.txt:145-147``).
    """
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    return (lo, min(hi, max(lo, int(cpus * frac) or lo)))
