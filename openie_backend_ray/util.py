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
    # count in CPU-SHARES: on tiny clusters actors run at 0.5 CPU
    # (actor_cpus). Tiny clusters also RESERVE one full CPU: shuffle
    # tasks need num_cpus=1, and fixed pools that leave only half a
    # CPU free deadlock the sort (observed at num_cpus=2).
    reserve = 1 if cpus <= 4 else 0
    slots = int(max(1, cpus - reserve) / actor_cpus())
    target = min(hi, max(lo, int(slots * frac) or lo))
    # FIXED size (min == max): measured on the fused flagship, the
    # autoscaling pool stayed at ~2 actors for a 26-block backlog and
    # the stage ran at 2x-parallel on an 8-CPU cluster. Fixed pools
    # start every actor immediately; callers budget their fracs so the
    # pools of one pipeline sum below the cluster (flagship: 0.6
    # extract + 0.25 link, leaving >=15% for shuffle/map tasks — the
    # deadlock guard that motivated autoscaling in the first place).
    return (target, target)


def actor_cpus() -> float:
    """CPU share per pool actor: fractional on tiny clusters so two
    1-actor pools plus the shuffle tasks between them can coexist (at
    num_cpus=2, two full-CPU actors reserve the whole cluster and the
    sort tasks starve - observed as a 17-minute hang of a 3-minute
    job)."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    return 0.5 if cpus <= 4 else 1.0
