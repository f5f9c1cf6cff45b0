"""Benchmark harness (driver contract): runs the headline pipelines over
``$GRAFT_SF_DIR`` (default /root/testdata/sf0.1) and prints ONE JSON
line. ``--scaling`` runs the flagship job twice in fresh processes at
two parallelism levels (8 and 32 CPUs by default) and reports
throughput at both plus scaling efficiency (north rule: >=0.8 between
N and 4N).

Usage:
    python bench.py                # full bench, one JSON line
    python bench.py --scaling      # two-level scaling run
    python bench.py --flagship-only  # internal: used by --scaling
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
FIXTURE_REPLICATION = int(os.environ.get("GRAFT_BENCH_REPLICATION", "10"))


def _init_ray(num_cpus: int):
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=num_cpus, include_dashboard=False
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def _flagship_dataset(sf_dir: str):
    """The headline job: interleaved sf docs + replicated fixture corpus
    through the full pipeline (chunk -> extract -> group -> link ->
    dedup)."""
    import ray

    from openie_backend_ray.fixtures.corpus import (
        build_chunker_lexicon,
        build_documents,
    )
    from openie_backend_ray.fixtures.side_tables import build_side_tables
    from openie_backend_ray.pipelines.flagship import run_flagship
    from openie_backend_ray.sources.interleaved import interleave_flat

    flat = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    fixture = ray.data.from_arrow(
        build_documents(replication=FIXTURE_REPLICATION)
    ).repartition(64)
    docs = interleave_flat(flat).union(fixture)
    lex_ref = ray.put(build_chunker_lexicon())
    st_ref = ray.put(build_side_tables())
    return run_flagship(
        docs, lexicon_ref=lex_ref, side_tables_ref=st_ref, corpus="cw"
    )


def run_flagship_bench(sf_dir: str) -> dict:
    t0 = time.time()
    out = _flagship_dataset(sf_dir)
    n_groups = out.count()
    wall = time.time() - t0
    return {"sec": round(wall, 3), "groups": n_groups,
            "triples_per_sec": round(n_groups / wall, 1)}


def run_query_bench(sf_dir: str) -> dict:
    """Times each headline operator (result consumed via count())."""
    import __ray_entry__ as E

    qs = E.queries()
    names = [
        "dedup_exact", "dedup_minhash_pairs", "ngram_jaccard",
        "simhash_pairs", "embedding_pairs", "ann_topk", "ann_ivf",
        "token_stats", "quality_score", "lang_id", "fingerprint",
        "pricing_summary", "segment_revenue", "top_parts",
        "events_daily", "media_features",
    ]
    timings = {}
    for name in names:
        t0 = time.time()
        res = qs[name](sf_dir)
        if hasattr(res, "count"):
            res.count()
        timings[name] = round(time.time() - t0, 3)
    return timings


def main_bench() -> None:
    _init_ray(NUM_CPUS)
    flagship = run_flagship_bench(SF_DIR)
    queries = run_query_bench(SF_DIR)
    queries["flagship"] = flagship["sec"]
    total = round(sum(queries.values()), 3)
    print(json.dumps({
        "metric": "bench_total_sec",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "flagship_groups": flagship["groups"],
        "flagship_triples_per_sec": flagship["triples_per_sec"],
    }))
    import ray

    ray.shutdown()


def main_flagship_only(num_cpus: int) -> None:
    _init_ray(num_cpus)
    res = run_flagship_bench(SF_DIR)
    print(json.dumps(res))
    import ray

    ray.shutdown()


def main_scaling() -> None:
    """North-rule scaling evidence: same job, fresh processes, 8 then 32
    CPUs (N and 4N); efficiency = (T8/T32)/4 wall-clock ratio over the
    CPU ratio."""
    levels = [int(x) for x in
              os.environ.get("GRAFT_SCALING_LEVELS", "8,32").split(",")]
    results = {}
    for n in levels:
        out = subprocess.run(
            [sys.executable, __file__, "--flagship-only", str(n)],
            capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        line = out.stdout.strip().splitlines()[-1]
        results[n] = json.loads(line)
    lo, hi = min(levels), max(levels)
    tput = {n: results[n]["triples_per_sec"] for n in levels}
    efficiency = (tput[hi] / tput[lo]) / (hi / lo)
    print(json.dumps({
        "metric": "scaling_efficiency",
        "value": round(efficiency, 3),
        "unit": "ratio",
        "queries": {f"flagship_cpus{n}_sec": results[n]["sec"]
                    for n in levels},
        "throughput_triples_per_sec": tput,
        "cpu_levels": levels,
        "sf": SF_DIR,
        "num_cpus": hi,
    }))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        main_scaling()
    elif "--flagship-only" in sys.argv:
        idx = sys.argv.index("--flagship-only")
        main_flagship_only(int(sys.argv[idx + 1]))
    else:
        main_bench()
