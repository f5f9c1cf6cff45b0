"""Serving-path latency harness (the ``IndexBenchmarker`` analogue,
``backend/.../benchmark/IndexBenchmarker.scala:41-74``): the reference
fires random identity queries sampled from the indexed vocabulary at a
warm fetcher and reports per-query latency stats.

Here: materialize the fixture triples store (sorted partitioned
parquet), sample N arg1 norms deterministically from the store's
vocabulary, run the budgeted size-tiered ``fetch_groups`` per query
(clauses pre-normalized — identity queries probe the index path, not
the query-side tagger), and print ONE JSON line with avg/p50/p95/p99
latency plus per-status counts.

Usage: python scripts/bench_fetch.py [n_queries]
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    n_queries = int(sys.argv[1]) if len(sys.argv) > 1 else 50

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "8")),
            include_dashboard=False,
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import pyarrow.parquet as pq
    import ray.data

    from openie_backend_ray.fixtures.corpus import build_groups_table
    from openie_backend_ray.fixtures.views import views_dir
    from openie_backend_ray.pipelines.flagship import materialize_triples
    from openie_backend_ray.pipelines.query import fetch_groups

    out_dir = os.path.join(views_dir(), "triples_store")
    marker = os.path.join(out_dir, "_DONE")
    if not os.path.exists(marker):
        materialize_triples(
            ray.data.from_arrow(build_groups_table()).repartition(8),
            out_dir,
        )
        open(marker, "w").close()

    # query vocabulary = the indexed arg1 norms (IndexBenchmarker reads
    # its query strings from the index's own terms)
    vocab = sorted(
        {
            v
            for f in os.listdir(out_dir)
            if f.endswith(".parquet")
            for v in pq.read_table(
                os.path.join(out_dir, f), columns=["arg1_norm"]
            )["arg1_norm"].to_pylist()
        }
    )
    rng = random.Random(7)
    picks = [vocab[rng.randrange(len(vocab))] for _ in range(n_queries)]

    # warm-up (JIT/read-cache parity with the reference's warm fetcher)
    fetch_groups(out_dir, arg1=picks[0], normalize=False)

    lat = []
    statuses: dict[str, int] = {}
    hits = 0
    for q in picks:
        t0 = time.monotonic()
        rs = fetch_groups(out_dir, arg1=q, normalize=False)
        lat.append((time.monotonic() - t0) * 1000.0)
        statuses[rs.status] = statuses.get(rs.status, 0) + 1
        hits += rs.num_groups
    lat.sort()

    def pct(p: float) -> float:
        return lat[min(len(lat) - 1, int(p * len(lat)))]

    print(
        json.dumps(
            {
                "metric": "fetch_latency_ms",
                "value": round(sum(lat) / len(lat), 2),
                "unit": "ms",
                "n_queries": n_queries,
                "p50_ms": round(pct(0.50), 2),
                "p95_ms": round(pct(0.95), 2),
                "p99_ms": round(pct(0.99), 2),
                "groups_returned": hits,
                "statuses": statuses,
            }
        )
    )
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
