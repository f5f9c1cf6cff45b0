"""10x scale probes for the dedup/similarity scale paths (BASELINE.md
evidence): synthesizes a deterministic 10x replica of the sf0.1
documents and embeddings tables under /tmp, then times

- clean_corpus on the broadcast path AND the >cap LEFT-ANTI co-group
  path (loser_broadcast_cap=0) — proof the anti-join path holds at 10x
  with no O(duplicates) driver materialization;
- embedding_pairs_ivf / ann_ivf at 1x and 10x with emitted pair
  counts — sub-quadratic evidence for the ceil(sqrt(n)) quantizer
  (fixed-16 centroids would scale in-bucket pair work ~100x for 10x
  vectors; sqrt-scaled centroids hold it ~10x).

Usage: python scripts/probe_10x.py  (prints one JSON line)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROBE_DIR = "/tmp/probe10x"
SF = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPL = 10


def build_tables() -> str:
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    os.makedirs(PROBE_DIR, exist_ok=True)
    docs_out = os.path.join(PROBE_DIR, "documents.parquet")
    emb_out = os.path.join(PROBE_DIR, "embeddings.parquet")
    if not os.path.exists(docs_out):
        base = pq.read_table(f"{SF}/documents.parquet",
                             columns=["doc_id", "text"])
        n = base.num_rows
        reps = []
        for r in range(REPL):
            shifted = base.set_column(
                0, "doc_id", pc.add(base["doc_id"], r * n)
            )
            reps.append(shifted)
        pq.write_table(pa.concat_tables(reps), docs_out,
                       row_group_size=4096)
    if not os.path.exists(emb_out):
        base = pq.read_table(f"{SF}/embeddings.parquet")
        n = base.num_rows
        reps = []
        for r in range(REPL):
            shifted = base.set_column(
                base.schema.get_field_index("vec_id"), "vec_id",
                pc.add(base["vec_id"], r * n),
            )
            reps.append(shifted)
        pq.write_table(pa.concat_tables(reps), emb_out,
                       row_group_size=2048)
    return PROBE_DIR


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    build_tables()

    import pyarrow.parquet as pq

    import __ray_entry__ as E
    from openie_backend_ray.ops import similarity as SIM
    from openie_backend_ray.ops.clean_corpus import clean_corpus

    out: dict = {"metric": "probe_10x", "sf": SF, "replication": REPL}

    # clean_corpus: broadcast vs forced anti-join at 10x
    for label, kw in (("clean10x_broadcast", {}),
                      ("clean10x_antijoin", {"loser_broadcast_cap": 0})):
        ds = E._read(PROBE_DIR, "documents", ["doc_id", "text"])
        t0 = time.time()
        n = clean_corpus(ds, **kw).count()
        out[label] = {"sec": round(time.time() - t0, 2), "rows": n}

    # IVF: pair counts + wall at 1x and 10x
    for label, d in (("ivf_1x", SF), ("ivf_10x", PROBE_DIR)):
        emb = pq.read_table(f"{d}/embeddings.parquet")
        c_ref = ray.put(SIM.centroid_matrix(emb))
        ds = E._read(d, "embeddings")
        t0 = time.time()
        pairs = SIM.embedding_pairs_ivf(ds, c_ref, threshold=0.35).count()
        t1 = time.time()
        q_ref = ray.put(SIM.query_matrix(emb, 10))
        ds2 = E._read(d, "embeddings")
        t2 = time.time()
        topk = SIM.ann_ivf(ds2, q_ref, c_ref, k=10, nprobe=4).count()
        out[label] = {
            "vectors": emb.num_rows,
            "pairs": pairs, "pairs_sec": round(t1 - t0, 2),
            "ann_rows": topk, "ann_sec": round(time.time() - t2, 2),
        }
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
