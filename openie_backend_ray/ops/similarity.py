"""Similarity search over the ``embeddings`` table (list<float> column).

- ``ann_topk``: exact brute-force cosine top-k — the correctness
  baseline. The query matrix (small side) is broadcast once via
  ``ray.put``; every batch does one float64 numpy matmul against it and
  emits only its LOCAL top-k per query (k rows per query per batch, not
  n rows), so the final exchange is a tiny per-query reduce.
- ``ann_ivf``: the scale path — coarse quantizer (fixed deterministic
  centroids), vectors hash-partition by nearest-centroid id; queries
  search only their ``nprobe`` nearest buckets. Same output schema.

Scores are rounded to 6dp so the DuckDB ``list_cosine_similarity``
oracle compares exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _norm_rows(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


class TopKScorer:
    """Per-batch local top-k against the broadcast query matrix."""

    def __init__(self, queries_ref=None, queries=None, k: int = 10):
        if queries is None and queries_ref is not None:
            import ray

            queries = ray.get(queries_ref)
        self.q_ids, self.q_mat = queries  # (m,), (m, d) float64 normalized
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        mat = _norm_rows(np.array(batch["embedding"].to_pylist(),
                                  dtype=np.float64))
        sims = self.q_mat @ mat.T  # (m, n)
        k = min(self.k + 1, sims.shape[1])  # +1: self-match may be present
        out_q, out_v, out_s = [], [], []
        part = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        for qi in range(sims.shape[0]):
            qid = self.q_ids[qi]
            for ci in part[qi]:
                if ids[ci] == qid:
                    continue
                out_q.append(qid)
                out_v.append(ids[ci])
                out_s.append(sims[qi, ci])
        return pa.table(
            {"qvec_id": pa.array(out_q, pa.int64()),
             "vec_id": pa.array(out_v, pa.int64()),
             "score": pa.array(np.round(out_s, 6), pa.float64())}
        )


def _final_topk(k: int):
    def reduce_group(t: pa.Table) -> pa.Table:
        rows = sorted(
            zip(t["score"].to_pylist(), t["vec_id"].to_pylist()),
            key=lambda r: (-r[0], r[1]),
        )[:k]
        n = len(rows)
        return pa.table(
            {"qvec_id": pa.array([t["qvec_id"][0].as_py()] * n, pa.int64()),
             "vec_id": pa.array([v for _, v in rows], pa.int64()),
             "rank": pa.array(list(range(1, n + 1)), pa.int32()),
             "score": pa.array([s for s, _ in rows], pa.float64())}
        )

    return reduce_group


def ann_topk(emb_ds, queries_ref, k: int = 10):
    """(qvec_id, vec_id, rank, score): exact top-k neighbors (self
    excluded) for each broadcast query; rank ties break on vec_id."""
    local = emb_ds.map_batches(
        TopKScorer,
        fn_constructor_kwargs={"queries_ref": queries_ref, "k": k},
        batch_format="pyarrow",
        batch_size=2048,
        concurrency=_pool(),
    )
    return local.groupby("qvec_id").map_groups(
        _final_topk(k), batch_format="pyarrow"
    )


def _pool():
    from openie_backend_ray.util import auto_pool

    return auto_pool(0.5)


def query_matrix(emb_table: pa.Table, n_queries: int = 10):
    """Deterministic query set: the ``n_queries`` lowest vec_ids,
    normalized float64 — broadcast via ray.put."""
    import pyarrow.compute as pc

    mask = pc.less(emb_table["vec_id"], n_queries)
    sub = emb_table.filter(mask)
    order = np.argsort(np.asarray(sub["vec_id"].to_pylist()))
    ids = np.asarray(sub["vec_id"].to_pylist(), dtype=np.int64)[order]
    mat = np.array(sub["embedding"].to_pylist(), dtype=np.float64)[order]
    return ids, _norm_rows(mat)


# ---------------------------------------------------------------------------
# IVF variant (scale path)
# ---------------------------------------------------------------------------

def centroid_matrix(emb_table: pa.Table, n_centroids: int | None = None):
    """Deterministic coarse quantizer: centroids are a seeded SAMPLE of
    the corpus — the first ``n_centroids`` vectors in md5(vec_id)
    order (vec_id tie-break), i.e. a uniform deterministic draw, not
    the first-N ids (which at scale are one ingest shard and bucket
    nothing).  ``n_centroids`` defaults to ceil(sqrt(n)) so in-bucket
    exact pairwise work is O(n^2 / sqrt(n)^2) = O(n) in expectation
    instead of quadratic (the FAISS IVF sizing rule of thumb).  No
    kmeans iteration: a Lloyd pass would improve balance but break the
    exact SQL twin; skew is observable via ``ivf_bucket_stats``.

    At 100 TB the sample comes from a streaming ``ds.map_batches`` +
    per-block top-k by md5 instead of an in-memory table — same
    definition, same result."""
    import hashlib
    import math

    n = emb_table.num_rows
    if n_centroids is None:
        n_centroids = max(1, int(math.ceil(math.sqrt(n))))
    ids = emb_table["vec_id"].to_pylist()
    order = sorted(
        range(n),
        key=lambda i: (hashlib.md5(str(ids[i]).encode()).hexdigest(),
                       ids[i]),
    )[:n_centroids]
    sel = emb_table.take(pa.array(order, pa.int64()))
    cid = np.asarray(sel["vec_id"].to_pylist(), dtype=np.int64)
    mat = np.array(sel["embedding"].to_pylist(), dtype=np.float64)
    # re-sort by vec_id so bucket index == rank among sampled ids,
    # matching the SQL twin's dense_rank-free join on cid
    srt = np.argsort(cid)
    return cid[srt], _norm_rows(mat[srt])


def ivf_bucket_stats(assigned) -> pa.Table:
    """(bucket, n_vectors) histogram of an ``IvfAssigner`` output —
    the skew observable the quantizer docstring promises."""
    df = assigned.groupby("bucket").count().to_pandas()
    return pa.table(
        {"bucket": pa.array(df["bucket"].to_numpy(), pa.int32()),
         "n_vectors": pa.array(df["count()"].to_numpy(), pa.int64())}
    )


class IvfAssigner:
    def __init__(self, centroids_ref=None, centroids=None):
        if centroids is None and centroids_ref is not None:
            import ray

            centroids = ray.get(centroids_ref)
        _, self.c_mat = centroids

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _norm_rows(np.array(batch["embedding"].to_pylist(),
                                  dtype=np.float64))
        sims = mat @ self.c_mat.T
        assign = np.asarray(np.argmax(np.round(sims, 6), axis=1),
                            dtype=np.int32)
        return batch.append_column("bucket", pa.array(assign, pa.int32()))


def _ivf_bucket_scorer(queries, centroids, k: int, nprobe: int):
    """Per-bucket scorer closure: queries whose nprobe-nearest centroids
    include the group's bucket score only that bucket's vectors. The
    probe table is tiny (m x nprobe), so closure capture — shipped with
    the task spec — beats an actor pool here."""
    q_ids, q_mat = queries
    _, c_mat = centroids
    sims = np.round(q_mat @ c_mat.T, 6)
    order = np.argsort(-sims, axis=1, kind="stable")
    probe: dict[int, list[int]] = {}
    for qi in range(order.shape[0]):
        for b in order[qi, :nprobe]:
            probe.setdefault(int(b), []).append(qi)

    def score(batch: pa.Table) -> pa.Table:
        bucket = batch["bucket"][0].as_py()
        q_idx = probe.get(bucket, [])
        if not q_idx:
            return pa.table(
                {"qvec_id": pa.array([], pa.int64()),
                 "vec_id": pa.array([], pa.int64()),
                 "score": pa.array([], pa.float64())}
            )
        ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        mat = _norm_rows(np.array(batch["embedding"].to_pylist(),
                                  dtype=np.float64))
        bsims = q_mat[q_idx] @ mat.T
        out_q, out_v, out_s = [], [], []
        for row, qi in enumerate(q_idx):
            qid = q_ids[qi]
            kk = min(k + 1, bsims.shape[1])
            part = np.argpartition(-bsims[row], kk - 1)[:kk]
            for ci in part:
                if ids[ci] == qid:
                    continue
                out_q.append(qid)
                out_v.append(ids[ci])
                out_s.append(bsims[row, ci])
        return pa.table(
            {"qvec_id": pa.array(out_q, pa.int64()),
             "vec_id": pa.array(out_v, pa.int64()),
             "score": pa.array(np.round(out_s, 6), pa.float64())}
        )

    return score


def ann_ivf(emb_ds, queries_ref, centroids_ref, k: int = 10,
            nprobe: int = 4):
    """IVF-partitioned ANN: assign -> groupby(bucket) -> per-bucket
    scoring -> per-query reduce. Recall < 1 by design (probes nprobe of
    the buckets); deterministic, so still oracle-checkable."""
    import ray

    assigned = emb_ds.map_batches(
        IvfAssigner,
        fn_constructor_kwargs={"centroids_ref": centroids_ref},
        batch_format="pyarrow",
        concurrency=_pool(),
    )
    scorer = _ivf_bucket_scorer(
        ray.get(queries_ref), ray.get(centroids_ref), k, nprobe
    )
    scored = assigned.groupby("bucket").map_groups(
        scorer, batch_format="pyarrow"
    )
    return scored.groupby("qvec_id").map_groups(
        _final_topk(k), batch_format="pyarrow"
    )


def embedding_pairs_ivf(emb_ds, centroids_ref, threshold: float = 0.95):
    """IVF-bucketed embedding near-dup pairs — the scale path for
    ``dedup.embedding_pairs``: assign each vector to its nearest
    centroid, ONE groupby(bucket) shuffle, then exact pairwise cosine
    within each bucket (vec_a < vec_b, round-6 score >= threshold).

    Candidates are same-bucket only (nprobe=1 semantics), so recall<1
    vs the exact broadcast baseline by design — the LSH-band analogue
    for dense vectors; cost is sum of bucket^2, never corpus^2, and no
    process holds the full matrix."""

    assigned = emb_ds.map_batches(
        IvfAssigner,
        fn_constructor_kwargs={"centroids_ref": centroids_ref},
        batch_format="pyarrow",
        concurrency=_pool(),
    )

    def bucket_pairs(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        mat = _norm_rows(np.array(batch["embedding"].to_pylist(),
                                  dtype=np.float64))
        sims = np.round(mat @ mat.T, 6)
        iu = np.triu_indices(len(ids), 1)
        keep = sims[iu] >= threshold
        a = ids[iu[0][keep]]
        b = ids[iu[1][keep]]
        lo = np.minimum(a, b)
        hi = np.maximum(a, b)
        return pa.table(
            {"vec_a": pa.array(lo, pa.int64()),
             "vec_b": pa.array(hi, pa.int64()),
             "cosine": pa.array(sims[iu][keep], pa.float64())}
        )

    return assigned.groupby("bucket").map_groups(
        bucket_pairs, batch_format="pyarrow"
    )
