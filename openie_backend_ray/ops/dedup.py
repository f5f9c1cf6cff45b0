"""Deduplication operators over the flat ``documents`` table: exact,
MinHash+LSH band candidates, n-gram Jaccard verification, SimHash,
embedding-cosine near-dup.

Scale shape (the part that matters at 100 TB):
- exact: md5 the text vectorized, ONE hash-partition groupby on the
  16-byte digest (never on the raw text), min-doc_id reducer.
- minhash: signatures are computed batch-local (shingle -> md5 -> min),
  then (band, bucket) rows shuffle with a groupby — the only all-to-all
  — and pairs are emitted per bucket with a cap so one degenerate
  bucket cannot OOM a reducer.
- jaccard verify: runs on the *candidate pairs* (LSH output), never all
  pairs; per-pair shingle sets are re-derived from a broadcast doc map
  at fixture scale / a hash-join at real scale.
- embedding near-dup: brute-force cosine per batch against a broadcast
  float64 matrix (numpy matmul), threshold filter; the LSH/IVF path for
  scale lives in ``similarity.py``.

All hashing is md5 (python hashlib == DuckDB md5()) so every op except
simhash-sign extraction has an exact SQL oracle twin.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

NUM_PERM = 12
BANDS = 4  # rows per band = NUM_PERM // BANDS
SHINGLE_K = 3
MAX_BUCKET = 64  # pair-emit cap per LSH bucket (skew guard)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def add_text_md5(batch: pa.Table) -> pa.Table:
    """Vectorized md5(text) column (digest travels, raw text does not)."""
    digests = [hashlib.md5(t.encode()).hexdigest()
               for t in batch["text"].to_pylist()]
    return pa.table(
        {"doc_id": batch["doc_id"],
         "text_md5": pa.array(digests, pa.string())}
    )


def exact_dedup(ds):
    """Keep min doc_id per identical text -> (doc_id, text_md5)."""
    hashed = ds.map_batches(add_text_md5, batch_format="pyarrow")
    agg = hashed.groupby("text_md5").min("doc_id")
    return agg.map_batches(
        lambda b: pa.table({"doc_id": b["min(doc_id)"],
                            "text_md5": b["text_md5"]}),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# minhash + LSH bands
# ---------------------------------------------------------------------------

def _shingles(toks: list[str], k: int = SHINGLE_K) -> set:
    if len(toks) < k:
        return {" ".join(toks)}
    return {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}


def _signature(sh: set, num_perm: int = NUM_PERM) -> list[str]:
    """Min (lexicographic) md5 hex per salted permutation — identical in
    DuckDB: min(md5(i || ':' || shingle))."""
    return [
        min(hashlib.md5(f"{p}:{s}".encode()).hexdigest() for s in sh)
        for p in range(num_perm)
    ]


def minhash_bands_batch(batch: pa.Table) -> pa.Table:
    """doc -> BANDS rows of (band, bucket, doc_id); bucket = md5 of the
    band's concatenated signature slice."""
    if batch.num_rows == 0:
        return pa.table({"band": pa.array([], pa.int32()),
                         "bucket": pa.array([], pa.string()),
                         "doc_id": pa.array([], pa.int64())})
    toks_col = pc.split_pattern_regex(batch["text"], r"\s+").to_pylist()
    doc_ids = batch["doc_id"].to_pylist()
    rows_per_band = NUM_PERM // BANDS
    bands, buckets, ids = [], [], []
    for did, toks in zip(doc_ids, toks_col):
        sig = _signature(_shingles(toks))
        for b in range(BANDS):
            chunk = "|".join(sig[b * rows_per_band:(b + 1) * rows_per_band])
            bands.append(b)
            buckets.append(hashlib.md5(chunk.encode()).hexdigest())
            ids.append(did)
    return pa.table(
        {"band": pa.array(bands, pa.int32()),
         "bucket": pa.array(buckets, pa.string()),
         "doc_id": pa.array(ids, pa.int64())}
    )


def _bucket_pairs(group: pa.Table) -> pa.Table:
    ids = sorted(group["doc_id"].to_pylist())[:MAX_BUCKET]
    a, b = [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a.append(ids[i])
            b.append(ids[j])
    return pa.table({"doc_a": pa.array(a, pa.int64()),
                     "doc_b": pa.array(b, pa.int64())})


def minhash_pairs(ds):
    """LSH candidate duplicate pairs (doc_a < doc_b), distinct across
    bands. Shuffles only (band, bucket, doc_id) tuples."""
    bands = ds.map_batches(minhash_bands_batch, batch_format="pyarrow")
    pairs = bands.groupby(["band", "bucket"]).map_groups(
        _bucket_pairs, batch_format="pyarrow"
    )
    # distinct (a pair can collide in several bands)
    return pairs.groupby(["doc_a", "doc_b"]).map_groups(
        lambda t: t.slice(0, 1), batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard verify (on candidate pairs)
# ---------------------------------------------------------------------------

class JaccardVerifier:
    """Actor: holds the doc_id -> shingle-set map (broadcast once via
    ray.put at fixture scale; at 100 TB this becomes a hash-join of the
    pair list against the docs table on doc_id — same semantics)."""

    def __init__(self, docs_ref=None, docs: pa.Table | None = None):
        if docs is None and docs_ref is not None:
            import ray

            docs = ray.get(docs_ref)
        assert docs is not None
        toks = pc.split_pattern_regex(docs["text"], r"\s+").to_pylist()
        self.sh = {
            d: _shingles(t)
            for d, t in zip(docs["doc_id"].to_pylist(), toks)
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        a_ids = batch["doc_a"].to_pylist()
        b_ids = batch["doc_b"].to_pylist()
        jac = []
        for a, b in zip(a_ids, b_ids):
            sa, sb = self.sh.get(a, set()), self.sh.get(b, set())
            union = len(sa | sb)
            # raw int/int division: bit-identical to the SQL oracle
            jac.append(len(sa & sb) / union if union else 0.0)
        return pa.table(
            {"doc_a": batch["doc_a"], "doc_b": batch["doc_b"],
             "jaccard": pa.array(jac, pa.float64())}
        )


def ngram_jaccard_pairs(ds, docs_ref, threshold: float = 0.5):
    """Candidate pairs -> exact k-shingle Jaccard >= threshold."""
    from openie_backend_ray.util import auto_pool

    cands = minhash_pairs(ds)
    scored = cands.map_batches(
        JaccardVerifier,
        fn_constructor_kwargs={"docs_ref": docs_ref},
        batch_format="pyarrow",
        concurrency=auto_pool(0.25),
    )
    return scored.filter(expr=f"jaccard >= {threshold}")


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------

def simhash_batch(batch: pa.Table) -> pa.Table:
    """64-bit SimHash over tokens (bit source: md5 of token). Vectorized
    across the batch: token -> ±1 bit rows, summed with numpy."""
    if batch.num_rows == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "simhash": pa.array([], pa.string())})
    toks_col = pc.split_pattern_regex(batch["text"], r"\s+").to_pylist()
    out = []
    cache: dict[str, np.ndarray] = {}
    for toks in toks_col:
        acc = np.zeros(64, dtype=np.int64)
        for t in toks:
            bits = cache.get(t)
            if bits is None:
                raw = np.frombuffer(hashlib.md5(t.encode()).digest()[:8],
                                    dtype=np.uint8)
                # bit b of the 64-bit big-endian hash -> ±1
                bits = (np.unpackbits(raw).astype(np.int64) * 2) - 1
                cache[t] = bits
            acc += bits
        val = 0
        for b, v in enumerate(acc):
            if v > 0:
                val |= 1 << (63 - b)
        out.append(f"{val:016x}")
    return pa.table({"doc_id": batch["doc_id"],
                     "simhash": pa.array(out, pa.string())})


def simhash(ds):
    return ds.map_batches(simhash_batch, batch_format="pyarrow")


def simhash_pairs(ds, max_hamming: int = 3):
    """Near-dup pairs by SimHash: 4x16-bit block LSH (a pair within
    hamming distance <=3 of 64 bits shares at least one exact 16-bit
    block) then exact hamming verify per bucket."""
    def blocks(batch: pa.Table) -> pa.Table:
        sh = simhash_batch(batch)
        ids, blk, val, full = [], [], [], []
        for d, h in zip(sh["doc_id"].to_pylist(), sh["simhash"].to_pylist()):
            for b in range(4):
                ids.append(d)
                blk.append(b)
                val.append(h[b * 4:(b + 1) * 4])
                full.append(h)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "block": pa.array(blk, pa.int32()),
                         "block_val": pa.array(val, pa.string()),
                         "simhash": pa.array(full, pa.string())})

    def pairs(group: pa.Table) -> pa.Table:
        rows = sorted(zip(group["doc_id"].to_pylist(),
                          group["simhash"].to_pylist()))[:MAX_BUCKET]
        a, b = [], []
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                d = bin(int(rows[i][1], 16) ^ int(rows[j][1], 16)).count("1")
                if d <= max_hamming and rows[i][0] != rows[j][0]:
                    a.append(rows[i][0])
                    b.append(rows[j][0])
        return pa.table({"doc_a": pa.array(a, pa.int64()),
                         "doc_b": pa.array(b, pa.int64())})

    blk = ds.map_batches(blocks, batch_format="pyarrow")
    cand = blk.groupby(["block", "block_val"]).map_groups(
        pairs, batch_format="pyarrow"
    )
    return cand.groupby(["doc_a", "doc_b"]).map_groups(
        lambda t: t.slice(0, 1), batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------

class CosinePairFinder:
    """Actor: full embedding matrix broadcast once (ray.put); each batch
    matmuls against it in float64 and emits pairs over threshold with
    doc_a < doc_b. At real scale the matrix side is IVF-bucketed
    (similarity.py) — this is the exact baseline."""

    def __init__(self, mat_ref=None, ids_vecs=None, threshold: float = 0.95):
        if ids_vecs is None and mat_ref is not None:
            import ray

            ids_vecs = ray.get(mat_ref)
        self.all_ids, self.mat = ids_vecs  # (n,), (n, d) float64 L2-normed
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        vecs = np.array(batch["embedding"].to_pylist(), dtype=np.float64)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = (vecs / norms) @ self.mat.T
        rows, cols = np.nonzero(np.round(sims, 6) >= self.threshold)
        a = ids[rows]
        b = self.all_ids[cols]
        keep = a < b
        return pa.table(
            {"vec_a": pa.array(a[keep], pa.int64()),
             "vec_b": pa.array(b[keep], pa.int64()),
             "cosine": pa.array(np.round(sims[rows, cols][keep], 6),
                                pa.float64())}
        )


def embedding_pairs(emb_ds, mat_ref, threshold: float = 0.95):
    from openie_backend_ray.util import auto_pool

    return emb_ds.map_batches(
        CosinePairFinder,
        fn_constructor_kwargs={"mat_ref": mat_ref, "threshold": threshold},
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=auto_pool(0.5),
    )


def normalized_matrix(emb_table: pa.Table):
    """(ids, L2-normalized float64 matrix) for broadcast via ray.put."""
    ids = np.asarray(emb_table["vec_id"].to_pylist(), dtype=np.int64)
    mat = np.array(emb_table["embedding"].to_pylist(), dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return ids, mat / norms
