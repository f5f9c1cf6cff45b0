"""Composed corpus-cleaning pipeline (the canonical training-data
prep): exact dedup -> minhash-LSH + n-gram-Jaccard near-dup removal ->
quality gate, as ONE Dataset pipeline with an exact SQL oracle.

Shape at scale:
- the LOSER sets (duplicate ids to drop) are small even when the corpus
  is not — exact losers are non-min ids within identical-text groups,
  near-dup losers are the higher id of each verified pair. They are
  collected once and broadcast (``ray.put``) into a single filter pass;
  at 100 TB the same sets shard by hash(doc_id) per filter actor.
- survivors then stream through the vectorized quality gate; nothing
  rematerializes the corpus.
"""

from __future__ import annotations

import pyarrow as pa


def clean_corpus(ds, docs_ref, jaccard_threshold: float = 0.5):
    """documents -> (doc_id, n_tokens) of surviving clean docs.

    Drop rules (in order):
    1. exact duplicate text (keep min doc_id);
    2. near-duplicate by minhash-LSH candidates verified with k-shingle
       Jaccard >= threshold (keep the smaller doc_id of each pair);
    3. quality gate: 10 <= n_tokens <= 10000 and stopword_ratio <= 0.5.
    """
    import ray

    from openie_backend_ray.ops.dedup import (
        exact_dedup,
        ngram_jaccard_pairs,
    )
    from openie_backend_ray.ops.textstats import quality_score
    from openie_backend_ray.util import auto_pool

    # small loser sets, collected once (see module docstring)
    keepers = {
        r["doc_id"] for r in exact_dedup(ds).take_all()
    }
    near_losers = {
        r["doc_b"]
        for r in ngram_jaccard_pairs(
            ds, docs_ref, threshold=jaccard_threshold
        ).take_all()
    }
    losers_ref = ray.put((keepers, near_losers))

    class DropLosers:
        def __init__(self, losers_ref=None, sets=None):
            if sets is None and losers_ref is not None:
                sets = ray.get(losers_ref)
            self.keepers, self.near_losers = sets

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_pylist()
            mask = pa.array(
                [d in self.keepers and d not in self.near_losers
                 for d in ids],
                pa.bool_(),
            )
            return batch.filter(mask)

    survivors = ds.map_batches(
        DropLosers,
        fn_constructor_kwargs={"losers_ref": losers_ref},
        batch_format="pyarrow",
        concurrency=auto_pool(0.25),
    )
    scored = quality_score(survivors)

    def keep_and_project(b: pa.Table) -> pa.Table:
        kept = b.filter(b["keep"].combine_chunks()
                        if isinstance(b["keep"], pa.ChunkedArray)
                        else b["keep"])
        return pa.table({"doc_id": kept["doc_id"],
                         "n_tokens": kept["n_tokens"]})

    return scored.map_batches(keep_and_project, batch_format="pyarrow")
