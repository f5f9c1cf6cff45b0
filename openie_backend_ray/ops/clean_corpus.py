"""Composed corpus-cleaning pipeline (the canonical training-data
prep): exact dedup -> minhash-LSH + n-gram-Jaccard near-dup removal ->
quality gate, as ONE Dataset pipeline with an exact SQL oracle.

Shape at scale:
- only LOSER sets (duplicate ids to drop) ever leave the cluster:
  exact losers are the non-min ids within identical-text groups, near
  losers the doc_b of each verified near-dup pair.  Both are
  O(duplicates), small at realistic dup rates, collected once and
  broadcast (``ray.put``) into a single filter pass; at 100 TB the
  same sets shard by hash(doc_id) per filter actor, or become a
  ``Dataset.join(..., "left_anti")`` when even the loser set is big.
- survivors then stream through the vectorized quality gate; nothing
  rematerializes the corpus and nothing driver-side is O(corpus).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def exact_dup_losers(ds):
    """(doc_id) of every document whose text equals an earlier (lower
    doc_id) document — the complement of ``dedup.exact_dedup``."""
    from openie_backend_ray.ops.dedup import add_text_md5

    hashed = ds.map_batches(add_text_md5, batch_format="pyarrow")

    def losers(g: pa.Table) -> pa.Table:
        ids = g["doc_id"]
        keep = pc.not_equal(ids, pc.min(ids))
        return pa.table({"doc_id": ids.filter(keep)})

    return hashed.groupby("text_md5").map_groups(
        losers, batch_format="pyarrow"
    )


def clean_corpus(ds, jaccard_threshold: float = 0.5):
    """documents -> (doc_id, n_tokens) of surviving clean docs.

    Drop rules (in order):
    1. exact duplicate text (keep min doc_id);
    2. near-duplicate by minhash-LSH candidates verified with k-shingle
       Jaccard >= threshold (keep the smaller doc_id of each pair);
    3. quality gate: 10 <= n_tokens <= 10000 and stopword_ratio <= 0.5.
    """
    import ray

    from openie_backend_ray.ops.dedup import ngram_jaccard_pairs
    from openie_backend_ray.ops.textstats import quality_score
    from openie_backend_ray.util import auto_pool

    # small loser sets, collected once (see module docstring)
    losers = {
        r["doc_id"] for r in exact_dup_losers(ds).take_all()
    }
    losers |= {
        r["doc_b"]
        for r in ngram_jaccard_pairs(
            ds, threshold=jaccard_threshold
        ).take_all()
    }
    losers_ref = ray.put(pa.array(sorted(losers), pa.int64()))

    class DropLosers:
        def __init__(self, losers_ref=None, losers=None):
            if losers is None and losers_ref is not None:
                losers = ray.get(losers_ref)
            if not isinstance(losers, pa.Array):
                losers = pa.array(sorted(losers), pa.int64())
            # Arrow array once per actor; per-batch membership is a
            # vectorized pc.is_in, not a per-row Python set probe
            self.losers = losers

        def __call__(self, batch: pa.Table) -> pa.Table:
            mask = pc.invert(
                pc.is_in(batch["doc_id"], value_set=self.losers)
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
