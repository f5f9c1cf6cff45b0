"""Incremental ingestion (SURVEY.md S7/G11): delta pipeline.

The reference's news ingester diffs new files against what HDFS already
has, converts, and point-updates the Lucene indexes group-by-group
(``hadoop/.../lucene/Ingester.scala:45-121``; merge-update-else-add
``ParallelIndexModifier.scala:33-77``; relink heuristic
``IndexModifier.scala:89-97``). Our shape replaces point updates with a
shuffle-merge over the partitioned triples table:

1. **delta detect** (J6): anti-join incoming doc_ids against the
   lineage table of already-ingested doc_ids (broadcast set probe —
   the lineage table is ids only);
2. run the NORMAL flagship stages over the delta documents only;
3. **merge** (G11): union(existing groups, delta groups) ->
   ``regroup`` (G2's key + merge) -> rewrite the triples partitions.
   The reference's "relink when size in a sweet spot" heuristic is
   re-expressed as: groups whose size changed re-enter the linker in
   the next run (lineage manifest records sizes).
"""

from __future__ import annotations

import pyarrow as pa


def anti_join_new_docs(docs_ds, ingested_ids_ref):
    """Keep only documents whose doc_id is NOT in the broadcast lineage
    set (J6). At 100 TB lineage shards by hash(doc_id) and each actor
    holds one shard; semantics identical."""
    class Probe:
        def __init__(self, ingested_ids_ref=None, ids=None):
            if ids is None and ingested_ids_ref is not None:
                import ray

                ids = ray.get(ingested_ids_ref)
            self.ids = ids or set()

        def __call__(self, batch: pa.Table) -> pa.Table:
            mask = pa.array(
                [d not in self.ids for d in batch["doc_id"].to_pylist()],
                pa.bool_(),
            )
            return batch.filter(mask)

    from openie_backend_ray.util import auto_pool

    return docs_ds.map_batches(
        Probe,
        fn_constructor_kwargs={"ingested_ids_ref": ingested_ids_ref},
        batch_format="pyarrow",
        concurrency=auto_pool(0.25),
    )


def incremental_update(
    existing_groups_ds,
    incoming_docs_ds,
    ingested_ids_ref,
    lexicon_ref=None,
    side_tables_ref=None,
    corpus: str = "news",
):
    """existing triples + incoming docs -> merged triples (G11).

    Returns (merged_groups_ds, delta_docs_ds). The caller persists the
    merged table (checkpoint.run_shard) and appends the delta doc_ids
    to the lineage table."""
    from openie_backend_ray.pipelines.flagship import run_flagship
    from openie_backend_ray.stages.postgroup import regroup

    delta_docs = anti_join_new_docs(incoming_docs_ds, ingested_ids_ref)
    delta_groups = run_flagship(
        delta_docs,
        lexicon_ref=lexicon_ref,
        side_tables_ref=side_tables_ref,
        corpus=corpus,
    )
    merged = regroup(existing_groups_ds.union(delta_groups))
    return merged, delta_docs
