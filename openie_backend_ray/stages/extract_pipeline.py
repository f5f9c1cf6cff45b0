"""Fused map front-end: documents -> combined partial groups in ONE
actor-pool stage (explode -> chunk -> extract -> key -> combine).

Why fused: as four separate Dataset operators, the streaming executor's
resource allocator split the cluster across every operator and the
CPU-heavy extract+combine stage ran with ~25% of the cluster (measured
41s wall for 78 CPU-seconds of work on 8 CPUs). One actor-pool stage
owns the pool it is given, and the per-batch combiner still sees a full
document block's extractions. The reference fuses exactly the same way
when it chains grouper work into one job
(``hadoop/.../ScoobiReVerbGrouperLinker.scala:20-33``).
"""

from __future__ import annotations

import pyarrow as pa

from openie_backend_ray.stages.chunker import ChunkerActor
from openie_backend_ray.stages.extractor import extract_rows
from openie_backend_ray.stages.grouper import combine_rows
from openie_backend_ray.stages.sentences import explode_text_spans


class ExtractCombineActor(ChunkerActor):
    """documents batch -> BLOB_GROUPS partial rows (M1+M2+M5+M6+G1 map
    side). Lexicon/model state loads once per actor (A1/A2)."""

    def __init__(self, lexicon_ref=None, lexicon=None,
                 corpus: str = "corpus"):
        super().__init__(lexicon_ref=lexicon_ref, lexicon=lexicon)
        self.corpus = corpus
        # per-actor sentence-level extraction memo (see extract_rows)
        self._memo: dict = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        sentences = explode_text_spans(batch)
        chunked = super().__call__(sentences)
        return combine_rows(
            extract_rows(chunked, corpus=self.corpus, memo=self._memo)
        )


def extract_and_combine(docs_ds, lexicon_ref=None, corpus: str = "corpus",
                        concurrency=None):
    """documents -> partial blob-group rows, ready for the G1 shuffle."""
    from openie_backend_ray.util import actor_cpus, auto_pool

    return docs_ds.map_batches(
        ExtractCombineActor,
        fn_constructor_kwargs={"lexicon_ref": lexicon_ref,
                               "corpus": corpus},
        batch_format="pyarrow",
        batch_size=None,  # per input block: keeps task count = blocks
        concurrency=concurrency or auto_pool(0.7),
        num_cpus=actor_cpus(),
    )
