"""Flagship batch corpus pipeline (SURVEY.md §3.1).

Reference flow (one Hadoop job per arrow, text checkpoints between):

    [sentence, url] -> chunk -> extract -> group(+conf) -> link ->
    filter -> index

Ray Data flow (stages fuse under the streaming executor; the only
all-to-all exchange is the grouping shuffle; a second, much smaller one
canonicalizes):

    read documents (Parquet/Lance)
      -> explode text spans                (vectorized Arrow)
      -> ChunkerActor pool                 (lexicon/model per actor)
      -> extract+key+conf                  (stateless flat map)
      -> groupby(norm key) [salted]        (G1 shuffle, caps)
      -> LinkerActor pool                  (crosswikis/fb dict shards)
      -> instance dedup                    (per-group, G3)
      -> filters                           (M7-M9, vectorized)
      -> canonicalize                      (G4 second shuffle)
      -> materialize triples               (sorted partitioned Parquet)
"""

from __future__ import annotations

from typing import Any

import ray
import ray.data

from openie_backend_ray.stages.chunker import ChunkerActor
from openie_backend_ray.stages.extractor import extract_batch
from openie_backend_ray.stages.grouper import group_extractions
from openie_backend_ray.stages.sentences import explode_text_spans


def chunk_documents(
    docs_ds: ray.data.Dataset,
    lexicon_ref: Any | None = None,
    chunker_concurrency: int | tuple[int, int] = 2,
    batch_size: int = 1024,
) -> ray.data.Dataset:
    """documents -> chunked sentences (M1)."""
    sentences = docs_ds.map_batches(
        explode_text_spans, batch_format="pyarrow", batch_size=batch_size
    )
    return sentences.map_batches(
        ChunkerActor,
        fn_constructor_kwargs={"lexicon_ref": lexicon_ref},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=chunker_concurrency,
    )


def extract_and_group(
    docs_ds: ray.data.Dataset,
    lexicon_ref: Any | None = None,
    corpus: str = "corpus",
    chunker_concurrency: int | tuple[int, int] = 2,
    batch_size: int = 1024,
) -> ray.data.Dataset:
    """documents -> grouped (unlinked) ExtractionGroups (M1,M2,M5,M6,G1)."""
    chunked = chunk_documents(
        docs_ds, lexicon_ref, chunker_concurrency, batch_size
    )
    keyed = chunked.map_batches(
        lambda b: extract_batch(b, corpus=corpus),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
    return group_extractions(keyed)
