"""Span explode: documents -> one row per text span (vectorized Arrow).

Replaces the reference's line-per-sentence HDFS input
(``hadoop/.../ScoobiSentenceChunker.scala:35-52`` reads ``[sentence,
url]`` lines); our input is the interleaved-span documents table, so the
first stage explodes ``spans`` and keeps ``kind == "text"`` rows. Media
spans are untouched by the pipeline (they simply aren't selected here;
the documents table itself is never rewritten — span-sequence
invariant)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def explode_text_spans(batch: pa.Table) -> pa.Table:
    """doc_id, spans -> doc_id, span_idx, text (text spans only)."""
    spans = batch["spans"]
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    flat = pc.list_flatten(spans)
    parent = pc.list_parent_indices(spans)
    doc_ids = pc.take(batch["doc_id"], parent)
    kind = pc.struct_field(flat, "kind")
    text = pc.struct_field(flat, "text")
    offset = pc.struct_field(flat, "offset")
    mask = pc.equal(kind, pa.scalar("text"))
    out = pa.table(
        {
            "doc_id": doc_ids,
            "span_idx": offset,
            "text": text,
        }
    )
    return out.filter(mask)
