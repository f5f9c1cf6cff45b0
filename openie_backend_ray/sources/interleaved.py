"""Interleaved-document sources (BASELINE.json input_hint shape:
``documents(doc_id: string, spans: list<struct<kind, text, media_ref,
offset>>)``).

- ``read_documents``: Parquet (or Lance when the reader is available)
  -> Dataset of interleaved documents. Replaces the reference's HDFS
  LZO text source (S1, ``hadoop/.../ScoobiReVerbGrouper.scala:137``).
- ``interleave_flat``: adapter from a flat ``documents(doc_id:int64,
  text, ...)`` table to the interleaved shape, fully vectorized and
  DETERMINISTIC (every third doc gets a leading image span) so a SQL
  oracle can reproduce the layout exactly.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from openie_backend_ray import schema as S


def read_documents(path: str, **kwargs):
    """Read an interleaved documents table (Lance if the path/format
    demands it and the reader exists, else Parquet)."""
    import ray.data

    if path.endswith(".lance") or kwargs.pop("format", "") == "lance":
        try:
            return ray.data.read_lance(path, **kwargs)
        except (AttributeError, ImportError):
            raise NotImplementedError(
                "Lance reader not available in this environment; "
                "store the documents table as Parquet"
            )
    return ray.data.read_parquet(path, **kwargs)


def interleave_flat_batch(batch: pa.Table) -> pa.Table:
    """Flat (doc_id:int64, text) -> interleaved documents rows.

    Layout (deterministic, oracle-reproducible):
      doc_id % 3 == 0 -> [image span(media://image/<id>), text span]
      else            -> [text span]
    """
    ids = batch["doc_id"]
    texts = batch["text"]
    sid = pc.cast(ids, pa.string())
    id_list = ids.to_pylist()
    text_list = texts.to_pylist()
    spans = []
    for i, t in zip(id_list, text_list):
        row = []
        if i % 3 == 0:
            row.append({"kind": "image", "text": "",
                        "media_ref": f"media://image/{i}", "offset": 0})
            row.append({"kind": "text", "text": t, "media_ref": "",
                        "offset": 1})
        else:
            row.append({"kind": "text", "text": t, "media_ref": "",
                        "offset": 0})
        spans.append(row)
    return pa.table(
        {"doc_id": sid, "spans": pa.array(spans, pa.list_(S.SPAN))},
        schema=S.DOCUMENTS,
    )


def interleave_flat(flat_ds):
    return flat_ds.map_batches(interleave_flat_batch, batch_format="pyarrow")
