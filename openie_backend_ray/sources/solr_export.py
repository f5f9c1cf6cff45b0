"""S6: the Solr serving-path export (``populator/.../SolrLoader.scala``).

The reference's second serving path posts each ExtractionGroup to Solr
as a document with flattened entity/type fields and the instance list
as an opaque Kryo-serialized blob, in batches of 1000
(``SolrLoader.scala:47-140``, ``SolrJsonLoader.toJsonObject``).  Here
the same documents are produced as JSONL — one JSON object per line,
the exact field map of ``toJsonObject`` — which a ``curl`` loop or the
Solr post tool can replay against ``/update/json``; Kryo becomes
pickle+base64 (an engine-internal provenance blob either way).

``id``: the reference uses a process-global counter
(``id.getAndIncrement``) — meaningless under distributed export, so the
id here is the md5 of the normalized triple key (stable, unique per
group, reproducible across runs).
"""

from __future__ import annotations

import base64
import hashlib
import json
import pickle

import pyarrow as pa


def _typ(full: str) -> str:
    """'/domain/typ' -> 'typ' (FreeBaseType.typ)."""
    parts = [p for p in full.split("/") if p]
    return parts[-1] if parts else full


def solr_doc(row: dict) -> dict:
    """One GROUPS row -> the SolrJsonLoader field map."""
    doc = {
        "id": hashlib.md5(
            f"{row['arg1_norm']}__{row['rel_norm']}__{row['arg2_norm']}"
            .encode()
        ).hexdigest(),
        "arg1": row["arg1_norm"],
        "rel": row["rel_norm"],
        "arg2": row["arg2_norm"],
        "corpora": [i["corpus"] for i in row["instances"]],
        "instances": base64.b64encode(
            pickle.dumps(row["instances"], protocol=4)
        ).decode("ascii"),
        "size": row["size"],
    }
    for side in ("arg1", "arg2"):
        ent = row[f"{side}_entity"]
        if ent is not None:
            doc[f"{side}_entity_id"] = ent["fbid"]
            doc[f"{side}_entity_name"] = ent["name"]
            doc[f"{side}_entity_inlink_ratio"] = ent["inlink_ratio"]
            doc[f"{side}_entity_score"] = ent["score"]
        types = list(row[f"{side}_types"] or [])
        doc[f"{side}_fulltypes"] = types
        doc[f"{side}_types"] = [_typ(t) for t in types]
    return doc


def solr_docs_batch(batch: pa.Table) -> pa.Table:
    """GROUPS rows -> one JSON-string doc per row (vectorizable sink
    shape: downstream is write_json / an HTTP poster actor)."""
    docs = [json.dumps(solr_doc(r), sort_keys=True)
            for r in batch.to_pylist()]
    return pa.table({"doc": pa.array(docs, pa.string())})


def export_solr_jsonl(groups_ds, out_dir: str, batch_size: int = 1000):
    """Write the Solr documents as partitioned JSONL under ``out_dir``.

    ``batch_size=1000`` mirrors the reference's post batching
    (``SolrLoader.scala`` groupedIterator(1000)); each output file is
    one replayable update batch."""
    import os

    docs = groups_ds.map_batches(
        solr_docs_batch, batch_format="pyarrow", batch_size=batch_size
    )
    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        blob = "\n".join(batch["doc"].to_pylist())
        name = hashlib.md5(blob.encode()).hexdigest()[:16]
        path = os.path.join(out_dir, f"batch-{name}.jsonl")
        with open(path, "w", encoding="utf-8") as f:
            f.write(blob + "\n")
        return pa.table({"path": pa.array([path], pa.string()),
                         "n_docs": pa.array([batch.num_rows], pa.int64())})

    return docs.map_batches(
        write_block, batch_format="pyarrow", batch_size=batch_size
    )
