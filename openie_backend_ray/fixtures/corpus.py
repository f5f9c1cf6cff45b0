"""Deterministic synthetic interleaved-document corpus (FIXTURES.md §1).

Builds the pipeline input table ``documents(doc_id: string,
spans: list<struct<kind, text, media_ref, offset>>)`` from the reference's
golden fixture sentences: text spans carry golden sentences (so the
conformance P/R gate can compare pipeline output against
``test-groups.txt``-derived triples), interleaved with synthetic media
spans that must pass through the pipeline untouched (per-row
span-sequence invariant). Seeded and replicable for throughput runs.
"""

from __future__ import annotations

import hashlib
import os
import random

import pyarrow as pa
import pyarrow.parquet as pq

from openie_backend_ray import schema as S
from openie_backend_ray.fixtures import reverb_tsv
from openie_backend_ray.fixtures.conformance import clean_groups

_MEDIA_KINDS = ("image", "audio", "video")


def golden_sentences() -> list[tuple[str, str]]:
    """(sentence_text, source_url) for every distinct clean golden
    sentence (group instances first, then the extraction fixture)."""
    seen = {}
    for g in clean_groups():
        for inst in g.instances:
            seen.setdefault(inst.sentence, inst.source_url)
    for e in reverb_tsv.read_extractions():
        seen.setdefault(e.sentence, e.source_url)
    return sorted(seen.items())


def build_documents(
    sentences: list[tuple[str, str]] | None = None,
    replication: int = 1,
    seed: int = 42,
    spans_per_doc: tuple[int, int] = (2, 6),
) -> pa.Table:
    """Interleave sentences (replicated ``replication`` times) with media
    spans into documents. Deterministic for a given (sentences, seed)."""
    if sentences is None:
        sentences = golden_sentences()
    rng = random.Random(seed)
    rows_doc_id = []
    rows_spans = []
    queue: list[tuple[str, str]] = []
    for rep in range(replication):
        # permute per replica so replicated docs differ in layout
        order = list(range(len(sentences)))
        rng.shuffle(order)
        queue.extend(sentences[i] for i in order)
    di = 0
    qi = 0
    while qi < len(queue):
        n_text = rng.randint(*spans_per_doc)
        spans = []
        offset = 0
        while n_text > 0 and qi < len(queue):
            if rng.random() < 0.3:  # interleave a media span
                kind = rng.choice(_MEDIA_KINDS)
                ref = hashlib.sha1(
                    f"{seed}:{di}:{offset}".encode()
                ).hexdigest()[:16]
                spans.append(
                    {
                        "kind": kind,
                        "text": "",
                        "media_ref": f"media://{kind}/{ref}",
                        "offset": offset,
                    }
                )
                offset += 1
            text, _url = queue[qi]
            spans.append(
                {"kind": "text", "text": text, "media_ref": "", "offset": offset}
            )
            offset += 1
            qi += 1
            n_text -= 1
        rows_doc_id.append(f"doc{di:08d}")
        rows_spans.append(spans)
        di += 1
    return pa.table(
        {
            "doc_id": pa.array(rows_doc_id, pa.string()),
            "spans": pa.array(rows_spans, pa.list_(S.SPAN)),
        }
    )


def write_documents(out_dir: str, replication: int = 1, seed: int = 42) -> str:
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "documents.parquet")
    pq.write_table(build_documents(replication=replication, seed=seed), path)
    return path


def build_chunker_lexicon() -> pa.Table:
    """sentence text -> golden (tokens, postags, chunks) layers.

    Plays the role of the reference's OpenNLP chunker model
    (``hadoop/.../ScoobiSentenceChunker.scala:19``) for the fixture
    vocabulary: the model binary is not available in this environment,
    so the ChunkerActor resolves known sentences from this lexicon and
    falls back to a deterministic heuristic tagger for everything else.
    """
    seen: dict[str, tuple[list[str], list[str], list[str]]] = {}
    for g in reverb_tsv.read_groups():
        for inst in g.instances:
            seen.setdefault(inst.sentence, (inst.tokens, inst.postags, inst.chunks))
    for e in reverb_tsv.read_extractions():
        seen.setdefault(e.sentence, (e.tokens, e.postags, e.chunks))
    texts = sorted(seen)
    return pa.table(
        {
            "sentence": pa.array(texts, pa.string()),
            "tokens": pa.array([seen[t][0] for t in texts], pa.list_(pa.string())),
            "postags": pa.array([seen[t][1] for t in texts], pa.list_(pa.string())),
            "chunks": pa.array([seen[t][2] for t in texts], pa.list_(pa.string())),
        }
    )


def write_chunker_lexicon(out_dir: str) -> str:
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "chunker_lexicon.parquet")
    pq.write_table(build_chunker_lexicon(), path)
    return path


def build_groups_table() -> pa.Table:
    """Clean golden groups as an Arrow GROUPS table (no pipeline run) —
    the direct input for post-group operator tests/queries (typer,
    extreme filter, regroup, projections)."""
    from openie_backend_ray.fixtures.conformance import clean_groups

    rows = []
    for g in clean_groups():
        insts = [
            {
                "tokens": e.tokens,
                "postags": e.postags,
                "chunks": e.chunks,
                "arg1": {"start": e.arg1[0], "end": e.arg1[1]},
                "rel": {"start": e.rel[0], "end": e.rel[1]},
                "arg2": {"start": e.arg2[0], "end": e.arg2[1]},
                "source_url": e.source_url,
                "corpus": e.corpus or "cw",
                "confidence": e.confidence if e.confidence >= 0 else 0.9,
            }
            for e in g.instances
        ]
        def ent(t):
            if t is None:
                return None
            return {"name": t[0], "fbid": t[1], "score": t[2],
                    "inlink_ratio": t[3]}
        rows.append(
            {
                "arg1_norm": g.arg1_norm,
                "rel_norm": g.rel_norm,
                "arg2_norm": g.arg2_norm,
                "arg1_entity": ent(g.arg1_entity),
                "arg2_entity": ent(g.arg2_entity),
                "arg1_types": list(g.arg1_types),
                "arg2_types": list(g.arg2_types),
                "instances": insts,
                "size": len(insts),
                "corpora": sorted({i["corpus"] for i in insts}),
            }
        )
    return pa.Table.from_pydict(
        {k: [r[k] for r in rows] for k in rows[0]}, schema=S.GROUPS
    )


def documents_dataset(n_blocks: int = 8, replication: int = 1,
                      seed: int = 42):
    """Fixture corpus as a MULTI-BLOCK Dataset without a repartition
    shuffle: ``from_arrow`` with pre-sliced tables. (A
    ``from_arrow(tbl).repartition(n)`` runs an AllToAll concurrently
    with the pipeline's fixed actor pools and can starve on small
    clusters; slicing up front needs no cluster resources at all.)"""
    import ray.data

    tbl = build_documents(replication=replication, seed=seed)
    per = max(1, (tbl.num_rows + n_blocks - 1) // n_blocks)
    slices = [
        tbl.slice(i * per, per)
        for i in range(n_blocks)
        if tbl.slice(i * per, per).num_rows
    ]
    return ray.data.from_arrow(slices)
