"""OpenIE4 extraction path (SURVEY.md M3/M4): Relnoun + SRL frames ->
Triple/Nary extractions, and the T/N splitter.

Reference (``hadoop/.../ScoobiOpenIE4.scala:60-150``): per sentence,
(a) Relnoun over lemmatized chunked tokens -> TripleExtractions at
conf 0.8; (b) SRL (ClearSrl via dependency graph) -> frames with
``arg2s``; each frame emits one NaryExtraction (arg2s list) and its
``triplize()`` emits TripleExtractions (first arg2 per triplized
frame); Relnoun triples are also mirrored as single-arg2 Narys
(:121-124). Rows carry a ``T``/``N`` prefix; ScoobiOpenIE4Splitter
(:53-58) filters by prefix and strips it — here ``kind`` is a COLUMN
and the splitter is a vectorized filter + projection, not a reparse.

The SRL and Relnoun MODELS are not available in this environment: the
dependency-parse path is stubbed behind ``SrlBackend``
(NotImplementedError), and ``RuleRelnoun`` is a small deterministic
appositive/possessive pattern ("X, the Y of Z" / "X's Y, Z") so the
Ray-side plumbing — frame triplize, schemas, splitter, actor batching —
is real and tested. Swap ``srl_backend``/``relnoun`` in production.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa

RELNOUN_CONF = 0.8  # ScoobiOpenIE4.scala:79

OIE4 = pa.schema(
    [
        ("kind", pa.string()),  # "T" | "N" (column, not line prefix)
        ("doc_id", pa.string()),
        ("span_idx", pa.int32()),
        ("confidence", pa.float64()),
        ("corpus", pa.string()),
        ("tokens", pa.list_(pa.string())),
        ("postags", pa.list_(pa.string())),
        ("arg1_text", pa.string()),
        ("rel_text", pa.string()),
        ("arg2_texts", pa.list_(pa.string())),  # len 1 for kind == "T"
        ("arg1", pa.struct([("start", pa.int32()), ("end", pa.int32())])),
        ("rel", pa.struct([("start", pa.int32()), ("end", pa.int32())])),
        ("arg2s", pa.list_(
            pa.struct([("start", pa.int32()), ("end", pa.int32())])
        )),
        ("source_url", pa.string()),
    ]
)


@dataclass
class Frame:
    """An SRL-style frame: rel + arg1 + 1..k arg2s (token intervals)."""

    arg1: tuple[int, int]
    rel: tuple[int, int]
    arg2s: list[tuple[int, int]] = field(default_factory=list)
    confidence: float = 0.5

    def triplize(self) -> list["Frame"]:
        """Reference ``triplize()``: one triple frame per arg2, keeping
        that arg2 first (``ScoobiOpenIE4.scala:104-107`` takes
        ``arg2s.head`` of each triplized frame)."""
        return [
            Frame(self.arg1, self.rel, [a2], self.confidence)
            for a2 in self.arg2s
        ]


class SrlBackend:
    """Production SRL hook (ClearSrl over a dependency parse)."""

    def __init__(self):
        raise NotImplementedError(
            "SRL model/dependency parser not available in this "
            "environment; provide frames via a custom backend"
        )

    def frames(self, tokens, postags):  # pragma: no cover - interface
        raise NotImplementedError


class RuleRelnoun:
    """Deterministic Relnoun stand-in: appositive 'X , DT? Y of Z'
    noun-relation pattern -> (X, "is the Y of", Z)."""

    def extract(self, tokens: list[str], postags: list[str]) -> list[Frame]:
        out = []
        n = len(tokens)
        for i in range(n - 4):
            if postags[i].startswith("NNP") and tokens[i + 1] == ",":
                j = i + 2
                if j < n and postags[j] == "DT":
                    j += 1
                if j < n and postags[j].startswith("NN") and \
                        j + 1 < n and tokens[j + 1].lower() == "of":
                    k = j + 2
                    end = k
                    while end < n and (postags[end].startswith("NN")
                                       or postags[end] == "DT"):
                        end += 1
                    if end > k:
                        out.append(Frame((i, i + 1), (i + 2, j + 2),
                                         [(k, end)], RELNOUN_CONF))
        return out


class OpenIE4Actor:
    """Actor-pool stage over chunked sentences -> OIE4 rows (models
    loaded once per actor, ``ScoobiOpenIE4.scala:40-42`` lazy vals)."""

    def __init__(self, corpus: str = "corpus", srl_backend=None,
                 relnoun=None):
        self.corpus = corpus
        self.relnoun = relnoun if relnoun is not None else RuleRelnoun()
        self.srl = srl_backend  # None = SRL path off (model absent)

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {name: [] for name in OIE4.names}

        def emit(kind, doc_id, span_idx, toks, tags, frame):
            def txt(iv):
                return " ".join(toks[iv[0]: iv[1]])

            rows["kind"].append(kind)
            rows["doc_id"].append(doc_id)
            rows["span_idx"].append(span_idx)
            rows["confidence"].append(frame.confidence)
            rows["corpus"].append(self.corpus)
            rows["tokens"].append(toks)
            rows["postags"].append(tags)
            rows["arg1_text"].append(txt(frame.arg1))
            rows["rel_text"].append(txt(frame.rel))
            rows["arg2_texts"].append([txt(a) for a in frame.arg2s])
            rows["arg1"].append({"start": frame.arg1[0],
                                 "end": frame.arg1[1]})
            rows["rel"].append({"start": frame.rel[0],
                                "end": frame.rel[1]})
            rows["arg2s"].append(
                [{"start": a[0], "end": a[1]} for a in frame.arg2s]
            )
            rows["source_url"].append("")

        doc_ids = batch["doc_id"].to_pylist()
        span_idxs = batch["span_idx"].to_pylist()
        toks_col = batch["tokens"].to_pylist()
        tags_col = batch["postags"].to_pylist()
        for doc_id, span_idx, toks, tags in zip(
            doc_ids, span_idxs, toks_col, tags_col
        ):
            try:
                relnoun_frames = self.relnoun.extract(toks, tags)
            except Exception:  # per-record drop, ScoobiOpenIE4:84-90
                relnoun_frames = []
            srl_frames = []
            if self.srl is not None:
                try:
                    srl_frames = [
                        f for f in self.srl.frames(toks, tags) if f.arg2s
                    ]
                except Exception:
                    srl_frames = []
            # triples: relnoun + triplized SRL (:104-112)
            for f in relnoun_frames:
                emit("T", doc_id, span_idx, toks, tags, f)
            for f in srl_frames:
                for t in f.triplize()[:1]:
                    emit("T", doc_id, span_idx, toks, tags, t)
            # nary: SRL frames + relnoun mirrored as 1-arg2 nary
            # (:121-124)
            for f in srl_frames:
                emit("N", doc_id, span_idx, toks, tags, f)
            for f in relnoun_frames:
                emit("N", doc_id, span_idx, toks, tags, f)
        return pa.Table.from_pydict(rows, schema=OIE4)


def extract_openie4(chunked_ds, corpus: str = "corpus", concurrency=None):
    from openie_backend_ray.util import actor_cpus, auto_pool

    return chunked_ds.map_batches(
        OpenIE4Actor,
        fn_constructor_kwargs={"corpus": corpus},
        batch_format="pyarrow",
        concurrency=concurrency or auto_pool(0.5),
        num_cpus=actor_cpus(),
    )


def split_kinds(oie4_ds, kind: str):
    """M4 splitter: ``kind`` column filter + prefix-column drop —
    a projection, not a reparse (vs ScoobiOpenIE4Splitter:53-58)."""
    assert kind in ("T", "N")
    filtered = oie4_ds.filter(expr=f"kind == '{kind}'")
    return filtered.drop_columns(["kind"])
