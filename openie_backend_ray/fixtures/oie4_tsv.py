"""Interop codecs for the reference's OpenIE4 dump formats (M17):

- ``TripleExtraction`` TSV, 12 cols (``models/.../TripleExtraction.scala:139-154``):
  confidence, corpus, arg1/rel/arg2 text, arg1/rel/arg2 interval,
  sentence tokens / postags / chunktags (space-joined), source url.
- ``NaryExtraction`` TSV, 12 cols (``models/.../NaryExtraction.scala:116-131``):
  same layout, but arg2 texts join with "; " (";" inside a text is
  escaped to ",") and arg2 intervals join with "; ".
- ``ExtractionSentenceRecord``, 25 fixed cols + an opaque tab-joined
  dataString tail (``hadoop/.../util/ExtractionSentenceRecord.scala:15-71``)
  whose segments 2/3 are the sentence postag / chunktag layers.

Interval grammar is shared with the ReVerb fixture reader
(``reverb_tsv.parse_interval``): ``{}`` empty, ``{n}`` singleton,
``[a, b)`` half-open, ``[a, b]`` closed.  Serialization emits ``{n}``
for singletons and ``[a, b)`` otherwise, matching the reference's
``Interval.toString``.

These codecs let the engine ingest reference OpenIE4 dumps and write
dumps its tools accept; production data is Parquet.
"""

from __future__ import annotations

from dataclasses import dataclass

from openie_backend_ray.fixtures.reverb_tsv import parse_interval


def serialize_interval(iv: tuple[int, int]) -> str:
    start, end = iv
    if end <= start:
        return "{}"
    if end == start + 1:
        return "{%d}" % start
    return "[%d, %d)" % (start, end)


@dataclass
class TripleRow:
    confidence: float
    corpus: str
    arg1_text: str
    rel_text: str
    arg2_text: str
    arg1: tuple[int, int]
    rel: tuple[int, int]
    arg2: tuple[int, int]
    tokens: list[str]
    postags: list[str]
    chunks: list[str]
    source_url: str


def triple_to_line(t: TripleRow) -> str:
    return "\t".join(
        [
            str(t.confidence), t.corpus, t.arg1_text, t.rel_text,
            t.arg2_text,
            serialize_interval(t.arg1), serialize_interval(t.rel),
            serialize_interval(t.arg2),
            " ".join(t.tokens), " ".join(t.postags), " ".join(t.chunks),
            t.source_url,
        ]
    )


def triple_from_line(line: str) -> TripleRow:
    c = line.rstrip("\n").split("\t")
    if len(c) != 12:
        raise ValueError(f"TripleExtraction needs 12 cols, got {len(c)}")
    return TripleRow(
        confidence=float(c[0]), corpus=c[1],
        arg1_text=c[2], rel_text=c[3], arg2_text=c[4],
        arg1=parse_interval(c[5]), rel=parse_interval(c[6]),
        arg2=parse_interval(c[7]),
        tokens=c[8].split(" "), postags=c[9].split(" "),
        chunks=c[10].split(" "), source_url=c[11],
    )


@dataclass
class NaryRow:
    confidence: float
    corpus: str
    arg1_text: str
    rel_text: str
    arg2_texts: list[str]
    arg1: tuple[int, int]
    rel: tuple[int, int]
    arg2s: list[tuple[int, int]]
    tokens: list[str]
    postags: list[str]
    chunks: list[str]
    source_url: str


def nary_to_line(n: NaryRow) -> str:
    # ";" inside an arg2 text becomes "," (NaryExtraction.scala:120)
    texts = "; ".join(t.replace(";", ",") for t in n.arg2_texts)
    ivs = "; ".join(serialize_interval(i) for i in n.arg2s)
    return "\t".join(
        [
            str(n.confidence), n.corpus, n.arg1_text, n.rel_text, texts,
            serialize_interval(n.arg1), serialize_interval(n.rel), ivs,
            " ".join(n.tokens), " ".join(n.postags), " ".join(n.chunks),
            n.source_url,
        ]
    )


def nary_from_line(line: str) -> NaryRow:
    c = line.rstrip("\n").split("\t")
    if len(c) != 12:
        raise ValueError(f"NaryExtraction needs 12 cols, got {len(c)}")
    return NaryRow(
        confidence=float(c[0]), corpus=c[1],
        arg1_text=c[2], rel_text=c[3],
        arg2_texts=c[4].split("; ") if c[4] else [],
        arg1=parse_interval(c[5]), rel=parse_interval(c[6]),
        arg2s=[parse_interval(x) for x in c[7].split("; ")] if c[7] else [],
        tokens=c[8].split(" "), postags=c[9].split(" "),
        chunks=c[10].split(" "), source_url=c[11],
    )


# ---------------------------------------------------------------------------
# ExtractionSentenceRecord (26 logical cols; tail is an opaque
# tab-joined dataString whose segments 2/3 are postags / chunktags)
# ---------------------------------------------------------------------------

_ESR_FIXED = 25


@dataclass
class ExtractionSentenceRecord:
    docname: str
    extractor_type: str
    sentenceid: int
    eid: int
    url: str
    hashes: str
    confidence: float
    arg1: str
    rel: str
    arg2: str
    norm1_arg1: str
    norm1_rel: str
    norm1_arg2: str
    norm2_arg1: str
    norm2_rel: str
    norm2_arg2: str
    norm1_arg1_postags: str
    norm1_rel_postags: str
    norm1_arg2_postags: str
    norm2_arg1_postags: str
    norm2_rel_postags: str
    norm2_arg2_postags: str
    arg1_tag: str
    rel_tag: str
    arg2_tag: str
    data_string: str

    @property
    def postags(self) -> list[str]:
        """dataString segment 2 (POSTAGS_IDX = 2, :42-47)."""
        return self.data_string.split("\t")[2].strip().split(" ")

    @property
    def chunktags(self) -> list[str]:
        """dataString segment 3 (CHUNKTAGS_IDX = 3)."""
        return self.data_string.split("\t")[3].strip().split(" ")

    @property
    def norm1_string(self) -> str:
        return "\t".join((self.norm1_arg1, self.norm1_rel, self.norm1_arg2))

    @property
    def norm2_string(self) -> str:
        return "\t".join((self.norm2_arg1, self.norm2_rel, self.norm2_arg2))


def esr_from_line(line: str) -> ExtractionSentenceRecord:
    c = line.rstrip("\n").split("\t")
    if len(c) < _ESR_FIXED + 1:
        raise ValueError(
            f"ExtractionSentenceRecord needs >= {_ESR_FIXED + 1} cols, "
            f"got {len(c)}"
        )
    return ExtractionSentenceRecord(
        docname=c[0], extractor_type=c[1], sentenceid=int(c[2]),
        eid=int(c[3]), url=c[4], hashes=c[5], confidence=float(c[6]),
        arg1=c[7], rel=c[8], arg2=c[9],
        norm1_arg1=c[10], norm1_rel=c[11], norm1_arg2=c[12],
        norm2_arg1=c[13], norm2_rel=c[14], norm2_arg2=c[15],
        norm1_arg1_postags=c[16], norm1_rel_postags=c[17],
        norm1_arg2_postags=c[18], norm2_arg1_postags=c[19],
        norm2_rel_postags=c[20], norm2_arg2_postags=c[21],
        arg1_tag=c[22], rel_tag=c[23], arg2_tag=c[24],
        data_string="\t".join(c[_ESR_FIXED:]),
    )


def esr_to_line(r: ExtractionSentenceRecord) -> str:
    return "\t".join(
        [
            r.docname, r.extractor_type, str(r.sentenceid), str(r.eid),
            r.url, r.hashes, str(r.confidence), r.arg1, r.rel, r.arg2,
            r.norm1_arg1, r.norm1_rel, r.norm1_arg2,
            r.norm2_arg1, r.norm2_rel, r.norm2_arg2,
            r.norm1_arg1_postags, r.norm1_rel_postags,
            r.norm1_arg2_postags, r.norm2_arg1_postags,
            r.norm2_rel_postags, r.norm2_arg2_postags,
            r.arg1_tag, r.rel_tag, r.arg2_tag, r.data_string,
        ]
    )


# ---------------------------------------------------------------------------
# OIE4 Arrow rows <-> T/N dump lines ("T\t..." / "N\t..." prefixed,
# ScoobiOpenIE4.scala:140-143; the splitter strips the prefix)
# ---------------------------------------------------------------------------

def oie4_row_to_line(row: dict) -> str:
    """One OIE4 Arrow row (see ``stages.openie4.OIE4``) -> its prefixed
    dump line."""
    if row["kind"] == "T":
        a2 = row["arg2s"][0]
        return "T\t" + triple_to_line(
            TripleRow(
                row["confidence"], row["corpus"], row["arg1_text"],
                row["rel_text"], row["arg2_texts"][0],
                (row["arg1"]["start"], row["arg1"]["end"]),
                (row["rel"]["start"], row["rel"]["end"]),
                (a2["start"], a2["end"]),
                row["tokens"], row["postags"], row["chunks"],
                row["source_url"],
            )
        )
    return "N\t" + nary_to_line(
        NaryRow(
            row["confidence"], row["corpus"], row["arg1_text"],
            row["rel_text"], list(row["arg2_texts"]),
            (row["arg1"]["start"], row["arg1"]["end"]),
            (row["rel"]["start"], row["rel"]["end"]),
            [(a["start"], a["end"]) for a in row["arg2s"]],
            row["tokens"], row["postags"], row["chunks"],
            row["source_url"],
        )
    )
