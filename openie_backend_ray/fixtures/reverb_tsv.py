"""Readers for the reference's tab-delimited golden fixture formats.

These exist purely for conformance testing — production data never uses
TSV (SURVEY.md §1.2, M17). Formats implemented from the reference specs:

- ReVerbExtraction TSV, 7 cols: arg1 range, rel range, arg2 range,
  tokens, postags, chunktags, source url
  (``models/.../ReVerbExtraction.scala:137-147``); interval grammar
  ``[a, b)`` (half-open), ``[a, b]`` (closed) and ``{n}`` (singleton)
  (``:180-197``).
- ExtractionGroup ("REG") TSV, 7 fixed cols + repeated 9-col instance
  blocks (``models/.../ReVerbExtractionGroup.scala:17-25``); entity cell
  ``name,fbid,score,inlinkRatio`` with ``|/|`` comma-escape, ``X`` absent
  (``:61-85``); type cell comma-joined ``/domain/typ`` or ``X`` (``:87-99``).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

_NUM = re.compile(r"[0-9]+")

REVERB_FIXTURE = (
    "/root/reference/models/src/main/resources/edu/knowitall/openie/models/"
    "TestReVerbExtractions.txt"
)
GROUPS_FIXTURE = (
    "/root/reference/models/src/main/resources/edu/knowitall/openie/models/"
    "test-groups.txt"
)


def parse_interval(s: str) -> tuple[int, int]:
    """``[a, b)`` / ``[a, b]`` / ``{n}`` → half-open (start, end)."""
    nums = _NUM.findall(s)
    if len(nums) == 2:
        start, end = int(nums[0]), int(nums[1])
        if not s.endswith(")"):  # closed interval → half-open
            end += 1
        return (start, end)
    if len(nums) == 1:
        n = int(nums[0])
        return (n, n + 1)
    raise ValueError(f"unparseable interval: {s!r}")


@dataclass
class Extraction:
    tokens: list[str]
    postags: list[str]
    chunks: list[str]
    arg1: tuple[int, int]
    rel: tuple[int, int]
    arg2: tuple[int, int]
    source_url: str
    corpus: str = ""
    confidence: float = -1.0

    @property
    def sentence(self) -> str:
        return " ".join(self.tokens)

    def part_tokens(self, iv: tuple[int, int]) -> list[str]:
        return self.tokens[iv[0] : iv[1]]


@dataclass
class Group:
    arg1_norm: str
    rel_norm: str
    arg2_norm: str
    arg1_entity: tuple[str, str, float, float] | None  # (name, fbid, score, inlink_ratio)
    arg2_entity: tuple[str, str, float, float] | None
    arg1_types: list[str]
    arg2_types: list[str]
    instances: list[Extraction] = field(default_factory=list)


def parse_extraction_cols(cols: list[str]) -> Extraction:
    if len(cols) != 7:
        raise ValueError(f"expected 7 cols, got {len(cols)}")
    tokens = cols[3].split(" ")
    postags = cols[4].split(" ")
    chunks = cols[5].split(" ")
    if not (len(tokens) == len(postags) == len(chunks)):
        raise ValueError("layer length mismatch")
    return Extraction(
        tokens=tokens,
        postags=postags,
        chunks=chunks,
        arg1=parse_interval(cols[0]),
        rel=parse_interval(cols[1]),
        arg2=parse_interval(cols[2]),
        source_url=cols[6],
    )


def read_extractions(path: str = REVERB_FIXTURE) -> list[Extraction]:
    out = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            out.append(parse_extraction_cols(line.split("\t")))
    return out


def _parse_entity(cell: str) -> tuple[str, str, float, float] | None:
    if cell == "X":
        return None
    parts = cell.split(",")
    if len(parts) < 4:
        return None
    name = parts[0].replace("|/|", ",")
    return (name, parts[1], float(parts[2]), float(parts[3]))


def _parse_types(cell: str) -> list[str]:
    if cell == "X":
        return []
    return [t for t in cell.split(",") if t and t != "Topic"]


def parse_group_line(line: str) -> Group:
    cols = line.split("\t")
    if len(cols) < 7 + 9:
        raise ValueError(f"short group line: {len(cols)} cols")
    g = Group(
        arg1_norm=cols[0],
        rel_norm=cols[1],
        arg2_norm=cols[2],
        arg1_entity=_parse_entity(cols[3]),
        arg2_entity=_parse_entity(cols[4]),
        arg1_types=_parse_types(cols[5]),
        arg2_types=_parse_types(cols[6]),
    )
    rest = cols[7:]
    while len(rest) >= 9:
        block, rest = rest[:9], rest[9:]
        ext = parse_extraction_cols(block[:7])
        ext.corpus = block[7]
        ext.confidence = float(block[8])
        g.instances.append(ext)
    return g


def read_groups(path: str = GROUPS_FIXTURE) -> list[Group]:
    out = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            out.append(parse_group_line(line))
    return out


# ---------------------------------------------------------------------------
# writers (round-trip conformance: reference serializes the same shapes,
# ``ReVerbExtraction.scala:137-147`` / ``ReVerbExtractionGroup.scala:17-99``)
# ---------------------------------------------------------------------------

def format_interval(iv: tuple[int, int]) -> str:
    """Half-open ``[a, b)``; singletons print ``{n}`` (nlptools
    ``Interval.toString``)."""
    if iv[1] == iv[0] + 1:
        return "{%d}" % iv[0]
    return "[%d, %d)" % (iv[0], iv[1])


def format_extraction_cols(e: Extraction) -> list[str]:
    return [
        format_interval(e.arg1),
        format_interval(e.rel),
        format_interval(e.arg2),
        " ".join(e.tokens),
        " ".join(e.postags),
        " ".join(e.chunks),
        e.source_url,
    ]


def write_extraction(e: Extraction) -> str:
    return "\t".join(format_extraction_cols(e))


def _format_entity(ent: tuple[str, str, float, float] | None) -> str:
    if ent is None:
        return "X"
    name = ent[0].replace(",", "|/|")
    return "%s,%s,%.4g,%.4g" % (name, ent[1], ent[2], ent[3])


def _format_types(types: list[str]) -> str:
    return ",".join(types) if types else "X"


def write_group(g: Group) -> str:
    cols = [
        g.arg1_norm, g.rel_norm, g.arg2_norm,
        _format_entity(g.arg1_entity), _format_entity(g.arg2_entity),
        _format_types(g.arg1_types), _format_types(g.arg2_types),
    ]
    for inst in g.instances:
        cols.extend(format_extraction_cols(inst))
        cols.append(inst.corpus)
        cols.append(repr(inst.confidence))
    return "\t".join(cols)
