"""Round-trip tests for the OpenIE4 dump codecs (Triple/Nary 12-col
TSV, ExtractionSentenceRecord 26-col) and the OIE4-row bridge."""

from __future__ import annotations

import pytest

from openie_backend_ray.fixtures.oie4_tsv import (
    ExtractionSentenceRecord,
    NaryRow,
    TripleRow,
    esr_from_line,
    esr_to_line,
    nary_from_line,
    nary_to_line,
    oie4_row_to_line,
    serialize_interval,
    triple_from_line,
    triple_to_line,
)
from openie_backend_ray.fixtures.reverb_tsv import parse_interval

TOKS = ["Ada", ",", "the", "mother", "of", "programming", ",", "wrote",
        "programs", "."]
TAGS = ["NNP", ",", "DT", "NN", "IN", "NN", ",", "VBD", "NNS", "."]
CHKS = ["B-NP", "O", "B-NP", "I-NP", "B-PP", "B-NP", "O", "B-VP",
        "B-NP", "O"]


def test_interval_round_trip():
    for iv in [(0, 1), (2, 5), (7, 8)]:
        assert parse_interval(serialize_interval(iv)) == iv
    assert serialize_interval((3, 4)) == "{3}"
    assert serialize_interval((3, 7)) == "[3, 7)"
    # the reference's closed form also parses
    assert parse_interval("[3, 6]") == (3, 7)


def test_triple_round_trip():
    t = TripleRow(0.8, "cw", "Ada", "is mother of", "programming",
                  (0, 1), (3, 4), (5, 6), TOKS, TAGS, CHKS, "http://u")
    line = triple_to_line(t)
    assert len(line.split("\t")) == 12
    assert triple_from_line(line) == t


def test_nary_round_trip_with_semicolon_escape():
    n = NaryRow(0.55, "news", "Bob", "gave", ["Alice", "a book; new"],
                (0, 1), (1, 2), [(2, 3), (3, 5)], TOKS, TAGS, CHKS, "u")
    line = nary_to_line(n)
    assert len(line.split("\t")) == 12
    back = nary_from_line(line)
    # ";" inside an arg2 text is lossily escaped to "," (reference rule)
    assert back.arg2_texts == ["Alice", "a book, new"]
    assert back.arg2s == n.arg2s
    assert back.tokens == n.tokens


def test_nary_from_reference_shape():
    # a line shaped like the reference serializer's output
    line = "\t".join([
        "0.9", "cw", "X", "did", "a; b",
        "{0}", "{1}", "{2}; [3, 5)",
        "X did a b now", "NNP VBD NN NN RB", "B-NP B-VP B-NP I-NP O",
        "http://src",
    ])
    n = nary_from_line(line)
    assert n.arg2s == [(2, 3), (3, 5)]
    assert n.arg2_texts == ["a", "b"]


def test_esr_round_trip():
    data_string = "\t".join([
        "sent text", "Ada wrote programs .", "NNP VBD NNS .",
        "B-NP B-VP B-NP O", "extra", "tail",
    ])
    r = ExtractionSentenceRecord(
        docname="doc1", extractor_type="reverb", sentenceid=3, eid=7,
        url="http://u", hashes="h1,h2", confidence=0.71,
        arg1="Ada", rel="wrote", arg2="programs",
        norm1_arg1="ada", norm1_rel="write", norm1_arg2="program",
        norm2_arg1="ada", norm2_rel="write", norm2_arg2="program",
        norm1_arg1_postags="NNP", norm1_rel_postags="VBD",
        norm1_arg2_postags="NNS", norm2_arg1_postags="NNP",
        norm2_rel_postags="VBD", norm2_arg2_postags="NNS",
        arg1_tag="NP", rel_tag="VP", arg2_tag="NP",
        data_string=data_string,
    )
    line = esr_to_line(r)
    back = esr_from_line(line)
    assert back == r
    # dataString accessors (POSTAGS_IDX=2 / CHUNKTAGS_IDX=3)
    assert back.postags == ["NNP", "VBD", "NNS", "."]
    assert back.chunktags == ["B-NP", "B-VP", "B-NP", "O"]
    assert back.norm1_string == "ada\twrite\tprogram"


def test_esr_rejects_short_lines():
    with pytest.raises(ValueError):
        esr_from_line("a\tb\tc")


def test_oie4_rows_to_dump_lines(ray_session):
    """OIE4 extraction output round-trips through the prefixed dump
    format the reference splitter consumes (T\\t... / N\\t...)."""
    import pyarrow as pa

    from openie_backend_ray.stages.openie4 import OpenIE4Actor

    batch = pa.table(
        {
            "doc_id": pa.array(["d1"], pa.string()),
            "span_idx": pa.array([0], pa.int32()),
            "tokens": pa.array([TOKS], pa.list_(pa.string())),
            "postags": pa.array([TAGS], pa.list_(pa.string())),
            "chunks": pa.array([CHKS], pa.list_(pa.string())),
        }
    )
    out = OpenIE4Actor(corpus="cw")(batch)
    lines = [oie4_row_to_line(r) for r in out.to_pylist()]
    t_lines = [x for x in lines if x.startswith("T\t")]
    n_lines = [x for x in lines if x.startswith("N\t")]
    assert len(t_lines) == 1 and len(n_lines) == 1
    t = triple_from_line(t_lines[0][2:])
    assert t.arg1_text == "Ada" and t.rel_text == "is mother of"
    assert t.arg2_text == "programming"
    n = nary_from_line(n_lines[0][2:])
    assert n.arg2_texts == ["programming"]
