"""OpenIE4 path (M3/M4): frame triplize, relnoun pattern, actor
plumbing, and the kind splitter."""

from __future__ import annotations

import pyarrow as pa
import pytest

from openie_backend_ray.stages.openie4 import (
    Frame,
    OpenIE4Actor,
    RuleRelnoun,
    SrlBackend,
    extract_openie4,
    split_kinds,
)

TOKS = ["Ada", ",", "the", "mother", "of", "programming", ",",
        "wrote", "programs", "."]
TAGS = ["NNP", ",", "DT", "NN", "IN", "NN", ",", "VBD", "NNS", "."]


def _chunked_batch():
    return pa.table(
        {
            "doc_id": pa.array(["d1"], pa.string()),
            "span_idx": pa.array([0], pa.int32()),
            "tokens": pa.array([TOKS], pa.list_(pa.string())),
            "postags": pa.array([TAGS], pa.list_(pa.string())),
            "chunks": pa.array([["O"] * len(TOKS)], pa.list_(pa.string())),
        }
    )


def test_frame_triplize():
    f = Frame((0, 1), (1, 2), [(2, 3), (4, 5)], 0.7)
    triples = f.triplize()
    assert len(triples) == 2
    assert all(len(t.arg2s) == 1 for t in triples)
    assert triples[0].arg2s == [(2, 3)]
    assert triples[1].arg2s == [(4, 5)]


def test_relnoun_pattern():
    frames = RuleRelnoun().extract(TOKS, TAGS)
    assert len(frames) == 1
    f = frames[0]
    assert TOKS[f.arg1[0]: f.arg1[1]] == ["Ada"]
    assert TOKS[f.rel[0]: f.rel[1]] == ["the", "mother", "of"]
    assert TOKS[f.arg2s[0][0]: f.arg2s[0][1]] == ["programming"]
    assert f.confidence == 0.8


def test_actor_emits_t_and_n():
    out = OpenIE4Actor(corpus="cw")(_chunked_batch())
    kinds = out["kind"].to_pylist()
    # relnoun frame emitted once as T and mirrored once as N
    assert kinds.count("T") == 1 and kinds.count("N") == 1
    t = out.filter(pa.compute.equal(out["kind"], "T"))
    assert t["arg2_texts"][0].as_py() == ["programming"]
    assert t["corpus"][0].as_py() == "cw"


def test_srl_backend_stubbed():
    with pytest.raises(NotImplementedError):
        SrlBackend()


def test_split_kinds(ray_session):
    import ray.data as rd

    ds = extract_openie4(rd.from_arrow(_chunked_batch()), corpus="cw")
    triples = split_kinds(ds, "T").to_pandas()
    nary = split_kinds(ds, "N").to_pandas()
    assert len(triples) == 1 and len(nary) == 1
    assert "kind" not in triples.columns
    assert list(nary.iloc[0]["arg2_texts"]) == ["programming"]
