"""Query-path budgets + result algebra (ExtractionGroupFetcher port):
ResultSet combine precedence (mirrors ResultSetTest.scala:16-23),
size-tiered budgeted fetch, and the J5 fetch-time entity stoplist."""

from __future__ import annotations

import pyarrow as pa
import pytest

from openie_backend_ray.pipelines.query import (
    ResultSet,
    entity_stoplist,
    fetch_groups,
    strip_stoplisted_entities,
)


def test_resultset_combine_precedence():
    s = ResultSet("success")
    li = ResultSet("limited")
    t = ResultSet("timeout")
    assert s.combine_with(li).status == "limited"
    assert li.combine_with(s).status == "limited"
    assert s.combine_with(t).status == "timeout"
    assert li.combine_with(t).status == "timeout"
    assert t.combine_with(s).status == "timeout"
    assert s.combine_with(s).status == "success"


def test_resultset_combine_concat_and_totals():
    a = ResultSet("success", [{"size": 2}], 0)
    b = ResultSet("limited", [{"size": 5}], 9)
    c = a.combine_with(b)
    assert c.status == "limited"
    assert c.num_groups == 2 and c.num_instances == 7
    # Success contributes its read count to the degraded total
    assert c.total_groups == 10


def _group_row(a1, rel, a2, size, fbid=None):
    inst = {
        "tokens": [a1, rel, a2, "."],
        "postags": ["NNP", "VBD", "NNP", "."],
        "chunks": ["B-NP", "B-VP", "B-NP", "O"],
        "arg1": {"start": 0, "end": 1},
        "rel": {"start": 1, "end": 2},
        "arg2": {"start": 2, "end": 3},
        "source_url": "u", "corpus": "cw", "confidence": 0.9,
    }
    ent = None
    if fbid is not None:
        ent = {"name": a1, "fbid": fbid, "score": 1.0, "inlink_ratio": 10.0}
    return {
        "arg1_norm": a1, "rel_norm": rel, "arg2_norm": a2,
        "arg1_entity": ent, "arg2_entity": None,
        "arg1_types": ["/people/person"] if ent else [],
        "arg2_types": [],
        "instances": [inst] * size, "size": size, "corpora": ["cw"],
    }


@pytest.fixture(scope="module")
def triples_dir(ray_session, tmp_path_factory):
    import ray.data as rd

    from openie_backend_ray import schema as S
    from openie_backend_ray.pipelines.flagship import materialize_triples

    stoplisted = sorted(entity_stoplist())[0]
    rows = [
        _group_row("alpha", "visit", "paris", 60),
        _group_row("beta", "visit", "rome", 30),
        _group_row("gamma", "visit", "oslo", 10),
        _group_row("delta", "visit", "bonn", 2),
        _group_row("epsilon", "visit", "kiev", 2, fbid=stoplisted),
    ]
    tbl = pa.Table.from_pydict(
        {k: [r[k] for r in rows] for k in rows[0]}, schema=S.GROUPS
    )
    out = str(tmp_path_factory.mktemp("q") / "triples")
    materialize_triples(rd.from_arrow(tbl), out)
    return out


def test_fetch_success_largest_tier_first(triples_dir):
    rs = fetch_groups(triples_dir, rel="visit")
    assert rs.status == "success"
    sizes = [r["size"] for r in rs.results]
    # tiers are queried largest-first: [50,inf) then [25,50) ...
    assert sizes == sorted(sizes, reverse=True)
    assert rs.num_groups == 5


def test_fetch_instance_budget_limited(triples_dir):
    # budget admits the size-60 group, not the size-30 one
    rs = fetch_groups(triples_dir, rel="visit", max_instances=80)
    assert rs.status == "limited"
    sizes = [r["size"] for r in rs.results]
    assert 60 in sizes and 30 not in sizes


def test_fetch_timeout_precedence(triples_dir):
    rs = fetch_groups(triples_dir, rel="visit", timeout_millis=0.0)
    assert rs.status == "timeout"
    assert rs.num_groups == 0


def test_fetch_time_stoplist_strip(triples_dir):
    rs = fetch_groups(triples_dir, rel="visit")
    by_arg = {r["arg1_norm"]: r for r in rs.results}
    # the group is kept but its stoplisted entity (and types) stripped
    assert "epsilon" in by_arg
    assert by_arg["epsilon"]["arg1_entity"] is None
    assert list(by_arg["epsilon"]["arg1_types"]) == []
    rs2 = fetch_groups(triples_dir, rel="visit", stoplist=False)
    by_arg2 = {r["arg1_norm"]: r for r in rs2.results}
    assert by_arg2["epsilon"]["arg1_entity"] is not None


def test_strip_batch_is_noop_for_clean_entities():
    from openie_backend_ray import schema as S

    rows = [_group_row("zeta", "visit", "lima", 1, fbid="zz_not_listed")]
    tbl = pa.Table.from_pydict(
        {k: [r[k] for r in rows] for k in rows[0]}, schema=S.GROUPS
    )
    out = strip_stoplisted_entities(tbl, entity_stoplist())
    assert out["arg1_entity"][0].is_valid


def test_solr_export_docs(triples_dir, tmp_path, ray_session):
    """S6: GROUPS rows -> SolrJsonLoader-shaped JSONL docs, batch files
    replayable against /update/json."""
    import json

    import ray.data as rd

    from openie_backend_ray.sources.solr_export import (
        export_solr_jsonl,
        solr_doc,
    )

    ds = rd.read_parquet(triples_dir)
    out_dir = str(tmp_path / "solr")
    res = export_solr_jsonl(ds, out_dir).take_all()
    assert sum(r["n_docs"] for r in res) == 5
    docs = []
    for r in res:
        with open(r["path"], encoding="utf-8") as f:
            docs += [json.loads(line) for line in f if line.strip()]
    by_arg1 = {d["arg1"]: d for d in docs}
    a = by_arg1["alpha"]
    assert a["rel"] == "visit" and a["size"] == 60
    assert a["corpora"] == ["cw"] * 60
    # entity fields flattened only when linked; types split full/typ
    eps = by_arg1["epsilon"]
    assert "arg1_entity_id" in eps
    assert eps["arg1_fulltypes"] == ["/people/person"]
    assert eps["arg1_types"] == ["person"]
    assert "arg1_entity_id" not in by_arg1["beta"]
    # provenance blob round-trips
    import base64
    import pickle

    insts = pickle.loads(base64.b64decode(a["instances"]))
    assert len(insts) == 60 and insts[0]["corpus"] == "cw"
    # ids: deterministic md5 of the triple key (stable across exports)
    import hashlib

    assert a["id"] == hashlib.md5(b"alpha__visit__paris").hexdigest()
    # a second export of the same row produces the identical doc
    row = next(r for r in ds.take_all() if r["arg1_norm"] == "alpha")
    assert solr_doc(row)["id"] == a["id"]


def test_query_normalization_uses_tagger():
    """A7: query terms are POS-tagged (heuristic tagger) before
    stemming, so verbs/plurals normalize like indexed terms."""
    from openie_backend_ray.pipelines.query import normalize_query_part

    assert normalize_query_part("visited cities") == "visit city"
    assert normalize_query_part("the presidents") == "president"
    # explicit tags still win
    assert normalize_query_part("visited", ["NNP"]) == "visited"
