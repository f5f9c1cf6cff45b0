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
