"""Fixture SQL views: drift guard between the nested GROUPS fixture and
the exploded parquet views the DuckDB oracles read."""

from __future__ import annotations

import pyarrow.parquet as pq


def test_views_match_fixture():
    from openie_backend_ray.fixtures.corpus import build_groups_table
    from openie_backend_ray.fixtures.views import build_views

    g = build_groups_table()
    v = build_views()
    assert v["groups"].num_rows == g.num_rows
    n_inst = sum(len(x) for x in g["instances"].to_pylist())
    assert v["instances"].num_rows == n_inst
    n_tok = sum(
        len(i["tokens"])
        for insts in g["instances"].to_pylist()
        for i in insts
    )
    assert v["tokens"].num_rows == n_tok
    # spans are consistent flags: every instance has exactly its span
    # widths marked
    t = v["tokens"]
    a1 = sum(1 for x in t["in_arg1"].to_pylist() if x)
    inst = v["instances"]
    a1_expected = sum(
        e - s for s, e in zip(inst["a1s"].to_pylist(),
                              inst["a1e"].to_pylist())
    )
    assert a1 == a1_expected


def test_ensure_views_idempotent(tmp_path, monkeypatch):
    import openie_backend_ray.fixtures.views as V

    monkeypatch.setenv("GRAFT_FIXTURE_VIEWS", str(tmp_path))
    monkeypatch.setattr(V, "_ensured", None)
    d1 = V.ensure_views()
    t1 = pq.read_table(f"{d1}/groups.parquet")
    # second call: no rewrite, same contents
    monkeypatch.setattr(V, "_ensured", None)
    d2 = V.ensure_views()
    assert d1 == d2
    t2 = pq.read_table(f"{d2}/groups.parquet")
    assert t1.equals(t2)
