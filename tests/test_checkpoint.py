"""Resumability (north rule): per-shard lineage manifests; a rerun
skips completed shards; a killed/partial run resumes to identical
output."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from openie_backend_ray.state.checkpoint import (
    MANIFEST,
    fingerprint_paths,
    run_shard,
    run_sharded,
    shard_complete,
)


@pytest.fixture()
def inputs(tmp_path):
    paths = {}
    for i in range(4):
        p = tmp_path / f"in{i}.parquet"
        pq.write_table(
            pa.table({"x": pa.array(range(i * 10, i * 10 + 10))}), p
        )
        paths[f"{i:03d}"] = [str(p)]
    return paths


def _compute(calls):
    def compute(paths, tmp_out):
        calls.append(paths)
        t = pq.read_table(paths[0])
        out = pa.table({"x2": pa.compute.multiply(t["x"], 2)})
        pq.write_table(out, os.path.join(tmp_out, "out.parquet"))
        return {"rows_out": out.num_rows}

    return compute


def test_rerun_skips_completed_shards(tmp_path, inputs):
    out_root = str(tmp_path / "out")
    calls: list = []
    m1 = run_sharded(inputs, out_root, _compute(calls))
    assert len(calls) == 4
    assert all(not m["skipped"] for m in m1)

    calls2: list = []
    m2 = run_sharded(inputs, out_root, _compute(calls2))
    assert calls2 == []  # nothing recomputed
    assert all(m["skipped"] for m in m2)
    assert [m["metrics"]["rows_out"] for m in m2] == [10] * 4


def test_input_change_invalidates_shard(tmp_path, inputs):
    out_root = str(tmp_path / "out")
    calls: list = []
    run_sharded(inputs, out_root, _compute(calls))
    # mutate one input -> only that shard recomputes
    target = inputs["002"][0]
    pq.write_table(pa.table({"x": pa.array([99, 100])}), target)
    calls2: list = []
    m2 = run_sharded(inputs, out_root, _compute(calls2))
    assert len(calls2) == 1
    recomputed = [m for m in m2 if not m["skipped"]]
    assert len(recomputed) == 1
    assert recomputed[0]["shard_id"] == "002"
    assert recomputed[0]["metrics"]["rows_out"] == 2


def test_crash_mid_run_resumes(tmp_path, inputs):
    """Simulated kill: compute raises on shard 002; rerun completes only
    the missing shards and the final output equals a clean run's."""
    out_root = str(tmp_path / "out")

    class Boom(RuntimeError):
        pass

    def flaky(paths, tmp_out):
        if "in2" in paths[0]:
            raise Boom("crash")
        t = pq.read_table(paths[0])
        out = pa.table({"x2": pa.compute.multiply(t["x"], 2)})
        pq.write_table(out, os.path.join(tmp_out, "out.parquet"))
        return {"rows_out": out.num_rows}

    with pytest.raises(Boom):
        run_sharded(inputs, out_root, flaky)
    # shards 000,001 complete; 002 failed mid-flight, nothing committed
    fp2 = fingerprint_paths(inputs["002"])
    assert not shard_complete(os.path.join(out_root, "shard=002"), fp2)

    calls: list = []
    m2 = run_sharded(inputs, out_root, _compute(calls))
    assert {m["shard_id"] for m in m2 if not m["skipped"]} == {"002", "003"}
    # all manifests now present + lineage recorded
    for sid, paths in inputs.items():
        mpath = os.path.join(out_root, f"shard={sid}", MANIFEST)
        with open(mpath, encoding="utf-8") as f:
            m = json.load(f)
        assert m["complete"] and m["input_paths"] == list(paths)
        assert "wall_sec" in m and "rows_out" in m["metrics"]


def test_atomic_commit_no_partial_dir(tmp_path, inputs):
    out_root = str(tmp_path / "out")

    def flaky(paths, tmp_out):
        pq.write_table(pa.table({"x2": pa.array([1])}),
                       os.path.join(tmp_out, "out.parquet"))
        raise RuntimeError("die after partial write")

    with pytest.raises(RuntimeError):
        run_shard("000", inputs["000"], os.path.join(out_root, "shard=000"),
                  flaky)
    # the final dir never appeared (only the .tmp staging dir may exist)
    assert not os.path.exists(os.path.join(out_root, "shard=000"))
