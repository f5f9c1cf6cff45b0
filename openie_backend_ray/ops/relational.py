"""Relational operator patterns over the TPC-H-ish tables — the generic
engine shapes behind SURVEY.md §2.5/§2.6 (count/sum aggregations G5,
left joins J1, broadcast joins J2, top-k, sort, hash sampling M14),
expressed scale-first:

- **partial aggregation**: every aggregate here folds each batch to one
  partial row per key in ``map_batches`` BEFORE the groupby, so the
  shuffle moves per-key partials, not raw rows (the combiner the
  reference gets from Hadoop; ``ScoobiReVerbGrouper.scala:63-130``).
- **broadcast join**: the small side (customer, part) is ``ray.put``
  once and probed per batch — no all-to-all exchange (J2's relInfo
  attach, ``UnlinkableEntityTyper.scala:195``).
- **money as integer cents**: double sums are order-dependent; casting
  to int64 cents before summing makes the distributed sum exact and
  byte-identical to the DuckDB oracle.
- **hash sampling**: md5-threshold Bernoulli sampling — deterministic,
  seedless, identical in SQL (replaces the reference's
  ``Random.nextDouble < f``, ``FileSampler.scala:52-54``).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa


def _cents(x: np.ndarray) -> np.ndarray:
    # numpy rint == round-half-even; generated prices never land on
    # exact .5 mills, so this matches DuckDB round() in practice
    return np.rint(np.asarray(x, dtype=np.float64) * 100).astype(np.int64)


# ---------------------------------------------------------------------------
# G5-shape: grouped aggregate with map-side partials (TPC-H Q1 flavor)
# ---------------------------------------------------------------------------

def _pricing_partial(batch: pa.Table) -> pa.Table:
    df = batch.select(
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"]
    ).to_pandas()
    df["price_cents"] = _cents(df.pop("l_extendedprice").to_numpy())
    g = df.groupby(["l_returnflag", "l_linestatus"], sort=False).agg(
        sum_qty=("l_quantity", "sum"),
        sum_price_cents=("price_cents", "sum"),
        row_count=("l_quantity", "size"),
    ).reset_index()
    return pa.Table.from_pandas(g, preserve_index=False)


def pricing_summary(lineitem_ds):
    """(l_returnflag, l_linestatus, sum_qty, sum_price_cents, row_count)."""
    partial = lineitem_ds.map_batches(
        _pricing_partial, batch_format="pyarrow", batch_size=8192
    )
    final = partial.groupby(["l_returnflag", "l_linestatus"]).sum(
        ["sum_qty", "sum_price_cents", "row_count"]
    )
    return final.map_batches(
        lambda b: pa.table(
            {
                "l_returnflag": b["l_returnflag"],
                "l_linestatus": b["l_linestatus"],
                "sum_qty": b["sum(sum_qty)"],
                "sum_price_cents": b["sum(sum_price_cents)"],
                "row_count": b["sum(row_count)"],
            }
        ),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# J2-shape: broadcast join (orders x customer) + aggregate
# ---------------------------------------------------------------------------

class SegmentRevenue:
    """Per-batch probe of the broadcast custkey -> mktsegment dict, with
    a batch-local partial aggregate on the way out."""

    def __init__(self, cust_ref=None, cust: dict | None = None):
        if cust is None and cust_ref is not None:
            import ray

            cust = ray.get(cust_ref)
        self.seg = cust

    def __call__(self, batch: pa.Table) -> pa.Table:
        df = batch.select(["o_custkey", "o_totalprice"]).to_pandas()
        df["c_mktsegment"] = df.pop("o_custkey").map(self.seg)
        df["price_cents"] = _cents(df.pop("o_totalprice").to_numpy())
        g = df.groupby("c_mktsegment", sort=False).agg(
            total_price_cents=("price_cents", "sum"),
            n_orders=("price_cents", "size"),
        ).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)


def segment_revenue(orders_ds, cust_ref):
    """(c_mktsegment, total_price_cents, n_orders) via broadcast join."""
    from openie_backend_ray.util import auto_pool

    partial = orders_ds.map_batches(
        SegmentRevenue,
        fn_constructor_kwargs={"cust_ref": cust_ref},
        batch_format="pyarrow",
        batch_size=8192,
        concurrency=auto_pool(0.5),
    )
    final = partial.groupby("c_mktsegment").sum(
        ["total_price_cents", "n_orders"]
    )
    return final.map_batches(
        lambda b: pa.table(
            {
                "c_mktsegment": b["c_mktsegment"],
                "total_price_cents": b["sum(total_price_cents)"],
                "n_orders": b["sum(n_orders)"],
            }
        ),
        batch_format="pyarrow",
    )


def customer_segment_map(customer_table: pa.Table) -> dict:
    return dict(
        zip(
            customer_table["c_custkey"].to_pylist(),
            customer_table["c_mktsegment"].to_pylist(),
        )
    )


# ---------------------------------------------------------------------------
# top-k: partial agg -> small groupby -> sort.limit
# ---------------------------------------------------------------------------

def top_parts_by_quantity(lineitem_ds, k: int = 10):
    """Top-k partkeys by total quantity; ties break on l_partkey asc."""
    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select(["l_partkey", "l_quantity"]).to_pandas()
        g = df.groupby("l_partkey", sort=False).agg(
            total_qty=("l_quantity", "sum")
        ).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (
        lineitem_ds.map_batches(partial, batch_format="pyarrow",
                                batch_size=8192)
        .groupby("l_partkey")
        .sum("total_qty")
    )
    # deterministic ties: sort on (qty desc, partkey asc)
    return (
        agg.map_batches(
            lambda b: pa.table(
                {"l_partkey": b["l_partkey"],
                 "total_qty": b["sum(total_qty)"]}
            ),
            batch_format="pyarrow",
        )
        .sort(["total_qty", "l_partkey"], descending=[True, False])
        .limit(k)
    )


# ---------------------------------------------------------------------------
# windowed aggregate over the events stream table
# ---------------------------------------------------------------------------

def events_daily(events_ds):
    """Per (user_id, day) tumbling-window aggregate: event count + sum of
    ``value`` in micro-units (int64, exact)."""
    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select(["user_id", "ts", "value"]).to_pandas()
        # us precision to match the parquet/DuckDB timestamp unit
        df["day"] = df.pop("ts").dt.floor("D").astype("datetime64[us]")
        df["value_micros"] = np.rint(
            df.pop("value").to_numpy() * 1_000_000
        ).astype(np.int64)
        g = df.groupby(["user_id", "day"], sort=False).agg(
            n_events=("value_micros", "size"),
            sum_value_micros=("value_micros", "sum"),
        ).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    final = (
        events_ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=8192)
        .groupby(["user_id", "day"])
        .sum(["n_events", "sum_value_micros"])
    )
    return final.map_batches(
        lambda b: pa.table(
            {
                "user_id": b["user_id"],
                "day": b["day"],
                "n_events": b["sum(n_events)"],
                "sum_value_micros": b["sum(sum_value_micros)"],
            }
        ),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# M14: deterministic hash sample
# ---------------------------------------------------------------------------

def hash_sample(ds, key: str = "doc_id", fraction_hex: str = "4"):
    """Bernoulli-style sample keeping rows whose md5(key) starts below
    ``fraction_hex`` (e.g. '4' keeps ~25%). Deterministic and identical
    in SQL: md5(cast(key as varchar)) < '4'."""
    def body(batch: pa.Table) -> pa.Table:
        vals = batch[key].to_pylist()
        mask = [
            hashlib.md5(str(v).encode()).hexdigest() < fraction_hex
            for v in vals
        ]
        return batch.filter(pa.array(mask, pa.bool_()))

    return ds.map_batches(body, batch_format="pyarrow")
