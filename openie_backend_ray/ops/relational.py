"""Relational operator patterns over the TPC-H-ish tables — the generic
engine shapes behind SURVEY.md §2.5/§2.6 (count/sum aggregations G5,
left joins J1, broadcast joins J2, top-k, sort, hash sampling M14),
expressed scale-first:

- **partial aggregation**: every aggregate here folds each batch to one
  partial row per key in ``map_batches`` BEFORE the groupby, so the
  shuffle moves per-key partials, not raw rows (the combiner the
  reference gets from Hadoop; ``ScoobiReVerbGrouper.scala:63-130``).
- **zero-copy partials**: the per-batch fold is ``pyarrow``
  ``Table.group_by`` / compute kernels end to end — no pandas
  conversion per batch (profiled: the Arrow->pandas->Arrow round trip
  dominated these stages at sf0.1).
- **broadcast join**: the small side (customer, part) is ``ray.put``
  once and probed per batch with a vectorized ``searchsorted`` — no
  all-to-all exchange (J2's relInfo attach,
  ``UnlinkableEntityTyper.scala:195``).
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
import pyarrow as pa
import pyarrow.compute as pc


def _cents(col: pa.ChunkedArray | pa.Array, scale: float = 100.0):
    # pc.round default is half-to-even (== numpy rint); generated
    # prices never land on exact .5 mills, so this matches DuckDB
    # round() in practice
    return pc.cast(pc.round(pc.multiply(col, scale)), pa.int64())


def _agg(table: pa.Table, keys: list[str], aggs: list[tuple],
         names: list[str]) -> pa.Table:
    """``Table.group_by(...).aggregate(...)`` with output renames."""
    out = table.group_by(keys, use_threads=False).aggregate(aggs)
    return out.select(
        keys + [f"{c}_{f}" for c, f in aggs]
    ).rename_columns(keys + names)


# ---------------------------------------------------------------------------
# G5-shape: grouped aggregate with map-side partials (TPC-H Q1 flavor)
# ---------------------------------------------------------------------------

def _pricing_partial(batch: pa.Table) -> pa.Table:
    t = pa.table(
        {
            "l_returnflag": batch["l_returnflag"],
            "l_linestatus": batch["l_linestatus"],
            "l_quantity": batch["l_quantity"],
            "price_cents": _cents(batch["l_extendedprice"]),
        }
    )
    return _agg(
        t, ["l_returnflag", "l_linestatus"],
        [("l_quantity", "sum"), ("price_cents", "sum"),
         ("price_cents", "count")],
        ["sum_qty", "sum_price_cents", "row_count"],
    )


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
    """Per-batch probe of the broadcast custkey -> mktsegment mapping
    (sorted arrays + ``np.searchsorted``, fully vectorized), with a
    batch-local partial aggregate on the way out."""

    def __init__(self, cust_ref=None, cust: dict | None = None):
        if cust is None and cust_ref is not None:
            import ray

            cust = ray.get(cust_ref)
        keys = np.fromiter(cust.keys(), dtype=np.int64, count=len(cust))
        order = np.argsort(keys)
        self.keys = keys[order]
        self.segs = np.array(list(cust.values()), dtype=object)[order]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False)
        idx = np.clip(np.searchsorted(self.keys, ck), 0, len(self.keys) - 1)
        # membership mask: a custkey absent from the map must be DROPPED
        # (inner-join semantics), not silently attributed to the
        # insertion-point key's segment
        matched = self.keys[idx] == ck
        segs = self.segs[idx][matched]
        t = pa.table(
            {
                "c_mktsegment": pa.array(segs, pa.string()),
                "price_cents": _cents(batch["o_totalprice"].filter(
                    pa.array(matched, pa.bool_()))),
            }
        )
        return _agg(
            t, ["c_mktsegment"],
            [("price_cents", "sum"), ("price_cents", "count")],
            ["total_price_cents", "n_orders"],
        )


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
# top-k: partial agg -> small groupby -> per-block top-k -> tiny sort
# ---------------------------------------------------------------------------

def top_parts_by_quantity(lineitem_ds, k: int = 10):
    """Top-k partkeys by total quantity; ties break on l_partkey asc."""
    def partial(batch: pa.Table) -> pa.Table:
        return _agg(
            batch.select(["l_partkey", "l_quantity"]),
            ["l_partkey"], [("l_quantity", "sum")], ["total_qty"],
        )

    agg = (
        # combiner width must exceed the part-key cardinality per batch
        # or the partial barely combines (20k distinct keys vs 8k-row
        # batches left ~1 output row per input row; 64k-row batches cut
        # the shuffle ~7x for two int columns of negligible heap)
        lineitem_ds.map_batches(partial, batch_format="pyarrow",
                                batch_size=65536)
        .groupby("l_partkey")
        .sum("total_qty")
    )

    def local_topk(b: pa.Table) -> pa.Table:
        """Per-block top-k over the aggregated rows: the final global
        sort then sees k x blocks rows, not every part key."""
        t = pa.table(
            {"l_partkey": b["l_partkey"], "total_qty": b["sum(total_qty)"]}
        )
        idx = pc.sort_indices(
            t, sort_keys=[("total_qty", "descending"),
                          ("l_partkey", "ascending")]
        )
        return t.take(idx.slice(0, k))

    return (
        agg.map_batches(local_topk, batch_format="pyarrow")
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
        t = pa.table(
            {
                "user_id": batch["user_id"],
                "day": pc.floor_temporal(batch["ts"], unit="day"),
                "value_micros": _cents(batch["value"], 1_000_000.0),
            }
        )
        return _agg(
            t, ["user_id", "day"],
            [("value_micros", "count"), ("value_micros", "sum")],
            ["n_events", "sum_value_micros"],
        )

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
# M14: deterministic hash sample (+ the plain Bernoulli FileSampler)
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


def bernoulli_sample(ds, fraction: float, seed: int | None = None):
    """Plain Bernoulli sampler (``FileSampler.scala:52-54``:
    ``Random.nextDouble < f`` per row) — Ray's native random_sample.
    Non-deterministic across runs unless ``seed`` is given; use
    ``hash_sample`` when reproducibility across engines matters."""
    return ds.random_sample(fraction, seed=seed)


# ---------------------------------------------------------------------------
# session windows over the events stream (gap-based sessionization)
# ---------------------------------------------------------------------------

def events_sessions(events_ds, gap_minutes: int = 30):
    """Per-user gap-based session windows (the streaming session-window
    analogue, run as a batch op): events more than ``gap_minutes`` apart
    start a new session; emits (user_id, session_id, session_start,
    session_end, n_events).

    Shape: ONE groupby(user_id) shuffle, per-user ordered scan in the
    reducer (a user's events fit a reducer by assumption — the same
    per-key contract as the reference's per-group reducers; a hot
    synthetic user would need the grouper's salting pattern).
    Session numbering is a pure function of the timestamp multiset, so
    the result is partition- and tie-order-independent."""
    gap_us = np.int64(gap_minutes) * 60 * 1_000_000

    def sess(g: pa.Table) -> pa.Table:
        ts = g["ts"].to_numpy(zero_copy_only=False)
        ts = np.sort(ts.astype("datetime64[us]"))
        tsi = ts.astype(np.int64)
        brk = np.empty(len(tsi), dtype=np.int64)
        brk[0] = 1
        if len(tsi) > 1:
            brk[1:] = (np.diff(tsi) > gap_us).astype(np.int64)
        sid = np.cumsum(brk)
        n_sessions = int(sid[-1])
        starts, ends, counts = [], [], []
        for s in range(1, n_sessions + 1):
            mask = sid == s
            starts.append(ts[mask][0])
            ends.append(ts[mask][-1])
            counts.append(int(mask.sum()))
        uid = g["user_id"][0].as_py()
        return pa.table(
            {
                "user_id": pa.array([uid] * n_sessions,
                                    g["user_id"].type),
                "session_id": pa.array(range(1, n_sessions + 1),
                                       pa.int64()),
                "session_start": pa.array(starts,
                                          pa.timestamp("us")),
                "session_end": pa.array(ends, pa.timestamp("us")),
                "n_events": pa.array(counts, pa.int64()),
            }
        )

    return (
        events_ds.select_columns(["user_id", "ts"])
        .groupby("user_id")
        .map_groups(sess, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# as-of join: each event matched to the user's latest order at-or-before
# the event (backward as-of on time within key)
# ---------------------------------------------------------------------------

_ASOF = pa.schema(
    [
        ("key", pa.int64()),
        ("event_id", pa.int64()),
        ("ts", pa.timestamp("us")),
        ("o_orderkey", pa.int64()),
        ("o_orderdate", pa.date32()),
    ]
)

_DAY_US = 86_400_000_000  # pandas surfaces DATE as midnight timestamps


def asof_latest_order(events_ds, orders_ds):
    """(event_id, user_id, ts, o_orderkey, o_orderdate): left as-of
    join — per event, the user's order with the greatest
    (o_orderdate, o_orderkey) whose date is <= the event's date; null
    when the user has no prior order.

    Shape: tagged union + ONE groupby(key) co-group; the per-key
    reducer sorts its (small) order side once and answers every event
    with a vectorized searchsorted — the standard distributed as-of
    pattern (sort only within key partitions, never globally)."""

    def tag_events(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": pc.cast(b["user_id"], pa.int64()),
                "event_id": pc.cast(b["event_id"], pa.int64()),
                "ts": b["ts"],
                "o_orderkey": pa.nulls(b.num_rows, pa.int64()),
                "o_orderdate": pa.nulls(b.num_rows, pa.date32()),
            },
            schema=_ASOF,
        )

    def tag_orders(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": pc.cast(b["o_custkey"], pa.int64()),
                "event_id": pa.nulls(b.num_rows, pa.int64()),
                "ts": pa.nulls(b.num_rows, pa.timestamp("us")),
                "o_orderkey": pc.cast(b["o_orderkey"], pa.int64()),
                "o_orderdate": b["o_orderdate"],
            },
            schema=_ASOF,
        )

    def reduce_key(g: pa.Table) -> pa.Table:
        ev_mask = pc.is_valid(g["event_id"])
        ev = g.filter(ev_mask)
        if ev.num_rows == 0:
            return pa.table(
                {"event_id": pa.array([], pa.int64()),
                 "user_id": pa.array([], pa.int64()),
                 "ts": pa.array([], pa.timestamp("us")),
                 "o_orderkey": pa.array([], pa.int64()),
                 "o_orderdate": pa.array([], pa.string())}
            )
        orders = g.filter(pc.invert(ev_mask))
        key = g["key"][0].as_py()
        ev_ts = ev["ts"].to_numpy(zero_copy_only=False)
        ev_days = ev_ts.astype("datetime64[D]").astype(np.int64)
        n_ev = len(ev_days)
        if orders.num_rows == 0:
            ok = np.full(n_ev, -1)
            o_days = np.array([], dtype=np.int64)
            o_keys = np.array([], dtype=np.int64)
        else:
            o_days = orders["o_orderdate"].to_numpy(
                zero_copy_only=False
            ).astype("datetime64[D]").astype(np.int64)
            o_keys = orders["o_orderkey"].to_numpy(zero_copy_only=False)
            order = np.lexsort((o_keys, o_days))
            o_days, o_keys = o_days[order], o_keys[order]
            # last order with day <= event day; same-day ties resolve
            # to the max orderkey because of the lexsort
            ok = np.searchsorted(o_days, ev_days, side="right") - 1
        matched = ok >= 0
        if len(o_keys) == 0:
            out_key = np.zeros(n_ev, dtype=np.int64)
            out_day = np.zeros(n_ev, dtype=np.int64)
        else:
            out_key = np.where(matched, o_keys[np.clip(ok, 0, None)], 0)
            out_day = np.where(matched, o_days[np.clip(ok, 0, None)], 0)
        return pa.table(
            {
                "event_id": ev["event_id"],
                "user_id": pa.array([key] * n_ev, pa.int64()),
                "ts": ev["ts"],
                "o_orderkey": pa.array(
                    [int(v) if m else None
                     for v, m in zip(out_key, matched)], pa.int64()),
                # emitted as an ISO string: pandas renders DATE /
                # midnight-timestamp columns at engine-dependent
                # resolutions, so a plain string is the only
                # representation both engines hash identically
                "o_orderdate": pa.array(
                    [str(np.int64(v).astype("datetime64[D]")) if m
                     else None
                     for v, m in zip(out_day, matched)],
                    pa.string()),
            }
        )

    tagged = events_ds.map_batches(
        tag_events, batch_format="pyarrow"
    ).union(orders_ds.map_batches(tag_orders, batch_format="pyarrow"))
    from openie_backend_ray.ops.partition import partition_map_groups

    return partition_map_groups(tagged, "key", reduce_key)


# ---------------------------------------------------------------------------
# range join: per event, count the user's orders within the trailing
# N-day window (the interval/range-join shape on the same co-group)
# ---------------------------------------------------------------------------

def orders_in_range(events_ds, orders_ds, days: int = 7):
    """(event_id, user_id, n_orders): orders of the event's user with
    o_orderdate in [event_date - days, event_date] — a banded range
    join, co-grouped by key with both range bounds answered by one
    sorted array + two vectorized searchsorteds per key."""

    def tag_events(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": pc.cast(b["user_id"], pa.int64()),
                "event_id": pc.cast(b["event_id"], pa.int64()),
                "ts": b["ts"],
                "o_orderkey": pa.nulls(b.num_rows, pa.int64()),
                "o_orderdate": pa.nulls(b.num_rows, pa.date32()),
            },
            schema=_ASOF,
        )

    def tag_orders(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": pc.cast(b["o_custkey"], pa.int64()),
                "event_id": pa.nulls(b.num_rows, pa.int64()),
                "ts": pa.nulls(b.num_rows, pa.timestamp("us")),
                "o_orderkey": pc.cast(b["o_orderkey"], pa.int64()),
                "o_orderdate": b["o_orderdate"],
            },
            schema=_ASOF,
        )

    def reduce_key(g: pa.Table) -> pa.Table:
        ev_mask = pc.is_valid(g["event_id"])
        ev = g.filter(ev_mask)
        if ev.num_rows == 0:
            return pa.table(
                {"event_id": pa.array([], pa.int64()),
                 "user_id": pa.array([], pa.int64()),
                 "n_orders": pa.array([], pa.int64())}
            )
        orders = g.filter(pc.invert(ev_mask))
        key = g["key"][0].as_py()
        ev_days = ev["ts"].to_numpy(zero_copy_only=False).astype(
            "datetime64[D]"
        ).astype(np.int64)
        if orders.num_rows == 0:
            counts = np.zeros(len(ev_days), dtype=np.int64)
        else:
            o_days = np.sort(
                orders["o_orderdate"].to_numpy(zero_copy_only=False)
                .astype("datetime64[D]").astype(np.int64)
            )
            hi = np.searchsorted(o_days, ev_days, side="right")
            lo = np.searchsorted(o_days, ev_days - days, side="left")
            counts = hi - lo
        return pa.table(
            {
                "event_id": ev["event_id"],
                "user_id": pa.array([key] * len(ev_days), pa.int64()),
                "n_orders": pa.array(counts, pa.int64()),
            }
        )

    tagged = events_ds.map_batches(
        tag_events, batch_format="pyarrow"
    ).union(orders_ds.map_batches(tag_orders, batch_format="pyarrow"))
    from openie_backend_ray.ops.partition import partition_map_groups

    return partition_map_groups(tagged, "key", reduce_key)
