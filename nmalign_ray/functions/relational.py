"""Relational operator coverage on the TPC-H-ish tables.

These map the reference's relational surface (grouped aggregates C5/O2,
the per-page equi-join O1, the anti-join flavor O6, projections C3,
filters O4, implicit sort/top-1 loops — SURVEY §2.4) onto Ray Data at
scale, each with an exact DuckDB twin:

* ``pricing_summary``  — grouped aggregation with PARTIAL pre-aggregation
  inside ``map_batches`` before the (tiny) global ``groupby`` shuffle;
* ``segment_revenue``  — broadcast hash join (dimension side via
  ``ray.put``, no shuffle);
* ``inactive_customers`` — anti join via broadcast key set;
* ``top_orders``       — global top-k without a global sort (per-batch
  top-k, then one small merge);
* ``hourly_events``    — event-time tumbling-window aggregate
  (``groupby(user, hour)``) over the events stream table.

Float aggregates are rounded half-away at 3 decimals on both sides so
summation-order differences cannot flip the value hash.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from .textstats import round_half_away

PRICING_SUMMARY_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 3) AS sum_qty,
       round(sum(l_extendedprice), 3) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 3) AS sum_disc_price,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def pricing_summary(lineitem: ray.data.Dataset) -> pd.DataFrame:
    """TPC-H Q1-shaped pricing summary.  Partial aggregation per batch
    (one row per key per batch) keeps the shuffle tiny; the final combine
    happens on the collected partials (a handful of rows)."""
    cutoff = pa.scalar(np.datetime64("1998-09-02T00:00:00", "us"))

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.less_equal(batch["l_shipdate"], cutoff))
        disc_price = pc.multiply(
            batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"])
        )
        df = pd.DataFrame(
            {
                "l_returnflag": batch["l_returnflag"].to_pandas(),
                "l_linestatus": batch["l_linestatus"].to_pandas(),
                "qty": batch["l_quantity"].to_pandas(),
                "base": batch["l_extendedprice"].to_pandas(),
                "disc_price": disc_price.to_pandas(),
                "disc": batch["l_discount"].to_pandas(),
            }
        )
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("qty", "sum"),
            sum_base_price=("base", "sum"),
            sum_disc_price=("disc_price", "sum"),
            sum_disc=("disc", "sum"),
            count_order=("qty", "size"),
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = lineitem.map_batches(
        partial, batch_format="pyarrow", batch_size=65536
    ).to_pandas()
    out = partials.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
        sum_qty=("sum_qty", "sum"),
        sum_base_price=("sum_base_price", "sum"),
        sum_disc_price=("sum_disc_price", "sum"),
        sum_disc=("sum_disc", "sum"),
        count_order=("count_order", "sum"),
    )
    out["avg_disc"] = round_half_away(out["sum_disc"] / out["count_order"], 6)
    out = out.drop(columns=["sum_disc"])
    for col in ("sum_qty", "sum_base_price", "sum_disc_price"):
        out[col] = round_half_away(out[col], 3)
    return out[
        ["l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
         "sum_disc_price", "avg_disc", "count_order"]
    ]


SEGMENT_REVENUE_SQL = """
SELECT c.c_mktsegment,
       round(sum(o.o_totalprice), 3) AS revenue,
       count(*) AS num_orders
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
"""


def segment_revenue(
    orders: ray.data.Dataset, customer: ray.data.Dataset
) -> pd.DataFrame:
    """Broadcast hash join: the customer dimension is ``ray.put`` once and
    looked up per batch — no shuffle touches the fact table."""
    cust = customer.select_columns(["c_custkey", "c_mktsegment"]).to_pandas()
    seg_of = dict(zip(cust["c_custkey"], cust["c_mktsegment"]))
    ref = ray.put(seg_of)

    def partial(batch: pa.Table) -> pa.Table:
        lookup = ray.get(ref)
        custkeys = batch["o_custkey"].to_pandas()
        seg = custkeys.map(lookup)
        df = pd.DataFrame({"c_mktsegment": seg, "price": batch["o_totalprice"].to_pandas()})
        df = df.dropna(subset=["c_mktsegment"])
        g = df.groupby("c_mktsegment", as_index=False).agg(
            revenue=("price", "sum"), num_orders=("price", "size")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = orders.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = partials.groupby("c_mktsegment", as_index=False).agg(
        revenue=("revenue", "sum"), num_orders=("num_orders", "sum")
    )
    out["revenue"] = round_half_away(out["revenue"], 3)
    return out


INACTIVE_CUSTOMERS_SQL = """
SELECT c_custkey, c_name
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
"""


def inactive_customers(
    customer: ray.data.Dataset, orders: ray.data.Dataset
) -> pd.DataFrame:
    """Anti join via broadcast key set: customers with no urgent orders
    (the reference's side-2 unmatched detection O6 is the same shape,
    ``/root/reference/nmalign/ocrd/cli.py:235-236``).  The key set is
    pre-filtered and distinct'ed before broadcast, so only (distinct)
    keys ship, never the fact table."""
    urgent = orders.map_batches(
        lambda b: b.filter(pc.equal(b["o_orderpriority"], "1-URGENT")).select(
            ["o_custkey"]
        ),
        batch_format="pyarrow",
    )
    keys = urgent.to_pandas()["o_custkey"].unique()
    ref = ray.put(frozenset(int(k) for k in keys))

    def anti(batch: pa.Table) -> pa.Table:
        active_keys = ray.get(ref)
        mask = [int(k) not in active_keys for k in batch["c_custkey"].to_pylist()]
        return batch.filter(pa.array(mask, type=pa.bool_())).select(
            ["c_custkey", "c_name"])

    out = customer.map_batches(anti, batch_format="pyarrow").to_pandas()
    if out.empty:
        out = pd.DataFrame({"c_custkey": pd.Series(dtype="int64"),
                            "c_name": pd.Series(dtype="object")})
    return out


TOP_ORDERS_SQL = """
SELECT o_orderkey, o_custkey, round(o_totalprice, 3) AS o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
"""


def top_orders(orders: ray.data.Dataset, k: int = 10) -> pd.DataFrame:
    """Global top-k without a global sort: per-batch top-k partials, one
    driver-side merge of <= k rows per block."""
    def partial(batch: pa.Table) -> pa.Table:
        df = pa.Table.from_arrays(
            [batch["o_orderkey"], batch["o_custkey"], batch["o_totalprice"]],
            ["o_orderkey", "o_custkey", "o_totalprice"],
        ).to_pandas()
        return pa.Table.from_pandas(
            df.sort_values(["o_totalprice", "o_orderkey"], ascending=[False, True])
            .head(k),
            preserve_index=False,
        )

    partials = orders.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = partials.sort_values(
        ["o_totalprice", "o_orderkey"], ascending=[False, True]
    ).head(k).reset_index(drop=True)
    out["o_totalprice"] = round_half_away(out["o_totalprice"], 3)
    return out


HOURLY_EVENTS_SQL = """
SELECT user_id,
       date_trunc('hour', ts) AS hour,
       count(*) AS n_events,
       round(sum(value), 3) AS sum_value
FROM events
GROUP BY user_id, date_trunc('hour', ts)
"""


def hourly_events(events: ray.data.Dataset) -> pd.DataFrame:
    """Tumbling event-time window aggregate: floor ts to the hour inside a
    vectorized map_batches (partial per batch), then one groupby over the
    pre-aggregated (user, hour) rows."""
    def partial(batch: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(batch["ts"], unit="hour")
        df = pd.DataFrame(
            {
                "user_id": batch["user_id"].to_pandas(),
                "hour": hour.to_pandas(),
                "value": batch["value"].to_pandas(),
            }
        )
        g = df.groupby(["user_id", "hour"], as_index=False).agg(
            n_events=("value", "size"), sum_value=("value", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = events.map_batches(
        partial, batch_format="pyarrow", batch_size=65536
    ).to_pandas()
    # final combine over PRE-AGGREGATED partials (row count = distinct
    # keys, not events) in pandas: Ray's sort-aggregate spends ~100x
    # longer per key on this shape (measured 15-23s vs <1s at sf0.1);
    # at billions of keys, swap for the hash-shuffle Dataset.aggregate
    out = partials.groupby(["user_id", "hour"], as_index=False).agg(
        n_events=("n_events", "sum"), sum_value=("sum_value", "sum"))
    out["n_events"] = out["n_events"].astype(np.int64)
    out["sum_value"] = round_half_away(out["sum_value"], 3)
    return out


SESSIONIZE_SQL = """
WITH o AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS sess
  FROM o
)
SELECT user_id,
       CAST(sess AS BIGINT) AS session_id,
       min(ts) AS session_start,
       max(ts) AS session_end,
       count(*) AS n_events,
       round(sum(value), 3) AS sum_value
FROM s
GROUP BY user_id, sess
"""


def sessionize(events: ray.data.Dataset, gap_minutes: int = 30) -> ray.data.Dataset:
    """Session windows over the event stream: a gap > ``gap_minutes``
    between a user's consecutive events starts a new session.

    Ray Data has no event-time watermarks (guide: streaming-shaped
    workloads); the ordering assumption is explicit — events are
    partitioned by ``user_id`` (one hash shuffle) and sorted by
    ``(ts, event_id)`` WITHIN each group, which is exact for bounded
    batch input.  Per-group state is a pandas cumulative sum, vectorized.
    """
    gap = pd.Timedelta(minutes=gap_minutes)

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        brk = g["ts"].diff().isna() | (g["ts"].diff() > gap)
        g["session_id"] = brk.cumsum().astype(np.int64)
        out = g.groupby("session_id", as_index=False).agg(
            session_start=("ts", "min"),
            session_end=("ts", "max"),
            n_events=("value", "size"),
            sum_value=("value", "sum"),
        )
        out.insert(0, "user_id", g["user_id"].iloc[0])
        out["n_events"] = out["n_events"].astype(np.int64)
        out["sum_value"] = round_half_away(out["sum_value"], 3)
        return out

    return events.groupby("user_id", num_partitions=32).map_groups(
        per_user, batch_format="pandas")


NATION_REVENUE_SQL = """
SELECT n.n_name,
       round(sum(o.o_totalprice), 3) AS revenue,
       count(*) AS num_orders
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
"""


def nation_revenue(
    orders: ray.data.Dataset,
    customer: ray.data.Dataset,
    nation: ray.data.Dataset,
) -> pd.DataFrame:
    """Three-table star join: both dimension hops (customer -> nation) are
    composed into ONE broadcast lookup custkey -> nation name, so the fact
    table streams through a single map stage with partial aggregation —
    no shuffle at any join."""
    cust = customer.select_columns(["c_custkey", "c_nationkey"]).to_pandas()
    nat = nation.select_columns(["n_nationkey", "n_name"]).to_pandas()
    name_of = dict(zip(nat["n_nationkey"], nat["n_name"]))
    nation_of_cust = {
        int(ck): name_of.get(int(nk))
        for ck, nk in zip(cust["c_custkey"], cust["c_nationkey"])
    }
    ref = ray.put(nation_of_cust)

    def partial(batch: pa.Table) -> pa.Table:
        lookup = ray.get(ref)
        nname = batch["o_custkey"].to_pandas().map(lookup)
        df = pd.DataFrame({"n_name": nname,
                           "price": batch["o_totalprice"].to_pandas()})
        df = df.dropna(subset=["n_name"])
        g = df.groupby("n_name", as_index=False).agg(
            revenue=("price", "sum"), num_orders=("price", "size"))
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = orders.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = partials.groupby("n_name", as_index=False).agg(
        revenue=("revenue", "sum"), num_orders=("num_orders", "sum"))
    out["revenue"] = round_half_away(out["revenue"], 3)
    out["num_orders"] = out["num_orders"].astype(np.int64)
    return out


SLIDING_EVENTS_SQL = """
SELECT user_id,
       time_bucket(INTERVAL 15 MINUTE, ts) - k * INTERVAL 15 MINUTE
         AS window_start,
       count(*) AS n_events,
       round(sum(value), 3) AS sum_value
FROM events, unnest([0, 1, 2, 3]) AS t(k)
GROUP BY user_id, window_start
"""


def sliding_events(events: ray.data.Dataset) -> pd.DataFrame:
    """Sliding event-time windows (1 h length, 15 min slide) via the
    explode-to-covering-windows pattern: each event is replicated into
    the 4 windows that contain it inside a vectorized ``map_batches``
    (numpy datetime arithmetic), pre-aggregated per batch, then combined
    over the partials — no self-join, no range join."""
    slide = np.timedelta64(15, "m")

    def explode_partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy(zero_copy_only=False)
        bucket = ts.astype("datetime64[15m]")  # floor to the 15-minute grid
        n = len(ts)
        frames = []
        for k in range(4):
            frames.append(pd.DataFrame({
                "user_id": batch["user_id"].to_numpy(zero_copy_only=False),
                "window_start": (bucket - k * slide.astype("timedelta64[15m]"))
                    .astype("datetime64[us]"),
                "value": batch["value"].to_numpy(zero_copy_only=False),
            }))
        df = pd.concat(frames, ignore_index=True)
        g = df.groupby(["user_id", "window_start"], as_index=False).agg(
            n_events=("value", "size"), sum_value_raw=("value", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = events.map_batches(explode_partial, batch_format="pyarrow",
                                  batch_size=65536).to_pandas()
    # same combine-partials-in-pandas tradeoff as hourly_events (see note
    # there): the partial rows are already one-per-key-per-batch
    out = partials.groupby(["user_id", "window_start"], as_index=False).agg(
        n_events=("n_events", "sum"), sum_value=("sum_value_raw", "sum"))
    out["n_events"] = out["n_events"].astype(np.int64)
    out["sum_value"] = round_half_away(out["sum_value"], 3)
    return out
