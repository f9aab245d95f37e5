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

Money/value aggregates are DETERMINISTIC by construction: every monetary
column in the test tables is an exact 2-decimal value, so partials
accumulate scaled int64 ("cents") — integer sums are associative and
commutative, so the result is bit-identical regardless of batch
boundaries or combine order (round-1 post-mortem: float64 partial sums
combined in Ray's nondeterministic block order flipped
``round_half_away`` at a half-ULP boundary and broke the
``pricing_summary`` value hash).  The DuckDB twins cast to
``DECIMAL(18,2)`` before summing — exact decimal sums — and cast the
exact sum to DOUBLE the same way the engine divides its int64 by the
scale, so both sides round the identical double.  (At >~1e10 rows per
key the int64 cent-sums would need int128/Decimal partials; the per-key
row count of these queries stays far below that.)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..schema import cluster_cpus
from .textstats import round_half_away


def _cents(col) -> np.ndarray:
    """Exact scaled-int64 view of a 2-decimal float column."""
    arr = col.to_numpy(zero_copy_only=False) if hasattr(col, "to_numpy") else col
    return np.rint(np.asarray(arr, dtype=np.float64) * 100.0).astype(np.int64)


PRICING_SUMMARY_SQL = """
SELECT l_returnflag, l_linestatus,
       round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 3)
         AS sum_qty,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 3)
         AS sum_base_price,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                     * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 3)
         AS sum_disc_price,
       round(CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6)
         AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def pricing_summary(lineitem: ray.data.Dataset) -> pd.DataFrame:
    """TPC-H Q1-shaped pricing summary.  Partial aggregation per batch
    (one row per key per batch) keeps the shuffle tiny; partials are
    exact scaled int64 (cents; disc_price at 1e-4), so the final combine
    is order-independent and the result deterministic across any batch
    split or combine order."""
    cutoff = pa.scalar(np.datetime64("1998-09-02T00:00:00", "us"))

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.less_equal(batch["l_shipdate"], cutoff))
        qty_c = _cents(batch["l_quantity"])
        base_c = _cents(batch["l_extendedprice"])
        disc_c = _cents(batch["l_discount"])
        df = pd.DataFrame(
            {
                "l_returnflag": batch["l_returnflag"].to_pandas(),
                "l_linestatus": batch["l_linestatus"].to_pandas(),
                "qty_c": qty_c,
                "base_c": base_c,
                # extendedprice * (1 - discount), exact at scale 1e-4
                "dp_c4": base_c * (100 - disc_c),
                "disc_c": disc_c,
            }
        )
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            qty_c=("qty_c", "sum"),
            base_c=("base_c", "sum"),
            dp_c4=("dp_c4", "sum"),
            disc_c=("disc_c", "sum"),
            count_order=("qty_c", "size"),
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = lineitem.map_batches(
        partial, batch_format="pyarrow", batch_size=65536
    ).to_pandas()
    out = partials.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
        qty_c=("qty_c", "sum"),
        base_c=("base_c", "sum"),
        dp_c4=("dp_c4", "sum"),
        disc_c=("disc_c", "sum"),
        count_order=("count_order", "sum"),
    )
    out["sum_qty"] = round_half_away(out["qty_c"] / 100.0, 3)
    out["sum_base_price"] = round_half_away(out["base_c"] / 100.0, 3)
    out["sum_disc_price"] = round_half_away(out["dp_c4"] / 10000.0, 3)
    out["avg_disc"] = round_half_away(
        (out["disc_c"] / 100.0) / out["count_order"], 6
    )
    out["count_order"] = out["count_order"].astype(np.int64)
    return out[
        ["l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
         "sum_disc_price", "avg_disc", "count_order"]
    ]


SEGMENT_REVENUE_SQL = """
SELECT c.c_mktsegment,
       round(CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 3)
         AS revenue,
       count(*) AS num_orders
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
"""


# Dimensions at or below this row count are broadcast with ray.put; above
# it the join falls back to a co-group hash shuffle on the join key (a
# broadcast dict of a 10^10-row dimension would sink the driver — the
# TPC-H customer:lineitem ratio keeps real dimensions far below the gate
# at test scale, but the gate makes the scale path explicit).
BROADCAST_DIM_MAX = 5_000_000


def segment_revenue(
    orders: ray.data.Dataset,
    customer: ray.data.Dataset,
    broadcast_threshold: int = BROADCAST_DIM_MAX,
) -> pd.DataFrame:
    """Orders x customer revenue by market segment.

    Size-gated join strategy: when the customer dimension fits the
    broadcast gate it ships once via ``ray.put`` and the fact table
    streams with zero shuffle; above the gate both sides co-group on
    ``c_custkey`` (one hash shuffle of (key, cents) fact rows — never
    the driver).  Revenue partials are exact int64 cents either way, so
    the two paths are value-identical."""
    if customer.count() > broadcast_threshold:
        return _segment_revenue_cogroup(orders, customer)
    cust = customer.select_columns(["c_custkey", "c_mktsegment"]).to_pandas()
    seg_of = dict(zip(cust["c_custkey"], cust["c_mktsegment"]))
    ref = ray.put(seg_of)

    def partial(batch: pa.Table) -> pa.Table:
        lookup = ray.get(ref)
        custkeys = batch["o_custkey"].to_pandas()
        seg = custkeys.map(lookup)
        df = pd.DataFrame(
            {"c_mktsegment": seg, "price_c": _cents(batch["o_totalprice"])}
        )
        df = df.dropna(subset=["c_mktsegment"])
        g = df.groupby("c_mktsegment", as_index=False).agg(
            price_c=("price_c", "sum"), num_orders=("price_c", "size")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = orders.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = partials.groupby("c_mktsegment", as_index=False).agg(
        price_c=("price_c", "sum"), num_orders=("num_orders", "sum")
    )
    out["revenue"] = round_half_away(out["price_c"] / 100.0, 3)
    out["num_orders"] = out["num_orders"].astype(np.int64)
    return out[["c_mktsegment", "revenue", "num_orders"]]


def _cogroup_revenue_join(
    orders: ray.data.Dataset,
    dim: ray.data.Dataset,
    dim_batch_to_label,
    label_col: str,
    return_cents: bool = False,
) -> pd.DataFrame:
    """Shared above-the-gate revenue join: fact cents and dimension label
    rows co-group on ``c_custkey``, tagged with an EXPLICIT ``is_dim``
    flag (a null-sentinel encoding would misread genuinely-NULL label
    values as fact rows); each key group emits one (label, cents, n)
    partial, combined by label (a handful of rows) at the end.  Key
    groups whose dimension label is missing or NULL are dropped, like
    the broadcast path's dropna."""
    width = max(32, cluster_cpus() * 4)

    def _key_shard(keys: pa.ChunkedArray) -> pa.Array:
        ks = keys.to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.array((ks % width).astype(np.int32), pa.int32())

    def fact_rows(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"c_custkey": batch["o_custkey"],
             "price_c": pa.array(_cents(batch["o_totalprice"]), pa.int64()),
             label_col: pa.nulls(batch.num_rows, pa.string()),
             "is_dim": pa.array([False] * batch.num_rows, pa.bool_()),
             "shard": _key_shard(batch["o_custkey"])}
        )

    def dim_rows(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"c_custkey": batch["c_custkey"],
             "price_c": pa.nulls(batch.num_rows, pa.int64()),
             label_col: dim_batch_to_label(batch),
             "is_dim": pa.array([True] * batch.num_rows, pa.bool_()),
             "shard": _key_shard(batch["c_custkey"])}
        )

    def per_shard(group: pa.Table) -> pa.Table:
        # one coarse shard = many join keys: vectorized pandas merge
        # instead of one Ray group per c_custkey (per-group dispatch is
        # key-cardinality-scaled — the measured trap; this path exists
        # precisely when keys outnumber the broadcast gate)
        g = group.combine_chunks()
        is_dim = g["is_dim"].to_numpy(zero_copy_only=False)
        fact_t = g.filter(pa.array(~is_dim, pa.bool_()))
        dim_t = g.filter(pa.array(is_dim, pa.bool_()))
        # split sides BEFORE pandas so price_c stays nullless int64 —
        # converting the mixed column would decay to float64 and break
        # the exact-cents contract on large sums
        labels = pd.DataFrame({
            "c_custkey": dim_t["c_custkey"].to_numpy(zero_copy_only=False),
            label_col: dim_t[label_col].to_pandas(),
        }).dropna(subset=[label_col]).drop_duplicates(
            "c_custkey")  # custkey is unique on the dim side
        fact = pd.DataFrame({
            "c_custkey": fact_t["c_custkey"].to_numpy(zero_copy_only=False),
            "price_c": fact_t["price_c"].to_numpy(zero_copy_only=False),
        })
        j = fact.merge(labels, on="c_custkey", how="inner")
        if j.empty:  # unmatched side: inner-join drop
            return pa.Table.from_pydict(
                {label_col: pa.array([], pa.string()),
                 "price_c": pa.array([], pa.int64()),
                 "num_orders": pa.array([], pa.int64())}
            )
        agg = j.groupby(label_col, as_index=False).agg(
            price_c=("price_c", "sum"), num_orders=("price_c", "size"))
        return pa.Table.from_pydict(
            {label_col: pa.array(agg[label_col], pa.string()),
             "price_c": pa.array(agg["price_c"].astype("int64"), pa.int64()),
             "num_orders": pa.array(agg["num_orders"].astype("int64"),
                                    pa.int64())}
        )

    tagged = orders.map_batches(fact_rows, batch_format="pyarrow").union(
        dim.map_batches(dim_rows, batch_format="pyarrow")
    )
    partials = tagged.groupby("shard", num_partitions=min(width, 64)).map_groups(
        per_shard, batch_format="pyarrow"
    )

    # per-key partials number one per distinct join key — dimension-sized,
    # which is exactly why this path exists — so they are re-reduced to
    # per-LABEL sums INSIDE map_batches (<= #labels rows per block; a
    # Ray groupby-aggregate here would full-shuffle the dimension-sized
    # partials, the documented ~100x-slower shape); only labels x blocks
    # rows reach the driver
    def label_partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            label_col: batch[label_col].to_pandas(),
            "price_c": batch["price_c"].to_pandas(),
            "num_orders": batch["num_orders"].to_pandas(),
        })
        g = df.groupby(label_col, as_index=False).agg(
            price_c=("price_c", "sum"), num_orders=("num_orders", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    combined = partials.map_batches(
        label_partial, batch_format="pyarrow").to_pandas()
    if combined.empty:  # zero matching join keys: typed empty result
        if return_cents:
            return pd.DataFrame({label_col: pd.Series(dtype="object"),
                                 "price_c": pd.Series(dtype="int64"),
                                 "num_orders": pd.Series(dtype="int64")})
        return pd.DataFrame({label_col: pd.Series(dtype="object"),
                             "revenue": pd.Series(dtype="float64"),
                             "num_orders": pd.Series(dtype="int64")})
    out = combined.groupby(label_col, as_index=False).agg(
        price_c=("price_c", "sum"), num_orders=("num_orders", "sum"))
    out["num_orders"] = out["num_orders"].astype(np.int64)
    if return_cents:
        # rollup callers derive coarser grouping levels from the finest
        # grain, so rounding must wait until every level's exact cent
        # sum exists (round-of-sum != sum-of-rounds)
        out["price_c"] = out["price_c"].astype(np.int64)
        return out[[label_col, "price_c", "num_orders"]]
    out["revenue"] = round_half_away(out["price_c"] / 100.0, 3)
    return out[[label_col, "revenue", "num_orders"]]


def _segment_revenue_cogroup(
    orders: ray.data.Dataset, customer: ray.data.Dataset
) -> pd.DataFrame:
    return _cogroup_revenue_join(
        orders,
        customer.select_columns(["c_custkey", "c_mktsegment"]),
        lambda batch: batch["c_mktsegment"],
        "c_mktsegment",
    )


INACTIVE_CUSTOMERS_SQL = """
SELECT c_custkey, c_name
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
"""


def inactive_customers(
    customer: ray.data.Dataset,
    orders: ray.data.Dataset,
    broadcast_threshold: int = BROADCAST_DIM_MAX,
) -> pd.DataFrame:
    """Anti join: customers with no urgent orders (the reference's side-2
    unmatched detection O6 is the same shape,
    ``/root/reference/nmalign/ocrd/cli.py:235-236``).

    Size-gated like the dimension joins: the distinct urgent-key set is
    broadcast while it fits the gate; above it, both sides co-group on
    ``c_custkey`` and a group emits its customer row only when no urgent
    marker landed in it — no key set ever collects to the driver.

    Returns a pandas DataFrame (typed even when empty — Ray's
    ``to_pandas`` on any zero-row dataset drops the schema entirely, so
    a lazy-Dataset return cannot satisfy the column contract on empty
    results); a deployment whose surviving-customer set outgrows the
    driver should write the pre-collect dataset to a sink instead."""
    def urgent_keys(b: pa.Table) -> pa.Table:
        # per-batch DISTINCT before anything leaves the task: the urgent
        # key domain is customer-sized (gated below), but the raw urgent
        # ROWS are fact-table-sized and must never collect to the driver
        keys = b.filter(
            pc.equal(b["o_orderpriority"], "1-URGENT"))["o_custkey"]
        return pa.Table.from_pydict(
            {"o_custkey": pa.array(
                np.unique(keys.to_numpy(zero_copy_only=False)), pa.int64())})

    urgent = orders.map_batches(urgent_keys, batch_format="pyarrow")
    if customer.count() > broadcast_threshold:
        return _inactive_customers_cogroup(customer, urgent)
    udf = urgent.to_pandas()
    # zero urgent rows: Ray's zero-row to_pandas drops the columns, so
    # guard before indexing (every customer is then inactive)
    keys = udf["o_custkey"].unique() if "o_custkey" in udf.columns else []
    ref = ray.put(frozenset(int(k) for k in keys))

    def anti(batch: pa.Table) -> pa.Table:
        active_keys = ray.get(ref)
        mask = [int(k) not in active_keys for k in batch["c_custkey"].to_pylist()]
        return batch.filter(pa.array(mask, type=pa.bool_())).select(
            ["c_custkey", "c_name"])

    return _anti_to_pandas(customer.map_batches(anti, batch_format="pyarrow"))


def _anti_to_pandas(ds: ray.data.Dataset) -> pd.DataFrame:
    """Collect the anti-join result with the typed-empty guard Ray needs:
    ``to_pandas()`` on any zero-row dataset returns a COLUMN-LESS frame
    (verified on from_arrow of a typed empty table), so empty results are
    rebuilt with the contract columns."""
    out = ds.to_pandas()
    if out.empty:
        out = pd.DataFrame({"c_custkey": pd.Series(dtype="int64"),
                            "c_name": pd.Series(dtype="object")})
    return out


def _inactive_customers_cogroup(
    customer: ray.data.Dataset, urgent: ray.data.Dataset
) -> pd.DataFrame:
    """Above-the-gate anti join: hash shuffle of (key, name, is_marker)
    rows — the explicit marker flag keeps a customer whose ``c_name``
    happens to be NULL from masquerading as an urgent marker."""
    def cust_rows(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"c_custkey": batch["c_custkey"], "c_name": batch["c_name"],
             "is_marker": pa.array([False] * batch.num_rows, pa.bool_())}
        )

    def marker_rows(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"c_custkey": batch["o_custkey"],
             "c_name": pa.nulls(batch.num_rows, pa.string()),
             "is_marker": pa.array([True] * batch.num_rows, pa.bool_())}
        )

    width = max(32, cluster_cpus() * 4)

    def add_shard(batch: pa.Table) -> pa.Table:
        ks = batch["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column(
            "shard", pa.array((ks % width).astype(np.int32), pa.int32()))

    def anti_shard(group: pa.Table) -> pa.Table:
        # one coarse shard = many keys: vectorized isin anti-join instead
        # of one Ray group per c_custkey (per-group dispatch is
        # key-cardinality-scaled; this path runs only above the gate)
        g = group.combine_chunks()
        is_marker = g["is_marker"].to_numpy(zero_copy_only=False)
        keys = g["c_custkey"].to_numpy(zero_copy_only=False)
        hit = np.isin(keys, np.unique(keys[is_marker]))
        return g.filter(pa.array(~is_marker & ~hit, pa.bool_())).select(
            ["c_custkey", "c_name"])

    tagged = customer.select_columns(["c_custkey", "c_name"]).map_batches(
        cust_rows, batch_format="pyarrow"
    ).union(urgent.map_batches(marker_rows, batch_format="pyarrow"))
    return _anti_to_pandas(
        tagged.map_batches(add_shard, batch_format="pyarrow").groupby(
            "shard", num_partitions=min(width, 64)
        ).map_groups(anti_shard, batch_format="pyarrow")
    )


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
       round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 3) AS sum_value
FROM events
GROUP BY user_id, date_trunc('hour', ts)
"""

# Above this many pre-aggregated partial rows the final window combine
# runs as a distributed hash-shuffle Dataset.aggregate instead of driver
# pandas.  The pandas fast path exists because Ray's sort-aggregate costs
# ~100x more per key on pre-aggregated partials (measured 15-23s vs <1s
# at sf0.1); the gate keeps the driver from becoming the memory bound
# when key cardinality grows with the corpus (round-1 verdict item 4).
WINDOW_DRIVER_COMBINE_MAX = 5_000_000


def _combine_window_partials(
    partials: ray.data.Dataset,
    keys: list[str],
    driver_max: int = WINDOW_DRIVER_COMBINE_MAX,
):
    """Combine (keys..., n_events, value_c) int64 partials into the final
    (keys..., n_events, sum_value) result.  Driver pandas below
    ``driver_max`` partial rows, distributed ``Dataset.aggregate`` above —
    both paths sum exact int64 cents, so they are value-identical, and
    both RETURN a Dataset so the gate never changes the caller-visible
    type as data grows."""
    from ray.data.aggregate import Sum

    parts = partials.materialize()
    if parts.count() <= driver_max:
        df = parts.to_pandas()
        out = df.groupby(keys, as_index=False).agg(
            n_events=("n_events", "sum"), value_c=("value_c", "sum"))
        out["n_events"] = out["n_events"].astype(np.int64)
        out["sum_value"] = round_half_away(out["value_c"] / 100.0, 3)
        tbl = pa.Table.from_pandas(out.drop(columns=["value_c"]),
                                   preserve_index=False)
        # pin the SAME Arrow types the distributed path produces (the
        # pandas round-trip yields timestamp[ns]; the aggregate path pins
        # us) so the gate never changes the caller-visible schema
        cols = {}
        for name in tbl.column_names:
            col = tbl[name]
            if pa.types.is_timestamp(col.type):
                col = pc.cast(col, pa.timestamp("us"))
            cols[name] = col
        return ray.data.from_arrow(pa.Table.from_pydict(cols))

    agg = parts.groupby(keys).aggregate(
        Sum("n_events", alias_name="n_events"),
        Sum("value_c", alias_name="value_c"),
    )

    def finalize(batch: pa.Table) -> pa.Table:
        cols = {}
        for k in keys:
            col = batch[k]
            # Ray's sort-aggregate can narrow timestamp precision; pin us
            # so both combine paths produce the identical schema
            if pa.types.is_timestamp(col.type):
                col = pc.cast(col, pa.timestamp("us"))
            cols[k] = col
        cols["n_events"] = pc.cast(batch["n_events"], pa.int64())
        cols["sum_value"] = pa.array(
            round_half_away(
                batch["value_c"].to_numpy(zero_copy_only=False) / 100.0, 3
            ),
            pa.float64(),
        )
        return pa.Table.from_pydict(cols)

    return agg.map_batches(finalize, batch_format="pyarrow")


def hourly_events(
    events: ray.data.Dataset, driver_max: int = WINDOW_DRIVER_COMBINE_MAX
):
    """Tumbling event-time window aggregate: floor ts to the hour inside a
    vectorized map_batches (partial per batch, exact int64 cents), then a
    size-gated combine over the pre-aggregated (user, hour) rows."""
    def partial(batch: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(batch["ts"], unit="hour")
        df = pd.DataFrame(
            {
                "user_id": batch["user_id"].to_pandas(),
                "hour": hour.to_pandas(),
                "value_c": _cents(batch["value"]),
            }
        )
        g = df.groupby(["user_id", "hour"], as_index=False).agg(
            n_events=("value_c", "size"), value_c=("value_c", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = events.map_batches(partial, batch_format="pyarrow",
                                  batch_size=65536)
    return _combine_window_partials(partials, ["user_id", "hour"], driver_max)


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
       round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 3) AS sum_value
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
        g["value_c"] = _cents(g["value"].to_numpy())
        out = g.groupby("session_id", as_index=False).agg(
            session_start=("ts", "min"),
            session_end=("ts", "max"),
            n_events=("value_c", "size"),
            value_c=("value_c", "sum"),
        )
        out.insert(0, "user_id", g["user_id"].iloc[0])
        out["n_events"] = out["n_events"].astype(np.int64)
        out["sum_value"] = round_half_away(out["value_c"] / 100.0, 3)
        return out.drop(columns=["value_c"])

    # shuffle width scales with the session's CPU count (a fixed 32
    # starves the exchange on a larger cluster — round-2 verdict item 6);
    # 32 stays the floor so small sessions keep the tuned width.  The
    # exchange is keyed on a COARSE shard of user_id (one map_groups
    # task per shard, users walked inside) — a per-user_id groupby pays
    # per-group dispatch at user cardinality
    width = max(32, cluster_cpus() * 4)

    def add_shard(batch: pa.Table) -> pa.Table:
        u = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column(
            "shard", pa.array((u % width).astype(np.int32), pa.int32()))

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        outs = [per_user(sub.drop(columns=["shard"]))
                for _, sub in g.groupby("user_id", sort=True)]
        return pd.concat(outs, ignore_index=True)

    return events.map_batches(add_shard, batch_format="pyarrow").groupby(
        "shard", num_partitions=min(width, 64)
    ).map_groups(per_shard, batch_format="pandas")


# As-of join (trades/quotes shape): "probe" events (event_id % 10 == 0)
# join to the SAME user's most recent other event at or before their
# timestamp, tie-broken by the larger event_id.  DuckDB's native ASOF
# JOIN leaves equal-timestamp matches unspecified, so the twin pins the
# same total order with a window row_number instead.
ASOF_JOIN_SQL = """
WITH probe AS (
  SELECT user_id, event_id, ts FROM events WHERE event_id % 10 = 0
),
quote AS (
  SELECT user_id, event_id, ts, value FROM events WHERE event_id % 10 != 0
)
SELECT user_id, event_id, ts, quote_event_id, quote_ts, quote_value
FROM (
  SELECT p.user_id, p.event_id, p.ts,
         q.event_id AS quote_event_id, q.ts AS quote_ts,
         q.value AS quote_value,
         row_number() OVER (PARTITION BY p.event_id
                            ORDER BY q.ts DESC, q.event_id DESC) AS rn
  FROM probe p
  JOIN quote q ON q.user_id = p.user_id AND q.ts <= p.ts
) WHERE rn = 1
"""


def asof_join(events: ray.data.Dataset, probe_mod: int = 10) -> ray.data.Dataset:
    """As-of join, the windowed-lookup operator Ray Data lacks natively:
    each probe event (``event_id % probe_mod == 0``) is matched to the
    same user's latest other event with ``ts <= probe.ts`` (ties on ts
    broken by larger event_id); probes with no earlier event are dropped
    (inner as-of semantics).

    Implementation: ONE hash shuffle on the join key (``groupby(user_id)``
    co-group; both sides ride the same exchange as tagged rows), then a
    per-group vectorized merge — sort the quote side once by (ts,
    event_id) and ``np.searchsorted`` every probe against it.
    Partitioning assumption (documented per the custom-operator
    contract): one user's events fit in one group; a pathologically hot
    user would need the salting treatment the alignment stage uses."""
    def tag(batch: pa.Table) -> pa.Table:
        is_probe = pa.array(
            batch["event_id"].to_numpy(zero_copy_only=False) % probe_mod == 0
        )
        return pa.Table.from_pydict(
            {"user_id": batch["user_id"], "event_id": batch["event_id"],
             "ts": batch["ts"], "value": batch["value"],
             "is_probe": is_probe}
        )

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        probes = g[g["is_probe"]]
        quotes = g[~g["is_probe"]].sort_values(
            ["ts", "event_id"], kind="mergesort"
        )
        empty = pd.DataFrame(
            {"user_id": pd.Series([], dtype=g["user_id"].dtype),
             "event_id": pd.Series([], dtype=np.int64),
             "ts": pd.Series([], dtype=g["ts"].dtype),
             "quote_event_id": pd.Series([], dtype=np.int64),
             "quote_ts": pd.Series([], dtype=g["ts"].dtype),
             "quote_value": pd.Series([], dtype=np.float64)}
        )
        if probes.empty or quotes.empty:
            return empty
        # index of the last quote with ts <= probe ts; the (ts, event_id)
        # sort makes that row the tie-broken winner
        idx = np.searchsorted(
            quotes["ts"].to_numpy(), probes["ts"].to_numpy(), side="right"
        ) - 1
        keep = idx >= 0
        if not keep.any():
            return empty
        probes = probes[keep]
        hit = quotes.iloc[idx[keep]]
        return pd.DataFrame(
            {"user_id": probes["user_id"].to_numpy(),
             "event_id": probes["event_id"].to_numpy(),
             "ts": probes["ts"].to_numpy(),
             "quote_event_id": hit["event_id"].to_numpy(),
             "quote_ts": hit["ts"].to_numpy(),
             "quote_value": hit["value"].to_numpy()}
        )

    # coarse shard of the join key, users walked inside the shard task
    # (per-user_id groups pay per-group dispatch at user cardinality)
    width = max(32, cluster_cpus() * 4)

    def add_shard(batch: pa.Table) -> pa.Table:
        u = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column(
            "shard", pa.array((u % width).astype(np.int32), pa.int32()))

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        outs = [per_user(sub.drop(columns=["shard"]))
                for _, sub in g.groupby("user_id", sort=True)]
        return pd.concat(outs, ignore_index=True)

    return events.map_batches(tag, batch_format="pyarrow").map_batches(
        add_shard, batch_format="pyarrow"
    ).groupby("shard", num_partitions=min(width, 64)).map_groups(
        per_shard, batch_format="pandas")


# Per-key discrete quantiles by INDEX SELECTION (no interpolation
# arithmetic, so the float values pass through bit-identically on both
# sides): p_q = sorted_values[floor((n-1) * q)].
VALUE_QUANTILES_SQL = """
WITH g AS (
  SELECT user_id, list_sort(list(value)) AS v, count(*) AS n
  FROM events GROUP BY user_id
)
SELECT user_id,
       CAST(n AS BIGINT) AS n_events,
       v[CAST(floor((n - 1) * 0.5) AS BIGINT) + 1] AS p50,
       v[CAST(floor((n - 1) * 0.9) AS BIGINT) + 1] AS p90
FROM g
"""


def value_quantiles(events: ray.data.Dataset) -> ray.data.Dataset:
    """Exact per-user p50/p90 of the event value: one hash shuffle on a
    COARSE shard of the key (user_id % width — one Ray group per user
    pays per-group dispatch at high key cardinality; see grouped_topk),
    then an in-shard vectorized lexsort + segment index selection
    (discrete quantiles — selection, not interpolation, so no float
    arithmetic can diverge from the SQL twin)."""
    cpus = cluster_cpus()
    width = max(32, cpus * 4)

    def tag(batch: pa.Table) -> pa.Table:
        keys = batch["user_id"].to_numpy(zero_copy_only=False)
        if np.issubdtype(keys.dtype, np.integer):
            shard = keys % width
        else:
            # non-numeric keys (strings, etc.): a process-stable hash —
            # pd.util.hash_array uses a FIXED default hash key, so the
            # same user_id lands on the same shard in every task
            shard = (pd.util.hash_array(keys) % width).astype(np.int64)
        return pa.Table.from_arrays(
            [batch["user_id"], batch["value"],
             pa.array(shard, pa.int64())],
            ["user_id", "value", "shard"])

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy()
        val = g["value"].to_numpy(dtype=np.float64)
        order = np.lexsort((val, uid))
        uid_s, val_s = uid[order], val[order]
        # boundary test via != (np.diff would reject string keys)
        starts = np.concatenate(
            [[0], np.flatnonzero(uid_s[1:] != uid_s[:-1]) + 1])
        n = np.diff(np.concatenate([starts, [len(uid_s)]]))
        return pd.DataFrame(
            {"user_id": uid_s[starts],
             "n_events": n.astype(np.int64),
             "p50": val_s[starts + np.floor((n - 1) * 0.5).astype(np.int64)],
             "p90": val_s[starts + np.floor((n - 1) * 0.9).astype(np.int64)]}
        )

    return events.map_batches(tag, batch_format="pyarrow").groupby(
        "shard", num_partitions=max(32, cpus)
    ).map_groups(per_shard, batch_format="pandas")


NATION_REVENUE_SQL = """
SELECT n.n_name,
       round(CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 3)
         AS revenue,
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
    broadcast_threshold: int = BROADCAST_DIM_MAX,
) -> pd.DataFrame:
    """Three-table star join.  Below the gate, both dimension hops
    (customer -> nation) compose into ONE broadcast lookup custkey ->
    nation name, so the fact table streams through a single map stage
    with partial aggregation — no shuffle at any join.  Above the gate
    the customer hop becomes a co-group hash shuffle on ``c_custkey``
    (the nation map is always tiny and stays broadcast)."""
    if customer.count() > broadcast_threshold:
        return _nation_revenue_cogroup(orders, customer, nation)
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
                           "price_c": _cents(batch["o_totalprice"])})
        df = df.dropna(subset=["n_name"])
        g = df.groupby("n_name", as_index=False).agg(
            price_c=("price_c", "sum"), num_orders=("price_c", "size"))
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = orders.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = partials.groupby("n_name", as_index=False).agg(
        price_c=("price_c", "sum"), num_orders=("num_orders", "sum"))
    out["revenue"] = round_half_away(out["price_c"] / 100.0, 3)
    out["num_orders"] = out["num_orders"].astype(np.int64)
    return out[["n_name", "revenue", "num_orders"]]


def _nation_revenue_cogroup(
    orders: ray.data.Dataset,
    customer: ray.data.Dataset,
    nation: ray.data.Dataset,
) -> pd.DataFrame:
    """Above-the-gate path: the customer hop co-groups on ``c_custkey``;
    the tiny nation map resolves nationkey -> name inside the dimension
    row mapper (broadcast once)."""
    nat = nation.select_columns(["n_nationkey", "n_name"]).to_pandas()
    name_of = dict(zip(nat["n_nationkey"], nat["n_name"]))
    nref = ray.put(name_of)

    def to_name(batch: pa.Table) -> pa.Array:
        lookup = ray.get(nref)
        return pa.array(
            [lookup.get(int(k)) for k in batch["c_nationkey"].to_pylist()],
            pa.string())

    return _cogroup_revenue_join(
        orders,
        customer.select_columns(["c_custkey", "c_nationkey"]),
        to_name,
        "n_name",
    )


SLIDING_EVENTS_SQL = """
SELECT user_id,
       time_bucket(INTERVAL 15 MINUTE, ts) - k * INTERVAL 15 MINUTE
         AS window_start,
       count(*) AS n_events,
       round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 3) AS sum_value
FROM events, unnest([0, 1, 2, 3]) AS t(k)
GROUP BY user_id, window_start
"""


def sliding_events(
    events: ray.data.Dataset, driver_max: int = WINDOW_DRIVER_COMBINE_MAX
):
    """Sliding event-time windows (1 h length, 15 min slide) via the
    explode-to-covering-windows pattern: each event is replicated into
    the 4 windows that contain it inside a vectorized ``map_batches``
    (numpy datetime arithmetic), pre-aggregated per batch (exact int64
    cents), then size-gated combine — no self-join, no range join."""
    slide = np.timedelta64(15, "m")

    def explode_partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy(zero_copy_only=False)
        bucket = ts.astype("datetime64[15m]")  # floor to the 15-minute grid
        value_c = _cents(batch["value"])
        frames = []
        for k in range(4):
            frames.append(pd.DataFrame({
                "user_id": batch["user_id"].to_numpy(zero_copy_only=False),
                "window_start": (bucket - k * slide.astype("timedelta64[15m]"))
                    .astype("datetime64[us]"),
                "value_c": value_c,
            }))
        df = pd.concat(frames, ignore_index=True)
        g = df.groupby(["user_id", "window_start"], as_index=False).agg(
            n_events=("value_c", "size"), value_c=("value_c", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = events.map_batches(explode_partial, batch_format="pyarrow",
                                  batch_size=65536)
    return _combine_window_partials(
        partials, ["user_id", "window_start"], driver_max)


# ---------------------------------------------------------------------------
# Global sort + exact rank: the one shuffle primitive the other operators
# deliberately avoid (top_orders does top-k WITHOUT a global sort).  Here
# the full range-partitioned ``Dataset.sort`` is the point: totally order
# the corpus by (n_chars DESC, doc_id) and attach the exact global row
# number.  Ray Data has no zip-with-index, so the rank attach drops to
# raw Ray tasks — the documented escape hatch for what the Dataset API
# cannot express: the sorted dataset's blocks are enumerated in order,
# per-block COUNTS (one int per block) are the only driver-side data,
# and each block gets its offset + arange rank in a per-block remote
# task, re-rooted via ``from_arrow_refs`` with zero extra copies.  The
# rank VALUES make global-sort exactness hash-verifiable even under the
# driver's order-insensitive compare.
# ---------------------------------------------------------------------------

RANKED_DOCS_SQL = """
SELECT doc_id, n_chars,
       row_number() OVER (ORDER BY n_chars DESC, doc_id) - 1 AS rank
FROM documents
"""


def ranked_docs(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Documents totally ordered by (n_chars DESC, doc_id) with their
    exact global 0-based rank."""
    from .textstats import block_prefix_offsets

    sorted_ds = ds.sort(["n_chars", "doc_id"], descending=[True, False])
    refs = sorted_ds.to_arrow_refs()
    offsets = block_prefix_offsets(refs, lambda tbl: tbl.num_rows)

    @ray.remote
    def _with_rank(tbl: pa.Table, offset: int) -> pa.Table:
        return tbl.append_column(
            "rank",
            pa.array(offset + np.arange(tbl.num_rows), pa.int64()))

    out = [_with_rank.remote(r, int(o)) for r, o in zip(refs, offsets)]
    return ray.data.from_arrow_refs(out)


# ---------------------------------------------------------------------------
# Full outer join — the join flavor the other queries deliberately avoid
# (segment_revenue: broadcast inner; inactive_customers: anti;
# asof_join: inequality).  Both sides genuinely unmatch here: the
# BUILDING-segment customer slice lacks custkeys that have orders, and
# per-custkey order counts include non-BUILDING customers.  Shape: tag
# each side with an EXPLICIT presence flag (round-2 rule: never
# null-sentinel a join — real NULLs collide), union, ONE co-group hash
# shuffle on the key, and emit exactly one output row per key with
# has_customer / has_orders marking the outer semantics.  NULL-free
# output columns (coalesce to ''/0) keep the driver's value-hash
# deterministic.  The order side is pre-aggregated per batch before the
# shuffle (counts, not rows).
# ---------------------------------------------------------------------------

OUTER_JOIN_SQL = """
SELECT coalesce(c.c_custkey, o.o_custkey) AS custkey,
       coalesce(c.c_name, '') AS c_name,
       coalesce(o.n, 0) AS order_count,
       c.c_custkey IS NOT NULL AS has_customer,
       o.o_custkey IS NOT NULL AS has_orders
FROM (SELECT c_custkey, c_name FROM customer
      WHERE c_mktsegment = 'BUILDING') c
FULL OUTER JOIN (SELECT o_custkey, count(*) AS n
                 FROM orders GROUP BY o_custkey) o
ON c.c_custkey = o.o_custkey
"""


def outer_join_orders(
    customer: ray.data.Dataset, orders: ray.data.Dataset
) -> ray.data.Dataset:
    """BUILDING-segment customers FULL OUTER JOIN per-custkey order
    counts; one row per custkey with explicit presence flags."""
    from ray.data.aggregate import Sum

    def left_rows(batch: pa.Table) -> pa.Table:
        sel = batch.filter(
            pc.equal(batch["c_mktsegment"], pa.scalar("BUILDING")))
        n = sel.num_rows
        return pa.Table.from_pydict({
            "custkey": sel["c_custkey"],
            "c_name": sel["c_name"],
            "order_count": pa.array([0] * n, pa.int64()),
            "is_left": pa.array([True] * n, pa.bool_()),
        })

    def right_partial(batch: pa.Table) -> pa.Table:
        keys, counts = np.unique(
            batch["o_custkey"].to_numpy(zero_copy_only=False),
            return_counts=True)
        return pa.Table.from_pydict(
            {"custkey": pa.array(keys, pa.int64()),
             "n": pa.array(counts, pa.int64())})

    right = orders.map_batches(
        right_partial, batch_format="pyarrow"
    ).groupby("custkey").aggregate(Sum("n", alias_name="n"))

    def right_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.Table.from_pydict({
            "custkey": batch["custkey"],
            "c_name": pa.array([""] * n, pa.string()),
            "order_count": batch["n"],
            "is_left": pa.array([False] * n, pa.bool_()),
        })

    both = customer.map_batches(left_rows, batch_format="pyarrow").union(
        right.map_batches(right_rows, batch_format="pyarrow"))

    # one Ray group PER KEY pays per-group dispatch (measured: 15k
    # single-key groups cost ~5 s of a 6 s query at sf0.1) — shuffle on
    # a coarse shard of the key instead and merge each shard's keys
    # VECTORIZED inside one task (same trick as the LSH bucket stages)
    width = max(16, cluster_cpus() * 4)

    def add_shard(batch: pa.Table) -> pa.Table:
        keys = batch["custkey"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "shard", pa.array(keys % width, pa.int64()))

    def merge_shard(group: pa.Table) -> pa.Table:
        is_left = group["is_left"].to_numpy(zero_copy_only=False)
        keys = group["custkey"].to_numpy(zero_copy_only=False)
        lkeys, lnames = keys[is_left], np.array(
            group["c_name"].to_pylist(), dtype=object)[is_left]
        rkeys = keys[~is_left]
        rcnts = group["order_count"].to_numpy(
            zero_copy_only=False)[~is_left]
        lo, ro = np.argsort(lkeys), np.argsort(rkeys)
        lkeys, lnames = lkeys[lo], lnames[lo]
        rkeys, rcnts = rkeys[ro], rcnts[ro]
        all_keys = np.union1d(lkeys, rkeys)
        has_c = np.isin(all_keys, lkeys)
        has_o = np.isin(all_keys, rkeys)
        names = np.full(len(all_keys), "", dtype=object)
        names[has_c] = lnames
        cnts = np.zeros(len(all_keys), dtype=np.int64)
        cnts[has_o] = rcnts
        return pa.Table.from_pydict({
            "custkey": pa.array(all_keys, pa.int64()),
            "c_name": pa.array(names.tolist(), pa.string()),
            "order_count": pa.array(cnts, pa.int64()),
            "has_customer": pa.array(has_c, pa.bool_()),
            "has_orders": pa.array(has_o, pa.bool_()),
        })

    return both.map_batches(add_shard, batch_format="pyarrow").groupby(
        "shard").map_groups(merge_shard, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Hot-key / skew profiler: the diagnostic every shuffle decision in this
# repo leans on (salting thresholds, bucket caps, per-key group bounds)
# as a first-class operator.  Per-batch partial counts collapse the
# event stream to (key, cnt) rows before the distinct-keys-sized
# groupby; the final top-k + global stats are computed from BOUNDED
# per-block partials (k rows + one stats row per block), never a
# driver-side collect of the full key histogram.  skew = max key count
# over the mean key count.
# ---------------------------------------------------------------------------

KEY_SKEW_K = 10

KEY_SKEW_SQL = f"""
WITH k AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id),
s AS (SELECT count(*) AS n_keys, CAST(sum(cnt) AS BIGINT) AS n_rows,
             max(cnt) AS max_cnt
      FROM k),
t AS (SELECT user_id, cnt FROM k ORDER BY cnt DESC, user_id LIMIT {KEY_SKEW_K})
SELECT t.user_id, t.cnt, s.n_keys, s.n_rows, s.max_cnt,
       s.max_cnt / (s.n_rows / CAST(s.n_keys AS DOUBLE)) AS skew
FROM t, s
"""


def key_skew(events: ray.data.Dataset, k: int = KEY_SKEW_K
             ) -> ray.data.Dataset:
    """Top-k hottest keys with global key-distribution stats."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        keys, counts = np.unique(
            batch["user_id"].to_numpy(zero_copy_only=False),
            return_counts=True)
        return pa.Table.from_pydict(
            {"user_id": pa.array(keys, pa.int64()),
             "cnt": pa.array(counts, pa.int64())})

    per_key = events.map_batches(
        partial, batch_format="pyarrow"
    ).groupby("user_id").aggregate(Sum("cnt", alias_name="cnt"))

    def block_partial(batch: pa.Table) -> pa.Table:
        ids = batch["user_id"].to_numpy(zero_copy_only=False)
        cnt = batch["cnt"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -cnt))[:k]
        return pa.Table.from_pydict({
            "user_id": pa.array(
                np.concatenate([ids[order], [-1]]), pa.int64()),
            "cnt": pa.array(np.concatenate([cnt[order], [0]]), pa.int64()),
            "n_keys": pa.array([0] * len(order) + [len(ids)], pa.int64()),
            "n_rows": pa.array(
                [0] * len(order) + [int(cnt.sum())], pa.int64()),
            "max_cnt": pa.array(
                [0] * len(order) + [int(cnt.max()) if len(cnt) else 0],
                pa.int64()),
            "is_stats": pa.array(
                [False] * len(order) + [True], pa.bool_()),
        })

    parts = per_key.map_batches(
        block_partial, batch_format="pyarrow").to_pandas()
    if "is_stats" not in parts.columns:  # zero-block collect
        return ray.data.from_arrow(pa.Table.from_pydict({
            "user_id": pa.array([], pa.int64()),
            "cnt": pa.array([], pa.int64()),
            "n_keys": pa.array([], pa.int64()),
            "n_rows": pa.array([], pa.int64()),
            "max_cnt": pa.array([], pa.int64()),
            "skew": pa.array([], pa.float64())}))
    stats = parts[parts["is_stats"]]
    n_keys = int(stats["n_keys"].sum())
    if n_keys == 0:  # schema-bearing but empty input: typed empty result,
        # mirroring the column-less zero-block branch above
        return ray.data.from_arrow(pa.Table.from_pydict({
            "user_id": pa.array([], pa.int64()),
            "cnt": pa.array([], pa.int64()),
            "n_keys": pa.array([], pa.int64()),
            "n_rows": pa.array([], pa.int64()),
            "max_cnt": pa.array([], pa.int64()),
            "skew": pa.array([], pa.float64())}))
    n_rows = int(stats["n_rows"].sum())
    max_cnt = int(stats["max_cnt"].max())
    top = parts[~parts["is_stats"]].sort_values(
        ["cnt", "user_id"], ascending=[False, True]).head(k)
    skew = max_cnt / (n_rows / float(n_keys))
    return ray.data.from_arrow(pa.Table.from_pydict({
        "user_id": pa.array(top["user_id"].to_numpy(), pa.int64()),
        "cnt": pa.array(top["cnt"].to_numpy(), pa.int64()),
        "n_keys": pa.array([n_keys] * len(top), pa.int64()),
        "n_rows": pa.array([n_rows] * len(top), pa.int64()),
        "max_cnt": pa.array([max_cnt] * len(top), pa.int64()),
        "skew": pa.array([skew] * len(top), pa.float64()),
    }))


# ---------------------------------------------------------------------------
# Grouped top-k (per-key top-n): the windowed-rank operator Ray Data has
# no native verb for (SQL: row_number() OVER (PARTITION BY key ORDER BY
# ...)).  Scale shape: per-batch partials FIRST cut each batch to <= k
# rows per key it contains (vectorized pandas sort + groupby head — no
# per-row Python), so the exchange moves at most k rows per (key, batch)
# instead of the full fact table; the final cut runs per COARSE shard
# (key % width), not per key — one Ray group per key pays per-group
# dispatch at high key cardinality (measured on the LSH buckets: 80k
# groups = 5.7 s of a 6 s stage).  Tie order is the SQL twin's total
# order: (o_totalprice DESC, o_orderkey ASC).
# ---------------------------------------------------------------------------

GROUPED_TOPK_K = 3

GROUPED_TOPK_SQL = f"""
SELECT o_custkey, rnk, o_orderkey,
       round(o_totalprice, 3) AS o_totalprice
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(row_number() OVER (PARTITION BY o_custkey
                                 ORDER BY o_totalprice DESC, o_orderkey)
              AS BIGINT) AS rnk
  FROM orders
)
WHERE rnk <= {GROUPED_TOPK_K}
"""


def grouped_topk(orders: ray.data.Dataset, k: int = GROUPED_TOPK_K
                 ) -> ray.data.Dataset:
    """Top-k orders per customer by (o_totalprice DESC, o_orderkey)."""
    cpus = cluster_cpus()
    width = max(32, cpus * 4)

    def partial(batch: pa.Table) -> pa.Table:
        df = pa.Table.from_arrays(
            [batch["o_custkey"], batch["o_orderkey"], batch["o_totalprice"]],
            ["o_custkey", "o_orderkey", "o_totalprice"],
        ).to_pandas()
        df = df.sort_values(
            ["o_custkey", "o_totalprice", "o_orderkey"],
            ascending=[True, False, True], kind="mergesort",
        ).groupby("o_custkey", sort=False).head(k)
        df["shard"] = (df["o_custkey"].to_numpy() % width).astype(np.int64)
        return pa.Table.from_pandas(df, preserve_index=False)

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["o_custkey", "o_totalprice", "o_orderkey"],
            ascending=[True, False, True], kind="mergesort",
        ).groupby("o_custkey", sort=False).head(k)
        rnk = g.groupby("o_custkey", sort=False).cumcount() + 1
        return pd.DataFrame(
            {"o_custkey": g["o_custkey"].to_numpy(),
             "rnk": rnk.to_numpy(dtype=np.int64),
             "o_orderkey": g["o_orderkey"].to_numpy(),
             "o_totalprice": round_half_away(
                 g["o_totalprice"].to_numpy(dtype=np.float64), 3)}
        )

    return orders.map_batches(partial, batch_format="pyarrow").groupby(
        "shard", num_partitions=max(32, cpus)
    ).map_groups(per_shard, batch_format="pandas")


# ---------------------------------------------------------------------------
# Per-key running totals (cumulative windowed aggregate, SQL: sum() OVER
# (PARTITION BY key ORDER BY ...) ROWS UNBOUNDED PRECEDING).  One hash
# shuffle on a coarse shard of the key, then a vectorized in-task
# per-key cumsum over exact int64 cents (associative — batch boundaries
# cannot flip the rounding; see the module docstring's determinism
# note).  Partitioning assumption: one shard's rows fit in one task —
# shards are key-hash-balanced, so only a pathologically hot single key
# would need salting + a two-level prefix-sum.
# ---------------------------------------------------------------------------

RUNNING_TOTALS_SQL = """
SELECT o_custkey, o_orderkey, o_orderdate,
       round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                  OVER (PARTITION BY o_custkey
                        ORDER BY o_orderdate, o_orderkey
                        ROWS UNBOUNDED PRECEDING) AS DOUBLE), 3)
         AS running_total
FROM orders
"""


def running_totals(orders: ray.data.Dataset) -> ray.data.Dataset:
    """Cumulative per-customer revenue in (o_orderdate, o_orderkey) order."""
    cpus = cluster_cpus()
    width = max(32, cpus * 4)

    def add_shard(batch: pa.Table) -> pa.Table:
        shard = pa.array(
            batch["o_custkey"].to_numpy(zero_copy_only=False) % width,
            pa.int64())
        return pa.Table.from_arrays(
            [batch["o_custkey"], batch["o_orderkey"], batch["o_orderdate"],
             batch["o_totalprice"], shard],
            ["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice",
             "shard"])

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["o_custkey", "o_orderdate", "o_orderkey"], kind="mergesort")
        run = (
            pd.Series(_cents(g["o_totalprice"].to_numpy()))
            .groupby(g["o_custkey"].to_numpy(), sort=False).cumsum()
            .to_numpy()
        )
        return pd.DataFrame(
            {"o_custkey": g["o_custkey"].to_numpy(),
             "o_orderkey": g["o_orderkey"].to_numpy(),
             "o_orderdate": g["o_orderdate"].to_numpy(),
             "running_total": round_half_away(run / 100.0, 3)}
        )

    def pin_types(batch: pa.Table) -> pa.Table:
        # the pandas round-trip widens timestamps to ns; pin the input's us
        idx = batch.schema.get_field_index("o_orderdate")
        return batch.set_column(
            idx, "o_orderdate",
            pc.cast(batch["o_orderdate"], pa.timestamp("us")))

    return orders.map_batches(add_shard, batch_format="pyarrow").groupby(
        "shard", num_partitions=max(32, cpus)
    ).map_groups(per_shard, batch_format="pandas").map_batches(
        pin_types, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Range (interval) join: each probe event (event_id % RANGE_JOIN_MOD == 0)
# aggregates the SAME user's events with ts in (probe.ts, probe.ts + 1h]
# — the time-window lookup Ray Data cannot express natively.  One hash
# shuffle co-locates each user's rows; the in-group kernel sorts the
# quote side once and answers every probe with two binary searches over
# the sorted timestamps plus a prefix-sum difference of exact int64
# cents (O((n+p) log n) per user, no pairwise expansion).  Probes with
# an empty window are KEPT at zero (left-join semantics) so the output
# is NULL-free.  Partitioning assumption: one user's events fit in one
# group (same documented bound as asof_join/sessionize).
# ---------------------------------------------------------------------------

RANGE_JOIN_MOD = 50

RANGE_JOIN_SQL = f"""
WITH probe AS (
  SELECT user_id, event_id, ts FROM events
  WHERE event_id % {RANGE_JOIN_MOD} = 0
)
SELECT p.user_id, p.event_id, p.ts,
       CAST(count(q.event_id) AS BIGINT) AS n_in_window,
       round(CAST(coalesce(sum(CAST(q.value AS DECIMAL(18,2))), 0)
                  AS DOUBLE), 3) AS sum_value
FROM probe p
LEFT JOIN events q
  ON q.user_id = p.user_id
 AND q.ts > p.ts AND q.ts <= p.ts + INTERVAL 1 HOUR
GROUP BY p.user_id, p.event_id, p.ts
"""


def range_join(events: ray.data.Dataset, probe_mod: int = RANGE_JOIN_MOD
               ) -> ray.data.Dataset:
    """Windowed range join: per probe event, count/sum of the same user's
    events in the following hour."""
    window = pd.Timedelta(hours=1)

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        probes = g[g["event_id"].to_numpy() % probe_mod == 0]
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        ts = g["ts"].to_numpy()
        csum = np.concatenate(
            [[0], np.cumsum(_cents(g["value"].to_numpy()))])
        lo = np.searchsorted(ts, probes["ts"].to_numpy(), side="right")
        hi = np.searchsorted(
            ts, (probes["ts"] + window).to_numpy(), side="right")
        return pd.DataFrame(
            {"user_id": probes["user_id"].to_numpy(),
             "event_id": probes["event_id"].to_numpy(),
             "ts": probes["ts"].to_numpy(),
             "n_in_window": (hi - lo).astype(np.int64),
             "sum_value": round_half_away(
                 (csum[hi] - csum[lo]) / 100.0, 3)}
        )

    def pin_types(batch: pa.Table) -> pa.Table:
        idx = batch.schema.get_field_index("ts")
        return batch.set_column(
            idx, "ts", pc.cast(batch["ts"], pa.timestamp("us")))

    cpus = cluster_cpus()
    return events.groupby(
        "user_id", num_partitions=max(32, cpus)
    ).map_groups(per_user, batch_format="pandas").map_batches(
        pin_types, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Exact GLOBAL quantiles by index selection over the range-partitioned
# sort (value_quantiles is per-key; this is the corpus-wide flavor).
# The sorted dataset's per-block COUNTS (one int per block) are the only
# driver-side data; each target index floor((n-1)*q) maps to one
# (block, local index) and a remote task fetches just that scalar —
# selection, not interpolation, so the int64 values pass through
# exactly.  At 100 TB this is one sort shuffle + blocks-many ints +
# len(qs) scalar fetches; an approximate corpus would swap the sort for
# a t-digest-style sketch, which this operator deliberately is not (the
# exact flavor is the hash-verifiable one).
# ---------------------------------------------------------------------------

GLOBAL_QUANTILES_SQL = """
WITH g AS (SELECT list_sort(list(n_chars)) AS v, count(*) AS n
           FROM documents)
SELECT CAST(n AS BIGINT) AS n_rows,
       v[CAST(floor((n - 1) * 0.25) AS BIGINT) + 1] AS p25,
       v[CAST(floor((n - 1) * 0.50) AS BIGINT) + 1] AS p50,
       v[CAST(floor((n - 1) * 0.75) AS BIGINT) + 1] AS p75,
       v[CAST(floor((n - 1) * 0.90) AS BIGINT) + 1] AS p90
FROM g
"""

GLOBAL_QUANTILES_QS = (0.25, 0.50, 0.75, 0.90)


def global_quantiles(ds: ray.data.Dataset,
                     qs: tuple = GLOBAL_QUANTILES_QS) -> ray.data.Dataset:
    """Exact global p25/p50/p75/p90 of documents.n_chars."""
    sorted_ds = ds.sort("n_chars")
    refs = sorted_ds.to_arrow_refs()

    @ray.remote
    def _count(tbl: pa.Table) -> int:
        return tbl.num_rows

    @ray.remote
    def _pick(tbl: pa.Table, idxs: list) -> list:
        col = tbl["n_chars"].to_pylist()
        return [col[i] for i in idxs]

    counts = np.asarray(ray.get([_count.remote(r) for r in refs]),
                        dtype=np.int64)
    total = int(counts.sum())
    names = ["n_rows"] + [f"p{int(q * 100)}" for q in qs]
    if total == 0:
        return ray.data.from_arrow(pa.Table.from_pydict(
            {n: pa.array([0 if n == "n_rows" else None], pa.int64())
             for n in names}))
    offs = np.concatenate([[0], np.cumsum(counts)])
    per_block: dict[int, list] = {}
    for q in qs:
        t = int(np.floor((total - 1) * q))
        b = int(np.searchsorted(offs, t, side="right") - 1)
        per_block.setdefault(b, []).append((q, t - int(offs[b])))
    futs = [(pairs, _pick.remote(refs[b], [li for _, li in pairs]))
            for b, pairs in per_block.items()]
    vals = {}
    for pairs, f in futs:
        for (q, _), v in zip(pairs, ray.get(f)):
            vals[q] = int(v)
    row = {"n_rows": total}
    row.update({f"p{int(q * 100)}": vals[q] for q in qs})
    return ray.data.from_arrow(pa.Table.from_pydict(
        {n: pa.array([row[n]], pa.int64()) for n in names}))


# ---------------------------------------------------------------------------
# Windowed DISTINCT aggregate: distinct event types per (user, hour) —
# the COUNT(DISTINCT ...) flavor the other window queries avoid.  Scale
# shape: each batch first collapses to its unique (user, hour, type)
# triples (duplicate events vanish map-side, so the exchange carries
# distinct triples, not raw events), the shuffle key is a coarse shard
# of user_id, and the per-shard kernel dedups across batches then
# counts uniques per (user, hour) vectorized — never one Ray group per
# (user, hour) pair.
# ---------------------------------------------------------------------------

HOURLY_DISTINCT_SQL = """
SELECT user_id,
       date_trunc('hour', ts) AS hour,
       CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
FROM events
GROUP BY user_id, date_trunc('hour', ts)
"""


def hourly_distinct(events: ray.data.Dataset) -> ray.data.Dataset:
    """Distinct event types per user per hour."""
    cpus = cluster_cpus()
    width = max(32, cpus * 4)

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"user_id": batch["user_id"].to_numpy(zero_copy_only=False),
             "hour": batch["ts"].to_pandas().dt.floor("h"),
             "event_type": batch["event_type"].to_pylist()}
        ).drop_duplicates()
        df["shard"] = (df["user_id"].to_numpy() % width).astype(np.int64)
        return pa.Table.from_pandas(df, preserve_index=False)

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.drop_duplicates(["user_id", "hour", "event_type"])
            .groupby(["user_id", "hour"], as_index=False)
            .agg(n_types=("event_type", "size"))
        )
        out["n_types"] = out["n_types"].astype(np.int64)
        return out

    def pin_types(batch: pa.Table) -> pa.Table:
        idx = batch.schema.get_field_index("hour")
        return batch.set_column(
            idx, "hour", pc.cast(batch["hour"], pa.timestamp("us")))

    return events.map_batches(partial, batch_format="pyarrow").groupby(
        "shard", num_partitions=max(32, cpus)
    ).map_groups(per_shard, batch_format="pandas").map_batches(
        pin_types, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Quantile bucketing (ntile flavor) on the exact global rank: documents
# ordered by (n_chars DESC, doc_id) are assigned bucket
# floor(rank * K / n) — the explicit closed form, used in BOTH engines
# rather than SQL's ntile() (whose remainder distribution differs).
# Reuses ranked_docs' sorted-block rank attach; the bucket map is one
# integer expression per row, so the only additional driver data is the
# total row count the rank attach already computes.
# ---------------------------------------------------------------------------

NTILE_BUCKETS = 10

NTILE_DOCS_SQL = f"""
WITH r AS (
  SELECT doc_id, n_chars,
         row_number() OVER (ORDER BY n_chars DESC, doc_id) - 1 AS rank,
         count(*) OVER () AS n
  FROM documents
)
SELECT doc_id, n_chars, rank,
       CAST(floor(rank * {NTILE_BUCKETS} / n) AS BIGINT) AS bucket
FROM r
"""


def ntile_docs(ds: ray.data.Dataset,
               k: int = NTILE_BUCKETS) -> ray.data.Dataset:
    """Documents with their exact global rank and k-quantile bucket."""
    ranked = ranked_docs(ds)
    total = ranked.count()

    def bucketize(batch: pa.Table) -> pa.Table:
        rank = batch["rank"].to_numpy(zero_copy_only=False)
        bucket = (rank * k // total).astype(np.int64)
        return batch.append_column("bucket", pa.array(bucket, pa.int64()))

    return ranked.map_batches(bucketize, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# ROLLUP / grouping-sets aggregate: revenue at (region, nation), per
# region, and grand total — the warehouse GROUP BY ROLLUP.  The engine
# computes ONLY the finest grain distributed (one broadcast-keyed fact
# pass with per-batch partials, exact int64 cents), then derives every
# coarser level from the finest aggregate driver-side: the finest grain
# is nation-cardinality (~25 rows), so the rollup derivation is free and
# exact — the canonical rollup plan at any scale.  Rounding happens
# per-level AFTER derivation (round-of-sum != sum-of-rounds).
# ---------------------------------------------------------------------------

ROLLUP_SEP = "\x1f"

ROLLUP_REVENUE_SQL = """
WITH base AS (
  SELECT r.r_name, n.n_name,
         CAST(o.o_totalprice AS DECIMAL(18,2)) AS p
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
)
SELECT coalesce(r_name, 'ALL') AS region,
       coalesce(n_name, 'ALL') AS nation,
       CAST(GROUPING(r_name) + GROUPING(n_name) AS BIGINT) AS lvl,
       round(CAST(sum(p) AS DOUBLE), 3) AS revenue,
       count(*) AS num_orders
FROM base GROUP BY ROLLUP(r_name, n_name)
HAVING count(*) > 0
"""
# The HAVING above drops ONLY the degenerate case: on an EMPTY base the
# () grouping set would still emit one ('ALL','ALL', NULL, 0) grand-total
# row (NULL revenue breaks the NULL-free value-hash convention and the
# engine's typed-empty contract); every real group has count >= 1, so
# the filter is a no-op on non-empty input.


def rollup_revenue(
    orders: ray.data.Dataset,
    customer: ray.data.Dataset,
    nation: ray.data.Dataset,
    region: ray.data.Dataset,
    broadcast_threshold: int = BROADCAST_DIM_MAX,
) -> pd.DataFrame:
    """GROUP BY ROLLUP(region, nation) over order revenue.

    Below the gate the three dimension hops (customer -> nation ->
    region) compose into ONE broadcast lookup custkey -> composite
    label, so the fact table streams through a single partial-aggregate
    map stage; above the gate the customer hop co-groups on
    ``c_custkey`` (``_cogroup_revenue_join`` with ``return_cents``).
    Either way only the finest grain crosses the cluster; subtotal and
    grand-total levels are derived from its exact cent sums."""
    nat = nation.select_columns(
        ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    reg = region.select_columns(["r_regionkey", "r_name"]).to_pandas()
    rname_of = dict(zip(reg["r_regionkey"], reg["r_name"]))
    label_of_nation = {
        int(nk): f"{rname_of.get(int(rk))}{ROLLUP_SEP}{nn}"
        for nk, nn, rk in zip(nat["n_nationkey"], nat["n_name"],
                              nat["n_regionkey"])
        if rname_of.get(int(rk)) is not None
    }

    if customer.count() > broadcast_threshold:
        nref = ray.put(label_of_nation)

        def to_label(batch: pa.Table) -> pa.Array:
            lookup = ray.get(nref)
            return pa.array(
                [lookup.get(int(k))
                 for k in batch["c_nationkey"].to_pylist()],
                pa.string())

        finest = _cogroup_revenue_join(
            orders,
            customer.select_columns(["c_custkey", "c_nationkey"]),
            to_label, "label", return_cents=True)
    else:
        cust = customer.select_columns(
            ["c_custkey", "c_nationkey"]).to_pandas()
        label_of_cust = {
            int(ck): label_of_nation.get(int(nk))
            for ck, nk in zip(cust["c_custkey"], cust["c_nationkey"])
        }
        ref = ray.put(label_of_cust)

        # same broadcast-partial shape as nation_revenue's map stage
        # (composite region|nation label here vs bare nation there) —
        # keep the two in sync on dropna / cents handling
        def partial(batch: pa.Table) -> pa.Table:
            lookup = ray.get(ref)
            label = batch["o_custkey"].to_pandas().map(lookup)
            df = pd.DataFrame({"label": label,
                               "price_c": _cents(batch["o_totalprice"])})
            df = df.dropna(subset=["label"])
            g = df.groupby("label", as_index=False).agg(
                price_c=("price_c", "sum"), num_orders=("price_c", "size"))
            return pa.Table.from_pandas(g, preserve_index=False)

        partials = orders.map_batches(
            partial, batch_format="pyarrow").to_pandas()
        if partials.empty:
            finest = pd.DataFrame({"label": pd.Series(dtype="object"),
                                   "price_c": pd.Series(dtype="int64"),
                                   "num_orders": pd.Series(dtype="int64")})
        else:
            finest = partials.groupby("label", as_index=False).agg(
                price_c=("price_c", "sum"), num_orders=("num_orders", "sum"))

    # --- driver-side rollup derivation over the nation-sized finest grain
    if finest.empty:
        return pd.DataFrame({"region": pd.Series(dtype="object"),
                             "nation": pd.Series(dtype="object"),
                             "lvl": pd.Series(dtype="int64"),
                             "revenue": pd.Series(dtype="float64"),
                             "num_orders": pd.Series(dtype="int64")})
    split = finest["label"].str.split(ROLLUP_SEP, n=1, expand=True)
    fine = pd.DataFrame({"region": split[0], "nation": split[1],
                         "price_c": finest["price_c"].astype(np.int64),
                         "num_orders": finest["num_orders"].astype(np.int64)})
    by_region = fine.groupby("region", as_index=False).agg(
        price_c=("price_c", "sum"), num_orders=("num_orders", "sum"))
    by_region["nation"] = "ALL"
    total = pd.DataFrame({"region": ["ALL"], "nation": ["ALL"],
                          "price_c": [fine["price_c"].sum()],
                          "num_orders": [fine["num_orders"].sum()]})
    fine["lvl"], by_region["lvl"], total["lvl"] = 0, 1, 2
    out = pd.concat([fine, by_region, total], ignore_index=True)
    out["lvl"] = out["lvl"].astype(np.int64)
    out["revenue"] = round_half_away(out["price_c"].astype(np.float64)
                                     / 100.0, 3)
    out["num_orders"] = out["num_orders"].astype(np.int64)
    return out[["region", "nation", "lvl", "revenue", "num_orders"]]


# ---------------------------------------------------------------------------
# Grouped exact quantile: per-user p90 of event values by INDEX
# SELECTION (v_sorted[floor((n-1)*0.9)]) — no interpolation arithmetic,
# so the selected value is bit-exact on both sides (the value_quantiles
# contract, per group).  One coarse-shard exchange on user_id % width;
# inside a shard the per-user selection is one lexsort + vectorized
# run-boundary indexing — never one Ray group per user.
# ---------------------------------------------------------------------------

USER_P90_Q = 0.9

USER_P90_SQL = f"""
SELECT user_id, count(*) AS n_events,
       (list(value ORDER BY value))
         [CAST(1 + floor((count(*) - 1) * {USER_P90_Q}) AS BIGINT)] AS p90
FROM events GROUP BY user_id
"""


def user_p90(events: ray.data.Dataset,
             q: float = USER_P90_Q) -> ray.data.Dataset:
    """(user_id, n_events, p90) — exact per-group index-selection
    quantile over ``events.value``."""
    width = max(32, cluster_cpus() * 4)

    def shard(batch: pa.Table) -> pa.Table:
        users = batch["user_id"].to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {"user_id": batch["user_id"], "value": batch["value"],
             "shard": pa.array((users % width).astype(np.int32),
                               pa.int32())})

    def per_shard(group: pa.Table) -> pa.Table:
        g = group.combine_chunks()
        users = g["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        vals = g["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        order = np.lexsort((vals, users))
        users, vals = users[order], vals[order]
        uniq, start, cnt = np.unique(users, return_index=True,
                                     return_counts=True)
        sel = start + np.floor((cnt - 1) * q).astype(np.int64)
        return pa.Table.from_pydict(
            {"user_id": pa.array(uniq, pa.int64()),
             "n_events": pa.array(cnt.astype(np.int64), pa.int64()),
             "p90": pa.array(vals[sel], pa.float64())})

    sharded = events.select_columns(["user_id", "value"]).map_batches(
        shard, batch_format="pyarrow")
    return sharded.groupby("shard", num_partitions=min(width, 64)).map_groups(
        per_shard, batch_format="pyarrow")
