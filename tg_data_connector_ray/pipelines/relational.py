"""Relational operator demos over the TPC-H-ish test tables — the breadth
the reference lacks entirely (SURVEY.md §2.5: no joins/aggregates/sort in
the reference; these are built directly on Ray Data primitives).

Scale idioms demonstrated (and used by __ray_entry__ / bench):
- column pruning at the read (`columns=[...]`);
- pre-aggregation inside map_batches before the groupby shuffle (the
  combiner pattern: the shuffle moves one row per key per batch);
- broadcast join for small dimension tables (ray.put once, per-batch merge
  — no shuffle);
- explicit partitioned hash join for large-large joins (bucket column +
  single groupby + per-bucket pandas merge);
- sort/top-k via sort+limit.
"""

from __future__ import annotations

import os
from functools import partial

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data


def _t(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


# ---------------------------------------------------------------------------
# Q1-style pricing summary with the combiner pattern


def _round2_from_micro(s):
    """Exact 2dp rounding of integer micro-unit sums (half away from zero),
    done in integer space so no float-representation half-case can make
    engines disagree."""
    import numpy as np

    s = np.asarray(s, dtype=np.int64)
    return np.where(s >= 0, (s + 5000) // 10000, -((-s + 5000) // 10000)) / 100.0


def q1_pricing_summary(sf_dir: str, cutoff: str = "1998-09-01"):
    ds = ray.data.read_parquet(
        _t(sf_dir, "lineitem"),
        columns=[
            "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
            "l_discount", "l_tax", "l_shipdate",
        ],
    )
    cutoff_ts = pa.scalar(np.datetime64(cutoff, "us"), type=pa.timestamp("us"))

    def partial_agg(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"], cutoff_ts))
        df = t.to_pandas()
        # sums in integer micro-units: exact, summation-order-independent,
        # and bit-identical to any SQL oracle using the same integerization
        df["disc_price"] = np.round(
            df["l_extendedprice"] * (1 - df["l_discount"]) * 1e6
        ).astype("int64")
        df["charge"] = np.round(
            df["l_extendedprice"] * (1 - df["l_discount"]) * (1 + df["l_tax"]) * 1e6
        ).astype("int64")
        df["qty_u"] = np.round(df["l_quantity"] * 1e6).astype("int64")
        df["price_u"] = np.round(df["l_extendedprice"] * 1e6).astype("int64")
        df["disc_u"] = np.round(df["l_discount"] * 1e6).astype("int64")
        g = df.groupby(["l_returnflag", "l_linestatus"], sort=False).agg(
            sum_qty=("qty_u", "sum"),
            sum_base_price=("price_u", "sum"),
            sum_disc_price=("disc_price", "sum"),
            sum_charge=("charge", "sum"),
            sum_disc=("disc_u", "sum"),
            count_order=("qty_u", "size"),
        ).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = ds.map_batches(partial_agg, batch_format="pyarrow", zero_copy_batch=True)
    from ray.data.aggregate import Sum

    out = partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("sum_qty", alias_name="sum_qty"),
        Sum("sum_base_price", alias_name="sum_base_price"),
        Sum("sum_disc_price", alias_name="sum_disc_price"),
        Sum("sum_charge", alias_name="sum_charge"),
        Sum("sum_disc", alias_name="sum_disc"),
        Sum("count_order", alias_name="count_order"),
    )
    df = out.to_pandas()
    df["avg_qty"] = (df["sum_qty"] / 1e6 / df["count_order"]).round(2)
    df["avg_price"] = (df["sum_base_price"] / 1e6 / df["count_order"]).round(2)
    df["avg_disc"] = (df["sum_disc"] / 1e6 / df["count_order"]).round(2)
    for c in ("sum_qty", "sum_base_price", "sum_disc_price", "sum_charge"):
        df[c] = _round2_from_micro(df[c])
    df = df.drop(columns=["sum_disc"])
    return df.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# broadcast join (small dimension side)

def revenue_by_mktsegment(sf_dir: str):
    """orders JOIN customer (broadcast) -> sum(o_totalprice) per segment."""
    import pyarrow.parquet as pq

    cust = pq.read_table(_t(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"])
    seg_by_key = ray.put(
        dict(zip(cust["c_custkey"].to_pylist(), cust["c_mktsegment"].to_pylist()))
    )
    orders = ray.data.read_parquet(
        _t(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"]
    )

    def attach(t: pa.Table) -> pa.Table:
        m = ray.get(seg_by_key)
        segs = pd.Series(t["o_custkey"].to_pylist()).map(m)
        df = pd.DataFrame(
            {
                "c_mktsegment": segs,
                "rev_u": np.round(
                    np.asarray(t["o_totalprice"].to_pylist()) * 1e6
                ).astype("int64"),
            }
        )
        g = df.groupby("c_mktsegment", sort=False)["rev_u"].agg(["sum", "size"]).reset_index()
        g.columns = ["c_mktsegment", "revenue", "n_orders"]
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    out = (
        orders.map_batches(attach, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("c_mktsegment")
        .aggregate(Sum("revenue", alias_name="revenue"), Sum("n_orders", alias_name="n_orders"))
    )
    df = out.to_pandas().sort_values("c_mktsegment").reset_index(drop=True)
    df["revenue"] = _round2_from_micro(df["revenue"])
    return df


# ---------------------------------------------------------------------------
# explicit partitioned hash join (both sides large)

def hash_join(left, right, on: str, num_buckets: int = 16, how: str = "inner"):
    """Bucketed hash join of two Datasets on an int64 key.

    Both sides get `bucket = key % B` and a side tag, union into ONE
    dataset so a single groupby(bucket) co-locates matching buckets; the
    per-bucket pandas merge runs in parallel tasks.  Skewed keys: salt by
    raising B or pre-splitting the hot key (documented, not automatic).
    """

    if num_buckets & (num_buckets - 1):
        raise ValueError("num_buckets must be a power of two")

    def tag(side: str):
        def _f(t: pa.Table) -> pa.Table:
            b = pc.cast(
                pc.bit_wise_and(pc.cast(t[on], pa.int64()), num_buckets - 1), pa.int32()
            )
            t = t.append_column("_bucket", b)
            return t.append_column("_side", pa.array([side] * t.num_rows))

        return _f

    # sides have different schemas; the union null-fills the other side's
    # columns, so each bucket join must re-project its own column set
    left_cols = list(left.columns())
    right_cols = list(right.columns())
    tagged = left.map_batches(tag("l"), batch_format="pyarrow").union(
        right.map_batches(tag("r"), batch_format="pyarrow")
    )

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        l = g.loc[g["_side"] == "l", left_cols]
        r = g.loc[g["_side"] == "r", right_cols]
        return l.merge(r, on=on, how=how)

    return tagged.groupby("_bucket").map_groups(join_bucket, batch_format="pandas")


def top_orders_by_revenue(sf_dir: str, k: int = 10):
    """lineitem JOIN orders (partitioned hash join) -> top-k orders by
    summed line revenue."""
    li = ray.data.read_parquet(
        _t(sf_dir, "lineitem"), columns=["l_orderkey", "l_extendedprice", "l_discount"]
    )

    def rev(t: pa.Table) -> pa.Table:
        r = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        r_u = pc.cast(pc.round(pc.multiply(r, pa.scalar(1e6))), pa.int64())
        out = pa.table({"o_orderkey": t["l_orderkey"], "rev": r_u})
        df = out.to_pandas().groupby("o_orderkey", sort=False)["rev"].sum().reset_index()
        return pa.Table.from_pandas(df, preserve_index=False)

    from ray.data.aggregate import Sum

    li_rev = (
        li.map_batches(rev, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("o_orderkey")
        .aggregate(Sum("rev", alias_name="revenue"))
    )
    orders = ray.data.read_parquet(
        _t(sf_dir, "orders"), columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )
    # prefer Ray's native hash-partitioned join when this version ships it
    # (2.49 does; ~2x faster than the portable bucketed pattern here);
    # hash_join() remains the explicit, version-independent fallback
    if hasattr(li_rev, "join"):
        joined = li_rev.join(
            orders, join_type="inner", num_partitions=16, on=("o_orderkey",)
        )
    else:
        joined = hash_join(li_rev, orders, on="o_orderkey", num_buckets=16)
    top = joined.sort("revenue", descending=True).limit(k)
    df = top.to_pandas()
    df = df.sort_values(["revenue", "o_orderkey"], ascending=[False, True]).reset_index(drop=True)
    df["revenue"] = _round2_from_micro(df["revenue"])
    return df


# ---------------------------------------------------------------------------
# sort / distinct / window

def top_customers_by_balance(sf_dir: str, k: int = 10):
    ds = ray.data.read_parquet(
        _t(sf_dir, "customer"), columns=["c_custkey", "c_name", "c_acctbal"]
    )
    return ds.sort("c_acctbal", descending=True).limit(k).to_pandas()


def distinct_event_types(sf_dir: str):
    ds = ray.data.read_parquet(_t(sf_dir, "events"), columns=["event_type"])
    vals = sorted(ds.unique("event_type"))
    return pa.table({"event_type": pa.array(vals, pa.string())})


def events_hourly_window(sf_dir: str):
    """Tumbling 1h event-time window: count + sum(value) per (event_type,
    hour) — the stream-shaped workload as partition-and-window batch."""
    ds = ray.data.read_parquet(_t(sf_dir, "events"), columns=["event_type", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(t["ts"], unit="hour")
        df = pd.DataFrame(
            {
                "event_type": t["event_type"].to_pylist(),
                "hour": hour.to_pandas(),
                "value": np.round(
                    np.asarray(t["value"].to_pylist()) * 1e6
                ).astype("int64"),
            }
        )
        g = df.groupby(["event_type", "hour"], sort=False)["value"].agg(["size", "sum"]).reset_index()
        g.columns = ["event_type", "hour", "n", "sum_value"]
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "hour"])
        .aggregate(Sum("n", alias_name="n"), Sum("sum_value", alias_name="sum_value"))
    )
    df = out.to_pandas().sort_values(["event_type", "hour"]).reset_index(drop=True)
    df["sum_value"] = _round2_from_micro(df["sum_value"])
    return df


def cdc_merge_events(sf_dir: str):
    """CDC-flavored upsert over the generic `events` table: final state per
    (user_id, event_type) = the row with max event_id (event_id as LSN) —
    the generic last-writer-wins merge, SQL-checkable with a window oracle."""
    ds = ray.data.read_parquet(
        _t(sf_dir, "events"), columns=["event_id", "user_id", "event_type", "value", "ts"]
    )

    def last_per_key(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values("event_id").tail(1)

    out = ds.groupby(["user_id", "event_type"]).map_groups(
        last_per_key, batch_format="pandas"
    )
    return (
        out.to_pandas()
        .sort_values(["user_id", "event_type"])
        .reset_index(drop=True)[["user_id", "event_type", "event_id", "value", "ts"]]
    )


def events_sessionize(sf_dir: str, gap_minutes: int = 30):
    """Session windows per user (gap > `gap_minutes` opens a new session):
    the stream-shaped workload Ray Data lacks natively, expressed as
    partition-by-key + ordered windowing inside map_groups (ordering
    established by the in-group sort, not arrival order)."""
    ds = ray.data.read_parquet(
        _t(sf_dir, "events"), columns=["user_id", "ts", "value"]
    )
    gap = np.timedelta64(gap_minutes * 60, "s")

    def sessionize(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts", kind="mergesort")
        new_sess = (g["ts"].diff() > gap) | g["ts"].diff().isna()
        g["sess_id"] = new_sess.cumsum().astype("int64")
        out = (
            g.groupby("sess_id", sort=True)
            .agg(
                user_id=("user_id", "first"),
                n_events=("ts", "size"),
                sess_start=("ts", "min"),
                sess_end=("ts", "max"),
                sum_value=("value", "sum"),
            )
            .reset_index()
        )
        out["sum_value"] = out["sum_value"].round(2)
        return out[["user_id", "sess_id", "n_events", "sess_start", "sess_end", "sum_value"]]

    out = ds.groupby("user_id").map_groups(sessionize, batch_format="pandas")
    return (
        out.to_pandas()
        .sort_values(["user_id", "sess_id"])
        .reset_index(drop=True)
    )
