"""Relational pipeline demos vs DuckDB oracles at sf0.001."""

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


def ddb(sql):
    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "events"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con.sql(sql).df()


def test_q1_matches_duckdb():
    from tg_data_connector_ray.pipelines.relational import q1_pricing_summary

    got = q1_pricing_summary(SF)
    exp = ddb(
        """
        SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
               sum(l_extendedprice) AS sum_base_price,
               sum(l_extendedprice*(1-l_discount)) AS sum_disc_price,
               sum(l_extendedprice*(1-l_discount)*(1+l_tax)) AS sum_charge,
               count(*) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        GROUP BY 1, 2 ORDER BY 1, 2
        """
    )
    assert got[["l_returnflag", "l_linestatus"]].values.tolist() == exp[
        ["l_returnflag", "l_linestatus"]
    ].values.tolist()
    for c in ("sum_qty", "sum_base_price", "sum_disc_price", "sum_charge"):
        assert np.allclose(got[c].to_numpy(), exp[c].to_numpy())
    assert got["count_order"].tolist() == exp["count_order"].tolist()


def test_broadcast_join_matches_duckdb():
    from tg_data_connector_ray.pipelines.relational import revenue_by_mktsegment

    got = revenue_by_mktsegment(SF)
    exp = ddb(
        """
        SELECT c_mktsegment, sum(o_totalprice) AS revenue, count(*) AS n_orders
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1 ORDER BY 1
        """
    )
    assert got["c_mktsegment"].tolist() == exp["c_mktsegment"].tolist()
    assert np.allclose(got["revenue"].to_numpy(), exp["revenue"].to_numpy())
    assert got["n_orders"].tolist() == exp["n_orders"].tolist()


def test_hash_join_topk_matches_duckdb():
    from tg_data_connector_ray.pipelines.relational import top_orders_by_revenue

    got = top_orders_by_revenue(SF, k=10)
    exp = ddb(
        """
        SELECT o_orderkey, sum(l_extendedprice*(1-l_discount)) AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1 ORDER BY revenue DESC, o_orderkey LIMIT 10
        """
    )
    assert got["o_orderkey"].tolist() == exp["o_orderkey"].tolist()
    assert np.allclose(got["revenue"].to_numpy(), exp["revenue"].to_numpy())


def test_sort_topk_and_distinct():
    from tg_data_connector_ray.pipelines.relational import (
        distinct_event_types,
        top_customers_by_balance,
    )

    got = top_customers_by_balance(SF, k=5)
    exp = ddb("SELECT c_custkey, c_name, c_acctbal FROM customer ORDER BY c_acctbal DESC LIMIT 5")
    assert got["c_custkey"].tolist() == exp["c_custkey"].tolist()
    t = distinct_event_types(SF)
    exp2 = ddb("SELECT DISTINCT event_type FROM events ORDER BY 1")
    assert t["event_type"].to_pylist() == exp2["event_type"].tolist()


def test_window_and_cdc_merge_events():
    from tg_data_connector_ray.pipelines.relational import cdc_merge_events, events_hourly_window

    got = events_hourly_window(SF)
    exp = ddb(
        """
        SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS n,
               sum(value) AS sum_value
        FROM events GROUP BY 1, 2 ORDER BY 1, 2
        """
    )
    assert len(got) == len(exp)
    assert np.allclose(got["sum_value"].to_numpy(), exp["sum_value"].to_numpy())
    assert got["n"].tolist() == exp["n"].tolist()

    m = cdc_merge_events(SF)
    exp2 = ddb(
        """
        SELECT user_id, event_type, event_id, value, ts FROM (
          SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                       ORDER BY event_id DESC) AS rn
          FROM events) WHERE rn = 1 ORDER BY user_id, event_type
        """
    )
    assert m["event_id"].tolist() == exp2["event_id"].tolist()
    assert np.allclose(m["value"].to_numpy(), exp2["value"].to_numpy())


def test_explicit_bucketed_hash_join_matches_native():
    """The portable bucketed hash_join pattern itself (used when
    Dataset.join is unavailable) must agree with DuckDB."""
    import ray.data as rd

    from tg_data_connector_ray.pipelines.relational import hash_join

    orders = rd.read_parquet(f"{SF}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    lineitem = rd.read_parquet(f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_quantity"])
    li = lineitem.map_batches(
        lambda t: t.rename_columns(["o_orderkey", "l_quantity"]), batch_format="pyarrow"
    )
    joined = hash_join(li, orders, on="o_orderkey", num_buckets=8)
    got = joined.to_pandas().groupby("o_custkey")["l_quantity"].sum().sort_index()
    exp = ddb(
        """
        SELECT o_custkey, sum(l_quantity) AS q FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey GROUP BY 1 ORDER BY 1
        """
    ).set_index("o_custkey")["q"]
    assert np.allclose(got.to_numpy(), exp.to_numpy())


def test_events_sessionize_matches_duckdb():
    from tg_data_connector_ray.pipelines.relational import events_sessionize

    got = events_sessionize(SF)
    exp = ddb(
        """
        WITH gaps AS (
          SELECT user_id, ts, value,
                 CASE WHEN lag(ts) OVER w IS NULL
                      OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                      THEN 1 ELSE 0 END AS new_sess
          FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ), sess AS (
          SELECT user_id, ts, value,
                 sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                     ROWS UNBOUNDED PRECEDING) AS sess_id
          FROM gaps
        )
        SELECT user_id, sess_id, count(*) AS n_events,
               min(ts) AS sess_start, max(ts) AS sess_end,
               round(sum(value), 2) AS sum_value
        FROM sess GROUP BY 1, 2 ORDER BY 1, 2
        """
    )
    assert got["n_events"].tolist() == exp["n_events"].tolist()
    assert got["sess_start"].tolist() == exp["sess_start"].tolist()
    assert np.allclose(got["sum_value"].to_numpy(), exp["sum_value"].to_numpy())


def test_asof_join_directions():
    """Generic as-of join: backward (latest <=) and forward (earliest >=),
    with keys that have no match on the right side."""
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from tg_data_connector_ray.pipelines.relational import asof_join

    left = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 1, 2, 3], pa.int64()),
                "t": pa.array([10, 25, 10, 10], pa.int64()),
                "lv": pa.array(["a", "b", "c", "d"]),
            }
        )
    )
    right = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 1, 2], pa.int64()),
                "rt": pa.array([5, 20, 30], pa.int64()),
                "rv": pa.array(["x", "y", "z"]),
            }
        )
    )
    back = (
        asof_join(left, right, on="k", left_time="t", right_time="rt")
        .to_pandas()
        .sort_values(["k", "t"])
        .reset_index(drop=True)
    )
    assert [x if isinstance(x, str) else None for x in back["rv"]] == ["x", "y", None, None]  # k=2: rt=30 > 10; k=3: no right rows
    fwd = (
        asof_join(left, right, on="k", left_time="t", right_time="rt", direction="forward")
        .to_pandas()
        .sort_values(["k", "t"])
        .reset_index(drop=True)
    )
    assert [x if isinstance(x, str) else None for x in fwd["rv"]] == ["y", None, "z", None]

    with pytest.raises(ValueError, match="overlapping"):
        asof_join(left, left, on="k", left_time="t")


def test_hopping_window_covers_each_event_twice():
    from tg_data_connector_ray.pipelines.relational import events_hopping_window

    df = events_hopping_window(SF)
    import duckdb

    n_events = duckdb.sql(f"SELECT count(*) FROM '{SF}/events.parquet'").fetchone()[0]
    assert df["n"].sum() == 2 * n_events  # every event in exactly 2 windows


def test_value_band_join_partitions_all_rows():
    from tg_data_connector_ray.pipelines.relational import events_value_band_join

    df = events_value_band_join(SF)
    import duckdb

    n_events = duckdb.sql(f"SELECT count(*) FROM '{SF}/events.parquet'").fetchone()[0]
    assert df["n"].sum() == n_events
    assert df["band_id"].between(0, 9).all()


def test_late_events_watermark():
    """Watermark/late-data semantics: under the simulated reordered WAL
    tail, flagged events are exactly those behind the running max event
    time by more than the lateness budget."""
    from tg_data_connector_ray.pipelines.relational import late_events

    df = late_events(SF, lateness_minutes=30)
    import duckdb

    exp = duckdb.sql(
        f"""SELECT count(*) FROM (
          SELECT ts, max(ts) OVER (ORDER BY (event_id//100)*100 + 99 - event_id%100
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm
          FROM '{SF}/events.parquet') t
        WHERE wm IS NOT NULL AND ts < wm - INTERVAL 30 MINUTE"""
    ).fetchone()[0]
    assert len(df) == exp
    # tiny lateness budget flags strictly more
    assert len(late_events(SF, lateness_minutes=1)) >= len(df)


def test_grouped_arrow_aggregate_parity_random():
    """Coarse-bucket aggregate == pandas groupby on random inputs: int64,
    string, and timestamp first-keys (the three tag paths), composite
    keys, sum/min/count aggs, and n_coarse larger than the key space."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from tg_data_connector_ray.pipelines.relational import (
        distinct_rows,
        grouped_arrow_aggregate,
    )

    rng = np.random.default_rng(42)
    n = 20_000
    df = pd.DataFrame(
        {
            "ik": rng.integers(-50, 2**62, size=n) * rng.integers(1, 3, size=n),
            "sk": pd.Series(rng.integers(0, 300, size=n)).map("key{}".format),
            "tk": pd.to_datetime(
                rng.integers(0, 1000, size=n) * 3_600_000_000, unit="us"
            ),
            "v": rng.integers(-(2**40), 2**40, size=n),
        }
    )
    ds = rd.from_pandas(df).repartition(7)

    # int64 key, sum+min
    got = (
        grouped_arrow_aggregate(ds, "ik", [("v", "sum"), ("v", "min")],
                                out_names=["s", "m"])
        .to_pandas()
        .sort_values("ik")
        .reset_index(drop=True)
    )
    exp = (
        df.groupby("ik", as_index=False)
        .agg(s=("v", "sum"), m=("v", "min"))
        .sort_values("ik")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    # composite (timestamp, string) key — hash on the temporal column
    got2 = (
        grouped_arrow_aggregate(ds, ["tk", "sk"], [("v", "count"), ("v", "sum")],
                                out_names=["n", "s"], n_coarse=256)
        .to_pandas()
        .sort_values(["tk", "sk"])
        .reset_index(drop=True)
    )
    exp2 = (
        df.groupby(["tk", "sk"], as_index=False)
        .agg(n=("v", "count"), s=("v", "sum"))
        .sort_values(["tk", "sk"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got2, exp2, check_dtype=False)

    # distinct over string key; n_coarse >> distinct values
    got3 = sorted(distinct_rows(ds, "sk", n_coarse=1024).to_pandas()["sk"])
    assert got3 == sorted(df["sk"].unique())


def test_revenue_by_nation_matches_duckdb(ray_session):
    import duckdb

    from tg_data_connector_ray.pipelines.relational import revenue_by_nation

    sf = "/root/testdata/sf0.001"
    got = revenue_by_nation(sf).reset_index(drop=True)
    exp = duckdb.sql(
        f"""
        SELECT n.n_name,
               CAST(sum(CAST(round_even(l_extendedprice*(1-l_discount)*1e6, 0)
                    AS BIGINT)) AS BIGINT) AS revenue_u,
               CAST(count(*) AS BIGINT) AS n_items
        FROM '{sf}/lineitem.parquet' l
        JOIN '{sf}/orders.parquet' o ON l.l_orderkey = o.o_orderkey
        JOIN '{sf}/customer.parquet' c ON o.o_custkey = c.c_custkey
        JOIN '{sf}/nation.parquet' n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name ORDER BY n.n_name
        """
    ).df()
    assert got.equals(exp.reset_index(drop=True))


def test_anti_join_and_rolling_window(ray_session):
    import duckdb

    from tg_data_connector_ray.pipelines.relational import (
        events_rolling_sum,
        orders_without_lineitems,
    )

    sf = "/root/testdata/sf0.001"
    got = (
        orders_without_lineitems(sf)
        .to_pandas()
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    exp = duckdb.sql(
        f"""SELECT o_orderkey, CAST(round_even(o_totalprice*1e6, 0) AS BIGINT) AS total_u
            FROM '{sf}/orders.parquet' o
            WHERE NOT EXISTS (SELECT 1 FROM '{sf}/lineitem.parquet' l
                              WHERE l.l_orderkey = o.o_orderkey)
            ORDER BY o_orderkey"""
    ).df()
    assert got["o_orderkey"].tolist() == exp["o_orderkey"].tolist()
    assert got["total_u"].tolist() == exp["total_u"].tolist()

    roll = (
        events_rolling_sum(sf, window=3)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    exp_r = duckdb.sql(
        f"""WITH e AS (SELECT event_id, user_id, ts,
                        CAST(round_even(value*1e6, 0) AS BIGINT) AS vu
                 FROM '{sf}/events.parquet')
            SELECT event_id,
                   CAST(sum(vu) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS roll_u
            FROM e ORDER BY event_id"""
    ).df()
    assert roll["roll_u"].tolist() == exp_r["roll_u"].tolist()


def test_hash_join_right_unique_fast_path_equals_pandas_path(ray_session):
    import pyarrow as pa
    import ray.data

    from tg_data_connector_ray.pipelines.relational import hash_join

    left = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 2, 2, 3, 9], pa.int64()),
                "x": pa.array([10, 20, 21, 30, 90], pa.int64()),
            }
        )
    )
    right = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 2, 3, 4], pa.int64()), "y": pa.array([5, 6, 7, 8], pa.int64())})
    )

    def canon(ds):
        return (
            ds.to_pandas().sort_values(["k", "x"]).reset_index(drop=True)[["k", "x", "y"]]
        )

    slow = canon(hash_join(left, right, on="k", how="inner"))
    fast = canon(hash_join(left, right, on="k", how="inner", right_unique=True))
    assert fast.equals(slow)
    assert fast["k"].tolist() == [1, 2, 2, 3]  # key 9 unmatched, dup key 2 kept


def test_q3_and_label_centroids_empty_edges(tmp_path, ray_session):
    """Parameter-triggered empty paths return typed empties instead of
    crashing on grouped_arrow_aggregate's zero-schema output or
    _emb_matrix's empty reshape."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tg_data_connector_ray.pipelines.relational import (
        label_centroids,
        q3_shipping_priority,
    )

    # q3 with a cutoff past every shipdate: no revenue rows anywhere
    out = q3_shipping_priority("/root/testdata/sf0.001", cutoff="2099-01-01")
    assert out.num_rows == 0
    assert out.schema.field("o_orderdate").type == pa.timestamp("us")

    # empty embeddings table
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([], pa.int64()),
                "embedding": pa.array([], pa.list_(pa.float32())),
                "label": pa.array([], pa.int32()),
            }
        ),
        str(tmp_path / "embeddings.parquet"),
    )
    cent = label_centroids(str(tmp_path))
    assert cent.num_rows == 0 and cent.column_names == ["label", "dim", "sum_u", "n"]


def test_splitmix_buckets_balance_stride_aligned_keys(ray_session):
    """Raw low-bit bucketing collapses stride-aligned keys into one bucket;
    the splitmix64 mix must spread them near-uniformly (the round-4 verdict
    hash_join hazard)."""
    import numpy as np
    import pyarrow as pa

    from tg_data_connector_ray.pipelines.relational import _splitmix_buckets

    for stride, b in ((2, 16), (4096, 16), (3_600_000_000, 64)):
        keys = pa.array(np.arange(10_000, dtype=np.int64) * stride)
        buckets = _splitmix_buckets(keys, b).to_numpy(zero_copy_only=False)
        counts = np.bincount(buckets, minlength=b)
        assert (counts > 0).all(), f"stride {stride}: empty buckets"
        assert counts.max() < 2.0 * counts.mean(), (
            f"stride {stride}: max {counts.max()} vs mean {counts.mean()}"
        )
    # raw masking (the old behavior) on an even-only stride hits <= half
    # the buckets — the property above is what the mix buys
    raw = (np.arange(10_000, dtype=np.int64) * 2) & 15
    assert len(np.unique(raw)) <= 8


def test_derive_num_buckets_from_bytes_hint():
    from tg_data_connector_ray.pipelines.relational import (
        _TARGET_BUCKET_BYTES,
        _derive_num_buckets,
    )

    assert _derive_num_buckets(None) == 16
    assert _derive_num_buckets(0) == 16
    assert _derive_num_buckets(1) == 16
    assert _derive_num_buckets(_TARGET_BUCKET_BYTES * 100) == 128
    assert _derive_num_buckets(1 << 60) == 1 << 16  # clamped


def test_broadcast_bound_fallbacks_match_broadcast_path(ray_session):
    """Forcing max_broadcast_bytes=1 must flip revenue_by_mktsegment /
    revenue_by_nation / q3 onto their distributed hash_join fallbacks and
    produce identical results (round-4 verdict ask #1)."""
    from tg_data_connector_ray.pipelines.relational import (
        q3_shipping_priority,
        revenue_by_mktsegment,
        revenue_by_nation,
    )

    seg_b = revenue_by_mktsegment(SF)
    seg_d = revenue_by_mktsegment(SF, max_broadcast_bytes=1)
    assert seg_d.equals(seg_b)

    nat_b = revenue_by_nation(SF)
    nat_d = revenue_by_nation(SF, max_broadcast_bytes=1)
    assert nat_d.equals(nat_b)

    q3_b = q3_shipping_priority(SF)
    q3_d = q3_shipping_priority(SF, max_broadcast_bytes=1)
    assert q3_d.equals(q3_b)


def test_hash_join_full_outer_matches_duckdb(ray_session):
    """Full outer join in the bucketed hash_join: matched rows join,
    unmatched-left rows carry null right payload, unmatched-right rows
    carry null left payload with the key coalesced from the right, and
    null keys never match but survive from BOTH sides (SQL FULL OUTER
    semantics)."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data

    from tg_data_connector_ray.pipelines.relational import hash_join

    rng = np.random.default_rng(7)
    lk = rng.integers(0, 40, 200).astype("int64").tolist() + [None, None]
    rk = rng.integers(20, 60, 150).astype("int64").tolist() + [None]
    lt = pa.table(
        {
            "k": pa.array(lk, pa.int64()),
            "x": pa.array(range(len(lk)), pa.int64()),
        }
    )
    rt = pa.table(
        {
            "k": pa.array(rk, pa.int64()),
            "y": pa.array(range(1000, 1000 + len(rk)), pa.int64()),
        }
    )
    got = (
        hash_join(
            ray.data.from_arrow(lt), ray.data.from_arrow(rt), on="k", how="outer"
        )
        .to_pandas()
        .sort_values(["k", "x", "y"], na_position="last")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("l", lt)
    con.register("r", rt)
    exp = con.execute(
        """SELECT COALESCE(l.k, r.k) AS k, l.x, r.y
           FROM l FULL OUTER JOIN r ON l.k = r.k
           ORDER BY k NULLS LAST, x NULLS LAST, y NULLS LAST"""
    ).df()
    assert len(got) == len(exp)
    for c in ("k", "x", "y"):
        assert got[c].astype("float64").fillna(-1).tolist() == exp[
            c
        ].astype("float64").fillna(-1).tolist(), c


def _string_join_fixture():
    import numpy as np
    import pyarrow as pa

    rng = np.random.default_rng(11)
    keys = [f"conv-{i:04d}" for i in range(60)]
    lk = [keys[i] for i in rng.integers(0, 40, 180)] + [None, None]
    rk = [keys[i] for i in rng.integers(20, 60, 140)] + [None]
    lt = pa.table(
        {"k": pa.array(lk, pa.string()), "x": pa.array(range(len(lk)), pa.int64())}
    )
    rt = pa.table(
        {
            "k": pa.array(rk, pa.string()),
            "y": pa.array(range(1000, 1000 + len(rk)), pa.int64()),
        }
    )
    return lt, rt


def _join_vs_duckdb(lt, rt, how, **kw):
    import duckdb
    import ray.data

    from tg_data_connector_ray.pipelines.relational import hash_join

    got = hash_join(
        ray.data.from_arrow(lt), ray.data.from_arrow(rt), on="k", how=how, **kw
    ).to_pandas()
    if len(got) == 0:
        # Ray's zero-group map_groups loses the schema (documented
        # engine-wide gotcha) — only the emptiness is comparable
        import duckdb as _dd

        con = _dd.connect()
        con.register("l", lt)
        con.register("r", rt)
        sql0 = {
            "inner": "SELECT count(*) FROM l JOIN r ON l.k = r.k",
            "left": "SELECT count(*) FROM l LEFT JOIN r ON l.k = r.k",
            "outer": "SELECT count(*) FROM l FULL OUTER JOIN r ON l.k = r.k",
            "anti": "SELECT count(*) FROM l WHERE NOT EXISTS (SELECT 1 FROM r WHERE r.k = l.k)",
        }[how]
        assert con.execute(sql0).fetchone()[0] == 0, how
        return
    got = got.sort_values(
        [c for c in ("k", "x", "y") if c in got.columns], na_position="last"
    ).reset_index(drop=True)
    con = duckdb.connect()
    con.register("l", lt)
    con.register("r", rt)
    sql = {
        "inner": "SELECT l.k, l.x, r.y FROM l JOIN r ON l.k = r.k",
        "left": "SELECT l.k, l.x, r.y FROM l LEFT JOIN r ON l.k = r.k",
        "outer": "SELECT COALESCE(l.k, r.k) AS k, l.x, r.y FROM l FULL OUTER JOIN r ON l.k = r.k",
        "anti": "SELECT l.k, l.x FROM l WHERE NOT EXISTS (SELECT 1 FROM r WHERE r.k = l.k)",
    }[how]
    exp = con.execute(
        f"SELECT * FROM ({sql}) ORDER BY k NULLS LAST, x NULLS LAST"
        + (", y NULLS LAST" if how != "anti" else "")
    ).df()
    assert len(got) == len(exp), (how, len(got), len(exp))
    for c in exp.columns:
        g = got[c].fillna("~") if got[c].dtype == object else got[c].fillna(-1)
        e = exp[c].fillna("~") if exp[c].dtype == object else exp[c].fillna(-1)
        assert g.tolist() == e.tolist(), (how, c)


def test_hash_join_string_keys_match_duckdb(ray_session):
    """String-key joins (hash-bucketed candidates + exact-equality
    verification) across every join kind, null keys included."""
    lt, rt = _string_join_fixture()
    for how in ("inner", "left", "outer", "anti"):
        _join_vs_duckdb(lt, rt, how)


def test_hash_join_string_collisions_stay_exact(ray_session):
    """The collision seam: a degenerate hasher that maps EVERY key to the
    same 64-bit value makes all candidates collide — the post-gather
    string-equality verification must still produce the exact join."""
    import numpy as np

    def awful_hasher(arr):
        return np.zeros(len(arr), np.uint64)

    lt, rt = _string_join_fixture()
    for how in ("inner", "left", "outer"):
        _join_vs_duckdb(lt, rt, how, _key_hasher=awful_hasher)


def test_hash_join_composite_keys_match_duckdb(ray_session):
    """Composite (int, string) join keys across every join kind: bucketed
    by a combined 64-bit hash, candidates verified component-wise.  Null
    in ANY component never matches but survives left/outer as unmatched;
    anti keeps exactly the rows with no verified match."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data

    from tg_data_connector_ray.pipelines.relational import hash_join

    rng = np.random.default_rng(23)
    n_l, n_r = 220, 160
    la = rng.integers(0, 12, n_l).astype("int64").tolist() + [None, 3]
    lb = [f"t{i}" for i in rng.integers(0, 9, n_l)] + ["t1", None]
    ra = rng.integers(5, 18, n_r).astype("int64").tolist() + [None]
    rb = [f"t{i}" for i in rng.integers(4, 12, n_r)] + ["t2"]
    lt = pa.table(
        {
            "a": pa.array(la, pa.int64()),
            "b": pa.array(lb, pa.string()),
            "x": pa.array(range(len(la)), pa.int64()),
        }
    )
    rt = pa.table(
        {
            "a": pa.array(ra, pa.int64()),
            "b": pa.array(rb, pa.string()),
            "y": pa.array(range(5000, 5000 + len(ra)), pa.int64()),
        }
    )
    con = duckdb.connect()
    con.register("l", lt)
    con.register("r", rt)
    sqls = {
        "inner": "SELECT l.a, l.b, l.x, r.y FROM l JOIN r ON l.a = r.a AND l.b = r.b",
        "left": "SELECT l.a, l.b, l.x, r.y FROM l LEFT JOIN r ON l.a = r.a AND l.b = r.b",
        "outer": """SELECT COALESCE(l.a, r.a) AS a, COALESCE(l.b, r.b) AS b, l.x, r.y
                    FROM l FULL OUTER JOIN r ON l.a = r.a AND l.b = r.b""",
        "anti": """SELECT l.a, l.b, l.x FROM l WHERE NOT EXISTS
                   (SELECT 1 FROM r WHERE r.a = l.a AND r.b = l.b)""",
    }
    for how, sql in sqls.items():
        got = hash_join(
            ray.data.from_arrow(lt), ray.data.from_arrow(rt), on=["a", "b"], how=how
        ).to_pandas()
        order = [c for c in ("a", "b", "x", "y") if c in got.columns]
        got = got.sort_values(order, na_position="last").reset_index(drop=True)
        exp = con.execute(
            f"SELECT * FROM ({sql}) ORDER BY "
            + ", ".join(f"{c} NULLS LAST" for c in order)
        ).df()
        assert len(got) == len(exp), (how, len(got), len(exp))
        for c in order:
            g = got[c].fillna("~") if got[c].dtype == object else got[c].fillna(-1)
            e = exp[c].fillna("~") if exp[c].dtype == object else exp[c].fillna(-1)
            assert g.tolist() == e.tolist(), (how, c)


def test_hash_join_composite_collisions_stay_exact(ray_session):
    """Composite keys under a degenerate hasher (every string hashes
    equal, so the combined hash depends only on the int part): the
    component-wise verification must still produce the exact join."""
    import numpy as np
    import pyarrow as pa

    def awful_hasher(arr):
        return np.full(len(arr), 7, np.uint64)

    lt = pa.table(
        {
            "a": pa.array([1, 1, 2, 2, 3], pa.int64()),
            "b": pa.array(["u", "v", "u", "w", "u"], pa.string()),
            "x": pa.array(range(5), pa.int64()),
        }
    )
    rt = pa.table(
        {
            "a": pa.array([1, 1, 2, 4], pa.int64()),
            "b": pa.array(["u", "z", "w", "u"], pa.string()),
            "y": pa.array([10, 11, 12, 13], pa.int64()),
        }
    )
    import duckdb
    import ray.data

    from tg_data_connector_ray.pipelines.relational import hash_join

    got = (
        hash_join(
            ray.data.from_arrow(lt), ray.data.from_arrow(rt), on=["a", "b"],
            how="inner", _key_hasher=awful_hasher,
        )
        .to_pandas()
        .sort_values(["a", "b", "x", "y"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("l", lt)
    con.register("r", rt)
    exp = con.execute(
        """SELECT * FROM (
             SELECT l.a, l.b, l.x, r.y FROM l JOIN r ON l.a = r.a AND l.b = r.b
           ) ORDER BY a, b, x, y"""
    ).df()
    assert got[["a", "x", "y"]].values.tolist() == exp[["a", "x", "y"]].values.tolist()
    assert got["b"].tolist() == exp["b"].tolist()


from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=12, deadline=None)
@given(
    lk=st.lists(
        st.one_of(st.integers(0, 6), st.none()), min_size=0, max_size=40
    ),
    rk=st.lists(
        st.one_of(st.integers(2, 9), st.none()), min_size=0, max_size=40
    ),
    how=st.sampled_from(["inner", "left", "outer", "anti"]),
    as_str=st.booleans(),
)
def test_hash_join_property_vs_duckdb(ray_session, lk, rk, how, as_str):
    """Any small input hypothesis constructs — int or string keys, nulls,
    empty sides, duplicate keys — every join kind must equal DuckDB."""
    import pyarrow as pa

    conv = (lambda v: None if v is None else f"k{v}") if as_str else (lambda v: v)
    typ = pa.string() if as_str else pa.int64()
    lt = pa.table(
        {
            "k": pa.array([conv(v) for v in lk], typ),
            "x": pa.array(range(len(lk)), pa.int64()),
        }
    )
    rt = pa.table(
        {
            "k": pa.array([conv(v) for v in rk], typ),
            "y": pa.array(range(100, 100 + len(rk)), pa.int64()),
        }
    )
    _join_vs_duckdb(lt, rt, how, num_buckets=4)


def test_events_ntile_matches_duckdb_on_adversarial_ties(ray_session, tmp_path):
    """NTILE decomposition (histogram + cohort exchange) vs DuckDB on the
    hard cases: one giant all-equal cohort (order resolved purely by
    event_id), a type with fewer rows than tiles, and remainder splits."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tg_data_connector_ray.pipelines.relational import events_ntile

    rng = np.random.default_rng(7)
    n = 1000
    et = np.array(["a", "b", "c"])[rng.integers(0, 3, n)].astype(object)
    # 'a': all-equal values; 'b': few distinct; 'c' mostly distinct
    val = np.where(
        et == "a", 5.0, np.where(et == "b", rng.integers(0, 3, n) * 1.5, rng.integers(0, 400, n) * 0.25)
    )
    # plus a tiny type with fewer rows than tiles
    t = pa.table(
        {
            "event_id": pa.array(np.arange(n + 2, dtype=np.int64)),
            "event_type": pa.array(list(et) + ["tiny", "tiny"], pa.string()),
            "value": pa.array(list(val) + [1.0, 2.0], pa.float64()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))

    got = (
        events_ntile(str(tmp_path), k=4)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        f"""SELECT event_id, event_type,
                  CAST(ntile(4) OVER (PARTITION BY event_type
                                      ORDER BY value, event_id) AS BIGINT) AS tile
           FROM '{tmp_path}/events.parquet' ORDER BY event_id"""
    ).df()
    assert got["tile"].tolist() == want["tile"].tolist()
    assert got["event_id"].tolist() == want["event_id"].tolist()


def test_events_anomaly_integer_exact_edges(tmp_path):
    """The cross-multiplied z-test on crafted groups: a clear outlier
    flags, all-equal and single-event users flag nothing (strict
    inequality on zero variance), and the boundary |v-mean| == k*sigma
    does NOT flag."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tg_data_connector_ray.pipelines.relational import events_anomaly

    rows = []
    # user 1: nine 100s and one 1000 -> the 1000 is way past 1.5 sigma
    rows += [(i, 1, 100.0) for i in range(9)] + [(9, 1, 1000.0)]
    # user 2: all equal -> zero variance, nothing flags
    rows += [(10 + i, 2, 50.0) for i in range(5)]
    # user 3: single event -> zero variance, nothing flags
    rows += [(20, 3, 7.0)]
    # user 4: exactly +/- 1 around mean 0 -> |v-mean| = sigma = 1 unit,
    # 1.0 < 1.5 so nothing flags
    rows += [(30, 4, 0.001), (31, 4, -0.001)]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "value": pa.array([r[2] for r in rows], pa.float64()),
        }
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(t, str(sf / "events.parquet"))
    got = events_anomaly(str(sf)).to_pandas().sort_values("event_id")
    assert got["event_id"].tolist() == [9]
    assert got["v"].tolist() == [1000000]
    assert got["n"].tolist() == [10]


def test_events_funnel_strict_order_and_missing_steps(tmp_path):
    """Funnel semantics on crafted streams: completion needs the steps
    as a STRICTLY time-ordered subsequence; same-timestamp events do
    not progress; later cheaper paths still count (greedy min is
    subsequence matching); steps can be skipped-over but not reordered."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from tg_data_connector_ray.pipelines.relational import events_funnel

    t0 = dt.datetime(2024, 1, 1)

    def ev(eid, uid, typ, secs):
        return (eid, uid, typ, t0 + dt.timedelta(seconds=secs))

    rows = [
        # user 1: view -> click -> purchase, in order: completes all 3
        ev(0, 1, "view", 0), ev(1, 1, "click", 10), ev(2, 1, "purchase", 20),
        # user 2: click before view, then no click after view: stops at view
        ev(3, 2, "click", 0), ev(4, 2, "view", 10), ev(5, 2, "purchase", 20),
        # user 3: view and click at the SAME ts -> strict > fails at click
        ev(6, 3, "view", 0), ev(7, 3, "click", 0),
        # user 4: noise events between steps are fine; a LATER view also
        # works because the EARLIEST view is what chains
        ev(8, 4, "view", 5), ev(9, 4, "error", 6), ev(10, 4, "click", 7),
        ev(11, 4, "view", 8), ev(12, 4, "purchase", 9),
        # user 5: purchase only -> counts nowhere
        ev(13, 5, "purchase", 0),
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
            "ts": pa.array([r[3] for r in rows], pa.timestamp("us")),
            "value": pa.array([1.0] * len(rows), pa.float64()),
        }
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(t, str(sf / "events.parquet"))
    got = events_funnel(str(sf))
    assert got["step"].tolist() == ["view", "click", "purchase"]
    # view: users 1,2,3,4; click after view: 1,4; purchase after that: 1,4
    assert got["n_users"].tolist() == [4, 2, 2]


def test_events_retention_counts_distinct_users_per_cell(tmp_path):
    """Retention triangle on crafted days: multiple same-day events count
    once; the cohort is the FIRST day; users spread across buckets sum."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from tg_data_connector_ray.pipelines.relational import events_retention

    day = lambda d, h=0: dt.datetime(2024, 1, d, h)
    rows = [
        (1, day(1)), (1, day(1, 5)), (1, day(2)),   # u1: cohort d1, active d1,d2
        (2, day(1, 23)), (2, day(3)),               # u2: cohort d1, active d1,d3
        (66, day(2)), (66, day(2, 1)),              # u66 (bucket 2): cohort d2
    ]
    t = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        }
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(t, str(sf / "events.parquet"))
    got = events_retention(str(sf))
    cells = {
        (r.cohort_day.day, r.activity_day.day): r.n_users
        for r in got.itertuples()
    }
    assert cells == {(1, 1): 2, (1, 2): 1, (1, 3): 1, (2, 2): 1}


def test_bloom_prefilter_join_equals_plain(ray_session):
    """bloom_prefilter drops non-matching probe rows at the scan but the
    join result is IDENTICAL (false positives survive to the exact
    per-bucket join; no false negatives exist) — int, string, and
    composite keys, including null probe keys."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from tg_data_connector_ray.pipelines.relational import hash_join

    rng = np.random.default_rng(7)
    n = 5000
    lk = rng.integers(0, 100_000, n)
    left = ray.data.from_arrow(pa.table({
        "k": pa.array([None if i % 97 == 0 else int(v) for i, v in enumerate(lk)],
                      type=pa.int64()),
        "s": pa.array([f"s{v % 37:03d}" for v in lk]),
        "lv": pa.array(np.arange(n)),
    }))
    # selective right side: ~1% of the key space
    rk = rng.choice(1000, 300, replace=False)
    right = ray.data.from_arrow(pa.table({
        "k": pa.array(rk, type=pa.int64()),
        "s": pa.array([f"s{v % 37:03d}" for v in rk]),
        "rv": pa.array(rk * 10),
    }))

    def canon(ds):
        t = ds.take_all()
        return sorted((tuple(sorted(r.items()))) for r in t)

    for on in ("k", "s", ["k", "s"]):
        plain = canon(hash_join(left, right, on=on, num_buckets=16))
        bloom = canon(hash_join(left, right, on=on, num_buckets=16,
                                bloom_prefilter=True, bloom_bits=1 << 16))
        assert bloom == plain, f"on={on}"

    with pytest.raises(ValueError, match="inner"):
        hash_join(left, right, on="k", how="left", bloom_prefilter=True)


def test_bloom_bitmap_properties(ray_session):
    """No false negatives ever; false-positive rate on disjoint probes is
    near the (1-e^(-2n/m))^2 model; the prefilter really shrinks the
    probe side (the scale rationale)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from tg_data_connector_ray.pipelines.relational import (
        _bloom_test,
        _hash64_col,
        build_key_bloom,
    )

    m = 1 << 16
    keys = np.arange(0, 4000, dtype=np.int64) * 3_600_000_000  # stride-aligned
    ds = ray.data.from_arrow(pa.table({"k": pa.array(keys)}))
    bits = build_key_bloom(ds, "k", bloom_bits=m)
    h_in = _hash64_col(pa.array(keys))
    assert _bloom_test(bits, h_in, m).all()  # no false negatives
    probe = np.arange(1, 20001, dtype=np.int64) * 3_600_000_000 + 1  # disjoint
    fp = _bloom_test(bits, _hash64_col(pa.array(probe)), m).mean()
    model = (1 - np.exp(-2 * len(keys) / m)) ** 2
    assert fp < max(4 * model, 0.05), (fp, model)


def test_hot_key_salted_join_equals_plain(ray_session):
    """hot_keys replication: inner/left/anti results are identical to the
    unsalted join on heavily skewed data with a multi-match right side
    (incl. a hot key with several right rows and null probe keys);
    outer/multi-column/k<2 raise."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from tg_data_connector_ray.pipelines.relational import hash_join

    rng = np.random.default_rng(23)
    n = 8000
    # 85% of left rows share one key; a second hot key takes another 10%
    lk = np.where(rng.random(n) < 0.85, 7, rng.integers(0, 400, n))
    lk = np.where((rng.random(n) < 0.6667) & (lk != 7), lk, np.where(lk == 7, 7, 13))
    left = ray.data.from_arrow(pa.table({
        "k": pa.array([None if i % 211 == 0 else int(v) for i, v in enumerate(lk)],
                      type=pa.int64()),
        "lv": pa.array(np.arange(n)),
    })).repartition(8)
    # right: hot keys have multiple rows (multi-match), many keys absent
    rk = np.concatenate([[7, 7, 7, 13, 13], rng.choice(200, 60, replace=False)])
    right = ray.data.from_arrow(pa.table({
        "k": pa.array(rk, type=pa.int64()),
        "rv": pa.array(np.arange(len(rk)) * 100),
    })).repartition(4)

    def canon(ds):
        # repr-keyed sort: rows may carry None next to ints
        return sorted((tuple(sorted(r.items())) for r in ds.take_all()), key=repr)

    for how in ("inner", "left", "anti"):
        plain = canon(hash_join(left, right, on="k", how=how, num_buckets=32))
        salted = canon(hash_join(left, right, on="k", how=how, num_buckets=32,
                                 hot_keys=[7, 13], hot_replicas=8))
        assert salted == plain, how
    # a hot key absent from the right must still anti/left correctly
    salted = canon(hash_join(left, right, on="k", how="anti", num_buckets=32,
                             hot_keys=[7, 999], hot_replicas=4))
    plain = canon(hash_join(left, right, on="k", how="anti", num_buckets=32))
    assert salted == plain

    with pytest.raises(ValueError, match="outer"):
        hash_join(left, right, on="k", how="outer", hot_keys=[7])
    with pytest.raises(ValueError, match="single join column"):
        hash_join(left, right, on=["k", "lv"], hot_keys=[7])
    with pytest.raises(ValueError, match="hot_replicas"):
        hash_join(left, right, on="k", hot_keys=[7], hot_replicas=1)


def test_q5_supplier_fallback_equals_broadcast(ray_session):
    """q5's above-the-bound path (third hash_join on suppkey + fused
    colocation filter) returns exactly the broadcast-stage result."""
    from tg_data_connector_ray.pipelines.relational import q5_region_supplier_volume

    sf = "/root/testdata/sf0.001"
    fast = q5_region_supplier_volume(sf)
    slow = q5_region_supplier_volume(sf, max_broadcast_bytes=0)
    assert fast.num_rows > 0
    assert fast.equals(slow)


def test_user_growth_and_windowed_topk_synthetic(ray_session, tmp_path):
    """events_user_growth / events_windowed_topk on synthetic events with
    a real multi-day spread (the sf fixtures' user base saturates on day
    one, which would leave the cumsum untested)."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tg_data_connector_ray.pipelines.relational import (
        events_user_growth,
        events_windowed_topk,
    )

    rng = np.random.default_rng(13)
    n = 6000
    day_us = 86_400_000_000
    # users join over 20 days: user u's events start at day u % 20
    user = rng.integers(0, 300, n)
    t0 = 1_700_000_000_000_000
    ts = t0 + (user % 20) * day_us + rng.integers(0, 10 * day_us, n)
    t = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "user_id": pa.array(user, pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "event_type": pa.array([f"t{v}" for v in rng.integers(0, 6, n)]),
        "value": pa.array(rng.uniform(0, 10, n)),
        "props": pa.array(["{}"] * n),
    })
    d = str(tmp_path / "sfx")
    import os as _os

    _os.makedirs(d)
    pq.write_table(t, _os.path.join(d, "events.parquet"))

    con = duckdb.connect()
    con.register("events", t)
    growth = events_user_growth(d)
    exp = con.execute("""
        WITH f AS (SELECT user_id, min(date_trunc('day', ts)) AS day
                   FROM events GROUP BY 1),
             c AS (SELECT day, CAST(count(*) AS BIGINT) AS new_users
                   FROM f GROUP BY day)
        SELECT day, new_users,
               CAST(sum(new_users) OVER (ORDER BY day) AS BIGINT) AS total_users
        FROM c ORDER BY day
    """).arrow()
    assert growth.num_rows >= 15  # the spread actually exercises cumsum
    # duckdb's Arrow export renders date_trunc('day') as date32 in this
    # client path; values are identical — align the type for comparison
    exp = exp.set_column(0, "day", exp["day"].cast(pa.timestamp("us")))
    assert growth.to_pydict() == exp.to_pydict()

    topk = events_windowed_topk(d, k=2)
    exp2 = con.execute("""
        WITH c AS (SELECT date_trunc('hour', ts) AS hour, event_type,
                          CAST(count(*) AS BIGINT) AS n
                   FROM events GROUP BY 1, 2),
             r AS (SELECT *, row_number() OVER (
                     PARTITION BY hour ORDER BY n DESC, event_type) AS rk
                   FROM c)
        SELECT hour, event_type, n FROM r WHERE rk <= 2
        ORDER BY hour, n DESC, event_type
    """).arrow()
    assert topk.to_pydict() == exp2.to_pydict()


def test_detect_join_hot_keys(ray_session):
    """Pigeonhole candidate pass + exact verify finds exactly the keys
    at/above the global fraction, for int and string keys; uniform data
    yields none."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from tg_data_connector_ray.pipelines.relational import detect_join_hot_keys

    rng = np.random.default_rng(17)
    n = 50_000
    k = rng.integers(0, 5000, n)
    k[rng.random(n) < 0.30] = 777
    k[rng.random(n) < 0.08] = 999
    ds = ray.data.from_arrow(pa.table({"k": pa.array(k, pa.int64())})).repartition(9)
    assert detect_join_hot_keys(ds, "k", 0.05) == [777, 999]
    assert detect_join_hot_keys(ds, "k", 0.20) == [777]
    # native types: the detected keys drive hash_join(hot_keys=...) as-is
    assert all(isinstance(v, int) for v in detect_join_hot_keys(ds, "k", 0.05))

    s = ray.data.from_arrow(pa.table(
        {"k": pa.array([f"u{v}" for v in k])}
    )).repartition(9)
    assert detect_join_hot_keys(s, "k", 0.20) == ["u777"]

    uni = ray.data.from_arrow(pa.table(
        {"k": pa.array(rng.integers(0, 100_000, n), pa.int64())}
    )).repartition(9)
    assert detect_join_hot_keys(uni, "k", 0.05) == []

    # detected keys drive hash_join(hot_keys=...) end-to-end
    from tg_data_connector_ray.pipelines.relational import hash_join

    right = ray.data.from_arrow(pa.table({
        "k": pa.array([777, 999, 5, 6, 777], pa.int64()),
        "rv": pa.array([1, 2, 3, 4, 5], pa.int64()),
    }))
    small = ray.data.from_arrow(pa.table({"k": pa.array(k[:4000], pa.int64())}))
    hot = detect_join_hot_keys(small, "k", 0.05)
    plain = hash_join(small, right, on="k", num_buckets=16).take_all()
    salted = hash_join(small, right, on="k", num_buckets=16,
                       hot_keys=hot, hot_replicas=4).take_all()
    key = lambda r: tuple(sorted(r.items()))
    assert sorted(map(key, salted)) == sorted(map(key, plain))
