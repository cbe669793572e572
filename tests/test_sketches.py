"""HyperLogLog register sketch + exact distinct-count companion."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

SF = "/root/testdata/sf0.001"


def test_bitlen_exact_at_boundaries():
    from tg_data_connector_ray.ops.sketches import _bitlen_u64

    vals = np.array(
        [0, 1, 2, 3, 4, (1 << 53) - 1, 1 << 53, (1 << 53) + 1, (1 << 56) - 1],
        dtype=np.uint64,
    )
    got = _bitlen_u64(vals)
    exp = [int(v).bit_length() for v in vals.tolist()]
    assert got.tolist() == exp


def test_hll_registers_merge_invariance():
    """Registers are identical regardless of how rows are batched —
    the mergeability property that makes the sketch distributable."""
    from tg_data_connector_ray.ops.sketches import hll_registers

    rng = np.random.default_rng(3)
    g = np.where(rng.random(4000) < 0.5, "a", "b")
    v = rng.integers(0, 700, size=4000, dtype=np.int64)
    t = pa.table({"g": pa.array(g.astype(object), pa.string()), "v": pa.array(v)})

    def canon(ds):
        df = hll_registers(ds, "g", "v").to_pandas()
        return df.sort_values(["g", "bucket"]).reset_index(drop=True)

    one = canon(ray.data.from_arrow(t))
    many = canon(ray.data.from_arrow(t).repartition(13))
    assert one.equals(many)


def test_hll_estimate_within_tolerance():
    from tg_data_connector_ray.ops.sketches import (
        grouped_distinct_count,
        hll_estimate,
        hll_registers,
    )

    ds = ray.data.read_parquet(f"{SF}/events.parquet", columns=["event_type", "user_id"])
    regs = hll_registers(ds, "event_type", "user_id").to_pandas()
    est = hll_estimate(pa.Table.from_pandas(regs, preserve_index=False), "event_type")
    exact = (
        grouped_distinct_count(ds, "event_type", "user_id", out_name="n")
        .to_pandas()
        .set_index("event_type")["n"]
    )
    # m=256 -> ~1.04/sqrt(m) = 6.5% typical relative error; 20% is a
    # deterministic-input safety margin, still far from vacuous
    for grp, n in exact.items():
        assert abs(est[grp] - n) / n < 0.20, (grp, est[grp], n)


def test_hll_small_range_correction():
    from tg_data_connector_ray.ops.sketches import hll_estimate, hll_registers

    t = pa.table(
        {
            "g": pa.array(["x"] * 10, pa.string()),
            "v": pa.array(list(range(10)), pa.int64()),
        }
    )
    est = hll_estimate(
        hll_registers(ray.data.from_arrow(t), "g", "v").to_pandas().pipe(
            pa.Table.from_pandas, preserve_index=False
        ),
        "g",
    )
    assert abs(est["x"] - 10) < 4


def test_mg_compress_properties():
    from tg_data_connector_ray.ops.sketches import _mg_compress

    rng = np.random.default_rng(3)
    keys = np.arange(1000, dtype=np.int64)
    counts = rng.integers(1, 500, size=1000).astype(np.int64)
    k = 64
    ck, cc = _mg_compress(keys, counts, k)
    assert len(ck) <= k
    orig = dict(zip(keys.tolist(), counts.tolist()))
    dec = min(orig[int(a)] - int(b) for a, b in zip(ck, cc)) if len(ck) else 0
    # every surviving count underestimates by exactly the shared decrement
    assert all(orig[int(a)] - int(b) >= 0 for a, b in zip(ck, cc))
    # the top-k keys by true count all survive when counts are distinct enough
    assert set(np.argsort(-counts)[: k // 4].tolist()) <= {int(a) for a in ck} or dec > 0


def test_heavy_hitters_exact_on_skewed_stream(ray_session):
    """Zipf-ish stream with forced compressions (small k): the output must
    be EXACTLY the keys with count >= ceil(phi*N), with exact counts —
    the MG sketch only guides candidate selection."""
    import ray.data

    from tg_data_connector_ray.ops.sketches import heavy_hitters

    rng = np.random.default_rng(7)
    # 40 hot keys (~1000 each) + 200k long-tail rows over 50k keys
    hot = np.repeat(np.arange(40, dtype=np.int64), 1000)
    tail = rng.integers(1000, 51000, size=200_000).astype(np.int64)
    ids = np.concatenate([hot, tail])
    rng.shuffle(ids)
    ds = ray.data.from_arrow(pa.table({"user_id": pa.array(ids, pa.int64())})).repartition(16)
    phi = 0.002  # thresh = ceil(0.002 * 240k) = 480
    got = heavy_hitters(ds, "user_id", phi=phi, k=512)
    n = len(ids)
    thresh = int(np.ceil(phi * n))
    uniq, cnt = np.unique(ids, return_counts=True)
    want = {int(u): int(c) for u, c in zip(uniq, cnt) if c >= thresh}
    got_map = dict(zip(got["user_id"].to_pylist(), got["n"].to_pylist()))
    assert got_map == want and len(want) >= 30


def test_heavy_hitters_phi_guard(ray_session):
    import pytest
    import ray.data

    from tg_data_connector_ray.ops.sketches import heavy_hitters

    ds = ray.data.from_arrow(pa.table({"user_id": pa.array([1, 2], pa.int64())}))
    with pytest.raises(ValueError, match="MG guarantee"):
        heavy_hitters(ds, "user_id", phi=1e-9, k=16)


def test_heavy_hitters_two_pass_and_degenerate_block(ray_session):
    """N now derives from block_rows carried on the MG partials (no
    ds.count() pass), including the degenerate block whose compress drops
    every counter (all counts equal, > k distinct keys); mapped pipelines
    can materialize once."""
    import numpy as np
    import pyarrow as pa
    import ray

    from tg_data_connector_ray.ops.sketches import heavy_hitters, mg_partial_batch

    # degenerate block: 5 distinct keys, all count 1, k=2 -> summary would
    # be empty; the zero-count carrier row must preserve block_rows
    t = pa.table({"u": pa.array(np.arange(5, dtype=np.int64))})
    p = mg_partial_batch(t, "u", k=2)
    assert p.num_rows == 1 and p["n"][0].as_py() == 0
    assert p["block_rows"][0].as_py() == 5

    keys = np.concatenate([np.zeros(60, np.int64), np.arange(1, 41, dtype=np.int64)])
    ds = ray.data.from_arrow(pa.table({"u": pa.array(keys)})).map_batches(
        lambda b: b, batch_format="pyarrow"
    )
    got = heavy_hitters(ds, "u", phi=0.3, k=8, materialize_input=True).to_pandas()
    # key 0 holds 60/100 = 0.6 >= 0.3; every other key is 1%
    assert got["u"].tolist() == [0] and got["n"].tolist() == [60]


def test_value_histogram_exact_with_under_overflow(ray_session):
    """u6 integer bucketing vs DuckDB CASE reconstruction, including
    underflow/overflow buckets and nulls (not counted)."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data

    from tg_data_connector_ray.ops.sketches import value_histogram

    rng = np.random.default_rng(5)
    vals = np.concatenate([
        rng.uniform(-10, 110, 4000),
        [0.0, 99.999999, 100.0, -0.000001],  # exact boundary hits
    ])
    t = pa.table({"value": pa.array(
        [None if i % 97 == 0 else float(v) for i, v in enumerate(vals)],
        pa.float64(),
    )})
    got = value_histogram(
        ray.data.from_arrow(t).repartition(6), "value", 0.0, 100.0, 10
    )
    con = duckdb.connect()
    con.register("e", t)
    exp = con.execute("""
        WITH v AS (SELECT CAST(round_even(value*1e6,0) AS BIGINT) AS vu
                   FROM e WHERE value IS NOT NULL)
        SELECT b AS bucket, CAST(count(*) AS BIGINT) AS n FROM (
          SELECT CASE WHEN vu < 0 THEN -1
                      WHEN vu >= 100000000 THEN 10
                      ELSE vu * 10 // 100000000 END AS b FROM v)
        GROUP BY b ORDER BY b
    """).arrow()
    assert got.to_pydict() == exp.to_pydict()
    assert got["bucket"][0].as_py() == -1  # underflow really present
    assert got["bucket"][-1].as_py() == 10  # overflow really present
