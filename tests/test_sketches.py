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
