"""Flow control (stages/ratelimit.py) — the reference's channel
byte/record speed limit (Channel.java:54-60, :176-233) as an opt-in
stage.  Wall-clock assertions use generous lower bounds only (the rate
cap is a hard floor on elapsed time; upper bounds would flake on a
loaded box)."""

import time

import pyarrow as pa
import pytest

from tg_data_connector_ray.stages.ratelimit import RateLimiter, throttle


def _batch(n_rows: int) -> pa.Table:
    return pa.table({"x": pa.array(range(n_rows), pa.int64())})


def test_record_speed_enforces_long_run_average():
    rl = RateLimiter(record_speed=3000)
    t0 = time.monotonic()
    for _ in range(3):
        rl(_batch(1000))
    elapsed = time.monotonic() - t0
    # 3000 rows at 3000 rows/s -> elapsed >= 1.0 s at the last release
    assert elapsed >= 1.0 - 1e-3
    assert rl.cum_records == 3000
    assert rl.waited_s > 0


def test_byte_speed_enforces_long_run_average():
    b = _batch(1000)
    rl = RateLimiter(byte_speed=b.nbytes * 4)  # ~4 batches/s
    t0 = time.monotonic()
    for _ in range(2):
        rl(b)
    elapsed = time.monotonic() - t0
    assert elapsed >= 0.5 - 1e-3  # 2 batches / (4 batches/s)


def test_both_limits_max_wins():
    b = _batch(1000)
    # record limit alone -> 0.1 s; byte limit alone -> 1.0 s: byte wins
    rl = RateLimiter(record_speed=10_000, byte_speed=b.nbytes)
    t0 = time.monotonic()
    rl(b)
    elapsed = time.monotonic() - t0
    assert elapsed >= 1.0 - 1e-3


def test_disabled_limits_pass_through_instantly():
    rl = RateLimiter()  # both <= 0: no sleeping, whatever the volume
    t0 = time.monotonic()
    for _ in range(5):
        rl(_batch(100_000))
    assert time.monotonic() - t0 < 0.5
    assert rl.waited_s == 0.0


def test_batch_passes_through_unchanged():
    b = _batch(10)
    out = RateLimiter(record_speed=1e9)(b)
    assert out is b  # zero-copy passthrough


def test_throttle_noop_when_unconfigured(ray_session):
    import ray.data

    ds = ray.data.range(10)
    assert throttle(ds) is ds


def test_throttle_dataset_rate(ray_session):
    import ray.data

    ds = ray.data.from_arrow(_batch(4000)).repartition(4)
    t0 = time.monotonic()
    n = throttle(ds, record_speed=8000, channels=1).count()
    elapsed = time.monotonic() - t0
    assert n == 4000
    assert elapsed >= 0.5 - 1e-3  # 4000 rows at 8000 rows/s


def test_run_job_setting_speed(ray_session, tmp_path):
    """job JSON setting.speed throttles the reader->writer path; the
    metrics and rows written are unaffected by the throttle."""
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    from tg_data_connector_ray.pipelines.runner import run_job

    src = tmp_path / "in"
    src.mkdir()
    pq.write_table(_batch(2000), src / "a.parquet")
    outdir = str(tmp_path / "out")
    cfg = {
        "job": {
            "content": [
                {
                    "reader": {"name": "parquet", "parameter": {"path": str(src)}},
                    "writer": {"name": "parquet", "parameter": {"path": outdir}},
                }
            ],
            "setting": {"speed": {"record": 4000, "channel": 1}},
        }
    }
    t0 = time.monotonic()
    metrics = run_job(cfg)
    elapsed = time.monotonic() - t0
    assert metrics["read_records"] == 2000
    assert elapsed >= 0.5 - 1e-3  # 2000 rows at 4000 rows/s
    got = pads.dataset(outdir).to_table()
    assert got.num_rows == 2000
