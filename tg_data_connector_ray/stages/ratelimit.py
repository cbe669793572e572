"""Flow control — the reference's channel byte/record speed limit
(core/.../transport/channel/Channel.java:54-60 config, :176-233 statPush
flow control; job-level split across channels in JobContainer.java:603-610)
re-expressed as an OPT-IN Ray Data stage.

The reference throttles every channel: each flowControlInterval it
compares the achieved byte/record rate against the configured cap and
sleeps off the excess.  Ray Data's streaming executor already provides
backpressure for *internal* stages (a slow consumer stalls its producers
through bounded object-store buffers), so an engine-internal throttle
would only waste cluster time — the counters the reference derives its
rates from are kept in the runner's metrics instead.  What Ray does NOT
give you is protection for an EXTERNAL endpoint (an RDBMS sink, a rate-
limited HTTP API, a shared warehouse): for those this stage caps the
average rate at which batches flow past a point in the pipeline.

Semantics (matching Channel.java's long-run behaviour, not its exact
1-second accounting): each actor tracks cumulative bytes/records since
its first batch and sleeps before *releasing* a batch so that

    elapsed >= max(cum_bytes / byte_speed, cum_records / record_speed)

holds at every release.  That enforces the configured rate as a true
long-run average with at most one batch of burst — stricter and simpler
than the reference's interval sampling, which can overshoot within an
interval.  A limit <= 0 disables that dimension (Channel.java:65-71
prints "No bps/tps activated" for the same convention).

Scale shape: NO central token server — a single token-bucket actor would
serialize every batch of a 256-node job through one process.  Like the
reference (whose job-level limit is divided by channel count,
JobContainer.java:603-610), the global budget is split statically:
`throttle(ds, byte_speed=B, channels=C)` runs C limiter actors each
capped at B/C.  Each actor enforces its share locally; the aggregate
long-run rate is <= B regardless of how Ray balances batches, because
every share is independently capped.
"""

from __future__ import annotations

import time

import pyarrow as pa


class RateLimiter:
    """Callable actor class for ``map_batches``: pass batches through,
    sleeping as needed to hold the configured per-actor average rate.

    Stateful by design (cumulative counters + start time) — must run as
    an actor pool (``concurrency=``), one instance per channel share.
    """

    def __init__(self, byte_speed: float = 0.0, record_speed: float = 0.0):
        self.byte_speed = float(byte_speed)
        self.record_speed = float(record_speed)
        self.cum_bytes = 0
        self.cum_records = 0
        self.waited_s = 0.0
        self._t0 = None  # set on first batch: actor spawn != first data

    def _required_elapsed(self) -> float:
        need = 0.0
        if self.byte_speed > 0:
            need = max(need, self.cum_bytes / self.byte_speed)
        if self.record_speed > 0:
            need = max(need, self.cum_records / self.record_speed)
        return need

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._t0 is None:
            self._t0 = time.monotonic()
        self.cum_bytes += batch.nbytes
        self.cum_records += batch.num_rows
        deficit = self._required_elapsed() - (time.monotonic() - self._t0)
        if deficit > 0:
            time.sleep(deficit)
            self.waited_s += deficit
        return batch


def throttle(ds, byte_speed: float = 0.0, record_speed: float = 0.0,
             channels: int = 1):
    """Cap `ds`'s downstream flow at `byte_speed` B/s and/or
    `record_speed` rows/s (long-run average, job-wide).  The budget is
    split across `channels` limiter actors (see module docstring); both
    limits <= 0 returns `ds` unchanged.

    The stage is zero-copy passthrough (the batch is returned untouched)
    and costs one mostly-sleeping actor slot per channel — num_cpus is
    kept fractional so the throttle never steals a core from real work.
    """
    if byte_speed <= 0 and record_speed <= 0:
        return ds
    channels = max(1, int(channels))
    return ds.map_batches(
        RateLimiter,
        fn_constructor_kwargs={
            "byte_speed": byte_speed / channels,
            "record_speed": record_speed / channels,
        },
        concurrency=channels,
        batch_format="pyarrow",
        zero_copy_batch=True,
        num_cpus=0.1,
    )
