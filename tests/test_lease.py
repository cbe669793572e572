"""Single-writer lease: concurrent-apply refusal, crashed-writer
takeover, re-entrancy for composite verbs, integration with apply_cdc."""

import json
import os
import socket
import time

import pytest

from tg_data_connector_ray.cdc.config import CdcConfig
from tg_data_connector_ray.cdc.lease import (
    LEASE_NAME,
    LeaseHeld,
    WriterLease,
    writer_lease,
)
from tg_data_connector_ray.cdc.pipeline import apply_cdc
from tg_data_connector_ray.util import atomic_write_json


def _plant(out_dir, *, host, pid, age_s=0.0, ttl_s=120.0, token="foreign"):
    os.makedirs(out_dir, exist_ok=True)
    atomic_write_json(
        os.path.join(out_dir, LEASE_NAME),
        {"token": token, "host": host, "pid": pid,
         "heartbeat_ts": time.time() - age_s, "ttl_s": ttl_s},
    )


def test_live_foreign_lease_refused(tmp_path):
    d = str(tmp_path / "t")
    # pid 1 is always alive; fresh heartbeat -> held
    _plant(d, host=socket.gethostname(), pid=1)
    with pytest.raises(LeaseHeld):
        WriterLease(d).acquire()
    # cross-host with fresh heartbeat: pid liveness unknowable -> held
    _plant(d, host="elsewhere-host", pid=4242)
    with pytest.raises(LeaseHeld):
        WriterLease(d).acquire()


def test_stale_lease_takeover(tmp_path):
    d = str(tmp_path / "t")
    # dead pid on this host: immediate takeover
    _plant(d, host=socket.gethostname(), pid=999_999_999)
    with WriterLease(d) as l1:
        rec = json.load(open(os.path.join(d, LEASE_NAME)))
        assert rec["token"] == l1.token
    assert not os.path.exists(os.path.join(d, LEASE_NAME))  # released
    # cross-host with expired heartbeat: ttl takeover
    _plant(d, host="elsewhere-host", pid=4242, age_s=999.0, ttl_s=10.0)
    with WriterLease(d):
        pass
    # unparseable lease file: takeover, not crash
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, LEASE_NAME), "w") as f:
        f.write("{not json")
    with WriterLease(d):
        pass


def test_reentrant_and_exception_release(tmp_path):
    d = str(tmp_path / "t")
    outer = WriterLease(d).acquire()
    inner = WriterLease(d).acquire()  # nested verb in the same process
    inner.release()
    assert os.path.exists(os.path.join(d, LEASE_NAME))  # outer still holds
    outer.release()
    assert not os.path.exists(os.path.join(d, LEASE_NAME))
    # context manager releases on exception
    with pytest.raises(RuntimeError, match="boom"):
        with WriterLease(d):
            raise RuntimeError("boom")
    assert not os.path.exists(os.path.join(d, LEASE_NAME))


def test_apply_cdc_respects_and_cleans_lease(t1, tmp_path):
    out = str(tmp_path / "out")
    cfg = CdcConfig(out_dir=out, num_partitions=4)
    _plant(out, host=socket.gethostname(), pid=1)
    with pytest.raises(LeaseHeld):
        apply_cdc(t1["cdc_log"], cfg)
    os.unlink(os.path.join(out, LEASE_NAME))
    summary = apply_cdc(t1["cdc_log"], cfg)
    assert summary["rows_live"] > 0
    assert not os.path.exists(os.path.join(out, LEASE_NAME))
    # opt-out: an external scheduler serializes writers
    cfg2 = CdcConfig(out_dir=str(tmp_path / "o2"), num_partitions=4,
                     writer_lease=False)
    _plant(cfg2.out_dir, host=socket.gethostname(), pid=1)
    assert apply_cdc(t1["cdc_log"], cfg2)["rows_live"] == summary["rows_live"]


def test_writer_lease_helper_nullcontext(tmp_path):
    cfg = CdcConfig(out_dir=str(tmp_path / "x"), writer_lease=False)
    with writer_lease(cfg):  # no file, no error
        pass
    assert not os.path.exists(os.path.join(cfg.out_dir, LEASE_NAME))


def test_lease_race_exactly_one_process_wins(tmp_path):
    """Four PROCESSES contend for the same out_dir simultaneously
    (in-process contention is re-entrant by design, so the race check
    only shows cross-process): exactly one acquires, the rest get
    LeaseHeld."""
    import subprocess
    import sys
    import time as _time

    d = str(tmp_path / "race")
    start_at = _time.time() + 1.5
    script = f"""
import time
time.sleep(max(0, {start_at} - time.time()))
from tg_data_connector_ray.cdc.lease import LeaseHeld, WriterLease
try:
    l = WriterLease({d!r}).acquire()
    print("WON")
    time.sleep(1.0)  # hold while the others race
    l.release()
except LeaseHeld:
    print("HELD")
"""
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", script],
            stdout=subprocess.PIPE, text=True, cwd="/root/repo",
        )
        for _ in range(4)
    ]
    outs = [p.communicate(timeout=60)[0].strip() for p in procs]
    assert sorted(outs) == ["HELD", "HELD", "HELD", "WON"], outs
    assert not os.path.exists(os.path.join(d, LEASE_NAME))  # released
