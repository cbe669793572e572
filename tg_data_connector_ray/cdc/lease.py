"""Single-writer lease over a CDC out_dir.

Two drivers concurrently applying runs to the same table is the one
corruption mode the per-partition atomic commits cannot defend against:
both would fold from the same base state and the second commit silently
drops the first's events.  The reference serializes writers by running
one job process per target (core job lifecycle, JobContainer.java); on a
shared lake a Ray driver needs an explicit mutual-exclusion token.

`WriterLease` is that token: a `_writer_lease.json` under out_dir naming
the owner (host, pid, random token) with a heartbeat the owner refreshes
from a daemon thread.  A second writer fails fast with `LeaseHeld`.  A
crashed owner is taken over when its lease is STALE: same-host pid no
longer alive, or heartbeat older than `ttl_s` (the cross-host rule —
pid liveness is unknowable remotely).  Acquisition is race-checked by
write-then-readback: both contenders write their token, sleep a beat,
and re-read; exactly one survives the atomic rename.

Re-entrant per process (refcounted): `redact_convs` / `tail_log` /
`apply_corrections` call `apply_cdc` while already holding the lease for
the same out_dir, which must not self-deadlock.

Scope note for real deployments: atomic-rename readback is sound on
POSIX filesystems (local disk, NFS, Lustre); on S3-like stores without
atomic rename, swap `_write` for the store's conditional-put and keep
the same protocol.
"""

from __future__ import annotations

import logging
import os
import socket
import threading
import time
import uuid

from ..util import atomic_write_json, read_json

_LOG = logging.getLogger("tg_data_connector_ray.cdc")

LEASE_NAME = "_writer_lease.json"

# process-global refcounts for re-entrant holds, keyed by realpath
_HELD: "dict[str, list]" = {}  # path -> [refcount, WriterLease]
_HELD_LOCK = threading.Lock()


class LeaseHeld(RuntimeError):
    """Another live writer owns this out_dir."""


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True
    except OSError:
        return True
    return True


class WriterLease:
    def __init__(self, out_dir: str, ttl_s: float = 120.0):
        self.out_dir = os.path.realpath(out_dir)
        self.path = os.path.join(self.out_dir, LEASE_NAME)
        self.ttl_s = float(ttl_s)
        self.token = f"{socket.gethostname()}:{os.getpid()}:{uuid.uuid4().hex[:12]}"
        self._stop = threading.Event()
        self._thread: "threading.Thread | None" = None

    # --- protocol -------------------------------------------------------
    def _record(self) -> dict:
        return {
            "token": self.token,
            "host": socket.gethostname(),
            "pid": os.getpid(),
            "heartbeat_ts": time.time(),
            "ttl_s": self.ttl_s,
        }

    def _stale(self, rec: dict, now: float) -> "str | None":
        """Reason the existing lease is takeable, or None if live."""
        try:
            host, pid = rec["host"], int(rec["pid"])
            hb, ttl = float(rec["heartbeat_ts"]), float(rec.get("ttl_s", self.ttl_s))
        except (KeyError, TypeError, ValueError):
            return "unparseable lease record"
        if host == socket.gethostname() and not _pid_alive(pid):
            return f"owner pid {pid} on this host is dead"
        if now - hb > ttl:
            return f"heartbeat {now - hb:.0f}s old > ttl {ttl:.0f}s"
        return None

    def acquire(self) -> "WriterLease":
        with _HELD_LOCK:
            held = _HELD.get(self.out_dir)
            if held is not None:  # re-entrant: nested verb in this process
                held[0] += 1
                return self
        os.makedirs(self.out_dir, exist_ok=True)
        try:
            rec = read_json(self.path)
        except (OSError, ValueError):
            rec = None
        if rec is not None and rec.get("token") != self.token:
            reason = self._stale(rec, time.time())
            if reason is None:
                raise LeaseHeld(
                    f"{self.out_dir} is being written by {rec.get('host')}"
                    f":{rec.get('pid')} (lease {rec.get('token')}, heartbeat "
                    f"{time.time() - float(rec.get('heartbeat_ts', 0)):.0f}s "
                    "ago) — refusing a concurrent apply; if that writer is "
                    "gone, the lease expires after its ttl"
                )
            _LOG.warning(
                "taking over stale writer lease on %s (%s)", self.out_dir, reason
            )
        # contend: write, let the other contender's rename land, read back
        atomic_write_json(self.path, self._record())
        time.sleep(0.05)
        try:
            winner = read_json(self.path).get("token")
        except (OSError, ValueError):
            winner = None
        if winner != self.token:
            raise LeaseHeld(
                f"lost lease race on {self.out_dir} to {winner}"
            )
        self._stop.clear()
        self._thread = threading.Thread(target=self._beat, daemon=True)
        self._thread.start()
        with _HELD_LOCK:
            _HELD[self.out_dir] = [1, self]
        return self

    def _beat(self) -> None:
        while not self._stop.wait(max(self.ttl_s / 4.0, 0.5)):
            try:
                atomic_write_json(self.path, self._record())
            except OSError:  # transient fs hiccup; next beat retries
                pass

    def release(self) -> None:
        with _HELD_LOCK:
            held = _HELD.get(self.out_dir)
            if held is None:
                return
            held[0] -= 1
            if held[0] > 0:
                return
            del _HELD[self.out_dir]
            owner: WriterLease = held[1]
        owner._stop.set()
        if owner._thread is not None:
            owner._thread.join(timeout=2)
        try:
            if read_json(owner.path).get("token") == owner.token:
                os.unlink(owner.path)
        except (OSError, ValueError):
            pass

    def __enter__(self) -> "WriterLease":
        return self.acquire()

    def __exit__(self, *exc) -> None:
        self.release()


def writer_lease(cfg) -> "WriterLease":
    """The lease for a CdcConfig; `cfg.writer_lease=False` disables (a
    no-op context), e.g. when an external scheduler already serializes
    writers."""
    if not getattr(cfg, "writer_lease", True):
        import contextlib

        return contextlib.nullcontext()  # type: ignore[return-value]
    return WriterLease(cfg.out_dir, ttl_s=getattr(cfg, "lease_ttl_s", 120.0))
