"""SQL (RDBMS) sink — the analogue of the reference's CommonRdbmsWriter
(plugin-rdbms-util/.../writer/CommonRdbmsWriter.java:344-543, studied not
ported).

Reference semantics preserved:
- writeMode ``insert`` / ``replace`` / ``update`` -> the dialect's
  INSERT / REPLACE / upsert statement (WriterUtil.java:111-168 builds the
  same three templates per database);
- ``preSql`` / ``postSql`` run once around the whole job
  (CommonRdbmsWriter.java Master.prepare/post);
- batched ``executemany`` + commit per batch (the reference's
  batchSize-driven PreparedStatement loop :470-543).

Ray shape: the writer is a Datasink (``ds.write_datasink``) — one DB
connection per write task, one executemany per ``batch_rows`` chunk,
streaming with backpressure (no driver materialization); the task index
from the Datasink TaskContext gives the exactly-once ledger its
retry-stable batch identity.  No JDBC in this sandbox:
``connection_factory`` is any DB-API2 callable (tests use stdlib
sqlite3; for MySQL/Postgres pass the driver's connect function — the
plan is identical).
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa


@dataclass
class SqlSinkConfig:
    table: str
    columns: tuple
    write_mode: str = "insert"  # insert | replace | update
    conflict_keys: tuple = ()  # update mode: the unique/PK columns
    dialect: str = "sqlite"  # sqlite | mysql | postgres
    batch_rows: int = 2048
    pre_sql: tuple = ()
    post_sql: tuple = ()
    date_format: str = "%Y-%m-%d %H:%M:%S"
    concurrency: int = 1  # sqlite is single-writer; raise for real RDBMS
    # exactly_once=True records each batch in a `<table>__write_ledger`
    # table inside the SAME transaction as the data, so a re-executed Ray
    # task skips batches that already committed.  Through `write_sql` the
    # ledger key is (write task index, within-task batch ordinal, content
    # hash) — the task index comes from the Datasink TaskContext and is
    # stable across Ray task retries, so two DIFFERENT batches never
    # collide even when their content is bit-identical (highly repetitive
    # data + a fixed batch_rows makes identical batches common, not rare).
    # Only direct `SqlWriter` use without an ordinal falls back to the
    # content-hash-only key with the identical-batch caveat.
    exactly_once: bool = False
    # per-WRITE-TASK rate cap in rows/second (the reference's per-channel
    # record cap, Channel.java:56-57 — its shipped config disables it, and
    # so does None here).  Ray's backpressure handles engine-internal flow
    # control; this knob exists for POLITENESS to an external database:
    # each write task sleeps to keep its own committed-row rate at or
    # under the cap, so global throughput <= cap x concurrent write tasks.
    rate_limit_rows_per_s: "float | None" = None

    def __post_init__(self):
        if self.rate_limit_rows_per_s is not None and self.rate_limit_rows_per_s <= 0:
            raise ValueError(
                f"rate_limit_rows_per_s must be positive or None, got "
                f"{self.rate_limit_rows_per_s}"
            )
        if self.write_mode not in ("insert", "replace", "update"):
            raise ValueError(f"writeMode must be insert|replace|update, got {self.write_mode}")
        if self.write_mode == "update" and self.dialect != "mysql" and not self.conflict_keys:
            raise ValueError("update mode needs conflict_keys for sqlite/postgres upsert")
        if self.write_mode == "replace" and self.dialect == "postgres" and not self.conflict_keys:
            # postgres REPLACE is emulated with ON CONFLICT — without keys
            # the template would emit invalid `ON CONFLICT () DO UPDATE`
            raise ValueError("replace mode needs conflict_keys on postgres")

    @property
    def ledger_table(self) -> str:
        return f"{self.table}__write_ledger"


def build_write_sql(cfg: SqlSinkConfig) -> str:
    """The dialect's parameterized write statement (WriterUtil.java:111-168
    template matrix)."""
    cols = ", ".join(cfg.columns)
    ph = ", ".join(["%s" if cfg.dialect == "mysql" else "?"] * len(cfg.columns))
    base = f"INSERT INTO {cfg.table} ({cols}) VALUES ({ph})"
    if cfg.write_mode == "insert":
        return base
    if cfg.write_mode == "replace":
        if cfg.dialect == "mysql":
            return f"REPLACE INTO {cfg.table} ({cols}) VALUES ({ph})"
        if cfg.dialect == "sqlite":
            return f"INSERT OR REPLACE INTO {cfg.table} ({cols}) VALUES ({ph})"
        # postgres has no REPLACE; full-row upsert over the conflict keys
        keys = ", ".join(cfg.conflict_keys)
        sets = ", ".join(f"{c} = excluded.{c}" for c in cfg.columns if c not in cfg.conflict_keys)
        return f"{base} ON CONFLICT ({keys}) DO UPDATE SET {sets}"
    # update
    if cfg.dialect == "mysql":
        sets = ", ".join(f"{c} = VALUES({c})" for c in cfg.columns)
        return f"{base} ON DUPLICATE KEY UPDATE {sets}"
    keys = ", ".join(cfg.conflict_keys)
    sets = ", ".join(f"{c} = excluded.{c}" for c in cfg.columns if c not in cfg.conflict_keys)
    return f"{base} ON CONFLICT ({keys}) DO UPDATE SET {sets}"


def _rows_for_db(batch: pa.Table, cfg: SqlSinkConfig) -> "list[tuple]":
    """Column-pruned, DB-portable row tuples: timestamps -> formatted
    strings (the reference serializes values through its Column string
    forms), nulls stay None."""
    import pyarrow.compute as pc

    cols = []
    for name in cfg.columns:
        c = batch[name]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        if pa.types.is_timestamp(c.type):
            c = pc.strftime(c.cast(pa.timestamp("s"), safe=False), format=cfg.date_format)
        cols.append(c.to_pylist())
    return list(zip(*cols))


def _ensure_transactional(conn) -> None:
    """exactly_once requires the ledger INSERT and the data executemany to
    commit ATOMICALLY — with an autocommit connection the ledger row
    commits alone, and a crash before the data write then makes every
    retry skip the batch forever (silent data loss).  DB-API2 defaults to
    non-autocommit, but common factories override it; undo that here, and
    RAISE if the connection detectably stays in autocommit mode — silently
    degrading would reintroduce the exact loss mode this guard exists
    for."""
    try:
        # sqlite3: isolation_level=None means autocommit; "" = deferred tx
        if getattr(conn, "isolation_level", "") is None:
            conn.isolation_level = ""
    except Exception:
        pass
    try:
        # DB-API extensions (psycopg, mysql-connector, sqlite3 on 3.12+)
        if getattr(conn, "autocommit", False):
            conn.autocommit = False
    except Exception:
        pass
    if getattr(conn, "isolation_level", "") is None or bool(
        getattr(conn, "autocommit", False)
    ):
        raise ValueError(
            "exactly_once needs a transactional connection, but this "
            "driver connection stayed in autocommit mode; use a "
            "connection_factory that opens transactional connections"
        )


class SqlWriter:
    """Per-batch write callable.  The connection opens lazily, once per
    worker THREAD (DB-API drivers like sqlite3 are thread-bound), and is
    reused across batches — the statement is prepared once per instance."""

    def __init__(self, connection_factory, cfg: SqlSinkConfig, write_uuid: str = ""):
        import threading

        self._factory = connection_factory
        self._local = threading.local()
        self.cfg = cfg
        self.write_uuid = write_uuid
        self.sql = build_write_sql(cfg)
        self._ph = "%s" if cfg.dialect == "mysql" else "?"

    def _conn(self):
        conn = getattr(self._local, "conn", None)
        if conn is None:
            from ..util import retry_call

            # connects are the transient-failure hot spot (reference wraps
            # them in RetryUtil, 9 tries); statement errors stay fail-fast
            conn = self._local.conn = retry_call(self._factory, tries=5)
            if self.cfg.exactly_once:
                _ensure_transactional(conn)
        return conn

    def _ledger_has(self, cur, batch_id: str) -> bool:
        cur.execute(
            f"SELECT 1 FROM {self.cfg.ledger_table} WHERE write_uuid = {self._ph} "
            f"AND batch_id = {self._ph}",
            (self.write_uuid, batch_id),
        )
        return cur.fetchone() is not None

    def __call__(self, batch: pa.Table, ordinal_key: "str | None" = None) -> pa.Table:
        rows = _rows_for_db(batch, self.cfg)
        if not rows:
            return pa.table({"rows_written": pa.array([0], pa.int64())})
        conn = self._conn()
        cur = conn.cursor()
        if self.cfg.exactly_once:
            # idempotent re-execution: the ledger row commits atomically
            # WITH the data, so a Ray-retried task either sees the ledger
            # row (batch fully committed — skip) or neither (rolled back —
            # safe to rewrite).  `ordinal_key` (write-task index + batch
            # ordinal, supplied by SqlDatasink) is stable across retries
            # and unique across batches; the content hash rides along so a
            # lineage-reconstructed block with DIFFERENT content under the
            # same ordinal is re-written (at-least-once) rather than
            # silently skipped.  Without an ordinal (direct use) the key
            # degrades to content-hash-only: identical batches collide.
            import hashlib

            content = hashlib.sha256(repr(rows).encode()).hexdigest()
            batch_id = f"{ordinal_key}:{content[:16]}" if ordinal_key else content
            try:
                cur.execute(
                    f"INSERT INTO {self.cfg.ledger_table} "
                    f"(write_uuid, batch_id, n_rows) VALUES "
                    f"({self._ph}, {self._ph}, {self._ph})",
                    (self.write_uuid, batch_id, len(rows)),
                )
            except Exception:
                conn.rollback()
                # conflict (already committed) vs transient error: re-check.
                # A ledger hit means this batch's rows ARE in the table
                # (committed by a prior attempt), so they count toward the
                # returned total — a caller comparing the return value to
                # ds.count() must see equality, not a phantom loss.
                if self._ledger_has(cur, batch_id):
                    return pa.table({"rows_written": pa.array([len(rows)], pa.int64())})
                raise
        try:
            cur.executemany(self.sql, rows)
            conn.commit()
        except Exception:
            conn.rollback()
            raise
        return pa.table({"rows_written": pa.array([len(rows)], pa.int64())})


def _run_side_sql(connection_factory, statements) -> None:
    if not statements:
        return
    conn = connection_factory()
    try:
        cur = conn.cursor()
        for s in statements:
            cur.execute(s)
        conn.commit()
    finally:
        conn.close()


class SqlDatasink:
    """Ray Datasink for the RDBMS write — the idiomatic terminal stage
    (``ds.write_datasink``), chosen over a map_batches sink because write
    tasks receive ``TaskContext.task_idx``: a retried task re-runs with
    the SAME index over the SAME blocks, which is exactly the stable
    batch identity the exactly-once ledger needs."""

    def __init__(self, connection_factory, cfg: SqlSinkConfig, write_uuid: str):
        self._factory = connection_factory
        self.cfg = cfg
        self.write_uuid = write_uuid
        self.rows_written = 0

    # Datasink interface ----------------------------------------------
    def get_name(self) -> str:
        return f"SQL({self.cfg.table})"

    @property
    def supports_distributed_writes(self) -> bool:
        return True

    @property
    def min_rows_per_write(self):
        return None

    def on_write_start(self) -> None:
        pass

    def on_write_failed(self, error: Exception) -> None:
        pass

    def write(self, blocks, ctx) -> int:
        import time as _time

        import pandas as pd

        writer = SqlWriter(self._factory, self.cfg, self.write_uuid)
        total = 0
        ordinal = 0
        t0 = _time.monotonic()
        cap = self.cfg.rate_limit_rows_per_s
        for block in blocks:
            t = pa.Table.from_pandas(block) if isinstance(block, pd.DataFrame) else block
            for off in range(0, t.num_rows, self.cfg.batch_rows):
                chunk = t.slice(off, self.cfg.batch_rows)
                if cap:
                    # token-bucket pacing BEFORE each commit: wait until the
                    # rows already committed fit under cap * elapsed (the
                    # reference's per-channel sleep throttle, Channel.java).
                    # Pacing pre-commit means no dead sleep after the final
                    # chunk — the task ends the moment its last write lands.
                    ahead_s = total / cap - (_time.monotonic() - t0)
                    if ahead_s > 0:
                        _time.sleep(ahead_s)
                out = writer(chunk, ordinal_key=f"{ctx.task_idx}:{ordinal}")
                total += int(out["rows_written"][0].as_py())
                ordinal += 1
        return total

    def on_write_complete(self, write_result) -> None:
        # write() counts COMMITTED rows: written this attempt plus ledger
        # skips (committed by a prior attempt) — the total equals the
        # dataset's row count, so callers can use it as a loss check
        self.rows_written = int(sum(write_result.write_returns or []))


def write_sql(ds, connection_factory, cfg: SqlSinkConfig) -> int:
    """Write a Dataset into an RDBMS table; returns the rows COMMITTED to
    the table for this dataset — including batches a retried task found
    already committed via the exactly-once ledger, so the return always
    matches ds.count() on success.

    preSql -> distributed Datasink write -> postSql, mirroring the
    reference's master prepare / task write / master post lifecycle.

    Delivery: with ``exactly_once`` the per-batch ledger (task-ordinal +
    content key, atomic with the data) makes re-executed Ray tasks skip
    already-committed batches.  Without it the write tasks run with
    ``max_retries=0`` — a lost/failed task fails the run loudly instead
    of silently double-inserting on retry (the reference's plain JDBC
    inserts have the same at-least-once hazard; failing the run is the
    safer default)."""
    from ..util import new_token

    write_uuid = new_token()
    pre = list(cfg.pre_sql)
    if cfg.exactly_once:
        pre = [
            f"CREATE TABLE IF NOT EXISTS {cfg.ledger_table} "
            "(write_uuid VARCHAR(64) NOT NULL, batch_id VARCHAR(96) NOT NULL, "
            "n_rows BIGINT, PRIMARY KEY (write_uuid, batch_id))"
        ] + pre
    _run_side_sql(connection_factory, pre)
    sink = _make_datasink(connection_factory, cfg, write_uuid)
    # exactly_once makes re-execution idempotent (ledger skips committed
    # batches), so application-level exceptions (transient DB errors) are
    # safe to retry — Ray only retries system failures by default.
    # Without the ledger, any retry could double-insert: fail fast.
    remote_args = (
        {"retry_exceptions": True, "max_retries": 4}
        if cfg.exactly_once
        else {"max_retries": 0}
    )
    ds.select_columns(list(cfg.columns)).write_datasink(
        sink, concurrency=cfg.concurrency, ray_remote_args=remote_args
    )
    total = sink.rows_written
    _run_side_sql(connection_factory, cfg.post_sql)
    return total


def _make_datasink(connection_factory, cfg: SqlSinkConfig, write_uuid: str):
    """Build the concrete Datasink subclass lazily (keeps the module
    importable without a Ray session for pure-SQL template tests)."""
    from ray.data import Datasink

    class _Sink(SqlDatasink, Datasink):
        pass

    return _Sink(connection_factory, cfg, write_uuid)
