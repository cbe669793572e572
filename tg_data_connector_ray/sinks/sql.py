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

Ray shape: the writer is an ACTOR-POOL map_batches stage — one DB
connection per actor opened in ``__init__``, one executemany per batch —
emitting a one-row count table per batch so the pipeline streams (no
driver materialization).  No JDBC in this sandbox: ``connection_factory``
is any DB-API2 callable (tests use stdlib sqlite3; for MySQL/Postgres
pass the driver's connect function — the plan is identical).
"""

from __future__ import annotations

from dataclasses import dataclass, field

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

    def __post_init__(self):
        if self.write_mode not in ("insert", "replace", "update"):
            raise ValueError(f"writeMode must be insert|replace|update, got {self.write_mode}")
        if self.write_mode == "update" and self.dialect != "mysql" and not self.conflict_keys:
            raise ValueError("update mode needs conflict_keys for sqlite/postgres upsert")


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


class SqlWriter:
    """Actor-pool write stage.  The connection opens lazily, once per
    worker THREAD (Ray Data runs actor UDF calls on a thread pool, and
    DB-API drivers like sqlite3 are thread-bound), and is reused across
    batches — the statement is prepared once per actor."""

    def __init__(self, connection_factory, cfg: SqlSinkConfig):
        import threading

        self._factory = connection_factory
        self._local = threading.local()
        self.cfg = cfg
        self.sql = build_write_sql(cfg)

    def _conn(self):
        conn = getattr(self._local, "conn", None)
        if conn is None:
            from ..util import retry_call

            # connects are the transient-failure hot spot (reference wraps
            # them in RetryUtil, 9 tries); statement errors stay fail-fast
            conn = self._local.conn = retry_call(self._factory, tries=5)
        return conn

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = _rows_for_db(batch, self.cfg)
        if rows:
            conn = self._conn()
            cur = conn.cursor()
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


def write_sql(ds, connection_factory, cfg: SqlSinkConfig) -> int:
    """Write a Dataset into an RDBMS table; returns rows written.

    preSql -> streamed actor-pool write -> postSql, mirroring the
    reference's master prepare / task write / master post lifecycle.
    """
    _run_side_sql(connection_factory, cfg.pre_sql)
    out = ds.select_columns(list(cfg.columns)).map_batches(
        SqlWriter,
        batch_format="pyarrow",
        batch_size=cfg.batch_rows,
        concurrency=cfg.concurrency,
        fn_constructor_kwargs={"connection_factory": connection_factory, "cfg": cfg},
    )
    total = int(out.sum("rows_written") or 0)
    _run_side_sql(connection_factory, cfg.post_sql)
    return total
