"""SQL (RDBMS) source — the analogue of the reference's JDBC readers
(mysqlreader/oraclereader/sqlserverreader via CommonRdbmsReader, studied
not ported).

Reference semantics preserved:
- table-mode: table + column list + optional WHERE
  (MysqlReader.java:26-49 builds `SELECT <cols> FROM <t> WHERE <w>`);
- querySql-mode: a user-provided SQL string wins over table-mode
  (mysqlreader/doc/mysqlreader.md:91 — joins are pushed down as querySql);
- split: the reference splits by PK ranges (SingleTableSplitUtil.java);
  here each split is a `WHERE pk >= lo AND pk < hi` slice computed from
  MIN/MAX(pk) (same even-split idea), fed to ``ray.data.read_sql`` which
  runs one query per split task.

No JDBC in this sandbox: the connection factory is any DB-API2 callable
(tests use stdlib sqlite3).  For MySQL/Postgres at scale, pass the
driver's connect function — the plan is identical.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import ray.data


@dataclass
class SqlSourceConfig:
    table: "str | None" = None
    columns: "tuple | None" = None  # None = *
    where: "str | None" = None
    query_sql: "str | None" = None  # wins over table-mode
    split_pk: "str | None" = None
    num_splits: int = 4
    # "range": MIN/MAX + even ranges (SingleTableSplitUtil.splitSingleTable)
    # "sampled": random-sample PK values as boundaries (the reference's
    #   Oracle Monte-Carlo split, genSplitSqlForOracle)
    split_strategy: str = "range"
    # sampled mode: dialect SQL returning up to num_splits random PK values
    # ({pk}/{table}/{where}/{n} placeholders); default works on
    # sqlite/postgres/duckdb (ORDER BY RANDOM()); Oracle would pass its
    # SAMPLE(pct) form here
    sample_sql: "str | None" = None
    # per-connection session statements, executed on EVERY new connection
    # (including each split task's) before any query — the reference's
    # OracleReader `session` config (oraclereader/.../OracleReader.java:
    # 45-60 wraps them in `alter session set ...`; here each entry is a
    # full statement, so any dialect's session setup fits).
    session_sqls: tuple = ()
    # optimizer hint injected right after SELECT — the reference's
    # OracleReader `hint` (OracleReader.java:81-93 splices it into the
    # generated query).  Applied to table-mode queries AND to query_sql
    # when it BEGINS with SELECT (a WITH/CTE querySql is left untouched —
    # hint the outer block in the querySql itself).
    # E.g. "/*+ FULL(t) PARALLEL(4) */".
    hint: "str | None" = None


def _inject_hint(sql: str, hint: str) -> str:
    """Splice the hint after a LEADING SELECT only.  Anchoring at the
    start (not the first 'select' anywhere) keeps CTE bodies, string
    literals and comments untouched — a `WITH ... SELECT` querySql is
    returned unchanged (hint the outer block yourself in the querySql
    when you need it), matching the reference's behavior of splicing
    hints only into queries IT generates."""
    m = re.match(r"\s*select\b", sql, flags=re.IGNORECASE)
    if not m:
        return sql
    return sql[: m.end()] + f" {hint}" + sql[m.end() :]


def build_query(cfg: SqlSourceConfig) -> str:
    if cfg.query_sql:
        return _inject_hint(cfg.query_sql, cfg.hint) if cfg.hint else cfg.query_sql
    if not cfg.table:
        raise ValueError("need table or query_sql")
    cols = ", ".join(cfg.columns) if cfg.columns else "*"
    q = f"SELECT {f'{cfg.hint} ' if cfg.hint else ''}{cols} FROM {cfg.table}"
    if cfg.where:
        q += f" WHERE {cfg.where}"
    return q


def _connect_with_session(connection_factory, session_sqls: tuple):
    """Connection wrapper executing the configured session statements on
    every new connection — module-level so the wrapped factory pickles
    into ray.data.read_sql's tasks."""
    conn = connection_factory()
    cur = conn.cursor()
    for s in session_sqls:
        cur.execute(s)
    return conn


def split_string_range(lo: str, hi: str, n: int) -> "list[str]":
    """ASCII radix-128 bignum split boundaries for a STRING primary key —
    the reference's RangeSplitUtil.splitStringRange (RangeSplitUtil.java:
    14-30,105-128) shape: strip the common prefix, treat the remainders as
    base-128 numbers over the ASCII range, split evenly, convert back.

    Returned boundaries are lexicographically ordered (base-128 numeric
    order on NUL-padded strings == byte order; stripping trailing NULs
    preserves it), so `pk >= b[i] AND pk < b[i+1]` slices are correct
    under binary collation.
    """
    if lo > hi:
        lo, hi = hi, lo
    pre = 0
    while pre < len(lo) and pre < len(hi) and lo[pre] == hi[pre]:
        pre += 1
    prefix, a, b = lo[:pre], lo[pre:], hi[pre:]
    width = max(len(a), len(b), 1)

    def enc(s: str) -> int:
        v = 0
        for i in range(width):
            c = ord(s[i]) if i < len(s) else 0
            if c > 127:
                raise ValueError(f"non-ASCII character in string pk value {s!r}")
            v = v * 128 + c
        return v

    def dec(v: int) -> str:
        digits = []
        for _ in range(width):
            digits.append(v % 128)
            v //= 128
        return prefix + "".join(chr(d) for d in reversed(digits)).rstrip("\x00")

    av, bv = enc(a), enc(b)
    bounds = [dec(av + (bv - av) * i // n) for i in range(n + 1)]
    bounds[0], bounds[-1] = lo, hi  # exact endpoints
    out = []
    for x in bounds:  # dedupe, order-preserving (tiny ranges collapse)
        if not out or x != out[-1]:
            out.append(x)
    return out


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def sampled_split_wheres(connection_factory, cfg: SqlSourceConfig) -> "list[str]":
    """Monte-Carlo split: WHERE clauses whose boundaries are RANDOMLY
    SAMPLED PK values (reference genSplitSqlForOracle,
    SingleTableSplitUtil.java:294-389 + RdbmsRangeSplitWrap.wrapRange/
    wrapFirstLastPoint — studied, not ported): sorted sample points p0..pn
    become slices ``p_i <= pk < p_{i+1}`` (final slice inclusive), plus the
    outside slice ``pk < p0 OR pn < pk`` and the ``pk IS NULL`` tail.
    Useful when MIN/MAX ranges would skew (sparse or clustered keys): the
    sample approximates the QUANTILES of the key distribution, so slices
    carry ~equal row counts regardless of key gaps."""
    pk, n = cfg.split_pk, max(2, cfg.num_splits)
    base_where = f" AND ({cfg.where})" if cfg.where else ""
    sample_sql = cfg.sample_sql or (
        f"SELECT {pk} FROM {cfg.table} WHERE {pk} IS NOT NULL{base_where}"
        f" ORDER BY RANDOM() LIMIT {n}"
    )
    conn = connection_factory()
    try:
        cur = conn.cursor()
        cur.execute(sample_sql)
        points = sorted({r[0] for r in cur.fetchall()})
    finally:
        conn.close()
    and_where = f"({cfg.where}) AND " if cfg.where else ""
    if len(points) < 2:
        # reference: splitedRangeSize < 2 -> no range slices, single scan
        return [cfg.where or "1=1"]

    def q(v):
        return _sql_quote(v) if isinstance(v, str) else str(v)

    wheres = []
    for i in range(len(points) - 1):
        last = i == len(points) - 2
        upper_op = "<=" if last else "<"
        wheres.append(
            f"{and_where}{pk} >= {q(points[i])} AND {pk} {upper_op} {q(points[i + 1])}"
        )
    wheres.append(f"{and_where}({pk} < {q(points[0])} OR {pk} > {q(points[-1])})")
    wheres.append(f"{and_where}{pk} IS NULL")
    return wheres


def read_sql_source(connection_factory, cfg: SqlSourceConfig) -> "ray.data.Dataset":
    """One Dataset from a SQL source; PK-range split when configured."""
    if cfg.session_sqls:
        from functools import partial

        connection_factory = partial(
            _connect_with_session, connection_factory, tuple(cfg.session_sqls)
        )
    if cfg.query_sql or not cfg.split_pk:
        return ray.data.read_sql(build_query(cfg), connection_factory)

    if cfg.split_strategy == "sampled":
        queries = [
            build_query(
                SqlSourceConfig(
                    table=cfg.table, columns=cfg.columns, where=w, hint=cfg.hint
                )
            )
            for w in sampled_split_wheres(connection_factory, cfg)
        ]
        datasets = [ray.data.read_sql(q, connection_factory) for q in queries]
        return datasets[0].union(*datasets[1:]) if len(datasets) > 1 else datasets[0]

    # PK-range split (reference SingleTableSplitUtil: MIN/MAX + even ranges
    # + IS NULL tail slice)
    conn = connection_factory()
    try:
        cur = conn.cursor()
        cur.execute(f"SELECT MIN({cfg.split_pk}), MAX({cfg.split_pk}) FROM {cfg.table}")
        lo, hi = cur.fetchone()
    finally:
        conn.close()
    base_where = f"({cfg.where}) AND " if cfg.where else ""
    queries = []
    if lo is None:
        queries.append(build_query(cfg))
    elif isinstance(lo, str):
        # string PK: radix-128 boundaries, inclusive final slice
        bounds = split_string_range(lo, hi, max(1, cfg.num_splits))
        for i in range(len(bounds) - 1):
            last = i == len(bounds) - 2
            upper_op = "<=" if last else "<"
            queries.append(
                build_query(
                    SqlSourceConfig(
                        table=cfg.table,
                        columns=cfg.columns,
                        hint=cfg.hint,
                        where=(
                            f"{base_where}{cfg.split_pk} >= {_sql_quote(bounds[i])}"
                            f" AND {cfg.split_pk} {upper_op} {_sql_quote(bounds[i + 1])}"
                        ),
                    )
                )
            )
        queries.append(
            build_query(
                SqlSourceConfig(
                    table=cfg.table,
                    columns=cfg.columns,
                    hint=cfg.hint,
                    where=f"{base_where}{cfg.split_pk} IS NULL",
                )
            )
        )
    else:
        n = max(1, cfg.num_splits)
        step = max(1, (int(hi) - int(lo) + n) // n)
        b = int(lo)
        while b <= int(hi):
            e = b + step
            queries.append(
                build_query(
                    SqlSourceConfig(
                        table=cfg.table,
                        columns=cfg.columns,
                        hint=cfg.hint,
                        where=f"{base_where}{cfg.split_pk} >= {b} AND {cfg.split_pk} < {e}",
                    )
                )
            )
            b = e
        # NULL-pk tail slice, mirroring the reference's `pk IS NULL` split
        queries.append(
            build_query(
                SqlSourceConfig(
                    table=cfg.table,
                    columns=cfg.columns,
                    hint=cfg.hint,
                    where=f"{base_where}{cfg.split_pk} IS NULL",
                )
            )
        )
    datasets = [ray.data.read_sql(q, connection_factory) for q in queries]
    ds = datasets[0]
    if len(datasets) > 1:
        ds = ds.union(*datasets[1:])
    return ds


# ---------------------------------------------------------------------------
# config-time expansion helpers (reference TableExpandUtil / FilterUtil)

_RANGE_RE = re.compile(r"\[(\d+)-(\d+)\]")


def expand_table_pattern(pattern: str) -> "list[str]":
    """`tbl[1-3]` -> [tbl1, tbl2, tbl3] (TableExpandUtil.java:37-80 shape;
    width of the lower bound is preserved: `t[01-03]` -> t01..t03)."""
    m = _RANGE_RE.search(pattern)
    if not m:
        return [pattern]
    lo_s, hi_s = m.group(1), m.group(2)
    width = len(lo_s) if lo_s.startswith("0") else 0
    out = []
    for i in range(int(lo_s), int(hi_s) + 1):
        num = str(i).zfill(width) if width else str(i)
        out.append(pattern[: m.start()] + num + pattern[m.end() :])
    return out


def filter_paths_regex(paths: "list[str]", patterns: "list[str]") -> "list[str]":
    """Regex filter over path lists, deduped, order-preserving
    (FilterUtil.java:13-52 shape)."""
    regs = [re.compile(p) for p in patterns]
    seen, out = set(), []
    for p in paths:
        if p not in seen and any(r.search(p) for r in regs):
            seen.add(p)
            out.append(p)
    return out
