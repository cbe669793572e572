"""SQL source (JDBC-reader analogue) tests using stdlib sqlite3."""

import os
import sqlite3

import pytest

from tg_data_connector_ray.sources.sql import (
    SqlSourceConfig,
    build_query,
    expand_table_pattern,
    filter_paths_regex,
    read_sql_source,
)


@pytest.fixture(scope="module")
def db_path(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("db") / "t.db")
    con = sqlite3.connect(p)
    con.execute("CREATE TABLE items (id INTEGER, name TEXT, qty INTEGER)")
    con.executemany(
        "INSERT INTO items VALUES (?, ?, ?)",
        [(i, f"item{i}", i * 10) for i in range(1, 51)] + [(None, "nullpk", 999)],
    )
    con.commit()
    con.close()
    return p


def test_build_query_modes():
    assert build_query(SqlSourceConfig(table="t")) == "SELECT * FROM t"
    assert (
        build_query(SqlSourceConfig(table="t", columns=("a", "b"), where="a > 1"))
        == "SELECT a, b FROM t WHERE a > 1"
    )
    # querySql wins (reference join pushdown path)
    assert build_query(SqlSourceConfig(table="t", query_sql="SELECT 1")) == "SELECT 1"


def test_read_sql_table_mode(db_path):
    ds = read_sql_source(
        lambda: sqlite3.connect(db_path),
        SqlSourceConfig(table="items", columns=("id", "qty"), where="qty >= 100"),
    )
    rows = sorted(ds.take_all(), key=lambda r: (r["id"] is None, r["id"]))
    assert len(rows) == 42  # ids 10..50 plus the null-pk row (qty 999)
    assert rows[0] == {"id": 10, "qty": 100}


def test_read_sql_pk_split_includes_null_tail(db_path):
    ds = read_sql_source(
        lambda: sqlite3.connect(db_path),
        SqlSourceConfig(table="items", split_pk="id", num_splits=4),
    )
    rows = ds.take_all()
    assert len(rows) == 51  # all rows, no dup/loss across range splits
    assert sum(1 for r in rows if r["id"] is None) == 1


def test_expand_table_pattern():
    assert expand_table_pattern("tbl[1-3]") == ["tbl1", "tbl2", "tbl3"]
    assert expand_table_pattern("t[09-11]_x") == ["t09_x", "t10_x", "t11_x"]
    assert expand_table_pattern("plain") == ["plain"]


def test_filter_paths_regex():
    paths = ["/a/part-1.csv", "/a/part-2.csv", "/a/readme.md", "/a/part-1.csv"]
    assert filter_paths_regex(paths, [r"part-\d+\.csv$"]) == [
        "/a/part-1.csv",
        "/a/part-2.csv",
    ]


# ---- string PK split (RangeSplitUtil radix-128 analogue) --------------------

def test_split_string_range_boundaries():
    from tg_data_connector_ray.sources.sql import split_string_range

    b = split_string_range("apple", "zebra", 4)
    assert b[0] == "apple" and b[-1] == "zebra"
    assert b == sorted(b)  # lexicographic slices are valid
    assert len(b) == 5

    # common prefix preserved
    b2 = split_string_range("user_000", "user_999", 3)
    assert all(x.startswith("user_") for x in b2)
    assert b2[0] == "user_000" and b2[-1] == "user_999"

    with pytest.raises(ValueError, match="non-ASCII"):
        split_string_range("aé", "az", 2)


def test_read_sql_string_pk_split(tmp_path):
    p = str(tmp_path / "s.db")
    con = sqlite3.connect(p)
    con.execute("CREATE TABLE users (uid TEXT, score INTEGER)")
    con.executemany(
        "INSERT INTO users VALUES (?, ?)",
        [(f"user_{i:04d}", i) for i in range(97)] + [(None, -1)],
    )
    con.commit()
    con.close()
    ds = read_sql_source(
        lambda: sqlite3.connect(p),
        SqlSourceConfig(table="users", split_pk="uid", num_splits=4),
    )
    rows = ds.take_all()
    assert len(rows) == 98  # no loss/dup across string slices + NULL tail
    assert sum(1 for r in rows if r["uid"] is None) == 1


# ---- sampled (Monte-Carlo) split (genSplitSqlForOracle analogue) -----------

def test_sampled_split_wheres_cover_all_rows(db_path):
    from tg_data_connector_ray.sources.sql import sampled_split_wheres

    cfg = SqlSourceConfig(table="items", split_pk="id", num_splits=5,
                          split_strategy="sampled")
    wheres = sampled_split_wheres(lambda: sqlite3.connect(db_path), cfg)
    # slices + outside-first-last + IS NULL tail; together they partition
    # the table: every row matched exactly once
    con = sqlite3.connect(db_path)
    total = sum(
        con.execute(f"SELECT count(*) FROM items WHERE {w}").fetchone()[0]
        for w in wheres
    )
    con.close()
    assert total == 51


def test_read_sql_sampled_split(db_path):
    ds = read_sql_source(
        lambda: sqlite3.connect(db_path),
        SqlSourceConfig(table="items", split_pk="id", num_splits=4,
                        split_strategy="sampled"),
    )
    rows = ds.take_all()
    assert len(rows) == 51  # no loss/dup across sampled slices
    assert sum(1 for r in rows if r["id"] is None) == 1


def test_sampled_split_string_pk_and_where(tmp_path):
    p = str(tmp_path / "sm.db")
    con = sqlite3.connect(p)
    con.execute("CREATE TABLE users (uid TEXT, score INTEGER)")
    con.executemany(
        "INSERT INTO users VALUES (?, ?)",
        [(f"user_{i:04d}", i) for i in range(50)] + [(None, -1)],
    )
    con.commit()
    con.close()
    ds = read_sql_source(
        lambda: sqlite3.connect(p),
        SqlSourceConfig(table="users", split_pk="uid", num_splits=3,
                        where="score >= 10", split_strategy="sampled"),
    )
    rows = ds.take_all()
    assert len(rows) == 40
    assert all(r["score"] >= 10 for r in rows)


def test_hint_injection_build_query():
    """Reference OracleReader `hint` (OracleReader.java:81-93): spliced
    right after SELECT in table-mode AND querySql-mode queries."""
    assert (
        build_query(SqlSourceConfig(table="t", columns=("a",), hint="/*+ FULL(t) */"))
        == "SELECT /*+ FULL(t) */ a FROM t"
    )
    assert (
        build_query(SqlSourceConfig(query_sql="select a from t", hint="/*+ H */"))
        == "select /*+ H */ a from t"
    )


def test_session_sqls_apply_per_connection(db_path):
    """Reference OracleReader `session` config: session statements run on
    EVERY new connection — the queried TEMP view exists only if they ran
    on the read task's own connection."""
    cfg = SqlSourceConfig(
        query_sql="SELECT v FROM sess_v",
        session_sqls=("CREATE TEMP VIEW sess_v AS SELECT 42 AS v",),
    )
    ds = read_sql_source(lambda: sqlite3.connect(db_path), cfg)
    assert ds.take_all() == [{"v": 42}]


def test_session_and_hint_through_split_path(db_path):
    """PRAGMA-as-session stand-in + hint through the PK-range split:
    every split connection (including the MIN/MAX probe) executes the
    session statement; the hint (a comment to sqlite) rides every
    generated split query without changing results."""
    cfg = SqlSourceConfig(
        table="items", columns=("id", "qty"), split_pk="id", num_splits=4,
        session_sqls=("PRAGMA query_only = ON",),
        hint="/*+ PARALLEL(4) */",
    )
    ds = read_sql_source(lambda: sqlite3.connect(db_path), cfg)
    assert len(ds.take_all()) == 51


def test_hint_not_injected_into_cte_or_leading_comment():
    """Anchored injection: a WITH/CTE querySql (or one led by a comment
    containing 'select') is returned unchanged rather than hinting the
    wrong query block."""
    cte = "WITH t AS (SELECT a FROM x) SELECT * FROM t"
    assert build_query(SqlSourceConfig(query_sql=cte, hint="/*+ H */")) == cte
    led = "/* select note */ SELECT a FROM x"
    assert build_query(SqlSourceConfig(query_sql=led, hint="/*+ H */")) == led
