"""Local stand-in for the driver's correctness harness: runs every
queries() entry at sf0.01 and compares against oracle_sql() via DuckDB —
row count, column set, and order-insensitive exact values (floats must be
bit-equal after the engine's documented 4dp rounding).

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
       python scripts/check_oracles.py /root/testdata/sf0.1 --skip-quadratic-oracles
           (curated robustness sweep: skips queries whose DuckDB ORACLE —
           not the engine — is quadratic/recursive in table size)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd
import pyarrow as pa

import ray

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def to_df(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


# Self-join pair oracles that are quadratic WITHOUT a CROSS JOIN /
# RECURSIVE keyword (shingle- and vector-pair overlap SQL) — see
# quadratic_oracles().
EXTRA_QUADRATIC = {"ngram_jaccard", "embedding_near_dup"}


def quadratic_oracles(oracles: dict) -> set:
    """Queries whose DUCKDB ORACLE (not the engine) is quadratic or
    recursive in table size — detected from the SQL itself (CROSS JOIN /
    WITH RECURSIVE) plus the named self-join-pair shapes.  Used by
    --skip-quadratic-oracles for the sf0.1 robustness sweep: the engine
    side of these runs at sf0.1 every round in bench.py; their full
    exact comparison is the sf0.001 + sf0.01 record."""
    import re

    return {
        k for k, v in oracles.items() if re.search(r"CROSS JOIN|RECURSIVE", v, re.I)
    } | EXTRA_QUADRATIC


def main():
    argv = [a for a in sys.argv[1:] if a != "--skip-quadratic-oracles"]
    skip_quadratic = len(argv) != len(sys.argv) - 1
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as E

    qs, oracles = E.queries(), E.oracle_sql()
    if skip_quadratic:
        quad = quadratic_oracles(oracles)
        print(f"[skip] {len(quad)} quadratic-oracle queries: {sorted(quad)}")
        qs = {k: v for k, v in qs.items() if k not in quad}
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = canon(to_df(fn(sf_dir)))
        except Exception as e:
            failures.append((name, f"query raised: {e!r}"))
            print(f"[FAIL] {name}: raised {e!r}")
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"[rows] {name}: {len(got)} rows ({dt:.1f}s, no oracle)")
            continue
        exp = canon(con.sql(oracles[name]).df())
        status = "ok"
        if len(got) != len(exp):
            status = f"ROWS {len(got)} != {len(exp)}"
        elif sorted(got.columns) != sorted(exp.columns):
            status = f"COLS {sorted(got.columns)} != {sorted(exp.columns)}"
        elif [str(t) for t in got.dtypes] != [str(t) for t in exp.dtypes]:
            # the driver's value hash is dtype-sensitive: int64 5 and
            # float64 5.0 hash differently even when values are equal
            # (the round-2 events_asof_prior_view failure mode)
            drift = {
                c: (str(got[c].dtype), str(exp[c].dtype))
                for c in got.columns
                if str(got[c].dtype) != str(exp[c].dtype)
            }
            status = f"DTYPES {drift}"
        else:
            for c in got.columns:
                gv, ev = got[c], exp[c]
                try:
                    same = gv.equals(ev) or (gv.astype(object) == ev.astype(object)).all()
                except Exception:
                    same = False
                if not same:
                    try:
                        import numpy as np

                        close = np.allclose(gv.astype(float), ev.astype(float), rtol=0, atol=0, equal_nan=True)
                    except Exception:
                        close = False
                    if not close:
                        diff = (gv != ev)
                        status = f"VALUES differ in col {c} ({int(diff.sum())} rows)"
                        ex_i = diff[diff].index[:3].tolist()
                        for i in ex_i:
                            status += f"\n    row {i}: got={gv[i]!r} exp={ev[i]!r}"
                        break
        mark = "ok  " if status == "ok" else "FAIL"
        print(f"[{mark}] {name} ({len(got)} rows, {dt:.1f}s){'' if status=='ok' else ': ' + status}")
        if status != "ok":
            failures.append((name, status))

    print(f"\n{len(failures)} failures")
    for n, s in failures:
        print(" -", n, s.splitlines()[0])
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
