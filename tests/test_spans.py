"""Tests for cross-document duplicated-span detection/removal
(ops/spans.py): hand-computable fixtures pin the semantics (cross-doc
test, gaps-and-islands merge, canonical-owner removal, edge docs), the
driver surface is the docs_dup_spans / docs_strip_dup_spans oracles."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from tg_data_connector_ray.ops.spans import (
    DupSpanStats,
    dup_gram_index,
    dup_span_stats,
    strip_dup_spans,
)


def _ds(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


def test_shared_run_detected_and_merged():
    # docs 0/1 share a 9-token run -> two k=8 windows merging to one
    # 9-token span in each doc
    shared = "alpha beta gamma delta epsilon zeta eta theta iota"
    ds = _ds([(0, shared + " kappa"), (1, "PRE " + shared + " END")])
    st = (
        dup_span_stats(ds, k=8)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(st["doc_id"]) == [0, 1]
    assert list(st["n_dup_windows"]) == [2, 2]
    assert list(st["n_dup_spans"]) == [1, 1]
    assert list(st["dup_tokens"]) == [9, 9]
    assert list(st["max_span_tokens"]) == [9, 9]


def test_within_doc_repeat_is_not_cross_doc():
    # the 8-gram repeats twice WITHIN doc 0 but in no other doc
    run = "a1 b2 c3 d4 e5 f6 g7 h8"
    ds = _ds([(0, run + " x " + run), (1, "nothing shared here at all ok")])
    st = dup_span_stats(ds, k=8).to_pandas()
    assert len(st) == 0


def test_short_and_empty_docs_contribute_nothing():
    ds = _ds([(0, "only seven tokens here not eight ok"), (1, ""), (2, "x")])
    assert dup_span_stats(ds, k=8).to_pandas().empty
    sp = strip_dup_spans(ds, k=8).to_pandas().sort_values("doc_id")
    assert list(sp["n_removed_tokens"]) == [0, 0, 0]
    assert sp["clean_text"].tolist()[1] == ""


def test_strip_keeps_exactly_the_canonical_copy():
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    ds = _ds(
        [
            (0, shared + " tail0"),
            (1, "head1 " + shared),
            (2, shared),
        ]
    )
    sp = (
        strip_dup_spans(ds, k=8)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # owner = min (doc_id, pos) = doc 0 pos 0: doc 0 keeps the run
    assert sp.loc[0, "clean_text"] == shared + " tail0"
    assert sp.loc[0, "n_removed_tokens"] == 0
    assert sp.loc[1, "clean_text"] == "head1"
    assert sp.loc[1, "n_removed_tokens"] == 8
    assert sp.loc[2, "clean_text"] == ""
    assert sp.loc[2, "n_removed_tokens"] == 8


def test_gap_rule_splits_spans():
    # two shared 8-runs separated by > k unshared tokens -> 2 spans
    run_a = "a b c d e f g h"
    run_b = "p q r s t u v w"
    gap = " ".join(f"z{i}" for i in range(9))  # 9 > k=8 gap
    ds = _ds(
        [
            (0, run_a + " " + gap + " " + run_b),
            (1, run_a + " completely other middle text here now ok yes " + run_b),
        ]
    )
    st = dup_span_stats(ds, k=8).to_pandas().sort_values("doc_id")
    assert list(st["n_dup_spans"]) == [2, 2]
    assert list(st["dup_tokens"]) == [16, 16]


def test_index_bound_raises_loudly():
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    ds = _ds([(0, shared), (1, shared)])
    with pytest.raises(ValueError, match="dup-gram index"):
        dup_gram_index(ds, k=8, max_index_bytes=8)


def test_stats_scorer_handles_empty_batch():
    out = DupSpanStats(np.empty(0, np.uint64), 8)(
        pa.table({"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())})
    )
    assert out.num_rows == 0
    assert out.column_names == [
        "doc_id",
        "n_dup_windows",
        "n_dup_spans",
        "dup_tokens",
        "max_span_tokens",
    ]


def test_matches_duckdb_oracle_at_sf0001():
    import duckdb

    import __ray_entry__ as entry

    sf = "/root/testdata/sf0.001"
    got = (
        entry.queries()["docs_dup_spans"](sf)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    exp = (
        con.execute(entry.oracle_sql()["docs_dup_spans"])
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got[exp.columns].astype("int64").equals(exp.astype("int64"))
