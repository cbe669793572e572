"""Transformer-chain parity tests (semantics from the reference's
SubstrTransformer/PadTransformer/ReplaceTransformer/FilterTransformer —
see docstrings in stages/transforms.py). No Ray needed."""

import pyarrow as pa
import pytest

from tg_data_connector_ray.stages.transforms import (
    ChainResult,
    TransformSpec,
    apply_chain,
    dx_filter_mask,
    register_udf,
)


def T(**cols):
    return pa.table(cols)


def texts(*vals):
    return T(s=pa.array(list(vals), type=pa.string()))


# ---- dx_substr --------------------------------------------------------------

def test_substr_clamps_to_end():
    r = apply_chain(
        texts("hello world", "hi"),
        [TransformSpec("dx_substr", "s", {"start": 0, "length": 5})],
    )
    assert r.table["s"].to_pylist() == ["hello", "hi"]


def test_substr_null_passes_through():
    r = apply_chain(
        texts("abcdef", None),
        [TransformSpec("dx_substr", "s", {"start": 2, "length": 2})],
    )
    assert r.table["s"].to_pylist() == ["cd", None]
    assert r.dirty == 0


def test_substr_start_beyond_length_is_dirty():
    r = apply_chain(
        texts("abc", "abcdefgh"),
        [TransformSpec("dx_substr", "s", {"start": 5, "length": 2})],
    )
    assert r.table["s"].to_pylist() == ["fg"]
    assert r.dirty == 1
    assert r.dirty_rows["_reason"].to_pylist() == ["dx_substr_out_of_range"]
    # start == length yields empty string, NOT dirty (Java substring(n,n))
    r = apply_chain(texts("abc"), [TransformSpec("dx_substr", "s", {"start": 3, "length": 2})])
    assert r.table["s"].to_pylist() == [""] and r.dirty == 0


# ---- dx_pad -----------------------------------------------------------------

def test_pad_left_right_and_truncate():
    spec = [TransformSpec("dx_pad", "s", {"pad_type": "l", "length": 6, "pad_string": "*"})]
    r = apply_chain(texts("abc", "abcdefgh", None), spec)
    # longer value truncates to len; null becomes "" then pads
    assert r.table["s"].to_pylist() == ["***abc", "abcdef", "******"]
    spec = [TransformSpec("dx_pad", "s", {"pad_type": "r", "length": 5, "pad_string": "xy"})]
    r = apply_chain(texts("abc"), spec)
    # multi-char pad repeated then truncated to fit (Java doPad)
    assert r.table["s"].to_pylist() == ["abcxy"]
    r = apply_chain(texts("a"), spec)
    assert r.table["s"].to_pylist() == ["axyxy"]
    r = apply_chain(texts("ab"), spec)
    assert r.table["s"].to_pylist() == ["abxyx"]


# ---- dx_replace -------------------------------------------------------------

def test_replace_splice_and_clamp():
    spec = [TransformSpec("dx_replace", "s", {"start": 1, "length": 2, "replace": "XX"})]
    r = apply_chain(texts("abcdef", "ab", None), spec)
    # "ab": start+len >= n -> head + repl, tail dropped
    assert r.table["s"].to_pylist() == ["aXXdef", "aXX", None]


def test_replace_start_beyond_length_is_dirty():
    r = apply_chain(
        texts("ab"), [TransformSpec("dx_replace", "s", {"start": 5, "length": 1, "replace": "Z"})]
    )
    assert r.table.num_rows == 0 and r.dirty == 1


# ---- dx_filter (inverted: drop on match) ------------------------------------

def test_filter_like_full_regex_match():
    t = texts("hello", "help", "other", None)
    drop = dx_filter_mask(t, "s", "like", "hel.*")
    assert drop.tolist() == [True, True, False, False]  # null KEPT for like
    drop = dx_filter_mask(t, "s", "not like", "hel.*")
    assert drop.tolist() == [False, False, True, True]  # null DROPPED for not-like


def test_filter_numeric_compares_and_null_rules():
    t = T(x=pa.array([1.5, 3.0, None], type=pa.float64()))
    assert dx_filter_mask(t, "x", ">", "2").tolist() == [False, True, False]
    assert dx_filter_mask(t, "x", "<=", "1.5").tolist() == [True, False, False]
    t = T(x=pa.array([5, 10, None], type=pa.int64()))
    assert dx_filter_mask(t, "x", ">=", "10").tolist() == [False, True, False]


def test_filter_equality_null_literal():
    t = T(x=pa.array(["a", None, "null"], type=pa.string()))
    # = "null": drops null cells AND the literal string "null" cell
    assert dx_filter_mask(t, "x", "=", "null").tolist() == [False, True, True]
    assert dx_filter_mask(t, "x", "=", "a").tolist() == [True, False, False]
    # != "a": non-null unequal dropped; null dropped (value != "null")
    assert dx_filter_mask(t, "x", "!=", "a").tolist() == [False, True, True]
    # != "null": null cells kept
    assert dx_filter_mask(t, "x", "!=", "null").tolist() == [True, False, False]


def test_filter_string_lexicographic():
    t = T(x=pa.array(["apple", "pear"], type=pa.string()))
    assert dx_filter_mask(t, "x", ">", "banana").tolist() == [False, True]


def test_filter_timestamp_as_epoch_millis():
    t = T(x=pa.array([1_000_000, 2_000_000], type=pa.timestamp("us")))
    # column in us -> compared as epoch ms (reference DateColumn.asLong)
    assert dx_filter_mask(t, "x", ">", "1500").tolist() == [False, True]


# ---- chain behavior ---------------------------------------------------------

def test_chain_order_and_positional_columns():
    t = T(a=pa.array(["xx-keep", "yy-drop", "zz-keep"]), b=pa.array([1, 2, 3]))
    specs = [
        TransformSpec("dx_substr", 0, {"start": 3, "length": 10}),  # positional col
        TransformSpec("dx_filter", "a", {"op": "like", "value": "drop"}),
        TransformSpec("dx_pad", "a", {"pad_type": "r", "length": 6, "pad_string": "!"}),
    ]
    r = apply_chain(t, specs)
    assert r.table["a"].to_pylist() == ["keep!!", "keep!!"]
    assert r.table["b"].to_pylist() == [1, 3]
    assert r.filtered == 1


def test_udf_hook():
    import pyarrow.compute as pc

    register_udf("upper_a", lambda t: t.set_column(0, "a", pc.utf8_upper(t["a"])))
    r = apply_chain(
        T(a=pa.array(["ab", "cd"])), [TransformSpec("dx_udf", None, {"udf": "upper_a"})]
    )
    assert r.table["a"].to_pylist() == ["AB", "CD"]


def test_udf_row_drop_counts_as_filtered():
    register_udf("drop_first", lambda t: t.slice(1))
    r = apply_chain(
        T(a=pa.array(["x", "y", "z"])), [TransformSpec("dx_udf", None, {"udf": "drop_first"})]
    )
    assert r.table.num_rows == 2 and r.filtered == 1


def test_dx_py_vector_and_row_modes():
    """Inline-config code strings (the dx_groovy analogue): vector mode
    evaluates once per batch over the pyarrow column; row mode is the
    record-at-a-time escape hatch with DROP semantics."""
    from tg_data_connector_ray.stages.transforms import compile_py_transformer

    t = T(a=pa.array(["ab", "cd", None]), b=pa.array([1, 2, 3], pa.int64()))

    up = compile_py_transformer("pc.utf8_upper(col)", col="a")
    out = apply_chain(t, [TransformSpec("dx_udf", None, {"fn": up})])
    assert out.table["a"].to_pylist() == ["AB", "CD", None]

    # positional addressing + numpy in scope
    dbl = compile_py_transformer("pa.array(np.asarray(col) * 2)", col=1)
    out2 = apply_chain(t, [TransformSpec("dx_udf", None, {"fn": dbl})])
    assert out2.table["b"].to_pylist() == [2, 4, 6]

    # row mode: transform + DROP sentinel; drops count as filtered
    rowfn = compile_py_transformer(
        "DROP if value is None else value + '!'", col="a", mode="row"
    )
    out3 = apply_chain(t, [TransformSpec("dx_udf", None, {"fn": rowfn})])
    assert out3.table["a"].to_pylist() == ["ab!", "cd!"]
    assert out3.filtered == 1

    # compile errors surface at config time
    import pytest as _pytest

    with _pytest.raises(SyntaxError):
        compile_py_transformer("def nope(:", col="a")


def test_dx_py_through_job_runner(tmp_path):
    """dx_py in job JSON: compiled at spec-build time, runs as a chain
    UDF through the full reader -> chain -> writer path."""
    import os

    import pyarrow.parquet as pq
    import ray.data

    from tg_data_connector_ray.pipelines.runner import run_job

    src = str(tmp_path / "in.csv")
    with open(src, "w") as f:
        f.write("id,name\n1,alice\n2,bob\n")
    outdir = str(tmp_path / "out")
    cfg = {
        "job": {
            "content": [
                {
                    "reader": {
                        "name": "csv",
                        "parameter": {
                            "path": str(tmp_path),
                            "skipHeader": True,
                            "column": [
                                {"index": 0, "type": "long", "name": "id"},
                                {"index": 1, "type": "string", "name": "name"},
                            ],
                        },
                    },
                    "transformer": [
                        {
                            "name": "dx_py",
                            "parameter": {"column": "name", "code": "pc.utf8_upper(col)"},
                        }
                    ],
                    "writer": {"name": "parquet", "parameter": {"path": outdir}},
                }
            ]
        }
    }
    run_job(cfg)
    import pyarrow.dataset as pads

    got = pads.dataset(outdir).to_table().sort_by([("id", "ascending")])
    assert got["name"].to_pylist() == ["ALICE", "BOB"]
