"""SFT pair-extraction kernel + pipeline tests (ops/transcripts.py)."""

import pyarrow as pa

from tg_data_connector_ray.ops.transcripts import sft_pairs, sft_pairs_block


def tbl(rows):
    """rows: (conv_id, turn_idx, role, text)"""
    return pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array([r[2] for r in rows], pa.string()),
            "text": pa.array([r[3] for r in rows], pa.string()),
        }
    )


def pairs(rows):
    return sft_pairs_block(tbl(rows)).to_pylist()


def test_basic_alternation_pairs_each_assistant_with_prior_user():
    p = pairs(
        [
            ("c1", 0, "user", "q1"),
            ("c1", 1, "assistant", "a1"),
            ("c1", 2, "user", "q2"),
            ("c1", 3, "assistant", "a2"),
        ]
    )
    assert [(r["turn_idx"], r["prompt"], r["response"]) for r in p] == [
        (1, "q1", "a1"),
        (3, "q2", "a2"),
    ]


def test_latest_prior_user_wins_and_system_tool_turns_are_transparent():
    p = pairs(
        [
            ("c1", 0, "system", "sys"),
            ("c1", 1, "user", "old q"),
            ("c1", 2, "user", "new q"),
            ("c1", 3, "tool", "tool out"),
            ("c1", 4, "assistant", "ans"),
        ]
    )
    assert p == [{"conv_id": "c1", "turn_idx": 4, "prompt": "new q", "response": "ans"}]


def test_assistant_without_prior_user_is_dropped():
    p = pairs(
        [
            ("c1", 0, "assistant", "cold open"),
            ("c1", 1, "user", "q"),
            ("c1", 2, "assistant", "a"),
        ]
    )
    assert [(r["turn_idx"]) for r in p] == [2]


def test_null_texts_skipped_both_sides():
    p = pairs(
        [
            ("c1", 0, "user", None),  # not a usable prompt
            ("c1", 1, "assistant", "a1"),  # no valid prior user text -> dropped
            ("c1", 2, "user", "q"),
            ("c1", 3, "assistant", None),  # empty response -> dropped
            ("c1", 4, "assistant", "a2"),
        ]
    )
    assert [(r["turn_idx"], r["prompt"]) for r in p] == [(4, "q")]


def test_conversations_do_not_leak_into_each_other():
    p = pairs(
        [
            ("c1", 0, "user", "q-c1"),
            ("c2", 0, "assistant", "a-c2"),  # no user in c2 -> dropped
            ("c2", 1, "user", "q-c2"),
            ("c2", 2, "assistant", "a2-c2"),
        ]
    )
    assert [(r["conv_id"], r["prompt"]) for r in p] == [("c2", "q-c2")]


def test_unsorted_input_rows():
    p = pairs(
        [
            ("c1", 3, "assistant", "a2"),
            ("c1", 0, "user", "q1"),
            ("c1", 2, "user", "q2"),
            ("c1", 1, "assistant", "a1"),
        ]
    )
    assert [(r["turn_idx"], r["prompt"]) for r in p] == [(1, "q1"), (3, "q2")]


def test_empty_block():
    assert sft_pairs_block(tbl([])).num_rows == 0


def test_dataset_path_matches_kernel_on_fixture(t1):
    """Distributed extraction over the golden final table == one-shot
    kernel over the same table read whole."""
    import ray

    from tg_data_connector_ray.cdc.golden import golden_apply
    from tg_data_connector_ray.util import list_files

    files = sorted(list_files(t1["cdc_log"], suffix=".parquet"))
    golden = golden_apply([pa.parquet.read_table(f) for f in files])

    ds = ray.data.from_arrow(golden)
    out = sft_pairs(ds, n_coarse=8)
    got = pa.concat_tables(
        t for t in ray.get(out.to_arrow_refs()) if t.num_rows
    ).sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])

    want = sft_pairs_block(golden).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")]
    )
    assert got.num_rows == want.num_rows > 0
    assert got.equals(want)


def test_render_block_orders_and_fills_nulls():
    from tg_data_connector_ray.ops.transcripts import render_block

    out = render_block(
        tbl(
            [
                ("c2", 0, "user", "solo"),
                ("c1", 1, "assistant", "world"),
                ("c1", 0, "user", "hello"),
                ("c1", 2, None, None),
            ]
        )
    ).to_pylist()
    got = {r["conv_id"]: r for r in out}
    assert got["c1"]["n_turns"] == 3
    assert got["c1"]["rendered"] == "user: hello\nassistant: world\n: "
    assert got["c2"]["rendered"] == "user: solo"


def test_render_dataset_path_matches_kernel(t1):
    import ray

    from tg_data_connector_ray.cdc.golden import golden_apply
    from tg_data_connector_ray.ops.transcripts import (
        render_block,
        render_conversations,
    )
    from tg_data_connector_ray.util import list_files

    files = sorted(list_files(t1["cdc_log"], suffix=".parquet"))
    golden = golden_apply([pa.parquet.read_table(f) for f in files])
    out = render_conversations(ray.data.from_arrow(golden), n_coarse=8)
    got = pa.concat_tables(
        t for t in ray.get(out.to_arrow_refs()) if t.num_rows
    ).sort_by([("conv_id", "ascending")])
    want = render_block(golden).sort_by([("conv_id", "ascending")])
    assert got.num_rows == want.num_rows > 0
    assert got.equals(want)


def test_spool_and_groupby_exchanges_agree(t1):
    """The spool exchange (partitioned write + read) and Ray's groupby
    shuffle must produce identical results for every conversation-grouped
    operator — exchange choice is a performance knob, never semantics."""
    import ray

    from tg_data_connector_ray.cdc.golden import golden_apply
    from tg_data_connector_ray.cdc.history import scd2_history
    from tg_data_connector_ray.ops.transcripts import render_conversations
    from tg_data_connector_ray.util import list_files

    files = sorted(list_files(t1["cdc_log"], suffix=".parquet"))

    def collect(ds, keys):
        t = pa.concat_tables(
            b for b in ray.get(ds.to_arrow_refs()) if b.num_rows
        )
        return t.sort_by([(k, "ascending") for k in keys])

    a = collect(
        scd2_history(ray.data.read_parquet(files), n_coarse=8, exchange="spool"),
        ["conv_id", "turn_idx", "valid_from"],
    )
    b = collect(
        scd2_history(ray.data.read_parquet(files), n_coarse=8, exchange="groupby"),
        ["conv_id", "turn_idx", "valid_from"],
    )
    assert a.num_rows == b.num_rows > 0 and a.equals(b)

    golden = golden_apply([pa.parquet.read_table(f) for f in files])
    ra = collect(
        render_conversations(ray.data.from_arrow(golden), n_coarse=8, exchange="spool"),
        ["conv_id"],
    )
    rb = collect(
        render_conversations(
            ray.data.from_arrow(golden), n_coarse=8, exchange="groupby"
        ),
        ["conv_id"],
    )
    assert ra.num_rows == rb.num_rows > 0 and ra.equals(rb)


def test_clip_block_keeps_longest_fitting_suffix():
    from functools import partial

    from tg_data_connector_ray.ops.transcripts import clip_block

    rows = [
        ("c1", 0, "user", "aaaaaaaaaa"),      # 10
        ("c1", 1, "assistant", "bbbbb"),      # 5
        ("c1", 2, "user", "cc"),              # 2
        ("c2", 0, "user", "x" * 50),          # alone exceeds budget
        ("c3", 0, "user", None),              # null text costs 0
        ("c3", 1, "assistant", "dddddddd"),   # 8
    ]
    out = clip_block(tbl(rows), budget=8).to_pylist()
    got = [(r["conv_id"], r["turn_idx"], r["suffix_chars"]) for r in out]
    # c1: suffixes are 17/7/2 -> turns 1,2 kept; c2: 50 > 8 -> nothing;
    # c3: suffixes 8/8 -> both kept (null text is free)
    assert got == [("c1", 1, 7), ("c1", 2, 2), ("c3", 0, 8), ("c3", 1, 8)]

    # budget below every turn: empty result with the full schema
    empty = clip_block(tbl(rows), budget=1)
    assert empty.num_rows == 0 and "suffix_chars" in empty.column_names


def ttbl(rows):
    """rows: (conv_id, turn_idx, role, text, tool)"""
    return pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array([r[2] for r in rows], pa.string()),
            "text": pa.array([r[3] for r in rows], pa.string()),
            "tool": pa.array([r[4] for r in rows], pa.string()),
        }
    )


def test_tool_transitions_block_pairs_successive_calls():
    from tg_data_connector_ray.ops.transcripts import tool_transitions_block

    # non-tool turns are transparent: a->b across turn 1's gap; convs
    # never leak (c1's last call does not pair with c2's first)
    rows = [
        ("c1", 0, "tool", "t", "a"),
        ("c1", 1, "user", "q", None),
        ("c1", 2, "tool", "t", "b"),
        ("c1", 3, "tool", "t", "a"),
        ("c2", 0, "tool", "t", "b"),
        ("c2", 1, "tool", "t", "b"),
        ("c3", 0, "tool", "t", "a"),  # single call: no transition
    ]
    got = sorted(
        (r["src_tool"], r["dst_tool"], r["n"])
        for r in tool_transitions_block(ttbl(rows)).to_pylist()
    )
    assert got == [("a", "b", 1), ("b", "a", 1), ("b", "b", 1)]


def test_tool_transitions_block_unsorted_and_empty():
    from tg_data_connector_ray.ops.transcripts import (
        TRANSITIONS_SCHEMA,
        tool_transitions_block,
    )

    rows = [
        ("c1", 3, "tool", "t", "b"),
        ("c1", 0, "tool", "t", "a"),
        ("c1", 2, "user", "q", None),
    ]
    got = tool_transitions_block(ttbl(rows)).to_pylist()
    assert got == [{"src_tool": "a", "dst_tool": "b", "n": 1}]

    none = tool_transitions_block(ttbl([("c1", 0, "user", "q", None)]))
    assert none.num_rows == 0 and none.schema.equals(TRANSITIONS_SCHEMA)


def test_tool_transitions_dataset_matches_kernel(t1):
    import ray

    from tg_data_connector_ray.cdc.golden import golden_apply
    from tg_data_connector_ray.ops.transcripts import (
        tool_transitions,
        tool_transitions_block,
    )
    from tg_data_connector_ray.util import list_files

    files = sorted(list_files(t1["cdc_log"], suffix=".parquet"))
    golden = golden_apply([pa.parquet.read_table(f) for f in files])
    want = tool_transitions_block(golden).sort_by(
        [("src_tool", "ascending"), ("dst_tool", "ascending")]
    )
    for exchange in ("spool", "groupby"):
        got = tool_transitions(
            ray.data.from_arrow(golden), n_coarse=8, exchange=exchange
        )
        assert got.num_rows == want.num_rows > 0
        assert got.cast(want.schema).equals(want)


def test_boilerplate_counts_distinct_convs_and_turns(t1):
    import ray

    from tg_data_connector_ray.ops.transcripts import boilerplate_texts

    rows = [
        ("c1", 0, "assistant", "dup", None),
        ("c1", 2, "assistant", "dup", None),   # same conv, counts 1 conv
        ("c2", 0, "assistant", "dup", None),
        ("c2", 1, "assistant", "solo", None),  # one conv only: filtered
        ("c3", 0, "user", "dup", None),        # wrong role: ignored
        ("c3", 1, "assistant", None, None),    # null text: ignored
        ("c3", 2, "assistant", "two", None),
        ("c4", 0, "assistant", "two", None),
    ]
    ds = ray.data.from_arrow(ttbl(rows))
    got = sorted(
        (r["text"], r["n_turns"], r["n_convs"])
        for b in ray.get(
            boilerplate_texts(ds, min_convs=2, n_coarse=4).to_arrow_refs()
        )
        for r in b.to_pylist()
    )
    assert got == [("dup", 3, 2), ("two", 2, 2)]


def test_tool_usage_feed_key_moving_deltas(ray_session):
    """The per-tool view's deltas handle GROUP-KEY MOVES: a U changing a
    turn's tool from 'a' to 'b' subtracts under 'a' and adds under 'b';
    I adds only, D subtracts only; tools reaching zero drop out."""
    import pyarrow as pa
    import ray.data

    from tg_data_connector_ray.ops.transcripts import (
        apply_tool_usage_feed,
        tool_usage_feed_deltas,
    )

    feed = pa.table({
        "op": pa.array(["U", "I", "D", "U"]),
        "conv_id": pa.array(["c1", "c2", "c3", "c4"]),
        "turn_idx": pa.array([0, 0, 0, 0], pa.int32()),
        "tool": pa.array(["b", "b", None, None]),       # postimages
        "tool_old": pa.array(["a", None, "a", None]),    # preimages
    })
    d = tool_usage_feed_deltas(feed)
    got = sorted(zip(d["tool"].to_pylist(), d["n_calls"].to_pylist()))
    assert got == [("a", -1), ("a", -1), ("b", 1), ("b", 1)]

    prior = ray.data.from_arrow(pa.table({
        "tool": pa.array(["a", "b", "c"]),
        "n_calls": pa.array([2, 1, 5], pa.int64()),
    }))
    out = apply_tool_usage_feed(prior, ray.data.from_arrow(feed))
    rows = {r["tool"]: r["n_calls"] for r in out.take_all()}
    assert rows == {"b": 3, "c": 5}  # a: 2-2 -> dropped; b: 1+2


def vtbl(rows):
    """rows: (conv_id, turn_idx, role, text, tool)"""
    return pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array([r[2] for r in rows], pa.string()),
            "text": pa.array([r[3] for r in rows], pa.string()),
            "tool": pa.array([r[4] for r in rows], pa.string()),
        }
    )


def test_validate_block_flags_every_defect_class():
    """One crafted bucket covering each QA signal: turn_idx holes,
    same-role runs, a conversation not starting at 0, null roles,
    empty/null texts, and tool set on a non-tool role."""
    from tg_data_connector_ray.ops.transcripts import validate_block

    out = validate_block(
        vtbl(
            [
                    # clean conversation
                    ("a", 0, "user", "hi", None),
                    ("a", 1, "assistant", "yo", None),
                    ("a", 2, "tool", "out", "grep"),
                    # gap (1 missing), role repeat, starts at 0
                    ("b", 0, "user", "q", None),
                    ("b", 2, "assistant", "x", None),
                    ("b", 3, "assistant", "y", None),
                    # starts at 4 (deleted head), null role, empty+null text,
                    # tool on an assistant turn
                    ("c", 4, None, "", None),
                    ("c", 5, "assistant", None, "sed"),
                ]
        )
    )
    got = {r["conv_id"]: r for r in out.to_pylist()}
    a, b, c = got["a"], got["b"], got["c"]
    assert (a["n_turns"], a["idx_gaps"], a["role_repeats"]) == (3, 0, 0)
    assert (a["starts_at_zero"], a["null_role"], a["null_text"]) == (1, 0, 0)
    assert a["tool_mismatch"] == 0
    assert (b["n_turns"], b["idx_gaps"], b["role_repeats"]) == (3, 1, 1)
    assert b["starts_at_zero"] == 1
    assert (c["n_turns"], c["starts_at_zero"]) == (2, 0)
    assert (c["null_role"], c["null_text"], c["tool_mismatch"]) == (1, 2, 1)


def test_validate_block_unsorted_and_empty():
    """Row order must not matter (the kernel lexsorts), and an empty
    bucket yields the typed empty table."""
    from tg_data_connector_ray.ops.transcripts import validate_block

    rows = [
        ("z", 3, "assistant", "y", None),
        ("z", 0, "user", "q", None),
        ("z", 1, "assistant", "x", None),
    ]
    got = validate_block(vtbl(rows)).to_pylist()[0]
    # the (1,3) assistant pair counts as a repeat even across the gap —
    # lag(role) semantics, same as the SQL oracle
    assert (got["idx_gaps"], got["role_repeats"], got["starts_at_zero"]) == (1, 1, 1)
    assert validate_block(vtbl([])).num_rows == 0


def test_validate_dataset_matches_kernel(t1):
    """Distributed QA over the golden final table == one-shot kernel over
    the same table read whole (both exchange paths)."""
    import ray

    from tg_data_connector_ray.cdc.golden import golden_apply
    from tg_data_connector_ray.ops.transcripts import (
        transcript_validate,
        validate_block,
    )
    from tg_data_connector_ray.util import list_files

    files = sorted(list_files(t1["cdc_log"], suffix=".parquet"))
    golden = golden_apply([pa.parquet.read_table(f) for f in files])
    want = validate_block(
        golden.select(["conv_id", "turn_idx", "role", "tool", "text"])
    ).sort_by("conv_id")

    for exchange in ("spool", "groupby"):
        out = transcript_validate(
            ray.data.from_arrow(golden), n_coarse=8, exchange=exchange
        )
        got = pa.concat_tables(
            t for t in ray.get(out.to_arrow_refs()) if t.num_rows
        ).sort_by("conv_id")
        assert got.num_rows == want.num_rows > 0
        assert got.equals(want)
