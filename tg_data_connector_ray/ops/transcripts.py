"""Training-pair extraction over converged transcript tables.

`sft_pairs` turns the CDC engine's merged conversation table into
supervised fine-tuning examples: each assistant turn with non-null text is
paired with the text of the latest PRIOR user turn in the same
conversation (turns with null text are skipped on both sides — an empty
prompt or response is not a training example).  This is the canonical
"chat log -> SFT dataset" step of an LLM data pipeline; the reference
connector has no analogue (SURVEY.md §2) — the operator is defined by the
training-data mandate, not ported code.

Scale design: one coarse hash shuffle on ``conv_id`` co-locates whole
conversations (per-task rows ~= table/n_coarse); inside each bucket a
single numpy pass (lexsort + running-max "latest prior user turn" index)
emits pairs — no per-conversation Python dispatch, no driver
materialization.  Output streams as Arrow blocks, O(assistant turns).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..cdc.merge import _col_np

PAIRS_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("prompt", pa.string()),
        ("response", pa.string()),
    ]
)


def _empty_pairs() -> pa.Table:
    return pa.table({f.name: pa.array([], f.type) for f in PAIRS_SCHEMA})


def sft_pairs_block(g: pa.Table) -> pa.Table:
    """Vectorized pair extraction over one co-located conversation bucket."""
    if "_cg" in g.column_names:
        g = g.drop_columns(["_cg"])
    if g.num_rows == 0:
        return _empty_pairs()

    conv_dict = _col_np(g, "conv_id").dictionary_encode()
    conv_codes = conv_dict.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    turn = _col_np(g, "turn_idx").to_numpy(zero_copy_only=False).astype(np.int64)
    role = _col_np(g, "role").to_numpy(zero_copy_only=False)  # object array
    text = _col_np(g, "text")

    order = np.lexsort((turn, conv_codes))
    conv_codes, turn, role = conv_codes[order], turn[order], role[order]
    text_valid = ~np.asarray(text.is_null()).astype(bool)[order]

    n = len(order)
    idx = np.arange(n, dtype=np.int64)
    new_conv = np.concatenate([[True], conv_codes[1:] != conv_codes[:-1]])
    conv_start = np.maximum.accumulate(np.where(new_conv, idx, -1))

    # latest STRICTLY-PRIOR user turn with text: inclusive running max of
    # user-turn indices, shifted down one row, clamped to the conversation
    is_user = (role == "user") & text_valid
    runmax = np.maximum.accumulate(np.where(is_user, idx, -1))
    prior = np.concatenate([[-1], runmax[:-1]])
    prior = np.where(prior >= conv_start, prior, -1)

    is_resp = (role == "assistant") & text_valid & (prior >= 0)
    if not is_resp.any():
        return _empty_pairs()
    r = idx[is_resp]
    return pa.table(
        {
            "conv_id": conv_dict.take(pa.array(order[r])).cast(pa.string()),
            "turn_idx": pa.array(turn[r], type=pa.int32()),
            "prompt": text.take(pa.array(order[prior[r]])),
            "response": text.take(pa.array(order[r])),
        },
        schema=PAIRS_SCHEMA,
    )


def _conv_grouped(transcripts, kernel, n_coarse: int, exchange: str, name: str):
    """Shared conversation co-location: spool exchange by default (one
    partitioned write + one read — ~3x faster than the sort-based groupby
    shuffle on text payloads, see pipelines/exchange.py), groupby kept as
    the in-memory comparison path."""
    from ..util import stable_hash_strings

    def part_of(t: pa.Table):
        return stable_hash_strings(t["conv_id"]) % np.uint64(n_coarse)

    if exchange == "spool":
        from ..pipelines.exchange import spooled_grouped_map

        return spooled_grouped_map(transcripts, kernel, part_of, n_coarse, name=name)

    def add_cg(t: pa.Table) -> pa.Table:
        return t.append_column("_cg", pa.array(part_of(t).astype(np.int32)))

    return (
        transcripts.map_batches(add_cg, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_cg")
        .map_groups(kernel, batch_format="pyarrow")
    )


def sft_pairs(transcripts, n_coarse: int = 64, exchange: str = "spool"):
    """(prompt, response) pairs Dataset from a transcript-schema Dataset.

    ``transcripts`` needs columns conv_id (string), turn_idx, role, text —
    e.g. ``cdc.pipeline.read_final_table`` output, or any conversation
    table.  ``n_coarse`` bounds per-task memory at ~rows/n_coarse.
    """
    return _conv_grouped(transcripts, sft_pairs_block, n_coarse, exchange, "sft")


RENDER_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("n_turns", pa.int64()),
        ("rendered", pa.string()),
    ]
)


def render_block(g: pa.Table) -> pa.Table:
    """Vectorized conversation rendering over one co-located bucket: sort
    by (conv, turn), build per-turn lines with one element-wise join, then
    one ListArray-backed `binary_join` per conversation segment — string
    assembly stays in Arrow C kernels, no per-conversation Python loop."""
    if "_cg" in g.column_names:
        g = g.drop_columns(["_cg"])
    if g.num_rows == 0:
        return pa.table({f.name: pa.array([], f.type) for f in RENDER_SCHEMA})

    conv_dict = _col_np(g, "conv_id").dictionary_encode()
    conv_codes = conv_dict.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    turn = _col_np(g, "turn_idx").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((turn, conv_codes))
    conv_codes = conv_codes[order]

    import pyarrow.compute as pc

    take = pa.array(order)
    lines = pc.binary_join_element_wise(
        pc.fill_null(_col_np(g, "role").take(take), ""),
        pc.fill_null(_col_np(g, "text").take(take), ""),
        ": ",
    )
    n = len(order)
    new_conv = np.concatenate([[True], conv_codes[1:] != conv_codes[:-1]])
    starts = np.nonzero(new_conv)[0]
    offsets = np.concatenate([starts, [n]]).astype(np.int64)
    rendered = pc.binary_join(
        pa.LargeListArray.from_arrays(pa.array(offsets), lines), "\n"
    )
    return pa.table(
        {
            "conv_id": conv_dict.take(pa.array(order[starts])).cast(pa.string()),
            "n_turns": pa.array(np.diff(offsets)),
            "rendered": rendered.cast(pa.string()),
        },
        schema=RENDER_SCHEMA,
    )


def render_conversations(transcripts, n_coarse: int = 64, exchange: str = "spool"):
    """One training document per conversation: turns ordered by turn_idx,
    each rendered as "role: text" (nulls as empty), newline-joined.  The
    canonical "merged chat table -> pretraining/SFT corpus" step.

    Same exchange shape as `sft_pairs`: one conv_id hash co-location,
    ~rows/n_coarse per task, output streams as Arrow blocks.
    """
    return _conv_grouped(transcripts, render_block, n_coarse, exchange, "render")


CLIP_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("suffix_chars", pa.int64()),
    ]
)


def clip_block(g: pa.Table, budget: int) -> pa.Table:
    """Context-window clip over one co-located bucket: per conversation,
    keep the longest SUFFIX of turns whose total text length fits the
    budget (the newest-context-first truncation used to fit chat history
    into a model context).  One lexsort + segmented reverse-cumsum —
    vectorized, no per-conversation dispatch."""
    if "_cg" in g.column_names:
        g = g.drop_columns(["_cg"])
    if g.num_rows == 0:
        return pa.table({f.name: pa.array([], f.type) for f in CLIP_SCHEMA})

    import pyarrow.compute as pc

    conv_dict = _col_np(g, "conv_id").dictionary_encode()
    conv_codes = conv_dict.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    turn = _col_np(g, "turn_idx").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((turn, conv_codes))
    conv_codes, turn = conv_codes[order], turn[order]
    take = pa.array(order)
    text = _col_np(g, "text").take(take)
    lens = (
        pc.fill_null(pc.utf8_length(text), 0)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )

    n = len(order)
    new_conv = np.concatenate([[True], conv_codes[1:] != conv_codes[:-1]])
    starts = np.nonzero(new_conv)[0]
    counts = np.diff(np.concatenate([starts, [n]]))
    cs = np.cumsum(lens)
    seg_base = np.repeat(cs[starts] - lens[starts], counts)
    cum_in_seg = cs - seg_base
    totals = np.repeat(cum_in_seg[starts + counts - 1], counts)
    suffix = totals - cum_in_seg + lens

    keep = suffix <= budget
    if not keep.any():
        return pa.table({f.name: pa.array([], f.type) for f in CLIP_SCHEMA})
    kp = pa.array(keep)
    return pa.table(
        {
            "conv_id": conv_dict.take(pa.array(order[keep])).cast(pa.string()),
            "turn_idx": pa.array(turn[keep], type=pa.int32()),
            "role": _col_np(g, "role").take(take).filter(kp),
            "text": text.filter(kp),
            "suffix_chars": pa.array(suffix[keep]),
        },
        schema=CLIP_SCHEMA,
    )


def clip_to_context(transcripts, budget: int, n_coarse: int = 64,
                    exchange: str = "spool"):
    """Per-conversation context clipping: the kept rows are exactly the
    turns whose suffix (this turn through the conversation's last) fits
    `budget` total text chars — a conversation whose final turn alone
    exceeds the budget contributes nothing.  Same exchange shape as the
    other conversation-grouped ops."""
    from functools import partial

    return _conv_grouped(
        transcripts, partial(clip_block, budget=budget), n_coarse, exchange, "clip"
    )


# ---------------------------------------------------------------------------
# Per-conversation stats + incremental view maintenance from the change feed
# ---------------------------------------------------------------------------

STATS_NAMES = ("n_turns", "n_tool", "total_chars")


def _stats_partial(t: pa.Table) -> pa.Table:
    """Thin per-batch partial of the conversation-stats view: one row per
    conv_id seen in the batch with its local turn/tool/char sums."""
    import pyarrow.compute as pc

    thin = pa.table(
        {
            "conv_id": t["conv_id"],
            "n_turns": pa.array(np.ones(t.num_rows, np.int64)),
            "n_tool": pc.is_valid(t["tool"]).cast(pa.int64()),
            "total_chars": pc.fill_null(pc.utf8_length(t["text"]), 0).cast(
                pa.int64()
            ),
        }
    )
    g = thin.group_by("conv_id").aggregate(
        [("n_turns", "sum"), ("n_tool", "sum"), ("total_chars", "sum")]
    )
    agg = [c for c in g.column_names if c != "conv_id"]
    return g.select(["conv_id"] + agg).rename_columns(["conv_id", *STATS_NAMES])


def conv_stats(transcripts, n_coarse: int = 64, exchange: str = "spool"):
    """Per-conversation analytics view over a streaming transcripts
    Dataset: live turn count, tool-call turn count, total text chars.
    Per-batch Arrow partials, then one coarse-bucket string-keyed
    distributed aggregate — never materializes the table."""
    from ..pipelines.relational import grouped_arrow_aggregate

    thin = transcripts.map_batches(
        _stats_partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return grouped_arrow_aggregate(
        thin,
        "conv_id",
        [("n_turns", "sum"), ("n_tool", "sum"), ("total_chars", "sum")],
        list(STATS_NAMES),
        n_coarse=n_coarse,
        exchange=exchange,
    )


def stats_feed_deltas(t: pa.Table) -> pa.Table:
    """One change-feed batch (with before-images) -> per-row deltas of the
    conversation-stats view.  The preimage null conventions make one
    uniform formula cover all three ops: I rows have null preimage
    (old contribution 0), D rows null new payload (new contribution 0),
    U rows subtract old and add new."""
    import pyarrow.compute as pc

    op = t["op"].combine_chunks()
    d_live = pc.subtract(
        pc.equal(op, "I").cast(pa.int64()), pc.equal(op, "D").cast(pa.int64())
    )
    d_tool = pc.subtract(
        pc.is_valid(t["tool"]).cast(pa.int64()),
        pc.is_valid(t["tool_old"]).cast(pa.int64()),
    )
    d_chars = pc.subtract(
        pc.fill_null(pc.utf8_length(t["text"]), 0).cast(pa.int64()),
        pc.fill_null(pc.utf8_length(t["text_old"]), 0).cast(pa.int64()),
    )
    return pa.table(
        {
            "conv_id": t["conv_id"],
            "n_turns": d_live,
            "n_tool": d_tool,
            "total_chars": d_chars,
        }
    )


def apply_stats_feed(prior, feed, n_coarse: int = 64, exchange: str = "spool"):
    """Incremental view maintenance: fold a change feed (emitted with
    ``include_before=True``) into a prior ``conv_stats`` snapshot and
    return the updated snapshot — cost O(prior + feed), no rescan of the
    transcripts table.  Union the snapshot rows with per-row feed deltas,
    one coarse-bucket sum, drop conversations whose live turn count hit
    zero (fully deleted).  Exactly equal to recomputing ``conv_stats``
    on the as-of-to_run table (pinned by test + oracle)."""
    import pyarrow.compute as pc

    from ..pipelines.relational import grouped_arrow_aggregate

    deltas = feed.map_batches(
        stats_feed_deltas, batch_format="pyarrow", zero_copy_batch=True
    )
    cols = ["conv_id", *STATS_NAMES]
    merged = grouped_arrow_aggregate(
        prior.select_columns(cols).union(deltas.select_columns(cols)),
        "conv_id",
        [("n_turns", "sum"), ("n_tool", "sum"), ("total_chars", "sum")],
        list(STATS_NAMES),
        n_coarse=n_coarse,
        # a snapshot + 96-partition feed is exactly the many-small-blocks
        # shape where the sort shuffle's block-count overhead dominates
        exchange=exchange,
    )

    def live_only(b: pa.Table) -> pa.Table:
        return b.filter(pc.greater(b["n_turns"], 0))

    out = merged.map_batches(
        live_only, batch_format="pyarrow", zero_copy_batch=True
    )
    # a spooled upstream's reclaim lease rides the Dataset OBJECT, not the
    # plan — wrapping in another map would drop it and the spool dir would
    # be reclaimed before this (lazy) dataset ever executes
    if hasattr(merged, "_spool_keepalive"):
        out._spool_keepalive = merged._spool_keepalive
    return out


# ---------------------------------------------------------------------------
# Tool-chain analytics + boilerplate detection
# ---------------------------------------------------------------------------

TRANSITIONS_SCHEMA = pa.schema(
    [
        ("src_tool", pa.string()),
        ("dst_tool", pa.string()),
        ("n", pa.int64()),
    ]
)


def _empty_transitions() -> pa.Table:
    return pa.table({f.name: pa.array([], f.type) for f in TRANSITIONS_SCHEMA})


def tool_transitions_block(g: pa.Table) -> pa.Table:
    """Per-bucket PARTIAL of the tool-transition matrix: restrict to
    tool-call turns (tool non-null), order by (conv, turn), pair every
    call with the conversation's PREVIOUS call (not necessarily the
    adjacent turn), then count per (src, dst) with one Arrow group_by —
    a bucket emits at most |tools|^2 rows regardless of input size."""
    import pyarrow.compute as pc

    if "_cg" in g.column_names:
        g = g.drop_columns(["_cg"])
    g = g.filter(pc.is_valid(g["tool"]))
    if g.num_rows < 2:
        return _empty_transitions()

    conv_codes = (
        _col_np(g, "conv_id")
        .dictionary_encode()
        .indices.to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    turn = _col_np(g, "turn_idx").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((turn, conv_codes))
    conv_codes = conv_codes[order]
    same = conv_codes[1:] == conv_codes[:-1]
    if not same.any():
        return _empty_transitions()
    tool = _col_np(g, "tool").take(pa.array(order))
    m = pa.array(same)
    n = g.num_rows
    pairs = pa.table(
        {
            "src_tool": tool.slice(0, n - 1).filter(m),
            "dst_tool": tool.slice(1, n - 1).filter(m),
        }
    )
    agg = pairs.group_by(["src_tool", "dst_tool"]).aggregate([([], "count_all")])
    return pa.table(
        {
            "src_tool": agg["src_tool"],
            "dst_tool": agg["dst_tool"],
            "n": agg["count_all"].cast(pa.int64()),
        },
        schema=TRANSITIONS_SCHEMA,
    )


def tool_transitions(transcripts, n_coarse: int = 64, exchange: str = "spool"):
    """Tool-call transition matrix over a transcripts Dataset: for each
    conversation's tool-call turns in turn order, count (previous tool ->
    this tool) bigrams globally.  The canonical "which tool follows
    which" agent-behavior analytics.

    Shape: one conv_id co-location (whole conversations per bucket), a
    vectorized per-bucket partial of at most |tools|^2 rows, then a
    BOUNDED driver finish over the n_coarse x tools^2 partial rows (the
    same tiny-merge pattern as the per-block top-k finishers) — a second
    distributed exchange for a few dozen rows measured ~0.7 s of pure
    orchestration at the bench tier."""
    import ray

    partials = _conv_grouped(
        transcripts, tool_transitions_block, n_coarse, exchange, "tooltrans"
    )
    blocks = [b for b in ray.get(partials.to_arrow_refs()) if b.num_rows]
    if not blocks:
        return _empty_transitions()
    t = pa.concat_tables(blocks, promote_options="default")
    agg = t.group_by(["src_tool", "dst_tool"]).aggregate([("n", "sum")])
    out = pa.table(
        {
            "src_tool": agg["src_tool"],
            "dst_tool": agg["dst_tool"],
            "n": agg["n_sum"].cast(pa.int64()),
        },
        schema=TRANSITIONS_SCHEMA,
    )
    return out.sort_by([("src_tool", "ascending"), ("dst_tool", "ascending")])


def boilerplate_texts(
    transcripts,
    min_convs: int = 2,
    role: str = "assistant",
    n_coarse: int = 64,
    exchange: str = "spool",
):
    """Boilerplate detection: exact `role` texts that recur across at
    least `min_convs` DISTINCT conversations, with global occurrence
    counts — the "canned response / template contamination" filter of a
    training-data pipeline.

    Scale design: a per-batch partial collapses each batch to distinct
    (text, conv_id) rows with a local count, so the shuffle moves one
    row per (text, conversation) pair, not per turn; texts are then
    hash-co-located and finished with ONE Arrow group_by per bucket
    (sum + count_distinct).  At 100 TB you would key the exchange on
    hash128(text) and carry an exemplar — here the fixture's texts are
    the key directly so the oracle can compare them verbatim."""
    import pyarrow.compute as pc

    from ..pipelines.exchange import carry_spool_lease
    from ..pipelines.relational import grouped_arrow_aggregate

    def thin(t: pa.Table) -> pa.Table:
        keep = pc.and_kleene(
            pc.equal(t["role"], role), pc.is_valid(t["text"])
        )
        t = t.filter(pc.fill_null(keep, False))
        g = (
            t.select(["text", "conv_id"])
            .group_by(["text", "conv_id"])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {
                "text": g["text"],
                "conv_id": g["conv_id"],
                "n_local": g["count_all"].cast(pa.int64()),
            }
        )

    thin_ds = transcripts.map_batches(
        thin, batch_format="pyarrow", zero_copy_batch=True
    )
    merged = grouped_arrow_aggregate(
        thin_ds,
        "text",
        [("n_local", "sum"), ("conv_id", "count_distinct")],
        ["n_turns", "n_convs"],
        n_coarse=n_coarse,
        exchange=exchange,
    )

    def finish(b: pa.Table) -> pa.Table:
        if "n_convs" not in b.column_names:  # empty-input zero-schema block
            return pa.table(
                {
                    "text": pa.array([], pa.string()),
                    "n_turns": pa.array([], pa.int64()),
                    "n_convs": pa.array([], pa.int64()),
                }
            )
        b = b.filter(pc.greater_equal(b["n_convs"], min_convs))
        return b.set_column(
            b.column_names.index("n_convs"), "n_convs", b["n_convs"].cast(pa.int64())
        )

    out = merged.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
    return carry_spool_lease(merged, out)


def tool_usage(transcripts, n_coarse: int = 64, exchange: str = "spool"):
    """Per-tool call counts over a streaming transcripts Dataset — the
    second maintained view (see apply_tool_usage_feed): per-batch Arrow
    count partials, one coarse-bucket sum keyed by tool."""
    import pyarrow.compute as pc

    from ..pipelines.relational import grouped_arrow_aggregate

    def partial(t: pa.Table) -> pa.Table:
        s = t.filter(pc.is_valid(t["tool"]))
        g = s.select(["tool"]).group_by("tool").aggregate([([], "count_all")])
        return pa.table(
            {"tool": g["tool"], "n_calls": g["count_all"].cast(pa.int64())}
        )

    thin = transcripts.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return grouped_arrow_aggregate(
        thin, "tool", [("n_calls", "sum")], ["n_calls"],
        n_coarse=n_coarse, exchange=exchange,
    )


def tool_usage_feed_deltas(t: pa.Table) -> pa.Table:
    """One change-feed batch (with before-images) -> per-tool count
    deltas.  Unlike the conv-stats view, the GROUP KEY itself can change
    (a U moving a turn from tool 'a' to tool 'b'), so a feed row
    contributes up to TWO delta rows: (tool_old, -1) and (tool_new, +1).
    The preimage null conventions again make one formula total: I rows
    have a null preimage (add only), D rows a null postimage (subtract
    only), U rows both sides."""
    import pyarrow.compute as pc

    old = t.filter(pc.is_valid(t["tool_old"]))
    new = t.filter(pc.is_valid(t["tool"]))
    return pa.table(
        {
            "tool": pa.concat_arrays(
                [old["tool_old"].combine_chunks(), new["tool"].combine_chunks()]
            ),
            "n_calls": pa.array(
                np.concatenate(
                    [
                        np.full(old.num_rows, -1, np.int64),
                        np.ones(new.num_rows, np.int64),
                    ]
                )
            ),
        }
    )


def apply_tool_usage_feed(prior, feed, n_coarse: int = 64, exchange: str = "spool"):
    """Incremental maintenance of the per-tool counts: union the prior
    snapshot with the feed's ± delta rows, one coarse-bucket sum, drop
    tools whose count reached zero.  O(prior + feed); equals recomputing
    `tool_usage` on the as-of-to_run table (oracle-pinned)."""
    import pyarrow.compute as pc

    from ..pipelines.relational import grouped_arrow_aggregate

    deltas = feed.map_batches(
        tool_usage_feed_deltas, batch_format="pyarrow", zero_copy_batch=True
    )
    cols = ["tool", "n_calls"]
    merged = grouped_arrow_aggregate(
        prior.select_columns(cols).union(deltas.select_columns(cols)),
        "tool", [("n_calls", "sum")], ["n_calls"],
        n_coarse=n_coarse, exchange=exchange,
    )
    from ..pipelines import exchange as _ex

    out = merged.map_batches(
        lambda b: b.filter(pc.greater(b["n_calls"], 0)),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return _ex.carry_spool_lease(merged, out)


# ---------------------------------------------------------------------------
# Join-shaped maintained view: per-turn rows enriched with conversation
# aggregates (turns JOIN conv-level stats on conv_id)
# ---------------------------------------------------------------------------

TURN_CONTEXT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("tool", pa.string()),
        ("text_chars", pa.int64()),
        ("conv_turns", pa.int64()),
        ("conv_chars", pa.int64()),
    ]
)

_TCTX_IN_COLS = ["conv_id", "turn_idx", "role", "tool", "text"]


def turn_context_block(g: pa.Table) -> pa.Table:
    """One co-located bucket of the turn-context view: every live turn
    carries its conversation's turn count and total characters — the
    fact-side of a `turns JOIN conv_stats ON conv_id` evaluated without a
    join: dictionary-encode conv_id, two np.bincount segment reductions,
    one gather back to row order.  Exact int64 (bincount's float64
    accumulator is exact for integer weights far below 2^53 — a single
    conversation's character total)."""
    import pyarrow.compute as pc

    if "_cg" in g.column_names:
        g = g.drop_columns(["_cg"])
    if g.num_rows == 0:
        return TURN_CONTEXT_SCHEMA.empty_table()

    conv_dict = _col_np(g, "conv_id").dictionary_encode()
    codes = conv_dict.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    n_codes = len(conv_dict.dictionary)
    chars = (
        pc.fill_null(pc.utf8_length(g["text"]), 0)
        .cast(pa.int64())
        .to_numpy(zero_copy_only=False)
    )
    conv_turns = np.bincount(codes, minlength=n_codes).astype(np.int64)
    conv_chars = np.bincount(codes, weights=chars, minlength=n_codes).astype(
        np.int64
    )
    return pa.table(
        {
            "conv_id": g["conv_id"],
            "turn_idx": g["turn_idx"].cast(pa.int32()),
            "role": g["role"],
            "tool": g["tool"],
            "text_chars": pa.array(chars),
            "conv_turns": pa.array(conv_turns[codes]),
            "conv_chars": pa.array(conv_chars[codes]),
        },
        schema=TURN_CONTEXT_SCHEMA,
    )


def turn_context(transcripts, n_coarse: int = 64, exchange: str = "spool"):
    """Per-turn view enriched with conversation-level aggregates — the
    JOIN-shaped sibling of the `conv_stats` / `tool_usage` maintained
    views (view = turns ⋈ per-conv aggregate on conv_id).  Same exchange
    shape as `sft_pairs`: one conv_id hash co-location, then a vectorized
    per-bucket kernel; output streams as Arrow blocks, O(turns)."""
    return _conv_grouped(
        transcripts.select_columns(_TCTX_IN_COLS),
        turn_context_block,
        n_coarse,
        exchange,
        "tctx",
    )


# ---------------------------------------------------------------------------
# Conversation-structure validation (chat-log QA)
# ---------------------------------------------------------------------------

VALIDATE_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("n_turns", pa.int64()),
        ("idx_gaps", pa.int64()),
        ("role_repeats", pa.int64()),
        ("starts_at_zero", pa.int64()),
        ("null_role", pa.int64()),
        ("null_text", pa.int64()),
        ("tool_mismatch", pa.int64()),
    ]
)


def validate_block(g: pa.Table) -> pa.Table:
    """Structural QA over one co-located bucket — the signals a training
    pipeline checks before rendering chat logs into documents: per
    conversation, turn_idx holes (deleted/missing turns), consecutive
    same-role turns (broken user/assistant alternation), whether the
    conversation still starts at turn 0, null/empty payload counts, and
    tool values on non-tool roles (an orphan-update register can set
    `tool` while the visible role differs).  One lexsort, then segment
    reductions (np.bincount over conv codes) — no per-conversation
    dispatch."""
    import pyarrow.compute as pc

    if "_cg" in g.column_names:
        g = g.drop_columns(["_cg"])
    if g.num_rows == 0:
        return VALIDATE_SCHEMA.empty_table()

    conv_dict = _col_np(g, "conv_id").dictionary_encode()
    codes = conv_dict.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    n_codes = len(conv_dict.dictionary)
    turn = _col_np(g, "turn_idx").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((turn, codes))
    codes_s, turn_s = codes[order], turn[order]
    take = pa.array(order)

    role_dict = _col_np(g, "role").take(take).dictionary_encode()
    r = pc.fill_null(role_dict.indices, -1).to_numpy(zero_copy_only=False)
    r = r.astype(np.int64)
    roles = role_dict.dictionary.to_pylist()
    tool_code = roles.index("tool") if "tool" in roles else -2

    text_s = _col_np(g, "text").take(take)
    text_empty = (
        pc.equal(pc.fill_null(pc.utf8_length(text_s), 0), 0)
        .to_numpy(zero_copy_only=False)
    )
    tool_set = pc.is_valid(_col_np(g, "tool").take(take)).to_numpy(
        zero_copy_only=False
    )

    same_conv = codes_s[1:] == codes_s[:-1]
    pair_codes = codes_s[1:]
    gaps = same_conv & (turn_s[1:] - turn_s[:-1] > 1)
    repeats = same_conv & (r[1:] == r[:-1]) & (r[1:] >= 0)

    n_turns = np.bincount(codes_s, minlength=n_codes)
    idx_gaps = np.bincount(pair_codes[gaps], minlength=n_codes)
    role_repeats = np.bincount(pair_codes[repeats], minlength=n_codes)
    null_role = np.bincount(codes_s[r < 0], minlength=n_codes)
    null_text = np.bincount(codes_s[text_empty], minlength=n_codes)
    mism = tool_set & (r != tool_code)
    tool_mismatch = np.bincount(codes_s[mism], minlength=n_codes)
    starts = np.concatenate([[0], np.nonzero(~same_conv)[0] + 1])
    starts_at_zero = np.zeros(n_codes, np.int64)
    starts_at_zero[codes_s[starts]] = (turn_s[starts] == 0).astype(np.int64)

    return pa.table(
        {
            "conv_id": conv_dict.dictionary.cast(pa.string()),
            "n_turns": pa.array(n_turns.astype(np.int64)),
            "idx_gaps": pa.array(idx_gaps.astype(np.int64)),
            "role_repeats": pa.array(role_repeats.astype(np.int64)),
            "starts_at_zero": pa.array(starts_at_zero),
            "null_role": pa.array(null_role.astype(np.int64)),
            "null_text": pa.array(null_text.astype(np.int64)),
            "tool_mismatch": pa.array(tool_mismatch.astype(np.int64)),
        },
        schema=VALIDATE_SCHEMA,
    )


def transcript_validate(transcripts, n_coarse: int = 64, exchange: str = "spool"):
    """Per-conversation structural QA view (see `validate_block`) — the
    gate a transcript corpus passes before SFT-pair extraction or
    rendering.  Same exchange shape as the other conversation views:
    one conv_id hash co-location, vectorized per-bucket kernel,
    O(conversations) output."""
    return _conv_grouped(
        transcripts.select_columns(_TCTX_IN_COLS),
        validate_block,
        n_coarse,
        exchange,
        "tval",
    )


class _NotInConvs:
    """Instance-shipped anti-filter: drop rows whose conv_id is in the
    (bounded) changed-key set.  The value_set rides the instance into the
    object store once, not per-batch."""

    def __init__(self, conv_ids: "list[str]"):
        self.value_set = pa.array(conv_ids, type=pa.string())

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(
            pc.invert(pc.is_in(t["conv_id"], value_set=self.value_set))
        )


def apply_turn_context_feed(
    prior,
    feed,
    cfg,
    max_changed_convs: int = 50_000,
    n_coarse: int = 64,
    exchange: str = "spool",
):
    """Incremental maintenance of the JOIN-shaped view: because every
    group key the feed touches invalidates ALL of that conversation's
    view rows (one new turn changes conv_turns on every sibling row),
    the delta algebra is per-KEY re-derivation, not per-row ± folding —
    (1) distinct changed conv_ids from the feed, (2) pruned point-read
    of ONLY those conversations' live turns from the converged table
    (`read_convs`: O(distinct partitions of the keys), never a table
    scan), (3) re-run the view kernel on that slice, (4) union with the
    prior snapshot anti-filtered by the changed set.  Cost O(prior scan
    + feed + changed convs' rows); fully-deleted conversations drop out
    (their point-read returns no live rows), inserts/resurrections
    appear.

    The feed must end at the table's current head (`read_convs` reads
    live state).  Past ``max_changed_convs`` the changed-set point-read
    and broadcast anti-filter stop being "small side" (read_convs
    returns driver-side rows) — fall back to a full recompute, the same
    bound-then-fallback contract as the broadcast joins."""
    import ray

    from ..cdc.pipeline import read_convs, read_final_table

    changed = feed.unique("conv_id")
    if not changed:
        return prior
    if len(changed) > max_changed_convs:
        return turn_context(
            read_final_table(cfg, columns=_TCTX_IN_COLS),
            n_coarse=n_coarse,
            exchange=exchange,
        )
    changed = sorted(changed)
    fresh_rows = read_convs(cfg, changed).select(_TCTX_IN_COLS)
    fresh = ray.data.from_arrow(turn_context_block(fresh_rows))
    kept = prior.map_batches(
        _NotInConvs(changed), batch_format="pyarrow", zero_copy_batch=True
    )
    from ..pipelines import exchange as _ex

    return _ex.carry_spool_lease(prior, kept.union(fresh))
