"""Property-based conformance: for ANY event log and ANY batching, the
vectorized fold (with per-column-LSN state decomposition between batches)
must equal the naive golden reducer applied to the ordered global log.

This is the strongest statement of the engine's exactly-once/ordering
contract: duplicates, out-of-order arrival, partial updates, deletes,
resurrections, orphan updates and arbitrary batch boundaries are all
generated adversarially by hypothesis."""

import numpy as np
import pyarrow as pa
import ray
from hypothesis import given, settings, strategies as st

from tg_data_connector_ray.cdc.golden import golden_apply
from tg_data_connector_ray.cdc.merge import fold, state_to_events

_CONVS = ["a", "b"]
_ROLES = [None, "user", "assistant", "tool"]
_TEXTS = [None, "", "x", "yy", "zzz"]
_TOOLS = [None, "search", "code"]


@st.composite
def event_log(draw):
    n = draw(st.integers(min_value=0, max_value=40))
    lsns = draw(
        st.lists(st.integers(1, 60), min_size=n, max_size=n)
    )
    events = []
    for lsn in lsns:
        op = draw(st.sampled_from(["I", "U", "D"]))
        conv = draw(st.sampled_from(_CONVS))
        turn = draw(st.integers(0, 2))
        events.append(
            {
                "lsn": lsn,
                "op": op,
                "conv_id": conv,
                "turn_idx": turn,
                "role": draw(st.sampled_from(_ROLES)) if op != "D" else None,
                "text": draw(st.sampled_from(_TEXTS)) if op != "D" else None,
                "tool": draw(st.sampled_from(_TOOLS)) if op != "D" else None,
                "ts": lsn * 1000 if op != "D" else None,
            }
        )
    # dedupe (conv, turn, lsn) collisions with DIFFERENT payloads: a real
    # log never has two different events at one LSN for one key; keep first
    seen, out = set(), []
    for e in events:
        k = (e["conv_id"], e["turn_idx"], e["lsn"])
        if k not in seen:
            seen.add(k)
            out.append(e)
            if draw(st.booleans()) and len(out) < 45:
                out.append(dict(e))  # exact redelivery
    return out


def to_table(events) -> pa.Table:
    return pa.table(
        {
            "lsn": pa.array([e["lsn"] for e in events], pa.int64()),
            "op": pa.array([e["op"] for e in events], pa.string()),
            "conv_id": pa.array([e["conv_id"] for e in events], pa.string()),
            "turn_idx": pa.array([e["turn_idx"] for e in events], pa.int32()),
            "role": pa.array([e["role"] for e in events], pa.string()),
            "text": pa.array([e["text"] for e in events], pa.string()),
            "tool": pa.array([e["tool"] for e in events], pa.string()),
            "ts": pa.array([e["ts"] for e in events], pa.timestamp("us")),
        }
    )


def run_engine(batches) -> pa.Table:
    state = None
    for b in batches:
        t = to_table(b)
        t = t.append_column("_prio", pa.array(np.ones(t.num_rows, dtype=np.int8)))
        if state is not None:
            t = pa.concat_tables([state_to_events(state), t], promote_options="default")
        state, _ = fold(t)
    if state is None:
        return to_table([])
    live = state.filter(pa.compute.equal(state["_deleted"], False))
    return live.select(["conv_id", "turn_idx", "role", "text", "tool", "ts"]).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")]
    )


@settings(max_examples=150, deadline=None)
@given(events=event_log(), cut=st.lists(st.integers(0, 45), max_size=3))
def test_any_log_any_batching_matches_golden(events, cut):
    golden = golden_apply([to_table(events)])
    bounds = sorted({min(c, len(events)) for c in cut})
    batches, prev = [], 0
    for b in bounds + [len(events)]:
        batches.append(events[prev:b])
        prev = b
    got = run_engine(batches)
    exp = golden.select(["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    assert got.num_rows == exp.num_rows
    assert got.equals(exp), f"\ngot: {got.to_pylist()}\nexp: {exp.to_pylist()}"


def run_engine_delta(batches, compact_every: "int | None" = None) -> pa.Table:
    """The LSM delta-mode shape at fold granularity: each batch folds
    ALONE (policy upsert, like a delta-run file); the read is a final fold
    over all run registers.  With `compact_every`, accumulated runs fold
    into a 'base' register periodically (the inline auto-compaction)."""
    runs = []
    for i, b in enumerate(batches):
        t = to_table(b)
        if t.num_rows == 0:
            continue
        t = t.append_column("_prio", pa.array(np.ones(t.num_rows, dtype=np.int8)))
        delta, _ = fold(t, policy="upsert")
        if delta.num_rows:
            runs.append(delta)
        if compact_every and len(runs) >= compact_every:
            merged, _ = fold(
                pa.concat_tables(
                    [state_to_events(r) for r in runs], promote_options="default"
                ),
                policy="upsert",
            )
            runs = [merged]
    if not runs:
        return to_table([]).select(
            ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
        )
    state, _ = fold(
        pa.concat_tables([state_to_events(r) for r in runs], promote_options="default")
    )
    live = state.filter(pa.compute.equal(state["_deleted"], False))
    return live.select(["conv_id", "turn_idx", "role", "text", "tool", "ts"]).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")]
    )


@settings(max_examples=150, deadline=None)
@given(
    events=event_log(),
    cut=st.lists(st.integers(0, 45), max_size=4),
    compact_every=st.sampled_from([None, 1, 2, 3]),
)
def test_delta_mode_any_batching_matches_golden(events, cut, compact_every):
    """The LSM delta-merge associativity claim, adversarially: ANY random
    log split into ANY run batches, folded per-run with deferred final
    (and optionally periodic) folds, must equal the golden one-shot
    reducer — the invariant cdc/merge.py's delta mode rests on."""
    golden = golden_apply([to_table(events)])
    bounds = sorted({min(c, len(events)) for c in cut})
    batches, prev = [], 0
    for b in bounds + [len(events)]:
        batches.append(events[prev:b])
        prev = b
    got = run_engine_delta(batches, compact_every=compact_every)
    exp = golden.select(["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    assert got.num_rows == exp.num_rows
    assert got.equals(exp), f"\ngot: {got.to_pylist()}\nexp: {exp.to_pylist()}"


@given(event_log(), st.integers(0, 60))
@settings(max_examples=120, deadline=None)
def test_scd2_history_slices_match_golden_at_any_lsn(events, cutoff):
    """SCD2 history conformance, property form: for ANY log,

    - one version per unique (key, lsn) applied event;
    - the versions ACTIVE at any LSN cutoff (valid_from <= c < valid_to,
      not deleted) project exactly to the golden reducer's converged
      table over the log truncated at that cutoff — i.e. the history is
      a correct as-of-LSN index of every intermediate table state."""
    from tg_data_connector_ray.cdc.history import history_block

    t = to_table(events)
    hist = history_block(t)

    uniq = {(e["conv_id"], e["turn_idx"], e["lsn"]) for e in events}
    assert hist.num_rows == len(uniq)

    df = hist.to_pylist()
    active = [
        r
        for r in df
        if r["valid_from"] <= cutoff
        and (r["valid_to"] is None or r["valid_to"] > cutoff)
        and not r["deleted"]
    ]
    golden = golden_apply(
        [to_table([e for e in events if e["lsn"] <= cutoff])]
    ).to_pylist()
    key = lambda r: (r["conv_id"], r["turn_idx"])
    got = {key(r): (r["role"], r["text"], r["tool"], r["ts"]) for r in active}
    want = {key(r): (r["role"], r["text"], r["tool"], r["ts"]) for r in golden}
    assert got == want


# ---------------------------------------------------------------------------
# change-feed algebra, end-to-end on disk: for ANY log and ANY run split,
# the feed is exactly the state diff — applying it to the older time-travel
# state reconstructs the newer one, and consecutive narrow windows compose
# to the wide window.  This pins the incremental as-of fold (upsert) AND
# the two-fold drop fallback in cdc/pipeline.change_feed against the same
# adversarial inputs as the fold itself (orphan updates, redeliveries,
# resurrections, cross-run out-of-order arrival).

_PAYLOAD = ["role", "text", "tool", "ts"]


def _live_map(t: pa.Table) -> dict:
    rows = t.select(["conv_id", "turn_idx"] + _PAYLOAD).to_pylist()
    return {(r["conv_id"], r["turn_idx"]): tuple(r[c] for c in _PAYLOAD) for r in rows}


def _apply_feed(state: dict, feed: pa.Table) -> dict:
    out = dict(state)
    for r in feed.select(["op", "conv_id", "turn_idx"] + _PAYLOAD).to_pylist():
        k = (r["conv_id"], r["turn_idx"])
        if r["op"] == "D":
            out.pop(k, None)
        else:
            out[k] = tuple(r[c] for c in _PAYLOAD)
    return out


@settings(max_examples=8, deadline=None)
@given(
    events=event_log(),
    cuts=st.tuples(st.integers(0, 45), st.integers(0, 45)),
    policy=st.sampled_from(["upsert", "drop"]),
)
def test_change_feed_composes_and_applies_any_log(events, cuts, policy):
    import os
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    from tg_data_connector_ray.cdc.config import CdcConfig
    from tg_data_connector_ray.cdc.pipeline import apply_cdc, change_feed, time_travel

    bounds = sorted({min(c, len(events)) for c in cuts})
    segments, prev = [], 0
    for b in bounds + [len(events)]:
        if events[prev:b]:
            segments.append(events[prev:b])
        prev = b
    if len(segments) < 2:
        return  # nothing to window over

    root = tempfile.mkdtemp(prefix="cfprop-")
    try:
        cfg = CdcConfig(
            out_dir=os.path.join(root, "t"),
            num_partitions=2,
            merge_strategy="delta",
            orphan_updates=policy,
        )
        run_ids = []
        for i, seg in enumerate(segments):
            f = os.path.join(root, f"log{i}.parquet")
            pq.write_table(to_table(seg), f)
            rid = f"r{i}"
            apply_cdc([f], cfg, run_id=rid)
            run_ids.append(rid)

        live = {
            rid: _live_map(time_travel(cfg, rid, sort=True)) for rid in run_ids
        }
        # narrow windows: each feed transforms the prior live state into
        # the next — and therefore composes across the whole journal
        state = dict(live[run_ids[0]])
        for a, b in zip(run_ids, run_ids[1:]):
            f = change_feed(cfg, a, b).to_arrow_refs()
            feed = pa.concat_tables([ray.get(r) for r in f])
            state = _apply_feed(state, feed)
            assert state == live[b], (policy, a, b)
        # wide window: one feed jumps first -> last to the same state
        wide = pa.concat_tables(
            [ray.get(r) for r in change_feed(cfg, run_ids[0], run_ids[-1]).to_arrow_refs()]
        )
        assert _apply_feed(live[run_ids[0]], wide) == live[run_ids[-1]], policy
    finally:
        shutil.rmtree(root, ignore_errors=True)
