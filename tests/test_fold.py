"""Unit tests for the vectorized LSN fold — no Ray required.

Mirrors the semantics contract in cdc/golden.py; every case is also checked
against the naive golden reducer so the two oracles arbitrate each other.
"""

import numpy as np
import pyarrow as pa
import pytest

from tg_data_connector_ray.cdc.golden import golden_apply
from tg_data_connector_ray.cdc.merge import fold, state_to_events
from tg_data_connector_ray.fixtures import CDC_SCHEMA, make_fixture, TIERS


def ev_table(rows):
    cols = {f.name: [] for f in CDC_SCHEMA}
    for r in rows:
        lsn, op, conv, turn = r[:4]
        role, text, tool, ts = (list(r[4:]) + [None] * 4)[:4]
        for k, v in zip(cols, (lsn, op, conv, turn, role, text, tool, ts or 0)):
            cols[k].append(v)
    t = pa.table(
        {
            "lsn": pa.array(cols["lsn"], pa.int64()),
            "op": pa.array(cols["op"], pa.string()),
            "conv_id": pa.array(cols["conv_id"], pa.string()),
            "turn_idx": pa.array(cols["turn_idx"], pa.int32()),
            "role": pa.array(cols["role"], pa.string()),
            "text": pa.array(cols["text"], pa.string()),
            "tool": pa.array(cols["tool"], pa.string()),
            "ts": pa.array(cols["ts"], pa.timestamp("us")),
        }
    )
    return t


def run_fold(rows, policy="upsert", state=None):
    t = ev_table(rows)
    t = t.append_column("_prio", pa.array(np.ones(t.num_rows, dtype=np.int8)))
    if state is not None:
        t = pa.concat_tables([state_to_events(state), t], promote_options="default")
    return fold(t, policy=policy)


def live_rows(state):
    return state.filter(pa.compute.equal(state["_deleted"], False)).to_pylist()


def test_insert_update_delete_basic():
    state, _ = run_fold(
        [
            (1, "I", "c1", 0, "user", "hello", None, 10),
            (2, "U", "c1", 0, None, "hello edited", None, 20),
            (3, "I", "c1", 1, "assistant", "reply", None, 30),
            (4, "D", "c1", 1, None, None, None, 40),
        ]
    )
    rows = live_rows(state)
    assert len(rows) == 1
    assert rows[0]["text"] == "hello edited"
    assert rows[0]["role"] == "user"  # U left role null -> unchanged
    assert rows[0]["_lsn"] == 2
    # tombstone retained in state
    assert state.num_rows == 2


def test_update_null_means_unchanged_and_set_wins():
    state, _ = run_fold(
        [
            (1, "I", "c", 0, "user", "a", "search", 1),
            (2, "U", "c", 0, "tool", "b", None, 2),
            (3, "U", "c", 0, None, "c", None, 3),
        ]
    )
    r = live_rows(state)[0]
    assert (r["role"], r["text"], r["tool"]) == ("tool", "c", "search")


def test_insert_resets_full_row():
    state, _ = run_fold(
        [
            (1, "I", "c", 0, "user", "a", "search", 1),
            (2, "U", "c", 0, "tool", "b", None, 2),
            (3, "I", "c", 0, "assistant", "fresh", None, 3),
        ]
    )
    r = live_rows(state)[0]
    # the I at lsn 3 resets tool to ITS value (null), not the earlier one
    assert (r["role"], r["text"], r["tool"]) == ("assistant", "fresh", None)


def test_duplicate_lsn_applied_once():
    state, stats = run_fold(
        [
            (1, "I", "c", 0, "user", "a", None, 1),
            (2, "U", "c", 0, None, "b", None, 2),
            (2, "U", "c", 0, None, "b", None, 2),  # redelivery
        ]
    )
    assert stats["dups_dropped"] == 1
    assert live_rows(state)[0]["text"] == "b"


def test_delete_then_resurrect():
    state, _ = run_fold(
        [
            (1, "I", "c", 0, "user", "a", None, 1),
            (2, "D", "c", 0),
            (3, "I", "c", 0, "user", "back", None, 3),
        ]
    )
    r = live_rows(state)
    assert len(r) == 1 and r[0]["text"] == "back"


def test_update_after_delete_upsert_vs_drop():
    rows = [
        (1, "I", "c", 0, "user", "a", "search", 1),
        (2, "D", "c", 0),
        (3, "U", "c", 0, None, "late", None, 3),
    ]
    state, _ = run_fold(rows, policy="upsert")
    r = live_rows(state)
    assert len(r) == 1
    # resurrected partial row: only U's set columns survive
    assert (r[0]["text"], r[0]["role"], r[0]["tool"]) == ("late", None, None)

    state, stats = run_fold(rows, policy="drop")
    assert live_rows(state) == []


def test_orphan_update_policies():
    rows = [(5, "U", "c", 0, None, "orphan", None, 5)]
    state, _ = run_fold(rows, policy="upsert")
    assert live_rows(state)[0]["text"] == "orphan"
    state, stats = run_fold(rows, policy="drop")
    assert state.num_rows == 0 and stats["orphan_updates"] == 1


def test_out_of_order_and_interleaved_keys():
    state, _ = run_fold(
        [
            (9, "U", "a", 0, None, "final-a", None, 9),
            (1, "I", "b", 0, "user", "b0", None, 1),
            (4, "I", "a", 0, "user", "a0", None, 4),
            (7, "U", "b", 0, None, "final-b", None, 7),
        ]
    )
    by_key = {(r["conv_id"], r["turn_idx"]): r for r in live_rows(state)}
    assert by_key[("a", 0)]["text"] == "final-a"
    assert by_key[("b", 0)]["text"] == "final-b"


def test_idempotent_replay_over_state():
    rows = [
        (1, "I", "c", 0, "user", "v1", None, 1),
        (2, "U", "c", 0, None, "v2", None, 2),
        (3, "D", "c", 1),
        (4, "I", "c", 1, "user", "row1", None, 4),
    ]
    state1, _ = run_fold(rows)
    # replay the exact same batch over the produced state
    state2, stats = run_fold(rows, state=state1)
    assert state2.equals(state1)
    # an OLD update (lsn below the key watermark) must not change anything
    state3, _ = run_fold([(1, "U", "c", 0, "system", "stale", None, 1)], state=state1)
    assert state3.equals(state1)


def test_tombstone_blocks_stale_update():
    state1, _ = run_fold([(1, "I", "c", 0, "user", "a", None, 1), (5, "D", "c", 0)])
    assert state1.num_rows == 1 and state1["_deleted"][0].as_py()
    # stale U below the tombstone LSN: stays deleted
    state2, _ = run_fold([(3, "U", "c", 0, None, "stale", None, 3)], state=state1)
    assert live_rows(state2) == []
    assert state2["_lsn"][0].as_py() == 5


@pytest.mark.parametrize("tier", ["t1", "t2evo", "t2skew"])
def test_fold_matches_transcripts_and_golden(tier):
    fx = make_fixture(TIERS[tier])
    # per-file reconciliation to the target schema (the engine's normalize
    # stage does this per schema group)
    casted = []
    for t in fx.event_files:
        cols = {}
        for f in CDC_SCHEMA:
            if f.name in t.column_names:
                c = t[f.name]
                if pa.types.is_dictionary(c.type):
                    c = c.cast(c.type.value_type)
                cols[f.name] = c.cast(f.type)
            else:
                cols[f.name] = pa.nulls(t.num_rows, f.type)
        casted.append(pa.table(cols))
    ev = pa.concat_tables(casted)
    ev = ev.append_column("_prio", pa.array(np.ones(ev.num_rows, dtype=np.int8)))
    state, _ = fold(ev)
    live = state.filter(pa.compute.equal(state["_deleted"], False)).select(
        ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    assert live.equals(fx.transcripts)
    assert golden_apply(fx.event_files).equals(fx.transcripts)


def test_late_event_below_watermark_matches_global_fold():
    """The per-column LSN state decomposition: a batch split delivering an
    event with LSN below the key's watermark must converge to the same row
    as a single global fold (this is the CRDT property of the state)."""
    batch1 = [
        (1, "I", "c", 0, "user", "t1", "search", 1),
        (5, "U", "c", 0, None, "t5", None, 5),
    ]
    late = [(3, "U", "c", 0, "tool", "t3", None, 3)]  # arrives after lsn 5
    state_a, _ = run_fold(batch1)
    state_b, _ = run_fold(late, state=state_a)
    global_state, _ = run_fold(batch1 + late)
    assert state_b.equals(global_state)
    r = live_rows(state_b)[0]
    # role set at 3 applies (3 > its setter lsn 1); text keeps lsn-5 value
    assert (r["role"], r["text"], r["tool"]) == ("tool", "t5", "search")
    # and a late full-row insert resets only columns not set later
    late_i = [(2, "I", "c", 0, "system", "t2", None, 2)]
    s2, _ = run_fold(late_i, state=state_b)
    g2, _ = run_fold(batch1 + late + late_i)
    assert s2.equals(g2)
    r = live_rows(s2)[0]
    assert (r["role"], r["text"], r["tool"]) == ("tool", "t5", None)
