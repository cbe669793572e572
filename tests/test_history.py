"""SCD Type-2 history kernel + pipeline tests.

The kernel (`history_block`) is a pure Arrow->Arrow function, tested
without Ray; the Dataset path (`scd2_history`) is pinned against the
golden reducer: the current non-deleted slice of the history must equal
the converged table, and per-key version chains must be contiguous in
LSN space.
"""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from tg_data_connector_ray.cdc.golden import golden_apply
from tg_data_connector_ray.cdc.history import history_block, scd2_history

from test_fold import ev_table


def hist(rows):
    return history_block(ev_table(rows)).to_pylist()


def by_version(rows):
    return {(r["conv_id"], r["turn_idx"], r["valid_from"]): r for r in rows}


def test_every_event_is_a_version_with_contiguous_validity():
    h = hist(
        [
            (1, "I", "c1", 0, "user", "hello", None, 10),
            (5, "U", "c1", 0, None, "hello edited", None, 20),
            (9, "U", "c1", 0, "admin", None, None, None),
        ]
    )
    assert [(r["valid_from"], r["valid_to"], r["is_current"]) for r in h] == [
        (1, 5, False),
        (5, 9, False),
        (9, None, True),
    ]
    # U nulls mean unchanged: text carries forward, role updates late
    assert [r["text"] for r in h] == ["hello", "hello edited", "hello edited"]
    assert [r["role"] for r in h] == ["user", "user", "admin"]
    assert not any(r["deleted"] for r in h)


def test_delete_version_is_tombstone_and_update_resurrects_partial():
    h = hist(
        [
            (1, "I", "c1", 0, "user", "hello", "grep", 10),
            (2, "D", "c1", 0),
            (3, "U", "c1", 0, None, "back", None, None),
        ]
    )
    assert [r["deleted"] for r in h] == [False, True, False]
    # the D resets every column; the resurrecting U opens a partial row
    assert h[1]["text"] is None and h[1]["tool"] is None
    assert h[2]["text"] == "back" and h[2]["role"] is None and h[2]["tool"] is None
    assert h[2]["is_current"] and h[2]["valid_to"] is None


def test_insert_resets_prior_segment():
    h = hist(
        [
            (1, "I", "c1", 0, "user", "old", "grep", 10),
            (2, "I", "c1", 0, "assistant", "new", None, 20),
        ]
    )
    assert h[1]["tool"] is None and h[1]["role"] == "assistant"


def test_orphan_update_opens_partial_current_version():
    h = hist([(7, "U", "cx", 3, None, "late", None, None)])
    assert len(h) == 1
    r = h[0]
    assert r["valid_from"] == 7 and r["valid_to"] is None and r["is_current"]
    assert r["text"] == "late" and r["role"] is None and not r["deleted"]


def test_redelivered_lsn_yields_one_version():
    rows = [
        (1, "I", "c1", 0, "user", "hello", None, 10),
        (2, "U", "c1", 0, None, "edit", None, None),
        (2, "U", "c1", 0, None, "edit", None, None),  # redelivery
    ]
    h = hist(rows)
    assert [r["valid_from"] for r in h] == [1, 2]


def test_keys_interleaved_and_out_of_order():
    h = hist(
        [
            (9, "U", "c2", 0, None, "z-late", None, None),
            (1, "I", "c1", 0, "user", "a", None, 10),
            (4, "I", "c2", 0, "user", "z", None, 20),
            (2, "U", "c1", 0, None, "a2", None, None),
        ]
    )
    v = by_version(h)
    assert v[("c1", 0, 2)]["text"] == "a2" and v[("c1", 0, 2)]["is_current"]
    assert v[("c2", 0, 4)]["valid_to"] == 9
    assert v[("c2", 0, 9)]["text"] == "z-late"


def test_empty_block():
    assert history_block(ev_table([])).num_rows == 0


def test_current_slice_matches_golden_on_fixture(t1):
    """The is_current AND NOT deleted slice of the full history == the
    golden reducer's converged table over the same log (t1 tier: dup
    redeliveries, disorder, resurrections, deletes all in play)."""
    import ray

    from tg_data_connector_ray.util import list_files

    files = sorted(list_files(t1["cdc_log"], suffix=".parquet"))
    h = scd2_history(ray.data.read_parquet(files), n_coarse=8)
    # Ray emits schema-less empty blocks (known upstream issue); drop them
    ht = pa.concat_tables(t for t in ray.get(h.to_arrow_refs()) if t.num_rows)

    # every event (post redelivery-dedup) produced exactly one version
    logs = [pa.parquet.read_table(f) for f in files]
    n_unique = pa.concat_tables(logs).group_by(
        ["conv_id", "turn_idx", "lsn"]
    ).aggregate([]).num_rows
    assert ht.num_rows == n_unique

    cur = ht.filter(pc.and_(ht["is_current"], pc.invert(ht["deleted"])))
    cur = cur.select(["conv_id", "turn_idx", "role", "text", "tool", "ts"]).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")]
    )
    golden = golden_apply(logs)
    assert cur.num_rows == golden.num_rows
    for c in ("conv_id", "turn_idx", "role", "text", "tool", "ts"):
        assert cur[c].combine_chunks() == golden[c].combine_chunks(), c

    # validity chains are contiguous per key: valid_to == next valid_from
    df = ht.select(["conv_id", "turn_idx", "valid_from", "valid_to"]).to_pandas()
    df = df.sort_values(["conv_id", "turn_idx", "valid_from"])
    g = df.groupby(["conv_id", "turn_idx"], sort=False)
    assert g["valid_to"].apply(lambda s: s.iloc[-1]).isna().all()
    chained = g.apply(
        lambda s: bool(
            np.array_equal(
                s["valid_to"].to_numpy()[:-1], s["valid_from"].to_numpy()[1:]
            )
        ),
        include_groups=False,
    )
    assert chained.all()
