"""Schema reconciliation unit tests (cdc/schema.py). No Ray needed."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tg_data_connector_ray.cdc.schema import promote, scan_schemas, unify_schemas


def test_promote_int_widening():
    assert promote(pa.int16(), pa.int32()) == pa.int32()
    assert promote(pa.int64(), pa.int8()) == pa.int64()
    assert promote(pa.int32(), pa.float32()) == pa.float64()


def test_promote_dictionary_and_string():
    assert promote(pa.dictionary(pa.int32(), pa.string()), pa.string()) == pa.string()
    assert promote(pa.string(), pa.large_string()) == pa.large_string()
    # string vs typed: typed wins (normalize casts per-row with dirty routing)
    assert promote(pa.string(), pa.timestamp("us")) == pa.timestamp("us")
    assert promote(pa.int64(), pa.string()) == pa.int64()


def test_promote_timestamps_unify_to_us():
    assert promote(pa.timestamp("ms"), pa.timestamp("us")) == pa.timestamp("us")


def test_unify_adds_missing_columns_nullable():
    s1 = pa.schema([("a", pa.int16()), ("b", pa.string())])
    s2 = pa.schema([("a", pa.int32()), ("c", pa.float64())])
    u = unify_schemas([s1, s2])
    assert u.names == ["a", "b", "c"]
    assert u.field("a").type == pa.int32()
    assert all(f.nullable for f in u)


def test_scan_schemas_groups_by_fingerprint(tmp_path):
    t1 = pa.table({"a": pa.array([1], pa.int16())})
    t2 = pa.table({"a": pa.array([2], pa.int32()), "b": pa.array(["x"])})
    p1, p2, p3 = (str(tmp_path / f"f{i}.parquet") for i in range(3))
    pq.write_table(t1, p1)
    pq.write_table(t2, p2)
    pq.write_table(t1, p3)
    groups, unified = scan_schemas([p1, p2, p3])
    assert len(groups) == 2
    sizes = sorted(len(v) for v in groups.values())
    assert sizes == [1, 2]
    assert unified.field("a").type == pa.int32()
    assert "b" in unified.names


def test_promote_mixed_signedness_widens_commutatively():
    """Mixed signed/unsigned promotion must be commutative and lossless
    (picking either side loses half the range of the other)."""
    import pyarrow as pa
    import pytest

    from tg_data_connector_ray.cdc.schema import promote

    assert promote(pa.int32(), pa.uint32()) == pa.int64()
    assert promote(pa.uint32(), pa.int32()) == pa.int64()
    assert promote(pa.int64(), pa.uint32()) == pa.int64()
    assert promote(pa.uint8(), pa.int8()) == pa.int16()
    with pytest.raises(TypeError, match="uint64"):
        promote(pa.uint64(), pa.int64())
    # tz is semantics: preserved when shared, a loud error when mixed
    assert promote(
        pa.timestamp("ms", tz="UTC"), pa.timestamp("us", tz="UTC")
    ) == pa.timestamp("us", tz="UTC")
    with pytest.raises(TypeError, match="tz mismatch"):
        promote(pa.timestamp("us", tz="UTC"), pa.timestamp("us"))


def test_scan_schemas_unify_false_skips_unpromotable_extras(tmp_path):
    """The CDC read path only needs the GROUPS; an un-promotable extra
    column (never consumed) must not kill the replay."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from tg_data_connector_ray.cdc.schema import scan_schemas

    a = str(tmp_path / "a.parquet")
    b = str(tmp_path / "b.parquet")
    pq.write_table(pa.table({"x": pa.array([1]), "dbg": pa.array([True])}), a)
    pq.write_table(
        pa.table({"x": pa.array([1]), "dbg": pa.array([0], pa.timestamp("us"))}), b
    )
    groups, unified = scan_schemas([a, b], unify=False)
    assert len(groups) == 2 and unified is None
    with pytest.raises(TypeError):
        scan_schemas([a, b])


def test_schema_history_journal(fixture_root, tmp_path):
    """The evo fixture's two batches journal two schema.log entries: the
    early files lack `tool` / carry narrow types, the later files add
    them; identical re-application appends nothing."""
    import os

    from tg_data_connector_ray.cdc.config import CdcConfig
    from tg_data_connector_ray.cdc.pipeline import apply_cdc
    from tg_data_connector_ray.cdc.schema import schema_history
    from tg_data_connector_ray.fixtures import write_fixture

    fx = write_fixture(fixture_root, "t2evo")
    files = sorted(
        os.path.join(fx["cdc_log"], f) for f in os.listdir(fx["cdc_log"])
    )
    import pyarrow.parquet as pq_

    # split exactly at the evolution boundary: first batch = pre-`tool`
    k = next(i for i, f in enumerate(files) if "tool" in pq_.read_schema(f).names)
    cfg = CdcConfig(out_dir=str(tmp_path / "evo"), num_partitions=4)
    apply_cdc(files[:k], cfg)
    apply_cdc(files[k:], cfg)
    hist = schema_history(cfg.out_dir)
    assert len(hist) == 2
    f0 = {tuple(x) for x in hist[0]["fields"]}
    f1 = {tuple(x) for x in hist[1]["fields"]}
    assert ("tool", "string") not in f0 and ("tool", "string") in f1
    assert ["tool", "string"] in hist[1]["added"]
    assert hist[0]["run_id"] != hist[1]["run_id"]
    # identical re-application: same field set -> no new entry
    apply_cdc(files[k:], cfg)
    assert len(schema_history(cfg.out_dir)) == 2
    assert schema_history(str(tmp_path / "nothere")) == []
    from tg_data_connector_ray.__main__ import main

    assert main(["schemas", "--out", cfg.out_dir]) == 0
