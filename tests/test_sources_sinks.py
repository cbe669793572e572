"""CSV source (reference semantics), file sinks (writeMode), cast matrix,
and the config-driven job runner."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from tg_data_connector_ray.sinks.files import WriteModeError, prepare_output_dir, write_delimited
from tg_data_connector_ray.sources.csv import ColumnSpec, read_csv_source
from tg_data_connector_ray.stages.casts import (
    cast_string_to_bool,
    cast_string_to_date,
    cast_string_to_double,
    cast_string_to_long,
)


# ---- cast matrix ------------------------------------------------------------

def S(*vals):
    return pa.array(list(vals), type=pa.string())


def test_cast_long_truncates_and_rejects():
    vals, bad = cast_string_to_long(S("42", "  7 ", "123.99", "-3.7", "x", "NaN", "Infinity", None))
    assert vals.to_pylist() == [42, 7, 123, -3, None, None, None, None]
    assert bad.tolist() == [False, False, False, False, True, True, True, False]


def test_cast_long_exact_beyond_2_53():
    # BigDecimal->BigInteger parity: no float64 round-trip for integral
    # strings — 64-bit IDs survive bit-perfect; overflow is dirty, not wrap
    vals, bad = cast_string_to_long(
        S(
            "9007199254740993",        # 2^53+1: float64 would round to ...992
            "9223372036854775807",     # int64 max: float path would wrap
            "-9223372036854775808",    # int64 min
            "9223372036854775808",     # int64 max + 1: overflow -> dirty
            "-9223372036854775809",    # int64 min - 1: overflow -> dirty
            "1e3",                     # scientific form still parses (Decimal)
        )
    )
    assert vals.to_pylist() == [
        9007199254740993, 9223372036854775807, -9223372036854775808, None, None, 1000
    ]
    assert bad.tolist() == [False, False, False, True, True, False]


def test_cast_double_accepts_nan_infinity():
    vals, bad = cast_string_to_double(S("1.5", "NaN", "Infinity", "-Infinity", "zz", None))
    got = vals.to_pylist()
    assert got[0] == 1.5
    assert got[1] != got[1]  # NaN
    assert got[2] == float("inf") and got[3] == float("-inf")
    assert bad.tolist() == [False, False, False, False, True, False]


def test_cast_bool_strict():
    vals, bad = cast_string_to_bool(S("true", "FALSE", "True", "1", "yes", None))
    assert vals.to_pylist() == [True, False, True, None, None, None]
    assert bad.tolist() == [False, False, False, True, True, False]


def test_cast_date_multiformat():
    vals, bad = cast_string_to_date(S("2026-01-02 03:04:05", "2026-01-02", "xx", None))
    assert bad.tolist() == [False, False, True, False]
    assert str(vals[0]) == "2026-01-02 03:04:05"
    assert str(vals[1]) == "2026-01-02 00:00:00"


# ---- CSV source -------------------------------------------------------------

def test_sniff_columns_quoted_delimiter_and_newline(tmp_path):
    """A quoted first-row field containing the delimiter or an embedded
    newline must not skew the sniffed column count (RFC 4180 quoting)."""
    from tg_data_connector_ray.sources.csv import _sniff_num_columns

    p = tmp_path / "q.csv"
    p.write_text('"a,with,commas","line\nbreak",plain\n"x","y","z"\n')
    assert _sniff_num_columns(str(p), ",") == 3

    import bz2 as _bz2

    pb = tmp_path / "q.csv.bz2"
    pb.write_bytes(_bz2.compress(b"a|b|c\n1|2|3\n"))
    assert _sniff_num_columns(str(pb), "|") == 3


@pytest.fixture()
def csv_dir(tmp_path):
    p = tmp_path / "in"
    os.makedirs(p)
    (p / "a.csv").write_text(
        "id,name,score,flag,when\n"
        "1,alice,3.5,true,2026-01-01 10:00:00\n"
        "2,\\N,7.25,false,2026-01-02 11:30:00\n"
        "3,carol,bad,true,2026-01-03 12:00:00\n"
    )
    return str(p)


def test_csv_all_strings_default(csv_dir):
    ds = read_csv_source(csv_dir, skip_header=True)
    rows = ds.take_all()
    assert rows[0] == {"f0": "1", "f1": "alice", "f2": "3.5", "f3": "true", "f4": "2026-01-01 10:00:00"}
    assert all(isinstance(v, str) for v in rows[1].values())


def test_csv_column_spec_cast_and_constants(csv_dir, tmp_path):
    dirty = str(tmp_path / "dirty")
    ds = read_csv_source(
        csv_dir,
        skip_header=True,
        null_format="\\N",
        dirty_dir=dirty,
        columns=[
            ColumnSpec(index=0, type="long", name="id"),
            ColumnSpec(index=1, type="string", name="name"),
            ColumnSpec(index=2, type="double", name="score"),
            ColumnSpec(index=3, type="boolean", name="flag"),
            ColumnSpec(index=4, type="date", name="when"),
            ColumnSpec(value="fixed", type="string", name="const"),
        ],
    )
    rows = sorted(ds.take_all(), key=lambda r: r["id"])
    # row 3 has score="bad" -> dirty, dropped
    assert [r["id"] for r in rows] == [1, 2]
    assert rows[1]["name"] is None  # nullFormat applied
    assert rows[0]["score"] == 3.5 and rows[0]["flag"] is True
    assert rows[0]["const"] == "fixed"
    assert str(rows[0]["when"]) == "2026-01-01 10:00:00"
    import pyarrow.dataset as pads

    assert pads.dataset(dirty).to_table().num_rows == 1


def test_csv_out_of_bounds_index_is_dirty(csv_dir):
    ds = read_csv_source(
        csv_dir, skip_header=True, columns=[ColumnSpec(index=99, type="string", name="x")]
    )
    assert ds.count() == 0


# ---- sinks ------------------------------------------------------------------

def test_write_modes(tmp_path):
    out = str(tmp_path / "out")
    prepare_output_dir(out, "truncate")
    open(os.path.join(out, "leftover.txt"), "w").write("x")
    prepare_output_dir(out, "truncate")
    assert os.listdir(out) == []
    open(os.path.join(out, "keep.txt"), "w").write("x")
    prepare_output_dir(out, "append")
    assert os.listdir(out) == ["keep.txt"]
    with pytest.raises(WriteModeError):
        prepare_output_dir(out, "nonConflict")


def test_write_delimited_nullformat_dateformat(tmp_path):
    out = str(tmp_path / "csvout")
    t = pa.table(
        {
            "a": pa.array([1, 2], pa.int64()),
            "b": pa.array(["x", None], pa.string()),
            "ts": pa.array([0, 3_600_000_000], pa.timestamp("us")),
        }
    )
    write_delimited(
        ray.data.from_arrow(t), out, delimiter="|", null_format="\\N",
        date_format="%Y-%m-%d %H:%M:%S",
    )
    content = "".join(
        open(os.path.join(out, f)).read() for f in sorted(os.listdir(out))
    )
    lines = sorted(l for l in content.splitlines() if l)
    # every value serialized as string; arrow CSV quotes strings
    assert lines == ['"1"|"x"|"1970-01-01 00:00:00"', '"2"|"\\N"|"1970-01-01 01:00:00"']


# ---- job runner -------------------------------------------------------------

def test_run_job_end_to_end(tmp_path, csv_dir):
    from tg_data_connector_ray.pipelines.runner import run_job

    outdir = str(tmp_path / "jobout")
    cfg = {
        "job": {
            "content": [
                {
                    "reader": {
                        "name": "csv",
                        "parameter": {
                            "path": csv_dir,
                            "skipHeader": True,
                            "nullFormat": "\\N",
                            "column": [
                                {"index": 0, "type": "long", "name": "id"},
                                {"index": 1, "type": "string", "name": "name"},
                                {"index": 3, "type": "boolean", "name": "flag"},
                            ],
                        },
                    },
                    "transformer": [
                        {"name": "dx_filter", "parameter": {"column": "flag", "op": "=", "value": "false"}}
                    ],
                    "writer": {"name": "parquet", "parameter": {"path": outdir}},
                }
            ],
            "setting": {"errorLimit": {"record": 10}},
        }
    }
    metrics = run_job(cfg)
    import pyarrow.dataset as pads

    got = pads.dataset(outdir).to_table().sort_by("id")
    # flag=false row dropped by the inverted filter
    assert got["id"].to_pylist() == [1, 3]
    assert metrics["read_records"] == 3
    assert metrics["filtered_records"] == 1


def test_run_job_dry_run_and_error_limit(tmp_path, csv_dir):
    from tg_data_connector_ray.pipelines.runner import JobErrorLimit, run_job

    cfg = {
        "job": {
            "content": [
                {
                    "reader": {"name": "csv", "parameter": {"path": csv_dir, "password": "secret"}},
                    "writer": {"name": "stream", "parameter": {}},
                }
            ],
            "setting": {"dryRun": True},
        }
    }
    res = run_job(cfg)
    assert res["dry_run"] is True
    assert res["config"]["job"]["content"][0]["reader"]["parameter"]["password"] == "******"

    cfg2 = {
        "job": {
            "content": [
                {
                    "reader": {"name": "parquet", "parameter": {"path": "/root/testdata/sf0.001/documents.parquet"}},
                    "transformer": [
                        {"name": "dx_substr", "parameter": {"column": "text", "start": 100000, "length": 1}}
                    ],
                    "writer": {"name": "parquet", "parameter": {"path": str(tmp_path / "o2")}},
                }
            ],
            "setting": {"errorLimit": {"record": 1}},
        }
    }
    with pytest.raises(JobErrorLimit):
        run_job(cfg2)


def test_csv_gzip_compression(tmp_path):
    """Compressed CSV decode (reference codec zoo handled by Arrow)."""
    import gzip

    p = tmp_path / "gz"
    os.makedirs(p)
    with gzip.open(p / "a.csv.gz", "wt") as f:
        f.write("1,x\n2,y\n")
    ds = read_csv_source(str(p))
    rows = sorted(ds.take_all(), key=lambda r: r["f0"])
    assert rows == [{"f0": "1", "f1": "x"}, {"f0": "2", "f1": "y"}]


# ---- SQL sink (CommonRdbmsWriter analogue) ----------------------------------

def _mk_target(path):
    import sqlite3

    con = sqlite3.connect(path)
    con.execute("CREATE TABLE IF NOT EXISTS out (id INTEGER PRIMARY KEY, name TEXT, qty INTEGER)")
    con.commit()
    con.close()


def test_sql_sink_insert_replace_update(tmp_path):
    import sqlite3

    from tg_data_connector_ray.sinks.sql import SqlSinkConfig, build_write_sql, write_sql

    db = str(tmp_path / "w.db")
    factory = lambda: sqlite3.connect(db)  # noqa: E731
    ds = ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array([1, 2, 3], pa.int64()),
                "name": pa.array(["a", "b", "c"]),
                "qty": pa.array([10, 20, 30], pa.int64()),
            }
        )
    )
    cfg = SqlSinkConfig(
        table="out",
        columns=("id", "name", "qty"),
        write_mode="insert",
        pre_sql=("CREATE TABLE IF NOT EXISTS out (id INTEGER PRIMARY KEY, name TEXT, qty INTEGER)",),
    )
    assert write_sql(ds, factory, cfg) == 3

    # replace: same PKs overwrite (reference writeMode=replace)
    ds2 = ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array([2, 3, 4], pa.int64()),
                "name": pa.array(["B", "C", "D"]),
                "qty": pa.array([200, 300, 400], pa.int64()),
            }
        )
    )
    cfg2 = SqlSinkConfig(table="out", columns=("id", "name", "qty"), write_mode="replace")
    assert write_sql(ds2, factory, cfg2) == 3
    con = sqlite3.connect(db)
    got = con.execute("SELECT id, name, qty FROM out ORDER BY id").fetchall()
    con.close()
    assert got == [(1, "a", 10), (2, "B", 200), (3, "C", 300), (4, "D", 400)]

    # update: upsert over conflict keys, only non-key columns set
    ds3 = ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array([4, 5], pa.int64()),
                "name": pa.array(["DD", "E"]),
                "qty": pa.array([444, 555], pa.int64()),
            }
        )
    )
    cfg3 = SqlSinkConfig(
        table="out", columns=("id", "name", "qty"), write_mode="update", conflict_keys=("id",)
    )
    assert write_sql(ds3, factory, cfg3) == 2
    con = sqlite3.connect(db)
    got = con.execute("SELECT id, name FROM out WHERE id >= 4 ORDER BY id").fetchall()
    con.close()
    assert got == [(4, "DD"), (5, "E")]

    # dialect template matrix (WriterUtil parity)
    my = SqlSinkConfig(table="t", columns=("a", "b"), write_mode="update", dialect="mysql")
    assert "ON DUPLICATE KEY UPDATE" in build_write_sql(my)
    pg = SqlSinkConfig(
        table="t", columns=("a", "b"), write_mode="update", dialect="postgres", conflict_keys=("a",)
    )
    assert "ON CONFLICT (a) DO UPDATE SET b = excluded.b" in build_write_sql(pg)


def test_sql_sink_exactly_once_skips_replayed_batch(tmp_path):
    """A Ray-retried write task re-runs __call__ on the same block; the
    content ledger must make the second apply a no-op (no duplicate rows,
    no inflated count)."""
    import sqlite3

    from tg_data_connector_ray.sinks.sql import SqlSinkConfig, SqlWriter

    db = str(tmp_path / "eo.db")
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE t (id INTEGER, name TEXT)")
    con.execute(
        "CREATE TABLE t__write_ledger (write_uuid TEXT, batch_id TEXT, n_rows INTEGER,"
        " PRIMARY KEY (write_uuid, batch_id))"
    )
    con.commit()
    con.close()
    cfg = SqlSinkConfig(table="t", columns=("id", "name"), exactly_once=True)
    w = SqlWriter(lambda: sqlite3.connect(db), cfg, write_uuid="run1")
    batch = pa.table({"id": pa.array([1, 2], pa.int64()), "name": pa.array(["a", "b"])})
    assert w(batch)["rows_written"][0].as_py() == 2
    # simulated task retry: the ledger skip still reports the batch's rows
    # as COMMITTED (they are in the table), so totals match ds.count()
    assert w(batch)["rows_written"][0].as_py() == 2
    con = sqlite3.connect(db)
    assert con.execute("SELECT count(*) FROM t").fetchone()[0] == 2
    con.close()
    # a NEW write run (different uuid) legitimately applies the same batch
    w2 = SqlWriter(lambda: sqlite3.connect(db), cfg, write_uuid="run2")
    assert w2(batch)["rows_written"][0].as_py() == 2


def test_sql_sink_postgres_replace_requires_conflict_keys():
    import pytest

    from tg_data_connector_ray.sinks.sql import SqlSinkConfig

    with pytest.raises(ValueError, match="conflict_keys"):
        SqlSinkConfig(table="t", columns=("a",), write_mode="replace", dialect="postgres")


def test_csv_compressed_write_roundtrip(tmp_path):
    out = str(tmp_path / "gz")
    ds = ray.data.from_arrow(
        pa.table({"a": pa.array([1, 2], pa.int64()), "b": pa.array(["x", "y,z"])})
    )
    write_delimited(ds, out, delimiter="|", compression="gzip")
    files = os.listdir(out)
    assert files and all(f.endswith(".csv.gz") for f in files)
    back = read_csv_source(
        out,
        delimiter="|",
        columns=[ColumnSpec(index=0, type="long", name="a"), ColumnSpec(index=1, type="string", name="b")],
    )
    assert sorted(back.take_all(), key=lambda r: r["a"]) == [
        {"a": 1, "b": "x"},
        {"a": 2, "b": "y,z"},
    ]


def test_csv_zip_codec_and_uri_listing(tmp_path):
    import zipfile

    d = tmp_path / "zips"
    os.makedirs(d)
    with zipfile.ZipFile(str(d / "data.zip"), "w") as z:
        z.writestr("part1.csv", "10|aa\n11|bb\n")
        z.writestr("part2.csv", "12|cc\n")
    ds = read_csv_source(
        f"file://{d}",  # object-store-style URI listing (GcsReader parity)
        delimiter="|",
        columns=[ColumnSpec(index=0, type="long", name="a"), ColumnSpec(index=1, type="string", name="b")],
    )
    assert sorted(r["a"] for r in ds.take_all()) == [10, 11, 12]

    with pytest.raises(ValueError, match="unsupported compress"):
        read_csv_source(str(d / "data.zip"), delimiter="|", compress="zstd-nope")


def test_codec_roundtrips():
    """Every codec zoo entry round-trips bytes exactly (reference
    UnstructuredStorageReaderUtil.java:117-213 compress values)."""
    import random

    from tg_data_connector_ray.sources.codecs import DECODERS, ENCODERS

    rng = random.Random(7)
    payloads = [
        b"",
        b"a",
        b"hello|world\n" * 500,
        bytes(rng.randrange(256) for _ in range(70_000)),  # > one frame block
        b"\x00" * 300_000,  # > one 256 KiB block
    ]
    for codec in sorted(DECODERS):
        for p in payloads:
            assert DECODERS[codec](ENCODERS[codec](p)) == p, codec


def test_lzo1x_match_instructions():
    """The pure-python LZO1X decoder handles real match instructions (M2/M3/
    M4, extended lengths, overlapping copies) — streams a conformant
    compressor would emit, not just our literal-only encoder output."""
    from tg_data_connector_ray.sources.codecs import lzo1x_decompress

    # "abcd" literal (first byte 4+17=21), then M2 t=108: ln=3+((108>>5)&1)=4,
    # dist=(h<<3)+((108>>2)&7)+1=4 -> copies "abcd" again; then EOS.
    stream = bytes([21]) + b"abcd" + bytes([108, 0]) + bytes([17, 0, 0])
    assert lzo1x_decompress(stream) == b"abcdabcd"
    # overlapping copy: literal "ab", M3 match dist=2 len=9 -> run-repeat
    # M3: t=32|len-2 for len<=33 -> t=32|7=39 gives len 9
    le = ((2 - 1) << 2) | 0  # dist-1 in high bits, state 0
    stream = bytes([19]) + b"ab" + bytes([39, le & 0xFF, le >> 8]) + bytes([17, 0, 0])
    assert lzo1x_decompress(stream) == b"ab" + (b"ab" * 5)[:9]


def test_csv_codec_zoo_end_to_end(tmp_path):
    """CSV reads through each stream codec, extension-detected and forced
    via compress=, with column cast/projection applied downstream."""
    from tg_data_connector_ray.sources.codecs import ENCODERS

    text = "".join(f"{i}|name{i}\n" for i in range(50)).encode()
    for codec, ext in [
        ("lzo", ".lzo"),
        ("lzo_deflate", ".lzo_deflate"),
        ("hadoop-snappy", ".snappy"),
        ("framing-snappy", ".framing-snappy"),
    ]:
        d = tmp_path / codec.replace("-", "_")
        os.makedirs(d)
        (d / f"data{ext}").write_bytes(ENCODERS[codec](text))
        ds = read_csv_source(
            str(d / f"data{ext}"),
            delimiter="|",
            columns=[
                ColumnSpec(index=0, type="long", name="a"),
                ColumnSpec(index=1, type="string", name="b"),
            ],
        )
        rows = sorted(ds.take_all(), key=lambda r: r["a"])
        assert len(rows) == 50 and rows[7] == {"a": 7, "b": "name7"}, codec

    # forced codec on an extension-less export (reference `compress` config)
    d = tmp_path / "forced"
    os.makedirs(d)
    (d / "data.csv").write_bytes(ENCODERS["framing-snappy"](text))
    ds = read_csv_source(str(d / "data.csv"), delimiter="|", compress="framing-snappy")
    assert ds.count() == 50


def test_watermark_store(tmp_path):
    import json

    from tg_data_connector_ray.state import WatermarkStore

    out = tmp_path / "job"
    for part, wm in [(0, 100), (1, 250)]:
        ld = out / "lineage" / f"part={part:05d}"
        os.makedirs(ld)
        (ld / "_latest.json").write_text(json.dumps({"watermark": wm, "run_id": "r1"}))
    ws = WatermarkStore(str(out))
    assert ws.parts() == [0, 1]
    assert ws.watermark(1) == 250
    assert ws.min_watermark() == 100 and ws.max_watermark() == 250
    # cache invalidates on rewrite
    ld = out / "lineage" / "part=00000"
    os.utime(ld / "_latest.json", (0, 0))  # distinct mtime for rewrite below
    (ld / "_latest.json").write_text(json.dumps({"watermark": 300, "run_id": "r2"}))
    assert ws.watermark(0) == 300
    assert ws.watermark(7) == -1


def test_run_job_csv_to_sql_sink(tmp_path, csv_dir):
    """Config-driven CSV -> RDBMS job end-to-end (the reference's
    gcs2rdbms shape: reader + column spec + SQL writer with preSql)."""
    import sqlite3

    from tg_data_connector_ray.pipelines.runner import run_job

    db = str(tmp_path / "job.db")
    cfg = {
        "job": {
            "content": [
                {
                    "reader": {
                        "name": "csv",
                        "parameter": {
                            "path": csv_dir,
                            "skipHeader": True,
                            "column": [
                                {"index": 0, "type": "long", "name": "id"},
                                {"index": 1, "type": "string", "name": "name"},
                            ],
                        },
                    },
                    "writer": {
                        "name": "sql",
                        "parameter": {
                            "sqlitePath": db,
                            "table": "t",
                            "column": ["id", "name"],
                            "writeMode": "insert",
                            "preSql": ["CREATE TABLE t (id INTEGER, name TEXT)"],
                        },
                    },
                }
            ]
        }
    }
    run_job(cfg)
    con = sqlite3.connect(db)
    rows = con.execute("SELECT id, name FROM t ORDER BY id").fetchall()
    con.close()
    assert rows == [(1, "alice"), (2, "\\N"), (3, "carol")]


def test_csv_reader_config_passthrough(tmp_path):
    """csvReaderConfig parity: custom quote/escape chars reach the Arrow
    parser (reference UnstructuredStorageReaderUtil.java:683-697)."""
    p = tmp_path / "q"
    os.makedirs(p)
    (p / "a.csv").write_text("1|'hello|world'\n2|plain\n")
    ds = read_csv_source(
        str(p),
        delimiter="|",
        csv_reader_config={"quote_char": "'"},
        columns=[
            ColumnSpec(index=0, type="long", name="id"),
            ColumnSpec(index=1, type="string", name="s"),
        ],
    )
    rows = sorted(ds.take_all(), key=lambda r: r["id"])
    assert rows == [{"id": 1, "s": "hello|world"}, {"id": 2, "s": "plain"}]


def test_retry_call_backoff():
    from tg_data_connector_ray.util import retry_call

    calls = []

    def flaky():
        calls.append(1)
        if len(calls) < 3:
            raise OSError("transient")
        return "ok"

    assert retry_call(flaky, tries=5, base_delay_s=0.001) == "ok"
    assert len(calls) == 3
    with pytest.raises(OSError):
        retry_call(lambda: (_ for _ in ()).throw(OSError("always")), tries=2, base_delay_s=0.001)


def test_sql_sink_exactly_once_identical_batches_all_written(tmp_path):
    """Highly repetitive data + fixed batch_rows produces bit-identical
    batches; the Datasink write path keys the ledger by (task ordinal +
    content), so identical batches must all be written — only a true
    retry of the SAME batch is skipped."""
    import sqlite3

    from tg_data_connector_ray.sinks.sql import SqlSinkConfig, write_sql

    db = str(tmp_path / "dup.db")
    factory = lambda: sqlite3.connect(db)  # noqa: E731
    # 10 identical rows, batch_rows=2 -> 5 bit-identical batches
    ds = ray.data.from_arrow(
        pa.table({"id": pa.array([7] * 10, pa.int64()), "name": pa.array(["x"] * 10)})
    )
    cfg = SqlSinkConfig(
        table="t",
        columns=("id", "name"),
        batch_rows=2,
        exactly_once=True,
        pre_sql=("CREATE TABLE IF NOT EXISTS t (id INTEGER, name TEXT)",),
    )
    assert write_sql(ds, factory, cfg) == 10
    con = sqlite3.connect(db)
    assert con.execute("SELECT count(*) FROM t").fetchone()[0] == 10
    # ledger: one row per committed batch, all distinct batch_ids
    leds = con.execute("SELECT batch_id, n_rows FROM t__write_ledger").fetchall()
    con.close()
    assert sum(n for _, n in leds) == 10
    assert len({b for b, _ in leds}) == len(leds)


def test_sql_sink_exactly_once_autocommit_connection(tmp_path):
    """A factory handing out autocommit connections (sqlite3
    isolation_level=None) must still commit ledger+data atomically —
    _ensure_transactional restores transactional mode."""
    import sqlite3

    from tg_data_connector_ray.sinks.sql import SqlSinkConfig, SqlWriter

    db = str(tmp_path / "ac.db")
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE t (id INTEGER)")
    con.execute(
        "CREATE TABLE t__write_ledger (write_uuid TEXT, batch_id TEXT, n_rows INTEGER,"
        " PRIMARY KEY (write_uuid, batch_id))"
    )
    con.commit()
    con.close()
    cfg = SqlSinkConfig(table="t", columns=("id",), exactly_once=True)
    w = SqlWriter(lambda: sqlite3.connect(db, isolation_level=None), cfg, write_uuid="r")
    conn = w._conn()
    assert conn.isolation_level is not None  # transactional mode restored
    batch = pa.table({"id": pa.array([1, 2], pa.int64())})
    assert w(batch, ordinal_key="0:0")["rows_written"][0].as_py() == 2
    # retry: ledger skip, but the batch's rows count as COMMITTED
    assert w(batch, ordinal_key="0:0")["rows_written"][0].as_py() == 2
    assert w(batch, ordinal_key="0:1")["rows_written"][0].as_py() == 2  # new ordinal writes


def test_sql_datasink_exactly_once_through_ray_retry(tmp_path):
    """A write task that crashes after committing its first batch is
    retried by Ray with the SAME task index; the ledger must make the
    retry skip batch 1 and write only batch 2 — exact row count, no
    duplicates, end-to-end through the real Datasink path."""
    import sqlite3

    from tg_data_connector_ray.sinks.sql import SqlSinkConfig, write_sql

    class _FlakyConn:
        """Wraps a sqlite3 connection; raises on executemany once per flag
        file (simulating a mid-task crash AFTER the first batch committed)."""

        def __init__(self, db, flag):
            import sqlite3

            self._c = sqlite3.connect(db)
            self._flag = flag
            self._calls = 0

        def cursor(self):
            outer = self

            class _Cur:
                def __init__(self):
                    self._cur = outer._c.cursor()

                def execute(self, *a):
                    return self._cur.execute(*a)

                def executemany(self, *a):
                    outer._calls += 1
                    if outer._calls == 2 and not os.path.exists(outer._flag):
                        with open(outer._flag, "w") as f:
                            f.write("x")
                        raise RuntimeError("injected mid-task crash")
                    return self._cur.executemany(*a)

                def fetchone(self):
                    return self._cur.fetchone()

            return _Cur()

        def commit(self):
            return self._c.commit()

        def rollback(self):
            return self._c.rollback()

        def close(self):
            return self._c.close()

        @property
        def isolation_level(self):
            return self._c.isolation_level

        @isolation_level.setter
        def isolation_level(self, v):
            self._c.isolation_level = v


    class _FlakyFactory:
        def __init__(self, db, flag):
            self.db = db
            self.flag = flag

        def __call__(self):
            return _FlakyConn(self.db, self.flag)

    db = str(tmp_path / "flaky.db")
    flag = str(tmp_path / "crashed_once")
    ds = ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array(range(8), pa.int64()),
                "name": pa.array([f"r{i}" for i in range(8)]),
            }
        )
    ).repartition(1)  # one write task -> both batches in the crashing task
    cfg = SqlSinkConfig(
        table="t",
        columns=("id", "name"),
        batch_rows=4,  # 8 rows -> 2 batches; crash hits batch 2's executemany
        exactly_once=True,
        pre_sql=("CREATE TABLE IF NOT EXISTS t (id INTEGER, name TEXT)",),
    )
    # the retry re-runs both batches: batch 1 is a ledger skip (counted as
    # committed), batch 2 writes — the return equals ds.count(), so a
    # caller's loss check sees no phantom shortfall
    assert write_sql(ds, _FlakyFactory(db, flag), cfg) == 8
    con = sqlite3.connect(db)
    rows = con.execute("SELECT count(*), count(DISTINCT id) FROM t").fetchone()
    leds = con.execute("SELECT count(*) FROM t__write_ledger").fetchone()[0]
    con.close()
    assert os.path.exists(flag)  # the crash really happened
    assert rows == (8, 8)  # every row exactly once
    assert leds == 2


def test_fs_options_registry_reaches_pyarrow(tmp_path):
    """Object-store credential pass-through (reference GcsReader's
    service-account config): options registered for a scheme must reach
    the pyarrow filesystem constructor, and every path helper must route
    through the registered filesystem."""
    import pyarrow.fs as pafs

    from tg_data_connector_ray.util import (
        clear_fs_options,
        file_size,
        filesystem_for,
        list_files,
        resolve_fs,
        set_fs_options,
    )

    (tmp_path / "a.parquet").write_bytes(b"xx")
    seen = {}

    def factory(**kw):
        seen.update(kw)
        return pafs.LocalFileSystem()

    try:
        # fs:// stand-in: explicit factory records the kwargs it received
        set_fs_options("mock", factory=factory, token="sekrit", project="p1")
        files = list_files(f"mock://{tmp_path}", suffix=".parquet")
        assert seen == {"token": "sekrit", "project": "p1"}
        assert files == [f"mock://{tmp_path}/a.parquet"]
        assert file_size(files[0]) == 2
        assert isinstance(filesystem_for(files[0]), pafs.LocalFileSystem)

        # real pyarrow class: S3 credentials consumed at construction
        # (no network touched at construction time)
        set_fs_options("s3", access_key="AK", secret_key="SK", region="r1")
        fs, p = resolve_fs("s3://bucket/key")
        assert isinstance(fs, pafs.S3FileSystem) and p == "bucket/key"

        # unknown scheme without a factory is an explicit error
        set_fs_options("weird", some_opt=1)
        import pytest as _pytest

        with _pytest.raises(ValueError, match="no pyarrow filesystem"):
            resolve_fs("weird://x/y")
    finally:
        clear_fs_options()
    # after clearing, unregistered schemes fall back to from_uri
    fs2, _ = resolve_fs(f"file://{tmp_path}")
    assert isinstance(fs2, pafs.LocalFileSystem)


def test_sql_sink_rate_limit_rows_per_s(tmp_path):
    """Per-write-task rows/s cap (the reference's per-channel record cap):
    200 rows at 400 rows/s in 50-row chunks must pace >= ~0.375 s; row
    counts are identical either way."""
    import sqlite3
    import time

    import ray.data

    from tg_data_connector_ray.sinks.sql import SqlSinkConfig, write_sql

    db = str(tmp_path / "rl.db")
    t = pa.table(
        {
            "id": pa.array(range(200), pa.int64()),
            "name": pa.array([f"r{i}" for i in range(200)]),
        }
    )
    ds = ray.data.from_arrow(t).repartition(1)
    base = dict(
        table="t", columns=("id", "name"),
        pre_sql=("CREATE TABLE IF NOT EXISTS t (id INTEGER, name TEXT)",),
        batch_rows=50,
    )
    t0 = time.monotonic()
    n = write_sql(ds, lambda: sqlite3.connect(db), SqlSinkConfig(**base, rate_limit_rows_per_s=400))
    capped = time.monotonic() - t0
    assert n == 200
    # pre-commit pacing: 3 inter-chunk waits of 50/400 s each
    assert capped >= 0.35
    con = sqlite3.connect(db)
    assert con.execute("SELECT count(*) FROM t").fetchone()[0] == 200
    con.close()


def test_review_fixes_sources_sinks(tmp_path):
    """Fresh-eyes review regressions across the source/sink layer."""
    import io
    import struct
    import zipfile
    import zlib

    import pyarrow.compute as pc

    from tg_data_connector_ray.sinks.files import _serialize_batch, prepare_output_dir
    from tg_data_connector_ray.sources.codecs import (
        hadoop_snappy_compress,
        hadoop_snappy_uncompress,
        lzop_compress,
        lzop_uncompress,
    )
    from tg_data_connector_ray.sources.csv import _sniff_num_columns, read_csv_source

    # %f date_format: microseconds serialize, never the literal '%f'
    t = pa.table({"ts": pa.array([1_500_000], pa.timestamp("us"))})
    out = _serialize_batch(t, "\\N", "%Y-%m-%d %H:%M:%S.%f")
    assert out["ts"][0].as_py() == "1970-01-01 00:00:01.500000"

    # writeMode enforcement reaches URI targets via resolve_fs
    uri_dir = tmp_path / "remote"
    uri_dir.mkdir()
    (uri_dir / "old.csv").write_text("x\n")
    prepare_output_dir(f"file://{uri_dir}", "truncate")
    assert list(uri_dir.iterdir()) == []
    (uri_dir / "back.csv").write_text("x\n")
    with pytest.raises(Exception, match="not empty"):
        prepare_output_dir(f"file://{uri_dir}", "nonConflict")

    # zip whose first entry is a directory still sniffs the real member
    zp = tmp_path / "d.zip"
    with zipfile.ZipFile(zp, "w") as z:
        z.writestr("subdir/", "")
        z.writestr("subdir/a.csv", "a,b,c\n1,2,3\n")
    assert _sniff_num_columns(str(zp), ",") == 3

    # quoting disabled sniffs like Arrow parses (QUOTE_NONE)
    q = tmp_path / "q.csv"
    q.write_text('"a,b,c\n"x,y,z\n')
    assert _sniff_num_columns(str(q), ",", reader_config={"quote_char": False}) == 3

    # empty existing dir is a clear error, not IndexError
    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(FileNotFoundError, match="no input files"):
        read_csv_source(str(empty))

    # lzop with BOTH adler32_d and crc32_d checksum words parses (each set
    # flag advances its own 4 bytes)
    payload = b"col1,col2\n1,2\n" * 10
    blob = bytearray(lzop_compress(payload))
    # rewrite flags adler32_d -> adler32_d|crc32_d and splice in a crc word
    # per block; easier: build manually from the compressed body
    import tg_data_connector_ray.sources.codecs as C

    hdr = bytearray()
    hdr += struct.pack(">H", 0x0940) + struct.pack(">H", 0x2080)
    hdr += struct.pack(">H", 0x0940) + bytes([1, 5])
    hdr += struct.pack(">I", C._F_ADLER32_D | C._F_CRC32_D)
    hdr += struct.pack(">I", 0o644) + struct.pack(">I", 0) + struct.pack(">I", 0)
    hdr += bytes([0])
    hdr += struct.pack(">I", zlib.adler32(bytes(hdr)) & 0xFFFFFFFF)
    body = struct.pack(">I", len(payload)) + struct.pack(">I", len(payload))
    body += struct.pack(">I", zlib.adler32(payload) & 0xFFFFFFFF)
    body += struct.pack(">I", zlib.crc32(payload) & 0xFFFFFFFF)
    body += payload  # stored block (clen == ulen)
    stream = C._LZOP_MAGIC + bytes(hdr) + body + struct.pack(">I", 0)
    assert lzop_uncompress(stream) == payload

    # decoder limit: a prefix decode stops early (frame-aligned)
    big = b"x" * (3 << 20)
    enc = hadoop_snappy_compress(big)
    head = hadoop_snappy_uncompress(enc, limit=1 << 20)
    assert (1 << 20) <= len(head) < len(big)
    assert head == big[: len(head)]

    # negative ColumnSpec index is dirty, not silently resolved from the end
    from tg_data_connector_ray.sources.csv import ColumnSpec

    src = tmp_path / "neg"
    src.mkdir()
    (src / "a.csv").write_text("1,alice\n2,bob\n")
    ds = read_csv_source(
        str(src), columns=[ColumnSpec(index=-1, type="string", name="x")]
    )
    assert ds.count() == 0


def test_write_jsonl_roundtrip_modes_and_codec(tmp_path, ray_session):
    import glob
    import gzip
    import json as _json

    import ray.data

    from tg_data_connector_ray.sinks.files import write_jsonl

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": ["a", None, "line\nbreak", 'quote"inside'],
        }
    )
    ds = ray.data.from_arrow(t).repartition(2)
    out = str(tmp_path / "shards")
    write_jsonl(ds, out, rows_per_file=2)
    files = sorted(glob.glob(out + "/*.json"))
    assert len(files) >= 2  # one shard per block, never one giant file
    back = ray.data.read_json(out).to_pandas().sort_values("doc_id")
    assert list(back["doc_id"]) == [1, 2, 3, 4]
    assert back["text"].tolist()[1] is None  # null survives
    assert back["text"].tolist()[2] == "line\nbreak"  # escaped in transit

    # nonConflict refuses a non-empty target
    from tg_data_connector_ray.sinks.files import WriteModeError

    with pytest.raises(WriteModeError):
        write_jsonl(ds, out, write_mode="nonConflict")

    # gzip codec: suffixed files, valid stream, one JSON object per line
    outgz = str(tmp_path / "gz")
    write_jsonl(ds, outgz, compression="gzip")
    gz = sorted(glob.glob(outgz + "/*.json.gz"))
    assert gz
    with gzip.open(gz[0], "rt") as f:
        row = _json.loads(f.readline())
    assert set(row) == {"doc_id", "text"}

    with pytest.raises(ValueError):
        write_jsonl(ds, str(tmp_path / "bad"), compression="zstd")


def test_jsonl_writer_through_job_runner(tmp_path, ray_session):
    import glob

    from tg_data_connector_ray.pipelines.runner import run_job

    src = str(tmp_path / "in.csv")
    with open(src, "w") as f:
        f.write("7,hello\n8,world\n")
    out = str(tmp_path / "out_jsonl")
    job = {
        "job": {
            "content": [
                {
                    "reader": {
                        "name": "csv",
                        "parameter": {
                            "path": src,
                            "column": [
                                {"index": 0, "type": "long"},
                                {"index": 1, "type": "string"},
                            ],
                        },
                    },
                    "writer": {"name": "jsonl", "parameter": {"path": out}},
                }
            ]
        }
    }
    run_job(job)
    assert glob.glob(out + "/*.json")
    import ray.data

    back = ray.data.read_json(out).to_pandas()
    assert len(back) == 2


def test_jsonl_reader_round_trips_writer_output(tmp_path, ray_session):
    import ray.data

    from tg_data_connector_ray.pipelines.runner import run_job
    from tg_data_connector_ray.sinks.files import write_jsonl

    t = pa.table(
        {"doc_id": pa.array([1, 2], pa.int64()), "text": ["x", None]}
    )
    src_dir = str(tmp_path / "src")
    write_jsonl(ray.data.from_arrow(t), src_dir, compression="gzip")
    out = str(tmp_path / "roundtrip.parquet_dir")
    run_job(
        {
            "job": {
                "content": [
                    {
                        "reader": {
                            "name": "jsonl",
                            "parameter": {
                                "path": src_dir,
                                "compress": "gzip",
                                "columns": ["doc_id", "text"],
                            },
                        },
                        "writer": {"name": "parquet", "parameter": {"path": out}},
                    }
                ]
            }
        }
    )
    back = ray.data.read_parquet(out).to_pandas().sort_values("doc_id")
    assert list(back["doc_id"]) == [1, 2]
    assert back["text"].tolist() == ["x", None]
