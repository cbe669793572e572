"""Config-driven job runner — the analogue of the reference's job JSON +
Engine/JobContainer lifecycle (README.md:72-108; JobContainer.java:95-186),
re-expressed as ONE lazy Ray Data pipeline instead of channelized
reader/writer thread pairs.

Job shape (JSON-compatible dict):

    {"job": {"content": [{
        "reader":      {"name": "parquet"|"csv", "parameter": {...}},
        "transformer": [{"name": "dx_substr", "parameter": {...}}, ...],
        "writer":      {"name": "parquet"|"csv"|"stream", "parameter": {...}}
     }],
     "setting": {"errorLimit": {"record": N, "percentage": P},
                 "speed": {"byte": Bps, "record": tps, "channel": C},
                 "dryRun": false}}}

Lifecycle parity:
- dryRun validates config + input existence + output-mode without moving
  data (reference preCheck, JobContainer.java:188-198);
- errorLimit enforced at job end, record-limit priority
  (ErrorRecordChecker.java:25-81);
- metrics mirror read/write/transformer counters (CommunicationTool.java)
  gathered by a small counter actor (the analogue of the reference's
  Communication tree — the one shared-mutable-state actor in the engine);
- readers/writers/transformers are looked up in registries keyed by
  config `name` (the plugin-SPI analogue, SURVEY.md §2.7);
- setting.speed (Channel.java:54-60) throttles flow ahead of the writer
  to protect EXTERNAL endpoints — engine-internal backpressure is Ray's
  job, so limits <= 0 / absent mean "no throttle" (stages/ratelimit.py);
- post-run hooks: callables invoked with the metrics dict
  (Hook SPI, HookInvoker.java:42-89).
- sensitive config values (*password*, *accessKey*) are masked in logs
  (Engine.java:110-120).
"""

from __future__ import annotations

import json
import os
from functools import partial

import pyarrow as pa

import ray
import ray.data

from ..sinks.files import write_delimited, write_parquet_sink
from ..sources.csv import ColumnSpec, read_csv_source
from ..stages.transforms import TransformSpec, apply_chain


class JobConfigError(ValueError):
    pass


class JobErrorLimit(RuntimeError):
    pass


@ray.remote(num_cpus=0)
class _Counters:
    """Job-wide metric accumulator (read/write/filter/dirty records)."""

    def __init__(self):
        self.c = {}

    def add(self, **kv):
        for k, v in kv.items():
            self.c[k] = self.c.get(k, 0) + v

    def get(self):
        return dict(self.c)


def mask_sensitive(cfg: dict) -> dict:
    def walk(x):
        if isinstance(x, dict):
            return {
                k: ("******" if any(s in k.lower() for s in ("password", "accesskey")) else walk(v))
                for k, v in x.items()
            }
        if isinstance(x, list):
            return [walk(v) for v in x]
        return x

    return walk(cfg)


# --- reader registry --------------------------------------------------------

def _read_parquet(param: dict) -> "ray.data.Dataset":
    kwargs = {}
    if param.get("columns"):
        kwargs["columns"] = list(param["columns"])
    return ray.data.read_parquet(param["path"], **kwargs)


def _read_csv(param: dict) -> "ray.data.Dataset":
    columns = None
    if param.get("column"):
        columns = [
            ColumnSpec(
                index=c.get("index"),
                value=c.get("value"),
                type=c.get("type", "string"),
                format=c.get("format"),
                name=c.get("name"),
            )
            for c in param["column"]
        ]
    return read_csv_source(
        param["path"],
        compress=param.get("compress"),
        delimiter=param.get("fieldDelimiter", ","),
        skip_header=param.get("skipHeader", False),
        null_format=param.get("nullFormat"),
        columns=columns,
        encoding=param.get("encoding", "utf-8"),
        dirty_dir=param.get("dirtyDir"),
        csv_reader_config=param.get("csvReaderConfig"),
    )


def _read_jsonl(param: dict) -> "ray.data.Dataset":
    """JSONL source (one object per line; .gz transparently) — the
    round-trip partner of the `jsonl` writer.  Optional `columns` prunes
    at the read."""
    ds = ray.data.read_json(
        param["path"],
        arrow_open_stream_args=(
            {"compression": param["compress"]} if param.get("compress") else None
        ),
    )
    if param.get("columns"):
        ds = ds.select_columns(list(param["columns"]))
    return ds


READERS = {"parquet": _read_parquet, "csv": _read_csv, "jsonl": _read_jsonl}


# --- writer registry --------------------------------------------------------

def _write_parquet(ds, param: dict):
    write_parquet_sink(
        ds,
        param["path"],
        write_mode=param.get("writeMode", "truncate"),
        partition_cols=param.get("partitionCols"),
    )


def _write_csv(ds, param: dict):
    write_delimited(
        ds,
        param["path"],
        delimiter=param.get("fieldDelimiter", ","),
        null_format=param.get("nullFormat", "\\N"),
        date_format=param.get("dateFormat"),
        write_mode=param.get("writeMode", "truncate"),
        header=param.get("header", False),
        compression=param.get("compress"),
    )


def _write_jsonl(ds, param: dict):
    from ..sinks.files import write_jsonl

    write_jsonl(
        ds,
        param["path"],
        write_mode=param.get("writeMode", "truncate"),
        compression=param.get("compress"),
        rows_per_file=param.get("rowsPerFile"),
    )


def _write_stream(ds, param: dict):
    # debug sink (reference streamwriter): print first rows
    n = int(param.get("limit", 20))
    for row in ds.take(n):
        print(json.dumps(row, default=str))


def _write_sql(ds, param: dict):
    """Config-driven RDBMS sink (reference writer job JSON shape:
    connection factory import path OR a sqlite path for tests, table,
    column list, writeMode, preSql/postSql)."""
    from ..sinks.sql import SqlSinkConfig, write_sql

    if "sqlitePath" in param:
        import sqlite3

        db = param["sqlitePath"]

        def factory(db=db):
            return sqlite3.connect(db)

    else:
        import importlib

        mod, _, fn = param["connectionFactory"].rpartition(".")
        factory = getattr(importlib.import_module(mod), fn)
    cfg = SqlSinkConfig(
        table=param["table"],
        columns=tuple(param["column"]),
        write_mode=param.get("writeMode", "insert"),
        conflict_keys=tuple(param.get("conflictKeys", ())),
        dialect=param.get("dialect", "sqlite"),
        batch_rows=int(param.get("batchSize", 2048)),
        pre_sql=tuple(param.get("preSql", ())),
        post_sql=tuple(param.get("postSql", ())),
        concurrency=int(param.get("concurrency", 1)),
    )
    write_sql(ds, factory, cfg)


WRITERS = {
    "parquet": _write_parquet,
    "csv": _write_csv,
    "jsonl": _write_jsonl,
    "stream": _write_stream,
    "sql": _write_sql,
}

POST_HOOKS: list = []


def register_reader(name, fn):
    READERS[name] = fn


def register_writer(name, fn):
    WRITERS[name] = fn


def register_hook(fn):
    POST_HOOKS.append(fn)


def _chain_with_metrics(batch: pa.Table, specs, counters, dirty_dir) -> pa.Table:
    res = apply_chain(batch, specs)
    # synchronous add: the job reads the counters right after the sink
    # finishes, so a fire-and-forget add could still be in flight
    ray.get(
        counters.add.remote(
            read_records=batch.num_rows,
            filtered_records=res.filtered,
            dirty_records=res.dirty,
            written_records=res.table.num_rows,
        )
    )
    if res.dirty_rows is not None and dirty_dir:
        from ..util import atomic_write_parquet, new_token

        os.makedirs(dirty_dir, exist_ok=True)
        atomic_write_parquet(
            os.path.join(dirty_dir, f"dirty-{new_token()}.parquet"), res.dirty_rows
        )
    return res.table


def run_cdc_job(config: dict) -> dict:
    """CDC job form — the engine's flagship as a config-driven job:

        {"job": {"cdc": {"events": <dir|files>, "out": <dir>,
                         "snapshot": <path?>, "numPartitions": N,
                         "hotKeys": [...], "detectHotKeys": bool,
                         "orphanUpdates": "upsert"|"drop",
                         "mergeStrategy": "refold"|"delta",
                         "deltaCompactRuns": int?,
                         "nullFormat": str?, "tombstoneRetentionLsn": int?,
                         "errorLimit": {"record": N, "percentage": P}}}}
    """
    from ..cdc.config import CdcConfig
    from ..cdc.pipeline import apply_cdc, detect_hot_keys

    c = config["job"]["cdc"]
    el = c.get("errorLimit", {})
    hot = tuple(c.get("hotKeys", ()))
    if not hot and c.get("detectHotKeys"):
        hot = tuple(detect_hot_keys(c["events"]))
    cfg = CdcConfig(
        out_dir=c["out"],
        num_partitions=int(c.get("numPartitions", 64)),
        orphan_updates=c.get("orphanUpdates", "upsert"),
        merge_strategy=c.get("mergeStrategy", "refold"),
        delta_compact_runs=c.get("deltaCompactRuns"),
        null_format=c.get("nullFormat"),
        hot_keys=hot,
        tombstone_retention_lsn=c.get("tombstoneRetentionLsn"),
        error_limit_records=el.get("record"),
        error_limit_pct=el.get("percentage"),
    )
    summary = apply_cdc(c["events"], cfg, snapshot_path=c.get("snapshot"))
    summary["hot_keys"] = list(hot)
    for hook in POST_HOOKS:
        hook(dict(summary))
    return summary


def run_job(config: dict) -> dict:
    """Execute one job config; returns the metrics dict."""
    if "cdc" in config.get("job", {}):
        return run_cdc_job(config)
    try:
        content = config["job"]["content"][0]
        reader = content["reader"]
        writer = content["writer"]
    except (KeyError, IndexError) as e:
        raise JobConfigError(f"malformed job config: {e}") from e
    setting = config["job"].get("setting", {})
    transformers = content.get("transformer", [])

    if reader["name"] not in READERS:
        raise JobConfigError(f"unknown reader {reader['name']!r}")
    if writer["name"] not in WRITERS:
        raise JobConfigError(f"unknown writer {writer['name']!r}")
    def _spec(t: dict) -> TransformSpec:
        param = t.get("parameter", {})
        col = param.get("columnIndex", param.get("column"))
        if t["name"] == "dx_py":
            # inline-config code string (the reference's dx_groovy shape):
            # compiled ONCE here, then runs as a plain chain UDF; malformed
            # configs (missing code, bad mode/column, syntax errors) must
            # surface as JobConfigError like every other config problem
            from ..stages.transforms import compile_py_transformer

            if "code" not in param:
                raise JobConfigError("dx_py transformer needs parameter.code")
            try:
                fn = compile_py_transformer(
                    param["code"], col=col, mode=param.get("mode", "vector")
                )
            except (SyntaxError, ValueError) as e:
                raise JobConfigError(f"dx_py config invalid: {e}") from e
            return TransformSpec(name="dx_udf", params={"fn": fn})
        return TransformSpec(
            name=t["name"],
            col=col,
            params={k: v for k, v in param.items() if k not in ("columnIndex", "column")},
        )

    specs = [_spec(t) for t in transformers]

    if setting.get("dryRun"):
        # preCheck: inputs exist, writer dir viable, transformer names known
        p = reader["parameter"].get("path")
        if p and not os.path.exists(p):
            raise JobConfigError(f"reader path missing: {p}")
        for s in specs:
            # dx_py already compiled to dx_udf above (compile errors in the
            # inline code string surface at config time, like preCheck wants)
            if s.name not in ("dx_substr", "dx_pad", "dx_replace", "dx_filter", "dx_udf"):
                raise JobConfigError(f"unknown transformer {s.name}")
        return {"dry_run": True, "config": mask_sensitive(config)}

    counters = _Counters.remote()
    ds = READERS[reader["name"]](reader.get("parameter", {}))
    dirty_dir = writer.get("parameter", {}).get("dirtyDir")
    ds = ds.map_batches(
        partial(_chain_with_metrics, specs=specs, counters=counters, dirty_dir=dirty_dir),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    speed = setting.get("speed", {})
    if speed.get("byte", 0) > 0 or speed.get("record", 0) > 0:
        from ..stages.ratelimit import throttle

        ds = throttle(
            ds,
            byte_speed=float(speed.get("byte", 0)),
            record_speed=float(speed.get("record", 0)),
            channels=int(speed.get("channel", 1)),
        )
    WRITERS[writer["name"]](ds, writer.get("parameter", {}))

    metrics = ray.get(counters.get.remote())
    # reference ErrorRecordChecker: record limit first, then percentage
    el = setting.get("errorLimit", {})
    dirty = metrics.get("dirty_records", 0)
    total = metrics.get("read_records", 0)
    if el.get("record") is not None and dirty > el["record"]:
        raise JobErrorLimit(f"dirty records {dirty} > limit {el['record']}")
    if el.get("percentage") is not None and total and dirty / total > el["percentage"]:
        raise JobErrorLimit(f"dirty ratio {dirty/total:.4f} > {el['percentage']}")
    for hook in POST_HOOKS:
        hook(dict(metrics))
    return metrics
