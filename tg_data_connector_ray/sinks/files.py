"""File sinks with the reference's writeMode semantics (studied from
txtfilewriter/.../TxtFileWriter.java:101-198 and
UnstructuredStorageWriterUtil.java — not ported):

- writeMode: ``truncate`` (clear matching files), ``append`` (co-exist via
  per-task unique names; Ray's filename provider already gives uniqueness,
  the reference's `prefix__uuid` trick :117-144), ``nonConflict`` (error if
  the target has files);
- nullFormat / dateFormat on serialization;
- one file per block (never one giant file) — resumable layout.

Parquet is the preferred lake format; delimited text exists for parity
(the TigerGraph writer serialized each record to one `sep`-joined line,
Record2StringWriterUtil.java:23-42).
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.csv as pacsv


class WriteModeError(RuntimeError):
    pass


def prepare_output_dir(path: str, mode: str = "truncate") -> None:
    if mode not in ("truncate", "append", "nonConflict"):
        raise ValueError(f"writeMode must be truncate|append|nonConflict, got {mode}")
    if not os.path.exists(path):
        os.makedirs(path, exist_ok=True)
        return
    entries = [e for e in os.listdir(path) if not e.startswith(".")]
    if mode == "truncate":
        for e in entries:
            p = os.path.join(path, e)
            shutil.rmtree(p) if os.path.isdir(p) else os.remove(p)
    elif mode == "nonConflict" and entries:
        raise WriteModeError(f"nonConflict: output dir {path} is not empty")


def _serialize_batch(
    batch: pa.Table, null_format: str, date_format: "str | None"
) -> pa.Table:
    cols = {}
    for name in batch.column_names:
        c = batch[name]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        if pa.types.is_timestamp(c.type):
            # arrow's %S prints fractional seconds; truncate to seconds first
            c = pc.strftime(
                c.cast(pa.timestamp("s"), safe=False),
                format=date_format or "%Y-%m-%d %H:%M:%S",
            )
        elif not (pa.types.is_string(c.type) or pa.types.is_large_string(c.type)):
            c = c.cast(pa.string())
        cols[name] = pc.fill_null(c, null_format)
    return pa.table(cols)


def write_delimited(
    ds,
    path: str,
    *,
    delimiter: str = ",",
    null_format: str = "\\N",
    date_format: "str | None" = None,
    write_mode: str = "truncate",
    header: bool = False,
):
    """Delimited-text sink; returns None (terminal)."""
    prepare_output_dir(path, write_mode)
    out = ds.map_batches(
        lambda b: _serialize_batch(b, null_format, date_format),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    out.write_csv(
        path,
        arrow_csv_args_fn=lambda: {
            "write_options": pacsv.WriteOptions(
                include_header=header, delimiter=delimiter
            )
        },
    )


def write_parquet_sink(ds, path: str, *, write_mode: str = "truncate", partition_cols=None):
    prepare_output_dir(path, write_mode)
    kwargs = {}
    if partition_cols:
        kwargs["partition_cols"] = list(partition_cols)
    ds.write_parquet(path, **kwargs)
