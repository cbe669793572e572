"""Durable engine state lives on storage, not in this package: partition
state Parquet (per-key per-column LSN watermarks + tombstones) under
`<out>/state/part=*/`, lineage JSON under `<out>/lineage/part=*/` — see
cdc/merge.py STATE_SCHEMA and cdc/pipeline.py.  This package holds the
in-memory views over it: ``watermarks.WatermarkStore`` (mtime-cached
per-partition watermark/lineage reader for resume planning and
merge_mode="actors" workers)."""

from .watermarks import WatermarkStore

__all__ = ["WatermarkStore"]
