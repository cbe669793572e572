"""Durable engine state lives on storage, not in this package: partition
state Parquet (per-key per-column LSN watermarks + tombstones) under
`<out>/state/part=*/`, lineage JSON under `<out>/lineage/part=*/` — see
cdc/merge.py STATE_SCHEMA and cdc/pipeline.py.  Kept as a package for
future in-memory state backends (e.g. cached watermark maps for
merge_mode="actors")."""
