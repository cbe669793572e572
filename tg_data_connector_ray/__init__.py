"""tg_data_connector_ray — a Ray-Data-native CDC / incremental-ingest engine.

A from-scratch re-expression of the capabilities of
TigerGraph-DevLabs/TG-Data-Connector (a DataX fork: readers -> transformer
chain -> writers, see SURVEY.md) as idiomatic Ray Data pipelines:

- ``cdc``       — the flagship: binlog/WAL-tail replay of I/U/D change events
                  over transcript Parquet tables, hash-partitioned by
                  ``conv_id``, applied exactly-once/idempotently via per-key
                  LSN high-watermarks into partitioned Parquet with schema
                  evolution, tombstoned deletes + compaction, and
                  per-partition lineage/checkpoint for resume.
- ``stages``    — per-record transform parity with the reference's
                  ``dx_substr/dx_pad/dx_replace/dx_filter`` chain
                  (reference: core/.../transformer/*.java), vectorized over
                  Arrow batches.
- ``sources``   — Parquet/CSV sources with the reference's CSV semantics
                  (skipHeader, column spec, nullFormat; reference:
                  plugin-unstructured-storage-util/.../UnstructuredStorageReaderUtil.java).
- ``sinks``     — partitioned Parquet / delimited-text sinks with the
                  reference's writeMode semantics (truncate/append/nonConflict;
                  reference: txtfilewriter/.../TxtFileWriter.java).
- ``ops``       — large-scale training-data operators: dedup (exact, MinHash
                  LSH, SimHash, n-gram Jaccard, embedding cosine), similarity
                  search, text analysis, multimodal plumbing.
- ``pipelines`` — config-driven job runner (the DataX job-JSON analogue) and
                  relational demo pipelines.

Nothing in this package calls ``ray.init()`` / ``ray.shutdown()`` — sessions
are owned by the caller (bench.py, CLIs, the pytest fixture, the driver).
"""

__version__ = "0.4.0"
