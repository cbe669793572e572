"""CDC core: normalize -> hash-partition by conv_id -> idempotent LSN-ordered
merge (MergeApply) -> partitioned Parquet state/table + per-partition lineage.
"""
