"""Sinks: partitioned Parquet and delimited text with writeMode semantics."""
