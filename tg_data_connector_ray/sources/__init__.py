"""Sources: Parquet / CSV readers with the reference's edge semantics."""
