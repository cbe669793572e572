"""Batch-transform stages: the reference's transformer-chain parity layer."""
