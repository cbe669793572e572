"""Pipelines: the config-driven job runner and relational demo pipelines."""
