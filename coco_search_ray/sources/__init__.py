"""Parquet sources + deterministic synthetic table generators."""
