"""Lake storage layer: a parquet + versioned-snapshot table format with
atomic commits, hash-bucket layout, metadata-only schema evolution, and a
MERGE primitive. A minimal stand-in for Iceberg (the sandbox ships no
Iceberg/Delta jars — SURVEY.md §7.4 fallback), keeping the same contract:
snapshot isolation, ACID single-writer commits, ALTER TABLE without data
rewrite, and bucket-pruned upserts."""

from .table import LakeTable, SchemaColumn, TableSchema

__all__ = ["LakeTable", "SchemaColumn", "TableSchema"]
