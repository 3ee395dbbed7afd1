"""file_standardization_etl_spark — a from-scratch PySpark-native CDC /
incremental-ingest engine.

Re-expresses the query and data-processing capabilities of the reference
repo ``SolmazHuseyin/file-standardization-etl`` (a driver-side pandas ETL
job) as an idiomatic Spark engine:

- a binlog/WAL-style change stream (``op, doc_id, lsn, tokens, n_tok,
  source, schema_change``) is tailed with Structured Streaming and applied
  to a lake table of pre-tokenized training sequences via exactly-once,
  key-partitioned MERGE upserts (``cdc/``, ``streaming/``);
- the lake table is a parquet + versioned-manifest table ("mini-Iceberg":
  atomic snapshot commits, bucket-by-key layout, metadata-only schema
  evolution) because the sandbox ships no Iceberg/Delta jars (``lake/``);
- the reference's standardization / validation rules are re-expressed as
  vectorized column expressions and pandas/Arrow UDFs (``functions/``);
- the reference's relational operator inventory (SURVEY.md §2) plus the
  training-data-pipeline extensions (dedup, similarity search, text
  analysis, multimodal plumbing) live in ``operators/`` and ``plans/``.

Nothing here is a port: the reference's per-row pandas loops become
declarative DataFrame plans optimized by Catalyst/Tungsten/AQE.
"""

__version__ = "0.1.0"
