"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship CDC query; ``queries()`` exposes every
implemented operator from SURVEY.md §2 (plus the training-data-pipeline
extensions); ``oracle_sql()`` gives the DuckDB-equivalent ANSI SQL per
query (omitted for genuinely non-SQL-expressible operators — the driver
then records a rows-only check).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from file_standardization_etl_spark.plans.queries import QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: CDC replay final state (LWW + tombstone filter) over the
    sf0.001 events stream."""
    fn, _ = QUERIES["cdc_replay_state"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in QUERIES.items() if sql is not None}
