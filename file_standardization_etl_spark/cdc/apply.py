"""apply_batch — one micro-batch of the CDC engine (SURVEY.md §7.0).

Pipeline per batch (≈ one "job run" of the reference,
``/root/reference/file_standardization_job.py:199-240``):

1. **Idempotency guard** — drop events at or below the table's applied-LSN
   watermark (the reference's ``is_processed`` flag,
   ``src/database/operations.py:95-108``). A retried/replayed batch
   becomes a no-op.
2. **DDL chunking** — split the batch at ``schema_change`` LSNs so data
   events before a rename/add/widen merge under the old schema and events
   after it under the new one (SURVEY.md §7.4 "schema-change/data
   interleaving").
3. **Validation split** — vectorized reason column → (valid, quarantine);
   quarantine is written idempotently per (batch, chunk) directory.
4. **LWW dedup** — max_by per doc_id (map-side combine kills most skew);
   salted two-phase reduction engaged automatically when the batch's key
   histogram is hot.
5. **MERGE** — bucket-pruned join-and-rewrite with the LSN monotonic guard
   (``new.lsn > old.last_lsn``); deletes tombstone without forgetting
   ``last_lsn`` so lower-LSN stragglers can never resurrect a row.
6. **Lineage manifest** — per-partition rows/LSN-span + quarantine counts
   + skew stats, one atomic JSON per batch (the reference's
   MetricsCollector, ``src/utils/metrics.py:36-177``, made transactional).

Payload→column binding is by **column id**, not name (ids 1..6 fixed at
table create), so a ``rename_column`` mid-stream never breaks ingestion —
the reference got the same effect from its dd_attribute_detail lookup
(``/root/reference/config/queries.py:117-131``).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.validation import split_valid_quarantine
from ..lake.table import LakeTable
from .dedup import lww_maxby, lww_maxby_salted
from .events import EVENT_SCHEMA, SOURCE_WHITELIST

# stable column ids in the target table (order passed to LakeTable.create)
FID_DOC, FID_TOKENS, FID_NTOK, FID_SOURCE, FID_LSN, FID_DELETED = 1, 2, 3, 4, 5, 6

TARGET_COLUMNS = [
    ("doc_id", "string"),
    ("tokens", "array<int>"),
    ("n_tok", "int"),
    ("source", "string"),
    ("last_lsn", "bigint"),
    ("deleted", "boolean"),
]


@dataclass
class BatchMetrics:
    batch_id: int
    chunks: int
    rows_in: int
    rows_valid: int
    rows_quarantined: int
    quarantine_by_reason: dict
    rows_upserts: int
    rows_deletes: int
    schema_changes: int
    lsn_min: int | None
    lsn_max: int | None
    max_key_rows: int
    distinct_keys: int
    salted: bool
    partitions: list  # per-partition lineage rows
    table_version: int

    def to_json(self) -> dict:
        return self.__dict__.copy()


class CdcEngine:
    """Binds a target LakeTable + quarantine sink + manifest directory."""

    def __init__(
        self,
        spark: SparkSession,
        table_path: str,
        whitelist: list[str] | None = None,
        use_pandas_udf_validation: bool = True,
        salt_threshold: int = 100_000,
        salt_buckets: int = 32,
        n_buckets: int = 16,
    ):
        self.spark = spark
        self.table_path = os.path.abspath(table_path)
        self.quarantine_path = os.path.join(self.table_path, "quarantine")
        self.manifest_dir = os.path.join(self.table_path, "_manifest")
        self.whitelist = list(whitelist or SOURCE_WHITELIST)
        self.use_pandas_udf_validation = use_pandas_udf_validation
        self.salt_threshold = salt_threshold
        self.salt_buckets = salt_buckets
        self.n_buckets = n_buckets
        self.table = LakeTable(spark, os.path.join(self.table_path, "target"))

    # ---------- lifecycle ----------

    def init(self) -> None:
        if not self.table.exists():
            LakeTable.create(
                self.spark,
                self.table.path,
                TARGET_COLUMNS,
                key_column="doc_id",
                n_buckets=self.n_buckets,
                properties={"max_applied_lsn": 0, "last_batch_id": -1},
            )
        os.makedirs(self.manifest_dir, exist_ok=True)

    def applied_lsn(self) -> int:
        return int(self.table.properties().get("max_applied_lsn", 0))

    # ---------- field-id → current-name resolution ----------

    def _names(self) -> dict[int, str]:
        return {c.id: c.name for c in self.table.schema().columns}

    # ---------- state readers ----------

    def state(self, include_deleted: bool = False) -> DataFrame:
        n = self._names()
        df = self.table.read()
        if not include_deleted:
            df = df.filter(~F.coalesce(F.col(n[FID_DELETED]), F.lit(False)))
        return df

    def quarantine(self) -> DataFrame:
        try:
            return self.spark.read.parquet(self.quarantine_path)
        except Exception:
            import pyspark.sql.types as T

            schema = T.StructType(
                [f for f in EVENT_SCHEMA.fields if f.name != "schema_change"]
            ).add("reason", "string").add("batch_id", "long").add("chunk", "int")
            return self.spark.createDataFrame([], schema)

    def manifest(self) -> list[dict]:
        out = []
        for f in sorted(os.listdir(self.manifest_dir)):
            if f.endswith(".json"):
                with open(os.path.join(self.manifest_dir, f)) as fh:
                    out.append(json.load(fh))
        return out

    # ---------- the merge resolution ----------

    def _merge_chunk(self, delta: DataFrame, delta_rows: int, watermark: int) -> None:
        n = self._names()
        key = n[FID_DOC]

        def resolve(old: dict, new: dict) -> dict:
            take_new = new["lsn"].isNotNull() & (
                old[n[FID_LSN]].isNull() | (new["lsn"] > old[n[FID_LSN]])
            )
            is_del = new["op"] == "delete"
            out = {
                key: F.coalesce(old[key], new["doc_id"]),
                n[FID_TOKENS]: F.when(
                    take_new, F.when(is_del, F.lit(None)).otherwise(new["tokens"])
                ).otherwise(old[n[FID_TOKENS]]),
                n[FID_NTOK]: F.when(
                    take_new, F.when(is_del, F.lit(None)).otherwise(new["n_tok"])
                ).otherwise(old[n[FID_NTOK]]),
                n[FID_SOURCE]: F.when(
                    take_new, F.when(is_del, F.lit(None)).otherwise(new["source"])
                ).otherwise(old[n[FID_SOURCE]]),
                n[FID_LSN]: F.when(take_new, new["lsn"]).otherwise(old[n[FID_LSN]]),
                n[FID_DELETED]: F.when(take_new, is_del).otherwise(
                    F.coalesce(old[n[FID_DELETED]], F.lit(False))
                ),
            }
            # columns added by schema evolution: carry old value (null for new rows)
            for c in self.table.schema().columns:
                if c.name not in out:
                    out[c.name] = old[c.name]
            return out

        self.table.merge(
            delta,
            resolve,
            properties_update={"max_applied_lsn": watermark},
            delta_rows=delta_rows,
        )

    # ---------- apply one micro-batch ----------

    def apply_batch(self, events: DataFrame, batch_id: int) -> BatchMetrics:
        applied = self.applied_lsn()
        events = events.filter(F.col("lsn") > F.lit(applied))

        # DDL boundaries (schema_change events are rare; collect is tiny)
        ddl = sorted(
            (
                (r["lsn"], json.loads(r["schema_change"]))
                for r in events.filter(F.col("op") == "schema_change").collect()
            ),
            key=lambda x: x[0],
        )
        data = events.filter(F.col("op") != "schema_change")

        bounds: list[tuple[int | None, int | None, dict | None]] = []
        lo = None
        for lsn, change in ddl:
            bounds.append((lo, lsn, change))
            lo = lsn
        bounds.append((lo, None, None))

        totals = {
            "rows_in": 0,
            "rows_valid": 0,
            "rows_quarantined": 0,
            "rows_upserts": 0,
            "rows_deletes": 0,
            "max_key_rows": 0,
            "distinct_keys": 0,
        }
        by_reason: dict[str, int] = {}
        partitions: list[dict] = []
        lsn_min = lsn_max = None
        salted_any = False

        for ci, (lo, hi, change) in enumerate(bounds):
            chunk = data
            if lo is not None:
                chunk = chunk.filter(F.col("lsn") > F.lit(lo))
            if hi is not None:
                chunk = chunk.filter(F.col("lsn") < F.lit(hi))
            chunk = chunk.persist()
            try:
                # one aggregation pass: per-partition lineage + global span
                part_rows = (
                    chunk.groupBy(F.spark_partition_id().alias("partition_id"))
                    .agg(
                        F.count(F.lit(1)).alias("rows"),
                        F.min("lsn").alias("lsn_min"),
                        F.max("lsn").alias("lsn_max"),
                    )
                    .collect()
                )
                rows_in = sum(r["rows"] for r in part_rows)
                totals["rows_in"] += rows_in
                for r in part_rows:
                    partitions.append(
                        {
                            "chunk": ci,
                            "partition_id": r["partition_id"],
                            "rows": r["rows"],
                            "lsn_min": r["lsn_min"],
                            "lsn_max": r["lsn_max"],
                        }
                    )
                    lsn_min = r["lsn_min"] if lsn_min is None else min(lsn_min, r["lsn_min"])
                    lsn_max = r["lsn_max"] if lsn_max is None else max(lsn_max, r["lsn_max"])

                if rows_in > 0:
                    valid, quar = split_valid_quarantine(
                        chunk, self.whitelist, use_pandas_udf=self.use_pandas_udf_validation
                    )
                    # idempotent quarantine write: fixed dir per (batch, chunk)
                    qdir = os.path.join(
                        self.quarantine_path, f"batch_id={batch_id}", f"chunk={ci}"
                    )
                    quar.drop("schema_change").write.mode("overwrite").parquet(qdir)
                    qcounts = (
                        self.spark.read.parquet(qdir)
                        .groupBy("reason")
                        .agg(F.count(F.lit(1)).alias("n"))
                        .collect()
                    )
                    for r in qcounts:
                        by_reason[r["reason"]] = by_reason.get(r["reason"], 0) + r["n"]
                        totals["rows_quarantined"] += r["n"]

                    valid = valid.persist()
                    skew = (
                        valid.groupBy("doc_id")
                        .agg(F.count(F.lit(1)).alias("rows"))
                        .agg(
                            F.max("rows").alias("max_key_rows"),
                            F.count(F.lit(1)).alias("distinct_keys"),
                        )
                        .collect()
                    )
                    max_key = skew[0]["max_key_rows"] or 0
                    totals["max_key_rows"] = max(totals["max_key_rows"], max_key)
                    totals["distinct_keys"] = max(totals["distinct_keys"], skew[0]["distinct_keys"] or 0)

                    dedup_cols = ["doc_id", "lsn", "op", "tokens", "n_tok", "source"]
                    slim = valid.select(*dedup_cols)
                    if max_key >= self.salt_threshold:
                        delta = lww_maxby_salted(slim, salt_buckets=self.salt_buckets)
                        salted_any = True
                    else:
                        delta = lww_maxby(slim)
                    delta = delta.persist()
                    n_delta = delta.count()
                    ops = delta.groupBy("op").agg(F.count(F.lit(1)).alias("n")).collect()
                    for r in ops:
                        if r["op"] == "delete":
                            totals["rows_deletes"] += r["n"]
                        else:
                            totals["rows_upserts"] += r["n"]
                    totals["rows_valid"] += n_delta

                    watermark = max(applied, lsn_max or applied)
                    self._merge_chunk(delta, n_delta, watermark)
                    applied = watermark
                    delta.unpersist()
                    valid.unpersist()

                if change is not None:
                    self.table.apply_schema_change(change, lsn=hi)
                    applied = max(applied, hi)
                    # DDL advances the watermark too (oracle parity)
                    snap = self.table.snapshot()
                    snap["properties"]["max_applied_lsn"] = applied
                    self.table._commit(snap, snap["version"])
            finally:
                chunk.unpersist()

        metrics = BatchMetrics(
            batch_id=batch_id,
            chunks=len(bounds),
            rows_in=totals["rows_in"],
            rows_valid=totals["rows_valid"],
            rows_quarantined=totals["rows_quarantined"],
            quarantine_by_reason=by_reason,
            rows_upserts=totals["rows_upserts"],
            rows_deletes=totals["rows_deletes"],
            schema_changes=len(ddl),
            lsn_min=lsn_min,
            lsn_max=lsn_max,
            max_key_rows=totals["max_key_rows"],
            distinct_keys=totals["distinct_keys"],
            salted=salted_any,
            partitions=partitions,
            table_version=self.table.current_version(),
        )
        self._write_manifest(metrics)
        # record batch id
        snap = self.table.snapshot()
        snap["properties"]["last_batch_id"] = batch_id
        snap["properties"]["max_applied_lsn"] = applied
        self.table._commit(snap, snap["version"])
        return metrics

    def _write_manifest(self, m: BatchMetrics) -> None:
        path = os.path.join(self.manifest_dir, f"batch-{m.batch_id:010d}.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m.to_json(), f, indent=1)
        os.replace(tmp, path)
