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
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.sql import Observation

from ..functions.validation import split_with_reason
from ..lake.table import LakeTable, bucket_expr
from .events import EVENT_SCHEMA, SOURCE_WHITELIST

QUARANTINE_REASONS = ["null_tokens", "empty_tokens", "bad_n_tok", "bad_source"]

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
        validation_mode: str = "hybrid",  # hybrid | slim | arrow | pandas | expr
        # Rows-per-chunk above which the two-phase salted LWW engages.
        # Effectively opt-in by default: the max_by hash aggregate already
        # pre-reduces every hot key map-side (a key collapses to one row
        # per task before the shuffle), and measured replays show salting
        # a normal batch costs ~1.6x (the (key, salt) pre-reduction
        # multiplies group cardinality by salt_buckets). Lower this only
        # for adversarial distributions where a single task's group
        # cardinality overflows the agg hash table, or when using the
        # window-based LWW formulation (which has no map-side combine).
        salt_threshold: int = 500_000_000,
        salt_buckets: int = 32,
        n_buckets: int = 16,
    ):
        self.spark = spark
        self.table_path = os.path.abspath(table_path)
        self.quarantine_path = os.path.join(self.table_path, "quarantine")
        self.manifest_dir = os.path.join(self.table_path, "_manifest")
        self.whitelist = list(whitelist or SOURCE_WHITELIST)
        self.validation_mode = validation_mode
        # chunks with more rows than this use the two-phase salted LWW
        self.salt_threshold = salt_threshold
        self.salt_buckets = salt_buckets
        self.n_buckets = n_buckets
        self.table = LakeTable(spark, os.path.join(self.table_path, "target"))
        # one pool per engine: quarantine writes + lineage scans run as
        # concurrent Spark jobs overlapping the LWW/merge critical path
        self._pool = ThreadPoolExecutor(max_workers=4)

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

    def _merge_chunk(
        self,
        delta: DataFrame,
        delta_rows: int,
        watermark: int,
        batch_id: int,
        affected_buckets: list[int] | None = None,
    ) -> None:
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
            properties_update={"max_applied_lsn": watermark, "last_batch_id": batch_id},
            delta_rows=delta_rows,
            affected_buckets=affected_buckets,
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
            # Pass structure — two SYNCHRONOUS Spark jobs on the critical
            # path (LWW stats, merge write) plus two ASYNC jobs on the
            # engine's pool (lineage scan, quarantine write) that overlap
            # them; per-batch counters ride the jobs that already run
            # (max_by(op) in the LWW agg, Observation on the quarantine
            # write, collect_set(bucket) in the stats collect) instead of
            # costing extra scans:
            #   async  lineage: per-partition rows + LSN span over the raw
            #          chunk — narrow columnar scan, joined pre-commit for
            #          the watermark.
            #   async  quarantine: expr pre-filter + vectorized reason UDF
            #          → idempotent write per (batch, chunk) dir; counts by
            #          reason come from the write's own Observation.
            #   sync   LWW: narrow (doc_id → max lsn, cnt, winner-op) agg;
            #          one collect returns delta size, skew stats, delete
            #          count, and the affected-bucket set.
            #   sync   merge: broadcast semi-join payload fetch feeds the
            #          bucket-pruned merge (no internal distinct/count jobs).
            _t = time.time()
            _timing = os.environ.get("SPARK_CDC_TIMING") == "1"

            def _mark(label):
                nonlocal _t
                if _timing:
                    print(f"[cdc-timing] {label}: {time.time() - _t:.2f}s", flush=True)
                _t = time.time()

            if True:
                lineage_future = self._pool.submit(
                    lambda chunk=chunk: chunk.groupBy(
                        F.spark_partition_id().alias("pid")
                    )
                    .agg(
                        F.count(F.lit(1)).alias("rows"),
                        F.min("lsn").alias("lsn_min"),
                        F.max("lsn").alias("lsn_max"),
                    )
                    .collect()
                )

                valid, quar = split_with_reason(
                    chunk, self.whitelist, mode=self.validation_mode
                )
                # idempotent quarantine write: fixed dir per (batch, chunk),
                # on a pool thread so the (partially disk-bound) write
                # overlaps the CPU-bound LWW + merge jobs. Counts by reason
                # come from an Observation on the very same write job — no
                # re-read.
                qdir = os.path.join(
                    self.quarantine_path, f"batch_id={batch_id}", f"chunk={ci}"
                )
                q_obs = Observation(f"quar-{batch_id}-{ci}")
                quar_observed = quar.drop("schema_change").observe(
                    q_obs,
                    F.count(F.lit(1)).alias("n"),
                    *[
                        F.sum(F.when(F.col("reason") == r, 1).otherwise(0)).alias(r)
                        for r in QUARANTINE_REASONS
                    ],
                )
                def _write_quarantine(df=quar_observed, qdir=qdir, obs=q_obs):
                    # stage-then-swap: a redelivered (fully LSN-filtered)
                    # chunk produces an empty frame and must NOT clobber the
                    # quarantine of the original delivery
                    import shutil

                    tmp = qdir + ".inprogress"
                    df.write.mode("overwrite").parquet(tmp)
                    if (obs.get.get("n") or 0) > 0 or not os.path.exists(qdir):
                        if os.path.exists(qdir):
                            shutil.rmtree(qdir)
                        os.makedirs(os.path.dirname(qdir), exist_ok=True)
                        os.rename(tmp, qdir)
                    else:
                        shutil.rmtree(tmp, ignore_errors=True)

                q_future = self._pool.submit(_write_quarantine)
                _mark("submit_async")

                # lineage joins here: the narrow scan overlapped the
                # quarantine submission, and rows_in gates the salt path
                cells = lineage_future.result()
                rows_in = sum(r["rows"] for r in cells)
                totals["rows_in"] += rows_in
                chunk_lsn_max = None
                for r in cells:
                    partitions.append(
                        {
                            "chunk": ci,
                            "partition_id": r["pid"],
                            "rows": r["rows"],
                            "lsn_min": r["lsn_min"],
                            "lsn_max": r["lsn_max"],
                        }
                    )
                    lsn_min = r["lsn_min"] if lsn_min is None else min(lsn_min, r["lsn_min"])
                    lsn_max = r["lsn_max"] if lsn_max is None else max(lsn_max, r["lsn_max"])
                    chunk_lsn_max = (
                        r["lsn_max"] if chunk_lsn_max is None else max(chunk_lsn_max, r["lsn_max"])
                    )
                _mark("lineage_join")

                # LWW scale path: narrow (key -> max lsn, cnt, winner op)
                # aggregation — token arrays never enter an agg buffer —
                # then a broadcast semi-join fetches the winning payload
                # rows (rationale in dedup.lww_narrow_semi; the
                # struct-max_by variants measured only ~1.8x scaling
                # 4->16 cores from allocator churn). The winner's op is a
                # few bytes, so max_by(op, lsn) rides the same buffers.
                dedup_cols = ["doc_id", "lsn", "op", "tokens", "n_tok", "source"]
                slim = valid.select(*dedup_cols)
                if rows_in >= self.salt_threshold:
                    salted_any = True
                    salted = slim.withColumn(
                        "__salt",
                        F.pmod(F.xxhash64(F.col("lsn")), F.lit(self.salt_buckets)),
                    )
                    partial = salted.groupBy("doc_id", "__salt").agg(
                        F.max("lsn").alias("lsn"),
                        F.count(F.lit(1)).alias("__cnt"),
                        F.max_by("op", "lsn").alias("win_op"),
                    )
                    winners = partial.groupBy("doc_id").agg(
                        F.max("lsn").alias("lsn"),
                        F.sum("__cnt").alias("cnt"),
                        F.max_by("win_op", "lsn").alias("win_op"),
                    )
                else:
                    winners = slim.groupBy("doc_id").agg(
                        F.max("lsn").alias("lsn"),
                        F.count(F.lit(1)).alias("cnt"),
                        F.max_by("op", "lsn").alias("win_op"),
                    )
                nb = self.table.snapshot()["n_buckets"]
                winners = winners.withColumn(
                    "_wb", bucket_expr(F.col("doc_id"), nb)
                ).persist()
                w = winners.agg(
                    F.count(F.lit(1)).alias("n"),
                    F.max("cnt").alias("mx"),
                    F.sum(F.when(F.col("win_op") == "delete", 1).otherwise(0)).alias(
                        "deletes"
                    ),
                    F.collect_set("_wb").alias("buckets"),
                ).collect()[0]
                n_delta = w["n"]
                totals["max_key_rows"] = max(totals["max_key_rows"], w["mx"] or 0)
                totals["rows_valid"] += n_delta
                totals["distinct_keys"] = max(totals["distinct_keys"], n_delta)
                totals["rows_deletes"] += w["deletes"] or 0
                totals["rows_upserts"] += n_delta - (w["deletes"] or 0)
                affected = [int(b) for b in (w["buckets"] or [])]
                _mark("lww_and_stats")

                if rows_in > 0:
                    keys = winners.select("doc_id", "lsn")
                    if n_delta <= 4_000_000:
                        keys = F.broadcast(keys)
                    delta = slim.join(keys, on=["doc_id", "lsn"], how="left_semi").persist()
                    # materialize the persisted delta ONCE here: the merge
                    # write job has three branches over it (left-outer,
                    # semi, anti) that would otherwise race to compute it
                    delta.count()

                    # even an all-quarantined chunk advances the watermark
                    # (merge with an empty delta commits properties only)
                    watermark = max(applied, chunk_lsn_max or applied)
                    self._merge_chunk(
                        delta, n_delta, watermark, batch_id, affected_buckets=affected
                    )
                    _mark("merge")
                    applied = watermark
                    delta.unpersist()

                winners.unpersist()
                q_future.result()  # quarantine write finished in parallel
                qm = q_obs.get
                for r in QUARANTINE_REASONS:
                    c = qm.get(r) or 0
                    if c:
                        by_reason[r] = by_reason.get(r, 0) + int(c)
                totals["rows_quarantined"] += int(qm.get("n") or 0)
                _mark("quarantine_join")

                if change is not None:
                    self.table.apply_schema_change(change, lsn=hi)
                    applied = max(applied, hi)
                    # DDL advances the watermark too (oracle parity)
                    snap = self.table.snapshot()
                    snap["properties"]["max_applied_lsn"] = applied
                    snap["properties"]["last_batch_id"] = batch_id
                    self.table._commit(snap, snap["version"])


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
        # merges/DDL already persisted properties; commit once more only if
        # this batch changed nothing else (e.g. fully-filtered replay)
        snap = self.table.snapshot()
        props = snap["properties"]
        if props.get("last_batch_id") != batch_id or props.get("max_applied_lsn", 0) < applied:
            props["last_batch_id"] = batch_id
            props["max_applied_lsn"] = max(applied, props.get("max_applied_lsn", 0))
            self.table._commit(snap, snap["version"])
        return metrics

    def _write_manifest(self, m: BatchMetrics) -> None:
        path = os.path.join(self.manifest_dir, f"batch-{m.batch_id:010d}.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m.to_json(), f, indent=1)
        os.replace(tmp, path)
