"""Event-time streaming analytics over the WAL: watermarked windowed
aggregation and a custom stateful operator (``applyInPandasWithState``).

The CDC core needs neither (its state lives in the lake table, guarded by
the LSN watermark — a stronger mechanism than operator state), but a
training-data pipeline tailing the same WAL does: ingest-rate monitoring,
per-source accounting, late-event auditing. Both operators here consume
the exact WAL the CDC engine tails.

Event time: WAL events carry a nullable ``ts``; fixtures leave it null,
so event time derives deterministically from the LSN
(``timestamp_seconds(epoch0 + lsn)``) — at 1 event/sec of logical time,
``disorder_window`` maps directly to seconds of out-of-orderness, which
is what a watermark bounds.

Scale notes: the windowed aggregate is a streaming hash aggregate with
partial aggregation per micro-batch and watermark-driven state eviction —
state is O(open windows × sources), not O(events). The stateful operator
keeps one tiny pandas row per key in the state store; Arrow moves each
group's batch in one hop. Both recover from the checkpoint like any
Structured Streaming query.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

from ..cdc.events import EVENT_SCHEMA

EPOCH0 = "2024-01-01 00:00:00"


def event_time(col):
    """Deterministic event time from the LSN (1 logical second per LSN)."""
    return F.timestamp_seconds(
        F.unix_timestamp(F.lit(EPOCH0).cast("timestamp")) + col
    )


def _stream(spark: SparkSession, log_dir: str, max_files: int | None = None):
    r = spark.readStream.schema(EVENT_SCHEMA)
    if max_files:
        r = r.option("maxFilesPerTrigger", max_files)
    return r.parquet(log_dir)


def windowed_source_stats(
    events: DataFrame, window: str = "1 minute", watermark: str = "2 minutes"
) -> DataFrame:
    """Watermarked tumbling-window aggregate per source: events, docs,
    tokens. Works on a stream (late events beyond ``watermark`` are
    dropped and finalized windows are emitted once — append mode) and on
    a batch frame (watermark is a no-op there), so one definition serves
    the streaming job and its batch backfill/oracle."""
    ev = events.filter(F.col("op") != "schema_change").withColumn(
        "event_ts", event_time(F.col("lsn"))
    )
    if ev.isStreaming:
        ev = ev.withWatermark("event_ts", watermark)
    return (
        ev.groupBy(F.window("event_ts", window).alias("w"), "source")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.approx_count_distinct("doc_id").alias("approx_docs"),
            F.sum(F.coalesce(F.col("n_tok"), F.lit(0)).cast("long")).alias("n_tokens"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "source",
            "n_events",
            "approx_docs",
            "n_tokens",
        )
    )


def run_windowed_stats(
    spark: SparkSession,
    log_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> None:
    """Drain the WAL once (AvailableNow) into a parquet sink of FINALIZED
    windows (append mode: a window emits only after the watermark passes
    its end — the late-data contract under test). A parquet sink recovers
    from the checkpoint, so successive drains of a growing WAL keep
    appending newly-finalized windows exactly once."""
    q = (
        windowed_source_stats(_stream(spark, log_dir), window, watermark)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    finished = q.awaitTermination(600)
    if q.exception() is not None:
        raise q.exception()
    if not finished:
        q.stop()
        raise TimeoutError(
            "drain did not finish within the timeout — the sink holds only a "
            "prefix; re-run to continue from the checkpoint"
        )


# ---------------------------------------------------------------------------
# applyInPandasWithState: running per-source totals across micro-batches
# ---------------------------------------------------------------------------

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("n_tokens", T.LongType()),
        T.StructField("max_lsn", T.LongType()),
    ]
)

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("n_tokens", T.LongType()),
        T.StructField("max_lsn", T.LongType()),
    ]
)


def _running_totals(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """One tiny state row per source; each Arrow batch folds in. Update
    semantics: emit the group's new running total every trigger."""
    if state.exists:
        n_events, n_tokens, max_lsn = state.get
    else:
        n_events, n_tokens, max_lsn = 0, 0, 0
    for pdf in batches:
        n_events += len(pdf)
        n_tokens += int(pdf["n_tok"].fillna(0).sum())
        if len(pdf):
            max_lsn = max(max_lsn, int(pdf["lsn"].max()))
    state.update((n_events, n_tokens, max_lsn))
    yield pd.DataFrame(
        {
            "source": [key[0]],
            "n_events": [n_events],
            "n_tokens": [n_tokens],
            "max_lsn": [max_lsn],
        }
    )


def stateful_source_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator: exact running per-source totals that
    survive micro-batch boundaries and restarts (state store +
    checkpoint), where the windowed aggregate above deliberately
    forgets closed windows."""
    return (
        events.filter(F.col("op") != "schema_change")
        # explicit prune: Catalyst cannot push column pruning into a
        # black-box Python state function, so without this the Arrow
        # channel ships every WAL column — including the tokens array,
        # which is ~95% of the bytes and is never read by the op
        .select("source", "n_tok", "lsn")
        .groupBy("source")
        .applyInPandasWithState(
            _running_totals,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_stateful_totals(
    spark: SparkSession,
    log_dir: str,
    checkpoint_dir: str,
    sink_table: str,
    max_files: int | None = None,
) -> None:
    """Drain the WAL once through the stateful operator into an in-memory
    sink (update mode: the LAST row per source in the sink is the final
    running total)."""
    q = (
        stateful_source_totals(_stream(spark, log_dir, max_files))
        .writeStream.format("memory")
        .queryName(sink_table)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    finished = q.awaitTermination(600)
    if q.exception() is not None:
        raise q.exception()
    if not finished:
        q.stop()
        raise TimeoutError(
            "drain did not finish within the timeout — the sink holds only a "
            "prefix; re-run to continue from the checkpoint"
        )


# ---------------------------------------------------------------------------
# Stream-stream interval join: early-life updates matched to their insert
# ---------------------------------------------------------------------------


def early_update_join(
    inserts: DataFrame,
    updates: DataFrame,
    horizon: str = "10 minutes",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Watermarked stream-stream interval join: each update event matched
    to the insert of the same doc that it follows within ``horizon`` of
    event time — the "early-life churn" audit a training-data pipeline
    runs on its own ingest stream.

    Both sides carry a watermark AND the join condition bounds u_time to
    a finite interval after i_time — the two things Structured Streaming
    needs to evict join state (an insert is dropped from state once the
    update-side watermark passes i_time + horizon; state is O(events in
    the horizon), not O(stream)). Inner join in append mode emits each
    match exactly once as it forms. The same definition runs on batch
    frames (watermarks are no-ops), so the batch run IS the oracle."""
    i = (
        inserts.select(
            F.col("doc_id").alias("i_doc"),
            event_time(F.col("lsn")).alias("i_time"),
            F.col("lsn").alias("i_lsn"),
        )
        .withWatermark("i_time", watermark)
    )
    u = (
        updates.select(
            F.col("doc_id").alias("u_doc"),
            event_time(F.col("lsn")).alias("u_time"),
            F.col("lsn").alias("u_lsn"),
        )
        .withWatermark("u_time", watermark)
    )
    return i.join(
        u,
        (F.col("i_doc") == F.col("u_doc"))
        & (F.col("u_time") > F.col("i_time"))
        & (F.col("u_time") <= F.col("i_time") + F.expr(f"INTERVAL {horizon}")),
        "inner",
    ).select(F.col("i_doc").alias("doc_id"), "i_lsn", "u_lsn")


def run_early_update_join(
    spark: SparkSession,
    log_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    horizon: str = "10 minutes",
    watermark: str = "2 minutes",
) -> None:
    """Drain the WAL once (AvailableNow) through the stream-stream join
    into a parquet sink. Checkpoint recovery makes successive drains of a
    growing WAL append each newly-formed pair exactly once."""
    ev = _stream(spark, log_dir)
    q = (
        early_update_join(
            ev.filter(F.col("op") == "insert"),
            ev.filter(F.col("op") == "update"),
            horizon,
            watermark,
        )
        .writeStream.format("parquet")
        .option("path", out_dir)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    finished = q.awaitTermination(600)
    if q.exception() is not None:
        raise q.exception()
    if not finished:
        q.stop()
        raise TimeoutError(
            "drain did not finish within the timeout — the sink holds only a "
            "prefix; re-run to continue from the checkpoint"
        )
