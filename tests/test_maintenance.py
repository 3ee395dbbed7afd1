"""Maintenance + continuous-tail coverage: table compaction with tombstone
expiry, and the continuous (processingTime-trigger) streaming mode."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from file_standardization_etl_spark.cdc.apply import CdcEngine
from file_standardization_etl_spark.cdc.events import (
    EventGenConfig,
    events_df,
    generate_events,
)
from file_standardization_etl_spark.cdc.oracle import replay
from file_standardization_etl_spark.streaming.runner import StreamingCdcRunner


def test_compact_preserves_state_and_expires_tombstones(spark, tmp_path):
    cfg = EventGenConfig(n_events=2000, n_docs=120, seed=21, delete_frac=0.15)
    events = generate_events(cfg)
    engine = CdcEngine(spark, str(tmp_path / "cdc"))
    engine.init()
    engine.apply_batch(events_df(spark, events), batch_id=0)

    before_live = {
        r["doc_id"]: (list(r["tokens"]), r["last_lsn"]) for r in engine.state().collect()
    }
    tombs_before = engine.state(include_deleted=True).filter(F.col("deleted")).count()
    assert tombs_before > 0, "fixture must produce tombstones"

    # expire every tombstone below the global watermark: safe because no
    # event with a lower LSN can ever arrive again
    engine.table.compact(expire_tombstones_below_lsn=engine.applied_lsn() + 1)

    after_live = {
        r["doc_id"]: (list(r["tokens"]), r["last_lsn"]) for r in engine.state().collect()
    }
    assert after_live == before_live  # live rows bitwise identical
    assert engine.state(include_deleted=True).filter(F.col("deleted")).count() == 0

    oracle = replay(events)
    want = {k: (list(v["tokens"]), v["last_lsn"]) for k, v in oracle.live_docs().items()}
    assert after_live == want


def test_continuous_tail_applies_new_segments(spark, tmp_path):
    log_dir = tmp_path / "wal"
    log_dir.mkdir()
    cfg = EventGenConfig(n_events=1200, n_docs=100, seed=31, shuffle_arrival=False)
    events = generate_events(cfg)
    events_df(spark, events[:600]).coalesce(1).write.mode("append").parquet(str(log_dir))

    engine = CdcEngine(spark, str(tmp_path / "cdc"))
    engine.init()
    runner = StreamingCdcRunner(spark, str(log_dir), engine)
    q = runner.start_continuous(processing_time="1 second")
    try:
        deadline = time.time() + 120
        while engine.applied_lsn() < 600 and time.time() < deadline:
            time.sleep(1)
        assert engine.applied_lsn() == 600
        # a new WAL segment arrives while the query is live
        events_df(spark, events[600:]).coalesce(1).write.mode("append").parquet(str(log_dir))
        while engine.applied_lsn() < 1200 and time.time() < deadline:
            time.sleep(1)
        assert engine.applied_lsn() == 1200
    finally:
        q.stop()

    oracle = replay(events)
    got = {r["doc_id"]: (list(r["tokens"]), r["last_lsn"]) for r in engine.state().collect()}
    want = {k: (list(v["tokens"]), v["last_lsn"]) for k, v in oracle.live_docs().items()}
    assert got == want
    assert engine.quarantine().count() == len(oracle.quarantine)
