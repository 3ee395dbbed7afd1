"""Incrementally-maintained token-vocabulary aggregate (cdc/aggregates.py)
vs a full recompute from final table state — exactly-once under
redelivery and crash/resume."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from file_standardization_etl_spark.cdc.apply import CdcEngine
from file_standardization_etl_spark.cdc.events import (
    EventGenConfig,
    events_df,
    generate_events,
)


def make_engine(spark, tmp_path, **kw) -> CdcEngine:
    e = CdcEngine(spark, str(tmp_path / "cdc"), maintain_vocab=True, **kw)
    e.init()
    return e


def recompute(engine: CdcEngine):
    """O(corpus) ground truth: explode every live token array."""
    n = engine._names()
    from file_standardization_etl_spark.cdc.apply import FID_DOC, FID_TOKENS

    rows = (
        engine.state()
        .select(
            F.col(n[FID_DOC]).alias("doc_id"),
            F.explode(F.col(n[FID_TOKENS])).alias("t"),
        )
        .groupBy(F.col("t").cast("bigint").alias("token"))
        .agg(F.count(F.lit(1)).alias("n_occ"), F.countDistinct("doc_id").alias("n_docs"))
        .collect()
    )
    return {r["token"]: (r["n_occ"], r["n_docs"]) for r in rows}


def maintained(engine: CdcEngine):
    return {r["token"]: (r["n_occ"], r["n_docs"]) for r in engine.vocab().collect()}


def test_vocab_matches_recompute_after_multi_batch_replay(spark, tmp_path):
    cfg = EventGenConfig(n_events=4000, n_docs=200, seed=19, shuffle_arrival=True)
    events = generate_events(cfg)
    engine = make_engine(spark, tmp_path)
    for i, lo in enumerate(range(0, len(events), 1000)):
        engine.apply_batch(events_df(spark, events[lo : lo + 1000]), batch_id=i)
    assert maintained(engine) == recompute(engine)


def test_vocab_redelivery_is_noop(spark, tmp_path):
    cfg = EventGenConfig(n_events=2000, n_docs=100, seed=23)
    events = generate_events(cfg)
    engine = make_engine(spark, tmp_path)
    b0, b1 = events[:1000], events[1000:]
    engine.apply_batch(events_df(spark, b0), batch_id=0)
    engine.apply_batch(events_df(spark, b0), batch_id=0)  # redelivery
    engine.apply_batch(events_df(spark, b1), batch_id=1)
    engine.apply_batch(events_df(spark, b1), batch_id=1)
    assert maintained(engine) == recompute(engine)


def test_vocab_survives_ddl_interleaved_replay(spark, tmp_path):
    """Type-widen + rename mid-stream: the old-side read binds by field
    id, so maintenance keeps working across the schema changes."""
    cfg = EventGenConfig(
        n_events=3000,
        n_docs=150,
        seed=29,
        schema_change_lsns=(1000, 2000),
        schema_changes=(
            {"action": "add_column", "name": "tag", "type": "string"},
            {"action": "rename_column", "name": "tokens", "new_name": "tok_ids"},
        ),
    )
    events = generate_events(cfg)
    engine = make_engine(spark, tmp_path)
    for i, lo in enumerate(range(0, len(events), 1500)):
        engine.apply_batch(events_df(spark, events[lo : lo + 1500]), batch_id=i)
    assert maintained(engine) == recompute(engine)


def test_vocab_crash_between_merge_and_fold_recovers(spark, tmp_path):
    """Outbox semantics: the target merge committed but the fold crashed —
    a fresh engine must fold the pending delta on init, exactly once."""
    cfg = EventGenConfig(n_events=2000, n_docs=100, seed=31)
    events = generate_events(cfg)
    engine = make_engine(spark, tmp_path)
    b0, b1 = events[:1000], events[1000:]
    engine.apply_batch(events_df(spark, b0), batch_id=0)

    real_fold = engine._vocab.fold

    def dying_fold(pend):
        raise RuntimeError("simulated crash after merge, before fold")

    engine._vocab.fold = dying_fold
    with pytest.raises(RuntimeError, match="simulated crash"):
        engine.apply_batch(events_df(spark, b1), batch_id=1)
    engine._vocab.fold = real_fold
    # the merge committed (watermark advanced) but the vocab did not
    assert len(os.listdir(engine._vocab.pending_dir)) >= 1

    fresh = make_engine(spark, tmp_path)  # same workdir: recovery runs
    assert os.listdir(fresh._vocab.pending_dir) == []
    assert maintained(fresh) == recompute(fresh)
    # and a redelivery of the recovered batch stays a no-op
    fresh.apply_batch(events_df(spark, b1), batch_id=1)
    assert maintained(fresh) == recompute(fresh)


def test_vocab_pending_from_uncommitted_merge_is_discarded(spark, tmp_path):
    """A pending delta whose target merge never committed must be dropped
    (the chunk will be redelivered and re-staged bit-identically)."""
    cfg = EventGenConfig(n_events=1000, n_docs=80, seed=37)
    events = generate_events(cfg)
    engine = make_engine(spark, tmp_path)
    engine.apply_batch(events_df(spark, events), batch_id=0)
    before = maintained(engine)

    # forge a pending dir with a watermark beyond the committed one
    pend = os.path.join(engine._vocab.pending_dir, "b0000000099_c00000")
    os.makedirs(os.path.join(pend, "data"))
    spark.createDataFrame(
        [(999999, 5, 5)], "token long, d_occ long, d_docs long"
    ).write.mode("overwrite").parquet(os.path.join(pend, "data"))
    with open(os.path.join(pend, "meta.json"), "w") as f:
        json.dump(
            {"batch_id": 99, "chunk": 0, "watermark": engine.applied_lsn() + 10},
            f,
        )

    fresh = make_engine(spark, tmp_path)
    assert os.listdir(fresh._vocab.pending_dir) == []
    assert maintained(fresh) == before  # forged delta never folded


def test_vocab_deletes_retract_counts(spark, tmp_path):
    engine = make_engine(spark, tmp_path)
    base = {
        "op": "insert", "source": "web", "schema_change": None, "ts": None,
    }
    evs = [
        {**base, "lsn": 1, "doc_id": "a", "tokens": [1, 1, 2], "n_tok": 3},
        {**base, "lsn": 2, "doc_id": "b", "tokens": [2, 3], "n_tok": 2},
    ]
    engine.apply_batch(events_df(spark, evs), batch_id=0)
    assert maintained(engine) == {1: (2, 1), 2: (2, 2), 3: (1, 1)}
    upd = [
        {**base, "lsn": 3, "op": "update", "doc_id": "a", "tokens": [3], "n_tok": 1},
        {**base, "lsn": 4, "op": "delete", "doc_id": "b", "tokens": None,
         "n_tok": None, "source": None},
    ]
    engine.apply_batch(events_df(spark, upd), batch_id=1)
    # a: [1,1,2] -> [3]; b (tokens [2,3]) deleted -> only a's single 3 left
    assert maintained(engine) == {3: (1, 1)}
    assert maintained(engine) == recompute(engine)


def test_vocab_stage_shuffle_fallback_past_broadcast_gate(spark, tmp_path, monkeypatch):
    """Past BROADCAST_MAX_ROWS the stage's old-side joins must shuffle
    instead of broadcasting (a 10^7-row micro-batch's key set / old-token
    frame is too big to ship to every executor) — same counts either way."""
    from file_standardization_etl_spark.cdc import aggregates as agg

    cfg = EventGenConfig(n_events=3000, n_docs=150, seed=31, shuffle_arrival=True)
    events = generate_events(cfg)
    # case 1: row gate trips (key join AND old-token join shuffle);
    # case 2: rows pass but the BYTE gate trips — the old-token frame
    # (which carries arrays, where a row-count gate alone could
    # green-light a >8 GB broadcast) must shuffle on its own
    for sub, attr in (("rows", "BROADCAST_MAX_ROWS"), ("bytes", "BROADCAST_MAX_BYTES")):
        monkeypatch.setattr(agg.TokenVocab, attr, 1)
        engine = make_engine(spark, tmp_path / sub)
        for i, lo in enumerate(range(0, len(events), 1000)):
            engine.apply_batch(events_df(spark, events[lo : lo + 1000]), batch_id=i)
        engine._vocab.fold_ready()
        assert maintained(engine) == recompute(engine), sub
        monkeypatch.undo()
