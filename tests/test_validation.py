"""Validation parity: Catalyst expression == pandas/Arrow UDF == pure-Python
oracle, on the same generated events (including every corruption class)."""

from __future__ import annotations

from pyspark.sql import functions as F

from file_standardization_etl_spark.cdc.events import (
    SOURCE_WHITELIST,
    EventGenConfig,
    events_df,
    generate_events,
)
from file_standardization_etl_spark.cdc.oracle import validation_reason
from file_standardization_etl_spark.functions.validation import (
    make_validation_reason_pandas_udf,
    split_valid_quarantine,
    validation_reason_expr,
)


def _events(spark, n=2000, seed=31):
    cfg = EventGenConfig(
        n_events=n, n_docs=100, seed=seed,
        corrupt_frac=0.1, bad_source_frac=0.1, null_tokens_frac=0.05, empty_tokens_frac=0.05,
    )
    evs = [e for e in generate_events(cfg) if e["op"] != "schema_change"]
    return evs, events_df(spark, evs)


def test_expr_matches_oracle(spark):
    evs, df = _events(spark)
    got = {
        r["lsn"]: r["reason"]
        for r in df.withColumn(
            "reason",
            validation_reason_expr(
                F.col("op"), F.col("tokens"), F.col("n_tok"), F.col("source"), SOURCE_WHITELIST
            ),
        ).collect()
    }
    want = {e["lsn"]: validation_reason(e) for e in evs}
    assert got == want
    assert set(filter(None, want.values())) == {
        "null_tokens", "empty_tokens", "bad_n_tok", "bad_source"
    }  # fixture exercises every reason


def test_pandas_udf_matches_expr(spark):
    _, df = _events(spark, seed=37)
    fn = make_validation_reason_pandas_udf(SOURCE_WHITELIST)
    both = df.select(
        "lsn",
        validation_reason_expr(
            F.col("op"), F.col("tokens"), F.col("n_tok"), F.col("source"), SOURCE_WHITELIST
        ).alias("expr_reason"),
        fn(F.col("op"), F.col("tokens"), F.col("n_tok"), F.col("source")).alias("udf_reason"),
    )
    mismatches = both.filter(
        ~(
            (F.col("expr_reason").isNull() & F.col("udf_reason").isNull())
            | (F.col("expr_reason") == F.col("udf_reason"))
        )
    ).count()
    assert mismatches == 0


def test_split_is_partition(spark):
    evs, df = _events(spark, seed=41)
    valid, quar = split_valid_quarantine(df, SOURCE_WHITELIST, use_pandas_udf=True)
    assert valid.count() + quar.count() == len(evs)
    assert quar.filter(F.col("reason").isNull()).count() == 0


def test_engine_validation_modes_agree(spark, tmp_path):
    """Engine-level parity of every --validation-mode: identical final
    state AND identical quarantine (lsn → reason) for hybrid / slim /
    arrow / pandas / expr."""
    import pytest  # noqa: F401

    from file_standardization_etl_spark.cdc.apply import CdcEngine
    from file_standardization_etl_spark.cdc.oracle import replay

    evs, df = _events(spark, n=1500, seed=77)
    oracle = replay(evs)
    want_state = {
        k: (list(v["tokens"]), v["last_lsn"]) for k, v in oracle.live_docs().items()
    }
    want_quar = {(q["lsn"], q["reason"]) for q in oracle.quarantine}
    for mode in ("hybrid", "slim", "arrow", "pandas", "expr"):
        engine = CdcEngine(spark, str(tmp_path / f"cdc_{mode}"), validation_mode=mode)
        engine.init()
        engine.apply_batch(df, batch_id=0)
        got_state = {
            r["doc_id"]: (list(r["tokens"]), r["last_lsn"])
            for r in engine.state().collect()
        }
        got_quar = {(r["lsn"], r["reason"]) for r in engine.quarantine().collect()}
        assert got_state == want_state, f"state diverged in mode={mode}"
        assert got_quar == want_quar, f"quarantine diverged in mode={mode}"
