"""Edge-case semantics for the time-series tranche (plans/queries_time.py):
as-of tie inclusion, half-open range boundaries, bucket-boundary crossing,
exact-gap sessionization, and rollup level consistency. Cross-engine value
parity for the same queries is covered by tools/check_oracle.py; these pin
the boundary semantics with hand-built fixtures."""

from __future__ import annotations

import datetime as dt

import pytest

from file_standardization_etl_spark.plans.queries import QUERIES  # noqa: F401  (registry import first: resolves the tranche-merge import cycle)
from file_standardization_etl_spark.plans.queries_time import (
    HALF_HOUR_US,
    q_agg_time_rollup,
    q_join_asof,
    q_join_range_bucketed,
    q_window_sessionize,
)

EPOCH = dt.datetime(2024, 1, 1)

EVENTS_DDL = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string, "
    "value double, props string"
)


def _us(micros: int) -> dt.datetime:
    return EPOCH + dt.timedelta(microseconds=micros)


def _write_events(spark, tmp_path, rows):
    """rows: (event_id, micros_since_epoch, user_id, event_type, value)."""
    df = spark.createDataFrame(
        [(e, _us(m), u, t, v, None) for e, m, u, t, v in rows], EVENTS_DDL
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    return str(tmp_path)


EPOCH_US = 1704067200000000  # 2024-01-01T00:00:00Z in epoch micros


def test_asof_includes_equal_ts_and_nulls_before_first_quote(spark, tmp_path):
    sf = _write_events(
        spark,
        tmp_path,
        [
            (1, 1000, 7, "click", 0.0),        # before any purchase -> NULL
            (2, 2000, 7, "purchase", 10.0),
            (3, 2000, 7, "click", 0.0),        # equal ts -> at-or-before includes it
            (4, 3000, 7, "purchase", 20.0),
            (5, 3000, 7, "purchase", 30.0),    # same (user, ts): LWW by event_id
            (6, 4000, 7, "click", 0.0),
            (7, 5000, 8, "click", 0.0),        # other user: isolated -> NULL
        ],
    )
    out = {
        r["event_id"]: (r["asof_ts_us"], r["asof_value"])
        for r in q_join_asof(spark, sf).collect()
    }
    assert out[1] == (None, None)
    assert out[3] == (EPOCH_US + 2000, 10.0)
    assert out[6] == (EPOCH_US + 3000, 30.0)  # event_id 5 wins the tie
    assert out[7] == (None, None)


def test_asof_null_valued_latest_quote_wins_atomically(spark, tmp_path):
    """The (ts, value) pair must come from ONE quote: a latest purchase
    with NULL value is still the as-of match (value NULL), never a
    frankenstein of the new timestamp with an older quote's value."""
    sf = _write_events(
        spark,
        tmp_path,
        [
            (1, 1000, 7, "purchase", 5.0),
            (2, 2000, 7, "purchase", None),   # latest, NULL value
            (3, 3000, 7, "click", 0.0),
        ],
    )
    row = q_join_asof(spark, sf).collect()[0]
    assert row["asof_ts_us"] == EPOCH_US + 2000
    assert row["asof_value"] is None


def test_range_join_half_open_and_bucket_crossing(spark, tmp_path):
    lo = HALF_HOUR_US - 1000  # interval starts just before a bucket boundary
    sf = _write_events(
        spark,
        tmp_path,
        [
            (1, lo, 7, "signup", 0.0),                      # [lo, lo+30min)
            (2, lo, 7, "purchase", 1.0),                    # at lo -> included
            (3, lo + HALF_HOUR_US - 1, 7, "purchase", 1.0),  # last micro -> in
            (4, lo + HALF_HOUR_US, 7, "purchase", 1.0),      # at hi -> excluded
            (5, lo - 1, 7, "purchase", 1.0),                 # before lo -> out
            (6, HALF_HOUR_US + 10, 7, "purchase", 1.0),      # next bucket, in range
            (7, lo + 5, 9, "purchase", 1.0),                 # other user -> out
        ],
    )
    pairs = {
        (r["iv_id"], r["point_id"])
        for r in q_join_range_bucketed(spark, sf).collect()
    }
    assert pairs == {(1, 2), (1, 3), (1, 6)}


def test_sessionize_gap_boundary(spark, tmp_path):
    sf = _write_events(
        spark,
        tmp_path,
        [
            (1, 0, 7, "click", 1.0),
            (2, HALF_HOUR_US, 7, "click", 1.0),       # gap == 30min -> same session
            (3, 2 * HALF_HOUR_US + 1, 7, "click", 1.0),  # gap 30min+1us -> new
            (4, 0, 8, "click", None),                  # null value ignored by sum
        ],
    )
    rows = {
        (r["user_id"], r["session_idx"]): r
        for r in q_window_sessionize(spark, sf).collect()
    }
    assert set(rows) == {(7, 1), (7, 2), (8, 1)}
    assert rows[(7, 1)]["n_events"] == 2
    assert rows[(7, 1)]["start_us"] == EPOCH_US
    assert rows[(7, 1)]["end_us"] == EPOCH_US + HALF_HOUR_US
    assert rows[(7, 2)]["n_events"] == 1
    assert rows[(8, 1)]["value_cents"] is None


def test_rollup_levels_are_consistent(spark, tmp_path):
    sf = _write_events(
        spark,
        tmp_path,
        [
            (1, 0, 7, "click", 1.0),
            (2, 3_600_000_000, 7, "click", 2.0),          # next hour, same day
            (3, 86_400_000_000, 7, "view", 4.0),          # next day
        ],
    )
    rows = q_agg_time_rollup(spark, sf).collect()
    by_lvl = {}
    for r in rows:
        by_lvl.setdefault(r["lvl"], []).append(r)
    # grand total (lvl 7) == sum of per-type (lvl 3) == sum of leaves (lvl 0)
    assert len(by_lvl[7]) == 1
    assert by_lvl[7][0]["n_events"] == 3 and by_lvl[7][0]["value_cents"] == 700
    assert sum(r["n_events"] for r in by_lvl[3]) == 3
    assert sum(r["value_cents"] for r in by_lvl[0]) == 700
    leaf = {(r["event_type"], r["day_idx"], r["hour_idx"]) for r in by_lvl[0]}
    day0 = EPOCH_US // 86_400_000_000
    hr0 = EPOCH_US // 3_600_000_000
    assert ("click", day0, hr0) in leaf and ("click", day0, hr0 + 1) in leaf
    assert ("view", day0 + 1, hr0 + 24) in leaf
    # sentinel coalescing: rolled-up keys use '(all)' / -1, never NULL
    assert all(r["event_type"] is not None and r["day_idx"] is not None for r in rows)


@pytest.mark.parametrize(
    "qfn", [q_join_asof, q_join_range_bucketed, q_window_sessionize]
)
def test_time_queries_ignore_null_ts(spark, tmp_path, qfn):
    sf = _write_events(
        spark,
        tmp_path,
        [(1, 0, 7, "click", 1.0), (2, 100, 7, "purchase", 2.0)],
    )
    # append a null-ts row (events streams can carry unparsable timestamps)
    extra = spark.createDataFrame(
        [(99, None, 7, "purchase", 9.0, None)], EVENTS_DDL
    )
    extra.write.mode("append").parquet(f"{sf}/events.parquet")
    df = qfn(spark, sf)
    probe = "start_us" if "start_us" in df.columns else "ts_us"
    assert df.filter(f"{probe} IS NULL").count() == 0
    if qfn is q_window_sessionize:
        # the null-ts purchase (value 9.0) must not leak into any session sum
        assert df.agg({"value_cents": "sum"}).collect()[0][0] == 300
