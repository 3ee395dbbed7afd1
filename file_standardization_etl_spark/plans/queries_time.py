"""Registry tranche: time-series operators over the `events` stream.

The brief's custom-operator list names as-of joins, range joins and
hypertable rollups as operators Spark lacks natively; the reference's
monthly-window date logic (src/utils/date_utils.py:34-61, DATA_DATE
month-end ranges) is the same point-in-time-lookup family. Each is
re-expressed as a composition of existing DataFrame ops — no Pandas UDF,
no BroadcastNestedLoopJoin, no cartesian product anywhere:

- **as-of join** (`join_asof`): union-merge + one window pass — the
  merge-join formulation, one shuffle on the key, linear per partition.
- **range join** (`join_range_bucketed`): fixed-width epoch bucketing;
  intervals explode over the (at most two) buckets they cover, points
  map to one bucket, then an equi-join + exact containment filter. This
  is the standard rewrite that keeps Catalyst on SortMergeJoin/
  ShuffledHashJoin where a raw `BETWEEN` predicate would fall into a
  BroadcastNestedLoopJoin.
- **sessionization** (`window_sessionize`): gap-based session ids via
  lag + running sum, then one hash aggregate.
- **hypertable rollup** (`agg_time_rollup`): multi-granularity
  continuous-aggregate shape via ROLLUP grouping sets — one scan, one
  shuffle, partial aggregation on the map side for every level.

Cross-engine determinism: timestamps are compared and output as epoch
microseconds (`unix_micros(cast(ts as timestamp))` under the UTC session
pins bitwise to DuckDB's `epoch_us(ts)` — verified empirically); money
sums use the integer-cents rule from queries.py; bucket indices use
integer division (`DIV` / `//`), never double division + floor, so
boundary micros can't misround.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .queries import cents, load

# 30 minutes in microseconds: the session gap, the interval width and the
# range-join bucket width (width == bucket ⇒ an interval covers ≤2 buckets).
HALF_HOUR_US = 30 * 60 * 1_000_000


def _events_us(spark, sf_dir):
    """events with ts as epoch micros (UTC-pinned, bitwise-portable)."""
    ev = load(spark, sf_dir, "events")
    return ev.filter(F.col("ts").isNotNull()).select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "value",
    )


# ---------------------------------------------------------------------------
# As-of join: latest purchase value at-or-before each click
# ---------------------------------------------------------------------------


def q_join_asof(spark, sf_dir):
    """Point-in-time lookup: for every click, the user's most recent
    purchase value at-or-before the click (NULL when none yet).

    Scale shape: instead of a range join (which Catalyst can only plan as
    a nested-loop), tag both sides, union, and take `last(value) IGNORE
    NULLS` over one (user_id, ts) window — a single shuffle on the key
    and a linear merge per partition, the same plan a hand-written
    merge-join would give. Quotes sort before points at equal ts
    (is_point 0 < 1) so "at-or-before" includes ties; same-(user,ts)
    purchases are pre-deduped last-writer-wins by event_id so the lookup
    is well-defined in both engines."""
    base = _events_us(spark, sf_dir)
    quotes = (
        base.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts_us")
        .agg(F.max_by("value", "event_id").alias("q_value"))
    )
    points = base.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts_us"
    )
    # the quote rides as ONE struct (null only on point rows): taking
    # last(value) and last(ts) as separate IGNORE NULLS windows would tear
    # the pair apart when the latest purchase has a NULL value — the value
    # would come from an older quote than the timestamp
    merged = points.select(
        "user_id",
        "event_id",
        "ts_us",
        F.lit(1).alias("is_point"),
        F.lit(None)
        .cast("struct<q_ts_us:bigint,q_value:double>")
        .alias("quote"),
    ).unionByName(
        quotes.select(
            "user_id",
            F.lit(None).cast("long").alias("event_id"),
            "ts_us",
            F.lit(0).alias("is_point"),
            F.struct(
                F.col("ts_us").alias("q_ts_us"), F.col("q_value").alias("q_value")
            ).alias("quote"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "is_point", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        merged.withColumn("asof", F.last("quote", ignorenulls=True).over(w))
        .filter(F.col("is_point") == 1)
        .select(
            "user_id",
            "event_id",
            "ts_us",
            F.col("asof.q_ts_us").alias("asof_ts_us"),
            F.col("asof.q_value").alias("asof_value"),
        )
    )


SQL_JOIN_ASOF = """
WITH base AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us, value
  FROM events WHERE ts IS NOT NULL
),
quotes AS (
  SELECT user_id, ts_us, max_by(value, event_id) AS q_value
  FROM base WHERE event_type = 'purchase' GROUP BY user_id, ts_us
),
points AS (
  SELECT user_id, event_id, ts_us FROM base WHERE event_type = 'click'
)
SELECT p.user_id, p.event_id, p.ts_us,
       q.ts_us AS asof_ts_us, q.q_value AS asof_value
FROM points p
ASOF LEFT JOIN quotes q
  ON p.user_id = q.user_id AND q.ts_us <= p.ts_us
"""


# ---------------------------------------------------------------------------
# Range join: purchases falling inside signup-opened windows
# ---------------------------------------------------------------------------


def q_join_range_bucketed(spark, sf_dir):
    """Interval containment join: every signup opens a half-open 30-minute
    window [ts, ts+30min) for that user; pair it with each purchase of the
    same user inside the window.

    Scale shape: both sides are keyed by (user_id, epoch-bucket) with the
    bucket width equal to the interval width, so an interval covers at
    most two buckets (explode factor ≤2) and a point exactly one — every
    qualifying (point, interval) pair meets in exactly one bucket (the
    point's), so the equi-join needs no post-dedup. Catalyst plans a
    shuffled equi-join; the exact containment predicate is a cheap filter
    after the match. A raw `p.ts BETWEEN iv.lo AND iv.hi` join would plan
    as BroadcastNestedLoopJoin — asserted absent in tools/explain_plans.py."""
    base = _events_us(spark, sf_dir)
    b = F.lit(HALF_HOUR_US)
    intervals = base.filter(F.col("event_type") == "signup").select(
        "user_id",
        F.col("event_id").alias("iv_id"),
        F.col("ts_us").alias("lo_us"),
        (F.col("ts_us") + b).alias("hi_us"),
    )
    ivx = intervals.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                F.expr(f"lo_us DIV {HALF_HOUR_US}"),
                F.expr(f"(hi_us - 1) DIV {HALF_HOUR_US}"),
            )
        ),
    )
    points = base.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("point_id"),
        "ts_us",
        F.expr(f"ts_us DIV {HALF_HOUR_US}").alias("bucket"),
    )
    return (
        points.join(ivx, ["user_id", "bucket"])
        .filter((F.col("ts_us") >= F.col("lo_us")) & (F.col("ts_us") < F.col("hi_us")))
        .select("user_id", "iv_id", "point_id", "ts_us")
    )


SQL_JOIN_RANGE = f"""
WITH base AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
  FROM events WHERE ts IS NOT NULL
),
iv AS (
  SELECT user_id, event_id AS iv_id, ts_us AS lo_us,
         ts_us + {HALF_HOUR_US} AS hi_us
  FROM base WHERE event_type = 'signup'
),
pt AS (
  SELECT user_id, event_id AS point_id, ts_us
  FROM base WHERE event_type = 'purchase'
)
SELECT pt.user_id, iv.iv_id, pt.point_id, pt.ts_us
FROM pt JOIN iv
  ON pt.user_id = iv.user_id
 AND pt.ts_us >= iv.lo_us AND pt.ts_us < iv.hi_us
"""


# ---------------------------------------------------------------------------
# Sessionization: 30-minute-gap sessions per user
# ---------------------------------------------------------------------------


def q_window_sessionize(spark, sf_dir):
    """Gap-based sessionization: a new session starts when a user's
    inter-event gap exceeds 30 minutes. Output is one row per session
    with event count, span and spend (integer cents).

    Scale shape: lag + running sum over one (user_id, ts) window — the
    same single shuffle the LWW window uses — then a hash aggregate on
    (user_id, session). Per-user event counts are bounded in this domain,
    so the window partition fits one task; a pathological key would use
    the engine's salting rule (cdc/apply.py) upstream."""
    base = _events_us(spark, sf_dir)
    w_ord = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gap = F.col("ts_us") - F.lag("ts_us").over(w_ord)
    flagged = base.withColumn(
        "is_new",
        F.when(gap.isNull() | (gap > HALF_HOUR_US), F.lit(1)).otherwise(F.lit(0)),
    )
    sess = flagged.withColumn(
        "session_idx",
        F.sum("is_new").over(
            w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return sess.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts_us").alias("start_us"),
        F.max("ts_us").alias("end_us"),
        F.sum(cents(F.col("value"))).alias("value_cents"),
    )


SQL_WINDOW_SESSIONIZE = f"""
WITH base AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us, value
  FROM events WHERE ts IS NOT NULL
),
flagged AS (
  SELECT *, CASE WHEN ts_us - lag(ts_us) OVER w IS NULL
                   OR ts_us - lag(ts_us) OVER w > {HALF_HOUR_US}
                 THEN 1 ELSE 0 END AS is_new
  FROM base
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
sess AS (
  SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM flagged
)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       MIN(ts_us) AS start_us,
       MAX(ts_us) AS end_us,
       CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS value_cents
FROM sess GROUP BY user_id, session_idx
"""


# ---------------------------------------------------------------------------
# Hypertable rollup: multi-granularity continuous aggregate
# ---------------------------------------------------------------------------


def q_agg_time_rollup(spark, sf_dir):
    """Continuous-aggregate rollup: event counts + spend at (type, day,
    hour), (type, day), (type) and grand-total granularities in ONE scan
    via ROLLUP grouping sets — the hypertable materialized-rollup shape.

    Scale shape: Catalyst expands the grouping sets before the exchange
    and partially aggregates every level map-side, so the shuffle carries
    only group rows, never input rows. Null grouping keys from ROLLUP are
    disambiguated by an explicit level bitmask (grouping() flags) and
    coalesced to sentinels so the output is canonicalizable."""
    base = _events_us(spark, sf_dir)
    bucketed = base.select(
        "event_type",
        F.expr("ts_us DIV 86400000000").alias("day_idx"),
        F.expr("ts_us DIV 3600000000").alias("hour_idx"),
        "value",
    )
    lvl = (
        F.grouping("event_type") * 4
        + F.grouping("day_idx") * 2
        + F.grouping("hour_idx")
    )
    rolled = bucketed.rollup("event_type", "day_idx", "hour_idx").agg(
        lvl.cast("long").alias("lvl"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(cents(F.col("value"))).alias("value_cents"),
    )
    return rolled.select(
        "lvl",
        F.coalesce(F.col("event_type"), F.lit("(all)")).alias("event_type"),
        F.coalesce(F.col("day_idx"), F.lit(-1)).alias("day_idx"),
        F.coalesce(F.col("hour_idx"), F.lit(-1)).alias("hour_idx"),
        "n_events",
        "value_cents",
    )


SQL_AGG_TIME_ROLLUP = """
WITH base AS (
  SELECT event_type,
         epoch_us(ts) // 86400000000 AS day_idx,
         epoch_us(ts) // 3600000000  AS hour_idx,
         value
  FROM events WHERE ts IS NOT NULL
)
SELECT CAST(GROUPING(event_type) * 4 + GROUPING(day_idx) * 2
            + GROUPING(hour_idx) AS BIGINT) AS lvl,
       COALESCE(event_type, '(all)') AS event_type,
       COALESCE(day_idx, -1) AS day_idx,
       COALESCE(hour_idx, -1) AS hour_idx,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS value_cents
FROM base
GROUP BY ROLLUP (event_type, day_idx, hour_idx)
"""


def q_join_stream_interval(spark, sf_dir):
    """Batch formulation of the stream-stream interval join — the SAME
    function as the streamed operator (streaming/windows.py
    ``early_update_join``; watermarks are no-ops on batch frames),
    applied to the events fixture: each purchase matched to every view
    of the same user that it follows within the 5-minute horizon. The
    streamed twin is pytest-gated for exactly-once across drains
    (test_streaming.py); this entry puts the join's semantics under the
    driver's DuckDB ledger.

    Scale shape: Catalyst plans the equi-key + bounded-interval
    condition as a shuffled equi-join on doc_id with the range as a
    post-join filter (never a BroadcastNestedLoopJoin); streamed, the
    same bounds are what let Structured Streaming evict state — O(events
    in the horizon), not O(stream)."""
    from ..streaming.windows import early_update_join

    ev = load(spark, sf_dir, "events")

    def side(kind):
        return ev.filter(F.col("event_type") == kind).select(
            F.col("user_id").cast("string").alias("doc_id"),
            F.col("event_id").alias("lsn"),
        )

    return early_update_join(
        side("view"), side("purchase"), horizon="5 minutes",
        watermark="2 minutes",
    )


# event_time is an affine map of the LSN (EPOCH0 + lsn seconds), so the
# interval condition is exactly an LSN-arithmetic condition: 5 minutes =
# 300 LSN-seconds. Integer arithmetic — no timestamp rounding to disagree
# on across engines.
SQL_JOIN_STREAM_INTERVAL = """
SELECT CAST(i.user_id AS VARCHAR) AS doc_id,
       i.event_id AS i_lsn,
       u.event_id AS u_lsn
FROM events i
JOIN events u
  ON i.user_id = u.user_id
 AND u.event_id > i.event_id
 AND u.event_id <= i.event_id + 300
WHERE i.event_type = 'view' AND u.event_type = 'purchase'
"""


TIME_QUERIES: dict[str, tuple] = {
    "join_asof": (q_join_asof, SQL_JOIN_ASOF),
    "join_range_bucketed": (q_join_range_bucketed, SQL_JOIN_RANGE),
    "window_sessionize": (q_window_sessionize, SQL_WINDOW_SESSIONIZE),
    "agg_time_rollup": (q_agg_time_rollup, SQL_AGG_TIME_ROLLUP),
    "join_stream_interval": (q_join_stream_interval, SQL_JOIN_STREAM_INTERVAL),
}
