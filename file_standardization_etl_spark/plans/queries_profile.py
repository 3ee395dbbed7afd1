"""Registry tranche: data-profiling / reporting shapes — per-key top-N,
fixed-width histograms, and bigram corpus statistics. Small, everyday
operators a warehouse user of the reference would expect; each picks the
plan that survives scale (rank-before-materialize, integer bucketing with
map-side combine, TakeOrdered instead of global sort).

Determinism rules as in queries.py: money in integer cents, integer DIV
for buckets, explicit tie-breaks on every rank."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .queries import cents, load

_TOPN = 3
_BUCKET_CENTS = 5_000_000  # 50k currency units per histogram bucket


def q_window_topn_per_key(spark, sf_dir):
    """Top-N rows per key: each customer's 3 highest-value orders.

    Scale shape: rank + filter over ONE (custkey, price desc) window —
    the shuffle carries input rows once and nothing is materialized per
    key beyond the window sort; deterministic tie-break on o_orderkey so
    equal prices can't flap between engines."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("price_cents").desc(), F.col("o_orderkey")
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            cents(F.col("o_totalprice")).alias("price_cents"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _TOPN)
        .select("o_custkey", F.col("rk").cast("long").alias("rk"),
                "o_orderkey", "price_cents")
    )


SQL_TOPN_PER_KEY = f"""
SELECT o_custkey, CAST(rk AS BIGINT) AS rk, o_orderkey, price_cents
FROM (
  SELECT o_custkey, o_orderkey,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents,
         row_number() OVER (
           PARTITION BY o_custkey
           ORDER BY CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) DESC,
                    o_orderkey
         ) AS rk
  FROM orders
)
WHERE rk <= {_TOPN}
"""


def q_agg_histogram(spark, sf_dir):
    """Fixed-width value histogram of order totals (50k-unit buckets,
    integer cents) per order status — the profiling shape behind every
    distribution dashboard.

    Scale shape: bucket id by integer DIV in the map stage, then one
    hash aggregate with map-side combine — the shuffle carries one row
    per (status, bucket), never input rows."""
    o = load(spark, sf_dir, "orders")
    bucket = F.expr(
        f"CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) DIV {_BUCKET_CENTS}"
    )
    return (
        o.select("o_orderstatus", bucket.alias("bucket"))
        .groupBy("o_orderstatus", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "o_orderstatus",
            "bucket",
            (F.col("bucket") * _BUCKET_CENTS).alias("lo_cents"),
            "n",
        )
    )


SQL_HISTOGRAM = f"""
SELECT o_orderstatus, bucket, bucket * {_BUCKET_CENTS} AS lo_cents,
       CAST(COUNT(*) AS BIGINT) AS n
FROM (
  SELECT o_orderstatus,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) // {_BUCKET_CENTS}
           AS bucket
  FROM orders
)
GROUP BY o_orderstatus, bucket
"""


def q_text_bigrams(spark, sf_dir):
    """Top-50 word bigrams across the corpus — the co-occurrence
    statistic LM data work reaches for constantly (collocation mining,
    boilerplate detection, tokenizer-merge candidates).

    Scale shape: bigrams are generated row-locally (one transform over
    the word array — no self-join, no shuffle until the count), counted
    with map-side combine, and the top-k is a TakeOrderedAndProject,
    never a global sort. Ties broken lexicographically so the cut line
    is deterministic cross-engine."""
    docs = load(spark, sf_dir, "documents")
    # the size>1 guard matters: Spark's sequence(1, 0) is DESCENDING
    # (step inferred -1), so a one-word doc would emit junk indices
    grams = docs.select(
        F.explode(
            F.expr(
                "CASE WHEN size(split(text, ' ')) > 1 THEN "
                "transform(sequence(1, size(split(text, ' ')) - 1), "
                "i -> concat(split(text, ' ')[i - 1], ' ', split(text, ' ')[i])) "
                "ELSE array() END"
            )
        ).alias("bigram")
    ).filter(~F.col("bigram").startswith(" ") & ~F.col("bigram").endswith(" "))
    return (
        grams.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "bigram")
        .limit(50)
    )


SQL_TEXT_BIGRAMS = """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
),
g AS (
  SELECT ws[i] || ' ' || ws[i + 1] AS bigram
  FROM w, unnest(range(1, len(ws))) AS t(i)
  WHERE ws[i] <> '' AND ws[i + 1] <> ''
)
SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n
FROM g GROUP BY bigram
ORDER BY n DESC, bigram
LIMIT 50
"""


PROFILE_QUERIES: dict[str, tuple] = {
    "window_topn_per_key": (q_window_topn_per_key, SQL_TOPN_PER_KEY),
    "agg_histogram": (q_agg_histogram, SQL_HISTOGRAM),
    "text_bigrams": (q_text_bigrams, SQL_TEXT_BIGRAMS),
}
