"""Registry tranche: corpus-curation extensions over `documents` — per-source
stratified sampling, inverted-index construction, and exact percentile
profiling. These are the remaining everyday ops of a training-data
pipeline (downsample over-represented sources, build a term index for
retrieval/dedup triage, profile length distributions per language) not
already covered by the tokens_* / text_* tranches.

Cross-engine determinism: sampling decisions are a pure function of
(salt, doc_id) via the md5 hex-digit expressions in operators/tokenize.py
— the SAME expression text runs in Spark and DuckDB; postings lists are
numerically sorted before joining to a string; percentiles are exact
rank-statistics (row_number against a ceil-integer target), never an
interpolating quantile function (engines disagree on interpolation).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..operators import tokenize
from .queries import load

SAMPLE_SALT = "stratified-v1"
_POSTINGS_CAP = 8


def _sample_bucket_sql(key: str, salt: str) -> str:
    """0..999999 bucket from 6 md5 hex digits of (salt ':' key) — built
    from the SAME portable-hash helper the shard/split operators use
    (one place to fix the expression subset, zero drift)."""
    return tokenize.hex_mod_sql(
        f"md5(concat('{salt}', ':', cast({key} as string)))", 6, 1_000_000
    )


def q_tokens_stratified_sample(spark, sf_dir):
    """Per-source stratified downsampling: source srcN keeps a 1/(N+1)
    fraction (harmonic rates — the 'flatten over-represented sources'
    move every mixture rebalance needs), decided per doc by a salted
    hash so the sample is reproducible across runs, engines and corpus
    growth, and any subset can be sampled independently.

    Scale shape: a stateless projection + filter — NO shuffle, no
    sampling state, no RNG (plan-asserted Exchange-free). At 100 TB this
    is a map-only pass that fuses into whatever reads the sample."""
    docs = load(spark, sf_dir, "documents")
    # integer DIV, not double division + floor: boundary ppm values must
    # not depend on float rounding (same rule as the range-join buckets).
    # try_cast, not cast: an out-of-pattern source (no trailing digits)
    # must yield NULL → row dropped in BOTH engines, where a plain CAST
    # is a silent NULL in Spark but a hard error in DuckDB.
    rate_ppm = F.expr(
        "1000000 DIV (try_cast(regexp_extract(source, '([0-9]+)$', 1) as int) + 1)"
    ).cast("long")
    bucket = F.expr(_sample_bucket_sql("doc_id", SAMPLE_SALT)).cast("long")
    return (
        docs.select(
            "doc_id",
            "source",
            rate_ppm.alias("rate_ppm"),
            bucket.alias("bucket"),
        )
        .filter(F.col("bucket") < F.col("rate_ppm"))
    )


SQL_STRATIFIED = f"""
SELECT doc_id, source, rate_ppm, bucket
FROM (
  SELECT doc_id, source,
         CAST(1000000 // (TRY_CAST(regexp_extract(source, '([0-9]+)$', 1) AS INT) + 1)
           AS BIGINT) AS rate_ppm,
         CAST({_sample_bucket_sql('doc_id', SAMPLE_SALT)} AS BIGINT) AS bucket
  FROM documents
)
WHERE bucket < rate_ppm
"""


def q_text_inverted_index(spark, sf_dir):
    """Inverted-index build: word → document frequency + a capped,
    numerically-sorted postings sample (first 8 doc_ids). The index
    shape retrieval and dedup-triage pipelines materialize.

    Scale shape: distinct (word, doc) pairs hash-aggregate with map-side
    combine; the postings cap is enforced by a row_number over the SAME
    word partitioning BEFORE collect_list, so a stop-word's bucket never
    materializes more than 8 entries in any aggregation buffer (the
    lesson from the MinHash degenerate-bucket fix, dedup_text.py). Two
    shuffles total: the pair-distinct on (word, doc), then one on word
    whose partitioning the final aggregate reuses (no third exchange)."""
    docs = load(spark, sf_dir, "documents")
    pairs = (
        docs.select(
            F.explode(F.split(F.col("text"), " ")).alias("word"), "doc_id"
        )
        .filter(F.col("word") != "")
        .distinct()
    )
    rn = F.row_number().over(Window.partitionBy("word").orderBy("doc_id"))
    capped = pairs.withColumn("rn", rn)
    return capped.groupBy("word").agg(
        F.count(F.lit(1)).alias("df"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("rn") <= _POSTINGS_CAP, F.col("doc_id"))
                    )
                ),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("postings"),
    )


SQL_INVERTED = f"""
WITH pairs AS (
  SELECT DISTINCT word, doc_id
  FROM (SELECT unnest(string_split(text, ' ')) AS word, doc_id FROM documents)
  WHERE word <> ''
),
capped AS (
  SELECT word, doc_id,
         row_number() OVER (PARTITION BY word ORDER BY doc_id) AS rn
  FROM pairs
)
SELECT word,
       CAST(COUNT(*) AS BIGINT) AS df,
       COALESCE(string_agg(
         CASE WHEN rn <= {_POSTINGS_CAP} THEN CAST(doc_id AS VARCHAR) END,
         ',' ORDER BY doc_id), '') AS postings
FROM capped GROUP BY word
"""


def q_agg_percentiles(spark, sf_dir):
    """Exact per-language length percentiles (p50/p90/p99 of n_chars) as
    rank statistics: the value at row ceil(p/100 * n) in (n_chars,
    doc_id) order — integer-exact and engine-portable, where interpolating
    quantile functions (percentile_approx, quantile_cont) are not.

    Scale shape: one shuffle on lang for the window pair; the percentile
    targets are computed by integer arithmetic on the window count, and
    the explode to three (lang, p) rows happens before the filter so all
    percentiles come from the SAME single pass."""
    docs = load(spark, sf_dir, "documents")
    w_ord = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    w_all = Window.partitionBy("lang")
    ranked = docs.select(
        "lang",
        "n_chars",
        F.row_number().over(w_ord).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("cnt"),
    )
    exploded = ranked.select(
        "lang", "n_chars", "rn", "cnt",
        F.explode(F.array(F.lit(50), F.lit(90), F.lit(99))).alias("p"),
    )
    return (
        exploded.filter(
            F.col("rn") == F.expr("(cnt * p + 99) DIV 100")
        )
        .select("lang", F.col("p").cast("long").alias("p"),
                F.col("n_chars").alias("pctl_value"))
    )


SQL_PERCENTILES = """
WITH ranked AS (
  SELECT lang, n_chars,
         row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY lang) AS cnt
  FROM documents
)
SELECT lang, CAST(p AS BIGINT) AS p, n_chars AS pctl_value
FROM ranked CROSS JOIN (SELECT unnest([50, 90, 99]) AS p) ps
WHERE rn = (cnt * p + 99) // 100
"""


def q_agg_percentiles_sketch(spark, sf_dir):
    """Percentiles via a mergeable value-histogram sketch — the scale
    path past `agg_percentiles`. The exact-rank formulation above sorts
    every ROW of a language partition under one window; at 10^9
    docs/lang that single partition sort is the limit. This one
    aggregates to a (lang, n_chars) → count histogram first — a hash
    aggregate with map-side combine, the same mergeable-summary shape as
    a t-digest/GK sketch — and runs the rank scan over DISTINCT values
    only (cardinality-bounded: n_chars has thousands of distinct values
    regardless of corpus size). On an integer domain the histogram is a
    LOSSLESS sketch, so the result is bitwise-equal to the exact query —
    which is therefore its oracle at any sf (`tests/test_percentiles.py`
    additionally bounds Spark's percentile_approx GK sketch against it
    for the continuous-domain case).

    pctl_value = min value whose cumulative count reaches the rank
    target ceil(p/100 * n): `cum >= target AND cum - c < target` — one
    row per (lang, p) by construction."""
    docs = load(spark, sf_dir, "documents")
    hist = docs.groupBy("lang", "n_chars").agg(F.count(F.lit(1)).alias("c"))
    w_ord = Window.partitionBy("lang").orderBy("n_chars")
    w_all = Window.partitionBy("lang")
    cum = hist.select(
        "lang",
        "n_chars",
        "c",
        F.sum("c").over(w_ord).alias("cum"),
        F.sum("c").over(w_all).alias("cnt"),
    )
    exploded = cum.select(
        "*", F.explode(F.array(F.lit(50), F.lit(90), F.lit(99))).alias("p")
    )
    target = F.expr("(cnt * p + 99) DIV 100")
    return exploded.filter(
        (F.col("cum") >= target) & (F.col("cum") - F.col("c") < target)
    ).select(
        "lang", F.col("p").cast("long").alias("p"),
        F.col("n_chars").alias("pctl_value"),
    )


SQL_PERCENTILES_SKETCH = """
WITH hist AS (
  SELECT lang, n_chars, COUNT(*) AS c FROM documents GROUP BY lang, n_chars
),
cum AS (
  SELECT lang, n_chars, c,
         SUM(c) OVER (PARTITION BY lang ORDER BY n_chars) AS cum,
         SUM(c) OVER (PARTITION BY lang) AS cnt
  FROM hist
)
SELECT lang, CAST(p AS BIGINT) AS p, n_chars AS pctl_value
FROM cum CROSS JOIN (SELECT unnest([50, 90, 99]) AS p) ps
WHERE cum >= (cnt * p + 99) // 100 AND cum - c < (cnt * p + 99) // 100
"""


CORPUS_QUERIES: dict[str, tuple] = {
    "tokens_stratified_sample": (q_tokens_stratified_sample, SQL_STRATIFIED),
    "text_inverted_index": (q_text_inverted_index, SQL_INVERTED),
    "agg_percentiles": (q_agg_percentiles, SQL_PERCENTILES),
    "agg_percentiles_sketch": (q_agg_percentiles_sketch, SQL_PERCENTILES_SKETCH),
}
