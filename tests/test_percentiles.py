"""Percentile operators: the exact-rank query, its histogram-sketch
scale twin, and the error bound of Spark's built-in GK-style mergeable
sketch (percentile_approx) against the exact answer.

Why three formulations: the exact query sorts every row of a language
partition (fine at test sf, the limit at 10^9 docs/lang); the histogram
is a lossless mergeable sketch on integer domains (bitwise-equal, scale-
safe — it sorts DISTINCT values only); percentile_approx is the bounded-
error path for continuous domains, and its 1/accuracy rank guarantee is
what this file pins.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from file_standardization_etl_spark.plans.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_sketch_matches_exact_bitwise(spark):
    """On an integer domain the value-histogram is a lossless sketch:
    identical (lang, p, pctl_value) rows to the exact rank statistic."""
    exact = {
        (r["lang"], r["p"]): r["pctl_value"]
        for r in QUERIES["agg_percentiles"][0](spark, SF).collect()
    }
    sketch = {
        (r["lang"], r["p"]): r["pctl_value"]
        for r in QUERIES["agg_percentiles_sketch"][0](spark, SF).collect()
    }
    assert exact == sketch and exact


def test_percentile_approx_rank_error_bounded(spark):
    """percentile_approx(col, p, accuracy) must return a value whose rank
    is within n/accuracy of the exact rank target — the documented
    Greenwald-Khanna-style guarantee. This is the continuous-domain
    scale path; the bound is asserted per (lang, percentile)."""
    accuracy = 100
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    approx = (
        docs.groupBy("lang")
        .agg(
            F.percentile_approx(
                "n_chars", [0.5, 0.9, 0.99], accuracy
            ).alias("vals")
        )
        .collect()
    )
    by_lang = {}
    for r in docs.select("lang", "n_chars").collect():
        by_lang.setdefault(r["lang"], []).append(r["n_chars"])
    for lang in by_lang:
        by_lang[lang].sort()
    for row in approx:
        xs = by_lang[row["lang"]]
        n = len(xs)
        for p, got in zip((0.5, 0.9, 0.99), row["vals"]):
            # rank interval of the returned value in the sorted column
            import bisect

            lo = bisect.bisect_left(xs, got)
            hi = bisect.bisect_right(xs, got)
            target = p * n
            err = max(0, lo - target, target - hi)
            assert err <= n / accuracy + 1, (row["lang"], p, got, err, n)
