"""End-to-end corpus-curation funnel: the C4/Gopher/RefinedWeb-style
filter chain composed from this package's text operators, with per-stage
survivor accounting — the number a pipeline operator actually watches
("how many documents did each rule cost me?").

Stages, applied cumulatively (each counts docs passing ALL rules so far):

0. ``all``            — corpus size
1. ``lang_en``        — marker-word language ID (textstats.langid rule)
2. ``quality``        — length / stopword / type-token-ratio gates, all
                        in exact integer arithmetic (n_words ≥ 5,
                        ≥ 1 stopword, distinct·1000 ≥ 300·words)
3. ``repetition``     — Gopher "repetitious document" rule: duplicate
                        n-gram permille ≤ threshold (textstats.repetition_stats)
4. ``exact_dedup``    — md5(text) exact dedup, smallest doc_id survives
5. ``train_split``    — deterministic hash split, train band only
                        (tokenize.split_bucket_sql — subset-stable)
6. ``decontaminated`` — shares no n-gram with any eval-split doc
                        (tokenize.contamination_pairs)

Scale shape: one corpus scan computes the row-local flags (lang,
quality, split bucket, md5); the stage-3/4/6 flags each cost exactly the
shuffle their standalone operator costs (two-level (doc, gram) agg;
md5-keyed min; broadcast eval-gram join) — nothing new is invented here,
the funnel is literally the composition, which is the point: a user of
the individual operators gets the full pipeline with the same plans.
The final rollup is ONE single-row aggregate of prefix-conjunction sums
(map-side combined), unstacked to (stage_id, stage, docs) rows — no
per-stage re-scan of the corpus, no driver-side loop.

All counts are exact integers; the DuckDB oracle reproduces every rule
from the same expression definitions, so the funnel is bitwise-checkable
end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import EN_MARKERS, STOPWORDS, _in_list, repetition_stats
from .tokenize import TRAIN_PCT, contamination_pairs, split_bucket_sql

STAGES = (
    "all",
    "lang_en",
    "quality",
    "repetition",
    "exact_dedup",
    "train_split",
    "decontaminated",
)


def curation_funnel(
    docs: DataFrame,
    rep_n: int = 3,
    contam_n: int = 3,
    salt: str = "split-v1",
    max_dup_permille: int = 200,
    min_words: int = 5,
    min_ttr_permille: int = 300,
) -> DataFrame:
    """(stage_id, stage, docs): survivors after each cumulative stage."""
    base = docs.select("doc_id", "text").withColumn("w", F.split("text", " "))
    n_words = F.size("w").cast("long")
    n_distinct = F.size(F.array_distinct("w")).cast("long")
    n_stop = F.expr(f"size(filter(w, x -> x IN {_in_list(STOPWORDS)}))").cast("long")
    en = F.expr(f"size(filter(w, x -> x IN {_in_list(EN_MARKERS)}))").cast("long")
    flags = base.select(
        "doc_id",
        (en > 0).alias("f_lang"),
        (
            (n_words >= min_words)
            & (n_stop >= 1)
            & (n_distinct * 1000 >= min_ttr_permille * n_words)
        ).alias("f_quality"),
        F.md5("text").alias("h"),
        F.expr(split_bucket_sql("doc_id", salt)).cast("int").alias("b"),
    )

    rep = repetition_stats(docs, n=rep_n).select("doc_id", "dup_permille")
    flags = (
        flags.join(rep, "doc_id", "left")
        .withColumn(
            "f_rep",
            F.coalesce(F.col("dup_permille") <= max_dup_permille, F.lit(True)),
        )
        .drop("dup_permille")
    )

    keep = flags.groupBy("h").agg(F.min("doc_id").alias("keep_id"))
    flags = (
        flags.join(keep, "h")
        .withColumn("f_dedup", F.col("doc_id") == F.col("keep_id"))
        .drop("h", "keep_id")
    )

    flags = flags.withColumn("f_train", F.col("b") < TRAIN_PCT).drop("b")

    dirty = (
        contamination_pairs(docs, n=contam_n, salt=salt)
        .select(F.col("train_doc").alias("doc_id"))
        .distinct()
        .withColumn("_dirty", F.lit(True))
    )
    flags = (
        flags.join(dirty, "doc_id", "left")
        .withColumn("f_clean", F.col("_dirty").isNull())
        .drop("_dirty")
    )

    conds = [F.lit(True)]
    for f in ("f_lang", "f_quality", "f_rep", "f_dedup", "f_train", "f_clean"):
        conds.append(conds[-1] & F.col(f))
    one = flags.agg(
        *[F.sum(c.cast("long")).alias(f"s{i}") for i, c in enumerate(conds)]
    )
    stack = ", ".join(f"{i}, '{s}', s{i}" for i, s in enumerate(STAGES))
    return one.selectExpr(
        f"stack({len(STAGES)}, {stack}) AS (stage_id, stage, docs)"
    )
