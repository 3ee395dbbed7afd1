"""Text analysis for training-data pipelines: quality scoring, language
ID, token counting, fingerprinting. All Catalyst column expressions
(whole-stage codegen), all portable to the DuckDB oracle.

Floats appear only as single divisions of exact integers (deterministic);
counts are bigint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STOPWORDS = ("the", "a", "of", "and", "to")
EN_MARKERS = ("the", "a", "and")


def _in_list(vals):
    return "(" + ", ".join(f"'{v}'" for v in vals) + ")"


def quality_stats(docs: DataFrame) -> DataFrame:
    """Length / vocabulary / stopword quality signals (the training-data
    analog of the reference's record-quality validators,
    /root/reference/src/validation/data_validator.py:44-186)."""
    d = docs.withColumn("w", F.split("text", " "))
    n_words = F.size("w").cast("long")
    n_distinct = F.size(F.array_distinct("w")).cast("long")
    n_alpha_chars = F.length(F.regexp_replace("text", " ", "")).cast("long")
    n_stop = F.expr(f"size(filter(w, x -> x IN {_in_list(STOPWORDS)}))").cast("long")
    return d.select(
        "doc_id",
        n_words.alias("n_words"),
        n_distinct.alias("n_distinct"),
        n_alpha_chars.alias("n_alpha_chars"),
        n_stop.alias("n_stopwords"),
        (n_distinct / n_words).alias("ttr"),  # type-token ratio
        (n_alpha_chars / n_words).alias("avg_word_len"),
        (n_stop / n_words).alias("stopword_ratio"),
    )


def langid(docs: DataFrame) -> DataFrame:
    """Marker-word n-gram heuristic language ID."""
    d = docs.withColumn("w", F.split("text", " "))
    en_score = F.expr(f"size(filter(w, x -> x IN {_in_list(EN_MARKERS)}))").cast("long")
    return d.select(
        "doc_id",
        "lang",
        en_score.alias("en_score"),
        F.when(en_score > 0, F.lit("en")).otherwise(F.lit("unk")).alias("predicted_lang"),
    )


def token_counts(docs: DataFrame) -> DataFrame:
    """Whitespace tokens, regex word-ish tokens (BPE-ish pre-tokenizer),
    and a chars/4 BPE estimate."""
    ws = F.size(F.split("text", " ")).cast("long")
    rex = F.size(F.expr("regexp_extract_all(text, '[a-z]+|[0-9]+', 0)")).cast("long")
    bpe_est = F.ceil(F.length("text") / 4).cast("long")
    return docs.select(
        "doc_id",
        ws.alias("ws_tokens"),
        rex.alias("regex_tokens"),
        bpe_est.alias("bpe_est_tokens"),
    )


def repetition_stats(docs: DataFrame, n: int = 3) -> DataFrame:
    """Intra-document n-gram repetition profile (the Gopher/RefinedWeb
    "repetitious document" quality rule): per doc, total n-word grams,
    distinct grams, the occurrence count of the most-repeated gram, and
    the duplicate fraction in exact integer permille
    ((n_grams - n_distinct) * 1000 div n_grams) — integers only, so the
    cross-engine compare is bitwise.

    Scale shape: grams are exploded and counted with a two-level
    hash-aggregate — (doc_id, gram) partial counts combine map-side, then
    the per-doc rollup groups on doc_id alone. The shuffle key includes
    the gram hash, so a single pathological document cannot hot-spot one
    reducer in the first stage; the second stage moves one row per
    (doc, distinct gram). Docs shorter than n words emit no grams (same
    rule as the decontamination scan in operators/tokenize.py).
    """
    if n < 1:
        raise ValueError("n must be positive")
    parts = ", ".join(f"element_at(w, i + {k})" for k in range(n))
    grams = (
        f"transform(sequence(1, size(w) - {n - 1}),"
        f" i -> md5(concat_ws(' ', {parts})))"
    )
    per_gram = (
        docs.select("doc_id", F.split("text", " ").alias("w"))
        .filter(F.size("w") >= n)
        .select("doc_id", F.explode(F.expr(grams)).alias("gram"))
        .groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("occ"))
    )
    return per_gram.groupBy("doc_id").agg(
        F.sum("occ").alias("n_grams"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("occ").alias("max_occ"),
        F.expr("CAST((sum(occ) - count(1)) * 1000 DIV sum(occ) AS BIGINT)").alias(
            "dup_permille"
        ),
    )


def fingerprints(docs: DataFrame) -> DataFrame:
    """Content fingerprints: md5 of the normalized text and a 1-seed
    MinHash over word bigrams (rolling-hash analog, portable md5 basis)."""
    d = docs.withColumn("w", F.split("text", " "))
    bigrams = F.expr(
        "transform(sequence(1, greatest(size(w) - 1, 1)), "
        "i -> concat_ws(' ', element_at(w, i), element_at(w, i + 1)))"
    )
    return d.select(
        "doc_id",
        F.md5(F.col("text")).alias("content_md5"),
        F.array_min(F.transform(bigrams, lambda s: F.md5(s))).alias("min_bigram_hash"),
    )
