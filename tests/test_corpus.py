"""Boundary semantics for the corpus tranche (plans/queries_corpus.py).
Cross-engine value parity is covered by tools/check_oracle.py; these pin
the sampling determinism/subset-stability, the postings cap, and the exact
rank-statistic percentiles on hand fixtures."""

from __future__ import annotations

from file_standardization_etl_spark.plans.queries import QUERIES  # noqa: F401  (registry import first: resolves the tranche-merge import cycle)
from file_standardization_etl_spark.plans.queries_corpus import (
    q_agg_percentiles,
    q_tokens_stratified_sample,
    q_text_inverted_index,
)

DOCS_DDL = "doc_id long, text string, lang string, source string, n_chars long"


def _write_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(rows, DOCS_DDL)
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    return str(tmp_path)


def test_stratified_sample_rates_and_subset_stability(spark, tmp_path):
    rows = [
        (i, "w", "en", f"src{i % 4}", 1) for i in range(400)
    ]
    sf = _write_docs(spark, tmp_path, rows)
    kept = {r["doc_id"]: r for r in q_tokens_stratified_sample(spark, sf).collect()}
    # src0 rate is 1e6/1 = the full ppm space -> every src0 doc kept
    src0 = {i for i in range(400) if i % 4 == 0}
    assert src0 <= set(kept)
    for r in kept.values():
        assert r["bucket"] < r["rate_ppm"]
    # deterministic: a second run keeps the identical set
    again = {r["doc_id"] for r in q_tokens_stratified_sample(spark, sf).collect()}
    assert again == set(kept)
    # subset-stability (pure per-row decision): sampling half the corpus
    # keeps exactly the kept docs of that half
    half = _write_docs(spark, str(tmp_path) + "_h", rows[:200])
    kept_half = {r["doc_id"] for r in q_tokens_stratified_sample(spark, half).collect()}
    assert kept_half == {d for d in kept if d < 200}


def test_stratified_sample_drops_out_of_pattern_sources(spark, tmp_path):
    """A source with no trailing digits has no defined rate: the row is
    dropped (NULL rate) rather than crashing — and try_cast keeps DuckDB
    on the same behavior (a plain CAST('' AS INT) would error there)."""
    rows = [(1, "w", "en", "web", 1), (2, "w", "en", "src0", 1)]
    sf = _write_docs(spark, tmp_path, rows)
    kept = {r["doc_id"] for r in q_tokens_stratified_sample(spark, sf).collect()}
    assert kept == {2}


def test_inverted_index_caps_postings_but_counts_full_df(spark, tmp_path):
    # 'hot' appears in 20 docs (twice in each -> pairs are distinct),
    # 'rare' in one
    rows = [(i, "hot hot rare" if i == 0 else "hot hot", "en", "s", 1) for i in range(20)]
    sf = _write_docs(spark, tmp_path, rows)
    idx = {r["word"]: r for r in q_text_inverted_index(spark, sf).collect()}
    assert idx["hot"]["df"] == 20
    assert idx["hot"]["postings"] == ",".join(str(i) for i in range(8))
    assert idx["rare"]["df"] == 1 and idx["rare"]["postings"] == "0"


def test_percentiles_are_exact_rank_statistics(spark, tmp_path):
    # 10 docs, n_chars 1..10: ceil-rank targets are p50->5, p90->9, p99->10
    rows = [(i, "w", "en", "s", i + 1) for i in range(10)]
    sf = _write_docs(spark, tmp_path, rows)
    got = {r["p"]: r["pctl_value"] for r in q_agg_percentiles(spark, sf).collect()}
    assert got == {50: 5, 90: 9, 99: 10}
    # monotone across p by construction
    assert got[50] <= got[90] <= got[99]
