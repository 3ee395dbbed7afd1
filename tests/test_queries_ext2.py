"""Tests for registry tranche 3 (plans/queries_ext2.py) and the
embedding-cosine near-dup operator, plus property-based invariance of the
replay semantics (SURVEY.md §5.4): the oracle's final state must be
independent of arrival order and batch slicing."""

from __future__ import annotations

import random

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from file_standardization_etl_spark.cdc.apply import CdcEngine
from file_standardization_etl_spark.cdc.events import (
    EventGenConfig,
    events_df,
    generate_events,
)
from file_standardization_etl_spark.cdc.oracle import replay
from file_standardization_etl_spark.operators import similarity
from file_standardization_etl_spark.plans.queries import QUERIES

SF = "/root/testdata/sf0.001"


def run(spark, name):
    fn, _ = QUERIES[name]
    return fn(spark, SF)


def test_filter_junk_rows_removes_junk_and_blanks(spark):
    rows = run(spark, "filter_junk_rows").collect()
    assert rows
    for r in rows:
        norm = "".join(ch for ch in r["line"].lower() if ch.isalpha())
        assert norm not in ("", "pageof", "total", "toplam")


def test_order_topk_is_sorted_and_bounded(spark):
    rows = run(spark, "order_topk").collect()
    assert len(rows) <= 15
    cents = [r["total_cents"] for r in rows]
    assert cents == sorted(cents, reverse=True)


def test_agg_global_scalars_single_row(spark):
    rows = run(spark, "agg_global_scalars").collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["max_click_id"] is not None
    assert r["net_value_cents"] is not None
    assert r["top_purchase_event"] is not None


def test_null_profile_consistent(spark):
    r = run(spark, "agg_null_profile").collect()[0]
    assert 0 < r["nulls_returnflag"] < r["n_rows"]
    assert not r["prune_returnflag"] and not r["prune_linestatus"]


def test_csv_roundtrip_matches_parquet(spark):
    got = {tuple(r) for r in run(spark, "source_csv_roundtrip").collect()}
    direct = {
        tuple(r)
        for r in spark.read.parquet(f"{SF}/nation.parquet")
        .groupBy("n_regionkey")
        .agg(
            F.count(F.lit(1)).alias("n_nations"),
            F.min("n_name").alias("first_name"),
            F.max("n_nationkey").alias("max_key"),
        )
        .collect()
    }
    assert got == direct


def test_near_dup_groups_invariants(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    groups = similarity.near_dup_groups(emb, min_cosine=0.3).collect()
    assert groups  # threshold tuned to the synthetic corpus
    for g in groups:
        assert g["keeper"] < g["dup_vec"]
        assert g["n_near"] >= 1
    # spot-check one group against an exact driver-side cosine
    import math

    g = min(groups, key=lambda r: r["dup_vec"])
    vecs = {
        r["vec_id"]: [math.floor(x * 100 + 0.5) for x in r["embedding"]]
        for r in emb.filter(F.col("vec_id").isin([g["keeper"], g["dup_vec"]])).collect()
    }
    a, b = vecs[g["keeper"]], vecs[g["dup_vec"]]
    dot = sum(x * y for x, y in zip(a, b))
    na = sum(x * x for x in a)
    nb = sum(x * x for x in b)
    assert dot > 0 and dot * dot * 10_000 >= 900 * na * nb  # cos >= 0.3


def test_near_dup_lsh_is_subset_of_brute_force(spark):
    """The LSH-gated pairs must be exactly the brute-force pairs whose ids
    share at least one sign-bucket band — no false positives ever (the
    verify step is exact), recall gated only by the bands."""
    import math

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    rows = emb.collect()
    vecs = {r["vec_id"]: [math.floor(x * 100 + 0.5) for x in r["embedding"]] for r in rows}

    def bucket(v, dims):
        return "".join("1" if v[d - 1] > 0 else "0" for d in dims)

    # driver-side reference: all-pairs verify + band gate
    t2_e4 = int(round(0.3 * 0.3 * 10_000))
    expected_pairs = set()
    ids = sorted(vecs)
    for i, va in enumerate(ids):
        for vb in ids[i + 1 :]:
            a, b = vecs[va], vecs[vb]
            if not any(
                bucket(a, dims) == bucket(b, dims) for dims in similarity.NEAR_DUP_BANDS
            ):
                continue
            dot = sum(x * y for x, y in zip(a, b))
            na = sum(x * x for x in a)
            nb = sum(x * x for x in b)
            if dot > 0 and dot * dot * 10_000 >= t2_e4 * na * nb:
                expected_pairs.add((va, vb))
    expected = {}
    for va, vb in expected_pairs:
        k, n = expected.get(vb, (None, 0))
        expected[vb] = (va if k is None else min(k, va), n + 1)

    got = {
        r["dup_vec"]: (r["keeper"], r["n_near"])
        for r in similarity.near_dup_groups(emb, min_cosine=0.3).collect()
    }
    assert got == expected


# ---------------------------------------------------------------------------
# Property-based replay invariance (pure-Python oracle: fast)
# ---------------------------------------------------------------------------


@given(seed=st.integers(0, 10_000), perm_seed=st.integers(0, 10_000))
@settings(max_examples=25, deadline=None)
def test_oracle_replay_is_arrival_order_invariant(seed, perm_seed):
    cfg = EventGenConfig(n_events=300, n_docs=30, seed=seed)
    events = generate_events(cfg)
    shuffled = list(events)
    random.Random(perm_seed).shuffle(shuffled)
    a, b = replay(events), replay(shuffled)
    assert a.live_docs() == b.live_docs()
    assert a.max_applied_lsn == b.max_applied_lsn
    # quarantine content is order-independent as a multiset of (lsn, reason)
    key = lambda q: sorted((e["lsn"], e["reason"]) for e in q)  # noqa: E731
    assert key(a.quarantine) == key(b.quarantine)


@given(cuts=st.lists(st.integers(1, 1999), min_size=0, max_size=4, unique=True))
@settings(max_examples=20, deadline=None)
def test_oracle_replay_is_slicing_invariant(cuts):
    cfg = EventGenConfig(n_events=2000, n_docs=100, seed=5, shuffle_arrival=False)
    events = generate_events(cfg)
    whole = replay(events)
    state = None
    prev = 0
    for c in sorted(cuts) + [len(events)]:
        state = replay(events[prev:c], state)
        prev = c
    assert state.live_docs() == whole.live_docs()
    assert state.max_applied_lsn == whole.max_applied_lsn


def test_engine_batch_slicing_invariance(spark, tmp_path):
    """The Spark engine must agree with the oracle under three different
    LSN-coherent batch slicings of the same log. Cuts land on multiples of
    ``disorder_window`` (200): the WAL delivery contract allows disorder
    only *within* a window, so any window-aligned cut is LSN-coherent —
    an arbitrary cut could legally drop stragglers below the watermark."""
    cfg = EventGenConfig(n_events=1500, n_docs=80, seed=13)
    events = generate_events(cfg)
    oracle = replay(events)
    for si, cuts in enumerate([[1500], [600, 1500], [200, 1000, 1500]]):
        engine = CdcEngine(spark, str(tmp_path / f"cdc{si}"))
        engine.init()
        prev = 0
        for bi, c in enumerate(cuts):
            engine.apply_batch(events_df(spark, events[prev:c]), batch_id=bi)
            prev = c
        got = {
            r["doc_id"]: (list(r["tokens"] or []), r["last_lsn"])
            for r in engine.state().collect()
        }
        want = {
            k: (list(v["tokens"]), v["last_lsn"]) for k, v in oracle.live_docs().items()
        }
        assert got == want, f"slicing {cuts} diverged"


def test_kmeans_integer_invariants(spark):
    """Exact-integer Lloyd's: every corpus vector is assigned (member
    counts sum to |corpus|), centroids stay in the quantized range, and
    iterating strictly reduces (or keeps) total within-cluster distance."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    n = emb.count()
    init = list(range(100, 108))

    def sse(cents_df):
        base = similarity.with_quantized(emb)
        c = cents_df.select(
            F.col("cent_id"), F.col("centroid").alias("cq"),
            similarity.dot_expr(F.col("centroid"), F.col("centroid")).alias("cn"),
        )
        scored = base.join(F.broadcast(c)).withColumn(
            "dist",
            F.col("norm2") - 2 * similarity.dot_expr(F.col("q"), F.col("cq")) + F.col("cn"),
        )
        best = scored.groupBy("vec_id").agg(F.min("dist").alias("d"))
        return best.agg(F.sum("d")).collect()[0][0]

    one = similarity.kmeans_integer(emb, init_ids=init, iters=1)
    three = similarity.kmeans_integer(emb, init_ids=init, iters=3)
    assert three.agg(F.sum("n_members")).collect()[0][0] == n
    assert sse(three) <= sse(one)
