"""Similarity search over an embedding column (``array<float>``).

Numeric portability: embeddings are quantized to integer grids
(``floor(x*scale + 0.5)``) so dot products and norms are exact integers —
magnitudes stay < 2^53, so even double-typed arithmetic is exact, and
Spark and the DuckDB oracle agree bitwise. The final cosine is a single
IEEE division/sqrt of exact integers → deterministic.

Scale notes:

- brute-force top-k: queries × corpus via broadcast of the (small) query
  set — the corpus is scanned once, never shuffled; per-partition local
  top-k would bolt on via window over qid (AQE coalesces the tiny
  result).
- LSH-bucketed: coordinate-sign buckets (axis-parallel hyperplanes) cut
  the pair space; candidates verified exactly. At 100 TB you'd raise the
  bit count and add multi-probe, same plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def quantized(col, scale: int = 100):
    return F.transform(col, lambda x: F.floor(x * scale + F.lit(0.5)).cast("long"))


def dot_expr(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, x: acc + x)


def with_quantized(emb: DataFrame, scale: int = 100) -> DataFrame:
    q = quantized(F.col("embedding"), scale)
    return emb.select("vec_id", q.alias("q")).withColumn("norm2", dot_expr(F.col("q"), F.col("q")))


def brute_force_topk(
    emb: DataFrame, query_ids: list[int], k: int = 10, scale: int = 100
) -> DataFrame:
    """Exact cosine top-k per query vector. Score = dot/sqrt(n1*n2) over
    exact integers — bit-deterministic."""
    base = with_quantized(emb, scale)
    queries = base.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("q").alias("qq"), F.col("norm2").alias("qn")
    )
    corpus = base.filter(~F.col("vec_id").isin(query_ids))
    scored = corpus.join(F.broadcast(queries)).withColumn(
        "score",
        dot_expr(F.col("q"), F.col("qq"))
        / F.sqrt((F.col("norm2") * F.col("qn")).cast("double")),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", F.col("vec_id").alias("neighbor_id"), "score")
    )


def ivf_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    centroid_ids: list[int] | None = None,
    nprobe: int = 4,
    scale: int = 100,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-style ANN: coarse-quantize the corpus into centroid cells, then
    answer each query exactly over only its ``nprobe`` nearest cells.

    Centroids here default to a deterministic sample of the corpus (fixed
    ids); :func:`kmeans_integer` provides the real k-means pass (exact
    integer Lloyd's iterations, oracle-checkable). Either way the *query
    plan shape* is identical: a tiny broadcast centroid table, one
    broadcast-join argmax pass to assign cells (the inverted file), and a
    probe that touches |corpus|·nprobe/n_cells rows instead of |corpus|.
    All comparisons are exact-integer cosine (see module docstring) with
    id tie-breaks, so Spark and the DuckDB oracle agree bitwise.
    """
    base = with_quantized(emb, scale)
    if centroids is not None:
        # a trained quantizer (e.g. kmeans_integer output): (cent_id, cq, cn)
        cents = centroids
    else:
        centroid_ids = centroid_ids or list(range(100, 116))
        cents = base.filter(F.col("vec_id").isin(centroid_ids)).select(
            F.col("vec_id").alias("cent_id"), F.col("q").alias("cq"), F.col("norm2").alias("cn")
        )
    corpus = base.filter(~F.col("vec_id").isin(query_ids))

    def nearest_cells(side: DataFrame, id_col: str, n: int) -> DataFrame:
        scored = side.join(F.broadcast(cents)).withColumn(
            "cscore",
            dot_expr(F.col("q"), F.col("cq"))
            / F.sqrt((F.col("norm2") * F.col("cn")).cast("double")),
        )
        w = Window.partitionBy(id_col).orderBy(F.col("cscore").desc(), F.col("cent_id"))
        return (
            scored.withColumn("crank", F.row_number().over(w))
            .filter(F.col("crank") <= n)
            .drop("cq", "cn", "cscore", "crank")
        )

    # inverted file: every corpus vector lives in exactly one cell
    inv = nearest_cells(corpus, "vec_id", 1)
    probes = nearest_cells(
        base.filter(F.col("vec_id").isin(query_ids)).select(
            F.col("vec_id").alias("query_id"), "q", "norm2"
        ),
        "query_id",
        nprobe,
    ).select("query_id", F.col("q").alias("qq"), F.col("norm2").alias("qn"), "cent_id")

    cands = inv.join(probes, on="cent_id")
    scored = cands.withColumn(
        "score",
        dot_expr(F.col("q"), F.col("qq"))
        / F.sqrt((F.col("norm2") * F.col("qn")).cast("double")),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", F.col("vec_id").alias("neighbor_id"), "score")
    )


def floordiv_exact(s, n):
    """Floor division of exact integers, identical across engines (Spark
    ``div`` truncates, DuckDB ``//`` floors — they disagree on negatives,
    so divide the exactly-divisible ``s - pmod(s, n)`` instead)."""
    return ((s - F.pmod(s, n)) / n).cast("long")


def kmeans_integer(
    emb: DataFrame,
    init_ids: list[int],
    iters: int = 3,
    scale: int = 100,
) -> DataFrame:
    """Distributed Lloyd's k-means over quantized embeddings, bit-exact
    across engines — the "k-means pass" the IVF operator's coarse
    quantizer calls for (it used a fixed corpus sample in round 1).

    Why it can be exact: vectors are integer-quantized, so squared L2
    distance ``norm2_v − 2·v·c + norm2_c`` is exact integer arithmetic;
    assignment ties break on centroid id; and the centroid update is an
    exact elementwise integer floor-division of integer sums — no
    floating-point averaging anywhere, so Spark and the DuckDB oracle
    (same iterations unrolled in SQL) converge to IDENTICAL centroids.

    Plan shape per iteration (the 100 TB story): the k centroids fold
    into ONE broadcast row holding an array<struct>, and the assignment
    is a pure row-local expression — ``array_min(transform(cents, c ->
    struct(dist, cent_id)))`` — so the corpus is never exploded to
    |corpus|·k rows and the argmin needs NO aggregate (round 2 used
    ``min(struct(dist, cid, q))`` which planned as Sort+SortAggregate
    per iteration; this keeps the whole assignment inside one
    whole-stage-codegen project). The only shuffle per iteration is the
    posexplode + (cluster, pos) primitive-sum HashAggregate, never wider
    than k × dims. Iterations are Spark-side only (no driver collect
    between supersteps). A cluster that loses all members drops out,
    same in both engines.

    Returns (cent_id, n_members, centroid: array<long>) for the final
    iteration's assignment.
    """
    base = with_quantized(emb, scale)
    cents = base.filter(F.col("vec_id").isin(init_ids)).select(
        F.col("vec_id").alias("cent_id"), F.col("q").alias("cq"), F.col("norm2").alias("cn")
    )
    for _ in range(iters):
        # k rows -> one broadcast row of array<struct(cent_id, cq, cn)>
        carr = cents.agg(F.collect_list(F.struct("cent_id", "cq", "cn")).alias("cents"))
        # lexicographic struct min == (min dist, then min cent_id) — the
        # identical tie-break the DuckDB oracle's row_number ORDER BY uses
        best = F.array_min(
            F.transform(
                F.col("cents"),
                lambda c: F.struct(
                    (
                        F.col("norm2") - 2 * dot_expr(F.col("q"), c["cq"]) + c["cn"]
                    ).alias("dist"),
                    c["cent_id"].alias("cent_id"),
                ),
            )
        )
        assigned = (
            base.join(F.broadcast(carr))
            .select(best.alias("b"), "q")
            .select(F.col("b.cent_id").alias("cent_id"), "q")
        )
        sums = (
            assigned.select("cent_id", F.posexplode("q").alias("pos", "v"))
            .groupBy("cent_id", "pos")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
            .withColumn("cv", floordiv_exact(F.col("s"), F.col("n")))
        )
        cents = (
            sums.groupBy("cent_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "cv"))), lambda x: x.cv
                ).alias("cq"),
                F.max("n").alias("n_members"),
            )
            .withColumn("cn", dot_expr(F.col("cq"), F.col("cq")))
        )
    return cents.select("cent_id", "n_members", F.col("cq").alias("centroid"))


def semantic_dup_groups(
    emb: DataFrame,
    init_ids: list[int],
    iters: int = 3,
    min_cosine: float = 0.35,
    scale: int = 100,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication by clustering embeddings with k-means and removing
    within-cluster near-duplicates — the published recipe for pruning
    web-scale training corpora beyond lexical dedup (MinHash/SimHash
    catch copies; this catches paraphrases that embed together).

    Pipeline: train the exact-integer quantizer (:func:`kmeans_integer`
    — same broadcast row-local argmin supersteps), assign every vector
    to its nearest centroid by squared L2 (identical tie-break as
    training, so the oracle's unrolled SQL lands on the same
    partition), then search pairs ONLY within a cluster and keep pairs
    with exact-integer cosine ≥ ``min_cosine``. Per the paper, one
    representative per duplicate set survives; deterministically the
    smallest vec_id (same keeper rule as :func:`near_dup_groups`).

    Scale shape: the cluster partition bounds the pair space to
    Σ_c |c|² — that IS SemDeDup's scaling argument (the paper runs
    k=50k clusters over LAION). The pair search is a (cluster_id)
    equi-join, never a cartesian; at 10⁹ docs you raise k so clusters
    stay bounded (and a degenerate cluster gets the same pre-count cap
    treatment as the MinHash buckets), plan shape unchanged.

    Returns (dup_vec, cluster_id, keeper, n_near): the vectors SemDeDup
    would DROP, the cluster they were judged in, the surviving
    representative, and their near-dup degree."""
    base = with_quantized(emb, scale)
    cents = (
        kmeans_integer(emb, init_ids=init_ids, iters=iters, scale=scale)
        .select("cent_id", F.col("centroid").alias("cq"))
        .withColumn("cn", dot_expr(F.col("cq"), F.col("cq")))
    )
    carr = cents.agg(F.collect_list(F.struct("cent_id", "cq", "cn")).alias("cents"))
    best = F.array_min(
        F.transform(
            F.col("cents"),
            lambda c: F.struct(
                (F.col("norm2") - 2 * dot_expr(F.col("q"), c["cq"]) + c["cn"]).alias(
                    "dist"
                ),
                c["cent_id"].alias("cent_id"),
            ),
        )
    )
    asg = (
        base.join(F.broadcast(carr))
        .withColumn("b", best)
        .select("vec_id", "q", "norm2", F.col("b.cent_id").alias("cluster_id"))
    )
    a, b = asg.alias("a"), asg.alias("b")
    t2_e4 = int(round(min_cosine * min_cosine * 10_000))
    pairs = (
        a.join(
            b,
            (F.col("a.cluster_id") == F.col("b.cluster_id"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .withColumn("dot", dot_expr(F.col("a.q"), F.col("b.q")))
        .filter(
            (F.col("dot") > 0)
            & (
                F.col("dot") * F.col("dot") * F.lit(10_000)
                >= F.lit(t2_e4) * F.col("a.norm2") * F.col("b.norm2")
            )
        )
    )
    return pairs.groupBy(
        F.col("b.vec_id").alias("dup_vec"), F.col("b.cluster_id").alias("cluster_id")
    ).agg(
        F.min(F.col("a.vec_id")).alias("keeper"),
        F.count(F.lit(1)).alias("n_near"),
    )


def sign_bucket(col, dims: list[int]):
    """Axis-parallel LSH bucket: concatenated sign bits of chosen coords
    (1-based element_at — portable)."""
    bits = [
        F.when(F.element_at(col, d) > 0, F.lit("1")).otherwise(F.lit("0")) for d in dims
    ]
    return F.concat(*bits)


# Band layout for near_dup_groups: 4 OR-amplified bands of 4 sign bits
# each (16 buckets/band). More bands = recall, more bits = precision /
# smaller buckets; at 10⁹ vectors you'd raise bits per band so bucket
# sizes stay bounded — the plan shape is unchanged. Shared with the
# DuckDB oracle (plans/queries_ext2.py) so the two engines gate on the
# identical candidate set.
NEAR_DUP_BANDS: list[list[int]] = [
    [1, 17, 33, 49],
    [5, 21, 37, 53],
    [9, 25, 41, 57],
    [13, 29, 45, 61],
]


def near_dup_groups(
    emb: DataFrame,
    min_cosine: float = 0.35,
    scale: int = 100,
    bands: list[list[int]] | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate detection: every vector with an
    LSH-candidate near-duplicate among *earlier* vectors (vec_id order),
    its keeper (smallest such earlier id) and near-dup degree.

    Scale-safe shape — never all-pairs: candidate pairs come from a
    multi-band sign-bucket LSH (same family as :func:`lsh_bucketed_pairs`;
    OR across ``bands`` for recall), deduplicated across bands, then
    verified by the exact integer threshold test
    (score >= t ⇔ dot>0 ∧ dot²·10⁴ ≥ t²·10⁴·n1·n2) — bit-deterministic
    cross-engine. Pair space is Σ_buckets |bucket|² per band instead of
    |corpus|²; every join is an equi-join (band, bucket) or (vec_id), so
    Catalyst never plans a cartesian product (asserted by
    tools/explain_plans.py).
    """
    bands = bands or NEAR_DUP_BANDS
    base = with_quantized(emb, scale)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"), sign_bucket(F.col("q"), dims).alias("bucket")
            )
            for i, dims in enumerate(bands)
        ]
    )
    buckets = base.select("vec_id", F.explode(band_structs).alias("bb")).select(
        "vec_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    a, b = buckets.alias("a"), buckets.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
        .distinct()
    )
    qa = base.select(
        F.col("vec_id").alias("vec_a"), F.col("q").alias("qa"), F.col("norm2").alias("na")
    )
    qb = base.select(
        F.col("vec_id").alias("vec_b"), F.col("q").alias("qb"), F.col("norm2").alias("nb")
    )
    t2_e4 = int(round(min_cosine * min_cosine * 10_000))
    pairs = (
        cand.join(qa, "vec_a")
        .join(qb, "vec_b")
        .withColumn("dot", dot_expr(F.col("qa"), F.col("qb")))
        .filter(
            (F.col("dot") > 0)
            & (
                F.col("dot") * F.col("dot") * F.lit(10_000)
                >= F.lit(t2_e4) * F.col("na") * F.col("nb")
            )
        )
    )
    return pairs.groupBy(F.col("vec_b").alias("dup_vec")).agg(
        F.min("vec_a").alias("keeper"),
        F.count(F.lit(1)).alias("n_near"),
    )


def lsh_bucketed_pairs(
    emb: DataFrame,
    dims: list[int] | None = None,
    min_cosine: float = 0.2,
    scale: int = 100,
) -> DataFrame:
    """ANN candidate pairs: same sign-bucket, verified by exact quantized
    cosine. The threshold test runs fully in integer arithmetic:
    score >= t  ⇔  dot > 0 ∧ dot²·10⁴ ≥ t²·10⁴·n1·n2."""
    dims = dims or [1, 9, 17, 25, 33]
    base = with_quantized(emb, scale).withColumn(
        "bucket", sign_bucket(F.col("q"), dims)
    )
    a, b = base.alias("a"), base.alias("b")
    t2_e4 = int(round(min_cosine * min_cosine * 10_000))
    dot = dot_expr(F.col("a.q"), F.col("b.q"))
    pairs = (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .withColumn("dot", dot)
        .filter(
            (F.col("dot") > 0)
            & (
                F.col("dot") * F.col("dot") * F.lit(10_000)
                >= F.lit(t2_e4) * F.col("a.norm2") * F.col("b.norm2")
            )
        )
    )
    return pairs.select(
        F.col("a.vec_id").alias("vec_a"),
        F.col("b.vec_id").alias("vec_b"),
        (F.col("dot") / F.sqrt((F.col("a.norm2") * F.col("b.norm2")).cast("double"))).alias(
            "score"
        ),
    )
