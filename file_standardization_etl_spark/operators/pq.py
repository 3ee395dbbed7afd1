"""Product quantization (PQ) ANN over the embedding column.

The billion-vector memory-scale path (Jégou/Douze/Schmid, "Product
Quantization for Nearest Neighbor Search", IEEE TPAMI 2011 — the
FAISS ``IndexPQ``/ADC design): split each d-dim vector into ``m``
contiguous d/m-dim subvectors, train a tiny k-means codebook per
subspace, store each corpus vector as ``m`` small integer codes, and
answer queries by Asymmetric Distance Computation — a per-query table
of exact query-subvector→codeword distances, summed along each corpus
vector's codes. The corpus is then scanned as m codes per row instead
of d floats, which is the whole point at 10⁹+ vectors.

Scale shape (the 100 TB story):

- **train** runs the same joint Lloyd superstep as the IVF coarse
  quantizer (`similarity.kmeans_integer`), for all ``m`` subspaces at
  once: the m·k codewords fold into a tiny broadcast side, assignment
  is a row-local ``array_min(transform(...))`` expression (no
  |corpus|·k explosion, no aggregate), and the centroid update is one
  (sub, code, pos) primitive-sum HashAggregate never wider than
  m·k·(d/m) = k·d rows. Iterations stay Spark-side; nothing collects.
- **encode** is one row-local projection against the broadcast
  codebooks — a map-stage job, no shuffle wider than the final
  per-vector code collect (k·m keyed on vec_id).
- **ADC** broadcasts a per-query lookup table (m maps of k entries)
  and scores each corpus row with a row-local
  ``aggregate(zip_with(codes, luts, ...))`` fold; the corpus is
  scanned once, never shuffled, and the top-k per query is a window
  over the tiny thresholded result.

Numeric portability: embeddings quantize to integers (see
similarity.py), so every number here — training distances, encode
argmins, the ADC table, the summed approximate distance — is exact
int64 arithmetic. Spark and the DuckDB oracle agree bitwise, and the
returned score column IS an integer (no floats anywhere in the op).

Reference parity: the reference repo has no ANN; this extends the
task brief's similarity-search roster (SURVEY.md §2 extensions)
alongside `ann_ivf_kmeans_topk` — IVF prunes *compute* (probe a few
cells), PQ prunes *memory bandwidth* (scan codes, not vectors); real
deployments (FAISS IVFPQ) compose both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .similarity import dot_expr, floordiv_exact, with_quantized


def pq_subvectors(emb: DataFrame, m: int = 4, dims: int = 64, scale: int = 100) -> DataFrame:
    """Explode each quantized vector into its m contiguous subvectors:
    (vec_id, sub_id, sv: array<long>, svn = sv·sv). Pure map-stage —
    one generate per row, no shuffle."""
    d_sub = dims // m
    base = with_quantized(emb, scale)
    subs = F.array(
        *[
            F.struct(
                F.lit(j).alias("sub_id"),
                F.slice("q", j * d_sub + 1, d_sub).alias("sv"),
            )
            for j in range(m)
        ]
    )
    out = base.select("vec_id", F.explode(subs).alias("s")).select(
        "vec_id", F.col("s.sub_id").alias("sub_id"), F.col("s.sv").alias("sv")
    )
    return out.withColumn("svn", dot_expr(F.col("sv"), F.col("sv")))


def _nearest_code(subs: DataFrame, cents: DataFrame) -> DataFrame:
    """Row-local argmin of exact squared L2 against the broadcast
    per-subspace codebooks; ties break on code_id (identical to the
    DuckDB oracle's row_number ORDER BY). Adds ``code_id`` to *subs*."""
    carr = cents.groupBy("sub_id").agg(
        F.collect_list(F.struct("code_id", "cq", "cn")).alias("cents")
    )
    best = F.array_min(
        F.transform(
            F.col("cents"),
            lambda c: F.struct(
                (F.col("svn") - 2 * dot_expr(F.col("sv"), c["cq"]) + c["cn"]).alias(
                    "dist"
                ),
                c["code_id"].alias("code_id"),
            ),
        )
    )
    return (
        subs.join(F.broadcast(carr), "sub_id")
        .withColumn("b", best)
        .withColumn("code_id", F.col("b.code_id"))
        .drop("cents", "b")
    )


def pq_train(
    emb: DataFrame,
    init_ids: list[int],
    m: int = 4,
    dims: int = 64,
    iters: int = 2,
    scale: int = 100,
) -> DataFrame:
    """Joint Lloyd's k-means over all m subspaces at once, exact-integer
    (see `similarity.kmeans_integer` for why it can be exact). Initial
    codewords are the subvectors of ``init_ids`` (code_id = vec_id), so
    both engines start identically. Returns the trained codebooks
    (sub_id, code_id, cq: array<long>, cn). A codeword that loses all
    members drops out — same in the oracle."""
    subs = pq_subvectors(emb, m=m, dims=dims, scale=scale)
    cents = subs.filter(F.col("vec_id").isin(init_ids)).select(
        "sub_id",
        F.col("vec_id").alias("code_id"),
        F.col("sv").alias("cq"),
        F.col("svn").alias("cn"),
    )
    for _ in range(iters):
        assigned = _nearest_code(subs, cents).select("sub_id", "code_id", "sv")
        sums = (
            assigned.select("sub_id", "code_id", F.posexplode("sv").alias("pos", "v"))
            .groupBy("sub_id", "code_id", "pos")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
            .withColumn("cv", floordiv_exact(F.col("s"), F.col("n")))
        )
        cents = (
            sums.groupBy("sub_id", "code_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "cv"))), lambda x: x.cv
                ).alias("cq")
            )
            .withColumn("cn", dot_expr(F.col("cq"), F.col("cq")))
        )
    return cents


def pq_codes(subs: DataFrame, cents: DataFrame) -> DataFrame:
    """Encode: (vec_id, codes: array<long> ordered by sub_id). One
    row-local argmin per subvector, then a vec_id-keyed collect — the
    PQ-compressed corpus representation the ADC scan reads."""
    assigned = _nearest_code(subs, cents).select("vec_id", "sub_id", "code_id")
    return assigned.groupBy("vec_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("sub_id", "code_id"))),
            lambda x: x.code_id,
        ).alias("codes")
    )


def pq_adc_topk(
    emb: DataFrame,
    query_ids: list[int],
    init_ids: list[int],
    k: int = 10,
    m: int = 4,
    dims: int = 64,
    iters: int = 2,
    scale: int = 100,
) -> DataFrame:
    """End-to-end PQ ANN: train codebooks on the full table, encode the
    corpus (queries excluded), and rank by exact-integer ADC distance.

    Returns (query_id, rank, neighbor_id, adc_dist) — adc_dist is the
    summed integer squared-L2 table lookup, bit-identical to the
    DuckDB oracle's join-based formulation (the fold over broadcast
    maps and the (sub, code) equi-join compute the same sum; Spark
    gets the scan-shaped plan, the oracle the relational one)."""
    subs = pq_subvectors(emb, m=m, dims=dims, scale=scale)
    cents = pq_train(emb, init_ids, m=m, dims=dims, iters=iters, scale=scale)
    codes = pq_codes(subs.filter(~F.col("vec_id").isin(query_ids)), cents)

    qsubs = subs.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), "sub_id", "sv", "svn"
    )
    dt = qsubs.join(F.broadcast(cents), "sub_id").select(
        "query_id",
        "sub_id",
        "code_id",
        (F.col("svn") - 2 * dot_expr(F.col("sv"), F.col("cq")) + F.col("cn")).alias("d"),
    )
    # per-query LUT: array over sub_id of map<code_id, d> (structs holding
    # maps aren't orderable in Spark, so index by sub_id via a map-of-maps
    # instead of array_sort)
    luts = (
        dt.groupBy("query_id", "sub_id")
        .agg(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("code_id", "d")))
            ).alias("mp")
        )
        .groupBy("query_id")
        .agg(F.map_from_entries(F.collect_list(F.struct("sub_id", "mp"))).alias("lutm"))
        .select(
            "query_id",
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda j: F.element_at(F.col("lutm"), j),
            ).alias("luts"),
        )
    )
    scored = codes.join(F.broadcast(luts)).withColumn(
        "adc_dist",
        F.aggregate(
            F.zip_with("codes", "luts", lambda c, mp: F.element_at(mp, c)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("adc_dist").asc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", F.col("vec_id").alias("neighbor_id"), "adc_dist")
    )
