"""Registry tranche 6: product-quantization ANN and semantic dedup —
the two remaining published training-data-curation methods layered on
the exact-integer k-means machinery (operators/similarity.py,
operators/pq.py). Both oracles unroll the identical Lloyd iterations in
DuckDB SQL (shared CTE builders, same floor-division and tie-break
rules), so every distance, code assignment and final row is bitwise
comparable across engines — iterative algorithms under the full
rows+schema+hash gate, not rows-only checks."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import pq, similarity
from .queries import load
from .queries_ext2 import _KMEANS_INIT, _KMEANS_ITERS, _kmeans_ctes

# ---------------------------------------------------------------------------
# PQ / ADC approximate nearest neighbor (Jégou et al., TPAMI 2011)
# ---------------------------------------------------------------------------

_PQ_M = 4
_PQ_DIMS = 64
_PQ_DSUB = _PQ_DIMS // _PQ_M
_PQ_INIT = list(range(200, 208))  # k=8 codewords per subspace
_PQ_ITERS = 2
_PQ_QUERIES = [0, 1, 2, 3, 4]
_PQ_K = 10


def q_ann_pq_adc_topk(spark, sf_dir):
    """PQ ANN end-to-end: joint per-subspace k-means codebooks (exact
    integer Lloyd's), corpus encoded to m codes per vector, queries
    answered by ADC table lookups — rank and the integer adc_dist both
    bitwise-checked against the oracle's unrolled-SQL formulation.
    Spark gets the scan-shaped plan (broadcast LUT + row-local fold);
    the oracle the relational one (equi-join + SUM) — same integers."""
    emb = load(spark, sf_dir, "embeddings")
    return pq.pq_adc_topk(
        emb,
        query_ids=_PQ_QUERIES,
        init_ids=_PQ_INIT,
        k=_PQ_K,
        m=_PQ_M,
        dims=_PQ_DIMS,
        iters=_PQ_ITERS,
    )


def _pq_ctes() -> tuple[list[str], str]:
    """CTE chain mirroring pq.pq_train + pq.pq_codes: subvector framing,
    unrolled joint Lloyd iterations keyed (sub_id, code_id), final
    codebooks. Returns (ctes, final_codebook_cte)."""
    ids = ", ".join(str(i) for i in _PQ_INIT)
    d = _PQ_DSUB
    ctes = [
        "nv AS (SELECT vec_id, list_transform(embedding, x -> CAST(FLOOR(x*100 + 0.5) AS BIGINT)) AS qv FROM embeddings)",
        f"""subs AS (
  SELECT vec_id, j AS sub_id, list_slice(qv, j*{d}+1, j*{d}+{d}) AS sv,
         CAST(list_dot_product(list_slice(qv, j*{d}+1, j*{d}+{d}),
                               list_slice(qv, j*{d}+1, j*{d}+{d})) AS BIGINT) AS svn
  FROM nv, range(0, {_PQ_M}) t(j)
)""",
        f"p0 AS (SELECT sub_id, vec_id AS code_id, sv AS cq, svn AS cn FROM subs WHERE vec_id IN ({ids}))",
    ]
    prev = "p0"
    for it in range(1, _PQ_ITERS + 1):
        ctes.append(
            f"""a{it} AS (
  SELECT sub_id, code_id, sv FROM (
    SELECT s.sub_id, c.code_id, s.sv,
           row_number() OVER (PARTITION BY s.vec_id, s.sub_id ORDER BY
             s.svn - 2 * CAST(list_dot_product(s.sv, c.cq) AS BIGINT) + c.cn, c.code_id) AS rn
    FROM subs s JOIN {prev} c ON s.sub_id = c.sub_id
  ) WHERE rn = 1
)"""
        )
        ctes.append(
            f"""s{it} AS (
  SELECT sub_id, code_id, i AS pos, CAST(SUM(sv[i]) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS n
  FROM a{it}, range(1, {d + 1}) t(i)
  GROUP BY 1, 2, 3
)"""
        )
        ctes.append(
            f"""p{it} AS (
  SELECT sub_id, code_id, list(cv ORDER BY pos) AS cq,
         CAST(list_dot_product(list(cv ORDER BY pos), list(cv ORDER BY pos)) AS BIGINT) AS cn
  FROM (SELECT sub_id, code_id, pos, (s - ((s % n) + n) % n) // n AS cv FROM s{it})
  GROUP BY 1, 2
)"""
        )
        prev = f"p{it}"
    return ctes, prev


def _pq_sql() -> str:
    qids = ", ".join(str(i) for i in _PQ_QUERIES)
    ctes, cb = _pq_ctes()
    ctes.append(
        f"""codes AS (
  SELECT vec_id, sub_id, code_id FROM (
    SELECT s.vec_id, s.sub_id, c.code_id,
           row_number() OVER (PARTITION BY s.vec_id, s.sub_id ORDER BY
             s.svn - 2 * CAST(list_dot_product(s.sv, c.cq) AS BIGINT) + c.cn, c.code_id) AS rn
    FROM subs s JOIN {cb} c ON s.sub_id = c.sub_id
    WHERE s.vec_id NOT IN ({qids})
  ) WHERE rn = 1
)"""
    )
    ctes.append(
        f"""dt AS (
  SELECT q.vec_id AS query_id, c.sub_id, c.code_id,
         q.svn - 2 * CAST(list_dot_product(q.sv, c.cq) AS BIGINT) + c.cn AS d
  FROM subs q JOIN {cb} c ON q.sub_id = c.sub_id
  WHERE q.vec_id IN ({qids})
)"""
    )
    ctes.append(
        """adc AS (
  SELECT dt.query_id, codes.vec_id AS neighbor_id, CAST(SUM(dt.d) AS BIGINT) AS adc_dist
  FROM codes JOIN dt ON codes.sub_id = dt.sub_id AND codes.code_id = dt.code_id
  GROUP BY 1, 2
)"""
    )
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
SELECT query_id, rank, neighbor_id, adc_dist FROM (
  SELECT query_id, neighbor_id, adc_dist,
         CAST(row_number() OVER (PARTITION BY query_id
           ORDER BY adc_dist, neighbor_id) AS INT) AS rank
  FROM adc
) WHERE rank <= {_PQ_K}
"""
    )


SQL_ANN_PQ_ADC = _pq_sql()


# ---------------------------------------------------------------------------
# SemDeDup — semantic dedup over k-means clusters (Abbas et al. 2023)
# ---------------------------------------------------------------------------

_SEM_MIN_COSINE = 0.35
_SEM_T2E4 = int(round(_SEM_MIN_COSINE * _SEM_MIN_COSINE * 10_000))


def q_dedup_semantic(spark, sf_dir):
    """SemDeDup: k-means-cluster the embeddings (the same exact-integer
    quantizer as ann_kmeans_centroids), then drop within-cluster
    near-duplicates above the cosine threshold, keeping the smallest id
    per duplicate set. The oracle re-runs the identical unrolled Lloyd
    iterations, the identical L2 assignment tie-break, and the identical
    integer threshold test — the full iterative pipeline under the
    bitwise gate."""
    emb = load(spark, sf_dir, "embeddings")
    return similarity.semantic_dup_groups(
        emb, init_ids=_KMEANS_INIT, iters=_KMEANS_ITERS, min_cosine=_SEM_MIN_COSINE
    )


def _semantic_sql() -> str:
    ctes, final = _kmeans_ctes(_KMEANS_INIT, _KMEANS_ITERS)
    ctes.append(
        f"""asg AS (
  SELECT vec_id, qv, norm2, cent_id AS cluster_id FROM (
    SELECT v.vec_id, v.qv, v.norm2, c.cent_id,
           row_number() OVER (PARTITION BY v.vec_id ORDER BY
             v.norm2 - 2 * CAST(list_dot_product(v.qv, c.cq) AS BIGINT) + c.cn, c.cent_id) AS rn
    FROM n2 v CROSS JOIN {final} c
  ) WHERE rn = 1
)"""
    )
    ctes.append(
        f"""sem_pairs AS (
  SELECT va, vb, cluster_id FROM (
    SELECT a.vec_id AS va, b.vec_id AS vb, a.cluster_id,
           CAST(list_dot_product(a.qv, b.qv) AS BIGINT) AS dot,
           a.norm2 AS na, b.norm2 AS nb
    FROM asg a JOIN asg b
      ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
  ) WHERE dot > 0 AND dot * dot * 10000 >= {_SEM_T2E4} * na * nb
)"""
    )
    return (
        "WITH " + ",\n".join(ctes)
        + """
SELECT vb AS dup_vec, cluster_id, CAST(MIN(va) AS BIGINT) AS keeper,
       CAST(COUNT(*) AS BIGINT) AS n_near
FROM sem_pairs GROUP BY 1, 2
"""
    )


SQL_DEDUP_SEMANTIC = _semantic_sql()


PQ_QUERIES: dict[str, tuple] = {
    "ann_pq_adc_topk": (q_ann_pq_adc_topk, SQL_ANN_PQ_ADC),
    "dedup_semantic": (q_dedup_semantic, SQL_DEDUP_SEMANTIC),
}
