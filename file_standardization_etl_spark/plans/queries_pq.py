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


PQ_QUERIES: dict[str, tuple] = {
    "ann_pq_adc_topk": (q_ann_pq_adc_topk, SQL_ANN_PQ_ADC),
}
