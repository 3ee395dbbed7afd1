"""Registry tranche 6: product-quantization ANN, semantic dedup, and the
end-to-end curation funnel — published training-data-curation methods
layered on machinery the earlier tranches already verify (the
exact-integer k-means of operators/similarity.py; the text/token
operators of operators/textstats.py and operators/tokenize.py). The
PQ/SemDeDup oracles unroll the identical Lloyd iterations in DuckDB SQL
(shared CTE builders, same floor-division and tie-break rules); the
funnel oracle recomputes every stage rule from the same expression
definitions — iterative and composite pipelines under the full
rows+schema+hash gate, not rows-only checks."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import curation, pq, similarity, tokenize
from .queries import load
from .queries_ext2 import _KMEANS_INIT, _KMEANS_ITERS, _kmeans_ctes
from .queries_tokens import _BUCKET, _SQL_GRAMS

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


# ---------------------------------------------------------------------------
# Corpus curation funnel — the full filter chain with per-stage accounting
# ---------------------------------------------------------------------------


def q_corpus_curation_funnel(spark, sf_dir):
    """The C4/Gopher-style curation pipeline composed end to end
    (operators/curation.py): language ID → quality gates → repetition
    rule → exact dedup → train split → decontamination, with survivor
    counts per cumulative stage. One corpus scan for the row-local
    flags + exactly the shuffles the standalone operators already cost;
    the rollup is a single-row prefix-conjunction aggregate unstacked to
    rows."""
    return curation.curation_funnel(load(spark, sf_dir, "documents"))


SQL_CURATION_FUNNEL = f"""
WITH wd AS (
  SELECT doc_id, text, string_split(text, ' ') AS w, CAST({_BUCKET} AS INT) AS b
  FROM documents
),
fl AS (
  SELECT doc_id, b, md5(text) AS h,
         len(list_filter(w, x -> x IN ('the','a','and'))) > 0 AS f_lang,
         (CAST(len(w) AS BIGINT) >= 5
          AND len(list_filter(w, x -> x IN ('the','a','of','and','to'))) >= 1
          AND CAST(len(list_distinct(w)) AS BIGINT) * 1000 >= 300 * CAST(len(w) AS BIGINT)
         ) AS f_quality
  FROM wd
),
rg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(w) - 2 + 1),
                i -> md5(concat_ws(' ', w[i], w[i+1], w[i+2])))) AS gram
  FROM wd WHERE len(w) >= 3
),
rep AS (
  SELECT doc_id,
         CAST((SUM(occ) - COUNT(*)) * 1000 // SUM(occ) AS BIGINT) AS dup_permille
  FROM (SELECT doc_id, gram, COUNT(*) AS occ FROM rg GROUP BY 1, 2)
  GROUP BY 1
),
keep AS (SELECT h, MIN(doc_id) AS keep_id FROM fl GROUP BY 1),
{_SQL_GRAMS},
dirty AS (
  SELECT DISTINCT t.doc_id FROM g t JOIN g e ON t.gram = e.gram
  WHERE t.b < {tokenize.TRAIN_PCT} AND e.b >= {tokenize.TRAIN_PCT}
),
f AS (
  SELECT fl.doc_id, f_lang, f_quality,
         COALESCE(r.dup_permille <= 200, TRUE) AS f_rep,
         fl.doc_id = k.keep_id AS f_dedup,
         fl.b < {tokenize.TRAIN_PCT} AS f_train,
         fl.doc_id NOT IN (SELECT doc_id FROM dirty) AS f_clean
  FROM fl LEFT JOIN rep r USING (doc_id) JOIN keep k USING (h)
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS s0,
         CAST(SUM(CASE WHEN f_lang THEN 1 ELSE 0 END) AS BIGINT) AS s1,
         CAST(SUM(CASE WHEN f_lang AND f_quality THEN 1 ELSE 0 END) AS BIGINT) AS s2,
         CAST(SUM(CASE WHEN f_lang AND f_quality AND f_rep THEN 1 ELSE 0 END) AS BIGINT) AS s3,
         CAST(SUM(CASE WHEN f_lang AND f_quality AND f_rep AND f_dedup THEN 1 ELSE 0 END) AS BIGINT) AS s4,
         CAST(SUM(CASE WHEN f_lang AND f_quality AND f_rep AND f_dedup AND f_train THEN 1 ELSE 0 END) AS BIGINT) AS s5,
         CAST(SUM(CASE WHEN f_lang AND f_quality AND f_rep AND f_dedup AND f_train AND f_clean THEN 1 ELSE 0 END) AS BIGINT) AS s6
  FROM f
)
SELECT 0 AS stage_id, 'all' AS stage, s0 AS docs FROM s
UNION ALL SELECT 1, 'lang_en', s1 FROM s
UNION ALL SELECT 2, 'quality', s2 FROM s
UNION ALL SELECT 3, 'repetition', s3 FROM s
UNION ALL SELECT 4, 'exact_dedup', s4 FROM s
UNION ALL SELECT 5, 'train_split', s5 FROM s
UNION ALL SELECT 6, 'decontaminated', s6 FROM s
"""


PQ_QUERIES: dict[str, tuple] = {
    "ann_pq_adc_topk": (q_ann_pq_adc_topk, SQL_ANN_PQ_ADC),
    "dedup_semantic": (q_dedup_semantic, SQL_DEDUP_SEMANTIC),
    "corpus_curation_funnel": (q_corpus_curation_funnel, SQL_CURATION_FUNNEL),
}
