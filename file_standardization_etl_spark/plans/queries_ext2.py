"""Registry tranche 3: the SURVEY.md §2 rows not carried by tranches 1-2
— junk-row filtering (P5/P9, with the P4 empty-row drop), scalar-subquery
routing joins (J4), global scalar aggregates (A4/A5) with deterministic
top-1 (O3), null-count profiling (A7, feeding the P3 empty-column-prune
decision), ORDER BY/top-k (O1/O2/O3), a checked CSV source round-trip
(S2), the Excel positional-grid pipeline (S1/P3/P4) and
dd_attribute_detail column mapping — plus the training-data extensions:
LSH-gated embedding-cosine near-dup, IVF ANN, and the exact-integer
k-means quantizer whose oracle unrolls the same Lloyd iterations in SQL.
Same cross-engine determinism rules as queries.py."""

from __future__ import annotations

import os

from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators import similarity
from ..sources import readers
from .queries import cents, load

# ---------------------------------------------------------------------------
# P4/P5/P9 + F3/F4: junk-row removal over a synthesized report grid
# ---------------------------------------------------------------------------


def q_filter_junk_rows(spark, sf_dir):
    """P5 junk-row filter + P4 empty-row drop + P9 IN-list (ref junk-set
    {pageof, total, toplam, ...} normalize-and-drop at
    repomix-output.xml:7333-7358; empty-row filter at
    src/business/rules.py:92-103). A report-style line grid is synthesized
    deterministically from `orders` (junk every 97th key, blanks every
    89th), then normalized (lower + strip non-letters — F3/F4 shape) and
    filtered by the junk set."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 30000)
    key = F.col("o_orderkey")
    junk = (
        F.when(key % 3 == 0, F.lit(" Page 1 of 2 "))
        .when(key % 3 == 1, F.lit("TOTAL:"))
        .otherwise(F.lit(" Toplam "))
    )
    line = (
        F.when(key % 89 == 0, F.lit("   "))
        .when(key % 97 == 0, junk)
        .otherwise(F.concat_ws(" ", F.col("o_orderpriority"), F.col("o_orderstatus")))
    )
    grid = o.select("o_orderkey", line.alias("line"))
    norm = F.lower(F.regexp_replace(F.col("line"), "[^A-Za-z]", ""))
    return (
        grid.withColumn("norm", norm)
        .filter((F.col("norm") != "") & ~F.col("norm").isin("pageof", "total", "toplam"))
        .select("o_orderkey", "line")
    )


SQL_FILTER_JUNK = """
WITH grid AS (
  SELECT o_orderkey,
         CASE
           WHEN o_orderkey % 89 = 0 THEN '   '
           WHEN o_orderkey % 97 = 0 THEN
             CASE WHEN o_orderkey % 3 = 0 THEN ' Page 1 of 2 '
                  WHEN o_orderkey % 3 = 1 THEN 'TOTAL:'
                  ELSE ' Toplam ' END
           ELSE o_orderpriority || ' ' || o_orderstatus
         END AS line
  FROM orders WHERE o_orderkey < 30000
)
SELECT o_orderkey, line FROM (
  SELECT *, lower(regexp_replace(line, '[^A-Za-z]', '', 'g')) AS norm FROM grid
) WHERE norm <> '' AND norm NOT IN ('pageof', 'total', 'toplam')
"""


# ---------------------------------------------------------------------------
# J4: scalar-subquery routing join
# ---------------------------------------------------------------------------


def q_join_scalar_subquery(spark, sf_dir):
    """J4: route rows by a scalar looked up from a two-table correlated
    query (ref country routing: implicit cross join of email_connection_info
    × dim_countries correlated on receiver, config/queries.py:204-210).
    Here: resolve NATION_7's key through nation×region, then take that
    nation's customers — the 1-row scalar side joins broadcast, no
    collect()."""
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    c = load(spark, sf_dir, "customer")
    scalar = (
        n.join(r, n.n_regionkey == r.r_regionkey)
        .filter((F.col("n_name") == "NATION_7") & F.col("r_name").isNotNull())
        .select("n_nationkey")
    )
    return (
        c.join(F.broadcast(scalar), c.c_nationkey == F.col("n_nationkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(cents(F.col("c_acctbal"))).alias("acctbal_cents"),
        )
    )


SQL_JOIN_SCALAR_SUBQ = """
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CAST(FLOOR(c_acctbal*100 + 0.5) AS BIGINT)) AS BIGINT) AS acctbal_cents
FROM customer
WHERE c_nationkey = (
  SELECT n_nationkey FROM nation, region
  WHERE n_regionkey = r_regionkey AND n_name = 'NATION_7' AND r_name IS NOT NULL
)
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# A4/A5/O3: global scalar aggregates, one output row
# ---------------------------------------------------------------------------


def q_agg_global_scalars(spark, sf_dir):
    """A4 filtered global MAX (ref max(id) WHERE file LIKE '%client%',
    repomix-output.xml:8333-8335), A5 net-sales sums (sum(sales)-sum(returns),
    src/models/sales.py:113-124), O3 deterministic top-1 (result[0] of a
    sorted read, repomix-output.xml:8351-8352). Three 1-row frames
    crossJoin into one row — no collect()."""
    ev = load(spark, sf_dir, "events")
    max_click = ev.filter(F.col("event_type") == "click").agg(
        F.max("event_id").alias("max_click_id")
    )
    net = ev.agg(
        (
            F.sum(F.when(F.col("event_type") == "purchase", cents(F.col("value"))).otherwise(F.lit(0)))
            - F.sum(F.when(F.col("event_type") == "error", cents(F.col("value"))).otherwise(F.lit(0)))
        ).alias("net_value_cents")
    )
    top1 = (
        ev.filter(F.col("event_type") == "purchase")
        .orderBy(F.col("value").desc(), F.col("event_id"))
        .limit(1)
        .select(F.col("event_id").alias("top_purchase_event"))
    )
    return max_click.crossJoin(net).crossJoin(top1)


SQL_AGG_GLOBAL = """
SELECT
  (SELECT MAX(event_id) FROM events WHERE event_type = 'click') AS max_click_id,
  (SELECT CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(FLOOR(value*100 + 0.5) AS BIGINT) ELSE 0 END)
             - SUM(CASE WHEN event_type = 'error' THEN CAST(FLOOR(value*100 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT)
   FROM events) AS net_value_cents,
  (SELECT event_id FROM events WHERE event_type = 'purchase'
   ORDER BY value DESC, event_id LIMIT 1) AS top_purchase_event
"""


# ---------------------------------------------------------------------------
# A7 + P3: null-count profile driving the empty-column-prune decision
# ---------------------------------------------------------------------------


def q_agg_null_profile(spark, sf_dir):
    """A7 null-count profile (ref df[required].isnull().sum(),
    src/models/stock.py:66-69) + the P3 empty-column-prune decision bit
    (drop iff all values null, repomix-output.xml:7294-7308). Nulls are
    synthesized deterministically via NULLIF so both engines see the same
    missingness."""
    li = load(spark, sf_dir, "lineitem")
    a = F.nullif(F.col("l_returnflag"), F.lit("N"))
    b = F.nullif(F.col("l_linestatus"), F.lit("F"))
    c = F.nullif(F.col("l_linenumber").cast("long"), F.lit(1))
    prof = li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(a.isNull(), F.lit(1))).alias("nulls_returnflag"),
        F.count(F.when(b.isNull(), F.lit(1))).alias("nulls_linestatus"),
        F.count(F.when(c.isNull(), F.lit(1))).alias("nulls_linenumber"),
    )
    return prof.select(
        "*",
        (F.col("nulls_returnflag") == F.col("n_rows")).alias("prune_returnflag"),
        (F.col("nulls_linestatus") == F.col("n_rows")).alias("prune_linestatus"),
    )


SQL_AGG_NULL_PROFILE = """
SELECT n_rows, nulls_returnflag, nulls_linestatus, nulls_linenumber,
       nulls_returnflag = n_rows AS prune_returnflag,
       nulls_linestatus = n_rows AS prune_linestatus
FROM (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(COUNT(CASE WHEN NULLIF(l_returnflag, 'N') IS NULL THEN 1 END) AS BIGINT) AS nulls_returnflag,
         CAST(COUNT(CASE WHEN NULLIF(l_linestatus, 'F') IS NULL THEN 1 END) AS BIGINT) AS nulls_linestatus,
         CAST(COUNT(CASE WHEN NULLIF(CAST(l_linenumber AS BIGINT), 1) IS NULL THEN 1 END) AS BIGINT) AS nulls_linenumber
  FROM lineitem
)
"""


# ---------------------------------------------------------------------------
# O1/O2/O3: ORDER BY + top-k
# ---------------------------------------------------------------------------


def q_order_topk(spark, sf_dir):
    """O1/O2 ORDER BY (ref ORDER BY column_position, starting_row,
    config/queries.py:130) + O3 top-k take (repomix-output.xml:8351-8352).
    Total order with explicit tiebreak so both engines agree; TakeOrdered
    physical op — no full sort materialization."""
    o = load(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            cents(F.col("o_totalprice")).alias("total_cents"),
            "o_orderpriority",
        )
        .orderBy(F.col("total_cents").desc(), F.col("o_orderkey"))
        .limit(15)
    )


SQL_ORDER_TOPK = """
SELECT o_orderkey, CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS total_cents, o_orderpriority
FROM orders ORDER BY total_cents DESC, o_orderkey LIMIT 15
"""


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup (training-data operator roster)
# ---------------------------------------------------------------------------


def q_dedup_embedding_cosine(spark, sf_dir):
    """Embedding-cosine near-duplicate groups, LSH-gated (never
    all-pairs): multi-band sign-bucket candidates → exact integer-cosine
    verify → keeper grouping (operators/similarity.py near_dup_groups).
    Threshold 0.35: this synthetic corpus's cosine ceiling is ~0.51, so a
    production-style 0.9 would be vacuously empty. The oracle gates on the
    IDENTICAL candidate set (bucket exprs generated from the same
    NEAR_DUP_BANDS table)."""
    return similarity.near_dup_groups(
        load(spark, sf_dir, "embeddings"), min_cosine=0.35
    )


def _near_dup_bucket_sql() -> str:
    """UNION ALL select list of (vec_id, band, bucket) — generated from
    similarity.NEAR_DUP_BANDS so Spark and DuckDB can never drift."""
    selects = []
    for i, dims in enumerate(similarity.NEAR_DUP_BANDS):
        bits = " || ".join(
            f"(CASE WHEN qv[{d}] > 0 THEN '1' ELSE '0' END)" for d in dims
        )
        selects.append(f"SELECT vec_id, {i} AS band, {bits} AS bucket FROM n2")
    return "\n  UNION ALL\n  ".join(selects)


SQL_DEDUP_EMB_COSINE = f"""
WITH n AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(FLOOR(x*100 + 0.5) AS BIGINT)) AS qv
  FROM embeddings
), n2 AS (
  SELECT vec_id, qv, CAST(list_dot_product(qv, qv) AS BIGINT) AS norm2 FROM n
), bk AS (
  {_near_dup_bucket_sql()}
), cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM bk a JOIN bk b ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id
), pairs AS (
  SELECT cand.vec_a AS keeper_cand, cand.vec_b AS dup_vec
  FROM cand JOIN n2 a ON cand.vec_a = a.vec_id
            JOIN n2 b ON cand.vec_b = b.vec_id
  WHERE CAST(list_dot_product(a.qv, b.qv) AS BIGINT) > 0
    AND CAST(list_dot_product(a.qv, b.qv) AS BIGINT) * CAST(list_dot_product(a.qv, b.qv) AS BIGINT) * 10000
        >= 1225 * a.norm2 * b.norm2
)
SELECT dup_vec, CAST(MIN(keeper_cand) AS BIGINT) AS keeper, CAST(COUNT(*) AS BIGINT) AS n_near
FROM pairs GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Exact-integer distributed k-means (the IVF coarse quantizer, for real)
# ---------------------------------------------------------------------------

_KMEANS_INIT = list(range(100, 108))
_KMEANS_ITERS = 3


def q_ann_kmeans_centroids(spark, sf_dir):
    """Distributed Lloyd's k-means in exact integer arithmetic
    (operators/similarity.py kmeans_integer): an ITERATIVE algorithm made
    oracle-checkable — the DuckDB oracle unrolls the same three
    iterations in SQL and must converge to bitwise-identical centroids
    and memberships, because assignment distances, tie-breaks, and the
    centroid update (elementwise integer floor-division of integer sums)
    contain no floating point at all.

    Output is posexploded to scalar rows (cent_id, n_members, pos,
    value) — the driver's canonicalizer sorts columns with pandas, which
    cannot order an ``array<long>`` cell (round-2 red row), and scalar
    rows make the bitwise comparison strictly finer-grained anyway."""
    return (
        similarity.kmeans_integer(
            load(spark, sf_dir, "embeddings"), init_ids=_KMEANS_INIT, iters=_KMEANS_ITERS
        )
        .select("cent_id", "n_members", F.posexplode("centroid").alias("pos", "value"))
    )


def _kmeans_ctes(init_ids: list[int], iters: int, dims: int = 64) -> tuple[list[str], str]:
    """CTE chain for the unrolled exact-integer Lloyd iterations; returns
    (ctes, final_cte_name). Shared by the k-means oracle and the
    kmeans-quantized IVF oracle so they can never drift."""
    ids = ", ".join(str(i) for i in init_ids)
    ctes = [
        "n2 AS (SELECT vec_id, list_transform(embedding, x -> CAST(FLOOR(x*100 + 0.5) AS BIGINT)) AS qv,"
        " CAST(list_dot_product(list_transform(embedding, x -> CAST(FLOOR(x*100 + 0.5) AS BIGINT)),"
        " list_transform(embedding, x -> CAST(FLOOR(x*100 + 0.5) AS BIGINT))) AS BIGINT) AS norm2 FROM embeddings)",
        f"c0 AS (SELECT vec_id AS cent_id, qv AS cq, norm2 AS cn FROM n2 WHERE vec_id IN ({ids}))",
    ]
    prev = "c0"
    for it in range(1, iters + 1):
        ctes.append(
            f"""a{it} AS (
  SELECT cent_id, qv FROM (
    SELECT c.cent_id, v.qv,
           row_number() OVER (PARTITION BY v.vec_id ORDER BY
             v.norm2 - 2 * CAST(list_dot_product(v.qv, c.cq) AS BIGINT) + c.cn, c.cent_id) AS rn
    FROM n2 v CROSS JOIN {prev} c
  ) WHERE rn = 1
)"""
        )
        ctes.append(
            f"""s{it} AS (
  SELECT cent_id, i AS pos, CAST(SUM(qv[i]) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS n
  FROM a{it}, range(1, {dims + 1}) t(i)
  GROUP BY 1, 2
)"""
        )
        ctes.append(
            f"""c{it} AS (
  SELECT cent_id, list(cv ORDER BY pos) AS cq, MAX(n) AS n_members,
         CAST(list_dot_product(list(cv ORDER BY pos), list(cv ORDER BY pos)) AS BIGINT) AS cn
  FROM (SELECT cent_id, pos, n, (s - ((s % n) + n) % n) // n AS cv FROM s{it})
  GROUP BY 1
)"""
        )
        prev = f"c{it}"
    return ctes, prev


def _kmeans_sql(init_ids: list[int], iters: int, dims: int = 64) -> str:
    # unrolled to scalar (cent_id, n_members, pos, value) rows — matches
    # the posexploded Spark output (pos is 0-based like posexplode)
    ctes, final = _kmeans_ctes(init_ids, iters, dims)
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT cent_id, n_members, CAST(i - 1 AS INT) AS pos,"
        f" CAST(cq[i] AS BIGINT) AS value FROM {final}, range(1, {dims + 1}) t(i)"
    )


SQL_ANN_KMEANS = _kmeans_sql(_KMEANS_INIT, _KMEANS_ITERS)


def q_ann_ivf_kmeans_topk(spark, sf_dir):
    """The full ANN pipeline end-to-end: train the coarse quantizer
    (exact-integer k-means), build the inverted file, probe nprobe cells
    per query, exact re-rank — one oracle-checked query. At 100 TB the
    quantizer trains once offline and the probe is the steady-state cost;
    here the whole chain is verified bitwise against DuckDB."""
    emb = load(spark, sf_dir, "embeddings")
    cents = (
        similarity.kmeans_integer(emb, init_ids=_KMEANS_INIT, iters=_KMEANS_ITERS)
        .select(
            "cent_id",
            F.col("centroid").alias("cq"),
            similarity.dot_expr(F.col("centroid"), F.col("centroid")).alias("cn"),
        )
    )
    return similarity.ivf_topk(
        emb, query_ids=[0, 1, 2, 3, 4], k=10, nprobe=4, centroids=cents
    )


def _ivf_kmeans_sql() -> str:
    ctes, final = _kmeans_ctes(_KMEANS_INIT, _KMEANS_ITERS)
    ctes.append(
        f"""cents AS (
  SELECT cent_id, cq, CAST(list_dot_product(cq, cq) AS BIGINT) AS cn FROM {final}
)"""
    )
    ctes.append(
        """inv AS (
  SELECT vec_id, qv, norm2, cent_id FROM (
    SELECT c.vec_id, c.qv, c.norm2, ce.cent_id,
           row_number() OVER (PARTITION BY c.vec_id
             ORDER BY CAST(list_dot_product(c.qv, ce.cq) AS BIGINT)
                      / sqrt(CAST(c.norm2 * ce.cn AS DOUBLE)) DESC, ce.cent_id) AS r
    FROM (SELECT * FROM n2 WHERE vec_id NOT IN (0,1,2,3,4)) c CROSS JOIN cents ce
  ) WHERE r = 1
)"""
    )
    ctes.append(
        """probes AS (
  SELECT query_id, qq, qn, cent_id FROM (
    SELECT q.vec_id AS query_id, q.qv AS qq, q.norm2 AS qn, ce.cent_id,
           row_number() OVER (PARTITION BY q.vec_id
             ORDER BY CAST(list_dot_product(q.qv, ce.cq) AS BIGINT)
                      / sqrt(CAST(q.norm2 * ce.cn AS DOUBLE)) DESC, ce.cent_id) AS r
    FROM (SELECT * FROM n2 WHERE vec_id IN (0,1,2,3,4)) q CROSS JOIN cents ce
  ) WHERE r <= 4
)"""
    )
    return (
        "WITH " + ",\n".join(ctes)
        + """
SELECT query_id, rank, neighbor_id, score FROM (
  SELECT p.query_id, i.vec_id AS neighbor_id,
         CAST(list_dot_product(i.qv, p.qq) AS BIGINT)
           / sqrt(CAST(i.norm2 * p.qn AS DOUBLE)) AS score,
         CAST(row_number() OVER (PARTITION BY p.query_id
           ORDER BY CAST(list_dot_product(i.qv, p.qq) AS BIGINT)
                    / sqrt(CAST(i.norm2 * p.qn AS DOUBLE)) DESC, i.vec_id) AS INT) AS rank
  FROM inv i JOIN probes p ON i.cent_id = p.cent_id
) WHERE rank <= 10
"""
    )


SQL_ANN_IVF_KMEANS = _ivf_kmeans_sql()


# ---------------------------------------------------------------------------
# S2: CSV source round-trip, oracle-checked against the parquet original
# ---------------------------------------------------------------------------

_NATION_CSV_SCHEMA = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ]
)


def q_source_csv_roundtrip(spark, sf_dir):
    """S2 CSV scan (ref CSV extractor, src/etl/extractors.py:48-69): the
    `nation` table is exported to CSV and read back through the engine's
    CSV reader with an explicit schema; the aggregate over the round-trip
    must equal the oracle's aggregate over the parquet original — a
    lossless-ingest check, not a rows-only smoke test."""
    n = load(spark, sf_dir, "nation")
    # per-application path: concurrent runs (parallel pytest, bench+tests)
    # must not overwrite each other's export mid-read
    path = os.path.join(
        "/tmp",
        f"fse_csv_roundtrip_{spark.sparkContext.applicationId}",
        os.path.basename(os.path.normpath(sf_dir)),
    )
    n.coalesce(1).write.mode("overwrite").option("header", True).csv(path)
    back = readers.read_csv(spark, path, schema=_NATION_CSV_SCHEMA, header=True)
    return back.groupBy("n_regionkey").agg(
        F.count(F.lit(1)).alias("n_nations"),
        F.min("n_name").alias("first_name"),
        F.max("n_nationkey").alias("max_key"),
    )


SQL_SOURCE_CSV = """
SELECT n_regionkey, CAST(COUNT(*) AS BIGINT) AS n_nations,
       MIN(n_name) AS first_name, MAX(n_nationkey) AS max_key
FROM nation GROUP BY 1
"""


# ---------------------------------------------------------------------------
# IVF-style ANN (cell-probe scale path; complements ann_lsh_pairs)
# ---------------------------------------------------------------------------


def q_ann_ivf_topk(spark, sf_dir):
    """IVF ANN: coarse-quantize into centroid cells (deterministic corpus
    sample as centroids), probe nprobe nearest cells per query, exact
    integer-cosine re-rank — the |corpus|/n_cells·nprobe scan pattern a
    100 TB similarity search needs (see operators/similarity.py)."""
    return similarity.ivf_topk(
        load(spark, sf_dir, "embeddings"), query_ids=[0, 1, 2, 3, 4], k=10, nprobe=4
    )


SQL_ANN_IVF = """
WITH n AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(FLOOR(x*100 + 0.5) AS BIGINT)) AS qv
  FROM embeddings
), n2 AS (
  SELECT vec_id, qv, CAST(list_dot_product(qv, qv) AS BIGINT) AS norm2 FROM n
), cents AS (
  SELECT vec_id AS cent_id, qv AS cq, norm2 AS cn FROM n2 WHERE vec_id BETWEEN 100 AND 115
), inv AS (
  SELECT vec_id, qv, norm2, cent_id FROM (
    SELECT c.vec_id, c.qv, c.norm2, ce.cent_id,
           row_number() OVER (PARTITION BY c.vec_id
             ORDER BY CAST(list_dot_product(c.qv, ce.cq) AS BIGINT)
                      / sqrt(CAST(c.norm2 * ce.cn AS DOUBLE)) DESC, ce.cent_id) AS r
    FROM (SELECT * FROM n2 WHERE vec_id NOT IN (0,1,2,3,4)) c CROSS JOIN cents ce
  ) WHERE r = 1
), probes AS (
  SELECT query_id, qq, qn, cent_id FROM (
    SELECT q.vec_id AS query_id, q.qv AS qq, q.norm2 AS qn, ce.cent_id,
           row_number() OVER (PARTITION BY q.vec_id
             ORDER BY CAST(list_dot_product(q.qv, ce.cq) AS BIGINT)
                      / sqrt(CAST(q.norm2 * ce.cn AS DOUBLE)) DESC, ce.cent_id) AS r
    FROM (SELECT * FROM n2 WHERE vec_id IN (0,1,2,3,4)) q CROSS JOIN cents ce
  ) WHERE r <= 4
)
SELECT query_id, rank, neighbor_id, score FROM (
  SELECT p.query_id, i.vec_id AS neighbor_id,
         CAST(list_dot_product(i.qv, p.qq) AS BIGINT)
           / sqrt(CAST(i.norm2 * p.qn AS DOUBLE)) AS score,
         CAST(row_number() OVER (PARTITION BY p.query_id
           ORDER BY CAST(list_dot_product(i.qv, p.qq) AS BIGINT)
                    / sqrt(CAST(i.norm2 * p.qn AS DOUBLE)) DESC, i.vec_id) AS INT) AS rank
  FROM inv i JOIN probes p ON i.cent_id = p.cent_id
) WHERE rank <= 10
"""


# ---------------------------------------------------------------------------
# S1: positional-grid standardization (the Excel pipeline, minus openpyxl)
# ---------------------------------------------------------------------------


def q_source_grid_standardize(spark, sf_dir):
    """S1/P3/P4: the reference's Excel raw-grid pipeline
    (header=None/dtype=str positional grid → empty-column prune →
    empty-row drop → 1-based renumber, repomix-output.xml:7262-7412) over
    a deterministically synthesized grid: g3 is all-blank by construction
    (prune target), every 97th row is fully blank (row-drop target),
    scattered ''/'nan'/'nat' cells elsewhere must survive. The engine
    derives the prune set from the DATA (readers.grid_standardize); the
    oracle knows it by construction."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    key = F.col("o_orderkey")
    allblank = key % 97 == 0
    g = o.select(
        F.when(allblank, F.lit("")).otherwise(key.cast("string")).alias("g1"),
        F.when(allblank | (key % 7 == 0), F.lit(""))
        .otherwise(F.col("o_orderpriority"))
        .alias("g2"),
        F.when(key % 3 == 0, F.lit(""))
        .when(key % 3 == 1, F.lit("nan"))
        .otherwise(F.lit("NaT"))
        .alias("g3"),
        F.when(allblank | (key % 11 == 0), F.lit("nan"))
        .otherwise(F.col("o_orderstatus"))
        .alias("g4"),
        F.when(allblank | (key % 13 == 0), F.lit("  "))
        .otherwise(F.date_format("o_orderdate", "yyyy-MM-dd"))
        .alias("g5"),
    )
    return readers.grid_standardize(g, structure="TABULAR")


SQL_SOURCE_GRID = """
WITH g AS (
  SELECT CASE WHEN o_orderkey % 97 = 0 THEN '' ELSE CAST(o_orderkey AS VARCHAR) END AS g1,
         CASE WHEN o_orderkey % 97 = 0 OR o_orderkey % 7 = 0 THEN '' ELSE o_orderpriority END AS g2,
         CASE WHEN o_orderkey % 97 = 0 OR o_orderkey % 11 = 0 THEN 'nan' ELSE o_orderstatus END AS g4,
         CASE WHEN o_orderkey % 97 = 0 OR o_orderkey % 13 = 0 THEN '  '
              ELSE strftime(o_orderdate, '%Y-%m-%d') END AS g5
  FROM orders WHERE o_orderkey < 2000
)
SELECT g1 AS c1, g2 AS c2, g4 AS c3, g5 AS c4
FROM g
WHERE replace(replace(replace(lower(g1 || g2 || g4 || g5), 'nan', ''), 'nat', ''), ' ', '') <> ''
"""


# ---------------------------------------------------------------------------
# dd_attribute_detail mapping: metadata-driven header→canonical columns
# ---------------------------------------------------------------------------


def q_grid_attribute_map(spark, sf_dir):
    """The reference's dynamic schema registry end-to-end
    (functions/attribute_map.py — dd_attribute_detail name/position
    matching, repomix-output.xml:7423-7549): a synthesized grid carries a
    messy header row ('Product  Name?' etc.) and a sub-header to skip;
    the attribute specs match by F1-normalized name (first spec via
    original_column_name, third via second_column_name), drop the junk
    column, start data at row 2, and cast the quantity (F15). The engine
    derives the header mapping from the DATA; the oracle knows it by
    construction."""
    from ..functions.attribute_map import AttributeSpec, apply_attribute_mapping

    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1500)
    idx = F.row_number().over(Window.orderBy("o_orderkey")) - 1
    w = o.select("o_orderkey", "o_orderpriority", "o_orderstatus", "o_totalprice",
                 idx.alias("row_idx"))
    grid = w.select(
        "row_idx",
        F.when(F.col("row_idx") == 0, F.lit("Product  Name?"))
        .when(F.col("row_idx") == 1, F.lit("---"))
        .otherwise(F.col("o_orderpriority"))
        .alias("c1"),
        F.when(F.col("row_idx") == 0, F.lit("Qty Available"))
        .when(F.col("row_idx") == 1, F.lit("---"))
        .otherwise(F.floor("o_totalprice").cast("long").cast("string"))
        .alias("c2"),
        F.when(F.col("row_idx") == 0, F.lit("REGION"))
        .when(F.col("row_idx") == 1, F.lit("---"))
        .otherwise(F.col("o_orderstatus"))
        .alias("c3"),
        F.when(F.col("row_idx") == 0, F.lit("Internal Use Only!"))
        .otherwise(F.lit("x"))
        .alias("c4"),
    )
    attrs = [
        AttributeSpec("PRODUCT_NAME", original_column_name="PRODUCT NAME",
                      starting_row=2, is_mandatory=True),
        AttributeSpec("AVAILABLE_QUANTITY", original_column_name="QTY_AVAILABLE",
                      starting_row=2, is_mandatory=True, type_ddl="bigint"),
        AttributeSpec("BRANCH_NAME", original_column_name="BOLGE",
                      second_column_name="Region", starting_row=2),
        AttributeSpec("DATA_DATE", original_column_name="TARIH"),  # unmatched, optional → null
    ]
    return apply_attribute_mapping(grid, attrs, structure="TABULAR")


SQL_GRID_ATTRIBUTE_MAP = """
WITH w AS (
  SELECT o_orderpriority, o_orderstatus, o_totalprice,
         row_number() OVER (ORDER BY o_orderkey) - 1 AS row_idx
  FROM orders WHERE o_orderkey < 1500
)
SELECT o_orderpriority AS PRODUCT_NAME,
       CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS BIGINT) AS AVAILABLE_QUANTITY,
       o_orderstatus AS BRANCH_NAME,
       CAST(NULL AS VARCHAR) AS DATA_DATE
FROM w WHERE row_idx >= 2
"""


EXT2_QUERIES: dict[str, tuple] = {
    "source_grid_standardize": (q_source_grid_standardize, SQL_SOURCE_GRID),
    "grid_attribute_map": (q_grid_attribute_map, SQL_GRID_ATTRIBUTE_MAP),
    "ann_ivf_topk": (q_ann_ivf_topk, SQL_ANN_IVF),
    "ann_kmeans_centroids": (q_ann_kmeans_centroids, SQL_ANN_KMEANS),
    "ann_ivf_kmeans_topk": (q_ann_ivf_kmeans_topk, SQL_ANN_IVF_KMEANS),
    "filter_junk_rows": (q_filter_junk_rows, SQL_FILTER_JUNK),
    "join_scalar_subquery": (q_join_scalar_subquery, SQL_JOIN_SCALAR_SUBQ),
    "agg_global_scalars": (q_agg_global_scalars, SQL_AGG_GLOBAL),
    "agg_null_profile": (q_agg_null_profile, SQL_AGG_NULL_PROFILE),
    "order_topk": (q_order_topk, SQL_ORDER_TOPK),
    "dedup_embedding_cosine": (q_dedup_embedding_cosine, SQL_DEDUP_EMB_COSINE),
    "source_csv_roundtrip": (q_source_csv_roundtrip, SQL_SOURCE_CSV),
}
