"""Extended operator-coverage queries: scalar-function batteries,
explode/fixed-width parsing, the dedup suite, similarity search, text
analysis, and multimodal plumbing. Same determinism rules as queries.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import dedup_text, multimodal, similarity, textstats
from .queries import cents, load

# ---------------------------------------------------------------------------
# Scalar-function batteries (F1-F28)
# ---------------------------------------------------------------------------


# One representative per format family (separator × year width × time
# granularity), incl. the monolith's no-separator extensions — each row
# synthesizes its string in one of these, the PARSER runs the full
# 54-format table.
_SYNTH_DATE_FORMATS = [
    "%Y-%m-%d %H%M%S", "%d-%m-%Y %H%M", "%m-%d-%Y",
    "%Y.%m.%d %H%M", "%d.%m.%Y", "%m.%d.%Y %H%M%S",
    "%Y%m%d%H%M%S", "%Y%m%d", "%d%m%Y%H%M", "%m%d%Y",
    "%d-%m-%y %H%M%S", "%y-%m-%d", "%m-%d-%y %H%M",
    "%d.%m.%y", "%y.%m.%d %H%M%S", "%m.%d.%y",
    "%y%m%d%H%M", "%d%m%y",
]


def q_scalar_dates(spark, sf_dir):
    """F10-F14: the reference's FULL multi-format date battery.

    F10: every row renders a timestamp in one of 18 format families
    (chosen by key), then the complete 54-format trial table
    (functions/dates.py — config/settings.py:16-71 plus the monolith's
    extension, repomix-output.xml:7195-7258) parses it back as ONE
    coalesce(try_to_timestamp×54) expression with the reference's
    first-match-wins trial order (date_utils.py:10-38), including its
    ambiguity resolution (a '%d%m%y' string parses as '%y%m%d' when both
    fit, because that's the order the table lists them) and POSIX
    century rules for %y. Also: last_day (F11), prev-month-end (F12, ref
    config/queries.py:19), yyyymmdd key (F13), range validation (F14).
    """
    from ..functions.dates import parse_any_ts, spark_pattern

    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 3000)
    ts = F.timestamp_add("SECOND", (F.col("o_orderkey") % 86399).cast("int"),
                         F.col("o_orderdate").cast("timestamp"))
    fmt_pick = F.col("o_orderkey") % len(_SYNTH_DATE_FORMATS)
    s = None
    for i, f in enumerate(_SYNTH_DATE_FORMATS):
        rendered = F.date_format(ts, spark_pattern(f))
        s = F.when(fmt_pick == i, rendered) if s is None else s.when(fmt_pick == i, rendered)
    parsed = parse_any_ts(s)
    return o.select(
        "o_orderkey",
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
        F.date_format(F.date_sub(F.trunc("o_orderdate", "month"), 1), "yyyy-MM-dd").alias(
            "prev_month_end"
        ),
        F.date_format("o_orderdate", "yyyyMMdd").alias("ymd"),
        F.col("o_orderdate").between(F.lit("1996-01-01"), F.lit("1999-12-31")).alias("in_range"),
        s.alias("rendered"),
        F.date_format(parsed, "yyyy-MM-dd HH:mm:ss").alias("parsed_roundtrip"),
    )


def _sql_scalar_dates() -> str:
    from ..functions.dates import duckdb_parse_any_sql

    synth = " ".join(
        f"WHEN {i} THEN strftime(ts, '{f}')" for i, f in enumerate(_SYNTH_DATE_FORMATS)
    )
    return f"""
SELECT o_orderkey,
       strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
       strftime(date_trunc('month', o_orderdate) - INTERVAL 1 DAY, '%Y-%m-%d') AS prev_month_end,
       strftime(o_orderdate, '%Y%m%d') AS ymd,
       o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1999-12-31' AS in_range,
       s AS rendered,
       strftime({duckdb_parse_any_sql("s")}, '%Y-%m-%d %H:%M:%S') AS parsed_roundtrip
FROM (
  SELECT *,
         CASE o_orderkey % {len(_SYNTH_DATE_FORMATS)} {synth} END AS s
  FROM (
    SELECT *, o_orderdate + (o_orderkey % 86399) * INTERVAL 1 SECOND AS ts
    FROM orders WHERE o_orderkey < 3000
  )
)
"""


SQL_SCALAR_DATES = _sql_scalar_dates()


def q_scalar_strings(spark, sf_dir):
    """F1/F2 name normalization, F5 extension extract, F6 XLS→XLSX, F7
    email-domain, F8 prefix-before-[-.], F9 lstrip-zeros, F28 İ→I fold
    (refs: transformers.py:22-44, config/queries.py:14-18,96-113,200,
    repomix-output.xml:8271-8274,8631)."""
    p = load(spark, sf_dir, "part")
    filename = F.concat(
        F.lower(F.col("p_brand")),
        F.when(F.col("p_size") % 3 == 0, F.lit(".xls"))
        .when(F.col("p_size") % 3 == 1, F.lit(".csv"))
        .otherwise(F.lit("")),
    )
    ext = F.when(
        filename.contains("."), F.upper(F.element_at(F.split(filename, "\\."), -1))
    ).otherwise(F.lit("EMPTY"))
    email = F.concat(F.lower("p_type"), F.lit("@"), F.lower("p_brand"), F.lit(".com"))
    return p.select(
        "p_partkey",
        F.upper(
            F.regexp_replace(F.regexp_replace(F.trim("p_name"), "[^A-Za-z0-9 ]", ""), " +", "_")
        ).alias("norm_name"),
        filename.alias("filename"),
        F.when(ext == "XLS", F.lit("XLSX")).otherwise(ext).alias("norm_ext"),
        F.regexp_replace(F.lpad(F.col("p_partkey").cast("string"), 8, "0"), "^0+", "").alias(
            "stripped_zeros"
        ),
        F.translate(F.concat(F.lit("İZMİR_"), F.col("p_brand")), "İ", "I").alias("turk_fold"),
        F.regexp_extract(email, "@([^.]+)", 1).alias("email_domain"),
        F.element_at(F.split(filename, "[-.#]"), 1).alias("prefix_key"),
    )


SQL_SCALAR_STRINGS = """
SELECT p_partkey,
       upper(regexp_replace(regexp_replace(trim(p_name), '[^A-Za-z0-9 ]', '', 'g'), ' +', '_', 'g')) AS norm_name,
       fn AS filename,
       CASE WHEN ext = 'XLS' THEN 'XLSX' ELSE ext END AS norm_ext,
       regexp_replace(lpad(CAST(p_partkey AS VARCHAR), 8, '0'), '^0+', '') AS stripped_zeros,
       translate('İZMİR_' || p_brand, 'İ', 'I') AS turk_fold,
       regexp_extract(lower(p_type) || '@' || lower(p_brand) || '.com', '@([^.]+)', 1) AS email_domain,
       string_split_regex(fn, '[-.#]')[1] AS prefix_key
FROM (
  SELECT *,
         lower(p_brand) || CASE p_size % 3 WHEN 0 THEN '.xls' WHEN 1 THEN '.csv' ELSE '' END AS fn,
         CASE WHEN (lower(p_brand) || CASE p_size % 3 WHEN 0 THEN '.xls' WHEN 1 THEN '.csv' ELSE '' END) LIKE '%.%'
              THEN upper(list_extract(string_split(lower(p_brand) || CASE p_size % 3 WHEN 0 THEN '.xls' WHEN 1 THEN '.csv' ELSE '' END, '.'),
                   len(string_split(lower(p_brand) || CASE p_size % 3 WHEN 0 THEN '.xls' WHEN 1 THEN '.csv' ELSE '' END, '.'))))
              ELSE 'EMPTY' END AS ext
  FROM part
)
"""


def q_scalar_numeric(spark, sf_dir):
    """F15-F24 numeric transforms: to-numeric+fillna, clip, returns split,
    ×1000 scaling, negation, category recode, branch concat, blocked sum,
    sentinel defaults (refs: transformations.py:14-109,
    repomix-output.xml:8956-8966,8038-8041,8655-8677,8621-8654)."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 500)
    qty = F.col("l_quantity").cast("long")
    signed = F.when(F.col("l_returnflag") == "R", -qty).otherwise(qty)
    cat = (
        F.when(F.col("l_linestatus") == "O", F.lit("PU"))
        .when(F.col("l_linestatus") == "F", F.lit("PR"))
        .otherwise(F.lit("GN"))
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        qty.alias("qty"),
        F.when(signed < 0, F.abs(signed)).otherwise(F.lit(0)).alias("return_qty"),
        F.greatest(signed, F.lit(0)).alias("sales_qty"),
        (qty * 1000).alias("scaled_qty"),
        (-qty).alias("neg_qty"),
        F.greatest(qty - 30, F.lit(0)).alias("clipped"),
        cat.alias("category"),
        F.concat_ws(
            " ", cat, F.when(F.col("l_returnflag") == "A", F.lit("KIZAD")).otherwise(F.lit("SHARJAH"))
        ).alias("branch"),
        (F.coalesce(qty, F.lit(0)) + F.coalesce(F.col("l_linenumber").cast("long"), F.lit(0))).alias(
            "blocked"
        ),
        F.coalesce(cents(F.col("l_tax")), F.lit(-1)).alias("tax_cents"),
    )


SQL_SCALAR_NUMERIC = """
SELECT l_orderkey, l_linenumber,
       CAST(l_quantity AS BIGINT) AS qty,
       CASE WHEN signed < 0 THEN abs(signed) ELSE 0 END AS return_qty,
       greatest(signed, 0) AS sales_qty,
       CAST(l_quantity AS BIGINT) * 1000 AS scaled_qty,
       -CAST(l_quantity AS BIGINT) AS neg_qty,
       greatest(CAST(l_quantity AS BIGINT) - 30, 0) AS clipped,
       cat AS category,
       cat || ' ' || CASE WHEN l_returnflag = 'A' THEN 'KIZAD' ELSE 'SHARJAH' END AS branch,
       COALESCE(CAST(l_quantity AS BIGINT), 0) + COALESCE(CAST(l_linenumber AS BIGINT), 0) AS blocked,
       COALESCE(CAST(FLOOR(l_tax*100 + 0.5) AS BIGINT), -1) AS tax_cents
FROM (
  SELECT *,
         CASE WHEN l_returnflag = 'R' THEN -CAST(l_quantity AS BIGINT) ELSE CAST(l_quantity AS BIGINT) END AS signed,
         CASE l_linestatus WHEN 'O' THEN 'PU' WHEN 'F' THEN 'PR' ELSE 'GN' END AS cat
  FROM lineitem WHERE l_orderkey < 500
)
"""


def q_explode_multivalue(spark, sf_dir):
    """F25/U1: multi-value cell → rows via posexplode, numeric kept only on
    the first copy (ref tilde explode, special_cases.py:176-217)."""
    p = load(spark, sf_dir, "part")
    ex = p.select(
        "p_partkey", "p_retailprice", F.posexplode(F.split("p_type", " ")).alias("pos", "word")
    )
    return ex.select(
        "p_partkey",
        "pos",
        "word",
        F.when(F.col("pos") == 0, cents(F.col("p_retailprice"))).otherwise(F.lit(0)).alias(
            "price_cents"
        ),
    )


SQL_EXPLODE = """
WITH base AS (SELECT p_partkey, p_retailprice, string_split(p_type, ' ') AS l FROM part),
ex AS (SELECT p_partkey, p_retailprice, l, unnest(range(1, len(l) + 1)) AS i FROM base)
SELECT p_partkey, CAST(i - 1 AS INT) AS pos, l[i] AS word,
       CASE WHEN i = 1 THEN CAST(FLOOR(p_retailprice*100 + 0.5) AS BIGINT) ELSE 0 END AS price_cents
FROM ex
"""


def q_fixed_width_parse(spark, sf_dir):
    """S9: fixed-width record synth + parse by byte ranges (ref 21-colspec
    fixed-width customer file, repomix-output.xml:8377-8411)."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    line = F.concat(
        F.lpad(F.col("o_orderkey").cast("string"), 10, "0"),
        F.rpad(F.col("o_orderstatus"), 2, "_"),
        F.lpad(F.floor(F.col("o_totalprice")).cast("long").cast("string"), 12, "0"),
        F.date_format("o_orderdate", "yyyyMMdd"),
    )
    w = o.select(line.alias("line"))
    return w.select(
        F.substring("line", 1, 10).cast("long").alias("rec_key"),
        F.trim(F.regexp_replace(F.substring("line", 11, 2), "_", " ")).alias("rec_status"),
        F.substring("line", 13, 12).cast("long").alias("rec_total"),
        F.substring("line", 25, 8).alias("rec_ymd"),
    )


SQL_FIXED_WIDTH = """
WITH w AS (
  SELECT lpad(CAST(o_orderkey AS VARCHAR), 10, '0')
         || rpad(o_orderstatus, 2, '_')
         || lpad(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 12, '0')
         || strftime(o_orderdate, '%Y%m%d') AS line
  FROM orders WHERE o_orderkey < 2000
)
SELECT CAST(substr(line, 1, 10) AS BIGINT) AS rec_key,
       trim(replace(substr(line, 11, 2), '_', ' ')) AS rec_status,
       CAST(substr(line, 13, 12) AS BIGINT) AS rec_total,
       substr(line, 25, 8) AS rec_ymd
FROM w
"""


# ---------------------------------------------------------------------------
# Dedup suite (documents)
# ---------------------------------------------------------------------------


def q_dedup_exact(spark, sf_dir):
    return dedup_text.exact_dup_groups(load(spark, sf_dir, "documents"), key_words=5)


SQL_DEDUP_EXACT = """
SELECT md5(array_to_string(string_split(text, ' ')[1:5], ' ')) AS dup_key,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(doc_id) AS BIGINT) AS keeper_doc
FROM documents GROUP BY 1 HAVING COUNT(*) > 1
"""

_SQL_SHINGLES = """
w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (SELECT doc_id,
              list_transform(range(1, greatest(len(w) - 2, 1) + 1),
                             i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) AS sh
       FROM w),
hs AS (SELECT doc_id, list_transform(sh, s -> md5(s)) AS hs FROM sh),
b AS (SELECT doc_id, hs, unnest([0, 1, 2, 3]) AS band FROM hs),
sig AS (SELECT doc_id, band,
               list_min(list_transform(hs, x -> substr(x, 1 + 8*band, 8))) AS sig
        FROM b),
bsize AS (SELECT band, sig, COUNT(*) AS c FROM sig GROUP BY 1, 2),
sigc AS (SELECT s.doc_id, s.band, s.sig FROM sig s
         JOIN bsize ON s.band = bsize.band AND s.sig = bsize.sig
         WHERE bsize.c BETWEEN 2 AND 1024)
"""


def q_dedup_minhash_lsh(spark, sf_dir):
    return dedup_text.minhash_lsh_candidates(load(spark, sf_dir, "documents"))


SQL_DEDUP_MINHASH = f"""
WITH {_SQL_SHINGLES}
SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b
FROM sigc a JOIN sigc b2 ON a.band = b2.band AND a.sig = b2.sig AND a.doc_id < b2.doc_id
"""


def q_dedup_ngram_jaccard(spark, sf_dir):
    return dedup_text.ngram_jaccard_pairs(load(spark, sf_dir, "documents"), threshold=0.4)


SQL_DEDUP_JACCARD = f"""
WITH {_SQL_SHINGLES},
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b
  FROM sigc a JOIN sigc b2 ON a.band = b2.band AND a.sig = b2.sig AND a.doc_id < b2.doc_id
),
ws AS (SELECT doc_id, list_distinct(w) AS ws FROM w)
SELECT doc_a, doc_b, j AS jaccard FROM (
  SELECT doc_a, doc_b,
         len(list_intersect(wa.ws, wb.ws)) /
         (len(wa.ws) + len(wb.ws) - len(list_intersect(wa.ws, wb.ws))) AS j
  FROM cand JOIN ws wa ON cand.doc_a = wa.doc_id
            JOIN ws wb ON cand.doc_b = wb.doc_id
) WHERE j >= 0.4
"""


def q_dedup_simhash(spark, sf_dir):
    return dedup_text.simhash16(load(spark, sf_dir, "documents"))


def _simhash_sql_bits() -> str:
    terms = []
    for b in range(16):
        cnt = (
            "len(list_filter(w, x -> "
            f"(instr('0123456789abcdef', substr(md5(x || ':' || '{b}'), 1, 1)) - 1) % 2 = 1))"
        )
        terms.append(f"(CASE WHEN 2 * ({cnt}) > len(w) THEN {1 << b} ELSE 0 END)")
    return " + ".join(terms)


SQL_DEDUP_SIMHASH = f"""
SELECT doc_id, CAST({_simhash_sql_bits()} AS BIGINT) AS simhash
FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
"""


def q_dedup_simhash_pairs(spark, sf_dir):
    """Band-rotated SimHash near-pair search (4 disjoint 4-bit bands →
    bucket equi-joins → exact popcount verify). The oracle is the
    BRUTE-FORCE all-pairs hamming join: by the pigeonhole guarantee
    (hamming ≤ 3 < 4 bands ⇒ some band agrees exactly) the banded plan
    must reproduce it bit-for-bit — so the oracle check also proves the
    banding loses no recall."""
    return dedup_text.simhash_near_pairs(load(spark, sf_dir, "documents"), max_hamming=3)


SQL_DEDUP_SIMHASH_PAIRS = f"""
WITH s AS (
  SELECT doc_id, CAST({_simhash_sql_bits()} AS BIGINT) AS simhash
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""


def q_dedup_simhash_wide_pairs(spark, sf_dir):
    """Production-width (60-bit) SimHash near-pair search: one md5 per
    word feeds the whole signature, 6 disjoint 10-bit bands gate
    candidates (pigeonhole-exact for hamming ≤ 5), exact popcount
    verifies. The oracle is again the brute-force all-pairs join over the
    wide signature — recall proof included."""
    return dedup_text.simhash_near_pairs(
        load(spark, sf_dir, "documents"),
        max_hamming=5,
        n_bands=6,
        bits=60,
        signature=dedup_text.simhash_wide,
    )


def _simhash_wide_sql_bits(bits: int = 60) -> str:
    terms = []
    for b in range(bits):
        dig = 1 + b // 4
        shift = 3 - (b % 4)
        cnt = (
            "len(list_filter(hs, h -> "
            f"((instr('0123456789abcdef', substr(h, {dig}, 1)) - 1) // {2 ** shift}) % 2 = 1))"
        )
        terms.append(f"(CASE WHEN 2 * ({cnt}) > len(hs) THEN {1 << b} ELSE 0 END)")
    return " + ".join(terms)


SQL_DEDUP_SIMHASH_WIDE = f"""
WITH s AS (
  SELECT doc_id, CAST({_simhash_wide_sql_bits()} AS BIGINT) AS simhash
  FROM (SELECT doc_id, list_transform(string_split(text, ' '), x -> md5(x)) AS hs
        FROM documents)
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 5
"""


# ---------------------------------------------------------------------------
# Similarity search (embeddings)
# ---------------------------------------------------------------------------

_QIDS = [0, 1, 2, 3, 4]


def q_ann_brute_topk(spark, sf_dir):
    return similarity.brute_force_topk(load(spark, sf_dir, "embeddings"), _QIDS, k=10)


SQL_ANN_BRUTE = """
WITH n AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(FLOOR(x*100 + 0.5) AS BIGINT)) AS qv
  FROM embeddings
), n2 AS (
  SELECT vec_id, qv, CAST(list_dot_product(qv, qv) AS BIGINT) AS norm2 FROM n
), s AS (
  SELECT qq.vec_id AS query_id, c.vec_id AS neighbor_id,
         CAST(list_dot_product(c.qv, qq.qv) AS BIGINT) AS dot,
         c.norm2 AS cn, qq.norm2 AS qn
  FROM n2 c, n2 qq
  WHERE qq.vec_id IN (0,1,2,3,4) AND c.vec_id NOT IN (0,1,2,3,4)
)
SELECT query_id, rank, neighbor_id, score FROM (
  SELECT query_id, neighbor_id,
         dot / sqrt(CAST(cn * qn AS DOUBLE)) AS score,
         CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY dot / sqrt(CAST(cn * qn AS DOUBLE)) DESC, neighbor_id) AS INT) AS rank
  FROM s
) WHERE rank <= 10
"""


def q_ann_lsh_pairs(spark, sf_dir):
    return similarity.lsh_bucketed_pairs(load(spark, sf_dir, "embeddings"), min_cosine=0.2)


SQL_ANN_LSH = """
WITH n AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(FLOOR(x*100 + 0.5) AS BIGINT)) AS qv
  FROM embeddings
), n2 AS (
  SELECT vec_id, qv, CAST(list_dot_product(qv, qv) AS BIGINT) AS norm2,
         (CASE WHEN qv[1] > 0 THEN '1' ELSE '0' END)
         || (CASE WHEN qv[9] > 0 THEN '1' ELSE '0' END)
         || (CASE WHEN qv[17] > 0 THEN '1' ELSE '0' END)
         || (CASE WHEN qv[25] > 0 THEN '1' ELSE '0' END)
         || (CASE WHEN qv[33] > 0 THEN '1' ELSE '0' END) AS bucket
  FROM n
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       CAST(list_dot_product(a.qv, b.qv) AS BIGINT)
         / sqrt(CAST(a.norm2 * b.norm2 AS DOUBLE)) AS score
FROM n2 a JOIN n2 b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE CAST(list_dot_product(a.qv, b.qv) AS BIGINT) > 0
  AND CAST(list_dot_product(a.qv, b.qv) AS BIGINT) * CAST(list_dot_product(a.qv, b.qv) AS BIGINT) * 10000
      >= 400 * a.norm2 * b.norm2
"""


# ---------------------------------------------------------------------------
# Text analysis (documents)
# ---------------------------------------------------------------------------


def q_text_quality(spark, sf_dir):
    return textstats.quality_stats(load(spark, sf_dir, "documents"))


SQL_TEXT_QUALITY = """
SELECT doc_id,
       CAST(len(w) AS BIGINT) AS n_words,
       CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct,
       CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_alpha_chars,
       CAST(len(list_filter(w, x -> x IN ('the','a','of','and','to'))) AS BIGINT) AS n_stopwords,
       CAST(len(list_distinct(w)) AS BIGINT) / CAST(len(w) AS BIGINT) AS ttr,
       CAST(length(replace(text, ' ', '')) AS BIGINT) / CAST(len(w) AS BIGINT) AS avg_word_len,
       CAST(len(list_filter(w, x -> x IN ('the','a','of','and','to'))) AS BIGINT) / CAST(len(w) AS BIGINT) AS stopword_ratio
FROM (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents)
"""


def q_text_langid(spark, sf_dir):
    return textstats.langid(load(spark, sf_dir, "documents"))


SQL_TEXT_LANGID = """
SELECT doc_id, lang,
       CAST(len(list_filter(w, x -> x IN ('the','a','and'))) AS BIGINT) AS en_score,
       CASE WHEN len(list_filter(w, x -> x IN ('the','a','and'))) > 0 THEN 'en' ELSE 'unk' END AS predicted_lang
FROM (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents)
"""


def q_text_tokens(spark, sf_dir):
    return textstats.token_counts(load(spark, sf_dir, "documents"))


SQL_TEXT_TOKENS = """
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
       CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS BIGINT) AS regex_tokens,
       CAST(ceil(length(text) / 4) AS BIGINT) AS bpe_est_tokens
FROM documents
"""


def q_text_fingerprint(spark, sf_dir):
    return textstats.fingerprints(load(spark, sf_dir, "documents"))


SQL_TEXT_FINGERPRINT = """
SELECT doc_id, md5(text) AS content_md5,
       list_min(list_transform(
         list_transform(range(1, greatest(len(w) - 1, 1) + 1),
                        i -> w[i] || ' ' || w[i+1]),
         s -> md5(s))) AS min_bigram_hash
FROM (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents)
"""


_REP_N = 3


def q_text_repetition(spark, sf_dir):
    """Gopher-style intra-doc repetition profile: duplicate n-gram
    fraction per document, exact-integer permille (two-level hash agg —
    (doc, gram) partial counts, then a per-doc rollup)."""
    return textstats.repetition_stats(load(spark, sf_dir, "documents"), n=_REP_N)


SQL_TEXT_REPETITION = f"""
WITH g AS (
  SELECT doc_id,
         unnest(list_transform(
           range(1, len(w) - {_REP_N - 1} + 1),
           i -> md5(concat_ws(' ', {", ".join(f"w[i + {k}]" for k in range(_REP_N))}))
         )) AS gram
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
  WHERE len(w) >= {_REP_N}
),
per AS (SELECT doc_id, gram, count(*) AS occ FROM g GROUP BY 1, 2)
SELECT doc_id,
       CAST(sum(occ) AS BIGINT) AS n_grams,
       CAST(count(*) AS BIGINT) AS n_distinct,
       CAST(max(occ) AS BIGINT) AS max_occ,
       CAST((sum(occ) - count(*)) * 1000 // sum(occ) AS BIGINT) AS dup_permille
FROM per GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# Multimodal plumbing — fully oracle-checked: the mapInPandas kernel is a
# deterministic md5-derived stub (operators/multimodal.py), and DuckDB has
# md5(), so the Arrow plumbing's OUTPUT is SQL-expressible even though the
# plan itself (ArrowEvalPython) is not. The oracle reproduces the stub's
# seed arithmetic: seed = int(md5(payload)[:8], 16).
# ---------------------------------------------------------------------------


def q_multimodal_decode(spark, sf_dir):
    """Multimodal decode plumbing (mapInPandas, Arrow-batched): aggregates
    include the stub kernel's derived metadata (width/height/n_frames), so
    the oracle checks the batch kernel's actual output, not just row
    plumbing."""
    docs = load(spark, sf_dir, "documents")
    meta = multimodal.decode_media(multimodal.synth_media_from_documents(docs))
    return meta.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("byte_len").alias("total_bytes"),
        F.countDistinct("content_hash").alias("n_distinct_payloads"),
        F.sum(F.col("width").cast("long")).alias("sum_width"),
        F.sum(F.col("height").cast("long")).alias("sum_height"),
        F.sum(F.col("n_frames").cast("long")).alias("sum_frames"),
    )


# seed = int(md5(payload)[:8], 16), as portable SQL over the hex digits
_SQL_MD5_SEED = (
    "("
    + " + ".join(
        f"(instr('0123456789abcdef', substr(h, {i + 1}, 1)) - 1) * {16 ** (7 - i)}"
        for i in range(8)
    )
    + ")"
)

_SQL_MEDIA = f"""
m AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio'
              ELSE 'video' END AS media_type,
         octet_length(encode(text)) AS byte_len,
         md5(text) AS h
  FROM documents
),
meta AS (
  SELECT doc_id, media_type, byte_len, h AS content_hash,
         CASE media_type WHEN 'image' THEN 64 + seed % 1024
                         WHEN 'video' THEN 320 ELSE 0 END AS width,
         CASE media_type WHEN 'image' THEN 64 + (seed // 16) % 1024
                         WHEN 'video' THEN 240 ELSE 0 END AS height,
         CASE media_type WHEN 'image' THEN 1
                         WHEN 'video' THEN 1 + seed % 300
                         ELSE 1 + seed % 48000 END AS n_frames
  FROM (SELECT *, {_SQL_MD5_SEED} AS seed FROM m)
)
"""

SQL_MULTIMODAL_DECODE = f"""
WITH {_SQL_MEDIA}
SELECT media_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(byte_len) AS BIGINT) AS total_bytes,
       CAST(COUNT(DISTINCT content_hash) AS BIGINT) AS n_distinct_payloads,
       CAST(SUM(width) AS BIGINT) AS sum_width,
       CAST(SUM(height) AS BIGINT) AS sum_height,
       CAST(SUM(n_frames) AS BIGINT) AS sum_frames
FROM meta GROUP BY 1
"""


def q_multimodal_frame_sample(spark, sf_dir):
    """Frame sampling over decoded video metadata (sequence + explode,
    executor-side fan-out); per-doc sampled-frame counts are
    oracle-checked against the stub's n_frames arithmetic."""
    docs = load(spark, sf_dir, "documents")
    meta = multimodal.decode_media(multimodal.synth_media_from_documents(docs))
    frames = multimodal.frame_sample(meta, every_n=10)
    return frames.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sampled_frames"))


SQL_MULTIMODAL_FRAMES = f"""
WITH {_SQL_MEDIA}
SELECT doc_id,
       CAST((n_frames - 1) // 10 + 1 AS BIGINT) AS n_sampled_frames
FROM meta WHERE media_type = 'video'
"""


EXT_QUERIES: dict[str, tuple] = {
    "scalar_dates": (q_scalar_dates, SQL_SCALAR_DATES),
    "scalar_strings": (q_scalar_strings, SQL_SCALAR_STRINGS),
    "scalar_numeric": (q_scalar_numeric, SQL_SCALAR_NUMERIC),
    "explode_multivalue": (q_explode_multivalue, SQL_EXPLODE),
    "fixed_width_parse": (q_fixed_width_parse, SQL_FIXED_WIDTH),
    "dedup_exact": (q_dedup_exact, SQL_DEDUP_EXACT),
    "dedup_minhash_lsh": (q_dedup_minhash_lsh, SQL_DEDUP_MINHASH),
    "dedup_ngram_jaccard": (q_dedup_ngram_jaccard, SQL_DEDUP_JACCARD),
    "dedup_simhash": (q_dedup_simhash, SQL_DEDUP_SIMHASH),
    "dedup_simhash_pairs": (q_dedup_simhash_pairs, SQL_DEDUP_SIMHASH_PAIRS),
    "dedup_simhash_wide_pairs": (q_dedup_simhash_wide_pairs, SQL_DEDUP_SIMHASH_WIDE),
    "ann_brute_topk": (q_ann_brute_topk, SQL_ANN_BRUTE),
    "ann_lsh_pairs": (q_ann_lsh_pairs, SQL_ANN_LSH),
    "text_quality": (q_text_quality, SQL_TEXT_QUALITY),
    "text_langid": (q_text_langid, SQL_TEXT_LANGID),
    "text_tokens": (q_text_tokens, SQL_TEXT_TOKENS),
    "text_fingerprint": (q_text_fingerprint, SQL_TEXT_FINGERPRINT),
    "text_repetition": (q_text_repetition, SQL_TEXT_REPETITION),
    "multimodal_decode": (q_multimodal_decode, SQL_MULTIMODAL_DECODE),
    "multimodal_frame_sample": (q_multimodal_frame_sample, SQL_MULTIMODAL_FRAMES),
}
