"""Registry entries for the token-sequence training-data operators
(operators/tokenize.py): context-window chunking, vocabulary top-k, and
deterministic hash splits.

Token ids are substring(md5(word), 1, 8) — computed from the SAME
expression text in Spark and DuckDB, so every op is bitwise
oracle-checkable. The chunking oracle relies on DuckDB zipping
same-level unnest() calls positionally (token list zipped with its
1-based index series); division in the chunk-id expression is exact
(window starts are 1 + c*stride by construction) so `//` vs `/`-
then-cast can never disagree.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import tokenize
from .queries import load

_MAX_LEN = 32
_STRIDE = 24
_TOPK = 100

_SQL_TOKS = (
    "SELECT doc_id, list_transform(string_split(text, ' '),"
    " x -> substring(md5(x), 1, 8)) AS toks FROM documents"
)


def q_tokens_chunk_windows(spark, sf_dir):
    """Overlapping context windows, fully exploded to
    (doc_id, chunk_id, pos, token) scalar rows. Narrow per-row work:
    both explodes run inside one whole-stage-codegen span with no
    shuffle — the map stage of a sequence-packing pipeline."""
    return tokenize.chunk_tokens(
        load(spark, sf_dir, "documents"), max_len=_MAX_LEN, stride=_STRIDE
    )


SQL_TOKENS_CHUNK = f"""
WITH t AS ({_SQL_TOKS}),
st AS (
  SELECT doc_id, toks, unnest(range(1, len(toks) + 1, {_STRIDE})) AS s FROM t
),
sl AS (
  SELECT doc_id, CAST((s - 1) // {_STRIDE} AS INT) AS chunk_id,
         list_slice(toks, s, s + {_MAX_LEN} - 1) AS win
  FROM st
)
SELECT doc_id, chunk_id,
       CAST(unnest(generate_series(1, len(win))) - 1 AS INT) AS pos,
       unnest(win) AS token
FROM sl
"""


def q_tokens_vocab_topk(spark, sf_dir):
    """Top-k vocabulary frequencies: partial-agg (token,count) shuffle,
    then TakeOrderedAndProject — no global sort of the vocabulary."""
    return tokenize.vocab_topk(load(spark, sf_dir, "documents"), k=_TOPK)


SQL_TOKENS_VOCAB = f"""
WITH t AS ({_SQL_TOKS}),
c AS (
  SELECT token, CAST(count(*) AS BIGINT) AS n_occ
  FROM (SELECT unnest(toks) AS token FROM t)
  GROUP BY token
),
top AS (SELECT token, n_occ FROM c ORDER BY n_occ DESC, token LIMIT {_TOPK})
SELECT CAST(row_number() OVER (ORDER BY n_occ DESC, token) AS INT) AS rank,
       token, n_occ
FROM top
"""


def q_tokens_hash_split(spark, sf_dir):
    """Deterministic 98/1/1 train/val/test assignment — a stateless
    projection (no shuffle); a doc's split is a pure function of
    (doc_id, salt), stable under corpus growth and re-runs."""
    return tokenize.hash_split(load(spark, sf_dir, "documents"))


_BUCKET = tokenize.split_bucket_sql("doc_id", "split-v1")

SQL_TOKENS_SPLIT = f"""
SELECT doc_id,
       CASE WHEN b < 98 THEN 'train' WHEN b < 99 THEN 'val' ELSE 'test' END AS split
FROM (SELECT doc_id, CAST({_BUCKET} AS INT) AS b FROM documents)
"""


# the operator's production default is 8-word grams; the registry runs at
# n=3 so the sf0.01 synthetic corpus (whose duplicates are short-span)
# actually produces cross-split overlap — a 0-row gate proves nothing
_N_GRAM = 3

# distinct n-word-gram md5s per doc, with the split bucket inline; docs
# shorter than n words contribute no grams (range(1,1) is empty) — the
# same rule as the Spark side's size(w) >= n filter
_SQL_GRAMS = f"""
g AS (
  SELECT doc_id, CAST({_BUCKET} AS INT) AS b,
         unnest(list_distinct(list_transform(
           range(1, greatest(len(w) - {_N_GRAM - 1}, 0) + 1),
           i -> md5(concat_ws(' ', {", ".join(f"w[i + {k}]" for k in range(_N_GRAM))}))
         ))) AS gram
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
)
"""


def q_tokens_contamination(spark, sf_dir):
    """Train/eval decontamination scan: shared distinct n-gram counts per
    (train doc, eval doc) pair — eval gram set broadcast, train side a
    single scan + partial-agg groupBy."""
    return tokenize.contamination_pairs(load(spark, sf_dir, "documents"), n=_N_GRAM)


SQL_TOKENS_CONTAM = f"""
WITH {_SQL_GRAMS}
SELECT t.doc_id AS train_doc, e.doc_id AS eval_doc,
       CAST(count(*) AS BIGINT) AS n_shared
FROM g t JOIN g e ON t.gram = e.gram
WHERE t.b < {tokenize.TRAIN_PCT} AND e.b >= {tokenize.TRAIN_PCT}
GROUP BY 1, 2
"""


def q_tokens_clean_train(spark, sf_dir):
    """Decontaminated train roster: train docs sharing no n-gram with any
    eval doc (anti-join over the contamination scan)."""
    return tokenize.decontaminate(load(spark, sf_dir, "documents"), n=_N_GRAM)


SQL_TOKENS_CLEAN = f"""
WITH {_SQL_GRAMS},
dirty AS (
  SELECT DISTINCT t.doc_id FROM g t JOIN g e ON t.gram = e.gram
  WHERE t.b < {tokenize.TRAIN_PCT} AND e.b >= {tokenize.TRAIN_PCT}
)
SELECT doc_id
FROM (SELECT doc_id, CAST({_BUCKET} AS INT) AS b FROM documents)
WHERE b < {tokenize.TRAIN_PCT} AND doc_id NOT IN (SELECT doc_id FROM dirty)
"""


_CAPACITY = 64
_N_SHARDS = 8
_PACK_BUCKET = tokenize.split_bucket_sql("doc_id", "pack-v1")


def q_tokens_pack_examples(spark, sf_dir):
    """Offset-based sequence packing: per-example chunk/doc/token stats.
    Chunk lengths are arithmetic on size(split(text)) — token arrays are
    never exploded; the only shuffle is the per-shard window sort."""
    return tokenize.pack_examples(
        load(spark, sf_dir, "documents"),
        max_len=_MAX_LEN,
        stride=_STRIDE,
        capacity=_CAPACITY,
        n_shards=_N_SHARDS,
    )


SQL_TOKENS_PACK = f"""
WITH base AS (
  SELECT doc_id, CAST(({_PACK_BUCKET}) % {_N_SHARDS} AS INT) AS shard,
         len(string_split(text, ' ')) AS n
  FROM documents
),
ch AS (
  SELECT doc_id, shard, CAST((s - 1) // {_STRIDE} AS INT) AS chunk_id,
         least({_MAX_LEN}, n - s + 1) AS n_tok
  FROM (SELECT doc_id, shard, n, unnest(range(1, n + 1, {_STRIDE})) AS s FROM base)
),
offs AS (
  SELECT shard, doc_id, n_tok,
         CAST((sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id, chunk_id)
               - n_tok) // {_CAPACITY} AS INT) AS example_id
  FROM ch
)
SELECT shard, example_id, CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS n_tokens
FROM offs GROUP BY shard, example_id
"""


def q_tokens_mixture_weights(spark, sf_dir):
    """Training-mixture composition per source: doc/token counts plus the
    source's exact-integer ppm share of the token budget (one scan, one
    tiny-side broadcast for the grand total)."""
    return tokenize.mixture_weights(load(spark, sf_dir, "documents"))


SQL_TOKENS_MIXTURE = """
WITH per AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
)
SELECT source, n_docs, n_tokens,
       CAST(n_tokens * 1000000 // (SELECT sum(n_tokens) FROM per) AS BIGINT)
         AS weight_ppm
FROM per
"""


def q_tokens_pack_payload(spark, sf_dir):
    """Materialized packing: per-example token-stream fingerprint (md5 of
    the packed order) — proves the byte layout, not just the assignment;
    collect buffers bounded by the example capacity."""
    return tokenize.pack_payload(
        load(spark, sf_dir, "documents"),
        max_len=_MAX_LEN,
        stride=_STRIDE,
        capacity=_CAPACITY,
        n_shards=_N_SHARDS,
    )


SQL_TOKENS_PAYLOAD = f"""
WITH t AS (
  SELECT doc_id, CAST(({_PACK_BUCKET}) % {_N_SHARDS} AS INT) AS shard,
         list_transform(string_split(text, ' '),
                        x -> substring(md5(x), 1, 8)) AS toks
  FROM documents
),
ch AS (
  SELECT doc_id, shard, CAST((s - 1) // {_STRIDE} AS INT) AS chunk_id,
         list_slice(toks, s, s + {_MAX_LEN} - 1) AS win
  FROM (SELECT doc_id, shard, toks,
               unnest(range(1, len(toks) + 1, {_STRIDE})) AS s FROM t)
),
offs AS (
  SELECT shard, doc_id, chunk_id, win, len(win) AS n_tok,
         CAST((sum(len(win)) OVER (PARTITION BY shard ORDER BY doc_id, chunk_id)
               - len(win)) // {_CAPACITY} AS INT) AS example_id
  FROM ch
)
SELECT shard, example_id,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS n_tokens,
       md5(array_to_string(flatten(list(win ORDER BY doc_id, chunk_id)), ' '))
         AS example_md5
FROM offs GROUP BY shard, example_id
"""


def q_tokens_shard_order(spark, sf_dir):
    """Deterministic global shuffle of the corpus into 16 shards with a
    reproducible within-shard order (operators/tokenize.py shard_order):
    one hash-partition shuffle + per-shard sort, the exact plan a
    shard-file writer needs."""
    return tokenize.shard_order(load(spark, sf_dir, "documents"), n_shards=16)


# the shard expression is BUILT from the same helper the operator uses,
# so the Spark plan and the oracle can never drift
SQL_TOKENS_SHARD = f"""
WITH h AS (
  SELECT doc_id,
         md5(concat_ws(':', CAST(doc_id AS VARCHAR), 'shuffle-v1')) AS h
  FROM documents
), s AS (
  SELECT doc_id, h,
         CAST({tokenize.hex_mod_sql('h', 6, 16)} AS INTEGER) AS shard
  FROM h
)
SELECT shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY h, doc_id)
            AS BIGINT) AS pos,
       doc_id
FROM s
"""


TOKEN_QUERIES: dict[str, tuple] = {
    "tokens_shard_order": (q_tokens_shard_order, SQL_TOKENS_SHARD),
    "tokens_mixture_weights": (q_tokens_mixture_weights, SQL_TOKENS_MIXTURE),
    "tokens_pack_payload": (q_tokens_pack_payload, SQL_TOKENS_PAYLOAD),
    "tokens_chunk_windows": (q_tokens_chunk_windows, SQL_TOKENS_CHUNK),
    "tokens_vocab_topk": (q_tokens_vocab_topk, SQL_TOKENS_VOCAB),
    "tokens_hash_split": (q_tokens_hash_split, SQL_TOKENS_SPLIT),
    "tokens_contamination": (q_tokens_contamination, SQL_TOKENS_CONTAM),
    "tokens_clean_train": (q_tokens_clean_train, SQL_TOKENS_CLEAN),
    "tokens_pack_examples": (q_tokens_pack_examples, SQL_TOKENS_PACK),
}


def q_tokens_dup_spans(spark, sf_dir):
    """Cross-document duplicate n-gram spans (ExactSubstr shape): the
    position stream shuffles 8-byte xxhash64 keys, never W-word strings;
    only hashes hot across >= 2 docs gate the exact gram aggregate
    (collision-proof: min_docs is re-applied on exact counts)."""
    return tokenize.dup_spans(load(spark, sf_dir, "documents"), n=6, k=100)


# The oracle groups gram text directly (DuckDB has no xxhash64); the
# hash gate is a pure filter on the Spark side, so both produce the
# identical exact (gram, n_docs, n_occ) relation. (n_occ DESC, gram) is
# a total order — gram is the group key — so LIMIT is deterministic.
SQL_TOKENS_DUP_SPANS = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), g AS (
  SELECT doc_id, array_to_string(list_slice(w, s, s + 5), ' ') AS gram
  FROM (
    SELECT doc_id, w, unnest(range(1, len(w) - 4)) AS s
    FROM t WHERE len(w) >= 6
  )
), c AS (
  SELECT gram,
         COUNT(DISTINCT doc_id) AS n_docs,
         COUNT(*) AS n_occ
  FROM g GROUP BY gram
)
SELECT gram, n_docs, n_occ FROM c WHERE n_docs >= 2
ORDER BY n_occ DESC, gram LIMIT 100
"""

TOKEN_QUERIES["tokens_dup_spans"] = (q_tokens_dup_spans, SQL_TOKENS_DUP_SPANS)


def q_tokens_strip_dup_spans(spark, sf_dir):
    """Repeated-span removal stats (the ExactSubstr corrective action):
    every non-first occurrence of a repeated n-gram is masked; per-doc
    exact damage stats via row-local span->position explode + distinct
    hash-agg. Same 8-byte hash gate as tokens_dup_spans."""
    return tokenize.strip_dup_spans(load(spark, sf_dir, "documents"), n=6, k=500)


# Positions are 0-based in Spark (posexplode) and 1-based here; they are
# internal only — keeper order and span-overlap geometry are translation-
# invariant, so the output relation is identical.
SQL_TOKENS_STRIP_SPANS = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), b AS (
  SELECT doc_id, w, len(w) AS n_words FROM t
), g AS (
  SELECT doc_id, n_words, s AS pos,
         array_to_string(list_slice(w, s, s + 5), ' ') AS gram
  FROM (
    SELECT doc_id, n_words, w, unnest(range(1, n_words - 4)) AS s
    FROM b WHERE n_words >= 6
  )
), rep AS (
  SELECT gram FROM g GROUP BY gram HAVING COUNT(*) >= 2
), mk AS (
  SELECT g.doc_id, g.n_words, g.pos,
         ROW_NUMBER() OVER (PARTITION BY g.gram ORDER BY g.doc_id, g.pos) AS rn
  FROM g JOIN rep USING (gram)
), cov AS (
  SELECT doc_id, n_words, pos, unnest(range(pos, pos + 6)) AS wpos
  FROM mk WHERE rn > 1
)
SELECT doc_id, CAST(n_words AS INT) AS n_words,
       COUNT(DISTINCT pos) AS n_spans_masked,
       COUNT(DISTINCT wpos) AS n_words_masked
FROM cov GROUP BY doc_id, n_words
ORDER BY n_words_masked DESC, doc_id LIMIT 500
"""

TOKEN_QUERIES["tokens_strip_dup_spans"] = (
    q_tokens_strip_dup_spans,
    SQL_TOKENS_STRIP_SPANS,
)


def q_tokens_strip_dup_spans_rewrite(spark, sf_dir):
    """The rewritten corpus (the Lee-et-al corrective ACTION a training
    pipeline consumes): affected docs with masked-span words removed and
    the remainder re-joined. Same hash gate + two-phase keeper election
    as tokens_strip_dup_spans; per-doc masks hash-aggregate row-bounded
    position sets, the rewrite is one row-local array filter."""
    return tokenize.strip_dup_spans_rewrite(
        load(spark, sf_dir, "documents"), n=6, k=500
    )


# Positions 0-based in Spark, 1-based here — internal only (keeper order,
# span geometry, and word membership are translation-invariant). The
# rebuild re-explodes affected docs' words with positions, anti-joins the
# covered set, and string_aggs back in position order; a fully-masked doc
# yields '' on both engines (Spark: filter -> empty array -> concat_ws;
# here: no kept rows -> COALESCE). (n_words_masked DESC, doc_id) is a
# total order — doc_id is unique.
SQL_TOKENS_STRIP_SPANS_REWRITE = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), b AS (
  SELECT doc_id, w, len(w) AS n_words FROM t
), g AS (
  SELECT doc_id, n_words, s AS pos,
         array_to_string(list_slice(w, s, s + 5), ' ') AS gram
  FROM (
    SELECT doc_id, n_words, w, unnest(range(1, n_words - 4)) AS s
    FROM b WHERE n_words >= 6
  )
), rep AS (
  SELECT gram FROM g GROUP BY gram HAVING COUNT(*) >= 2
), mk AS (
  SELECT g.doc_id, g.n_words, g.pos,
         ROW_NUMBER() OVER (PARTITION BY g.gram ORDER BY g.doc_id, g.pos) AS rn
  FROM g JOIN rep USING (gram)
), cov AS (
  SELECT DISTINCT doc_id, n_words, wpos FROM (
    SELECT doc_id, n_words, unnest(range(pos, pos + 6)) AS wpos
    FROM mk WHERE rn > 1
  )
), stats AS (
  SELECT doc_id, n_words, CAST(COUNT(*) AS BIGINT) AS n_words_masked
  FROM cov GROUP BY doc_id, n_words
), wp AS (
  SELECT doc_id, unnest(range(1, n_words + 1)) AS wpos, unnest(w) AS word
  FROM (SELECT b.doc_id, b.w, b.n_words FROM b JOIN stats USING (doc_id))
), kept AS (
  SELECT wp.doc_id, wp.wpos, wp.word
  FROM wp ANTI JOIN cov ON wp.doc_id = cov.doc_id AND wp.wpos = cov.wpos
), rebuilt AS (
  SELECT doc_id, string_agg(word, ' ' ORDER BY wpos) AS clean_text
  FROM kept GROUP BY doc_id
)
SELECT s.doc_id, CAST(s.n_words AS INT) AS n_words, s.n_words_masked,
       COALESCE(r.clean_text, '') AS clean_text
FROM stats s LEFT JOIN rebuilt r USING (doc_id)
ORDER BY n_words_masked DESC, s.doc_id LIMIT 500
"""

TOKEN_QUERIES["tokens_strip_dup_spans_rewrite"] = (
    q_tokens_strip_dup_spans_rewrite,
    SQL_TOKENS_STRIP_SPANS_REWRITE,
)


def q_tokens_token_span_rewrite(spark, sf_dir):
    """The corrective rewrite in the engine's NATIVE payload domain — a
    token-ARRAY column instead of whitespace text (the same function the
    CDC corrective loop applies to the lake table's own state,
    tests/test_cdc_dedup_correct.py): repeated n-token spans masked
    (two-phase keeper election), affected rows rebuilt by a row-local
    typed-array filter. Token ids are the engine-portable md5 mapping,
    so the oracle applies the identical mapping; clean arrays compare as
    space-joined strings."""
    t = tokenize.tokenized(load(spark, sf_dir, "documents"))
    out = tokenize.strip_dup_token_spans_rewrite(t, col="toks", n=6, k=500)
    return out.select(
        "doc_id",
        "n_tok",
        "n_tok_masked",
        F.concat_ws(" ", "clean_tokens").alias("clean_tokens_str"),
    )


# Same shape as SQL_TOKENS_STRIP_SPANS_REWRITE but over the md5 token-id
# array (list_transform == tokenize.tokenized's TOKEN expr) with
# ':'-joined grams — gram identity equals token-slice identity because
# the 8-hex ids contain no ':'.
SQL_TOKENS_TOKEN_SPAN_REWRITE = """
WITH t AS (
  SELECT doc_id,
         list_transform(string_split(text, ' '),
                        x -> substring(md5(x), 1, 8)) AS w
  FROM documents
), b AS (
  SELECT doc_id, w, len(w) AS n_words FROM t
), g AS (
  SELECT doc_id, n_words, s AS pos,
         array_to_string(list_slice(w, s, s + 5), ':') AS gram
  FROM (
    SELECT doc_id, n_words, w, unnest(range(1, n_words - 4)) AS s
    FROM b WHERE n_words >= 6
  )
), rep AS (
  SELECT gram FROM g GROUP BY gram HAVING COUNT(*) >= 2
), mk AS (
  SELECT g.doc_id, g.n_words, g.pos,
         ROW_NUMBER() OVER (PARTITION BY g.gram ORDER BY g.doc_id, g.pos) AS rn
  FROM g JOIN rep USING (gram)
), cov AS (
  SELECT DISTINCT doc_id, n_words, wpos FROM (
    SELECT doc_id, n_words, unnest(range(pos, pos + 6)) AS wpos
    FROM mk WHERE rn > 1
  )
), stats AS (
  SELECT doc_id, n_words, CAST(COUNT(*) AS BIGINT) AS n_tok_masked
  FROM cov GROUP BY doc_id, n_words
), wp AS (
  SELECT doc_id, unnest(range(1, n_words + 1)) AS wpos, unnest(w) AS word
  FROM (SELECT b.doc_id, b.w, b.n_words FROM b JOIN stats USING (doc_id))
), kept AS (
  SELECT wp.doc_id, wp.wpos, wp.word
  FROM wp ANTI JOIN cov ON wp.doc_id = cov.doc_id AND wp.wpos = cov.wpos
), rebuilt AS (
  SELECT doc_id, string_agg(word, ' ' ORDER BY wpos) AS clean_tokens_str
  FROM kept GROUP BY doc_id
)
SELECT s.doc_id, CAST(s.n_words AS INT) AS n_tok, s.n_tok_masked,
       COALESCE(r.clean_tokens_str, '') AS clean_tokens_str
FROM stats s LEFT JOIN rebuilt r USING (doc_id)
ORDER BY n_tok_masked DESC, s.doc_id LIMIT 500
"""

TOKEN_QUERIES["tokens_token_span_rewrite"] = (
    q_tokens_token_span_rewrite,
    SQL_TOKENS_TOKEN_SPAN_REWRITE,
)
