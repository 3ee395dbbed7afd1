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


TOKEN_QUERIES: dict[str, tuple] = {
    "tokens_chunk_windows": (q_tokens_chunk_windows, SQL_TOKENS_CHUNK),
    "tokens_vocab_topk": (q_tokens_vocab_topk, SQL_TOKENS_VOCAB),
    "tokens_hash_split": (q_tokens_hash_split, SQL_TOKENS_SPLIT),
}
