"""Vectorized validation of change-event payloads.

Re-expresses the reference's validators — required/null checks
(``/root/reference/src/validation/schema_validator.py:55-76``), numeric
consistency (``src/validation/data_validator.py:62-76``), categorical
whitelist (``src/validation/data_validator.py:79-84``,
``src/config/validation_config.py:25-27``) — over the token-table domain
with **no per-row Python** (north rule):

- :func:`validation_reason_pandas_udf` — the rule-mandated pandas/Arrow UDF
  path: token arrays arrive as one Arrow ``ListArray`` batch; the length
  check is ``pyarrow.compute.list_value_length`` (O(1) per batch on the
  offsets buffer, no element materialization).
- :func:`validation_reason_expr` — pure Catalyst column expression
  (``F.size`` / ``isin``), whole-stage-codegen'd; the fast path.

Both return the same reason string column (null = valid); tests assert
they agree bitwise and that both agree with the pure-Python oracle
(:func:`..cdc.oracle.validation_reason`). The engine defaults to the
expression path (JVM-side) and exposes the UDF path for parity/benchmark.

Reason precedence (must match the oracle): null_tokens → empty_tokens →
bad_n_tok → bad_source. Deletes carry no payload and are always valid.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf


def validation_reason_expr(
    op: Column, tokens: Column, n_tok: Column, source: Column, whitelist: list[str]
) -> Column:
    """Catalyst-native validation: returns reason string or null."""
    return (
        F.when(op == "delete", F.lit(None).cast("string"))
        .when(tokens.isNull(), F.lit("null_tokens"))
        .when(F.size(tokens) == 0, F.lit("empty_tokens"))
        .when(n_tok.isNull() | (n_tok != F.size(tokens)), F.lit("bad_n_tok"))
        .when(~source.isin(whitelist), F.lit("bad_source"))
        .otherwise(F.lit(None).cast("string"))
    )


def make_validation_reason_pandas_udf(whitelist: list[str]):
    """Arrow-vectorized validation UDF factory.

    Signature: (op, tokens, n_tok, source) -> reason string (null = valid).
    """
    wl = set(whitelist)

    @pandas_udf("string")
    def _reason(
        op: pd.Series, tokens: pd.Series, n_tok: pd.Series, source: pd.Series
    ) -> pd.Series:
        # Move the list column back into Arrow to use the offsets-buffer
        # length kernel instead of per-row Python len().
        arr = pa.array(tokens, type=pa.list_(pa.int32()))
        lengths = pc.list_value_length(arr).to_pandas()  # null where tokens null
        is_delete = op == "delete"
        null_tok = tokens.isna()
        empty_tok = lengths.eq(0).fillna(False)
        bad_n = n_tok.isna() | (n_tok != lengths)
        bad_src = ~source.isin(wl)
        out = pd.Series([None] * len(op), dtype="object")
        # precedence: later assignments must not overwrite earlier ones
        out = out.mask(bad_src, "bad_source")
        out = out.mask(bad_n, "bad_n_tok")
        out = out.mask(empty_tok, "empty_tokens")
        out = out.mask(null_tok, "null_tokens")
        out = out.mask(is_delete, None)
        return out

    return _reason


def split_valid_quarantine(df, whitelist: list[str], use_pandas_udf: bool = False):
    """Add a ``reason`` column and split into (valid, quarantine) frames.

    Single pass over the batch: the reason expression is computed once and
    the two outputs are complementary filters on it (the reference instead
    dropped invalid rows silently, ``repomix-output.xml:8519-8541``; the
    north rule requires a quarantine path — P8 in SURVEY.md §2.2).
    """
    if use_pandas_udf:
        fn = make_validation_reason_pandas_udf(whitelist)
        reasoned = df.withColumn(
            "reason", fn(F.col("op"), F.col("tokens"), F.col("n_tok"), F.col("source"))
        )
    else:
        reasoned = df.withColumn(
            "reason",
            validation_reason_expr(
                F.col("op"), F.col("tokens"), F.col("n_tok"), F.col("source"), whitelist
            ),
        )
    return reasoned.filter(F.col("reason").isNull()).drop("reason"), reasoned.filter(
        F.col("reason").isNotNull()
    )
