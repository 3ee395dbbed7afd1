"""Change-event model + deterministic generators.

The change stream generalizes the reference's ``daq_log_info`` file-arrival
log (``/root/reference/config/queries.py:6-45``): monotone ``id`` →
``lsn``; one row per change; ``max(id)``-per-key last-writer-wins;
``is_processed`` watermark → checkpoint manifest.

Two generators:

- :func:`generate_events` — pure Python, seeded, used by unit tests and the
  dict-replay oracle (no Spark dependency).
- :func:`spark_generate_events` — Spark-native (``spark.range`` + column
  expressions, deterministic in the row id), used by the benchmark so that
  10^7+ events are produced executor-side without materializing anything on
  the driver. Both produce the same *distributional* shape; only the pure
  Python one is used where bitwise oracle equality is asserted.
"""

from __future__ import annotations

import json
import random
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Source whitelist (FIXTURES.md §3) — analog of the reference's categorical
# domain ['GN','PR','PU'] (/root/reference/src/config/validation_config.py:26).
SOURCE_WHITELIST = ["web", "books", "code", "wiki", "forum"]
BAD_SOURCES = ["spam", "unknown", ""]

VOCAB_SIZE = 50_257

# Physical schema of the change stream (FIXTURES.md §2).
EVENT_SCHEMA = T.StructType(
    [
        T.StructField("lsn", T.LongType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("doc_id", T.StringType(), True),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
        T.StructField("n_tok", T.IntegerType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("schema_change", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)


@dataclass
class EventGenConfig:
    n_events: int = 10_000
    n_docs: int = 1_000
    seed: int = 42
    zipf_a: float = 1.3  # power-law exponent for hot keys
    corrupt_frac: float = 0.05  # n_tok != len(tokens)
    bad_source_frac: float = 0.03
    null_tokens_frac: float = 0.01
    empty_tokens_frac: float = 0.01
    delete_frac: float = 0.05
    max_tokens: int = 64  # keep test fixtures small; bench overrides
    schema_change_lsns: tuple = ()  # lsn positions that become schema_change events
    schema_changes: tuple = ()  # parallel tuple of dicts
    lsn_start: int = 1
    shuffle_arrival: bool = True
    # WAL delivery contract: a batch may be internally out of LSN order, but
    # batches are LSN-coherent slices (a later batch never carries an LSN
    # below an earlier batch's max). Arrival disorder is therefore bounded:
    # we shuffle within consecutive windows of this many events.
    disorder_window: int = 200


def _zipf_doc(rng: random.Random, cfg: EventGenConfig) -> str:
    # rejection-free bounded zipf: rank ~ floor(u^(-1/(a-1))) capped
    u = rng.random()
    rank = int(u ** (-1.0 / (cfg.zipf_a - 1.0))) if cfg.zipf_a > 1.0 else 0
    return f"doc{min(rank, cfg.n_docs - 1):07d}"


def generate_events(cfg: EventGenConfig) -> list[dict]:
    """Deterministic event list (arrival order; lsn assigns logical order)."""
    rng = random.Random(cfg.seed)
    events: list[dict] = []
    sc_at = {int(l): dict(c) for l, c in zip(cfg.schema_change_lsns, cfg.schema_changes)}
    for i in range(cfg.n_events):
        lsn = cfg.lsn_start + i
        if lsn in sc_at:
            events.append(
                {
                    "lsn": lsn,
                    "op": "schema_change",
                    "doc_id": None,
                    "tokens": None,
                    "n_tok": None,
                    "source": None,
                    "schema_change": json.dumps(sc_at[lsn], sort_keys=True),
                    "ts": None,
                }
            )
            continue
        doc_id = _zipf_doc(rng, cfg)
        r = rng.random()
        if r < cfg.delete_frac:
            events.append(
                {
                    "lsn": lsn,
                    "op": "delete",
                    "doc_id": doc_id,
                    "tokens": None,
                    "n_tok": None,
                    "source": None,
                    "schema_change": None,
                    "ts": None,
                }
            )
            continue
        op = "insert" if rng.random() < 0.5 else "update"
        n = rng.randint(1, cfg.max_tokens)
        tokens = [rng.randrange(VOCAB_SIZE) for _ in range(n)]
        n_tok = n
        source = rng.choice(SOURCE_WHITELIST)
        r2 = rng.random()
        if r2 < cfg.corrupt_frac:
            n_tok = n + 1 + rng.randrange(3)
        elif r2 < cfg.corrupt_frac + cfg.bad_source_frac:
            source = rng.choice(BAD_SOURCES)
        elif r2 < cfg.corrupt_frac + cfg.bad_source_frac + cfg.null_tokens_frac:
            tokens = None
        elif r2 < (
            cfg.corrupt_frac + cfg.bad_source_frac + cfg.null_tokens_frac + cfg.empty_tokens_frac
        ):
            tokens = []
            n_tok = 0  # empty is rejected even when lengths agree
        events.append(
            {
                "lsn": lsn,
                "op": op,
                "doc_id": doc_id,
                "tokens": tokens,
                "n_tok": n_tok,
                "source": source,
                "schema_change": None,
                "ts": None,
            }
        )
    if cfg.shuffle_arrival:
        w = max(1, cfg.disorder_window)
        for lo in range(0, len(events), w):
            window = events[lo : lo + w]
            rng.shuffle(window)
            events[lo : lo + w] = window
    return events


def events_df(spark: SparkSession, events: list[dict]) -> DataFrame:
    return spark.createDataFrame(events, schema=EVENT_SCHEMA)


def spark_generate_events(
    spark: SparkSession,
    n_events: int,
    n_docs: int = 100_000,
    seed: int = 42,
    max_tokens: int = 64,
    delete_frac: float = 0.05,
    corrupt_frac: float = 0.05,
    bad_source_frac: float = 0.03,
    lsn_start: int = 1,
    partitions: int | None = None,
) -> DataFrame:
    """Executor-side deterministic event generator for benchmark scale.

    Everything derives from ``xxhash64`` of the row id (+ a salt per use),
    so the output is reproducible, fully parallel, and never touches the
    driver — the generator "streams" (SURVEY.md §7.4: no materialized
    10^10 rows on any single node).
    """
    df = spark.range(lsn_start, lsn_start + n_events, 1, partitions or spark.sparkContext.defaultParallelism)

    def h(salt: int):
        return F.abs(F.xxhash64(F.col("id"), F.lit(seed), F.lit(salt)))

    u_op = (h(1) % 10_000) / 10_000.0
    u_kind = (h(2) % 10_000) / 10_000.0
    # bounded zipf via u^(-1/(a-1)) with a=1.3 → exponent ~3.33
    zipf_rank = F.least(
        F.floor(F.pow((h(3) % 1_000_000 + 1) / 1_000_000.0, F.lit(-1.0 / 0.3))).cast("long"),
        F.lit(n_docs - 1),
    )
    n = (h(4) % max_tokens + 1).cast("int")
    tokens = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: (F.abs(F.xxhash64(F.col("id"), i, F.lit(seed))) % VOCAB_SIZE).cast("int"),
    )
    src_ok = F.element_at(
        F.array(*[F.lit(s) for s in SOURCE_WHITELIST]), (h(5) % len(SOURCE_WHITELIST) + 1).cast("int")
    )
    src_bad = F.element_at(
        F.array(*[F.lit(s) for s in BAD_SOURCES]), (h(6) % len(BAD_SOURCES) + 1).cast("int")
    )
    is_delete = u_op < delete_frac
    is_corrupt = (~is_delete) & (u_kind < corrupt_frac)
    is_badsrc = (~is_delete) & (u_kind >= corrupt_frac) & (u_kind < corrupt_frac + bad_source_frac)

    return df.select(
        F.col("id").alias("lsn"),
        F.when(is_delete, F.lit("delete"))
        .when(h(7) % 2 == 0, F.lit("insert"))
        .otherwise(F.lit("update"))
        .alias("op"),
        F.format_string("doc%07d", zipf_rank.cast("int")).alias("doc_id"),
        F.when(is_delete, F.lit(None).cast(T.ArrayType(T.IntegerType()))).otherwise(tokens).alias(
            "tokens"
        ),
        F.when(is_delete, F.lit(None).cast("int"))
        .when(is_corrupt, n + 1)
        .otherwise(n)
        .alias("n_tok"),
        F.when(is_delete, F.lit(None).cast("string"))
        .when(is_badsrc, src_bad)
        .otherwise(src_ok)
        .alias("source"),
        F.lit(None).cast("string").alias("schema_change"),
        F.lit(None).cast("timestamp").alias("ts"),
    )
