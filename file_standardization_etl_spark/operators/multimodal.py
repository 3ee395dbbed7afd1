"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

The decode/feature-extract kernels are STUBS (the sandbox has no
image/audio libraries): ``_decode_stub`` derives deterministic fake
features from the bytes so the Spark-side plumbing — schema, partitioning,
UDF signature, Arrow batch shape — is real and testable. Swapping in a
real decoder (PIL / torchaudio / pyav) changes only the marked function
body.

Scale notes: ``mapInPandas`` keeps the binary payloads executor-side in
Arrow batches (no driver collect); ``spark.sql.execution.arrow.
maxRecordsPerBatch`` bounds per-batch memory for large blobs, and a
``repartition`` on the id keeps decode work evenly spread when blob sizes
skew.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id bigint, media_type string, byte_len bigint, "
    "content_hash string, width int, height int, n_frames int"
)


def _decode_stub(payload: bytes, media_type: str) -> dict:
    """STUB decoder — deterministic fake metadata from the bytes.

    A real implementation would decode the container here and raise on
    corrupt payloads; everything around it stays unchanged.
    """
    h = hashlib.md5(payload).hexdigest()
    seed = int(h[:8], 16)
    if media_type == "image":
        return {"width": 64 + seed % 1024, "height": 64 + (seed >> 4) % 1024, "n_frames": 1}
    if media_type == "video":
        return {"width": 320, "height": 240, "n_frames": 1 + seed % 300}
    if media_type == "audio":
        return {"width": 0, "height": 0, "n_frames": 1 + seed % 48000}
    raise NotImplementedError(f"unknown media_type: {media_type}")


def decode_media(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """df(doc_id, media_type, payload: binary) → typed metadata frame.

    One Arrow batch in, one pandas DataFrame out per iteration — no
    per-row Python calls into Spark, only inside the (stub) kernel.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [
                _decode_stub(p, m) for p, m in zip(pdf[payload_col], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "media_type": pdf["media_type"].values,
                    "byte_len": [len(p) for p in pdf[payload_col]],
                    "content_hash": [hashlib.md5(p).hexdigest() for p in pdf[payload_col]],
                    "width": [m["width"] for m in metas],
                    "height": [m["height"] for m in metas],
                    "n_frames": [m["n_frames"] for m in metas],
                }
            )

    return df.mapInPandas(kernel, schema=MEDIA_SCHEMA)


def synth_media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic fake media table from the shared documents fixture:
    text bytes as the opaque payload, media type cycled by doc_id."""
    mt = (
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
    )
    return docs.select(
        "doc_id", mt.alias("media_type"), F.col("text").cast("binary").alias("payload")
    )


def frame_sample(meta: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plan over decoded video metadata: one output row per
    sampled frame index (sequence + explode — executor-side fan-out, no
    driver loop)."""
    frames = F.explode(
        F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n))
    )
    return meta.filter(F.col("media_type") == "video").select(
        "doc_id", frames.alias("frame_idx")
    )
