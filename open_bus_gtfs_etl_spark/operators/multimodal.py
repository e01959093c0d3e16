"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata structs, processed via Arrow-batched
``mapInPandas`` — the Spark-side plumbing (schema, partitioning, UDF
signature, batch shape) is real and tested; the codec step itself is
STUBBED because no image/audio libraries exist in this container.

Design for scale: binary payloads never shuffle — decode/feature steps
are narrow maps (mapInPandas), and any grouping happens on extracted
metadata columns, never on the blob.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, payload_sha string, feature array<float>"
)


def media_from_documents(spark, sf_dir: str) -> DataFrame:
    """Build a media table over the documents corpus: each document's
    UTF-8 bytes stand in for an encoded payload blob (the container has
    no codec libraries), with kind and metadata derived
    deterministically — so the downstream decode/featurize output is
    exactly reproducible by a SQL oracle (sha256 is computable on both
    sides, unlike crc32/xxhash)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.col("doc_id"), F.lit(3)) + 1).cast("int"),
    )
    meta = F.struct(
        F.when(kind == "image", (F.pmod(F.col("n_chars"), F.lit(1920)) + 16).cast("int")).alias("width"),
        F.when(kind == "image", (F.pmod(F.col("n_chars"), F.lit(1080)) + 16).cast("int")).alias("height"),
        F.when(kind == "audio", F.lit(16000)).cast("int").alias("sample_rate"),
        F.when(kind != "image", (F.pmod(F.col("n_chars"), F.lit(60000)) + 100).cast("int")).alias("duration_ms"),
        F.lit("fake").alias("codec"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        meta.alias("meta"),
    )


def synthesize_media(spark, n: int, seed: int = 3) -> DataFrame:
    """Deterministic fake media table: payload = hash-derived bytes
    (stands in for encoded frames), metadata populated per kind."""
    df = spark.range(n)
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.xxhash64(F.lit(seed), "id"), F.lit(3)) + 1).cast("int"),
    )
    payload = F.encode(
        F.repeat(F.hex(F.xxhash64(F.lit(seed), F.lit("payload"), "id")), 64), "utf-8"
    )
    meta = F.struct(
        F.when(kind == "image", (F.pmod(F.xxhash64(F.lit(seed), F.lit("w"), "id"), F.lit(1920)) + 16).cast("int")).alias("width"),
        F.when(kind == "image", (F.pmod(F.xxhash64(F.lit(seed), F.lit("h"), "id"), F.lit(1080)) + 16).cast("int")).alias("height"),
        F.when(kind == "audio", F.lit(16000)).cast("int").alias("sample_rate"),
        F.when(kind != "image", (F.pmod(F.xxhash64(F.lit(seed), F.lit("d"), "id"), F.lit(60000)) + 100).cast("int")).alias("duration_ms"),
        F.lit("fake").alias("codec"),
    )
    return df.select(
        F.col("id").alias("media_id"), kind.alias("kind"), payload.alias("payload"), meta.alias("meta")
    )


def decode_and_featurize(df: DataFrame, feature_dim: int = 8) -> DataFrame:
    """Arrow-batched decode → feature-extract pipeline over binary
    payloads. The decode itself is a deterministic stand-in (real codecs
    are unavailable in this container — wire PIL/torchaudio/pyav here in
    production); everything around it — Arrow batch iteration, binary
    column handling, output schema — is the production shape.
    """

    def _proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            import PIL  # noqa: F401
            have_codecs = True
        except ImportError:
            have_codecs = False
        import hashlib

        for pdf in batches:
            payloads = pdf["payload"]
            n_bytes = payloads.map(lambda b: len(b) if b is not None else 0)
            # sha256 (not crc32/xxhash) so a SQL oracle can recompute
            # the checksum bit-for-bit on the same bytes
            sha = payloads.map(
                lambda b: hashlib.sha256(bytes(b)).hexdigest()[:16]
                if b is not None
                else None
            )
            if have_codecs:  # pragma: no cover - not available in sandbox
                raise NotImplementedError("real decode path: wire codec here")
            feats = [
                [float(int(c, 16)) / 15.0 for c in s[:feature_dim]]
                if s is not None
                else None
                for s in sha
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": n_bytes.astype("int64"),
                    "payload_sha": sha,
                    "feature": feats,
                }
            )

    return df.mapInPandas(_proc, schema=FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: explode per-video sample timestamps
    from metadata only (no payload touched, no shuffle of blobs) —
    the downstream decode consumes (media_id, ts_ms) work units."""
    return (
        df.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("ts_ms"),
        )
    )
