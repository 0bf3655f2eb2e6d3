"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The pattern for images/audio/video at 100 TB: store the payload as an
opaque ``binary`` column (or a lake path to it) next to typed
metadata, and run decode/feature steps as Arrow-batched
``mapInPandas`` stages so bytes never round-trip through Python row
objects. Media codecs aren't available in this environment, so the
decode step is STUBBED (``decode_stub=True`` produces deterministic
fake features; ``decode_stub=False`` raises NotImplementedError at
the point a real codec would be called) — the Spark-side plumbing
(schema, batching, partition shape) is real and tested.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from no_jvm_wap_with_iceberg_spark.plans.registry import register
from no_jvm_wap_with_iceberg_spark.sources.registry import load_table

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),  # image|audio|video
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("checksum", T.LongType(), True),
    ]
)


def as_media_table(df: DataFrame, id_col: str, payload_col: str, media_type: str) -> DataFrame:
    """Normalize any (id, binary) pair into the engine's media schema."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.col(payload_col).cast("binary").alias("payload"),
        F.lit(media_type).alias("media_type"),
        F.create_map().cast("map<string,string>").alias("meta"),
    )


def extract_features(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Decode + featurize payloads via mapInPandas (Arrow batches).

    With ``decode_stub`` the "decode" is a deterministic function of
    the bytes (length, fake dimensions, additive checksum) so tests
    can assert exact values; without it, the real-codec call site
    raises NotImplementedError.
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decoding requires codec libraries not "
                    "present in this environment; pass decode_stub=True"
                )
            payloads = pdf["payload"]
            n_bytes = payloads.map(lambda b: len(b) if b is not None else 0)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": n_bytes.astype("int32"),
                    # fake decode: dimensions derived from payload size
                    "width": (n_bytes % 1024).astype("int32"),
                    "height": (n_bytes // 1024 + 1).astype("int32"),
                    "checksum": payloads.map(
                        lambda b: int(sum(b) % (1 << 31)) if b is not None else 0
                    ).astype("int64"),
                }
            )

    return media.mapInPandas(_batches, FEATURE_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("src_width", T.IntegerType(), True),
        T.StructField("src_height", T.IntegerType(), True),
        T.StructField("dst_width", T.IntegerType(), True),
        T.StructField("dst_height", T.IntegerType(), True),
        T.StructField("scale_pct", T.IntegerType(), True),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_index", T.IntegerType(), False),
        T.StructField("frame_offset_bytes", T.LongType(), False),
    ]
)


def resize_plan(media: DataFrame, max_side: int = 256, decode_stub: bool = True) -> DataFrame:
    """Plan a bounded resize per image: source dims from the (stubbed)
    decode, target dims = proportional fit into ``max_side``.

    All arithmetic is integer so the stub is exactly reproducible in
    SQL; a real implementation swaps the dimension source and adds a
    resized-payload output column, keeping the same batch shape.
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not decode_stub:
                raise NotImplementedError(
                    "real image decoding requires codec libraries not "
                    "present in this environment; pass decode_stub=True"
                )
            n = pdf["payload"].map(lambda b: len(b) if b is not None else 0)
            src_w = (n % 1024 + 1).astype("int64")
            src_h = (n // 1024 + 1).astype("int64")
            long_side = src_w.combine(src_h, max)
            # integer proportional fit: dst = src * max_side // long_side
            # (never upscale)
            import numpy as np

            scale_num = np.minimum(long_side, max_side)
            dst_w = (src_w * scale_num // long_side).astype("int32")
            dst_h = (src_h * scale_num // long_side).astype("int32")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "src_width": src_w.astype("int32"),
                    "src_height": src_h.astype("int32"),
                    "dst_width": dst_w,
                    "dst_height": dst_h,
                    "scale_pct": (scale_num * 100 // long_side).astype("int32"),
                }
            )

    return media.mapInPandas(_batches, RESIZE_SCHEMA)


def frame_sample_plan(
    media: DataFrame, every_n_bytes: int = 4096, decode_stub: bool = True
) -> DataFrame:
    """One-to-many frame sampling: emit one row per sampled frame.

    The stub treats every ``every_n_bytes`` of payload as one frame
    (a real demuxer would read the container index); the Spark shape —
    ``mapInPandas`` fanning one media row out to N frame rows in the
    same Arrow batch — is exactly what a real frame sampler uses.
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not decode_stub:
                raise NotImplementedError(
                    "real video demuxing requires codec libraries not "
                    "present in this environment; pass decode_stub=True"
                )
            ids, idxs, offs = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                nb = len(payload) if payload is not None else 0
                n_frames = nb // every_n_bytes + 1
                for i in range(n_frames):
                    ids.append(mid)
                    idxs.append(i)
                    offs.append(i * every_n_bytes)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_index": pd.Series(idxs, dtype="int32"),
                    "frame_offset_bytes": pd.Series(offs, dtype="int64"),
                }
            )

    return media.mapInPandas(_batches, FRAME_SCHEMA)


def _docs_as_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return as_media_table(
        d.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")),
        "doc_id",
        "payload",
        "image",
    )


@register(
    "multimodal_feature_extract",
    """
    SELECT doc_id AS media_id,
           CAST(strlen(text) AS INTEGER) AS n_bytes,
           CAST(strlen(text) % 1024 AS INTEGER) AS width,
           CAST(strlen(text) // 1024 + 1 AS INTEGER) AS height
    FROM documents
    """,
    doc="mapInPandas decode+featurize plumbing, oracle-checked on the "
    "deterministic stub (dims are pure functions of payload length)",
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract_features(_docs_as_media(spark, sf_dir)).select(
        "media_id", "n_bytes", "width", "height"
    )


@register(
    "multimodal_resize_plan",
    """
    WITH src AS (
      SELECT doc_id AS media_id,
             strlen(text) % 1024 + 1 AS sw,
             strlen(text) // 1024 + 1 AS sh
      FROM documents
    )
    SELECT media_id,
           CAST(sw AS INTEGER) AS src_width, CAST(sh AS INTEGER) AS src_height,
           CAST(sw * LEAST(GREATEST(sw, sh), 256) // GREATEST(sw, sh) AS INTEGER) AS dst_width,
           CAST(sh * LEAST(GREATEST(sw, sh), 256) // GREATEST(sw, sh) AS INTEGER) AS dst_height,
           CAST(LEAST(GREATEST(sw, sh), 256) * 100 // GREATEST(sw, sh) AS INTEGER) AS scale_pct
    FROM src
    """,
    doc="integer proportional-fit resize plan over the stub decoder",
)
def multimodal_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    return resize_plan(_docs_as_media(spark, sf_dir))


@register(
    "multimodal_frame_sample",
    """
    SELECT doc_id AS media_id,
           CAST(i AS INTEGER) AS frame_index,
           CAST(i * 4096 AS BIGINT) AS frame_offset_bytes
    FROM documents,
         UNNEST(range(0, strlen(text) // 4096 + 1)) AS t(i)
    """,
    doc="one-to-many frame sampling via mapInPandas (stub demuxer: one "
    "frame per 4 KiB of payload)",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return frame_sample_plan(_docs_as_media(spark, sf_dir))


@register(
    "multimodal_payload_stats",
    """
    SELECT lang AS media_group,
           COUNT(*) AS n_payloads,
           CAST(SUM(strlen(text)) AS BIGINT) AS total_bytes,
           CAST(MIN(strlen(text)) AS BIGINT) AS min_bytes,
           CAST(MAX(strlen(text)) AS BIGINT) AS max_bytes
    FROM documents GROUP BY lang
    """,
    doc="binary-column plumbing: utf-8 payload byte stats per group "
    "(documents text treated as the opaque payload)",
)
def multimodal_payload_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    return d.groupBy(F.col("lang").alias("media_group")).agg(
        F.count(F.lit(1)).alias("n_payloads"),
        F.sum(F.octet_length(payload)).alias("total_bytes"),
        F.min(F.octet_length(payload)).cast("bigint").alias("min_bytes"),
        F.max(F.octet_length(payload)).cast("bigint").alias("max_bytes"),
    )
