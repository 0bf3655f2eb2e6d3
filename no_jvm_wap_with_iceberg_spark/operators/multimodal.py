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


@register(
    "multimodal_payload_stats",
    """
    SELECT lang AS media_group,
           COUNT(*) AS n_payloads,
           SUM(octet_length(encode(text))) AS total_bytes,
           CAST(MIN(octet_length(encode(text))) AS BIGINT) AS min_bytes,
           CAST(MAX(octet_length(encode(text))) AS BIGINT) AS max_bytes
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
