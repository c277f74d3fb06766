"""Multimodal column plumbing: image/audio/video as opaque BINARY
columns with typed metadata, processed through Arrow-batched
`mapInPandas` stages.

The Spark-side architecture here is real and tested — schema contract,
batch iteration shape, partition sizing notes — while the actual media
decoding is STUBBED (this container has no image/audio libs): decoders
raise NotImplementedError unless `fake=True`, which substitutes a
deterministic fake "decode" so the distributed plumbing can be
exercised end-to-end.

At 100 TB: binary payloads dominate row size — keep them in their own
table keyed by content hash, set
`spark.sql.files.maxPartitionBytes` low enough that a task's batch of
payloads fits executor memory, and NEVER collect payload columns. The
metadata table (hash, width, height, duration, …) is the join surface
for analytics.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sha256", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def _decode_image_dims(payload: bytes, fake: bool) -> tuple[int, int]:
    """Stub decode step. Real deployments plug Pillow/libvips here."""
    if not fake:
        raise NotImplementedError(
            "image decoding requires an image library not present in "
            "this container; pass fake=True for deterministic fakes"
        )
    # Deterministic fake: dims derived from payload bytes.
    h = sum(payload[:16]) if payload else 0
    return (64 + h % 512, 64 + (h * 7) % 512)


def extract_image_features(media: DataFrame, fake: bool = False) -> DataFrame:
    """BINARY column → feature rows via Arrow-batched mapInPandas.

    The UDF sees pandas batches (whole Arrow record batches, not rows);
    payload bytes never round-trip through the driver.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                width, height = _decode_image_dims(data, fake)
                rows.append(
                    (
                        media_id,
                        hashlib.sha256(data).hexdigest(),
                        len(data),
                        width,
                        height,
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields]
            )

    src = media.filter(F.col("kind") == "image").select("media_id", "payload")
    return src.mapInPandas(batches, IMAGE_FEATURES_SCHEMA)


def dedup_media_by_content(media: DataFrame) -> DataFrame:
    """Exact payload dedup: content-hash groupBy keeping min media_id —
    sha2 runs JVM-side on the binary column (no Python)."""
    return (
        media.withColumn("content_hash", F.sha2(F.col("payload"), 256))
        .groupBy("content_hash")
        .agg(
            F.min("media_id").alias("keeper_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )
