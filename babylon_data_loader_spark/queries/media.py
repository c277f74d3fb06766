"""Multimodal declared queries — REAL byte-level decode, fully
oracle-checked.

The trick that makes an image decoder verifiable by a SQL engine with
no image support: the payloads are generated distributed (mapInPandas)
with analytically-known content — solid-color BMPs and constant PCM16
WAVs whose dimensions, byte sizes, channel means, RMS and peak are
closed-form functions of the row id. Spark then round-trips the
actual bytes through the real codecs (functions/media_codecs.py), and
the DuckDB oracle recomputes every feature arithmetically from
`range(n)`. Any decode bug — wrong stride, padding, sign, row order —
breaks the exact match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from babylon_data_loader_spark.queries import query

_N = 200


@query(
    "q_media_image_features",
    oracle=f"""
    SELECT i AS media_id,
           CAST(54 + (8 + (7*i)%32) * (((3*(8 + i%32) + 3)//4)*4)
                AS BIGINT) AS n_bytes,
           CAST(8 + i%32 AS INTEGER) AS width,
           CAST(8 + (7*i)%32 AS INTEGER) AS height,
           CAST((37*i)%256 AS DOUBLE) AS mean_r,
           CAST((59*i)%256 AS DOUBLE) AS mean_g,
           CAST((83*i)%256 AS DOUBLE) AS mean_b
    FROM range(0, {_N}) t(i)
    """,
)
def q_media_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image pipeline: generate BMP payloads on executors → REAL BMP
    decode (byte-level, media_codecs.py) → per-image features, all
    inside Arrow-batched mapInPandas. The oracle predicts n_bytes from
    the BMP row-padding formula (54 + h*ceil4(3w)) and the channel
    means from the planted solid color — exact match required."""
    from babylon_data_loader_spark.multimodal import (
        extract_image_features,
        synthetic_image_table,
    )

    media = synthetic_image_table(spark, _N)
    return extract_image_features(media, fake=False).select(
        "media_id", "n_bytes", "width", "height", "mean_r", "mean_g", "mean_b"
    )


@query(
    "q_media_audio_features",
    oracle=f"""
    SELECT i AS media_id,
           CAST(44 + 2*(1000 + 10*i) AS BIGINT) AS n_bytes,
           CAST(CASE WHEN i%2=0 THEN 8000 ELSE 16000 END
                AS INTEGER) AS sample_rate,
           CAST(1 AS INTEGER) AS n_channels,
           CAST(1000 + 10*i AS BIGINT) AS n_samples,
           CAST(1000 + 10*i AS DOUBLE)
             / (CASE WHEN i%2=0 THEN 8000 ELSE 16000 END) AS duration_s,
           CAST(100 + i AS DOUBLE) AS rms,
           CAST(100 + i AS INTEGER) AS peak
    FROM range(0, {_N}) t(i)
    """,
)
def q_media_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio pipeline: generate PCM16 WAV payloads → REAL RIFF/WAVE
    decode → duration / RMS / peak. Constant-amplitude signals make
    RMS exactly the amplitude (sqrt of an exactly-representable
    square), so even the floating-point features compare exactly."""
    from babylon_data_loader_spark.multimodal import (
        extract_audio_features,
        synthetic_audio_table,
    )

    media = synthetic_audio_table(spark, _N)
    return extract_audio_features(media).select(
        "media_id",
        "n_bytes",
        "sample_rate",
        "n_channels",
        "n_samples",
        "duration_s",
        "rms",
        "peak",
    )


@query(
    "q_media_dedup",
    oracle=f"""
    SELECT CAST(5*g AS BIGINT) AS keeper_id,
           CAST(5 AS BIGINT) AS n_copies
    FROM range(0, {_N // 5}) t(g)
    """,
)
def q_media_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-hash dedup over binary payloads: sha2 runs JVM-side on
    the BINARY column (no Python in the hot path), one shuffle on the
    hash. The fixture plants exact-duplicate payloads in runs of 5, so
    the keeper/copy-count distribution is known in closed form."""
    from babylon_data_loader_spark.multimodal import (
        dedup_media_by_content,
        synthetic_image_table,
    )

    media = synthetic_image_table(spark, _N, dup_every=5)
    return dedup_media_by_content(media).select(
        F.col("keeper_id"), F.col("n_copies")
    )


@query(
    "q_media_video_features",
    oracle=f"""
    SELECT i AS media_id,
           CAST(length('YUV4MPEG2 W' || (8 + i%16) || ' H' || (8 + (3*i)%16)
                       || ' F' || (CASE WHEN i%2=0 THEN 24 ELSE 30 END)
                       || ':1 Ip A1:1 C444') + 1
                + (5 + i%7) * (6 + 3*(8 + i%16)*(8 + (3*i)%16))
                AS BIGINT) AS n_bytes,
           CAST(8 + i%16 AS INTEGER) AS width,
           CAST(8 + (3*i)%16 AS INTEGER) AS height,
           CAST(5 + i%7 AS BIGINT) AS n_frames,
           CAST(CASE WHEN i%2=0 THEN 24 ELSE 30 END AS INTEGER) AS fps,
           CAST(5 + i%7 AS DOUBLE)
             / (CASE WHEN i%2=0 THEN 24 ELSE 30 END) AS duration_s,
           CAST((29*i)%256 AS DOUBLE) AS mean_y
    FROM range(0, {_N}) t(i)
    """,
)
def q_media_video_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video pipeline completing the multimodal triad: generate Y4M
    clips on executors → container-level metadata parse (O(1) header
    arithmetic, no pixel decode) → frame-SAMPLED mean luma (random-
    access decode of ≤3 frames per clip, never the whole payload).
    The oracle reproduces the container math — header string length,
    frame stride, duration ratio — in SQL; constant planes make the
    sampled mean exact."""
    from babylon_data_loader_spark.multimodal import (
        extract_video_features,
        synthetic_video_table,
    )

    media = synthetic_video_table(spark, _N)
    return extract_video_features(media).select(
        "media_id",
        "n_bytes",
        "width",
        "height",
        "n_frames",
        "fps",
        "duration_s",
        "mean_y",
    )


@query(
    "q_media_resize",
    oracle=f"""
    SELECT i AS media_id,
           CAST(54 + 16 * 48 AS BIGINT) AS n_bytes,
           CAST(16 AS INTEGER) AS width,
           CAST(16 AS INTEGER) AS height,
           CAST((37*i)%256 AS DOUBLE) AS mean_r,
           CAST((59*i)%256 AS DOUBLE) AS mean_g,
           CAST((83*i)%256 AS DOUBLE) AS mean_b
    FROM range(0, {_N}) t(i)
    """,
)
def q_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize lane: variable-dimension BMPs → nearest-neighbor resize
    to a fixed 16x16 (multimodal.py::resize_images, integer index map,
    no float kernel) → re-encode → REAL re-decode via the feature
    extractor. The oracle pins the resized geometry (n_bytes becomes
    the constant 54 + 16*ceil4(3*16) = 822) and — because the fixture
    colors are solid — channel means that must survive the resize
    bit-for-bit. Any off-by-one in the index map or stride padding in
    the re-encode breaks the match."""
    from babylon_data_loader_spark.multimodal import (
        extract_image_features,
        resize_images,
        synthetic_image_table,
    )

    media = synthetic_image_table(spark, _N)
    resized = resize_images(media, out_w=16, out_h=16)
    return extract_image_features(resized, fake=False).select(
        "media_id", "n_bytes", "width", "height", "mean_r", "mean_g", "mean_b"
    )


@query(
    "q_media_resample",
    oracle=f"""
    SELECT i AS media_id,
           CAST(CASE WHEN i%2=0 THEN 1000 + 10*i
                     ELSE 500 + 5*i END AS BIGINT) AS n_samples,
           CAST(8000 AS INTEGER) AS sample_rate,
           CAST(44 + 2*(CASE WHEN i%2=0 THEN 1000 + 10*i
                             ELSE 500 + 5*i END) AS BIGINT) AS n_bytes,
           CAST(CASE WHEN i%2=0 THEN 1000 + 10*i
                     ELSE 500 + 5*i END AS DOUBLE) / 8000 AS duration_s,
           CAST(100 + i AS DOUBLE) AS rms,
           CAST(100 + i AS INTEGER) AS peak
    FROM range(0, {_N}) t(i)
    """,
)
def q_media_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample lane, the audio twin of q_media_resize: mixed-rate WAVs
    (8 kHz even ids / 16 kHz odd) → linear-interpolation resample to a
    uniform 8 kHz (multimodal.py::resample_audio) → re-encode → REAL
    re-decode via the feature extractor. The oracle pins the resampled
    geometry arithmetically — n_samples halves exactly for the 16 kHz
    ids (floor(n·8000/16000), n even), byte size follows, and the
    constant amplitude must survive interpolation bit-for-bit (linear
    interp of a constant is the constant), so RMS and peak stay
    100+i. Rate normalization is the first step of every audio
    training pipeline; this proves the plumbing at the sample level."""
    from babylon_data_loader_spark.multimodal import (
        extract_audio_features,
        resample_audio,
        synthetic_audio_table,
    )

    media = synthetic_audio_table(spark, _N)
    resampled = resample_audio(media, target_sr=8000)
    return extract_audio_features(resampled).select(
        "media_id",
        "n_samples",
        "sample_rate",
        "n_bytes",
        "duration_s",
        "rms",
        "peak",
    )
