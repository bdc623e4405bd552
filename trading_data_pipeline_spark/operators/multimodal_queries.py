"""Declared multimodal queries (extension E7).

``q_multimodal_meta`` and ``q_frame_sample`` have exact DuckDB oracles
(payloads are UTF-8 of ASCII text, so byte slicing/hashing agrees between
engines). ``q_image_features`` / ``q_audio_features`` decode REAL
containers (binary PPM / PCM WAV built by ``attach_media_payload``, parsed
in pure numpy) — container decode is not SQL-expressible, so they stay
rows-only for the driver, with feature VALUES golden-tested against
hand-computed numpy in tests/test_multimodal.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans import ensure_parallelism
from ..registry import load, register
from .multimodal import (
    FAKE_H_MOD,
    FAKE_W_MOD,
    attach_payload,
    audio_features,
    frame_sample,
    image_features,
)


@register(
    "q_multimodal_meta",
    f"""
    SELECT doc_id,
           CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                           ELSE 'video' END AS media_type,
           octet_length(encode(text)) AS byte_len,
           sha256(text) AS sha256,
           octet_length(encode(text)) % {FAKE_W_MOD} + 16 AS width,
           octet_length(encode(text)) % {FAKE_H_MOD} + 16 AS height
    FROM documents
    """,
    doc="Multimodal table construction: binary payload + typed metadata "
    "struct (media_type, byte_len, sha256, declared dims) — payload stays "
    "an opaque BinaryType column; all metadata derivation is JVM-side",
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    mm = attach_payload(load(spark, sf_dir, "documents"))
    return mm.select(
        "doc_id",
        F.col("meta.media_type").alias("media_type"),
        F.col("meta.byte_len").alias("byte_len"),
        F.col("meta.sha256").alias("sha256"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )


@register(
    "q_frame_sample",
    """
    WITH f AS (
      SELECT doc_id, text,
             greatest(1, length(text) // 64) AS n_frames
      FROM documents
    )
    SELECT doc_id,
           CAST(unnest(range(0, n_frames, 4)) AS INT) AS frame_idx,
           sha256(substr(text, CAST(unnest(range(0, n_frames, 4)) AS INT) * 64 + 1, 64))
             AS frame_sha256,
           length(substr(text, CAST(unnest(range(0, n_frames, 4)) AS INT) * 64 + 1, 64))
             AS frame_bytes
    FROM f
    """,
    doc="Video-style frame sampling: chunk payload into 64-byte frames, "
    "keep every 4th, sha256-fingerprint each — 1:N mapInPandas fan-out, "
    "no shuffle; a container demuxer drops into the same stage",
)
def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    mm = attach_payload(
        ensure_parallelism(load(spark, sf_dir, "documents"))
    )
    return frame_sample(mm)


@register(
    "q_image_features",
    None,  # container decode not SQL-expressible → rows-only; feature
    # values are GOLDEN-tested against hand-computed channel means over
    # the same PPM containers (tests/test_multimodal.py)
    doc="REAL image container decode (binary PPM/P6, pure-numpy header+"
    "raster parse via decode_auto; PIL handles other formats where "
    "installed) → nearest-neighbour resize → channel means, as one "
    "Arrow-batched mapInPandas stage over the image-typed rows",
)
def q_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .multimodal import attach_media_payload, decode_auto

    mm = attach_media_payload(
        ensure_parallelism(load(spark, sf_dir, "documents"))
    ).filter(F.col("meta.media_type") == "image")
    return image_features(mm, decode=decode_auto)


@register(
    "q_audio_features",
    None,  # container decode not SQL-expressible → rows-only; RMS/zc
    # values are GOLDEN-tested against numpy over the same WAV containers
    doc="REAL audio container decode (PCM RIFF/WAVE chunk walk, pure "
    "numpy) → RMS + zero-crossings over the audio-typed rows via "
    "Arrow-batched mapInPandas — vectorized numpy per batch",
)
def q_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .multimodal import attach_media_payload

    mm = attach_media_payload(
        ensure_parallelism(load(spark, sf_dir, "documents"))
    ).filter(F.col("meta.media_type") == "audio")
    return audio_features(mm)


@register(
    "q_phash_dedup",
    None,  # the fake codec's pixels are engine-specific -> rows-only;
    # hamming semantics + pigeonhole recall pinned in tests/test_multimodal.py
    doc="Perceptual-hash image near-dup: 64-bit aHash per payload (Arrow "
    "mapInPandas, payloads never shuffle) -> 8x8-bit banded candidates "
    "(pigeonhole: recall is EXACT for hamming<=7, unlike probabilistic "
    "MinHash bands) -> bit_count XOR verify. Catches re-encoded/resized "
    "copies the sha256 exact key cannot see",
)
def q_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .multimodal import attach_payload, phash_near_dup_pairs

    mm = attach_payload(ensure_parallelism(load(spark, sf_dir, "documents")))
    return phash_near_dup_pairs(mm).orderBy("doc_a", "doc_b")
