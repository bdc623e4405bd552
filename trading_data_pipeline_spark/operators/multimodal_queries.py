"""Declared multimodal queries (extension E7).

``q_multimodal_meta`` and ``q_frame_sample`` have exact DuckDB oracles
(payloads are UTF-8 of ASCII text, so byte slicing/hashing agrees between
engines). ``q_image_features`` / ``q_audio_features`` are rows-only — their
decode step is the deterministic fake (real codecs absent here), checked
for determinism + batch shape in tests/test_multimodal.py instead.
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
    None,  # decode is the deterministic fake → rows-only; tests pin values
    doc="Image decode → nearest-neighbour resize → channel means via "
    "Arrow-batched mapInPandas (codec stubbed: deterministic payload-"
    "seeded pixels; numpy feature math is the real path)",
)
def q_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    mm = attach_payload(
        ensure_parallelism(load(spark, sf_dir, "documents"))
    )
    return image_features(mm)


@register(
    "q_audio_features",
    None,  # fake int16 waveform → rows-only; tests pin values
    doc="Audio features (RMS, zero-crossings) over payload-as-waveform via "
    "Arrow-batched mapInPandas — vectorized numpy per batch",
)
def q_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    mm = attach_payload(
        ensure_parallelism(load(spark, sf_dir, "documents"))
    )
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
