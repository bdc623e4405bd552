"""Multimodal plumbing tests: schema, Arrow batch shape, determinism, and
hand-computed feature values on the deterministic fake decode path."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, StructType

from trading_data_pipeline_spark.operators.multimodal import (
    attach_payload,
    audio_features,
    decode_image,
    fake_decode,
    frame_sample,
    image_features,
    resize_nearest,
)
from trading_data_pipeline_spark.registry import load


@pytest.fixture(scope="module")
def mm(spark, sf_dir):
    return attach_payload(load(spark, sf_dir, "documents"))


def test_payload_schema(mm):
    assert isinstance(mm.schema["payload"].dataType, BinaryType)
    meta = mm.schema["meta"].dataType
    assert isinstance(meta, StructType)
    assert [f.name for f in meta.fields] == [
        "media_type", "byte_len", "sha256", "width", "height",
    ]


def test_payload_roundtrip_matches_text(spark, sf_dir, mm):
    docs = load(spark, sf_dir, "documents")
    row = (
        mm.join(docs, "doc_id")
        .select("payload", "text")
        .first()
    )
    assert bytes(row.payload).decode("utf-8") == row.text


def test_decode_stub_raises_without_codec():
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL installed — the real-codec test covers decode_image")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        decode_image(b"abc", 4, 4)


def test_real_codec_path_with_pil(spark):
    """PIL-gated (runs in the Docker image, skips in the bare sandbox):
    a real PNG payload through the SAME mapInPandas stage via
    ``decode=decode_image`` must reproduce PIL's own channel means."""
    pytest.importorskip("PIL", reason="Pillow not installed")
    import io

    from PIL import Image

    w, h = 6, 4
    px = np.arange(w * h * 3, dtype=np.uint8).reshape(h, w, 3)
    buf = io.BytesIO()
    Image.fromarray(px, "RGB").save(buf, format="PNG")
    payload = buf.getvalue()

    mm = spark.createDataFrame(
        [(1, bytearray(payload), ("image", len(payload), "x", w, h))],
        "doc_id long, payload binary, "
        "meta struct<media_type:string, byte_len:int, sha256:string, "
        "width:int, height:int>",
    )
    row = image_features(mm, out_w=w, out_h=h, decode=decode_image).first()
    want = px.reshape(-1, 3).mean(axis=0)
    assert (row.mean_r, row.mean_g, row.mean_b) == tuple(float(x) for x in want)
    assert row.brightness == float(want.mean())


def test_fake_decode_deterministic_and_shaped():
    a = fake_decode(b"hello world", 20, 10)
    b = fake_decode(b"hello world", 20, 10)
    assert a.shape == (10, 20, 3) and a.dtype == np.uint8
    assert (a == b).all()
    assert (fake_decode(b"other", 20, 10) != a).any()


def test_resize_nearest_shape_and_identity():
    img = fake_decode(b"x", 16, 16)
    assert resize_nearest(img, 8, 4).shape == (4, 8, 3)
    assert (resize_nearest(img, 16, 16) == img).all()


def test_image_features_rows_and_ranges(mm):
    feats = image_features(mm)
    rows = feats.collect()
    assert len(rows) == mm.count()
    for r in rows[:50]:
        assert 16 <= r.width < 64 and 16 <= r.height < 48
        assert 0.0 <= r.brightness <= 255.0
        np.testing.assert_allclose(
            r.brightness, (r.mean_r + r.mean_g + r.mean_b) / 3, rtol=1e-9
        )


def test_image_features_deterministic(mm):
    one = {r.doc_id: r.brightness for r in image_features(mm).collect()}
    two = {r.doc_id: r.brightness for r in image_features(mm).collect()}
    assert one == two


def test_frame_sample_matches_hand_computed(spark, sf_dir, mm):
    docs = load(spark, sf_dir, "documents")
    text = docs.filter(F.col("doc_id") == 1).first().text
    raw = text.encode("utf-8")
    want = []
    for idx in range(0, max(1, len(raw) // 64), 4):
        chunk = raw[idx * 64 : (idx + 1) * 64]
        want.append((1, idx, hashlib.sha256(chunk).hexdigest(), len(chunk)))
    got = [
        tuple(r)
        for r in frame_sample(mm.filter(F.col("doc_id") == 1))
        .orderBy("frame_idx")
        .collect()
    ]
    assert got == want


def test_audio_features_values(mm):
    out = {r.doc_id: r for r in audio_features(mm).collect()}
    meta = {r.doc_id: r.byte_len for r in mm.select("doc_id", "meta.byte_len").collect()}
    assert set(out) == set(meta)
    some = list(out.values())[0]
    assert some.n_samples == max(1, meta[some.doc_id] // 2)
    assert some.rms >= 0.0 and some.zero_crossings >= 0


def test_feature_stage_is_narrow(mm):
    """mapInPandas must not introduce an exchange — features are computed
    where the payload partitions live (at 100 TB a shuffle here would move
    the media bytes)."""
    plan = image_features(mm)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ------------------------------------------------------- perceptual hash


def test_phash_identical_payloads_collide_at_hamming_zero(spark):
    from trading_data_pipeline_spark.operators.multimodal import (
        attach_payload,
        phash_near_dup_pairs,
    )

    docs = spark.createDataFrame(
        [(1, "same text", "en", "s", 9), (2, "same text", "en", "s", 9),
         (3, "different words entirely", "en", "s", 24)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    pairs = {
        (r.doc_a, r.doc_b): r.hamming
        for r in phash_near_dup_pairs(attach_payload(docs)).collect()
    }
    assert pairs.get((1, 2)) == 0


def test_phash_banding_recall_is_exact(spark):
    """Every pair within the hamming radius must be found (pigeonhole),
    compared against brute-force popcount over all hashes."""
    from trading_data_pipeline_spark.operators.multimodal import (
        attach_payload,
        perceptual_hash,
        phash_near_dup_pairs,
    )

    docs = spark.createDataFrame(
        [(i, chr(65 + i) * (i + 1), "en", "s", i + 1) for i in range(12)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    def pattern_decode(payload, width, height):
        # controlled pixels: vertical split bitmap from the first payload
        # byte — nearby split points give nearby aHashes. Defined INSIDE
        # the test so cloudpickle ships it by value to executors.
        import numpy as np

        split = (payload[0] if payload else 0) % 9
        img = np.zeros((16, 16, 3), dtype=np.uint8)
        img[:, : split * 2, :] = 255
        return img

    mm = attach_payload(docs)
    hashes = {
        r.doc_id: r.phash
        for r in perceptual_hash(mm, decode=pattern_decode).collect()
    }
    want = {}
    ids = sorted(hashes)
    for i in ids:
        for j in ids:
            if i < j:
                h = bin((hashes[i] ^ hashes[j]) & (2**64 - 1)).count("1")
                if h <= 6:
                    want[(i, j)] = h
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in phash_near_dup_pairs(mm, max_hamming=6, decode=pattern_decode).collect()
    }
    assert got == want and len(want) > 0


def test_phash_rejects_hamming_beyond_pigeonhole_guarantee(spark):
    import pytest

    from trading_data_pipeline_spark.operators.multimodal import (
        attach_payload,
        phash_near_dup_pairs,
    )

    docs = spark.createDataFrame(
        [(1, "a b", "en", "s", 3)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    with pytest.raises(ValueError, match="pigeonhole"):
        phash_near_dup_pairs(attach_payload(docs), max_hamming=8)


# ------------------------------------------------ real container codecs


def test_ppm_roundtrip_bit_exact():
    """encode_ppm → decode_ppm is the identity on any uint8 HxWx3 image."""
    import numpy as np

    from trading_data_pipeline_spark.operators.multimodal import (
        decode_ppm,
        encode_ppm,
        fake_decode,
    )

    img = fake_decode(b"codec test payload", 21, 17)
    assert img.shape == (17, 21, 3)
    out = decode_ppm(encode_ppm(img))
    assert out.dtype == np.uint8 and np.array_equal(out, img)


def test_ppm_parses_comments_and_p5_gray():
    import numpy as np

    from trading_data_pipeline_spark.operators.multimodal import decode_ppm

    # P6 with a netpbm comment line inside the header
    raster = bytes(range(2 * 2 * 3))
    img = decode_ppm(b"P6\n# a comment\n2 2\n255\n" + raster)
    assert img.shape == (2, 2, 3) and img[0, 0, 0] == 0 and img[1, 1, 2] == 11
    # P5 grayscale replicates to 3 channels
    g = decode_ppm(b"P5\n2 1\n255\n" + bytes([7, 9]))
    assert g.shape == (1, 2, 3) and np.array_equal(g[0, 0], [7, 7, 7])


def test_wav_roundtrip_and_chunk_walk():
    import struct

    import numpy as np

    from trading_data_pipeline_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
    )

    samples = np.array([0, 1000, -1000, 32767, -32768, 3], dtype="<i2")
    wave, sr = decode_wav(encode_wav(samples, sample_rate=44100))
    assert sr == 44100 and np.array_equal(wave, samples)
    # container with an extra LIST chunk BEFORE data must still parse
    raw = encode_wav(samples)
    fmt_end = raw.index(b"data")
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    patched = raw[:fmt_end] + extra + raw[fmt_end:]
    patched = patched[:4] + struct.pack("<I", len(patched) - 8) + patched[8:]
    wave2, _ = decode_wav(patched)
    assert np.array_equal(wave2, samples)


def test_image_features_golden_over_real_ppm(spark):
    """The registered image path decodes REAL PPM containers: features
    must equal the hand-computed channel means of the resized source
    pixels — value-level, not shape-level."""
    import numpy as np

    from trading_data_pipeline_spark.operators.multimodal import (
        FAKE_H_MOD,
        FAKE_W_MOD,
        attach_media_payload,
        decode_auto,
        fake_decode,
        image_features,
        resize_nearest,
    )

    docs = spark.createDataFrame(
        [(0, "an image doc payload text"), (3, "another image document")],
        "doc_id long, text string",
    )
    mm = attach_media_payload(docs)
    got = {r.doc_id: r for r in image_features(mm, decode=decode_auto).collect()}
    for doc_id, text in [(0, "an image doc payload text"), (3, "another image document")]:
        tb = text.encode()
        w, h = len(tb) % FAKE_W_MOD + 16, len(tb) % FAKE_H_MOD + 16
        small = resize_nearest(fake_decode(tb, w, h), 8, 8)
        means = small.reshape(-1, 3).mean(axis=0)
        r = got[doc_id]
        assert (r.mean_r, r.mean_g, r.mean_b) == tuple(map(float, means))
        assert r.brightness == float(means.mean())
        assert (r.width, r.height) == (w, h)


def test_audio_features_golden_over_real_wav(spark):
    import numpy as np

    from trading_data_pipeline_spark.operators.multimodal import (
        attach_media_payload,
        audio_features,
    )

    text = "audio text that becomes samples!"
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    mm = attach_media_payload(docs)
    assert mm.first().payload[:4] == bytearray(b"RIFF")
    r = audio_features(mm).collect()[0]
    wave = np.frombuffer(text.encode(), dtype="<i2").astype(np.float64)
    assert r.n_samples == len(wave)
    assert r.rms == float(np.sqrt(np.mean(wave**2)))
    assert r.zero_crossings == int(np.count_nonzero(np.diff(np.signbit(wave))))


def test_registered_media_queries_cover_real_containers(spark, sf_dir):
    """q_image_features / q_audio_features decode genuine PPM/WAV built
    from the documents table — non-empty, finite features, media-typed."""
    import math

    from trading_data_pipeline_spark.registry import all_queries

    qs = all_queries()
    img = qs["q_image_features"].fn(spark, sf_dir).collect()
    assert img and all(r.media_type == "image" for r in img)
    assert all(0 <= r.brightness <= 255 and math.isfinite(r.brightness) for r in img)
    aud = qs["q_audio_features"].fn(spark, sf_dir).collect()
    assert aud and all(r.n_samples > 0 and math.isfinite(r.rms) for r in aud)
