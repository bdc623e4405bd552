"""Multimodal columns (extension E7): opaque binary payloads + typed metadata.

The engine treats image/audio/video as ``BinaryType`` columns carried
through the relational plan untouched, with a typed metadata struct
alongside (media_type, byte_len, content hash, declared dims). Heavy
per-item work — decode, feature extraction, resize, frame sampling — runs
as Arrow-batched ``mapInPandas`` stages so payload bytes never take the
row-at-a-time Python path.

The real codec step is STUBBED: image/audio libraries are not available
in this environment, so :func:`decode_image` raises ``NotImplementedError``
and the pipeline substitutes :func:`fake_decode` — a deterministic
payload-seeded pixel/sample generator. Everything AROUND the codec is
real and tested: schemas, Arrow batch shapes, partition-preserving
execution, and the numpy feature math itself (it runs on the fake pixels
exactly as it would on real ones).

Scale notes: payloads are the widest column by orders of magnitude — the
plan keeps them out of every shuffle (metadata-only projections for
joins/aggs; ``mapInPandas`` is a narrow transformation so feature
extraction never repartitions). ``spark.sql.execution.arrow.
maxRecordsPerBatch`` bounds batch memory for big payloads.

No reference parallel (the reference is tabular-only — SURVEY.md §2.e);
this is north-star scope from BASELINE.json.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Declared (not decoded) dimensions — derived deterministically from the
# payload length so the DuckDB oracle can reproduce them in pure SQL.
FAKE_W_MOD, FAKE_H_MOD = 48, 32

FEATURE_SCHEMA = (
    "doc_id long, media_type string, width int, height int, "
    "mean_r double, mean_g double, mean_b double, brightness double"
)

FRAME_SAMPLE_SCHEMA = "doc_id long, frame_idx int, frame_sha256 string, frame_bytes int"

AUDIO_SCHEMA = "doc_id long, n_samples int, rms double, zero_crossings int"


def attach_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """documents → multimodal table: binary payload + typed metadata struct.

    In production the payload arrives from ``spark.read.format('binaryFile')``
    or a parquet binary column; here it is derived from the text column so
    the synthetic corpus exercises the same plumbing.
    """
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.element_at(
                F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                (F.col("doc_id") % 3 + 1).cast("int"),
            ).alias("media_type"),
            F.octet_length(payload).alias("byte_len"),
            F.sha2(payload, 256).alias("sha256"),
            (F.octet_length(payload) % FAKE_W_MOD + 16).cast("int").alias("width"),
            (F.octet_length(payload) % FAKE_H_MOD + 16).cast("int").alias("height"),
        ).alias("meta"),
    )


def attach_media_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """documents → multimodal table with REAL container payloads: image
    rows carry a binary PPM (P6) whose pixels are deterministically
    derived from the text, audio rows a PCM RIFF/WAVE of text-derived
    int16 samples, video rows the raw bytes (demuxing stays the one
    honest stub). Same output schema as :func:`attach_payload`, but the
    decode stage downstream (:func:`decode_auto` / :func:`decode_wav`)
    performs a genuine container parse — header, dims, raster/chunk walk
    — instead of fabricating pixels.

    Container encoding is per-row Python work, so it runs as the same
    Arrow-batched ``mapInPandas`` discipline as every other payload stage
    (narrow, payloads never shuffle)."""
    import hashlib

    schema = (
        "doc_id long, payload binary, meta struct<media_type:string, "
        "byte_len:int, sha256:string, width:int, height:int>"
    )
    kinds = ("image", "audio", "video")

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"doc_id": [], "payload": [], "meta": []}
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                tb = str(text).encode("utf-8")
                w = len(tb) % FAKE_W_MOD + 16
                h = len(tb) % FAKE_H_MOD + 16
                kind = kinds[int(doc_id) % 3]
                if kind == "image":
                    payload = encode_ppm(fake_decode(tb, w, h))
                elif kind == "audio":
                    raw = tb[: len(tb) - (len(tb) % 2)] or b"\0\0"
                    payload = encode_wav(np.frombuffer(raw, dtype="<i2"))
                else:
                    payload = tb
                out["doc_id"].append(doc_id)
                out["payload"].append(payload)
                out["meta"].append(
                    {
                        "media_type": kind,
                        "byte_len": len(payload),
                        "sha256": hashlib.sha256(payload).hexdigest(),
                        "width": w,
                        "height": h,
                    }
                )
            yield pd.DataFrame(out)

    return docs.select("doc_id", text_col).mapInPandas(build, schema=schema)


def decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
    """Real codec path: PIL decode of the payload bytes → HxWx3 uint8.

    ``width``/``height`` are the DECLARED dims from the metadata struct;
    the real container's own dims win (they are read from the payload).
    Raises ``NotImplementedError`` where no codec library is installed —
    the sandbox substitutes :func:`fake_decode`; the Docker image ships
    Pillow and tests this path (tests/test_multimodal.py, PIL-gated).
    """
    try:
        import io

        from PIL import Image
    except ImportError as e:  # pragma: no cover — exercised only sans PIL
        raise NotImplementedError(
            "no image codec available (pip install pillow); "
            "the pipeline falls back to fake_decode "
            "(deterministic payload-seeded pixels)"
        ) from e
    img = Image.open(io.BytesIO(payload)).convert("RGB")
    return np.asarray(img, dtype=np.uint8)


def encode_ppm(img: np.ndarray) -> bytes:
    """Serialize an HxWx3 uint8 array as a binary PPM (P6) container —
    pure numpy/stdlib, no codec library. PPM is a real, widely-supported
    image format (netpbm), which makes the decode path below a genuine
    container parse rather than a stub."""
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Parse a binary PPM (P6) / PGM (P5) container → HxWx3 uint8.

    Pure numpy header+pixel parse (handles netpbm comment lines and any
    whitespace between header tokens); grayscale P5 replicates to 3
    channels so downstream channel stats see one shape."""
    if payload[:2] not in (b"P6", b"P5"):
        raise ValueError(f"not a binary PPM/PGM payload: {payload[:2]!r}")
    gray = payload[:2] == b"P5"
    # tokenize header: magic, width, height, maxval; '#' starts a comment
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # single whitespace byte after maxval, then raster
    w, h, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit netpbm rasters not supported")
    ch = 1 if gray else 3
    raster = np.frombuffer(payload, dtype=np.uint8, count=h * w * ch, offset=pos)
    img = raster.reshape(h, w, ch)
    return np.repeat(img, 3, axis=2) if gray else img


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """Serialize int16 mono samples as a PCM RIFF/WAVE container —
    pure numpy/stdlib."""
    import struct

    data = samples.astype("<i2").tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16
    )  # PCM, mono, 16-bit
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Parse a PCM RIFF/WAVE container → (int16 sample array, sample_rate).

    Walks the chunk list properly (chunks can appear in any order and
    carry odd-length padding), so containers with LIST/INFO chunks parse
    too. 16-bit PCM mono/stereo only; stereo is mixed down by averaging.
    """
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, n = 12, len(payload)
    sample_rate, n_channels, bits, data = None, None, None, None
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, n_channels, sample_rate = struct.unpack("<HHI", body[:8])
            (bits,) = struct.unpack("<H", body[14:16])
            if audio_fmt != 1 or bits != 16:
                raise ValueError("only 16-bit PCM WAV supported")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if sample_rate is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    wave = np.frombuffer(data[: len(data) - (len(data) % 2)], dtype="<i2")
    if n_channels and n_channels > 1:
        wave = wave[: len(wave) - (len(wave) % n_channels)]
        wave = wave.reshape(-1, n_channels).mean(axis=1).astype("<i2")
    return wave, sample_rate


def decode_auto(payload: bytes, width: int, height: int) -> np.ndarray:
    """Codec dispatch on the container magic: netpbm (P6/P5) parses in
    pure numpy; anything else goes to PIL when installed; otherwise the
    deterministic :func:`fake_decode` stand-in (the one remaining stub,
    for payloads that are not real containers)."""
    if payload[:2] in (b"P6", b"P5"):
        return decode_ppm(payload)
    try:
        return decode_image(payload, width, height)
    except NotImplementedError:
        return fake_decode(payload, width, height)


def fake_decode(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic stand-in decode: payload-seeded uint8 HxWx3 pixels.

    Same payload → same pixels, so feature tests are reproducible and the
    numpy feature math downstream is exercised on realistic shapes.
    """
    seed = int.from_bytes(payload[:8].ljust(8, b"\0"), "little", signed=False)
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbour resize in pure numpy (no codec dependency)."""
    h, w = img.shape[:2]
    rows = (np.arange(out_h) * h // out_h).astype(np.int64)
    cols = (np.arange(out_w) * w // out_w).astype(np.int64)
    return img[rows][:, cols]


def image_features(
    mm: DataFrame, out_w: int = 8, out_h: int = 8, decode=fake_decode
) -> DataFrame:
    """Decode → resize → channel stats, as one Arrow-batched mapInPandas stage.

    Narrow transformation: no shuffle, runs wherever the payload partitions
    already live. Output drops the payload (features only), so everything
    downstream shuffles kilobytes, not media bytes. ``decode`` is the codec
    hook — :func:`fake_decode` by default, :func:`decode_image` (PIL) where
    codecs are installed; the Spark plumbing is identical for both.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["meta"]
            ):
                img = decode(bytes(payload), meta["width"], meta["height"])
                small = resize_nearest(img, out_w, out_h)
                means = small.reshape(-1, 3).mean(axis=0)
                rows.append(
                    {
                        "doc_id": doc_id,
                        "media_type": meta["media_type"],
                        "width": meta["width"],
                        "height": meta["height"],
                        "mean_r": float(means[0]),
                        "mean_g": float(means[1]),
                        "mean_b": float(means[2]),
                        "brightness": float(means.mean()),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[f.split(" ")[0] for f in FEATURE_SCHEMA.split(", ")],
            )

    return mm.mapInPandas(extract, schema=FEATURE_SCHEMA)


def frame_sample(
    mm: DataFrame, frame_bytes: int = 64, every: int = 4
) -> DataFrame:
    """'Video' frame sampling: chunk the payload into fixed-size frames,
    keep every ``every``-th, fingerprint each kept frame.

    The chunk/stride/fingerprint plumbing is the real thing; only the
    notion that a frame is ``frame_bytes`` of payload is the stand-in for
    a container demuxer. One input row fans out to many output rows —
    mapInPandas handles 1:N natively (no explode of materialized arrays).
    """
    import hashlib

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "frame_idx": [], "frame_sha256": [], "frame_bytes": []
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                n_frames = max(1, len(raw) // frame_bytes)
                for idx in range(0, n_frames, every):
                    chunk = raw[idx * frame_bytes : (idx + 1) * frame_bytes]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["frame_sha256"].append(hashlib.sha256(chunk).hexdigest())
                    out["frame_bytes"].append(len(chunk))
            yield pd.DataFrame(out)

    return mm.mapInPandas(sample, schema=FRAME_SAMPLE_SCHEMA)


def audio_features(mm: DataFrame) -> DataFrame:
    """Audio features: RMS + zero-crossing count per payload, vectorized
    numpy per Arrow batch. RIFF/WAVE payloads go through the real
    container parse (:func:`decode_wav` — chunk walk, PCM validation,
    stereo mixdown); non-container payloads fall back to the legacy raw
    int16 view so synthetic fixtures keep working."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "n_samples": [], "rms": [], "zero_crossings": []
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                if raw[:4] == b"RIFF":
                    wave = decode_wav(raw)[0].astype(np.float64)
                else:
                    raw = raw[: len(raw) - (len(raw) % 2)] or b"\0\0"
                    wave = np.frombuffer(raw, dtype="<i2").astype(np.float64)
                out["doc_id"].append(doc_id)
                out["n_samples"].append(len(wave))
                out["rms"].append(float(np.sqrt(np.mean(wave**2))))
                out["zero_crossings"].append(
                    int(np.count_nonzero(np.diff(np.signbit(wave))))
                )
            yield pd.DataFrame(out)

    return mm.mapInPandas(extract, schema=AUDIO_SCHEMA)


PHASH_BITS = 64
PHASH_BANDS = 8  # 8 bands x 8 bits: any pair with hamming <= 7 shares a band


def perceptual_hash(mm: DataFrame, decode=fake_decode) -> DataFrame:
    """64-bit average-hash (aHash) per image: decode → 8×8 nearest resize
    → grayscale → mean-threshold bitmap packed into a long. Robust to
    re-encoding/resize (which change bytes but not content), which is
    exactly what the sha256 exact-dup key cannot see. Same Arrow
    ``mapInPandas`` discipline as :func:`image_features`: payloads never
    shuffle, the output is 8 bytes per image.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"doc_id": [], "phash": []}
            for doc_id, payload, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["meta"]
            ):
                img = decode(bytes(payload), meta["width"], meta["height"])
                small = resize_nearest(img, 8, 8)
                gray = small.astype(np.float64).mean(axis=2)
                bits = (gray > gray.mean()).flatten()
                v = 0
                for b in bits:
                    v = (v << 1) | int(b)
                if v >= 2**63:  # pack as signed long for the Spark column
                    v -= 2**64
                out["doc_id"].append(doc_id)
                out["phash"].append(v)
            yield pd.DataFrame(out)

    return mm.mapInPandas(extract, schema="doc_id long, phash long")


def phash_near_dup_pairs(
    mm: DataFrame,
    max_hamming: int = 6,
    decode=fake_decode,
    max_bucket: int | None = 1000,
) -> DataFrame:
    """Near-duplicate images by Hamming ball over the perceptual hash,
    with banded candidate generation: the 64-bit hash splits into
    PHASH_BANDS byte-keys, candidates share at least one exact band, and
    the verify is one ``bit_count(a XOR b)``. Pigeonhole guarantee: any
    pair within hamming ≤ PHASH_BANDS−1 differs in at most that many
    bytes, so at least one band matches — recall is EXACT (1.0) for
    ``max_hamming`` ≤ PHASH_BANDS−1 (enforced), not probabilistic like
    MinHash banding.

    Candidate cost is Σ|bucket|² per band, and with only 256 keys per
    band hot buckets are REAL (every uniform near-black/near-white image
    hashes to the same value), so pair generation reuses the text
    near-dup path's discipline: ONE groupBy per (band, key) bucket,
    pairs from the bucket's collected array, and ``max_bucket`` dropping
    degenerate buckets (uniform-image clusters belong to exact dedup
    upstream, not an m² pair blow-up here).
    """
    if max_hamming > PHASH_BANDS - 1:
        raise ValueError(
            f"max_hamming={max_hamming} voids the pigeonhole guarantee: "
            f"{PHASH_BANDS} bands only cover hamming <= {PHASH_BANDS - 1}"
        )
    ph = perceptual_hash(mm, decode=decode)
    bands = ph.select(
        "doc_id",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned(F.col("phash"), 8 * i)
                        .bitwiseAND(F.lit(255))
                        .alias("key"),
                    )
                    for i in range(PHASH_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "phash", "bk.band", "bk.key")
    grp = bands.groupBy("band", "key").agg(
        F.collect_list(F.struct("doc_id", "phash")).alias("ids")
    )
    size_ok = F.size("ids") >= 2
    if max_bucket is not None:
        size_ok = size_ok & (F.size("ids") <= max_bucket)
    cand = (
        grp.filter(size_ok)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ids, a -> filter(transform(ids, "
                    "b -> if(a.doc_id < b.doc_id, struct("
                    "a.doc_id as doc_a, b.doc_id as doc_b, "
                    "a.phash as ph_a, b.phash as ph_b), null)), "
                    "p -> p is not null)))"
                )
            ).alias("p")
        )
        .select("p.doc_a", "p.doc_b", "p.ph_a", "p.ph_b")
        .distinct()
    )
    ham = F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b")))
    return (
        cand.select("doc_a", "doc_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )
