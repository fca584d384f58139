"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Design (the part that matters at 100 TB, and is fully real here):
  * media rides in a ``binary`` column next to a typed metadata struct
    (mime, width/height/duration, codec) — scans prune the binary column
    unless the stage actually decodes
  * decode / feature-extract / resize / frame-sample are Arrow-batched
    ``mapInPandas`` stages with explicit output schemas and bounded batch
    sizes (``spark.sql.execution.arrow.maxRecordsPerBatch`` controls peak
    memory: batches of big blobs must stay under executor headroom)
  * every stage is pure (bytes -> features), so stages are resumable and
    cache-friendly

The actual pixel/sample decoding needs codec libraries not present in this
container; the codec calls are isolated behind ``_decode_image`` /
``_decode_audio`` which raise NotImplementedError unless
``deterministic_fake=True`` (the default for tests/benches) substitutes a
seeded, content-derived fake decode — schema, batching, partitioning and
downstream math are identical either way.
"""

from __future__ import annotations

import hashlib
from typing import Iterator, List

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

IMAGE_FEATURES_SCHEMA = (
    "media_id string, width int, height int, channels int, "
    "mean_luma double, phash string"
)

AUDIO_FEATURES_SCHEMA = (
    "media_id string, sample_rate int, n_samples bigint, rms double, afp string"
)

FRAME_SAMPLE_SCHEMA = "media_id string, frame_idx int, frame_phash string"


def _decode_image(blob: bytes, deterministic_fake: bool):
    """Decode image bytes -> (width, height, channels, flat_pixels).

    STUB: real decoding requires an image codec (PIL/cv2), absent in this
    container.  The deterministic fake derives stable pseudo-pixels from the
    blob's md5 so the whole distributed pipeline is testable end-to-end.
    """
    if not deterministic_fake:
        raise NotImplementedError(
            "image codecs unavailable in this environment; pass "
            "deterministic_fake=True or install PIL/cv2 and implement here"
        )
    # the fake derives from the blob's hex string (not raw bytes) so an
    # external SQL oracle whose hash functions are VARCHAR-only can
    # replicate it bit-for-bit
    key = blob.hex().encode()
    h = hashlib.md5(key).digest()
    width = 16 + h[0] % 48
    height = 16 + h[1] % 48
    channels = 3
    # 64 stable pseudo-pixel bytes stretched over the claimed dimensions
    pix = hashlib.sha256(key).digest() + hashlib.sha256(b"p" + key).digest()
    return width, height, channels, pix


def _decode_audio(blob: bytes, deterministic_fake: bool):
    """Decode audio bytes -> (sample_rate, samples).  STUB like above."""
    if not deterministic_fake:
        raise NotImplementedError(
            "audio codecs unavailable in this environment; pass "
            "deterministic_fake=True or install soundfile/ffmpeg and implement"
        )
    key = blob.hex().encode()
    h = hashlib.md5(key).digest()
    rate = (8 + h[2] % 8) * 1000
    samples = [((b - 128) / 128.0) for b in hashlib.sha256(b"a" + key).digest()]
    return rate, samples


def image_features(media: DataFrame, deterministic_fake: bool = True) -> DataFrame:
    """(media_id, media binary) -> typed image features, Arrow-batched."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "width", "height", "channels", "mean_luma", "phash")}
            for mid, blob in zip(pdf["media_id"], pdf["media"]):
                blob = bytes(blob)
                w, hgt, c, pix = _decode_image(blob, deterministic_fake)
                luma = sum(pix) / len(pix) / 255.0
                bits = "".join("1" if b >= pix[0] else "0" for b in pix[:64])
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(hgt)
                out["channels"].append(c)
                out["mean_luma"].append(round(luma, 6))
                out["phash"].append(f"{int(bits, 2):016x}")
            yield pd.DataFrame(out)

    return media.select("media_id", "media").mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)


def audio_features(media: DataFrame, deterministic_fake: bool = True) -> DataFrame:
    """(media_id, media binary) -> typed audio features, Arrow-batched."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "sample_rate", "n_samples", "rms", "afp")}
            for mid, blob in zip(pdf["media_id"], pdf["media"]):
                blob = bytes(blob)
                rate, samples = _decode_audio(blob, deterministic_fake)
                rms = (sum(s * s for s in samples) / len(samples)) ** 0.5
                afp = hashlib.md5(
                    b"".join(b"1" if s >= 0 else b"0" for s in samples)
                ).hexdigest()
                out["media_id"].append(mid)
                out["sample_rate"].append(rate)
                out["n_samples"].append(len(samples))
                out["rms"].append(round(rms, 6))
                out["afp"].append(afp)
            yield pd.DataFrame(out)

    return media.select("media_id", "media").mapInPandas(run, schema=AUDIO_FEATURES_SCHEMA)


def sample_frames(
    media: DataFrame, every_nth: int = 2, max_frames: int = 4, deterministic_fake: bool = True
) -> DataFrame:
    """Frame sampling for video blobs: one row per sampled frame.

    Real decoders would seek keyframes; the fake derives per-frame hashes
    from (blob, frame_idx).  The *shape* — explode one blob row into K
    bounded feature rows inside the Arrow batch, never materializing frames
    as a column — is the production pattern.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "frame_phash": []}
            for mid, blob in zip(pdf["media_id"], pdf["media"]):
                blob = bytes(blob)
                if not deterministic_fake:
                    raise NotImplementedError("video codecs unavailable; see module doc")
                n = max_frames
                key = blob.hex()
                for k in range(0, n * every_nth, every_nth):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(k)
                    out["frame_phash"].append(
                        hashlib.md5(f"{key}:{k}".encode()).hexdigest()[:16]
                    )
            yield pd.DataFrame(out)

    return media.select("media_id", "media").mapInPandas(run, schema=FRAME_SAMPLE_SCHEMA)


def synthesize_media(spark: SparkSession, n: int, kind: str = "image") -> DataFrame:
    """Deterministic fake media table (media_id, mime, media binary) for
    tests/benches; blob bytes derived from the id."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, mimes, blobs = [], [], []
            for i in pdf["id"]:
                i = int(i)
                ids.append(f"{kind}-{i}")
                mimes.append(f"{kind}/fake")
                blobs.append(hashlib.sha256(f"{kind}:{i}".encode()).digest() * 4)
            yield pd.DataFrame({"media_id": ids, "mime": mimes, "media": blobs})

    return spark.range(n).mapInPandas(gen, schema="media_id string, mime string, media binary")
