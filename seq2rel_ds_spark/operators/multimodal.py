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


def encode_bmp(width: int, height: int, pixels_rgb: bytes) -> bytes:
    """Encode top-down RGB pixels as an uncompressed 24-bit BMP (BGR rows,
    bottom-up, 4-byte padded) — pure struct packing, no codec library.
    ``pixels_rgb`` is row-major top-down, 3 bytes per pixel."""
    import struct

    if len(pixels_rgb) != width * height * 3:
        raise ValueError("pixels_rgb must be width*height*3 bytes")
    row_bytes = width * 3
    pad = (4 - row_bytes % 4) % 4
    body = bytearray()
    for y in range(height - 1, -1, -1):  # bottom-up
        row = pixels_rgb[y * row_bytes : (y + 1) * row_bytes]
        for x in range(width):  # RGB -> BGR
            r, g, b = row[x * 3 : x * 3 + 3]
            body += bytes((b, g, r))
        body += b"\x00" * pad
    data_offset = 14 + 40
    file_size = data_offset + len(body)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, data_offset)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return header + info + bytes(body)


def _decode_bmp(blob: bytes):
    """Parse an uncompressed 24-bit BMP -> (width, height, 3, top-down RGB
    bytes).  Inverse of ``encode_bmp``; rejects compressed/other-depth BMPs
    loudly rather than guessing."""
    import struct

    if len(blob) < 54:
        raise ValueError("truncated BMP header")
    magic, _fsize, _r1, _r2, data_offset = struct.unpack_from("<2sIHHI", blob, 0)
    hdr_size, width, height, _planes, bpp, compression = struct.unpack_from(
        "<IiiHHI", blob, 14
    )
    if magic != b"BM" or hdr_size < 40:
        raise ValueError("not a BITMAPINFOHEADER BMP")
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only uncompressed 24-bit BMP supported (got bpp={bpp}, "
            f"compression={compression})"
        )
    bottom_up = height > 0
    height = abs(height)
    row_bytes = width * 3
    stride = row_bytes + (4 - row_bytes % 4) % 4
    out = bytearray(width * height * 3)
    for y in range(height):
        src_y = (height - 1 - y) if bottom_up else y
        row = blob[data_offset + src_y * stride : data_offset + src_y * stride + row_bytes]
        if len(row) < row_bytes:
            raise ValueError("truncated BMP pixel data")
        for x in range(width):  # BGR -> RGB
            b, g, r = row[x * 3 : x * 3 + 3]
            out[(y * width + x) * 3 : (y * width + x) * 3 + 3] = bytes((r, g, b))
    return width, height, 3, bytes(out)


def encode_wav(sample_rate: int, samples) -> bytes:
    """Encode 16-bit signed PCM mono samples as a RIFF/WAVE blob — pure
    struct packing, no codec library."""
    import struct

    data = b"".join(struct.pack("<h", int(s)) for s in samples)
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    out = b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)) + b"WAVE"
    out += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(data)) + data
    return out


def _decode_wav(blob: bytes):
    """Parse a PCM 16-bit mono RIFF/WAVE blob -> (sample_rate, [floats in
    [-1, 1)]).  Walks RIFF chunks; rejects non-PCM loudly."""
    import struct

    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE blob")
    pos, rate, data = 12, None, None
    while pos + 8 <= len(blob):
        cid, size = struct.unpack_from("<4sI", blob, pos)
        body = blob[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt_tag, channels, rate, _br, _ba, bits = struct.unpack_from("<HHIIHH", body, 0)
            if fmt_tag != 1 or bits != 16 or channels != 1:
                raise NotImplementedError(
                    f"only PCM 16-bit mono supported (fmt={fmt_tag}, "
                    f"bits={bits}, channels={channels})"
                )
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    n = len(data) // 2
    samples = [struct.unpack_from("<h", data, 2 * i)[0] / 32768.0 for i in range(n)]
    return rate, samples


def _decode_image(blob: bytes, deterministic_fake: bool):
    """Decode image bytes -> (width, height, channels, flat_pixels).

    Uncompressed 24-bit BMP decodes for REAL (``_decode_bmp`` — pure struct
    parsing, no codec library needed).  Compressed formats (JPEG/PNG/...)
    require codec libraries absent from this container; for those the
    deterministic fake derives stable pseudo-pixels from the blob's md5 so
    the distributed pipeline stays testable end-to-end, and without the
    fake flag they raise loudly.
    """
    if blob[:2] == b"BM":
        return _decode_bmp(blob)
    if not deterministic_fake:
        # optional real path: if a codec library is installed (absent from
        # this container), compressed formats decode for real — the guard
        # is structured so the capability flips on without code changes
        try:
            import io

            from PIL import Image  # noqa: F401
        except ImportError:
            raise NotImplementedError(
                "compressed image codecs unavailable in this environment; "
                "pass deterministic_fake=True, supply uncompressed BMP, or "
                "install pillow (this branch then decodes for real)"
            ) from None
        img = Image.open(io.BytesIO(blob)).convert("RGB")
        return img.width, img.height, 3, img.tobytes()
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
    """Decode audio bytes -> (sample_rate, samples in [-1, 1)).

    PCM 16-bit mono RIFF/WAVE decodes for REAL (``_decode_wav``); compressed
    codecs (mp3/ogg/...) need libraries absent here — fake or raise, as for
    images."""
    if blob[:4] == b"RIFF":
        return _decode_wav(blob)
    if not deterministic_fake:
        # optional real path, mirroring _decode_image: soundfile (absent
        # from this container) decodes compressed audio when installed
        try:
            import io

            import soundfile  # noqa: F401
        except ImportError:
            raise NotImplementedError(
                "compressed audio codecs unavailable in this environment; "
                "pass deterministic_fake=True, supply PCM WAV, or install "
                "soundfile (this branch then decodes for real)"
            ) from None
        samples, rate = soundfile.read(io.BytesIO(blob), dtype="float64")
        if getattr(samples, "ndim", 1) > 1:  # downmix to mono
            samples = samples.mean(axis=1)
        return int(rate), [float(s) for s in samples]
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


def synthesize_bmp_media(spark: SparkSession, n: int) -> DataFrame:
    """Deterministic table of VALID uncompressed 24-bit BMP blobs (media_id,
    mime, media binary) — real bytes for the real decode path.  Dimensions
    and pixel values are closed-form in the id so an external SQL oracle can
    restate every decoded feature without parsing BMP:
      width = 6 + id%5, height = 4 + id%4,
      pixel value at flat top-down RGB offset p = (id*7 + y*31 + x*13 + c*5) % 256
    (y = p // (w*3), x = (p %% (w*3)) // 3, c = p % 3)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, mimes, blobs = [], [], []
            for i in pdf["id"]:
                i = int(i)
                w, h = 6 + i % 5, 4 + i % 4
                pix = bytes(
                    (i * 7 + y * 31 + x * 13 + c * 5) % 256
                    for y in range(h)
                    for x in range(w)
                    for c in range(3)
                )
                ids.append(f"bmp-{i}")
                mimes.append("image/bmp")
                blobs.append(encode_bmp(w, h, pix))
            yield pd.DataFrame({"media_id": ids, "mime": mimes, "media": blobs})

    return spark.range(n).mapInPandas(gen, schema="media_id string, mime string, media binary")


def synthesize_wav_media(spark: SparkSession, n: int) -> DataFrame:
    """Deterministic table of VALID PCM 16-bit mono WAV blobs; closed form:
    sample_rate = 8000 + 1000*(id%5), n_samples = 32 + id%17,
    raw sample k = ((id*97 + k*57) % 4001) - 2000."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, mimes, blobs = [], [], []
            for i in pdf["id"]:
                i = int(i)
                rate = 8000 + 1000 * (i % 5)
                samples = [((i * 97 + k * 57) % 4001) - 2000 for k in range(32 + i % 17)]
                ids.append(f"wav-{i}")
                mimes.append("audio/wav")
                blobs.append(encode_wav(rate, samples))
            yield pd.DataFrame({"media_id": ids, "mime": mimes, "media": blobs})

    return spark.range(n).mapInPandas(gen, schema="media_id string, mime string, media binary")


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
