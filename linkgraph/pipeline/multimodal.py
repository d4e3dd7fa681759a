"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The Spark side (schema, partitioning, Arrow batch shape, UDF signatures)
is real and tested. Kernels decoded FOR REAL with stdlib only: WAV
(``wave``), uncompressed BMP (header math), and 8-bit non-interlaced
PNG (``zlib`` inflate + scanline unfilter). Remaining codec-dependent
formats (JPEG, palette/16-bit PNG, video) try Pillow and otherwise
raise a clearly-marked NotImplementedError — the honest stub boundary;
real decoders drop in behind the same signature.

Fixture binary format (deterministic fake "image"):
    b"FAKEIMG" + width:uint16 + height:uint16 + channels:uint8 + payload
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FAKE_MAGIC = b"FAKEIMG"

IMAGE_META_SCHEMA = (
    "id bigint, width int, height int, channels int, n_bytes bigint, mean_value double"
)


def encode_fake_image(width: int, height: int, channels: int, seed: int) -> bytes:
    """Deterministic fixture image: header + seeded byte payload."""
    rng = np.random.default_rng(seed)
    payload = rng.integers(0, 256, size=width * height * channels, dtype=np.uint8)
    return FAKE_MAGIC + struct.pack("<HHB", width, height, channels) + payload.tobytes()


def decode_image_bytes(blob: bytes) -> dict:
    """Decode one image blob to metadata + pixel stats.

    Tries a real decoder (Pillow) if importable; otherwise requires the
    deterministic fake format. Raises NotImplementedError for real image
    bytes when no codec library is present — by design (stub boundary).
    """
    if blob.startswith(FAKE_MAGIC):
        w, h, c = struct.unpack("<HHB", blob[7:12])
        px = np.frombuffer(blob[12 : 12 + w * h * c], dtype=np.uint8)
        return {
            "width": w,
            "height": h,
            "channels": c,
            "n_bytes": len(blob),
            "mean_value": float(px.mean()) if px.size else 0.0,
        }
    if blob.startswith(b"BM") and len(blob) >= 54:
        # REAL uncompressed 24/32-bit BMP: pure header math, no codec
        # needed (BITMAPINFOHEADER layout; rows bottom-up, 4-byte padded)
        off, = struct.unpack_from("<I", blob, 10)
        w, h = struct.unpack_from("<ii", blob, 18)
        bpp, = struct.unpack_from("<H", blob, 28)
        comp, = struct.unpack_from("<I", blob, 30)
        if comp == 0 and bpp in (24, 32):
            c = bpp // 8
            habs = abs(h)
            stride = (w * c + 3) & ~3
            # validate the header against the actual buffer: corrupt or
            # truncated headers must raise cleanly (callers route this
            # through on_error), never feed negative counts to numpy
            if w <= 0 or habs == 0 or off + stride * habs > len(blob):
                raise ValueError("corrupt BMP: header inconsistent with buffer")
            rows = [
                np.frombuffer(blob, dtype=np.uint8, count=w * c, offset=off + r * stride)
                for r in range(habs)
            ]
            px = np.concatenate(rows) if rows else np.array([], dtype=np.uint8)
            return {
                "width": w,
                "height": habs,
                "channels": c,
                "n_bytes": len(blob),
                "mean_value": float(px.mean()) if px.size else 0.0,
            }
    if blob.startswith(PNG_MAGIC):
        # REAL PNG: stdlib zlib + IHDR chunk walk + per-scanline
        # unfiltering — no codec library needed (8-bit, non-interlaced;
        # palette/16-bit/interlaced still route to the Pillow fallback)
        meta = _decode_png_bytes(blob)
        if meta is not None:
            return meta
    if blob.startswith((b"GIF87a", b"GIF89a")) and len(blob) >= 11:
        # REAL GIF header: logical-screen width/height (u16 LE at 6/8)
        # + palette size from the packed flags byte; pixels (LZW) stay
        # behind the Pillow stub boundary
        w, h = struct.unpack_from("<HH", blob, 6)
        packed = blob[10]
        if w > 0 and h > 0:
            return {
                "width": w,
                "height": h,
                # color resolution bits -> treat as paletted single plane
                "channels": 1 if packed & 0x80 else 0,
                "n_bytes": len(blob),
                "mean_value": None,  # pixels not decoded (stub boundary)
            }
    if blob.startswith(b"\xff\xd8"):
        # REAL JPEG header: SOF marker walk (ITU T.81 §B.2.2) gives
        # dimensions/components with no codec; pixel decode (and so
        # mean_value) stays behind the Pillow stub boundary
        meta = _jpeg_header_dims(blob)
        if meta is not None:
            return meta
    try:  # pragma: no cover - codec not installed in this container
        import io

        from PIL import Image

        img = Image.open(io.BytesIO(blob))
        arr = np.asarray(img)
        return {
            "width": img.width,
            "height": img.height,
            "channels": arr.shape[2] if arr.ndim == 3 else 1,
            "n_bytes": len(blob),
            "mean_value": float(arr.mean()),
        }
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "real image decoding needs Pillow; only the FAKEIMG fixture "
            "format is supported in this container"
        ) from e


def _jpeg_header_dims(blob: bytes) -> dict | None:
    """Walk JPEG segment markers to the first SOFn (0xC0-0xCF except
    DHT/JPG/DAC) and read precision/height/width/components — header
    math only (T.81 §B.2.2), no entropy decode. Returns None on a
    malformed stream so the caller can fall through to Pillow."""
    i = 2  # past SOI
    n = len(blob)
    while i + 4 <= n:
        if blob[i] != 0xFF:
            return None
        marker = blob[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2  # standalone markers carry no length
            continue
        if marker == 0xD9 or marker == 0xDA:
            return None  # EOI / start-of-scan before any SOF
        (seg_len,) = struct.unpack_from(">H", blob, i + 2)
        if seg_len < 2 or i + 2 + seg_len > n:
            return None
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if seg_len < 8:
                return None
            _prec, h, w, comps = struct.unpack_from(">BHHB", blob, i + 4)
            if w == 0 or h == 0:
                return None
            return {
                "width": w,
                "height": h,
                "channels": comps,
                "n_bytes": len(blob),
                "mean_value": None,  # pixels not decoded (stub boundary)
            }
        i += 2 + seg_len
    return None


PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # gray, rgb, gray+a, rgba


def _png_unfilter(raw: bytes, w: int, h: int, c: int) -> np.ndarray:
    """Reverse the PNG per-scanline filters (spec §9: None/Sub/Up/
    Average/Paeth). Sub is a strided cumulative sum; Average/Paeth have
    a left-pixel dependency and fall back to a per-byte loop — fine at
    metadata scale, and fixture PNGs are filter-0."""
    stride = w * c
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    pos = 0
    for r in range(h):
        ftype = raw[pos]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos + 1)
        pos += 1 + stride
        if ftype == 0:
            rec = line.astype(np.int64)
        elif ftype == 1:  # Sub: recon[x] = line[x] + recon[x-c]
            rec = line.astype(np.int64).copy()
            for k in range(c):
                rec[k::c] = np.cumsum(rec[k::c]) % 256
        elif ftype == 2:  # Up
            rec = (line + prev) % 256
        else:  # Average (3) / Paeth (4): sequential left dependency
            rec = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                a = rec[x - c] if x >= c else 0
                b = prev[x]
                if ftype == 3:
                    rec[x] = (line[x] + (a + b) // 2) % 256
                else:
                    cc = prev[x - c] if x >= c else 0
                    p = a + b - cc
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                    rec[x] = (line[x] + pred) % 256
        out[r] = rec.astype(np.uint8)
        prev = rec
    return out


def _decode_png_bytes(blob: bytes) -> dict | None:
    """Parse PNG chunks; returns metadata + pixel mean for 8-bit
    non-interlaced gray/rgb/rgba, None for variants we leave to a real
    codec (palette, 16-bit, interlaced)."""
    import zlib

    pos = len(PNG_MAGIC)
    w = h = depth = ctype = interlace = None
    idat = bytearray()
    while pos + 8 <= len(blob):
        (length,) = struct.unpack_from(">I", blob, pos)
        tag = blob[pos + 4 : pos + 8]
        data = blob[pos + 8 : pos + 8 + length]
        pos += 12 + length  # len + tag + data + crc
        if tag == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
        elif tag == b"IDAT":
            idat.extend(data)
        elif tag == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("corrupt PNG: missing IHDR/IDAT")
    c = _PNG_CHANNELS.get(ctype)
    if c is None or depth != 8 or interlace != 0:
        return None  # palette/16-bit/interlaced -> real codec fallback
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (w * c + 1):
        raise ValueError("corrupt PNG: IDAT size inconsistent with IHDR")
    px = _png_unfilter(raw, w, h, c)
    return {
        "width": w,
        "height": h,
        "channels": c,
        "n_bytes": len(blob),
        "mean_value": float(px.mean()) if px.size else 0.0,
    }


def encode_png(pixels: np.ndarray) -> bytes:
    """Minimal PNG writer (filter-0 scanlines) for fixtures/round-trip
    tests: (h, w) gray or (h, w, c) for rgb/rgba uint8 arrays."""
    import zlib

    if pixels.ndim == 2:
        h, w, c = pixels.shape[0], pixels.shape[1], 1
        flat = pixels.reshape(h, w)
        ctype = 0
    else:
        h, w, c = pixels.shape
        flat = pixels.reshape(h, w * c)
        ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    scan = b"".join(b"\x00" + flat[r].tobytes() for r in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scan))
        + chunk(b"IEND", b"")
    )


_IMAGE_NULL_META = {
    "width": None, "height": None, "channels": None, "n_bytes": None,
    "mean_value": None,
}


def image_metadata(
    df: DataFrame,
    id_col: str = "id",
    blob_col: str = "image",
    on_error: str = "raise",
) -> DataFrame:
    """(id, width, height, channels, n_bytes, mean_value) via mapInPandas —
    Arrow-batched; the per-image decode is the sanctioned slow path.

    ``on_error="null"`` null-pads rows whose blobs fail to decode
    (corrupt headers, unsupported formats) instead of aborting the
    stage — the right mode for a web-crawl corpus where some blobs are
    always broken. The default raises, keeping the honest-stub boundary
    visible in tests."""

    def _one(blob: bytes) -> dict:
        if on_error == "null":
            try:
                return decode_image_bytes(blob)
            except Exception:
                return dict(_IMAGE_NULL_META)
        return decode_image_bytes(blob)

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = [_one(bytes(b)) for b in pdf[blob_col]]
            out = pd.DataFrame(metas)
            out.insert(0, "id", pdf[id_col].values)
            yield out

    return df.select(
        F.col(id_col).alias("id"), F.col(blob_col).alias(blob_col)
    ).mapInPandas(_batches, IMAGE_META_SCHEMA)


def resize_stub(df: DataFrame, width: int, height: int, blob_col: str = "image") -> DataFrame:
    """Resize plumbing: schema/partition-preserving identity transform with
    the real UDF signature; the kernel raises until a codec lib exists."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:  # pragma: no cover
        raise NotImplementedError("image resize needs a codec library (Pillow)")
        yield  # noqa: unreachable — generator shape

    return df.mapInPandas(_batches, df.schema)


def frame_sample_stub(
    df: DataFrame, every_n: int = 30, blob_col: str = "video"
) -> DataFrame:
    """Video frame sampling plumbing (schema real, kernel stubbed)."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:  # pragma: no cover
        raise NotImplementedError("video decoding needs an av library")
        yield

    return df.mapInPandas(_batches, df.schema)


# ---------------------------------------------------------------------------
# audio: REAL WAV decode via stdlib `wave` — no external codec needed
# ---------------------------------------------------------------------------

AUDIO_STATS_SCHEMA = (
    "id bigint, sample_rate int, n_channels int, n_frames bigint, "
    "duration_s double, rms double, peak double"
)


def decode_wav_bytes(blob: bytes) -> dict:
    """Parse a real RIFF/WAV blob (stdlib ``wave`` + numpy — present in
    any Python, so unlike the image path this is NOT a stub) and compute
    duration/RMS/peak over the PCM samples."""
    import io
    import wave

    with wave.open(io.BytesIO(blob)) as w:
        rate, nch, nframes = w.getframerate(), w.getnchannels(), w.getnframes()
        width = w.getsampwidth()
        raw = w.readframes(nframes)
    if width == 2:
        samples = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 1:
        samples = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise NotImplementedError(f"{width * 8}-bit PCM not supported")
    rms = float(np.sqrt(np.mean(samples**2))) if samples.size else 0.0
    peak = float(np.max(np.abs(samples))) if samples.size else 0.0
    return {
        "sample_rate": rate,
        "n_channels": nch,
        "n_frames": nframes,
        "duration_s": nframes / rate if rate else 0.0,
        "rms": rms,
        "peak": peak,
    }


_AUDIO_NULL_META = {
    "sample_rate": None, "n_channels": None, "n_frames": None,
    "duration_s": None, "rms": None, "peak": None,
}


def audio_stats(
    df: DataFrame,
    id_col: str = "id",
    blob_col: str = "audio",
    on_error: str = "raise",
) -> DataFrame:
    """Arrow-batched WAV stats over a binary audio column — the same
    mapInPandas shape as image_metadata, but with a fully real kernel.
    ``on_error="null"`` null-pads undecodable blobs (truncated RIFF,
    unsupported PCM widths) instead of failing the stage."""

    def _one(blob: bytes) -> dict:
        if on_error == "null":
            try:
                return decode_wav_bytes(blob)
            except Exception:
                return dict(_AUDIO_NULL_META)
        return decode_wav_bytes(blob)

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for i, blob in zip(pdf[id_col], pdf[blob_col]):
                rows.append({"id": i, **_one(bytes(blob))})
            yield pd.DataFrame(rows)

    return df.select(
        F.col(id_col).alias(id_col), F.col(blob_col).alias(blob_col)
    ).mapInPandas(_batches, AUDIO_STATS_SCHEMA)
