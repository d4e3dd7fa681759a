"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The Spark side (schema, partitioning, Arrow batch shape, UDF signatures)
is real and tested; the codec kernels are stubbed — the container has no
image/audio libraries, so `decode_image` tries Pillow and otherwise
falls back to a clearly-marked deterministic fake that parses our own
fixture header format. Real decoders drop in behind the same signature.

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
