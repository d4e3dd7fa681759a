"""AVI video frame sampling in stdlib + numpy (public spec: the RIFF
AVI container, Microsoft "AVI RIFF File Reference").

A container parse is all a frame sampler needs: walk the RIFF tree to
the ``movi`` LIST, pick every Nth ``00dc``/``00db`` chunk, and decode
each sampled frame — MJPEG frames (fourcc ``MJPG``, each chunk a
standalone baseline JPEG) route through ``jpeg.decode_jpeg``; raw DIB
frames (BI_RGB, 24/32-bit, bottom-up rows padded to 4 bytes) are plain
header math like BMP. Compressed codecs (H.264 & co) try ``av`` and
otherwise raise NotImplementedError — the honest stub boundary.

Also provides ``encode_avi`` — a minimal writer for fixtures and
round-trip tests (MJPEG via our near-lossless encoder, or raw DIB).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.pipeline import jpeg

VIDEO_FRAME_SCHEMA = (
    "id bigint, frame_index int, width int, height int, channels int, "
    "mean_value double"
)


def _chunks(blob: bytes, pos: int, end: int):
    """Yield (fourcc, payload_start, payload_size) over a RIFF chunk run;
    chunks are word-aligned (padded to even size)."""
    while pos + 8 <= end:
        fourcc = blob[pos : pos + 4]
        (size,) = struct.unpack_from("<I", blob, pos + 4)
        yield fourcc, pos + 8, size
        pos += 8 + size + (size & 1)


def parse_avi(blob: bytes) -> dict:
    """Parse an AVI container: main header dims/frame count, the video
    stream's handler + BITMAPINFOHEADER, and the movi frame chunks as
    (fourcc, start, size) spans. No frame decoding happens here."""
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"AVI ":
        raise ValueError("corrupt AVI: not a RIFF/AVI stream")
    info: dict = {"frames": [], "handler": None, "bmih": None,
                  "width": None, "height": None, "n_frames": None}

    def walk(pos: int, end: int) -> None:
        for fourcc, start, size in _chunks(blob, pos, end):
            if start + size > len(blob):
                raise ValueError("corrupt AVI: chunk overruns buffer")
            if fourcc == b"LIST":
                kind = blob[start : start + 4]
                if kind in (b"hdrl", b"strl", b"movi"):
                    walk(start + 4, start + size)
            elif fourcc == b"avih":
                if size < 40:
                    raise ValueError("corrupt AVI: short avih")
                info["n_frames"] = struct.unpack_from("<I", blob, start + 16)[0]
                info["width"] = struct.unpack_from("<I", blob, start + 32)[0]
                info["height"] = struct.unpack_from("<I", blob, start + 36)[0]
            elif fourcc == b"strh":
                if size >= 8 and blob[start : start + 4] == b"vids":
                    info["handler"] = blob[start + 4 : start + 8]
            elif fourcc == b"strf":
                if info["bmih"] is None and size >= 40:
                    info["bmih"] = blob[start : start + 40]
            elif fourcc[2:4] in (b"dc", b"db"):
                info["frames"].append((fourcc, start, size))

    walk(12, len(blob))
    if info["width"] is None or not info["frames"]:
        raise ValueError("corrupt AVI: missing avih header or frames")
    return info


def _decode_dib_frame(data: bytes, bmih: bytes) -> np.ndarray:
    """Raw BI_RGB DIB frame: bottom-up rows, 4-byte padded — the same
    math as uncompressed BMP, minus the file header."""
    w, h = struct.unpack_from("<ii", bmih, 4)
    (bpp,) = struct.unpack_from("<H", bmih, 14)
    (comp,) = struct.unpack_from("<I", bmih, 16)
    if comp != 0 or bpp not in (24, 32):
        raise NotImplementedError(f"DIB compression={comp} bpp={bpp} not supported")
    c = bpp // 8
    habs = abs(h)
    stride = (w * c + 3) & ~3
    if w <= 0 or habs == 0 or stride * habs > len(data):
        raise ValueError("corrupt AVI: DIB frame inconsistent with header")
    rows = np.frombuffer(data, dtype=np.uint8, count=stride * habs).reshape(habs, stride)
    px = rows[:, : w * c].reshape(habs, w, c)
    if h > 0:  # bottom-up storage -> flip to top-down
        px = px[::-1]
    return px


def decode_avi_frames(blob: bytes, every_n: int = 1) -> Iterator[tuple[int, np.ndarray]]:
    """Yield (frame_index, pixels) for every Nth frame of an AVI blob."""
    if every_n < 1:
        raise ValueError("every_n must be >= 1")
    info = parse_avi(blob)
    handler = (info["handler"] or b"").upper()
    for i, (fourcc, start, size) in enumerate(info["frames"]):
        if i % every_n:
            continue
        data = blob[start : start + size]
        if fourcc[2:4] == b"db":
            if info["bmih"] is None:
                raise ValueError("corrupt AVI: raw frame without strf header")
            yield i, _decode_dib_frame(data, info["bmih"])
        elif handler in (b"MJPG", b"JPEG") or data[:2] == b"\xff\xd8":
            yield i, jpeg.decode_jpeg(data)
        else:
            try:  # pragma: no cover - codec not installed in this container
                import av  # noqa: F401
            except ImportError as e:
                raise NotImplementedError(
                    f"AVI codec {handler!r} needs an av library; only MJPEG "
                    "and raw-DIB streams decode natively"
                ) from e
            raise NotImplementedError(f"codec {handler!r} not wired to av")


_FRAME_NULL = {"frame_index": None, "width": None, "height": None,
               "channels": None, "mean_value": None}


def video_frame_stats(
    df: DataFrame,
    every_n: int = 30,
    id_col: str = "id",
    blob_col: str = "video",
    on_error: str = "raise",
) -> DataFrame:
    """Sample every Nth frame of each AVI blob and emit per-frame stats —
    Arrow-batched mapInPandas, one output row per sampled frame (the
    row-count amplification is per-blob, so partitioning by input rows
    still bounds task memory by the largest single video)."""

    def _rows(vid, blob: bytes) -> list[dict]:
        out = []
        for idx, px in decode_avi_frames(bytes(blob), every_n):
            out.append({
                "id": vid,
                "frame_index": idx,
                "width": int(px.shape[1]),
                "height": int(px.shape[0]),
                "channels": int(px.shape[2]) if px.ndim == 3 else 1,
                "mean_value": float(px.mean()) if px.size else 0.0,
            })
        return out

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: list[dict] = []
            for vid, blob in zip(pdf[id_col], pdf[blob_col]):
                if on_error == "null":
                    try:
                        rows.extend(_rows(vid, blob))
                    except Exception:
                        rows.append({"id": vid, **_FRAME_NULL})
                else:
                    rows.extend(_rows(vid, blob))
            yield pd.DataFrame(rows, columns=[
                "id", "frame_index", "width", "height", "channels", "mean_value"
            ])

    return df.select(
        F.col(id_col).alias(id_col), F.col(blob_col).alias(blob_col)
    ).mapInPandas(_batches, VIDEO_FRAME_SCHEMA)


def extract_frames(
    df: DataFrame,
    every_n: int = 30,
    id_col: str = "id",
    blob_col: str = "video",
    resize_to: tuple[int, int] | None = None,
    on_error: str = "raise",
) -> DataFrame:
    """Sample every Nth frame of each AVI blob and emit the frames as
    standalone PNG image blobs — the video→image leg of a training-data
    pipeline (the output column feeds image_metadata / resize_images /
    image_dhash directly). Optional ``resize_to=(w, h)`` resamples
    (bilinear) inside the same task, so full-size frames never hit the
    shuffle. Schema: (id, frame_index, image binary)."""
    from linkgraph.pipeline.multimodal import encode_png, resize_pixels

    def _rows(vid, blob: bytes) -> list[dict]:
        out = []
        for idx, px in decode_avi_frames(bytes(blob), every_n):
            if px.ndim == 2:
                px = px.reshape(*px.shape, 1)
            if resize_to is not None:
                px = resize_pixels(px, resize_to[0], resize_to[1], "bilinear")
            out.append({
                "id": vid,
                "frame_index": idx,
                "image": encode_png(px[:, :, 0] if px.shape[2] == 1 else px),
            })
        return out

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: list[dict] = []
            for vid, blob in zip(pdf[id_col], pdf[blob_col]):
                if on_error == "null":
                    try:
                        rows.extend(_rows(vid, blob))
                    except Exception:
                        rows.append({"id": vid, "frame_index": None, "image": None})
                else:
                    rows.extend(_rows(vid, blob))
            yield pd.DataFrame(rows, columns=["id", "frame_index", "image"])

    return df.select(
        F.col(id_col).alias(id_col), F.col(blob_col).alias(blob_col)
    ).mapInPandas(_batches, "id bigint, frame_index int, image binary")


def encode_avi(
    frames: list[np.ndarray], codec: str = "mjpeg", fps: int = 25
) -> bytes:
    """Minimal AVI writer for fixtures/round-trip tests: RIFF('AVI ')
    with hdrl(avih + strl(strh+strf)) and a movi list, no index. Frames
    are (h, w, 3) RGB uint8; ``codec`` is 'mjpeg' or 'dib'."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) & 1 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    def lst(kind: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", kind + payload)

    if codec == "mjpeg":
        handler, compression = b"MJPG", b"MJPG"
        payloads = [jpeg.encode_jpeg(f) for f in frames]
        tag = b"00dc"
    elif codec == "dib":
        handler = b"DIB "
        stride = (w * 3 + 3) & ~3
        payloads = []
        for f in frames:
            rows = np.zeros((h, stride), dtype=np.uint8)
            rows[:, : w * 3] = f.reshape(h, w * 3)
            payloads.append(rows[::-1].tobytes())  # bottom-up
        compression = b"\x00\x00\x00\x00"
        tag = b"00db"
    else:
        raise ValueError(f"unsupported codec {codec!r}")

    avih = struct.pack(
        "<10I", 1_000_000 // fps, 0, 0, 0, len(frames), 0, 1, 0, w, h
    ) + b"\x00" * 16
    strh = (b"vids" + handler + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1, fps,
                                            0, len(frames), 0, 0, 0, 0)
            + struct.pack("<4H", 0, 0, w, h))
    bmih = struct.pack("<IiiHH", 40, w, h, 1, 24) + compression[:4] + b"\x00" * 20
    strl = lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", bmih))
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + strl)
    movi = lst(b"movi", b"".join(chunk(tag, p) for p in payloads))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body
