"""Image near-duplicate detection over binary image columns.

dHash (difference hash — a classic public perceptual hash: resize to
(hash_size+1) x hash_size luma, take horizontal-gradient signs) computed
on the REAL stdlib decoders in ``multimodal``/``jpeg``, so the same
photo round-tripped through PNG vs near-lossless JPEG, or resized,
hashes within a few bits. Pair generation reuses the text-dedup
pigeonhole machinery (``dedup.hamming_pairs``): band the 64-bit hash,
equi-join on 16-bit chunk keys, verify by popcount — no all-pairs join
anywhere, the same 100 TB discipline as minhash/simhash.

Not oracle-checkable in SQL (needs pixel decode), so coverage is
pytest round-trips rather than a driver query — same basis as the rest
of the multimodal surface.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.pipeline.dedup import hamming_pairs
from linkgraph.pipeline.multimodal import decode_image_pixels


def dhash_bytes(blob: bytes, hash_size: int = 8) -> int:
    """64-bit (for hash_size=8) difference hash of one image blob:
    decode → luma (channel mean) → nearest-neighbor resample to
    (hash_size+1) cols x hash_size rows → bit i = 1 iff luma increases
    left→right. Returned as a SIGNED 64-bit int (bit 63 carries the
    sign) so it round-trips a Spark/parquet bigint column exactly."""
    px = decode_image_pixels(blob)
    if px.dtype != np.uint8:
        px = (px >> 8).astype(np.uint8)  # 16-bit PNG -> high byte
    gray = px.astype(np.float64).mean(axis=2)
    h0, w0 = gray.shape
    rows, cols = hash_size, hash_size + 1
    ys = np.minimum((np.arange(rows) * h0) // rows, h0 - 1)
    xs = np.minimum((np.arange(cols) * w0) // cols, w0 - 1)
    g = gray[ys][:, xs]
    bits = (g[:, 1:] > g[:, :-1]).ravel()
    v = 0
    for i, b in enumerate(bits):
        if b:
            v |= 1 << i
    nbits = rows * (cols - 1)
    if v >= 1 << (nbits - 1):
        v -= 1 << nbits
    return v


def image_dhash(
    df: DataFrame,
    id_col: str = "id",
    blob_col: str = "image",
    on_error: str = "raise",
) -> DataFrame:
    """(id, dhash bigint) over a binary image column — Arrow-batched
    mapInPandas, the sanctioned slow path for per-image decode.
    ``on_error="null"`` nulls out undecodable blobs; ``hamming_pairs``
    drops NULL hashes before banding, so broken images can never form a
    shared bucket."""

    def _one(blob: bytes) -> int | None:
        if on_error == "null":
            try:
                return dhash_bytes(bytes(blob))
            except Exception:
                return None
        return dhash_bytes(bytes(blob))

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame({
                "id": pdf[id_col].values,
                "dhash": pd.array(
                    [_one(b) for b in pdf[blob_col]], dtype="Int64"
                ),
            })

    return df.select(
        F.col(id_col).alias(id_col), F.col(blob_col).alias(blob_col)
    ).mapInPandas(_batches, "id bigint, dhash bigint")


def image_neardup_pairs(
    df: DataFrame,
    id_col: str = "id",
    blob_col: str = "image",
    max_hamming: int = 6,
    bands: int | None = None,
    max_bucket_size: int | None = None,
    on_error: str = "null",
) -> DataFrame:
    """(a, b, hamming) pairs of near-duplicate images: dHash + the
    shared pigeonhole band join. The decode is the only Python step; the
    join/verify stays JVM-side. Default ``on_error="null"`` because a
    web-crawl image corpus always has undecodable blobs."""
    hashed = image_dhash(df, id_col=id_col, blob_col=blob_col, on_error=on_error)
    return hamming_pairs(
        hashed, id_col="id", hash_col="dhash", max_hamming=max_hamming,
        bands=bands, max_bucket_size=max_bucket_size,
        caller="image_neardup_pairs",
    )
