"""Audio fingerprinting + near-duplicate detection over binary audio
columns.

Classic spectral-delta fingerprint (the public Haitsma-Kalker /
chromaprint family shape): decode PCM (WAV or AIFF — shared
``multimodal.pcm_samples`` kernel) → mono → split into ``n_frames``
equal windows → per-window FFT power split into ``n_bands`` bands →
bit(f, b) = 1 iff band energy rises from frame f to f+1. Frame-to-frame
energy COMPARISONS are invariant to global gain and robust to
requantization, so the same clip stored as 8-bit vs 16-bit PCM, or
volume-scaled, hashes within a few bits, while different material is
~random (uncorrelated band trajectories).

Pair generation reuses ``dedup.hamming_pairs`` — the same banded
pigeonhole join + popcount verify as text simhash and image dhash; no
all-pairs join at any corpus size.

Like the image path, not SQL-expressible (needs PCM decode + FFT), so
coverage is pytest round-trips rather than a driver oracle query.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.pipeline.dedup import hamming_pairs

# 16 frames x 4 bands -> 60 delta bits, inside one signed-64 bigint
N_FRAMES = 16
N_BANDS = 4


def audio_fingerprint_bytes(
    blob: bytes, n_frames: int = N_FRAMES, n_bands: int = N_BANDS
) -> int:
    """Fingerprint one WAV blob to ``(n_frames-1) * n_bands`` bits
    (must fit in 63 — the value stays non-negative in a bigint)."""
    nbits = (n_frames - 1) * n_bands
    if nbits > 63:
        raise ValueError("fingerprint would not fit a signed 64-bit column")
    from linkgraph.pipeline.multimodal import pcm_samples

    samples, nch, _rate = pcm_samples(blob)  # WAV or AIFF
    if nch > 1:
        samples = samples[: (len(samples) // nch) * nch].reshape(-1, nch).mean(axis=1)
    if samples.size < n_frames:  # too short to frame: zero-pad
        samples = np.pad(samples, (0, n_frames - samples.size))
    frame_len = samples.size // n_frames
    frames = samples[: frame_len * n_frames].reshape(n_frames, frame_len)
    spec = np.abs(np.fft.rfft(frames, axis=1)) ** 2  # (n_frames, bins)
    nbins = spec.shape[1]
    # log-spaced band edges: low-frequency detail weighs more, like the
    # published fingerprints; guarantee each band spans >= 1 bin
    edges = np.unique(
        np.round(np.logspace(0, np.log10(max(nbins, 2)), n_bands + 1)).astype(int)
    )
    while edges.size < n_bands + 1:  # tiny spectra: fall back to linear
        edges = np.linspace(0, nbins, n_bands + 1).astype(int)
        edges = np.maximum(edges, np.arange(n_bands + 1))
    energy = np.stack(
        [spec[:, edges[b] : max(edges[b + 1], edges[b] + 1)].sum(axis=1)
         for b in range(n_bands)],
        axis=1,
    )  # (n_frames, n_bands)
    rising = energy[1:] > energy[:-1]  # (n_frames-1, n_bands)
    v = 0
    for i, bit in enumerate(rising.ravel()):
        if bit:
            v |= 1 << i
    return v


def audio_fingerprint(
    df: DataFrame,
    id_col: str = "id",
    blob_col: str = "audio",
    on_error: str = "raise",
) -> DataFrame:
    """(id, afp bigint) over a binary audio column — same Arrow-batched
    mapInPandas shape as audio_stats; NULL for undecodable blobs under
    ``on_error="null"``."""

    def _one(blob: bytes) -> int | None:
        if on_error == "null":
            try:
                return audio_fingerprint_bytes(bytes(blob))
            except Exception:
                return None
        return audio_fingerprint_bytes(bytes(blob))

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame({
                "id": pdf[id_col].values,
                "afp": pd.array([_one(b) for b in pdf[blob_col]], dtype="Int64"),
            })

    return df.select(
        F.col(id_col).alias(id_col), F.col(blob_col).alias(blob_col)
    ).mapInPandas(_batches, "id bigint, afp bigint")


def audio_neardup_pairs(
    df: DataFrame,
    id_col: str = "id",
    blob_col: str = "audio",
    max_hamming: int = 6,
    bands: int | None = None,
    max_bucket_size: int | None = None,
    on_error: str = "null",
) -> DataFrame:
    """(a, b, hamming) near-duplicate audio pairs: spectral fingerprint
    + the shared pigeonhole band join (decode is the only Python step;
    join/verify stays JVM-side)."""
    hashed = audio_fingerprint(df, id_col=id_col, blob_col=blob_col, on_error=on_error)
    return hamming_pairs(
        hashed, id_col="id", hash_col="afp", max_hamming=max_hamming,
        bands=bands, max_bucket_size=max_bucket_size,
        caller="audio_neardup_pairs",
    )
