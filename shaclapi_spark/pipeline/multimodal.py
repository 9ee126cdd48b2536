"""Multimodal binary-column plumbing: typed metadata extraction, feature
extraction, decode stubs.

The container has no image/audio/video libraries, so the *decode* steps for
real media formats are stubbed behind import-tries (NotImplementedError with
a clear message), while the Spark-side plumbing — schema, Arrow batch shape,
mapInPandas signatures, partitioning — is real and tested against the SGA1
audio container (shaclapi_spark.audio_codec), which decodes for real.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from shaclapi_spark import audio_codec

AUDIO_META_SCHEMA = StructType(
    [
        StructField("clip_id", StringType()),
        StructField("hdr_codec", StringType()),
        StructField("hdr_sr_hz", IntegerType()),
        StructField("hdr_n_samples", IntegerType()),
        StructField("hdr_freq_hz", DoubleType()),
        StructField("rms", DoubleType()),
        StructField("peak", DoubleType()),
    ]
)


def audio_metadata(df: DataFrame, id_col: str = "clip_id", bytes_col: str = "bytes") -> DataFrame:
    """Decode headers + cheap signal features per clip (Arrow-batched)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in AUDIO_META_SCHEMA.fieldNames()}
            for cid, blob in zip(pdf[id_col], pdf[bytes_col]):
                out["clip_id"].append(cid)
                try:
                    hdr, samples = audio_codec.decode_clip(bytes(blob))
                    s = samples.astype(np.float64)
                    out["hdr_codec"].append(hdr["codec"])
                    out["hdr_sr_hz"].append(int(hdr["sr_hz"]))
                    out["hdr_n_samples"].append(int(hdr["n_samples"]))
                    out["hdr_freq_hz"].append(float(hdr["freq_hz"]))
                    out["rms"].append(float(np.sqrt(np.mean(s * s))))
                    out["peak"].append(float(np.max(np.abs(s))))
                except (ValueError, TypeError):
                    out["hdr_codec"].append(None)
                    out["hdr_sr_hz"].append(None)
                    out["hdr_n_samples"].append(None)
                    out["hdr_freq_hz"].append(None)
                    out["rms"].append(None)
                    out["peak"].append(None)
            yield pd.DataFrame(out)

    return df.select(F.col(id_col), F.col(bytes_col)).mapInPandas(
        gen, schema=AUDIO_META_SCHEMA
    )


def byte_histogram_features(df: DataFrame, id_col: str, bytes_col: str, n_bins: int = 16) -> DataFrame:
    """Deterministic 'feature extraction' for opaque binary payloads: a
    normalized byte-value histogram. Stands in for an embedding model; the
    batch plumbing (binary in → fixed-width float vector out) is exactly what
    a real extractor needs."""
    schema = StructType(
        [
            StructField("id", StringType()),
            StructField("features", ArrayType(DoubleType())),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats = [], []
            for cid, blob in zip(pdf[id_col], pdf[bytes_col]):
                ids.append(str(cid))
                if blob is None:
                    feats.append(None)
                    continue
                arr = np.frombuffer(bytes(blob), dtype=np.uint8)
                hist, _ = np.histogram(arr, bins=n_bins, range=(0, 256))
                total = max(1, len(arr))
                feats.append((hist / total).tolist())
            yield pd.DataFrame({"id": ids, "features": feats})

    return df.select(F.col(id_col), F.col(bytes_col)).mapInPandas(gen, schema=schema)


BYTE_HIST_COUNTS_SCHEMA = StructType(
    [
        StructField("clip_id", StringType()),
        StructField("bin", IntegerType()),
        StructField("n_bytes", LongType()),
    ]
)


def byte_histogram_counts(
    df: DataFrame, id_col: str, bytes_col: str, n_bins: int = 16
) -> DataFrame:
    """Exact per-row byte-value histogram counts (long rows: one per (id,
    bin), all bins emitted incl. zeros). Same plumbing as
    :func:`byte_histogram_features` but integer-exact, so a DuckDB oracle can
    recompute it from hex(bytes) — full value-hash correctness check instead
    of rows-only."""
    assert 256 % n_bins == 0
    shift = 256 // n_bins

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, bins, counts = [], [], []
            for cid, blob in zip(pdf[id_col], pdf[bytes_col]):
                if blob is None:
                    continue
                arr = np.frombuffer(bytes(blob), dtype=np.uint8) // shift
                hist = np.bincount(arr, minlength=n_bins)
                ids.extend([str(cid)] * n_bins)
                bins.extend(range(n_bins))
                counts.extend(int(x) for x in hist)
            yield pd.DataFrame(
                {"clip_id": ids, "bin": pd.array(bins, dtype="int32"),
                 "n_bytes": pd.array(counts, dtype="int64")}
            )

    return df.select(F.col(id_col), F.col(bytes_col)).mapInPandas(
        gen, schema=BYTE_HIST_COUNTS_SCHEMA
    )


def decode_image(blob: bytes) -> "np.ndarray":
    """STUB — image decode needs PIL/opencv, absent in this container."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "image decode requires Pillow/opencv; not available in this environment"
        ) from exc
    raise NotImplementedError("real image path not wired in this sandbox")


def sample_video_frames(blob: bytes, every_n: int = 30) -> list:
    """STUB — video frame sampling needs pyav/ffmpeg, absent here."""
    try:
        import av  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "video frame sampling requires pyav/ffmpeg; not available here"
        ) from exc
    raise NotImplementedError("real video path not wired in this sandbox")
