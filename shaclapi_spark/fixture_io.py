"""Driver-contract fixture materialization — pandas/pyarrow, no SparkSession.

The correctness gate (``__spark_entry__.py``) compares Spark results against
DuckDB oracle SQL. For clips-table queries both engines must read the *same*
parquet bytes, and the oracle side has no SparkSession — so the fixture is
written here with plain pandas/pyarrow at module-import time. The data is a
pure function of the row index with exactly the formulas of
``shaclapi_spark.datagen`` (violation seeds documented there / FIXTURES.md);
``tests/test_fixture_io.py`` asserts the two generators produce identical
relations.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from shaclapi_spark import audio_codec
from shaclapi_spark.datagen import (
    CODEC_BY_MOD10,
    LANG_CYCLE,
    SR_CYCLE,
    reference_histograms_pdf,
)

FIXTURE_ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".fixtures")

CLIPS_ARROW_SCHEMA = pa.schema(
    [
        ("clip_id", pa.string()),
        ("bytes", pa.binary()),
        ("sr_hz", pa.int32()),
        ("dur_ms", pa.int32()),
        ("codec", pa.string()),
        ("transcript", pa.string()),
    ]
)

TRANSCRIPTS_ARROW_SCHEMA = pa.schema(
    [
        ("transcript_id", pa.string()),
        ("clip_id", pa.string()),
        ("text", pa.string()),
        ("lang", pa.string()),
        ("n_tokens", pa.int32()),
    ]
)


def clips_pdf(n_clips: int, with_bytes: bool = True) -> pd.DataFrame:
    """T1 clips as pandas — identical relation to datagen.clips_df."""
    base = np.arange(n_clips, dtype=np.int64)
    dup = base[base % 997 == 0]
    ii = np.concatenate([base, dup])
    shift_from = int(0.9 * n_clips)

    sr_nominal = np.asarray(SR_CYCLE, dtype=np.int64)[ii % 5]
    sr = sr_nominal.astype(object)
    sr[ii % 89 == 0] = 0
    sr[ii % 127 == 0] = None
    dur = 500 + (ii * 37) % 29500 + np.where(ii >= shift_from, 15000, 0)
    codec = np.asarray(CODEC_BY_MOD10, dtype=object)[ii % 10]
    # duplicate copies (the tail beyond n_clips) carry a CONFLICTING
    # transcript — fk_match multi-parent seed, same as datagen._clip_meta_df
    is_dup = np.concatenate(
        [np.zeros(len(base), dtype=bool), np.ones(len(dup), dtype=bool)]
    )
    transcript = np.asarray(
        [
            f"transcript of clip {i}" + (" (alt)" if d else "")
            for i, d in zip(ii, is_dup)
        ],
        dtype=object,
    )
    transcript[ii % 13 == 0] = None

    blobs: list[bytes | None] = []
    if with_bytes:
        for i in ii:
            i = int(i)
            blobs.append(
                audio_codec.encode_clip(
                    220.0 + (i % 32) * 55.0,
                    SR_CYCLE[i % 5],
                    256 + (i % 256),
                    0.8,
                    CODEC_BY_MOD10[i % 10],
                    corrupt=(i % 101 == 0),
                )
            )
    else:
        blobs = [None] * len(ii)

    return pd.DataFrame(
        {
            "clip_id": [f"clip_{int(i):08d}" for i in ii],
            "bytes": blobs,
            "sr_hz": sr,
            "dur_ms": dur,
            "codec": codec,
            "transcript": transcript,
        }
    )


def transcripts_pdf(n_clips: int) -> pd.DataFrame:
    """T2 transcripts as pandas — identical relation to datagen.transcripts_df."""
    offs = np.array([0, 0, 1, 3], dtype=np.int64)
    rows_i, rows_j = [], []
    for i in range(n_clips):
        k = i % 4
        j_base = 6 * (i // 4) + int(offs[k])
        for r in range(k):
            rows_i.append(i)
            rows_j.append(j_base + r)
    ii = np.asarray(rows_i, dtype=np.int64)
    jj = np.asarray(rows_j, dtype=np.int64)

    clip_id = np.where(
        jj % 31 == 0,
        [f"clip_missing_{int(j)}" for j in jj],
        [f"clip_{int(i):08d}" for i in ii],
    ).astype(object)
    text = np.where(
        jj % 41 == 0,
        [f"MUTATED {int(j)}" for j in jj],
        [f"transcript of clip {int(i)}" for i in ii],
    ).astype(object)
    n_tokens = np.where(
        jj % 23 == 0, -1, [len(str(t).split(" ")) for t in text]
    ).astype(np.int32)
    return pd.DataFrame(
        {
            "transcript_id": [f"tr_{int(j):08d}" for j in jj],
            "clip_id": clip_id,
            "text": text,
            "lang": np.asarray(LANG_CYCLE, dtype=object)[jj % 3],
            "n_tokens": n_tokens,
        }
    )


#: image fixture geometry — small enough that the DuckDB oracle's
#: per-pixel hex decode stays cheap (w*h = 384 px/image), large enough
#: that stats are non-trivial
IMG_W, IMG_H = 24, 16
VID_W, VID_H, VID_FRAMES = 16, 12, 6


def images_pdf(n_images: int) -> pd.DataFrame:
    """T4 images: deterministic real-container blobs (24-bit BMP / binary
    PPM, imagery.synth_image_bytes) + declared-dimension metadata columns
    (the clips sr_hz/dur_ms analog — the blob is authoritative, the
    metadata is what a catalog claims)."""
    from shaclapi_spark.pipeline import imagery

    rows = []
    for i in range(n_images):
        # i%73: catalog metadata LIES about the width (container is
        # authoritative) — the dims-vs-metadata constraint seed, the image
        # analog of the clips hdr-vs-sr_hz seeds
        rows.append(
            (
                f"img_{i:08d}",
                imagery.synth_image_bytes(i, IMG_W, IMG_H),
                "bmp" if i % 5 < 3 else "ppm",
                IMG_W - 1 if i % 73 == 0 else IMG_W,
                IMG_H,
            )
        )
    return pd.DataFrame(
        rows, columns=["img_id", "bytes", "fmt", "meta_w", "meta_h"]
    )


def videos_pdf(n_videos: int) -> pd.DataFrame:
    """T5 videos: deterministic SGV1 blobs (imagery.synth_video_bytes) +
    declared frame-count/fps metadata."""
    from shaclapi_spark.pipeline import imagery

    rows = []
    for i in range(n_videos):
        # i%61: catalog frame count LIES (container authoritative) — the
        # vid_frames constraint seed, mirroring the images meta_w seed
        rows.append(
            (
                f"vid_{i:08d}",
                imagery.synth_video_bytes(i, VID_W, VID_H, VID_FRAMES),
                VID_FRAMES - 1 if i % 61 == 0 else VID_FRAMES,
                25,
            )
        )
    return pd.DataFrame(rows, columns=["vid_id", "bytes", "meta_frames", "meta_fps"])


IMAGES_ARROW_SCHEMA = pa.schema(
    [
        ("img_id", pa.string()),
        ("bytes", pa.binary()),
        ("fmt", pa.string()),
        ("meta_w", pa.int32()),
        ("meta_h", pa.int32()),
    ]
)

VIDEOS_ARROW_SCHEMA = pa.schema(
    [
        ("vid_id", pa.string()),
        ("bytes", pa.binary()),
        ("meta_frames", pa.int32()),
        ("meta_fps", pa.int32()),
    ]
)


def fixture_paths(n_clips: int, root: str = FIXTURE_ROOT) -> dict[str, str]:
    d = os.path.join(root, f"n{n_clips}")
    return {
        "clips": os.path.join(d, "clips.parquet"),
        "transcripts": os.path.join(d, "transcripts.parquet"),
        "ref_histograms": os.path.join(d, "ref_histograms.parquet"),
        "images": os.path.join(d, "images.parquet"),
        "videos": os.path.join(d, "videos.parquet"),
        "_marker": os.path.join(d, "_OK"),
        "_marker_av": os.path.join(d, "_OK_AV3"),
    }


def ensure_fixture_pandas(n_clips: int, root: str = FIXTURE_ROOT) -> dict[str, str]:
    """Idempotently write the clips fixture with pandas. Returns table paths."""
    paths = fixture_paths(n_clips, root)
    if os.path.exists(paths["_marker"]):
        _ensure_av(n_clips, paths)
        return paths
    os.makedirs(os.path.dirname(paths["clips"]), exist_ok=True)
    # bounded row groups: Spark's parquet split granularity is the row
    # group, so a single-group file serializes every downstream
    # mapInPandas decode onto ONE task no matter the cluster size. Real
    # Iceberg tables come as many files/row groups; 5k-row groups give
    # the local fixture the same property (measured: the PCM-fingerprint
    # stage went from 1 task / 20.6 s to parallel across cores).
    pq.write_table(
        pa.Table.from_pandas(
            clips_pdf(n_clips), schema=CLIPS_ARROW_SCHEMA, preserve_index=False
        ),
        paths["clips"],
        row_group_size=5000,
    )
    pq.write_table(
        pa.Table.from_pandas(
            transcripts_pdf(n_clips),
            schema=TRANSCRIPTS_ARROW_SCHEMA,
            preserve_index=False,
        ),
        paths["transcripts"],
        row_group_size=5000,
    )
    pq.write_table(
        pa.Table.from_pandas(reference_histograms_pdf(), preserve_index=False),
        paths["ref_histograms"],
    )
    with open(paths["_marker"], "w") as fh:
        fh.write(str(n_clips))
    _ensure_av(n_clips, paths)
    return paths


def _ensure_av(n_clips: int, paths: dict) -> None:
    """Idempotently add the image/video tables next to an existing clips
    fixture (separate marker so pre-existing fixture dirs upgrade in
    place without regenerating the audio tables)."""
    if os.path.exists(paths["_marker_av"]):
        return
    os.makedirs(os.path.dirname(paths["images"]), exist_ok=True)
    pq.write_table(
        pa.Table.from_pandas(
            images_pdf(max(n_clips // 4, 50)),
            schema=IMAGES_ARROW_SCHEMA,
            preserve_index=False,
        ),
        paths["images"],
        row_group_size=2500,
    )
    pq.write_table(
        pa.Table.from_pandas(
            videos_pdf(max(n_clips // 8, 25)),
            schema=VIDEOS_ARROW_SCHEMA,
            preserve_index=False,
        ),
        paths["videos"],
        row_group_size=1250,
    )
    with open(paths["_marker_av"], "w") as fh:
        fh.write(str(n_clips))
