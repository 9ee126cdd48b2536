"""Correctness tests for the round-3 operators: event sessionization
(pipeline/sessions.py), token-window chunking (pipeline/chunk.py),
per-group top-k (sampling.top_per_group), and VAD-style speech
segmentation (multimodal.speech_segments / speech_activity)."""

import datetime as dt
import struct

import numpy as np
import pytest
from pyspark.sql import Row, functions as F

from shaclapi_spark import audio_codec as ac
from shaclapi_spark.pipeline import chunk as ck, sampling as sp, sessions as sess
from shaclapi_spark.pipeline import multimodal as mm

BASE = dt.datetime(2026, 1, 1, 12, 0, 0)


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            Row(
                user_id=u,
                event_id=i,
                event_type=t,
                ts=BASE + dt.timedelta(minutes=m),
            )
            for i, (u, m, t) in enumerate(rows)
        ]
    )


def test_sessionize_gap_rule_strictly_greater(spark):
    # gaps of exactly 30 min stay in-session; 30 min + 1 us would split —
    # here 31 min splits, 30 min does not
    ev = _ev(
        spark,
        [
            ("u1", 0, "view"),
            ("u1", 30, "view"),   # exactly the gap → same session
            ("u1", 61, "click"),  # 31 min → new session
            ("u2", 5, "view"),
        ],
    )
    got = {
        (r.user_id, r.event_id): r.session_idx
        for r in sess.sessionize(ev, gap_minutes=30).collect()
    }
    assert got == {("u1", 0): 0, ("u1", 1): 0, ("u1", 2): 1, ("u2", 3): 0}


def test_session_rollup_boundaries_and_counts(spark):
    ev = _ev(
        spark,
        [
            ("u1", 0, "view"),
            ("u1", 10, "purchase"),
            ("u1", 100, "purchase"),  # 90 min gap → session 1
        ],
    )
    rows = {
        (r.user_id, r.session_idx): r
        for r in sess.session_rollup(
            ev, gap_minutes=30, count_type="purchase"
        ).collect()
    }
    s0 = rows[("u1", 0)]
    assert s0.n_events == 2 and s0.n_purchase == 1
    assert s0.duration_us == 10 * 60_000_000
    s1 = rows[("u1", 1)]
    assert s1.n_events == 1 and s1.n_purchase == 1 and s1.duration_us == 0
    # integer-microsecond boundaries agree with the wall clock
    assert s1.start_us - s0.start_us == 100 * 60_000_000


def test_chunk_grammar_overlap_and_tail(spark):
    # 10 tokens, chunks of 4, stride 3 → chunks cover [0:4) [3:7) [6:10):
    # n_chunks = 1 + ceil((10-4)/3) = 3, last chunk reaches the end
    text = " ".join(f"t{i}" for i in range(10))
    docs = spark.createDataFrame([Row(doc_id="d1", text=text)])
    out = sorted(
        ck.chunk_documents(docs, chunk_tokens=4, stride=3).collect(),
        key=lambda r: r.chunk_idx,
    )
    assert [r.chunk_text for r in out] == [
        "t0 t1 t2 t3",
        "t3 t4 t5 t6",
        "t6 t7 t8 t9",
    ]
    assert [r.n_tokens for r in out] == [4, 4, 4]


def test_chunk_short_doc_single_chunk_and_empty_dropped(spark):
    docs = spark.createDataFrame(
        [Row(doc_id="short", text="a b"), Row(doc_id="empty", text="   ")]
    )
    out = ck.chunk_documents(docs, chunk_tokens=4, stride=3).collect()
    assert len(out) == 1
    assert out[0].doc_id == "short" and out[0].n_tokens == 2


def test_chunk_rejects_bad_stride(spark):
    docs = spark.createDataFrame([Row(doc_id="d", text="a")])
    with pytest.raises(ValueError):
        ck.chunk_documents(docs, chunk_tokens=4, stride=5)
    with pytest.raises(ValueError):
        ck.chunk_documents(docs, chunk_tokens=4, stride=0)


def test_top_per_group_deterministic_tiebreak(spark):
    df = spark.createDataFrame(
        [
            Row(g="a", id="x", v=10),
            Row(g="a", id="y", v=10),  # tie on v → id breaks it
            Row(g="a", id="z", v=5),
            Row(g="b", id="w", v=1),
        ]
    )
    out = sp.top_per_group(
        df, "g", [F.col("v").desc(), F.col("id").asc()], k=2
    ).collect()
    got = {(r.g, r.id): r.rank for r in out}
    assert got == {("a", "x"): 1, ("a", "y"): 2, ("b", "w"): 1}


def _pcm_blob(frames_amp, sr=16000, frame_samples=320) -> bytes:
    """Raw pcm_s16le SGA1 blob whose 20 ms frames have the given
    amplitudes (0.0 = digital silence)."""
    parts = []
    for a in frames_amp:
        if a == 0.0:
            parts.append(np.zeros(frame_samples, dtype=np.int16))
        else:
            t = np.arange(frame_samples)
            parts.append(
                np.round(a * 32767 * np.sin(2 * np.pi * 440 * t / sr)).astype(
                    np.int16
                )
            )
    samples = np.concatenate(parts)
    header = ac.HEADER.pack(
        ac.MAGIC, ac.CODEC_IDS["pcm_s16le"], sr, len(samples), 440.0, 0.5
    )
    return header + samples.astype("<i2").tobytes()


def test_speech_segments_silence_tone_silence(spark):
    blob = _pcm_blob([0.0] * 10 + [0.5] * 10 + [0.0] * 5)
    df = spark.createDataFrame([Row(clip_id="c1", bytes=bytearray(blob))])
    out = sorted(
        mm.speech_segments(df, frame_ms=20).collect(), key=lambda r: r.seg_idx
    )
    assert [(r.is_speech, r.start_frame, r.end_frame, r.n_frames) for r in out] == [
        (False, 0, 9, 10),
        (True, 10, 19, 10),
        (False, 20, 24, 5),
    ]
    assert all(r.n_samples == r.n_frames * 320 for r in out)


def test_speech_activity_rollup(spark):
    blob = _pcm_blob([0.5] * 3 + [0.0] * 7 + [0.5] * 5)
    df = spark.createDataFrame([Row(clip_id="c1", bytes=bytearray(blob))])
    r = mm.speech_activity(df, frame_ms=20).collect()[0]
    assert r.n_segments == 3 and r.n_speech_segments == 2
    assert r.speech_frames == 8 and r.total_frames == 15
    assert r.longest_speech_frames == 5 and r.longest_silence_frames == 7


def test_speech_segments_rejects_inexact_threshold(spark):
    df = spark.createDataFrame([Row(clip_id="c", bytes=bytearray(b""))])
    with pytest.raises(ValueError):
        mm.speech_segments(df, silence_db=-37.3)
