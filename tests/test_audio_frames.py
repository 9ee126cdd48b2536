"""Frame-sampling op: integer-exact per-frame features vs a pure-numpy
reference, plus the loudness rollup on top."""

import math

import numpy as np
import pytest
from pyspark.sql import Row, functions as F

from shaclapi_spark import audio_codec as ac
from shaclapi_spark.pipeline import multimodal as mm


def _clip(freq=440.0, sr=16000, n=700, amp=0.5, codec="pcm_s16le"):
    return ac.encode_clip(freq, sr, n, amp, codec)


def _expected_frames(blob, frame_ms=20):
    hdr, s = ac.decode_clip(blob)
    L = hdr["sr_hz"] * frame_ms // 1000
    s = s.astype(np.int64)
    out = []
    for f in range(math.ceil(len(s) / L)):
        w = s[f * L : (f + 1) * L]
        zc = int(np.sum((w[:-1] < 0) != (w[1:] < 0)))
        out.append(
            (
                f,
                len(w),
                int(np.sum(np.abs(w))),
                int(np.max(np.abs(w))),
                int(np.sum(w * w)),
                zc,
            )
        )
    return out


@pytest.mark.parametrize("codec", ["pcm_s16le", "flac", "opus"])
def test_frames_match_numpy_reference(spark, codec):
    # 700 samples at 16 kHz / 20 ms -> frames of 320, 320, 60 (partial tail)
    blob = _clip(codec=codec)
    df = spark.createDataFrame([Row(clip_id="c1", bytes=bytearray(blob))])
    got = {
        r.frame_idx: (r.n_samples, r.sum_abs, r.peak_abs, r.sum_sq, r.zero_crossings)
        for r in mm.audio_frame_features(df).collect()
    }
    exp = {
        f: (n, sa, pk, sq, zc) for f, n, sa, pk, sq, zc in _expected_frames(blob)
    }
    assert got == exp
    assert got[0][0] == 320 and got[2][0] == 60  # partial last frame


def test_frames_skip_null_and_corrupt(spark):
    rows = [
        Row(clip_id="ok", bytes=bytearray(_clip())),
        Row(clip_id="null", bytes=None),
        Row(clip_id="bad", bytes=bytearray(b"XXXX not a container")),
    ]
    df = spark.createDataFrame(rows)
    ids = {r.clip_id for r in mm.audio_frame_features(df).collect()}
    assert ids == {"ok"}


def test_straddle_pairs_counted_in_neither_frame(spark):
    # alternating-sign samples: every adjacent pair is a crossing; total
    # within-frame crossings = (n-1) minus one per interior frame boundary
    sr, n = 16000, 645  # L=320 -> frames 320/320/5, 2 interior boundaries
    samples = np.array([(-1) ** i * 1000 for i in range(n)], dtype=np.int16)
    payload = samples.astype("<i2").tobytes()
    hdr = ac.HEADER.pack(ac.MAGIC, 0, sr, n, 440.0, 0.5)
    df = spark.createDataFrame([Row(clip_id="alt", bytes=bytearray(hdr + payload))])
    rows = mm.audio_frame_features(df).collect()
    assert sum(r.zero_crossings for r in rows) == (n - 1) - 2
    assert [r.n_samples for r in sorted(rows, key=lambda r: r.frame_idx)] == [320, 320, 5]


def test_loudness_counts_integer_exact(spark):
    # loudness_counts must agree with loudness_stats's silence verdicts
    # (its integer test is the exact form of frame_rms_db < -40) and with
    # the raw frame relation's integer sums.
    loud = _clip(amp=0.9)
    quiet = _clip(amp=0.001)
    df = spark.createDataFrame(
        [Row(clip_id="loud", bytes=bytearray(loud)), Row(clip_id="quiet", bytes=bytearray(quiet))]
    )
    got = {r.clip_id: r for r in mm.loudness_counts(df).collect()}
    frames = mm.audio_frame_features(df).collect()
    for cid in ("loud", "quiet"):
        fr = [r for r in frames if r.clip_id == cid]
        assert got[cid].n_frames == len(fr)
        assert got[cid].sum_sq == sum(r.sum_sq for r in fr)
        assert got[cid].sum_abs == sum(r.sum_abs for r in fr)
        assert got[cid].peak_abs == max(r.peak_abs for r in fr)
        assert got[cid].zero_crossings == sum(r.zero_crossings for r in fr)
    assert got["loud"].n_silent == 0
    assert got["quiet"].n_silent == got["quiet"].n_frames
    # non-integer ratio^2 → explicit error, not a silent float fallback
    with pytest.raises(ValueError):
        mm.loudness_counts(df, silence_db=-37.3)


def test_loudness_counts_no_overflow_at_minus_80db(spark):
    # r2 = 10^8: a full-scale frame's sum_sq * r2 exceeds 2^63 — the decimal
    # comparison must NOT wrap, so a loud clip stays non-silent even against
    # the tightest threshold, while a true digital-silence frame still counts
    loud = _clip(amp=0.999)
    df = spark.createDataFrame([Row(clip_id="loud", bytes=bytearray(loud))])
    got = mm.loudness_counts(df, silence_db=-80.0).collect()[0]
    assert got.n_silent == 0
    sr, n = 16000, 640
    hdr = ac.HEADER.pack(ac.MAGIC, 0, sr, n, 440.0, 0.0)
    silent_df = spark.createDataFrame(
        [Row(clip_id="zeros", bytes=bytearray(hdr + b"\x00" * (2 * n)))]
    )
    got0 = mm.loudness_counts(silent_df, silence_db=-80.0).collect()[0]
    assert got0.n_silent == got0.n_frames == 2


def test_loudness_stats_rollup(spark):
    loud = _clip(amp=0.9)
    quiet = _clip(amp=0.001)  # ~ -61 dBFS, under the -40 dB silence cut
    df = spark.createDataFrame(
        [Row(clip_id="loud", bytes=bytearray(loud)), Row(clip_id="quiet", bytes=bytearray(quiet))]
    )
    got = {r.clip_id: r for r in mm.loudness_stats(df).collect()}
    assert got["loud"].n_frames == 3 and got["loud"].n_samples == 700
    # sine at amp a has RMS ~ a/sqrt(2) of full scale
    assert got["loud"].rms_db == pytest.approx(
        20 * math.log10(0.9 / math.sqrt(2)), abs=0.3
    )
    assert got["loud"].silence_ratio == 0.0
    assert got["quiet"].silence_ratio == 1.0
    assert got["loud"].peak_dbfs == pytest.approx(20 * math.log10(0.9), abs=0.1)


def test_align_tokens_hand_built(spark):
    from pyspark.sql import Row
    from shaclapi_spark import audio_codec as ac
    from shaclapi_spark.pipeline import multimodal as mm
    import numpy as np

    # sr=8000, frame_ms=20 -> 160-sample frames. Frame pattern:
    # [sil, sil, SP, SP, SP, sil, SP, SP] -> speech segs: frames 2-4 (cum 0),
    # frames 6-7 (cum 3); S = 5 speech frames.
    fr = 160
    quiet = np.zeros(fr, dtype=np.int16)
    loud = np.full(fr, 20000, dtype=np.int16)
    s = np.concatenate([quiet, quiet, loud, loud, loud, quiet, loud, loud])
    clips = spark.createDataFrame(
        [Row(clip_id="c", bytes=bytearray(ac.encode_samples(s, "pcm_s16le", 8000)))]
    )
    trs = spark.createDataFrame(
        [
            Row(transcript_id="t2", clip_id="c", n_tokens=2),
            Row(transcript_id="t7", clip_id="c", n_tokens=7),
            Row(transcript_id="tbad", clip_id="c", n_tokens=-1),  # excluded
        ]
    )
    out = mm.align_tokens(clips, trs).collect()
    rows = {(r.transcript_id, r.token_idx): (r.start_ms, r.end_ms) for r in out}
    # T=2 over S=5: token0 -> ordinals 0..1 -> frames 2..3; token1 -> 2..4 ->
    # frames 4 then (segment hop) 7
    assert rows[("t2", 0)] == (40, 80)
    assert rows[("t2", 1)] == (80, 160)
    # T=7 > S=5: spans floor at one frame; token0 ordinal 0 -> frame 2
    assert rows[("t7", 0)] == (40, 60)
    # last token (j=6): s_lo = 6*5//7 = 4 -> frame 7 -> 140..160
    assert rows[("t7", 6)] == (140, 160)
    # excluded transcript and no extra rows: 2 + 7 spans
    assert len(rows) == 9
    # every span is non-empty and inside the clip
    for (tid, j), (a, b) in rows.items():
        assert 0 <= a < b <= 160 * 20
