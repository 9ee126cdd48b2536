"""Sample-level audio QA: clipping detection (count + longest consecutive
run), exact DC sum, sample range — against hand-built waveforms."""

import numpy as np
import pytest
from pyspark.sql import Row

from shaclapi_spark import audio_codec as ac
from shaclapi_spark.pipeline import multimodal as mm


def _container(samples, codec="pcm_s16le", sr=16000):
    s = np.asarray(samples, dtype=np.int16)
    payload = ac._encode_payload(s, codec)
    hdr = ac.HEADER.pack(ac.MAGIC, ac.CODEC_IDS[codec], sr, len(s), 0.0, 0.0)
    return hdr + payload


def _rows(df):
    return {r.clip_id: r for r in df.collect()}


def test_clipping_count_and_longest_run(spark):
    # runs at full scale: [3] then [2] -> n_clipped=5, max_clip_run=3
    s = [0, 32767, 32767, -32768, 10, -5, 32767, 32767, 100]
    df = spark.createDataFrame(
        [Row(clip_id="c1", bytes=bytearray(_container(s)))]
    )
    out = _rows(mm.audio_sample_quality(df))["c1"]
    assert out.n_samples == 9
    assert out.n_clipped == 5
    assert out.max_clip_run == 3
    assert out.dc_sum == sum(s)
    assert (out.min_s, out.max_s) == (-32768, 32767)


def test_no_clipping_and_threshold(spark):
    s = [100, 25999, -200, -25999, 0]
    df = spark.createDataFrame(
        [Row(clip_id="c1", bytes=bytearray(_container(s)))]
    )
    out = _rows(mm.audio_sample_quality(df, clip_thresh=26000))["c1"]
    assert out.n_clipped == 0 and out.max_clip_run == 0
    assert out.dc_sum == sum(s)
    # same clip at a lower threshold: the two non-adjacent 25999-magnitude
    # samples count, each its own run
    out2 = _rows(mm.audio_sample_quality(df, clip_thresh=25999))["c1"]
    assert out2.n_clipped == 2 and out2.max_clip_run == 1


def test_run_at_tail_and_all_clipped(spark):
    tail = [0, 0, 32767, 32767, 32767, 32767]
    full = [-32768] * 7
    df = spark.createDataFrame(
        [
            Row(clip_id="tail", bytes=bytearray(_container(tail))),
            Row(clip_id="full", bytes=bytearray(_container(full))),
        ]
    )
    out = _rows(mm.audio_sample_quality(df))
    assert out["tail"].max_clip_run == 4
    assert out["full"].n_clipped == 7 and out["full"].max_clip_run == 7
    assert out["full"].dc_sum == -32768 * 7


@pytest.mark.parametrize("codec", ["flac", "opus"])
def test_roundtrip_through_codecs(spark, codec):
    # whatever the codec reproduces is what the detector must see: compare
    # against a numpy re-derivation from the decoded samples
    blob = ac.encode_clip(440.0, 16000, 500, 0.9, codec)
    _, s = ac.decode_clip(blob)
    s64 = s.astype(np.int64)
    m = np.abs(s64) >= 26000
    df = spark.createDataFrame([Row(clip_id="c", bytes=bytearray(blob))])
    out = _rows(mm.audio_sample_quality(df, clip_thresh=26000))["c"]
    assert out.n_clipped == int(m.sum())
    assert out.dc_sum == int(s64.sum())
    assert (out.min_s, out.max_s) == (int(s64.min()), int(s64.max()))
    # longest run, independently: split indices of clipped samples
    idx = np.flatnonzero(m)
    if idx.size == 0:
        exp_run = 0
    else:
        breaks = np.flatnonzero(np.diff(idx) > 1)
        exp_run = int(np.max(np.diff(np.r_[-1, breaks, idx.size - 1 + 0])))
        # np.r_ trick: run lengths between break positions
        runs = np.split(idx, breaks + 1)
        exp_run = max(len(r) for r in runs)
    assert out.max_clip_run == exp_run


def test_skips_null_and_undecodable(spark):
    df = spark.createDataFrame(
        [
            Row(clip_id="ok", bytes=bytearray(_container([1, 2, 3]))),
            Row(clip_id="null", bytes=None),
            Row(clip_id="bad", bytes=bytearray(b"NOPE" + b"\x00" * 40)),
        ]
    )
    out = _rows(mm.audio_sample_quality(df))
    assert set(out) == {"ok"}
