"""Adversarial audio robustness: malformed containers through every audio
operator — bad magic, unknown codec ids, truncated payloads, zero-sample
clips, NULL blobs, random bytes. Every op must skip them (decode_clip
parity), never crash."""

import struct

import numpy as np
import pytest

from shaclapi_spark import audio_codec as ac


def _good(freq=440.0, sr=16000, n=2000, codec="pcm_s16le"):
    return bytearray(ac.encode_clip(freq, sr, n, 0.8, codec))


def _bad_magic():
    b = _good()
    b[0:4] = b"XXXX"
    return b


def _unknown_codec():
    b = _good()
    b[4] = 99
    return b


def _truncated():
    return _good()[: 60]


def _zero_samples():
    # header says n=0 with empty payload
    b = _good(n=1)
    # rebuild with n=0: magic(4) codec(1) sr(4) n(4) ...
    return bytearray(bytes(b[:9]) + struct.pack("<i", 0) + bytes(b[13:21]))


def _random_bytes():
    rng = np.random.RandomState(7)
    return bytearray(rng.bytes(128))


@pytest.fixture(scope="module")
def adv_clips(spark):
    rows = [
        ("good", _good()),
        ("bad_magic", _bad_magic()),
        ("unknown_codec", _unknown_codec()),
        ("truncated", _truncated()),
        ("random", _random_bytes()),
        ("null", None),
        ("empty", bytearray(b"")),
    ]
    return spark.createDataFrame(rows, "clip_id string, bytes binary")


def test_decode_ops_skip_malformed(spark, adv_clips):
    from shaclapi_spark.pipeline import audio_analysis as aa
    from shaclapi_spark.pipeline import multimodal as mm

    zcr = {r.clip_id for r in aa.clip_zcr(adv_clips).collect()}
    assert "good" in zcr
    assert zcr <= {"good"}  # every malformed blob skipped, none crashed
    frames = {r.clip_id for r in mm.audio_frame_features(adv_clips, frame_ms=20).collect()}
    assert frames <= {"good"} and "good" in frames
    fp = aa.audio_fingerprint(adv_clips, frame_samples=16)
    assert {r.clip_id for r in fp.collect()} <= {"good"}
    bw = {r.clip_id for r in aa.bandwidth_verdicts(adv_clips).collect()}
    assert bw <= {"good"}


def test_container_stats_report_malformed(spark, adv_clips):
    from shaclapi_spark.pipeline import audio_analysis as aa

    # the integrity accounting op EXISTS to see the bad rows — it must
    # classify rather than skip
    rows = {r.clip_id: r.status for r in aa.container_stats(adv_clips).collect()}
    assert rows["good"] == "ok"
    assert rows["bad_magic"] == "bad_magic"
    assert rows["unknown_codec"] == "bad_codec"
    assert rows["truncated"] == "truncated"
    assert rows["null"] == "null"


def test_transforms_skip_malformed(spark, adv_clips):
    from shaclapi_spark.pipeline import audio_transform as at

    out = {r.clip_id for r in at.decimate(adv_clips, factor=2).collect()}
    assert out <= {"good"} and "good" in out
    tr = {r.clip_id for r in at.trim_silence(adv_clips).collect()}
    assert tr <= {"good"}


def test_validation_flags_malformed(spark, adv_clips):
    from pyspark.sql import functions as F

    from shaclapi_spark.engine import run_suite
    from shaclapi_spark.suite import Constraint, Shape, Suite

    clips = (
        adv_clips.withColumn("sr_hz", F.lit(16000))
        .withColumn("dur_ms", F.lit(125))
        .withColumn("codec", F.lit("pcm_s16le"))
        .withColumn("transcript", F.lit("t"))
    )
    suite = Suite(
        shapes=[
            Shape(
                name="ClipShape",
                table="clips",
                entity_col="clip_id",
                constraints=[
                    Constraint(
                        "pcm_ok",
                        "audio_valid",
                        {"column": "bytes", "min_snr_db": 0.0},
                    ),
                ],
            )
        ]
    )
    res = run_suite(spark, suite, {"clips": clips})
    got = {r.entity_id: r.is_valid for r in res.verdicts.collect()}
    assert got["good"]
    # every malformed container is an INVALID clip, not a crash
    for bad in ("bad_magic", "unknown_codec", "truncated", "random", "null", "empty"):
        assert got[bad] is False, bad
