"""Audio analysis ops: ZCR/bandwidth verdicts, autocorrelation pitch,
container-integrity accounting (pipeline/audio_analysis.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from shaclapi_spark import audio_codec as ac
from shaclapi_spark.pipeline import audio_analysis as aa


def _clip_df(spark, rows):
    return spark.createDataFrame(rows, "clip_id string, bytes binary")


def _sine_blob(freq, sr, n, codec="pcm_s16le", amp=0.8):
    return ac.encode_clip(freq, sr, n, amp, codec)


class TestZcrBandwidth:
    def test_zcr_matches_numpy(self, spark):
        blob = _sine_blob(440.0, 16000, 400)
        _, s = ac.decode_clip(blob)
        neg = s < 0
        expect = int(np.count_nonzero(neg[:-1] != neg[1:]))
        row = aa.clip_zcr(_clip_df(spark, [("c1", bytearray(blob))])).collect()[0]
        assert row.zero_crossings == expect
        assert row.n_samples == 400
        assert row.sr_hz == 16000
        # a 440 Hz sine crosses ~2*440/16000 per sample-pair
        assert abs(expect - 2 * 440 * 399 / 16000) <= 3

    def test_bandwidth_flags_upsampled_content(self, spark):
        rows = [
            # 220 Hz content in a 48 kHz container: f/nyquist ~ 0.009 -> flagged
            ("lowband", bytearray(_sine_blob(220.0, 48000, 480))),
            # 1900 Hz content at 8 kHz: f/nyquist ~ 0.48 -> not flagged
            ("fullband", bytearray(_sine_blob(1900.0, 8000, 480))),
            ("null", None),
        ]
        out = {
            r.clip_id: r.low_bandwidth
            for r in aa.bandwidth_verdicts(_clip_df(spark, rows)).collect()
        }
        assert out == {"lowband": True, "fullband": False}  # null skipped

    def test_bad_num_den(self, spark):
        with pytest.raises(ValueError):
            aa.bandwidth_verdicts(_clip_df(spark, []), num=0)


class TestPitchPeriod:
    def test_pure_sine_pitch_recovered(self, spark):
        rows = []
        cases = {"a": (220.0, 16000, 500), "b": (330.0, 8000, 400), "c": (110.0, 22050, 511)}
        for cid, (f, sr, n) in cases.items():
            rows.append((cid, bytearray(_sine_blob(f, sr, n))))
        got = {r.clip_id: r for r in aa.pitch_period(_clip_df(spark, rows)).collect()}
        for cid, (f, sr, n) in cases.items():
            r = got[cid]
            est_hz = r.pitch_mhz / 1000.0
            # lag quantization bounds the error to about f^2/sr
            assert abs(est_hz - f) <= max(5.0, f * f / sr), (cid, est_hz)
            assert r.periodic
            assert r.best_lag >= 2
            # integer identities
            assert r.pitch_mhz == 1000 * r.sr_hz // r.best_lag

    def test_short_clip_skipped(self, spark):
        # 10 samples at 48 kHz: lag window [24, min(5, 480)] is empty
        blob = ac.encode_samples(
            np.arange(10, dtype=np.int16), "pcm_s16le", 48000
        )
        assert aa.pitch_period(_clip_df(spark, [("s", bytearray(blob))])).count() == 0

    def test_bad_band(self, spark):
        with pytest.raises(ValueError):
            aa.pitch_period(_clip_df(spark, []), f_lo=500, f_hi=100)

    def test_smallest_lag_tiebreak_exact_vs_numpy(self, spark):
        # deterministic non-sine signal: exact argmax parity with numpy
        rng_free = (np.arange(300, dtype=np.int64) * 2654435761) % 20001 - 10000
        s = rng_free.astype(np.int16)
        blob = ac.encode_samples(s, "flac", 16000)
        r = aa.pitch_period(_clip_df(spark, [("x", bytearray(blob))])).collect()[0]
        s64 = s.astype(np.int64)
        m = len(s)  # < 4096: window is the whole clip
        lag_min, lag_max = max(2, 16000 // 2000), min(m // 2, 16000 // 100)
        rf = np.correlate(s64, s64, "full")
        lags = np.arange(lag_min, lag_max + 1)
        rr = rf[m - 1 + lags]
        score = (np.maximum(rr, 0) * (1 << 10)) // (m - lags)
        best = int(score.max())
        mid = score[1:-1]
        ok = (mid >= score[:-2]) & (mid >= score[2:]) & (mid * 1000 >= best * 995)
        hits = np.nonzero(ok)[0]
        k = int(hits[0]) + 1 if len(hits) else int(np.argmax(score))
        assert (r.best_lag, r.r_best, r.r0) == (
            int(lags[k]),
            int(rr[k]),
            int(rf[len(s) - 1]),
        )


class TestContainerStats:
    def _tampered(self, spark):
        ok = _sine_blob(440.0, 16000, 300)
        bad_magic = b"XXXX" + ok[4:]
        bad_codec = ok[:4] + bytes([9]) + ok[5:]
        truncated = ok[: 21 + 100]  # declares 300 samples, carries 50
        return _clip_df(
            spark,
            [
                ("ok", bytearray(ok)),
                ("bad_magic", bytearray(bad_magic)),
                ("bad_codec", bytearray(bad_codec)),
                ("trunc", bytearray(truncated)),
                ("isnull", None),
                ("tiny", bytearray(b"ab")),
            ],
        )

    def test_statuses(self, spark):
        out = {r.clip_id: r for r in aa.container_stats(self._tampered(spark)).collect()}
        assert out["ok"].status == "ok"
        assert out["bad_magic"].status == "bad_magic"
        assert out["bad_codec"].status == "bad_codec"
        assert out["trunc"].status == "truncated"
        assert out["isnull"].status == "null"
        assert out["tiny"].status == "bad_magic"
        # sizes for the parseable row
        assert out["ok"].hdr_n == 300
        assert out["ok"].hdr_sr == 16000
        assert out["ok"].raw_bytes == 600
        assert out["ok"].payload_bytes == 600  # pcm: payload == raw
        # unparseable rows carry NULL sizes
        assert out["bad_magic"].payload_bytes is None
        assert out["isnull"].codec_id is None

    def test_no_python_udf_in_plan(self, spark):
        plan = aa.container_stats(self._tampered(spark))._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        assert "MapInPandas" not in plan

    def test_summary_rollup(self, spark):
        df = self._tampered(spark).withColumn(
            "codec", F.lit("pcm_s16le")
        )
        rows = aa.container_summary(df).collect()
        got = {(r.codec, r.status): r.n_clips for r in rows}
        assert got[("pcm_s16le", "ok")] == 1
        assert got[("pcm_s16le", "bad_magic")] == 2
        assert sum(got.values()) == 6

    def test_flac_payload_equals_raw(self, spark):
        # flac (cumulative XOR) and opus (quantized) both store 2 bytes per
        # sample in this container; the accounting still distinguishes
        # payload from raw via the header-declared n
        blob = _sine_blob(440.0, 16000, 256, codec="flac")
        r = aa.container_stats(_clip_df(spark, [("f", bytearray(blob))])).collect()[0]
        assert r.status == "ok"
        assert r.hdr_n == 256
        assert r.payload_bytes == len(blob) - 21


class TestFingerprint:
    def _ref_tokens(self, blob, n_bands=16):
        # independent numpy reimplementation of the fingerprint spec
        hdr, s = ac.decode_clip(blob)
        flen = hdr["sr_hz"] * 20 // 1000
        sb = flen // n_bands
        nf = len(s) // flen
        if sb == 0 or nf < 3:
            return []
        out = []
        e = []
        for f in range(nf):
            fr = np.abs(s[f * flen : (f + 1) * flen].astype(np.int64))
            e.append([int(fr[b * sb : (b + 1) * sb].sum()) for b in range(n_bands)])
        words = []
        for f in range(nf - 1):
            w = 0
            for b in range(n_bands):
                if e[f + 1][b] > e[f][b]:
                    w |= 1 << b
            words.append(w)
        for p in range(len(words) - 1):
            out.append((p, (words[p] << 16) | words[p + 1]))
        return out

    def test_tokens_match_reference(self, spark):
        # amplitude-modulated content so block energies actually vary
        sr, n = 16000, 16000
        t = np.arange(n)
        s = (
            0.7
            * np.sin(2 * np.pi * 440 * t / sr)
            * (0.2 + 0.8 * np.abs(np.sin(2 * np.pi * 3 * t / sr)))
        )
        pcm = (s * 32767).astype(np.int16)
        blob = ac.encode_pcm(pcm, sr) if hasattr(ac, "encode_pcm") else None
        if blob is None:
            import struct

            payload = pcm.astype("<i2").tobytes()
            blob = b"SGA1" + bytes([0]) + struct.pack("<ii", sr, n) + b"\x00" * 29 + payload
            # fall back to library encoder if the layout guess is wrong
            try:
                ac.decode_clip(blob)
            except Exception:
                pytest.skip("no raw-pcm constructor available")
        got = sorted(
            (r.pos, r.token)
            for r in aa.audio_fingerprint(
                _clip_df(spark, [("c", bytearray(blob))])
            ).collect()
        )
        assert got == sorted(self._ref_tokens(bytes(blob)))
        assert len(got) > 0

    def test_identical_and_gain_scaled_clips_match(self, spark):
        sr, n = 16000, 16000
        loud = _sine_blob(440.0, sr, n, amp=0.8)
        quiet = _sine_blob(440.0, sr, n, amp=0.3)
        other = _sine_blob(1333.0, sr, n, amp=0.8)
        fp = aa.audio_fingerprint(
            _clip_df(
                spark,
                [
                    ("loud", bytearray(loud)),
                    ("copy", bytearray(loud)),
                    ("quiet", bytearray(quiet)),
                    ("other", bytearray(other)),
                ],
            )
        )
        n_tok = fp.filter("clip_id = 'loud'").count()
        assert n_tok > 0
        pairs = {
            (r.a, r.b): r.n_shared
            for r in aa.fingerprint_matches(fp, min_shared=2).collect()
        }
        # bit-identical copy shares every distinct token
        distinct_loud = (
            fp.filter("clip_id = 'loud'").select("token").distinct().count()
        )
        assert pairs.get(("copy", "loud")) == distinct_loud
        # gain-scaled copy still matches (energy comparisons are invariant)
        assert ("loud", "quiet") in pairs or ("quiet", "loud") in pairs

    def test_short_clip_emits_nothing(self, spark):
        blob = _sine_blob(440.0, 16000, 500)  # < 3 complete 320-sample frames
        assert (
            aa.audio_fingerprint(_clip_df(spark, [("s", bytearray(blob))])).count()
            == 0
        )

    def test_n_bands_guard(self, spark):
        with pytest.raises(ValueError):
            aa.audio_fingerprint(_clip_df(spark, []), n_bands=8)

    def test_max_bucket_drops_degenerate_tokens(self, spark):
        sr, n = 16000, 16000
        blob = _sine_blob(440.0, sr, n, amp=0.8)
        rows = [(f"c{i}", bytearray(blob)) for i in range(6)]
        fp = aa.audio_fingerprint(_clip_df(spark, rows))
        # 6 identical clips: every token lives in a 6-clip bucket, so a cap
        # of 3 drops them all and no pair survives; uncapped, all 15 pairs
        assert aa.fingerprint_matches(fp, min_shared=2).count() == 15
        assert (
            aa.fingerprint_matches(fp, min_shared=2, max_bucket=3).count() == 0
        )
