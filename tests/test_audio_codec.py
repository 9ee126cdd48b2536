import numpy as np
import pytest

from shaclapi_spark import audio_codec as ac


@pytest.mark.parametrize("codec", ["pcm_s16le", "flac", "opus"])
def test_roundtrip_snr_high(codec):
    blob = ac.encode_clip(440.0, 16000, 400, 0.8, codec)
    hdr, samples = ac.decode_clip(blob)
    assert hdr["codec"] == codec
    assert hdr["n_samples"] == 400
    assert len(samples) == 400
    snr = ac.snr_db(blob)
    assert snr >= 50.0, f"{codec}: clean clip should be well above gate, got {snr}"


@pytest.mark.parametrize("codec", ["pcm_s16le", "flac", "opus"])
def test_corrupted_fails_gate(codec):
    blob = ac.encode_clip(440.0, 16000, 400, 0.8, codec, corrupt=True)
    assert ac.snr_db(blob) < 30.0


def test_lossless_roundtrip_exact():
    ref = ac.synth_sine(660.0, 8000, 256, 0.8)
    for codec in ("pcm_s16le", "flac"):
        blob = ac.encode_clip(660.0, 8000, 256, 0.8, codec)
        _, got = ac.decode_clip(blob)
        np.testing.assert_array_equal(got, ref)


def test_malformed_blob():
    assert ac.snr_db(b"") == float("-inf")
    assert ac.snr_db(b"XXXX" + b"\x00" * 40) == float("-inf")
    with pytest.raises(ValueError):
        ac.decode_clip(b"SGA1")


def test_external_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        ac.decode_external(b"\x00", "opus")


def test_zero_sample_clip_scalar_and_batch_agree():
    # n_samples == 0: both implementations must pin the same verdict (-inf,
    # "no evidence of a valid signal"); previously the scalar fell through
    # to the p_noise <= 0 branch and returned +inf
    blob = ac.encode_clip(440.0, 16000, 0, 0.8, "pcm_s16le")
    scalar = ac.snr_db(blob)
    (batch,) = ac.snr_db_batch([blob])
    assert scalar == float("-inf")
    assert batch == float("-inf")
    assert scalar == batch


# ---------------------------------------------------------------------------
# real PCM-WAV container (round 4)
# ---------------------------------------------------------------------------

def test_wav_round_trip_and_stdlib_compat(tmp_path):
    import wave as stdlib_wave

    s = ac.synth_sine(440.0, 16000, 500, 0.6)
    blob = ac.encode_wav(s, 16000)
    assert len(blob) == 44 + 2 * 500
    hdr, back = ac.decode_wav(blob)
    assert hdr["codec"] == "pcm_wav" and hdr["sr_hz"] == 16000
    assert hdr["freq_hz"] is None and hdr["amp"] is None
    assert np.array_equal(back, s)
    # the stdlib wave module accepts the canonical container
    p = tmp_path / "t.wav"
    p.write_bytes(blob)
    with stdlib_wave.open(str(p)) as w:
        assert (w.getframerate(), w.getnchannels(), w.getsampwidth()) == (
            16000, 1, 2,
        )
        assert np.array_equal(
            np.frombuffer(w.readframes(500), dtype="<i2"), s
        )


def test_wav_chunk_walk_and_stereo():
    import struct as st

    s = ac.synth_sine(300.0, 8000, 64, 0.4)
    blob = bytearray(ac.encode_wav(s, 8000))
    # splice a LIST chunk between fmt and data (real-world WAVs do this)
    info = b"LIST" + st.pack("<I", 4) + b"INFO"
    spliced = bytes(blob[:36]) + info + bytes(blob[36:])
    spliced = spliced[:4] + st.pack("<I", len(spliced) - 8) + spliced[8:]
    hdr, back = ac.decode_wav(spliced)
    assert np.array_equal(back, s)
    # stereo: channel 0 extracted
    inter = np.empty(2 * len(s), dtype="<i2")
    inter[0::2] = s
    inter[1::2] = -s
    stereo = (
        bytes(blob[:22]) + st.pack("<H", 2) + bytes(blob[24:40])
        + st.pack("<I", len(inter) * 2) + inter.tobytes()
    )
    stereo = stereo[:4] + st.pack("<I", len(stereo) - 8) + stereo[8:]
    hdr2, back2 = ac.decode_wav(stereo)
    assert np.array_equal(back2, s)


def test_wav_rejections_and_dispatch():
    s = ac.synth_sine(440.0, 16000, 100, 0.5)
    blob = ac.encode_wav(s, 16000)
    with pytest.raises(ValueError):
        ac.decode_wav(blob[:30])  # truncated
    with pytest.raises(ValueError):
        ac.decode_wav(b"XXXX" + blob[4:])  # bad magic
    # decode_clip dispatches RIFF automatically
    hdr, back = ac.decode_clip(blob)
    assert hdr["codec"] == "pcm_wav" and np.array_equal(back, s)
    # decode_external handles wav natively, still gates compressed codecs
    assert np.array_equal(ac.decode_external(blob, "wav"), s)
    with pytest.raises(NotImplementedError):
        ac.decode_external(blob, "mp3")


def test_wav_snr_not_applicable():
    """A decodable WAV has no embedded reference signal: the SNR check is
    NOT APPLICABLE — NaN (→ NULL verdict downstream), distinguishable
    from 'passed SNR' (+inf would silently conflate them, round-4
    advice); an UNdecodable RIFF blob is still a hard -inf fail."""
    s = ac.synth_sine(440.0, 16000, 100, 0.5)
    blob = ac.encode_wav(s, 16000)
    assert np.isnan(ac.snr_db(blob))
    batch = ac.snr_db_batch([blob, None, b"RIFFbad"])
    assert np.isnan(batch[0])
    assert np.isnan(batch[1]) and batch[2] == float("-inf")


def test_wav_hostile_headers():
    import struct as st

    s = ac.synth_sine(440.0, 8000, 64, 0.5)
    good = ac.encode_wav(s, 8000)

    # data chunk declaring more bytes than the file carries
    huge = bytearray(good)
    huge[40:44] = st.pack("<I", 0xFFFFFF00)
    with pytest.raises(ValueError):
        ac.decode_wav(bytes(huge))

    # zero-size foreign chunk before data: the walk must make progress
    # (pos advances by the 8-byte header) and still find the data chunk
    z = bytes(good[:36]) + b"JUNK" + st.pack("<I", 0) + bytes(good[36:])
    z = z[:4] + st.pack("<I", len(z) - 8) + z[8:]
    _, back = ac.decode_wav(z)
    assert np.array_equal(back, s)

    # odd-size foreign chunk: word-alignment padding honored
    o = bytes(good[:36]) + b"JUNK" + st.pack("<I", 3) + b"ab c" + bytes(good[36:])
    o = o[:4] + st.pack("<I", len(o) - 8) + o[8:]
    _, back = ac.decode_wav(o)
    assert np.array_equal(back, s)

    # fmt declaring float (3) or 8-bit: unsupported, not garbage samples
    f = bytearray(good)
    f[20:22] = st.pack("<H", 3)
    with pytest.raises(ValueError):
        ac.decode_wav(bytes(f))
    b8 = bytearray(good)
    b8[34:36] = st.pack("<H", 8)
    with pytest.raises(ValueError):
        ac.decode_wav(bytes(b8))

    # missing data chunk entirely
    nodata = bytes(good[:36])
    nodata = nodata[:4] + st.pack("<I", len(nodata) - 8) + nodata[8:]
    with pytest.raises(ValueError):
        ac.decode_wav(nodata)
