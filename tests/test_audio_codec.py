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
