"""Hypothesis property tests for the deterministic pure-Python cores the
Spark operators are built on — no SparkSession in the loop, so these run
hundreds of generated examples cheaply. Each property pins a contract the
DuckDB oracles or cross-engine tests rely on."""

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from shaclapi_spark import audio_codec as ac
from shaclapi_spark.ops.drift import ks_psi
from shaclapi_spark.pipeline.sampling import _HASH_SPACE, _cutoff

CODECS = ["pcm_s16le", "flac", "opus"]


@given(
    freq=st.floats(20.0, 8000.0, allow_nan=False),
    sr=st.sampled_from([8000, 16000, 44100, 48000]),
    n=st.integers(1, 2048),
    amp=st.floats(0.0, 1.0, allow_nan=False),
    codec=st.sampled_from(CODECS),
)
@settings(max_examples=60, deadline=None)
def test_encode_decode_roundtrip(freq, sr, n, amp, codec):
    """decode(encode(x)) preserves the header exactly and yields n samples;
    pcm is bit-exact, flac's XOR transform is lossless, opus quantization
    truncates to 64-step grid (error < one full step per sample)."""
    blob = ac.encode_clip(freq, sr, n, amp, codec)
    hdr, samples = ac.decode_clip(blob)
    assert hdr["sr_hz"] == sr and hdr["n_samples"] == n == len(samples)
    clean = ac.synth_sine(freq, sr, n, amp)
    if codec in ("pcm_s16le", "flac"):
        assert np.array_equal(samples, clean)
    else:
        assert np.max(np.abs(samples.astype(np.int64) - clean.astype(np.int64))) < 64


@given(
    freq=st.floats(20.0, 8000.0, allow_nan=False),
    n=st.integers(0, 1024),
    # amp is either exactly 0 or >= 1e-6 of full scale: references below the
    # int16 quantization floor are degenerate (the encoded signal is all-zero
    # regardless), and under float32 subnormal underflow the two paths
    # legitimately diverge there — see snr_db_batch docstring
    amp=st.one_of(st.just(0.0), st.floats(1e-6, 1.0, allow_nan=False)),
    codec=st.sampled_from(CODECS),
)
@settings(max_examples=60, deadline=None)
def test_snr_scalar_batch_parity(freq, n, amp, codec):
    """The scalar and Arrow-batch SNR paths must agree on the VERDICT
    (>= 30 dB) for any clip whose true SNR is not inside a 1 dB band
    around the threshold — the contract the engine actually relies on.
    Pointwise dB equality is NOT the contract: the batch float32-sin fast
    path perturbs the noise power, and near exactly-representable signals
    (e.g. freq=4000 @ sr=16000: phases k*pi/2) the float64 noise is ~0 so
    the dB gap is unbounded even though both sides sit far above any sane
    threshold. Moderate SNRs (< 80 dB, where quantization noise dominates)
    must still agree within 1 dB."""
    blob = ac.encode_clip(freq, 16000, n, amp, codec)
    s = ac.snr_db(blob)
    b = float(ac.snr_db_batch([blob])[0])
    thresh = 30.0
    if math.isinf(s) or abs(s - thresh) > 1.0:
        assert (s >= thresh) == (b >= thresh)
    # float32 ARGUMENT rounding bounds the batch path's SNR floor: at phase
    # ~n*pi (up to ~3200 rad at n=1024) the phase error is ~2e-4 rad, i.e.
    # a ~70 dB effective floor — so pointwise dB agreement is only
    # guaranteed where true quantization noise dominates (s < 50 dB leaves
    # the perturbation >= 20 dB under the noise, < 0.05 dB shift)
    if not math.isinf(s) and not math.isinf(b) and s < 50.0:
        assert abs(s - b) < 1.0


@given(
    obs=st.lists(st.integers(0, 10_000), min_size=2, max_size=64),
    scale=st.integers(1, 1000),
)
@settings(max_examples=100, deadline=None)
def test_ks_psi_zero_on_scaled_self(obs, scale):
    """A distribution compared against a scaled copy of itself drifts by
    ~0 (scale invariance — the reference histogram is a different sample
    size by construction, so this property is what makes the drift check
    meaningful at all); and ks is always in [0, 1], psi >= ~0. Invariance
    is exact only up to the eps=1e-6 Laplace smoothing, which is added
    BEFORE normalization and therefore carries different relative weight
    at different scales — bound is ~eps * n_bins, far below any real
    drift threshold (suite uses max_psi=0.02)."""
    o = np.asarray(obs, dtype=np.float64)
    ks, psi = ks_psi(o, o * scale)
    tol = 1e-6 * len(obs) * 2
    assert abs(ks) < tol and abs(psi) < tol
    ref = np.roll(o, 1) + 1.0
    ks2, psi2 = ks_psi(o, ref)
    assert 0.0 <= ks2 <= 1.0
    assert psi2 >= -1e-12


@given(rate=st.floats(0.0, 1.0, allow_nan=False))
@settings(max_examples=200, deadline=None)
def test_cutoff_monotone_and_bounded(rate):
    """Sampling cutoffs are exact-integer, bounded by the hash space, and
    monotone in the rate — the property that makes nested samples of
    increasing rate supersets of each other."""
    c = _cutoff(rate)
    assert 0 <= c <= _HASH_SPACE
    assert _cutoff(min(1.0, rate + 0.1)) >= c


# ---------------------------------------------------------------------------
# BPE greedy encoder core
# ---------------------------------------------------------------------------

def _merge_pairs_strategy():
    sym = st.text(alphabet="abcd", min_size=1, max_size=2)
    return st.lists(st.tuples(sym, sym), min_size=0, max_size=12, unique=True)


@given(word=st.text(alphabet="abcd", min_size=0, max_size=16), merges=_merge_pairs_strategy())
@settings(max_examples=200, deadline=None)
def test_bpe_encode_word_invariants(word, merges):
    """_encode_word: (1) concatenating the output reproduces the word —
    merging never drops or reorders characters; (2) no adjacent output
    pair is itself mergeable (greedy runs to a fixpoint); (3) result is
    deterministic."""
    from shaclapi_spark.pipeline.corpus import _encode_word

    ranks = {p: i for i, p in enumerate(merges)}
    out = _encode_word(word, ranks)
    assert "".join(out) == word
    for a, b in zip(out, out[1:]):
        assert (a, b) not in ranks, (word, merges, out)
    assert out == _encode_word(word, ranks)


@given(
    counts=st.dictionaries(
        st.text(alphabet="abc", min_size=2, max_size=6),
        st.integers(1, 50),
        min_size=1,
        max_size=8,
    ),
    n_merges=st.integers(0, 10),
)
@settings(max_examples=100, deadline=None)
def test_bpe_training_prefix_stability(counts, n_merges):
    """Training k merges then k+3 yields the same first k — the library
    merge loop is prefix-stable (what lets a pipeline extend a tokenizer
    without re-encoding history). Also: encoding each training word with
    ALL merges applied leaves no mergeable adjacent pair."""
    from shaclapi_spark.pipeline.corpus import _encode_word, bpe_merge_loop

    wc = list(counts.items())
    m1 = bpe_merge_loop(wc, n_merges)
    m2 = bpe_merge_loop(wc, n_merges + 3)
    assert m2[: len(m1)] == m1
    ranks = {p: i for i, p in enumerate(m2)}
    for w, _c in wc:
        out = _encode_word(w, ranks)
        assert "".join(out) == w


# ---------------------------------------------------------------------------
# imagery codec properties (round 4)
# ---------------------------------------------------------------------------

@given(
    w=st.integers(min_value=1, max_value=40),
    h=st.integers(min_value=1, max_value=30),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=80, deadline=None)
def test_bmp_ppm_round_trip_any_dims(w, h, seed):
    import numpy as np

    from shaclapi_spark.pipeline import imagery as im

    rng = np.random.default_rng(seed)
    pix = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(im.decode_image(im.encode_bmp(pix)), pix)
    assert np.array_equal(im.decode_image(im.encode_ppm(pix)), pix)


@given(
    w=st.integers(min_value=1, max_value=32),
    h=st.integers(min_value=1, max_value=24),
    n=st.integers(min_value=0, max_value=8),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=80, deadline=None)
def test_video_round_trip_any_shape(w, h, n, seed):
    import numpy as np

    from shaclapi_spark.pipeline import imagery as im

    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 256, size=(n, h, w), dtype=np.uint8)
    hdr, back = im.decode_video(im.encode_video(frames, fps=30))
    assert hdr == {"w": w, "h": h, "n_frames": n, "fps": 30}
    assert np.array_equal(back, frames)


@given(
    w=st.integers(min_value=1, max_value=40),
    h=st.integers(min_value=1, max_value=30),
    out_w=st.integers(min_value=1, max_value=16),
    out_h=st.integers(min_value=1, max_value=12),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=80, deadline=None)
def test_resize_nearest_properties(w, h, out_w, out_h, seed):
    import numpy as np

    from shaclapi_spark.pipeline import imagery as im

    rng = np.random.default_rng(seed)
    pix = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    t = im.resize_nearest(pix, out_w, out_h)
    assert t.shape == (out_h, out_w, 3)
    # every output pixel is an actual source pixel (nearest-neighbor:
    # no interpolation, no invented values), selected by the exact rule
    for y in (0, out_h - 1):
        for x in (0, out_w - 1):
            assert np.array_equal(t[y, x], pix[(y * h) // out_h, (x * w) // out_w])
    # identity when dims match
    assert np.array_equal(im.resize_nearest(pix, w, h), pix)


@given(
    w=st.integers(min_value=2, max_value=40),
    h=st.integers(min_value=2, max_value=30),
    shift=st.integers(min_value=-40, max_value=40),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=60, deadline=None)
def test_dhash_brightness_invariance(w, h, shift, seed):
    import numpy as np

    from shaclapi_spark.pipeline import imagery as im

    rng = np.random.default_rng(seed)
    pix = rng.integers(60, 196, size=(h, w, 3), dtype=np.uint8)
    shifted = np.clip(pix.astype(np.int64) + shift, 0, 255).astype(np.uint8)
    # pixel range keeps shift from clipping, so the luma ORDER between any
    # two pixels is preserved -> identical hash
    assert im.dhash_pixels(pix) == im.dhash_pixels(shifted)
    v = im.dhash_pixels(pix)
    assert -(1 << 63) <= v < (1 << 63)


@given(
    n=st.integers(min_value=1, max_value=10**12),
    threshold=st.floats(min_value=0.3, max_value=0.99),
)
@settings(max_examples=200, deadline=None)
def test_neardup_band_geometry_invariants(n, threshold):
    """Auto band geometry: occupancy bounded (until the bit clamp),
    band_bits monotone in n, n_bands >= 1, and the recall law holds at
    the returned geometry."""
    from shaclapi_spark.pipeline.similarity import neardup_band_geometry

    n_bands, band_bits = neardup_band_geometry(n, threshold)
    assert n_bands >= 1 and 6 <= band_bits <= 24
    if band_bits < 24:  # below the clamp the occupancy target binds
        assert n / 2**band_bits <= 64 + 1e-9
    # monotone: more vectors never means fewer bits
    nb2, bits2 = neardup_band_geometry(min(n * 10, 10**13), threshold)
    assert bits2 >= band_bits
    # the geometry must actually deliver the target recall at the
    # threshold cosine (the law the docstring states)
    p = 1.0 - math.acos(threshold) / math.pi
    recall = 1.0 - (1.0 - p**band_bits) ** n_bands
    assert recall >= 0.99 - 1e-6


@given(st.text(min_size=0, max_size=200))
@settings(max_examples=300, deadline=None)
def test_star_target_filter_total_on_arbitrary_text(q):
    """The translator is TOTAL over arbitrary input: it returns None
    (not a star SELECT), a string, or raises ValueError — never any
    other exception type (it parses user-supplied shape files)."""
    from shaclapi_spark.shacl import ShapeBinding, star_target_filter

    b = ShapeBinding(
        table="t", entity_col="id", class_column="cls",
        columns={"name": "name", "score": "score"},
    )
    try:
        out = star_target_filter(q, b)
    except ValueError:
        return
    assert out is None or isinstance(out, str)


@given(
    use_class=st.booleans(),
    lit=st.text(
        alphabet=st.characters(blacklist_characters="'\"\\{}?<>", min_codepoint=32, max_codepoint=126),
        min_size=1, max_size=12,
    ),
    threshold=st.integers(min_value=0, max_value=99),
)
@settings(max_examples=100, deadline=None)
def test_star_target_filter_roundtrip_structured(use_class, lit, threshold):
    """Structured star queries translate to exactly the expected
    conjunction — no conjunct dropped, none invented."""
    from shaclapi_spark.shacl import ShapeBinding, star_target_filter

    b = ShapeBinding(
        table="t", entity_col="id", class_column="cls",
        columns={"name": "name", "score": "score"},
    )
    parts = []
    expected = []
    if use_class:
        parts.append("?x a <http://ex/W> .")
        expected.append("cls = 'W'")
    parts.append(f"?x <http://ex/name> '{lit}' .")
    expected.append(f"name = '{lit}'")
    parts.append(f"?x <http://ex/score> ?s . FILTER(?s >= {threshold})")
    expected.append("score IS NOT NULL")
    expected.append(f"score >= {threshold}")
    q = "SELECT ?x WHERE { " + " ".join(parts) + " }"
    assert star_target_filter(q, b) == " AND ".join(expected)
