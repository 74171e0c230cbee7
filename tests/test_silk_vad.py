"""SILK fixed-point VAD (silk/vad.py, reference src/silk/vad.rs)."""

import numpy as np

from mousiki_tpu.silk.vad import VadState, compute_speech_activity, sigm_q15


def test_silence_matches_reference_constant():
    """Reference vad.rs unit test: all-zero frame -> activity_q8 == 2."""
    st = VadState()
    compute_speech_activity(st, np.zeros(320), 16)
    assert st.speech_activity_q8 == 2


def test_strong_signal_triggers_activity():
    st = VadState()
    compute_speech_activity(st, np.full(320, 2000.0), 16)
    assert st.speech_activity_q8 > 0
    assert any(q > 0 for q in st.input_quality_bands_q15)


def test_speech_vs_noise_discrimination():
    """After the noise estimator converges on steady noise, a speech
    onset reads high activity and the noise floor reads low."""
    st = VadState()
    rng = np.random.default_rng(7)
    noise = lambda: rng.standard_normal(320) * 25.0
    for _ in range(60):                      # converge the noise tracker
        compute_speech_activity(st, noise(), 16)
    a_noise = compute_speech_activity(st, noise(), 16)
    t = np.arange(320) / 16000.0
    speech = 8000 * np.sin(2 * np.pi * 180 * t) * np.hanning(320)
    a_speech = compute_speech_activity(st, speech + noise(), 16)
    assert a_speech > 0.6, a_speech
    assert a_noise < 0.3, a_noise


def test_tilt_sign_tracks_spectrum():
    """Low-frequency energy -> positive tilt; hiss -> negative tilt."""
    lo_st, hi_st = VadState(), VadState()
    t = np.arange(320) / 16000.0
    for _ in range(4):
        compute_speech_activity(lo_st, 9000 * np.sin(2 * np.pi * 300 * t),
                                16)
        compute_speech_activity(hi_st, 9000 * np.sin(2 * np.pi * 6800 * t),
                                16)
    assert lo_st.input_tilt_q15 > 8000, lo_st.input_tilt_q15
    assert hi_st.input_tilt_q15 < -8000, hi_st.input_tilt_q15


def test_sigm_q15_bounds_and_midpoint():
    assert sigm_q15(0) == 16384
    assert sigm_q15(192) == 32767
    assert sigm_q15(-192) == 0
    vals = [sigm_q15(v) for v in range(-192, 193, 8)]
    assert all(b >= a for a, b in zip(vals, vals[1:]))   # monotone
