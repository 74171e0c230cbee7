"""CELT encoder analysis units: tone detector, transient detector,
hysteresis, dynalloc boosts, tf analysis, stereo/spread decisions
(reference celt/celt_encoder.rs + celt/bands.rs models)."""

import numpy as np
import pytest

from mousiki_tpu.celt.encoder import (CeltEncoder, INTENSITY_HYSTERESIS,
                                      INTENSITY_THRESHOLDS,
                                      _hysteresis_decision)


def _enc(channels=1):
    return CeltEncoder(channels=channels, stream_channels=channels, end=21)


def test_tone_detect_identifies_sinusoid():
    enc = _enc()
    n = 1080
    t = np.arange(n)
    for f in (440.0, 1000.0, 3000.0, 8000.0):
        w = 2 * np.pi * f / 48000.0
        x = np.sin(w * t)[None, :]
        freq, tone = enc._tone_detect(x, 1)
        assert tone > 0.95, (f, tone)
        assert abs(freq - w) < 0.1 * w, (f, freq, w)


def test_tone_detect_rejects_noise_and_silence():
    enc = _enc()
    rng = np.random.default_rng(0)
    freq, tone = enc._tone_detect(rng.standard_normal((1, 1080)), 1)
    assert tone < 0.9
    freq, tone = enc._tone_detect(np.zeros((1, 1080)), 1)
    assert tone == 0.0 and freq == -1.0


def test_transient_analysis_detects_onset():
    enc = _enc()
    n = 1080
    quiet = np.zeros((1, n))
    quiet[0, 700:] = np.sign(np.sin(2 * np.pi * 3000 / 48000
                                    * np.arange(380))) * 0.5
    hit, tf_est, chan = enc._transient_analysis(quiet * 32768, n, 1)
    assert hit and tf_est > 0.0
    flat = np.sin(2 * np.pi * 440 / 48000 * np.arange(n))[None, :] * 16384
    hit, tf_est, _ = enc._transient_analysis(flat, n, 1)
    assert not hit


def test_hysteresis_decision_sticks():
    # rising input crosses thresholds; small wiggles near the boundary
    # keep the previous index
    i = _hysteresis_decision(50.0, INTENSITY_THRESHOLDS,
                             INTENSITY_HYSTERESIS, 0)
    assert INTENSITY_THRESHOLDS[i - 1] <= 50 < INTENSITY_THRESHOLDS[i]
    # just above the lower threshold with prev one higher: sticks to prev
    assert _hysteresis_decision(49.0, INTENSITY_THRESHOLDS,
                                INTENSITY_HYSTERESIS, i) == i


def test_dynalloc_boosts_tonal_band():
    enc = _enc()
    nb = enc.mode.num_ebands
    ble = np.full((2, nb), -10.0)
    ble[0, 10] = 5.0  # one band far above the floor
    want, importance, sw = enc._dynalloc_analysis(
        ble, np.full((2, nb), -28.0), 1, 3, 100, False)
    assert want[10] > 0
    assert all(want[i] == 0 for i in range(nb) if abs(i - 10) > 2)
    assert importance[10] > importance[5]
    # below the effective-bytes gate: no boosts
    want2, imp2, _ = enc._dynalloc_analysis(
        ble, np.full((2, nb), -28.0), 1, 3, 20, False)
    assert all(v == 0 for v in want2) and all(v == 13 for v in imp2)


def test_tf_analysis_prefers_fine_time_for_transient():
    enc = _enc()
    LM, M = 3, 8
    N = enc.mode.short_mdct_size * M
    rng = np.random.default_rng(2)
    # impulse-like spectrum (flat) vs tonal (sparse) band content
    X = np.zeros((2, N))
    X[0, :N] = rng.standard_normal(N) * 0.1
    imp = [13] * enc.mode.num_ebands
    tf_res, tf_sel = enc._tf_analysis(18, True, 100, X, N, LM, 0.5, imp)
    assert len(tf_res) == enc.mode.num_ebands
    assert all(r in (0, 1) for r in tf_res[:18])
    assert tf_sel in (0, 1)
