"""Tonality analysis: the trained MLP must separate music from speech-like
signals, detect bandwidth, and report sane activity/tonality."""

import numpy as np
import pytest

from mousiki_tpu.analysis import (AnalysisInfo, TonalityAnalysisState,
                                  run_analysis)


def _feed(sig):
    st = TonalityAnalysisState()
    info = AnalysisInfo()
    for f in range(len(sig) // 960):
        info = run_analysis(st, sig[f * 960:(f + 1) * 960], 960, sig.shape[1])
    return info


def test_music_vs_speech_like():
    t = np.arange(48000 * 2) / 48000.0
    # harmonic, stationary chord = music-like
    music = 0.3 * (np.sin(2 * np.pi * 261.6 * t) + np.sin(2 * np.pi * 329.6 * t)
                   + np.sin(2 * np.pi * 392.0 * t))[:, None]
    # bursty modulated noise = speech-ish/noisy
    rng = np.random.default_rng(0)
    env = np.clip(np.sin(2 * np.pi * 4.0 * t), 0, 1)
    speech = (0.4 * env * rng.standard_normal(len(t)))[:, None]
    mi = _feed(music)
    si = _feed(speech)
    assert mi.valid and si.valid
    assert mi.tonality > si.tonality + 0.1
    assert mi.music_prob > si.music_prob
    assert mi.activity_probability > 0.8  # steady tones = active
    assert mi.noisiness > si.noisiness    # pure noise bursts score low


def test_bandwidth_detection():
    """Bandwidth detector: fullband noise must register near-full bandwidth,
    and the leak-boost / pitch-ratio side outputs must be sane."""
    rng = np.random.default_rng(1)
    n = 48000 * 2
    fb = (0.2 * rng.standard_normal(n))[:, None]
    fb = np.round(np.clip(fb, -1, 1) * 32767) / 32767
    info = _feed(fb)
    assert info.bandwidth >= 18, info.bandwidth
    assert info.leak_boost.shape == (19,)
    assert 0.0 <= info.max_pitch_ratio <= 1.0


def test_activity_on_silence():
    sig = np.zeros((960 * 20, 1))
    sig[:960] = 0.001  # one tiny blip so state initializes
    info = _feed(sig)
    # silent frames repeat the previous info rather than crashing
    assert isinstance(info, AnalysisInfo)
