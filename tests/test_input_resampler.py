"""Arbitrary-rate input resampler (libopusenc speex front-end equivalent,
reference src/libopusenc/resample.rs) + the OpusEnc PCM-in writer."""

import numpy as np
import pytest

from mousiki_tpu.ops.input_resampler import (ArbitraryResampler,
                                             resample_batched,
                                             resample_block)


def _tone_snr(y, freq, fs=48000):
    m = len(y)
    seg = slice(m // 4, 3 * m // 4)
    t = np.arange(m)[seg] / fs
    A = np.stack([np.sin(2 * np.pi * freq * t),
                  np.cos(2 * np.pi * freq * t)], 1)
    coef, *_ = np.linalg.lstsq(A, y[seg], rcond=None)
    fit = A @ coef
    e = y[seg] - fit
    return 10 * np.log10((fit ** 2).mean() / ((e ** 2).mean() + 1e-30))


@pytest.mark.parametrize("rate,min_snr", [
    (44100, 90), (24000, 90), (16000, 90), (8000, 90), (96000, 120)])
def test_tone_fidelity(rate, min_snr):
    t = np.arange(rate) / rate
    x = np.sin(2 * np.pi * 1000 * t)
    y = ArbitraryResampler(rate, 48000, 1, 5).process(x[:, None])[:, 0]
    assert abs(len(y) - 48000) < 400
    assert _tone_snr(y, 1000) > min_snr


def test_streaming_matches_oneshot():
    rate = 44100
    rng = np.random.default_rng(3)
    x = rng.standard_normal((rate, 2))
    y1 = ArbitraryResampler(rate, 48000, 2, 5).process(x)
    rs = ArbitraryResampler(rate, 48000, 2, 5)
    y2 = np.concatenate([rs.process(x[i: i + 777])
                         for i in range(0, rate, 777)])
    n = min(len(y1), len(y2))
    assert np.array_equal(y1[:n], y2[:n])


def test_alias_rejection():
    """Content above the output Nyquist must be filtered out on downsample."""
    t = np.arange(96000) / 96000.0
    x = np.sin(2 * np.pi * 30000 * t)  # 30 kHz > 24 kHz output Nyquist
    y = ArbitraryResampler(96000, 48000, 1, 5).process(x[:, None])[:, 0]
    assert np.abs(y[2000:-2000]).max() < 10 ** (-80 / 20)


def test_batched_device_variant():
    import jax
    jax.config.update("jax_platforms", "cpu")
    rate = 16000
    t = np.arange(rate) / rate
    x = np.stack([np.sin(2 * np.pi * 440 * t),
                  np.sin(2 * np.pi * 880 * t)]).astype(np.float32)
    y = np.asarray(resample_batched(x, rate, 48000, 5))
    assert y.shape[0] == 2 and abs(y.shape[1] - 48000) < 400
    assert _tone_snr(y[0].astype(np.float64), 440) > 80
    assert _tone_snr(y[1].astype(np.float64), 880) > 80


def test_opusenc_pcm_writer_roundtrip():
    """44.1 kHz PCM in -> .opus file -> decoded tone at 48 kHz."""
    from mousiki_tpu.containers.opusfile import OggOpusReader, OpusEnc

    rate = 44100
    t = np.arange(rate) / rate
    sig = (0.4 * np.sin(2 * np.pi * 440 * t))[:, None]
    oe = OpusEnc(rate, 1, bitrate=64000, comments=["TITLE=tone"])
    for i in range(0, rate, 4410):
        oe.write(sig[i: i + 4410])
    blob = oe.finish()

    rd = OggOpusReader(blob)
    assert rd.head["input_rate"] == 44100
    pcm = rd.decode_all()[:, 0]
    assert len(pcm) > 40000
    assert _tone_snr(pcm, 440) > 15  # codec-limited, tone intact
