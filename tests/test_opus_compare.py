"""opus_compare quality gate: identical audio passes trivially; codec
output at a healthy rate passes the reference OPUS thresholds; heavily
corrupted audio fails."""

import importlib.util
import sys

import numpy as np
import pytest

spec = importlib.util.spec_from_file_location("opus_compare",
                                              "tools/opus_compare.py")
oc = importlib.util.module_from_spec(spec)
spec.loader.exec_module(oc)

from mousiki_tpu.bitstream.packet import Mode
from mousiki_tpu.opus_decoder import OpusDecoder
from mousiki_tpu.opus_encoder import OpusEncoder, APP_VOIP
from mousiki_tpu.testing import oracle

needs_oracle = pytest.mark.skipif(not oracle.available(), reason="no oracle")


def _speechish(n):
    t = np.arange(n) / 16000.0
    return np.clip(
        8000 * np.sin(2 * np.pi * 140 * t) * (1 + 0.4 * np.sin(2 * np.pi * 3 * t))
        + 3000 * np.sin(2 * np.pi * 700 * t), -30000, 30000)


def test_identical_passes():
    x = _speechish(16000)
    r = oc.compare(x, x, oc.DRED_DECODE_THRESHOLDS)
    assert r["ok"] and r["err4"] < 1e-3 and r["pitch"] < 1e-6


def test_corrupted_fails():
    x = _speechish(16000)
    rng = np.random.default_rng(0)
    y = x + 8000 * rng.standard_normal(len(x))
    r = oc.compare(x, y, oc.OPUS_THRESHOLDS)
    assert not r["ok"]


def test_codec_roundtrip_passes_gate():
    """Our encoder+decoder at 24 kbps must pass the reference's OPUS
    comparison thresholds on speech-like content (measured at 16 kHz)."""
    n48 = 48000 * 2
    t = np.arange(n48) / 48000.0
    sig = np.clip(0.4 * np.sin(2 * np.pi * 140 * t)
                  * (1 + 0.4 * np.sin(2 * np.pi * 3 * t))
                  + 0.15 * np.sin(2 * np.pi * 700 * t), -0.9, 0.9)[:, None]
    enc = OpusEncoder(48000, 1, APP_VOIP)
    enc.set_bitrate(24000)
    enc.force_mode = Mode.SILK
    dec = OpusDecoder(16000, 1)  # decode at 16 kHz for the comparison
    out = np.concatenate([
        dec.decode(enc.encode(sig[f * 960:(f + 1) * 960], 960), 320)
        for f in range(n48 // 960)])[:, 0]
    ref16 = sig[::3, 0]  # 48k -> 16k (band-limited content)
    # align (codec delay) with best integer lag
    best, best_lag = -1e9, 0
    a = ref16 * 32768
    b = out * 32768
    for lag in range(0, 200):
        bb = b[lag:][: len(a) - lag]
        aa = a[: len(bb)]
        v = -np.mean((aa - bb) ** 2)
        if v > best:
            best, best_lag = v, lag
    y = b[best_lag:][: len(a) - best_lag]
    x = a[: len(y)]
    r = oc.compare(x, y, oc.OPUS_THRESHOLDS, verbose=True)
    assert r["ok"], r
