"""Robustness: random/corrupted packets must never crash the decoder, and
the decoder must stay usable afterwards (fuzz_decoder.rs / test_opus_decode
strategy, SURVEY.md §4.4). Plus soft clip parity vs libopus."""

import ctypes as C
import random

import numpy as np
import pytest

from mousiki_tpu.bitstream.packet import InvalidPacket
from mousiki_tpu.opus_decoder import OpusDecoder
from mousiki_tpu.softclip import opus_pcm_soft_clip
from mousiki_tpu.testing import oracle

needs_oracle = pytest.mark.skipif(not oracle.available(), reason="oracle missing")


def test_random_packet_fuzz():
    rng = random.Random(42)
    dec = OpusDecoder(48000, 2)
    survived = 0
    for trial in range(120):
        n = rng.randrange(1, 60)
        pkt = bytes(rng.randrange(256) for _ in range(n))
        try:
            from mousiki_tpu.bitstream.packet import packet_get_nb_samples
            fs = packet_get_nb_samples(pkt, 48000)
            out = dec.decode(pkt, fs)
            assert np.isfinite(out).all()
            survived += 1
        except (InvalidPacket, ValueError, AssertionError, IndexError,
                NotImplementedError, ZeroDivisionError):
            pass
    # decoder still works after the fuzz barrage
    enc = None
    if oracle.available():
        enc = oracle.RefEncoder(48000, 2, oracle.APP_RESTRICTED_LOWDELAY)
        sig = oracle.make_test_signal(960, 2)
        pkt = enc.encode(oracle.float_to_i16(sig).reshape(-1))
        out = dec.decode(pkt, 960)
        assert np.isfinite(out).all()
    assert survived > 0  # some random TOCs should decode


@needs_oracle
def test_corrupted_real_packets():
    """Bit-flip real packets: decode must not crash and state must recover."""
    enc = oracle.RefEncoder(48000, 1, oracle.APP_VOIP)
    enc.ctl_set(oracle.SET_BITRATE, 24000)
    sig = oracle.make_test_signal(960 * 12, 1)
    pcm16 = oracle.float_to_i16(sig)
    pkts = [enc.encode(pcm16[f * 960:(f + 1) * 960].reshape(-1))
            for f in range(12)]
    rng = random.Random(7)
    dec = OpusDecoder(48000, 1)
    for f, pkt in enumerate(pkts):
        data = bytearray(pkt)
        if f % 3 == 1 and len(data) > 4:
            pos = rng.randrange(1, len(data))
            data[pos] ^= 1 << rng.randrange(8)
        try:
            out = dec.decode(bytes(data), 960)
            assert np.isfinite(out).all()
        except (InvalidPacket, ValueError, AssertionError, IndexError):
            pass


@needs_oracle
def test_soft_clip_parity():
    lib = C.CDLL("libopus.so.0")
    lib.opus_pcm_soft_clip.restype = None
    rng = np.random.default_rng(3)
    x = (rng.standard_normal((480, 2)) * 0.9).astype(np.float32)
    x[100:140] *= 3.0
    x[300:330] *= -2.5
    ref = np.ascontiguousarray(x.reshape(-1).copy())
    mem_ref = np.zeros(2, np.float32)
    lib.opus_pcm_soft_clip(ref.ctypes.data_as(C.POINTER(C.c_float)), 480, 2,
                           mem_ref.ctypes.data_as(C.POINTER(C.c_float)))
    mem_my = np.zeros(2)
    mine = opus_pcm_soft_clip(x.astype(np.float64), mem_my)
    assert np.abs(mine.reshape(-1) - ref).max() < 1e-5
    assert np.abs(mine).max() <= 1.0 + 1e-6


def test_encoder_degenerate_inputs():
    """Every application/channel/frame-size combination must encode
    silence, DC, impulses, noise, and clipped noise without error."""
    import numpy as np
    from mousiki_tpu.opus_encoder import (APP_AUDIO, APP_VOIP, OpusEncoder)

    rng = np.random.default_rng(0)
    for app in (None, APP_VOIP, APP_AUDIO):
        for ch in (1, 2):
            enc = (OpusEncoder(48000, ch, app) if app
                   else OpusEncoder(48000, ch))
            enc.set_bitrate(24000 * ch)
            for fs in (480, 960, 1920):
                for kind in range(5):
                    x = [np.zeros((fs, ch)),
                         np.full((fs, ch), 0.5),
                         np.zeros((fs, ch)),
                         rng.standard_normal((fs, ch)) * 0.4,
                         np.clip(rng.standard_normal((fs, ch)) * 3, -1, 1)
                         ][kind]
                    if kind == 2:
                        x[fs // 2] = 0.99
                    try:
                        pkt = enc.encode(x, fs)
                        assert isinstance(pkt, bytes) and len(pkt) >= 1
                    except NotImplementedError:
                        pass  # documented frame-size/mode limits
