"""Exhaustive TOC sweep (test_opus_decode strategy, SURVEY.md §4.4):
for every config 0-31 x mono/stereo, random payloads must decode to
EXACTLY what libopus produces (PCM and final range) — the decoder is a
deterministic function of arbitrary input bytes."""

import random

import numpy as np
import pytest

from mousiki_tpu.bitstream.packet import samples_per_frame
from mousiki_tpu.opus_decoder import OpusDecoder
from mousiki_tpu.testing import oracle

pytestmark = pytest.mark.skipif(not oracle.available(), reason="oracle missing")


@pytest.mark.parametrize("stereo", [0, 1])
def test_toc_sweep_random_payloads(stereo):
    rng = random.Random(1234 + stereo)
    channels = stereo + 1
    mismatches = []
    for config in range(32):
        ref = oracle.RefDecoder(48000, channels)
        mine = OpusDecoder(48000, channels)
        toc = (config << 3) | (0x4 if stereo else 0)  # code 0
        for trial in range(4):
            # >= 2 payload bytes: a 1-byte payload triggers concealment,
            # which is implementation-defined (PLC algorithms differ)
            n = rng.randrange(2, 40)
            pkt = bytes([toc]) + bytes(rng.randrange(256) for _ in range(n))
            fs = samples_per_frame(pkt, 48000)
            if fs > 2880:
                continue
            r = ref.decode_float(pkt, fs)
            try:
                m = mine.decode(pkt, fs)
            except Exception as e:
                mismatches.append((config, trial, f"exception {e!r}"))
                continue
            err = np.abs(m - r).max()
            # SILK: int-exact modulo float conversion noise on garbage
            # inputs; CELT/hybrid: f32-vs-f64 relative tolerance
            tol = 1e-5 if config < 12 else max(2e-4,
                                               1e-4 * float(np.abs(r).max()))
            if err > tol or ref.final_range() != mine.final_range:
                mismatches.append(
                    (config, trial,
                     f"err {err:.2e} range {ref.final_range()}"
                     f" vs {mine.final_range}"))
    assert not mismatches, mismatches[:10]


def test_toc_sweep_real_then_garbage():
    """Interleave real packets with garbage: state must track libopus."""
    rng = random.Random(77)
    enc = oracle.RefEncoder(48000, 1, oracle.APP_AUDIO)
    enc.ctl_set(oracle.SET_BITRATE, 48000)
    sig = oracle.make_test_signal(960 * 30, 1)
    p16 = oracle.float_to_i16(sig)
    real = [enc.encode(p16[f * 960:(f + 1) * 960].reshape(-1), 960)
            for f in range(30)]
    ref = oracle.RefDecoder(48000, 1)
    mine = OpusDecoder(48000, 1)
    for f, pkt in enumerate(real):
        if f % 5 == 3:
            toc = pkt[0]
            pkt = bytes([toc]) + bytes(rng.randrange(256)
                                       for _ in range(rng.randrange(2, 30)))
        r = ref.decode_float(pkt, 960)
        m = mine.decode(pkt, 960)
        assert ref.final_range() == mine.final_range, f"frame {f}"
        assert np.abs(m - r).max() < 2e-4, f"frame {f}: {np.abs(m - r).max()}"
