"""CELT decoder differential tests against live libopus (the conformance
strategy of SURVEY.md §4.3: per-stage parity vs the C reference, here
exercised end-to-end on real packets with final-range cross-checks)."""

import numpy as np
import pytest

from mousiki_tpu.bitstream.packet import parse_packet
from mousiki_tpu.celt.decoder import CeltDecoder
from mousiki_tpu.testing import oracle

pytestmark = pytest.mark.skipif(not oracle.available(), reason="libopus oracle missing")


def run_case(channels, bitrate, frame_size, n_frames=15, kind="mix", seed=3):
    enc = oracle.RefEncoder(48000, channels, oracle.APP_RESTRICTED_LOWDELAY)
    enc.ctl_set(oracle.SET_BITRATE, bitrate)
    ref = oracle.RefDecoder(48000, channels)
    dec = CeltDecoder(channels=channels, stream_channels=channels, end=21,
                      disable_inv=channels == 1)
    sig = oracle.make_test_signal(frame_size * (n_frames + 1), channels,
                                  kind=kind, seed=seed)
    pcm16 = oracle.float_to_i16(sig)
    worst = 0.0
    for f in range(n_frames):
        pkt = enc.encode(pcm16[f * frame_size:(f + 1) * frame_size].reshape(-1))
        p = parse_packet(pkt)
        ref_pcm = ref.decode_float(pkt, frame_size)
        my_pcm = dec.decode_with_ec(p.frames[0], frame_size)
        assert ref.final_range() == dec.rng, f"range desync at frame {f}"
        err = np.abs(my_pcm - ref_pcm).max()
        worst = max(worst, err)
    return worst


@pytest.mark.parametrize("channels,bitrate", [
    (1, 32000), (1, 64000), (1, 128000),
    (2, 64000), (2, 96000), (2, 192000),
])
def test_celt_20ms(channels, bitrate):
    assert run_case(channels, bitrate, 960) < 2e-4


@pytest.mark.parametrize("frame_size", [120, 240, 480])
def test_celt_short_frames(frame_size):
    assert run_case(2, 96000, frame_size, n_frames=30) < 2e-4


def test_celt_transients():
    # impulsive content forces short blocks (transient path + anti-collapse)
    rng = np.random.default_rng(7)
    n = 960 * 16
    sig = np.zeros((n, 2), np.float32)
    for pos in range(500, n - 100, 777):
        sig[pos:pos + 60] += (rng.standard_normal((60, 2)) * 0.6).astype(np.float32)
    sig = np.clip(sig, -0.9, 0.9)
    enc = oracle.RefEncoder(48000, 2, oracle.APP_RESTRICTED_LOWDELAY)
    enc.ctl_set(oracle.SET_BITRATE, 96000)
    ref = oracle.RefDecoder(48000, 2)
    dec = CeltDecoder(channels=2, stream_channels=2, end=21)
    pcm16 = oracle.float_to_i16(sig)
    for f in range(15):
        pkt = enc.encode(pcm16[f * 960:(f + 1) * 960].reshape(-1))
        p = parse_packet(pkt)
        ref_pcm = ref.decode_float(pkt, 960)
        my_pcm = dec.decode_with_ec(p.frames[0], 960)
        assert ref.final_range() == dec.rng, f"range desync at frame {f}"
        assert np.abs(my_pcm - ref_pcm).max() < 5e-4


def test_celt_low_bitrate_folding():
    # starve the allocation so folding + noise fill paths run
    assert run_case(2, 24000, 960, n_frames=20, kind="noise") < 2e-4
