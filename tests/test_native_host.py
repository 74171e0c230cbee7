"""Differential test: native C++ CELT host decoder vs the validated Python
host decoder, on real libopus packets. The two must produce identical frame
descriptors (rng exactly; float spectra to f64 round-off)."""

import numpy as np
import pytest

from mousiki_tpu.bitstream.packet import parse_packet
from mousiki_tpu.celt import host_native
from mousiki_tpu.celt.decoder import CeltDecoder
from mousiki_tpu.testing import oracle

pytestmark = pytest.mark.skipif(
    not (host_native.available() and oracle.available()),
    reason="native host lib or libopus oracle missing")


def _celt_packets(channels: int, frame_size: int, bitrate: int, n: int,
                  complexity: int = 10):
    enc = oracle.RefEncoder(48000, channels, oracle.APP_RESTRICTED_LOWDELAY)
    enc.ctl_set(oracle.SET_BITRATE, bitrate)
    enc.ctl_set(oracle.SET_COMPLEXITY, complexity)
    sig = oracle.make_test_signal(frame_size * n, channels)
    pcm16 = oracle.float_to_i16(sig)
    pkts = []
    for f in range(n):
        pkt = enc.encode(pcm16[f * frame_size:(f + 1) * frame_size].reshape(-1),
                         frame_size)
        pkts.append(pkt)
    return pkts


@pytest.mark.parametrize("channels,frame_size,bitrate", [
    (1, 960, 64000),
    (2, 960, 96000),
    (2, 960, 510000),
    (1, 120, 48000),
    (2, 240, 64000),
    (1, 480, 32000),
    (2, 480, 24000),   # low rate: folding/noise paths
])
def test_native_matches_python(channels, frame_size, bitrate):
    pkts = _celt_packets(channels, frame_size, bitrate, 12)
    py = CeltDecoder(channels=channels, stream_channels=channels)
    py.disable_inv = channels == 1
    nat = host_native.NativeCeltHost(channels=channels,
                                     stream_channels=channels)
    for k, pkt in enumerate(pkts):
        parsed = parse_packet(pkt)
        payload = parsed.frames[0]
        d_py = py.decode_with_ec(payload, frame_size, return_desc=True)
        d_nat = nat.decode_desc(payload, frame_size)
        assert nat.rng == py.rng, f"frame {k}: rng mismatch"
        assert d_nat["transient"] == d_py["transient"], f"frame {k}"
        assert d_nat["silence"] == d_py["silence"], f"frame {k}"
        assert d_nat["pf_pitch"] == d_py["pf_pitch"], f"frame {k}"
        assert d_nat["pf_tapset"] == d_py["pf_tapset"], f"frame {k}"
        assert d_nat["pf_gain"] == pytest.approx(d_py["pf_gain"]), f"frame {k}"
        np.testing.assert_allclose(d_nat["band_log_e"], d_py["band_log_e"],
                                   atol=1e-12, err_msg=f"frame {k}")
        # native signal path is float32 (the device consumes f32 anyway);
        # the Python host is float64 — compare at f32 accumulation accuracy
        np.testing.assert_allclose(d_nat["x"], d_py["x"], atol=5e-6,
                                   err_msg=f"frame {k}")
        # internal energy state stays in lockstep
        e, l1, l2, rng = nat.get_state()
        np.testing.assert_allclose(e, py.old_ebands, atol=1e-12)
        np.testing.assert_allclose(l1, py.old_log_e, atol=1e-12)
        np.testing.assert_allclose(l2, py.old_log_e2, atol=1e-12)


def test_state_import():
    """Native decoder seeded from a warmed-up Python decoder continues it."""
    pkts = _celt_packets(2, 960, 128000, 8)
    py = CeltDecoder(channels=2, stream_channels=2)
    py.disable_inv = False
    for pkt in pkts[:4]:
        payload = parse_packet(pkt).frames[0]
        py.decode_with_ec(payload, 960, return_desc=True)
    nat = host_native.NativeCeltHost(channels=2, stream_channels=2,
                                     disable_inv=False)
    nat.load_state_from(py)
    for k, pkt in enumerate(pkts[4:]):
        payload = parse_packet(pkt).frames[0]
        d_py = py.decode_with_ec(payload, 960, return_desc=True)
        d_nat = nat.decode_desc(payload, 960)
        assert nat.rng == py.rng
        np.testing.assert_allclose(d_nat["x"], d_py["x"], atol=5e-6)


def test_native_fuzz_no_crash():
    """Random bytes must not crash the native decoder."""
    import random
    rng = random.Random(11)
    nat = host_native.NativeCeltHost(channels=1, stream_channels=1)
    ok = 0
    for _ in range(200):
        n = rng.randrange(2, 80)
        data = bytes(rng.randrange(256) for _ in range(n))
        try:
            nat.decode_desc(data, rng.choice([120, 240, 480, 960]))
            ok += 1
        except ValueError:
            pass
    assert ok > 0
