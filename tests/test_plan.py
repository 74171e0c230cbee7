"""Band-plan recording + execution must reproduce the direct decoder's
normalized spectrum exactly (same float64 op order), across frame sizes,
rates, channels, and transient content."""

import numpy as np
import pytest

from mousiki_tpu.bitstream.packet import parse_packet
from mousiki_tpu.celt.decoder import CeltDecoder
from mousiki_tpu.celt.plan import execute_plan
from mousiki_tpu.testing import oracle

pytestmark = pytest.mark.skipif(not oracle.available(),
                                reason="libopus oracle missing")


def _packets(channels, frame_size, bitrate, n, seed=0):
    enc = oracle.RefEncoder(48000, channels, oracle.APP_RESTRICTED_LOWDELAY)
    enc.ctl_set(oracle.SET_BITRATE, bitrate)
    sig = oracle.make_test_signal(frame_size * n, channels, seed=seed)
    pcm16 = oracle.float_to_i16(sig)
    return [enc.encode(pcm16[f * frame_size:(f + 1) * frame_size].reshape(-1),
                       frame_size) for f in range(n)]


@pytest.mark.parametrize("channels,frame_size,bitrate", [
    (1, 960, 64000),
    (2, 960, 128000),
    (2, 960, 48000),    # low rate: folding/noise leaves
    (2, 960, 510000),   # max rate: deep splits, large K
    (1, 120, 48000),
    (2, 240, 64000),
    (1, 480, 32000),
    (2, 480, 24000),
])
def test_plan_matches_direct(channels, frame_size, bitrate):
    pkts = _packets(channels, frame_size, bitrate, 20)
    direct = CeltDecoder(channels=channels, stream_channels=channels)
    planned = CeltDecoder(channels=channels, stream_channels=channels)
    n_direct_fallback = 0
    for k, pkt in enumerate(pkts):
        payload = parse_packet(pkt).frames[0]
        d0 = direct.decode_with_ec(payload, frame_size, return_desc=True)
        d1 = planned.decode_with_ec(payload, frame_size, return_desc=True,
                                    record_plan=True)
        assert planned.rng == direct.rng, f"frame {k}: rng diverged"
        np.testing.assert_allclose(d1["x"], d0["x"], atol=0,
                                   err_msg=f"frame {k}: plan-mode decode")
        plan = d1["plan"]
        if plan.direct:
            n_direct_fallback += 1
            continue
        X = execute_plan(plan)
        np.testing.assert_array_equal(
            X.reshape(channels, -1)[: d0["x"].shape[0]],
            np.asarray(d1["x"])[:channels],
            err_msg=f"frame {k}: executor vs direct")
    assert n_direct_fallback == 0


def test_plan_transient_anti_collapse():
    """Force transient-heavy content so anti-collapse + B>1 paths record."""
    enc = oracle.RefEncoder(48000, 2, oracle.APP_RESTRICTED_LOWDELAY)
    enc.ctl_set(oracle.SET_BITRATE, 96000)
    rng = np.random.default_rng(7)
    n = 24
    sig = np.zeros((960 * n, 2), np.float32)
    # clicks + noise bursts trigger transients and collapsed sub-blocks
    for i in range(0, 960 * n, 480):
        sig[i:i + 24] = rng.standard_normal((24, 2)).astype(np.float32) * 0.9
    pcm16 = oracle.float_to_i16(sig)
    direct = CeltDecoder(channels=2, stream_channels=2)
    planned = CeltDecoder(channels=2, stream_channels=2)
    saw_transient = False
    for f in range(n):
        pkt = enc.encode(pcm16[f * 960:(f + 1) * 960].reshape(-1), 960)
        payload = parse_packet(pkt).frames[0]
        d0 = direct.decode_with_ec(payload, 960, return_desc=True)
        d1 = planned.decode_with_ec(payload, 960, return_desc=True,
                                    record_plan=True)
        saw_transient |= d0["transient"]
        np.testing.assert_allclose(d1["x"], d0["x"], atol=0)
        plan = d1["plan"]
        assert not plan.direct
        X = execute_plan(plan)
        np.testing.assert_array_equal(X.reshape(2, -1), np.asarray(d1["x"]))
    assert saw_transient


def test_plan_random_payloads():
    """Random (mostly corrupt) payloads: plan mode must track the direct
    decoder bit-for-bit, falling back to direct shipping when needed."""
    import random
    rnd = random.Random(42)
    direct = CeltDecoder(channels=2, stream_channels=2)
    planned = CeltDecoder(channels=2, stream_channels=2)
    for k in range(150):
        data = bytes(rnd.randrange(256) for _ in range(rnd.randrange(3, 120)))
        fs = rnd.choice([120, 240, 480, 960])
        try:
            d0 = direct.decode_with_ec(data, fs, return_desc=True)
        except Exception as e:
            with pytest.raises(type(e)):
                planned.decode_with_ec(data, fs, return_desc=True,
                                       record_plan=True)
            continue
        d1 = planned.decode_with_ec(data, fs, return_desc=True,
                                    record_plan=True)
        assert planned.rng == direct.rng, f"case {k}"
        np.testing.assert_allclose(d1["x"], d0["x"], atol=0,
                                   err_msg=f"case {k}")
        plan = d1["plan"]
        if plan.direct:
            continue
        X = execute_plan(plan)
        np.testing.assert_array_equal(
            X.reshape(2, -1), np.asarray(d1["x"]), err_msg=f"case {k}")
