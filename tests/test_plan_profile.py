"""Serving plan profile: shrunk tier/fill capacities (smaller H2D arena).

set_plan_profile resizes the plan tier slot counts process-wide (native
writer capacity checks + Python arena layout + device unpack derive from
it). Overflowing streams fall back to the exact direct decoder, so PCM
correctness is profile-independent; these tests lock both properties.
Reference semantics: src/celt/bands.rs quant_all_bands (the plan is a
recording of its decode-side call tree).
"""

import numpy as np
import pytest

from mousiki_tpu.bitstream.packet import parse_packet
from mousiki_tpu.celt import host_native
from mousiki_tpu.testing import oracle

pytestmark = pytest.mark.skipif(not host_native.available(),
                                reason="native celt host unavailable")

SERVING = ((144, 40, 8), 2, 8)


@pytest.fixture
def serving_profile():
    host_native.set_plan_profile(*SERVING)
    try:
        yield
    finally:
        host_native.set_plan_profile()  # restore full


def _packets(channels, bitrate, n, frame_size=960):
    if not oracle.available():
        pytest.skip("libopus oracle unavailable")
    enc = oracle.RefEncoder(48000, channels, oracle.APP_RESTRICTED_LOWDELAY)
    enc.ctl_set(oracle.SET_BITRATE, bitrate)
    sig = oracle.make_test_signal(frame_size * (n + 1), channels, seed=3)
    pcm16 = oracle.float_to_i16(sig)
    pkts = [enc.encode(pcm16[f * frame_size:(f + 1) * frame_size]
                       .reshape(-1), frame_size) for f in range(n)]
    return [parse_packet(p).frames[0] for p in pkts], pkts


def _any_fallback(pipe) -> bool:
    arenas, _aux, layout = pipe._native._plan_db[960][1][0][:3]
    name, off, shape = layout["direct"]
    return bool(arenas[name][off:off + shape[0]].any())


def test_profile_roundtrip_and_layout(serving_profile):
    tiers, fills, pool = host_native.get_plan_profile()
    assert (tiers, fills, pool) == SERVING
    _, sizes_srv = host_native.plan_arena_layout(1, 2, 960)
    host_native.set_plan_profile()
    _, sizes_full = host_native.plan_arena_layout(1, 2, 960)
    host_native.set_plan_profile(*SERVING)
    srv = sizes_srv["a32"] * 4 + sizes_srv["a16"] * 2 + sizes_srv["a8"]
    full = sizes_full["a32"] * 4 + sizes_full["a16"] * 2 + sizes_full["a8"]
    assert srv < 0.75 * full, (srv, full)


@pytest.mark.parametrize("channels,bitrate", [(2, 128000), (1, 64000),
                                              (2, 48000)])
def test_serving_profile_matches_libopus(serving_profile, channels, bitrate):
    """Typical serving rates fit the shrunk tiers; PCM == libopus float."""
    from mousiki_tpu.pipeline import CeltStreamPipeline

    payloads, pkts = _packets(channels, bitrate, 12)
    S = 4
    pipe = CeltStreamPipeline(S, channels=channels, use_plan=True)
    dec = oracle.RefDecoder(48000, channels)
    for k, (p, fp) in enumerate(zip(payloads, pkts)):
        pcm = np.asarray(pipe.step([p] * S, 960))
        ref = dec.decode_float(fp, 960)
        np.testing.assert_allclose(pcm[0], ref.reshape(960, channels),
                                   atol=2e-4, err_msg=f"frame {k}")
        assert not _any_fallback(pipe), f"frame {k} overflowed the profile"


def test_serving_profile_overflow_falls_back_exact(serving_profile):
    """510 kbps overflows the shrunk tiers -> direct fallback, still
    correct output and intact decoder state across frames."""
    from mousiki_tpu.pipeline import CeltStreamPipeline

    payloads, pkts = _packets(2, 510000, 8)
    S = 2
    pipe = CeltStreamPipeline(S, channels=2, use_plan=True)
    dec = oracle.RefDecoder(48000, 2)
    saw_fallback = False
    for k, (p, fp) in enumerate(zip(payloads, pkts)):
        pcm = np.asarray(pipe.step([p] * S, 960))
        ref = dec.decode_float(fp, 960)
        np.testing.assert_allclose(pcm[0], ref.reshape(960, 2), atol=2e-4,
                                   err_msg=f"frame {k}")
        saw_fallback |= _any_fallback(pipe)
    assert saw_fallback  # the test is vacuous if nothing overflowed
