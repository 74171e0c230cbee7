"""Device (JAX) band-plan executor vs the direct float64 decoder, on real
libopus packets. Gate: f32 round-off only (<= 1e-5 on unit-norm spectra)."""

import numpy as np
import pytest

import jax.numpy as jnp

from mousiki_tpu.bitstream.packet import parse_packet
from mousiki_tpu.celt.decoder import CeltDecoder
from mousiki_tpu.celt.plan_pack import pack_plans
from mousiki_tpu.ops.band_exec_jax import execute_packed
from mousiki_tpu.testing import oracle

pytestmark = [pytest.mark.tpu,
              pytest.mark.skipif(not oracle.available(),
                                 reason="libopus oracle missing")]

TOL = 1e-5


def _decode_plans(channels, bitrate, n, signal="tone", seed=0):
    enc = oracle.RefEncoder(48000, channels, oracle.APP_RESTRICTED_LOWDELAY)
    enc.ctl_set(oracle.SET_BITRATE, bitrate)
    if signal == "tone":
        sig = oracle.make_test_signal(960 * n, channels, seed=seed)
    else:
        rng = np.random.default_rng(7)
        sig = np.zeros((960 * n, channels), np.float32)
        for i in range(0, 960 * n, 480):
            sig[i:i + 24] = rng.standard_normal(
                (24, channels)).astype(np.float32) * 0.9
    pcm16 = oracle.float_to_i16(sig)
    dec = CeltDecoder(channels=channels, stream_channels=channels)
    plans, refs = [], []
    for f in range(n):
        pkt = enc.encode(pcm16[f * 960:(f + 1) * 960].reshape(-1), 960)
        d = dec.decode_with_ec(parse_packet(pkt).frames[0], 960,
                               return_desc=True, record_plan=True)
        plans.append(d["plan"])
        refs.append(np.asarray(d["x"])[:channels])
    return plans, refs


def _run(plans, refs, channels, max_fallbacks=0):
    n = len(plans)
    packed = pack_plans(plans, channels, 960)
    assert int(packed["direct"].sum()) <= max_fallbacks
    pd = {k: ([jnp.asarray(v) for v in packed[k]]
              if isinstance(packed[k], list) else jnp.asarray(packed[k]))
          for k in packed}
    xd = jnp.asarray(np.stack([r.astype(np.float32) for r in refs]))
    X = np.asarray(execute_packed(pd, xd, channels=channels, frame=960,
                                  lm=3, start=0, end=21))
    for f in range(n):
        np.testing.assert_allclose(
            X[f].reshape(channels, 960), refs[f], atol=TOL,
            err_msg=f"frame {f} (direct={bool(packed['direct'][f])})")


@pytest.mark.parametrize("channels,bitrate,signal", [
    (2, 128000, "tone"),
    (1, 64000, "tone"),
    (2, 48000, "tone"),     # folding/noise leaves
    (2, 510000, "tone"),    # max rate: ~270 leaves/frame
    (2, 96000, "clicks"),   # transients: B>1, anti-collapse, haar combos
    (1, 32000, "clicks"),
])
def test_device_executor_matches_direct(channels, bitrate, signal):
    plans, refs = _decode_plans(channels, bitrate, 16, signal)
    _run(plans, refs, channels)


def test_direct_fallback_streams_pass_through():
    plans, refs = _decode_plans(2, 128000, 4)
    plans[2] = None  # unpackable stream -> must use x_direct verbatim
    _run(plans, refs, 2, max_fallbacks=1)
