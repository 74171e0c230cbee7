"""Batched TPU synthesis vs the verified scalar CELT decoder on real packets.

The host stage emits FrameDescs; the jitted device step must reproduce the
scalar synthesis (which is itself validated against libopus)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from mousiki_tpu.bitstream.packet import parse_packet
from mousiki_tpu.celt.decoder import CeltDecoder
from mousiki_tpu.ops.synthesis_jax import (FrameDesc, StreamState, init_state,
                                           make_consts, synthesis_step)
from mousiki_tpu.testing import oracle

pytestmark = [pytest.mark.tpu, pytest.mark.skipif(
    not oracle.available(), reason="libopus oracle missing")]


def make_descs(n_frames=12, channels=2, bitrate=96000, seed=3):
    enc = oracle.RefEncoder(48000, channels, oracle.APP_RESTRICTED_LOWDELAY)
    enc.ctl_set(oracle.SET_BITRATE, bitrate)
    host = CeltDecoder(channels=channels, stream_channels=channels, end=21,
                       disable_inv=channels == 1)
    scalar = CeltDecoder(channels=channels, stream_channels=channels, end=21,
                         disable_inv=channels == 1)
    sig = oracle.make_test_signal(960 * (n_frames + 1), channels, seed=seed)
    pcm16 = oracle.float_to_i16(sig)
    descs, pcms = [], []
    for f in range(n_frames):
        pkt = enc.encode(pcm16[f * 960:(f + 1) * 960].reshape(-1))
        p = parse_packet(pkt)
        descs.append(host.decode_with_ec(p.frames[0], 960, return_desc=True))
        pcms.append(scalar.decode_with_ec(p.frames[0], 960))
    return descs, pcms


def to_batch(desc, S, channels):
    """Tile one frame's descriptor across S streams."""
    ble = np.zeros((2, 22), np.float32)
    ble[:, :21] = desc["band_log_e"][:, :21]
    ble[:, 21] = -28.0
    return FrameDesc(
        x=jnp.asarray(np.tile(desc["x"][None, :channels], (S, 1, 1)), jnp.float32),
        band_log_e=jnp.asarray(np.tile(ble[None, :channels], (S, 1, 1)), jnp.float32),
        transient=jnp.full((S,), desc["transient"], bool),
        silence=jnp.full((S,), desc["silence"], bool),
        pf_pitch=jnp.full((S,), desc["pf_pitch"], jnp.int32),
        pf_gain=jnp.full((S,), desc["pf_gain"], jnp.float32),
        pf_tapset=jnp.full((S,), desc["pf_tapset"], jnp.int32),
    )


@pytest.mark.parametrize("channels", [1, 2])
def test_batched_synthesis_matches_scalar(channels):
    descs, pcms = make_descs(channels=channels)
    consts = make_consts()
    S = 4
    state = init_state(S, channels)
    for f, (desc, ref_pcm) in enumerate(zip(descs, pcms)):
        batch = to_batch(desc, S, channels)
        pcm, state = synthesis_step(consts, state, batch, channels=channels)
        got = np.asarray(pcm)
        for s in range(S):
            err = np.abs(got[s] - ref_pcm).max()
            assert err < 1e-4, f"frame {f} stream {s}: err {err}"


def test_batched_synthesis_transients():
    # impulses force the short-block path
    rng = np.random.default_rng(7)
    n = 960 * 10
    sig = np.zeros((n, 2), np.float32)
    for pos in range(500, n - 100, 777):
        sig[pos:pos + 60] += (rng.standard_normal((60, 2)) * 0.6).astype(np.float32)
    sig = np.clip(sig, -0.9, 0.9)
    enc = oracle.RefEncoder(48000, 2, oracle.APP_RESTRICTED_LOWDELAY)
    enc.ctl_set(oracle.SET_BITRATE, 96000)
    host = CeltDecoder(channels=2, stream_channels=2, end=21)
    scalar = CeltDecoder(channels=2, stream_channels=2, end=21)
    pcm16 = oracle.float_to_i16(sig)
    consts = make_consts()
    state = init_state(2, 2)
    saw_transient = False
    for f in range(10):
        pkt = enc.encode(pcm16[f * 960:(f + 1) * 960].reshape(-1))
        p = parse_packet(pkt)
        desc = host.decode_with_ec(p.frames[0], 960, return_desc=True)
        ref_pcm = scalar.decode_with_ec(p.frames[0], 960)
        saw_transient |= desc["transient"]
        batch = to_batch(desc, 2, 2)
        pcm, state = synthesis_step(consts, state, batch, channels=2)
        err = np.abs(np.asarray(pcm)[0] - ref_pcm).max()
        assert err < 2e-4, f"frame {f}: err {err}"
    assert saw_transient, "test signal failed to trigger short blocks"
