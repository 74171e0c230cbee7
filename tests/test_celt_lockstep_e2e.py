"""End-to-end lockstep device CELT decode vs the Python reference decoder
(which is exact vs libopus): X-plane parity per frame, then full PCM with
state carried across frames."""

import numpy as np
import pytest

import jax.numpy as jnp

from mousiki_tpu.bitstream.packet import parse_packet
from mousiki_tpu.celt.decoder import CeltDecoder
from mousiki_tpu.celt.plan import execute_plan
from mousiki_tpu.ops import celt_lockstep_top as top
from mousiki_tpu.ops.band_exec_jax import execute_packed, plan_combo_mats
from mousiki_tpu.testing import oracle

# opt-in lane: giant CPU compiles (see pyproject addopts)
pytestmark = [pytest.mark.lockstep,
              pytest.mark.skipif(not oracle.available(),
                                reason="libopus oracle missing")]

FRAME = 960


def collect(channels, bitrate, n_frames=16, kind="mix", seed=3,
            transient=False):
    enc = oracle.RefEncoder(48000, channels, oracle.APP_RESTRICTED_LOWDELAY)
    enc.ctl_set(oracle.SET_BITRATE, bitrate)
    dec = CeltDecoder(channels=channels, stream_channels=channels, end=21,
                      disable_inv=channels == 1)
    if transient:
        rng = np.random.default_rng(5)
        n = FRAME * (n_frames + 1)
        sig = np.zeros((n, channels), np.float32)
        for pos in range(500, n - 100, 777):
            sig[pos:pos + 60] += (rng.standard_normal((60, channels))
                                  * 0.6).astype(np.float32)
        sig = np.clip(sig, -0.9, 0.9)
    else:
        sig = oracle.make_test_signal(FRAME * (n_frames + 1), channels,
                                      kind=kind, seed=seed)
    pcm16 = oracle.float_to_i16(sig)
    pkts, plans, states = [], [], []
    for f in range(n_frames):
        pkt = enc.encode(pcm16[f * FRAME:(f + 1) * FRAME].reshape(-1))
        p = parse_packet(pkt)
        states.append((dec.rng, dec.old_ebands.copy(),
                       dec.old_log_e.copy(), dec.old_log_e2.copy()))
        desc = dec.decode_with_ec(p.frames[0], FRAME, record_plan=True,
                                  return_desc=True)
        pkts.append(p.frames[0])
        plans.append(desc["plan"])
    return pkts, plans, states


def pack(pkts):
    L = max(len(p) for p in pkts)
    buf = np.zeros((len(pkts), L), np.uint8)
    storage = np.zeros(len(pkts), np.int32)
    for s, p in enumerate(pkts):
        buf[s, :len(p)] = np.frombuffer(p, np.uint8)
        storage[s] = len(p)
    return jnp.asarray(buf), jnp.asarray(storage)


@pytest.mark.parametrize("channels,bitrate,transient,caps", [
    (1, 64000, False, None),
    (1, 96000, True, None),
    (2, 96000, False, None),
    (2, 96000, True, None),
    (2, 64000, False, None),
    (1, 16000, False, None),
    # 320 kbps overflows the default serving caps; a wider static
    # profile covers it (production would route such streams to a
    # second program or the host fallback)
    (2, 320000, False, (384, 112, 24)),
])
def test_xplane_parity(channels, bitrate, transient, caps):
    """Each lane = one frame of a stream (with its captured pre-frame
    decoder state), decoded as ONE batch; compare executor X planes."""
    pkts, plans, states = collect(channels, bitrate, transient=transient)
    buf, storage = pack(pkts)
    S = len(pkts)
    state = top.LockstepState(
        rng=jnp.asarray(np.array([s[0] for s in states], np.uint32)),
        old_ebands=jnp.asarray(np.stack([s[1] for s in states]),
                               jnp.float32),
        old_log_e=jnp.asarray(np.stack([s[2] for s in states]),
                              jnp.float32),
        old_log_e2=jnp.asarray(np.stack([s[3] for s in states]),
                               jnp.float32))
    mats = plan_combo_mats(channels, FRAME)
    p, ble, hdr, _st, ok = top.decode_frames(buf, storage, state,
                                             C=channels, caps=caps)
    assert bool(np.asarray(ok).all())
    X = execute_packed(p, jnp.zeros((S, channels, FRAME), jnp.float32),
                       channels=channels, frame=FRAME, lm=3,
                       start=0, end=21, mats=mats)
    Xv = np.asarray(X)
    worst = 0.0
    for f in range(S):
        x_truth = execute_plan(plans[f])
        err = float(np.abs(Xv[f] - x_truth).max())
        worst = max(worst, err)
        assert err < 2e-4, f"frame {f}: X err {err}"
    print("worst X err:", worst)


@pytest.mark.parametrize("channels,bitrate,transient", [
    (2, 96000, True),
    (1, 64000, False),
])
def test_pcm_parity(channels, bitrate, transient):
    """Full device decode PCM vs the Python decoder across a stream
    (state carried on device across frames)."""
    from mousiki_tpu.ops.synthesis_jax import init_state as synth_init
    from mousiki_tpu.ops.synthesis_jax import make_consts
    pkts, plans, _states = collect(channels, bitrate, transient=transient,
                                   n_frames=8)
    dec = CeltDecoder(channels=channels, stream_channels=channels, end=21,
                      disable_inv=channels == 1)
    consts = make_consts(n=FRAME)
    sstate = synth_init(1, channels)
    lstate = top.init_state(1)
    mats = plan_combo_mats(channels, FRAME)
    worst = 0.0
    for f, pkt in enumerate(pkts):
        truth = dec.decode_with_ec(pkt, FRAME)
        buf, storage = pack([pkt])
        pcm, sstate, lstate, ok = top.lockstep_synthesis_step(
            consts, sstate, lstate, buf, storage, mats, C=channels,
            frame=FRAME)
        assert bool(np.asarray(ok)[0])
        mine = np.asarray(pcm)[0]
        err = float(np.abs(mine - truth).max())
        worst = max(worst, err)
        assert err < 2e-4, f"frame {f}: pcm err {err}"
    print("worst pcm err:", worst)
