"""Batched SILK device synthesis vs the bit-exact host decode_core on real
streams (params captured from the host symbol stage)."""



import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from mousiki_tpu.bitstream.packet import Mode
from mousiki_tpu.opus_encoder import OpusEncoder, APP_VOIP
from mousiki_tpu.opus_decoder import OpusDecoder
from mousiki_tpu.ops.silk_synthesis_jax import (SilkFrameParams,
                                                init_silk_state,
                                                silk_synthesis_step)

pytestmark = pytest.mark.tpu


def _capture_frames(bitrate, n_frames=12):
    """Encode+decode a voiced signal, capturing decode_core inputs/outputs."""
    import mousiki_tpu.silk.dec_api as D

    t = np.arange(48000 * 2) / 48000.0
    sig = np.clip(0.4 * np.sin(2 * np.pi * 140 * t)
                  * (1 + 0.4 * np.sin(2 * np.pi * 3 * t))
                  + 0.1 * np.sin(2 * np.pi * 700 * t), -0.9, 0.9)[:, None]
    enc = OpusEncoder(48000, 1, APP_VOIP)
    enc.set_bitrate(bitrate)
    enc.force_mode = Mode.SILK
    dec = OpusDecoder(48000, 1)
    frames = []
    orig = D.decode_core

    def spy(st, ctrl, pulses):
        xq = orig(st, ctrl, pulses)
        d = st.lpc_order
        a = np.zeros((2, 16))
        a[0, :d] = np.asarray(ctrl.pred_coef_q12[0], float) / 4096.0
        a[1, :d] = np.asarray(ctrl.pred_coef_q12[1], float) / 4096.0
        frames.append(dict(
            exc=np.asarray(st.exc_q14[: st.frame_length], float) / 16384.0,
            a=a,
            b=np.asarray(ctrl.ltp_coef_q14, float).reshape(
                st.nb_subfr, 5) / 16384.0,
            pitch=np.asarray(ctrl.pitch_l, np.int32),
            gains=np.asarray(ctrl.gains_q16, float) / 65536.0,
            voiced=st.indices.signal_type == 2,
            ltp_scale=(ctrl.ltp_scale_q14 or 16384) / 16384.0,
            interp=st.indices.nlsf_interp_coef_q2 < 4,
            nb_subfr=st.nb_subfr,
            subfr=st.subfr_length,
            xq=np.asarray(xq, float),
        ))
        return xq

    D.decode_core = spy
    try:
        for f in range(n_frames):
            pkt = enc.encode(sig[f * 960:(f + 1) * 960], 960)
            dec.decode(pkt, 960)
    finally:
        D.decode_core = orig
    return frames


@pytest.mark.parametrize("bitrate", [24000, 40000])
def test_silk_device_synthesis_matches_host(bitrate):
    frames = _capture_frames(bitrate)
    assert any(f["voiced"] for f in frames), "need voiced coverage"
    S = 3  # replicate the stream to exercise batching
    fs_khz = frames[0]["subfr"] // 5
    state = init_silk_state(S, fs_khz)
    worst = 0.0
    for k, fr in enumerate(frames):
        L = len(fr["exc"])
        params = SilkFrameParams(
            exc=jnp.asarray(np.tile(fr["exc"], (S, 1)), jnp.float32),
            a=jnp.asarray(np.tile(fr["a"][None], (S, 1, 1)), jnp.float32),
            b=jnp.asarray(np.tile(fr["b"][None], (S, 1, 1)), jnp.float32),
            pitch_l=jnp.asarray(
                np.tile(np.maximum(fr["pitch"], 18), (S, 1)), jnp.int32),
            gains=jnp.asarray(np.tile(fr["gains"], (S, 1)), jnp.float32),
            voiced=jnp.full((S,), bool(fr["voiced"])),
            ltp_scale=jnp.full((S,), fr["ltp_scale"], jnp.float32),
            interp=jnp.full((S,), bool(fr["interp"])),
        )
        out, state = silk_synthesis_step(params, state,
                                         nb_subfr=fr["nb_subfr"],
                                         subfr_len=fr["subfr"])
        got = np.asarray(out[0])
        want = fr["xq"]
        scale = max(np.abs(want).max(), 100.0)
        err = np.abs(got - want).max() / scale
        worst = max(worst, err)
        assert err < 5e-3, (k, err)
    assert worst < 5e-3
