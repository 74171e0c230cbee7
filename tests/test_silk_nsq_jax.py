"""Device NSQ scan kernel (ops/silk_nsq_jax) vs the host noise-shaping
quantizer (silk/noise_shape.nsq_shaped, the tested behavioural mirror of
reference src/silk/nsq.rs).

Parameters are harvested from REAL SilkEncoder runs (every nsq_shaped
call of a multi-frame encode, with its captured pre-frame state), then
replayed as one (S = frames) device batch — so voiced/unvoiced/interp/
gain-switch lanes all mix in a single call, exercising the per-stream
masking. The kernel is float32 vs the host's float64, so RD decisions at
exact ties can flip: the gate is >=99% pulse agreement per lane and
matching quantized-output energy, not bit equality.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from mousiki_tpu.ops import silk_nsq_jax as dnsq  # noqa: E402
from mousiki_tpu.silk import noise_shape as ns  # noqa: E402

FS = 16
SUB = 5 * FS
NB_SUBFR = 4
L = NB_SUBFR * SUB
M = 20 * FS


def speechlike(n, seed=0):
    """Voiced/unvoiced alternating LPC-ish signal at int16 scale."""
    rng = np.random.default_rng(seed)
    out = np.zeros(n, np.float64)
    t = 0
    voiced = True
    while t < n:
        seg = min(n - t, 4 * L)
        if voiced:
            period = rng.integers(40, 200)
            exc = np.zeros(seg)
            exc[::period] = 1.0
            exc += rng.standard_normal(seg) * 0.02
        else:
            exc = rng.standard_normal(seg) * 0.3
        a = 1.8 * np.cos(2 * np.pi * rng.uniform(0.03, 0.12))
        y = np.zeros(seg)
        y1 = y2 = 0.0
        for i in range(seg):
            y[i] = exc[i] + a * y1 - 0.81 * y2
            y2, y1 = y1, y[i]
        out[t:t + seg] = y / (np.abs(y).max() + 1e-9)
        t += seg
        voiced = not voiced
    return (out * 9000).astype(np.float64)


def harvest(bitrate, n_frames=16, seed=1):
    """Run the real SilkEncoder and capture every nsq_shaped call."""
    from mousiki_tpu.bitstream.entcode import RangeEncoder
    from mousiki_tpu.silk.encoder import SilkEncoder

    calls = []
    orig = ns.nsq_shaped

    def spy(x, st_nsq, ctl, **kw):
        pre = dict(xq=st_nsq.xq.copy(), shp=st_nsq.s_ltp_shp.copy(),
                   s_lpc=st_nsq.s_lpc.copy(), s_ar2=st_nsq.s_ar2.copy(),
                   s_lf_ar=st_nsq.s_lf_ar, s_diff=st_nsq.s_diff,
                   lag_prev=st_nsq.lag_prev, prev_gain=st_nsq.prev_gain)
        pulses = orig(x, st_nsq, ctl, **kw)
        calls.append((np.asarray(x, np.float64).copy(), pre,
                      ctl, dict(kw), list(pulses)))
        return pulses

    ns.nsq_shaped = spy
    try:
        enc = SilkEncoder()
        # the device kernel mirrors the single-state quantizer; pin the
        # encoder to it (the default is the delayed-decision trellis)
        enc.use_del_dec = False
        enc.set_fs(FS, FS * 1000, NB_SUBFR)
        sig = speechlike(L * (n_frames + 1), seed)
        for f in range(n_frames):
            rc = RangeEncoder(1300)
            enc.encode_frame(rc, sig[f * L:(f + 1) * L].astype(np.float64),
                             NB_SUBFR, bitrate)
            rc.done()
    finally:
        ns.nsq_shaped = orig
    return [c for c in calls if c[3]["frame_length"] == L]


def to_batch(calls):
    S = len(calls)
    P = dict(x=np.zeros((S, L), np.float32),
             a=np.zeros((S, 2, 16), np.float32),
             b=np.zeros((S, NB_SUBFR, 5), np.float32),
             ar_shp=np.zeros((S, NB_SUBFR, 24), np.float32),
             harm=np.zeros((S, NB_SUBFR), np.float32),
             tilt=np.zeros((S, NB_SUBFR), np.float32),
             lf_ma=np.zeros((S, NB_SUBFR), np.float32),
             lf_ar=np.zeros((S, NB_SUBFR), np.float32),
             gains=np.zeros((S, NB_SUBFR), np.float32),
             pitch_l=np.zeros((S, NB_SUBFR), np.int32),
             lam=np.zeros(S, np.float32), offset=np.zeros(S, np.float32),
             voiced=np.zeros(S, bool), seed=np.zeros(S, np.int32),
             ltp_scale=np.zeros(S, np.float32), interp=np.zeros(S, bool))
    st = dict(xq=np.zeros((S, M), np.float32),
              shp=np.zeros((S, M), np.float32),
              s_lpc=np.zeros((S, 16), np.float32),
              s_ar2=np.zeros((S, 24), np.float32),
              s_lf_ar=np.zeros(S, np.float32), s_diff=np.zeros(S, np.float32),
              lag_prev=np.zeros(S, np.int32), prev_gain=np.ones(S, np.float32))
    for s, (x, pre, ctl, kw, _pulses) in enumerate(calls):
        P["x"][s] = x
        d = kw["lpc_order"]
        assert d == 16, "test covers WB (order-16) frames"
        for h in range(2):
            P["a"][s, h] = np.asarray(kw["pred_coef_q12"][h],
                                      np.float64)[:16] / 4096.0
        P["b"][s] = np.asarray(kw["ltp_coef_q14"],
                               np.float64).reshape(NB_SUBFR, 5) / 16384.0
        o = ctl.ar.shape[1]
        P["ar_shp"][s, :, :o] = ctl.ar
        P["harm"][s] = ctl.harm_shape_gain
        P["tilt"][s] = ctl.tilt
        P["lf_ma"][s] = ctl.lf_ma
        P["lf_ar"][s] = ctl.lf_ar
        P["gains"][s] = np.maximum(1, np.asarray(
            kw["gains_q16"], np.int64)) / 65536.0
        P["pitch_l"][s] = kw["pitch_l"]
        P["lam"][s] = ctl.lambda_
        voiced = kw["signal_type"] == 2
        P["voiced"][s] = voiced
        P["offset"][s] = ns._QUANT_OFFSETS[1 if voiced else 0][
            ctl.quant_offset_type]
        P["seed"][s] = kw["seed"]
        P["ltp_scale"][s] = kw["ltp_scale_q14"] / 16384.0
        P["interp"][s] = kw["nlsf_interp_flag"]
        st["xq"][s] = pre["xq"][:M]
        st["shp"][s] = pre["shp"][:M]
        st["s_lpc"][s] = pre["s_lpc"][31:15:-1]   # newest-first
        st["s_ar2"][s] = pre["s_ar2"]
        st["s_lf_ar"][s] = pre["s_lf_ar"]
        st["s_diff"][s] = pre["s_diff"]
        st["lag_prev"][s] = pre["lag_prev"]
        st["prev_gain"][s] = pre["prev_gain"]
    params = dnsq.NsqParams(**{k: jnp.asarray(v) for k, v in P.items()})
    state = dnsq.NsqDevState(**{k: jnp.asarray(v) for k, v in st.items()})
    return params, state


@pytest.mark.parametrize("bitrate", [24000, 12000])
def test_nsq_device_vs_host(bitrate):
    calls = harvest(bitrate)
    assert len(calls) >= 8
    params, state = to_batch(calls)
    pulses, xq, _st = dnsq.nsq_frame(params, state, nb_subfr=NB_SUBFR,
                                     sub=SUB, M=M)
    pulses = np.asarray(pulses)
    xq = np.asarray(xq)
    agree = []
    for s, (_x, _pre, _ctl, _kw, host_pulses) in enumerate(calls):
        hp = np.asarray(host_pulses, np.int32)
        frac = float((pulses[s] == hp).mean())
        agree.append(frac)
        # energy of the quantized excitation must match closely even
        # where individual RD ties flip
        assert frac >= 0.985, (s, frac)
    assert float(np.mean(agree)) >= 0.995, np.mean(agree)


def test_nsq_state_chain():
    """Chained frames through the device state match the host chain."""
    calls = harvest(24000, n_frames=10, seed=3)
    # replay the first stream chronologically at S=1, threading state
    params, state = to_batch(calls[:1])
    st = state
    worst = 1.0
    for (x, pre, ctl, kw, host_pulses) in calls[:6]:
        params, _ = to_batch([(x, pre, ctl, kw, host_pulses)])
        # thread OUR state (ignore the captured pre-state after frame 0)
        pulses, xq, st = dnsq.nsq_frame(params, st, nb_subfr=NB_SUBFR,
                                        sub=SUB, M=M)
        frac = float((np.asarray(pulses)[0]
                      == np.asarray(host_pulses, np.int32)).mean())
        worst = min(worst, frac)
    assert worst >= 0.97, worst


# ---------------------------------------------------------------------
# Delayed-decision widening (ops/silk_nsq_jax.nsq_del_dec_frame)
# ---------------------------------------------------------------------

def harvest_dd(bitrate, n_frames=16, seed=1):
    """Capture the default encoder's delayed-decision NSQ calls."""
    import mousiki_tpu.silk.nsq_del_dec as DD
    from mousiki_tpu.bitstream.entcode import RangeEncoder
    from mousiki_tpu.silk.encoder import SilkEncoder

    calls = []
    orig = DD.nsq_del_dec_best

    def spy(x, st_nsq, ctl, **kw):
        pre = dict(xq=st_nsq.xq.copy(), shp=st_nsq.s_ltp_shp.copy(),
                   s_lpc=st_nsq.s_lpc.copy(), s_ar2=st_nsq.s_ar2.copy(),
                   s_lf_ar=st_nsq.s_lf_ar, s_diff=st_nsq.s_diff,
                   lag_prev=st_nsq.lag_prev, prev_gain=st_nsq.prev_gain)
        pulses, seed_used = orig(x, st_nsq, ctl, **kw)
        calls.append((np.asarray(x, np.float64).copy(), pre, ctl,
                      dict(kw), list(pulses), seed_used))
        return pulses, seed_used

    DD.nsq_del_dec_best = spy
    try:
        enc = SilkEncoder()
        enc.set_fs(FS, FS * 1000, NB_SUBFR)
        sig = speechlike(L * (n_frames + 1), seed)
        for f in range(n_frames):
            rc = RangeEncoder(1300)
            enc.encode_frame(rc, sig[f * L:(f + 1) * L].astype(np.float64),
                             NB_SUBFR, bitrate)
            rc.done()
    finally:
        DD.nsq_del_dec_best = spy and orig
    return [c for c in calls if c[3]["frame_length"] == L]


def test_nsq_del_dec_device_vs_host():
    """(S, 4)-state device trellis vs the host delayed-decision NSQ on
    real encoder frames. Like the C++ twin, parity is high-but-not-exact
    pulse agreement (a float-order boundary flip cascades through the
    LCG dither), plus energy-level agreement of the quantization."""
    calls = harvest_dd(24000)
    assert len(calls) >= 8
    dd_calls = [(x, pre, ctl, kw, p) for (x, pre, ctl, kw, p, _su)
                in calls]
    params, state = to_batch(dd_calls)
    state = dnsq.NsqDelDecState(*state)     # same field layout
    w = 983 * 16 / 65536.0
    pulses, seed_used, _st = dnsq.nsq_del_dec_frame(
        params, state, nb_subfr=NB_SUBFR, sub=SUB, M=M, n_states=4,
        warping=w)
    pulses = np.asarray(pulses)
    agree, e_ratio = [], []
    for s, (x, _pre, _ctl, kw, host_pulses, _su) in enumerate(calls):
        hp = np.asarray(host_pulses, np.int32)
        frac = float((pulses[s] == hp).mean())
        agree.append(frac)
        ge = np.asarray(kw["gains_q16"], np.float64) / 65536.0
        eh = float(np.sum(hp.astype(np.float64) ** 2)) + 1.0
        ed = float(np.sum(pulses[s].astype(np.float64) ** 2)) + 1.0
        e_ratio.append(ed / eh)
        del ge
    # most frames should match exactly; any divergent frame must still
    # be a comparable-rate quantization (energy within 2x)
    assert float(np.mean(agree)) >= 0.9, agree
    assert sum(f == 1.0 for f in agree) >= len(agree) // 2, agree
    for s, r in enumerate(e_ratio):
        assert 0.5 < r < 2.0, (s, r, agree[s])
