"""Batched SILK noise-shaping quantizer on TPU (SURVEY §2.9.7).

Device scan formulation of the float NSQ (reference src/silk/nsq.rs
silk_NSQ; host twin `silk/noise_shape.py` nsq_shaped): S encoder streams
quantize one frame per call as (S,)-wide vector lanes inside a
`lax.scan` over samples. The quantizer feedback (order-24 shaping FIR
over s_diff, 1-sample LF/tilt recurrences, the RD pulse decision) is
irreducibly sequential per sample — the same latency-bound structure the
lockstep CELT experiment measured — but unlike the CELT walk the body
here is ~25 small fused ops over (S,) lanes. Measured on v5e
(tools/probe_nsq_tpu.py): S=256 11.6 ms/frame = 441x realtime
aggregate; S=1024 36 ms = 569x. The scan is bandwidth-bound on the
(S, M+L) work-buffer updates, so aggregate throughput grows only
slowly past S~256; numbers recorded in PARITY.md §2.9.

Semantics notes (kept aligned with nsq_shaped, which is the tested
behavioural mirror of nsq.rs):
  * state is explicit and pure (NsqDevState in / out) so encoder
    snapshot/restore for byte-budget retries stays value semantics;
  * work buffers use absolute frame-time indexing (column M+t = frame
    time t) instead of the reference's rebased ltp_buf_idx/shp_buf_idx
    pointers — the index arithmetic below maps one onto the other;
  * the LTP re-whitening window and all scaled-state adjustments are
    applied with per-stream masks, so voiced/unvoiced/interp lanes mix
    freely in one batch.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

LTP_ORDER = 5
SHAPE_ORDER = 24
LPC_ORDER = 16
QUANT_LEVEL_ADJUST = 80.0 / 1024.0
RAND_MULTIPLIER = jnp.int32(196314165)
RAND_INCREMENT = jnp.int32(907633515)


class NsqParams(NamedTuple):
    """One frame of NSQ inputs, leading axis = S streams."""
    x: jnp.ndarray          # (S, L) input at int16 scale
    a: jnp.ndarray          # (S, 2, 16) LPC per half (q12 / 4096)
    b: jnp.ndarray          # (S, nb_subfr, 5) LTP taps (q14 / 16384)
    ar_shp: jnp.ndarray     # (S, nb_subfr, 24) shaping AR
    harm: jnp.ndarray       # (S, nb_subfr)
    tilt: jnp.ndarray       # (S, nb_subfr)
    lf_ma: jnp.ndarray      # (S, nb_subfr)
    lf_ar: jnp.ndarray      # (S, nb_subfr)
    gains: jnp.ndarray      # (S, nb_subfr) linear gains (>= 1/65536)
    pitch_l: jnp.ndarray    # (S, nb_subfr) int32
    lam: jnp.ndarray        # (S,) RD lambda
    offset: jnp.ndarray     # (S,) quant offset (from signal/offset type)
    voiced: jnp.ndarray     # (S,) bool
    seed: jnp.ndarray       # (S,) int32 frame seed (indices.seed)
    ltp_scale: jnp.ndarray  # (S,) ltp_scale_q14 / 16384
    interp: jnp.ndarray     # (S,) bool NLSF interpolation flag


class NsqDevState(NamedTuple):
    """Cross-frame NSQ state (reference NoiseShapingQuantizerState)."""
    xq: jnp.ndarray         # (S, M) unscaled quantized output history
    shp: jnp.ndarray        # (S, M) shaping history (scaled domain)
    s_lpc: jnp.ndarray      # (S, 16) newest-first xq_v history (scaled)
    s_ar2: jnp.ndarray      # (S, 24) newest-first s_diff history
    s_lf_ar: jnp.ndarray    # (S,)
    s_diff: jnp.ndarray     # (S,)
    lag_prev: jnp.ndarray   # (S,) int32
    prev_gain: jnp.ndarray  # (S,)


def init_nsq_state(n_streams: int, ltp_mem_length: int = 320) -> NsqDevState:
    S, M = n_streams, ltp_mem_length
    z = jnp.zeros
    return NsqDevState(z((S, M)), z((S, M)), z((S, 16)), z((S, 24)),
                       z(S), z(S), z(S, jnp.int32), jnp.ones(S))


def _silk_rand(seed):
    return (RAND_INCREMENT + seed * RAND_MULTIPLIER).astype(jnp.int32)


def _level_val(q0, offset):
    """Dequantized excitation level for pulse q0 (float lanes)."""
    q0f = q0.astype(jnp.float32)
    pos = q0f - QUANT_LEVEL_ADJUST + offset
    neg = q0f + QUANT_LEVEL_ADJUST + offset
    zer = offset
    m1 = offset - (1.0 - QUANT_LEVEL_ADJUST)
    return jnp.where(q0 > 0, pos,
                     jnp.where(q0 == 0, zer, jnp.where(q0 == -1, m1, neg)))


@partial(jax.jit, static_argnames=("nb_subfr", "sub", "M", "order"))
def nsq_frame(params: NsqParams, state: NsqDevState, *, nb_subfr: int = 4,
              sub: int = 80, M: int = 320, order: int = SHAPE_ORDER):
    """Quantize one frame for S streams. Returns (pulses (S, L) int32,
    xq_frame (S, L) unscaled quantized output, new_state)."""
    S = params.x.shape[0]
    L = nb_subfr * sub
    f32 = jnp.float32
    cols_ml = jnp.arange(M + L)

    # absolute-time work buffers: column M + t <-> frame time t
    xq_w = jnp.concatenate([state.xq, jnp.zeros((S, L), f32)], axis=1)
    shp_w = jnp.concatenate([state.shp, jnp.zeros((S, L), f32)], axis=1)
    ltp_w = jnp.zeros((S, M + L), f32)   # scaled whitened-history buffer

    s_lpc = state.s_lpc
    s_ar2 = state.s_ar2
    s_lf_ar = state.s_lf_ar
    s_diff = state.s_diff
    prev_gain = state.prev_gain
    lag_state = state.lag_prev
    rand_seed = params.seed.astype(jnp.int32)
    rows = jnp.arange(S)

    pulses_out = []
    for k in range(nb_subfr):
        fo = k * sub
        half0 = params.interp & (k < 2)
        a_k = jnp.where(half0[:, None], params.a[:, 0], params.a[:, 1])
        b_k = params.b[:, k]
        ar_shp_k = params.ar_shp[:, k, :order]
        gain = jnp.maximum(params.gains[:, k], 1.0 / 65536.0)
        inv_gain = 1.0 / gain
        lag = jnp.where(params.voiced, params.pitch_l[:, k], lag_state)

        interp_mask = jnp.where(params.interp, 1, 3)
        rewhite = params.voiced & ((k & interp_mask) == 0)

        # ---- LTP re-whitening (reference rewhitening + scale_states) ----
        # res over xq times [fo - W, fo); W = min(M - 1, lag + 18).
        # Scaled copy lands on times [fo - lag - 2, fo) only (the window
        # every later read touches); earlier times stay zero like the
        # reference's fresh per-frame buffer.
        W = jnp.minimum(M - 1, lag + LPC_ORDER + LTP_ORDER // 2)
        seg_end = M + fo                       # exclusive, absolute col
        # FIR over the last (W) columns before seg_end, computed over the
        # max window M for every stream and masked
        tcol = cols_ml[:seg_end]
        seg_lo = seg_end - W                    # (S,) first seg column
        res = xq_w[:, :seg_end]
        acc = jnp.zeros_like(res)
        for j in range(LPC_ORDER):
            acc = acc.at[:, j + 1:].add(a_k[:, j:j + 1]
                                        * res[:, :seg_end - j - 1])
        res = res - acc
        # first 16 samples of each stream's segment are zeroed
        valid = (tcol[None, :] >= (seg_lo + LPC_ORDER)[:, None])
        ig = inv_gain * params.ltp_scale if k == 0 else inv_gain
        scaled = res * ig[:, None]
        # write window: times [fo - lag - 2, fo)
        wr_lo = seg_end - (lag + LTP_ORDER // 2)
        wmask = valid & (tcol[None, :] >= wr_lo[:, None]) \
            & rewhite[:, None]
        ltp_w = ltp_w.at[:, :seg_end].set(
            jnp.where(wmask, scaled, ltp_w[:, :seg_end]))

        # ---- gain-change state adjustment ------------------------------
        changed = gain != prev_gain
        adj = jnp.where(changed, prev_gain / gain, 1.0)
        # shp: last M samples before current time fo
        shp_mask = (cols_ml[None, :] < M + fo) & \
            (cols_ml[None, :] >= fo) & changed[:, None]
        shp_w = jnp.where(shp_mask, shp_w * adj[:, None], shp_w)
        # voiced, not rewhitten: rescale the live LTP window
        lmask = (cols_ml[None, :] < M + fo) & \
            (cols_ml[None, :] >= wr_lo[:, None]) & \
            (changed & params.voiced & ~rewhite)[:, None]
        ltp_w = jnp.where(lmask, ltp_w * adj[:, None], ltp_w)
        s_lf_ar = s_lf_ar * adj
        s_diff = s_diff * adj
        s_lpc = s_lpc * adj[:, None]
        s_ar2 = s_ar2 * adj[:, None]
        prev_gain = gain

        x_sc = params.x[:, fo:fo + sub] * inv_gain[:, None]

        harm = params.harm[:, k]
        tilt = params.tilt[:, k]
        lf_ma = params.lf_ma[:, k]
        lf_ar_c = params.lf_ar[:, k]
        lam = params.lam
        offset = params.offset
        rdo = 0.5 * lam - 0.5
        use_dz = lam > 2.0
        voiced = params.voiced
        has_lag = lag > 0

        def body(carry, i):
            (xq_w, shp_w, ltp_w, s_lpc, s_ar2, s_lf_ar, s_diff,
             rand_seed) = carry
            t = M + fo + i                       # absolute column
            rand_seed = _silk_rand(rand_seed)

            lpc_pred = jnp.einsum("sj,sj->s", a_k, s_lpc)
            # LTP 5-tap read at times t - lag + 2 - {0..4}
            li = (t - lag)[:, None] + (2 - jnp.arange(LTP_ORDER))[None, :]
            li = jnp.clip(li, 0, M + L - 1)
            ltp_taps = jnp.take_along_axis(ltp_w, li, axis=1)
            ltp_pred = jnp.where(voiced,
                                 jnp.einsum("sj,sj->s", b_k, ltp_taps), 0.0)

            n_ar = jnp.einsum("sj,sj->s", ar_shp_k, s_ar2[:, :order]) \
                + tilt * s_lf_ar
            prev_shp = jax.lax.dynamic_slice(
                shp_w, (0, t - 1), (shp_w.shape[0], 1))[:, 0]
            n_lf = lf_ma * prev_shp + lf_ar_c * s_lf_ar
            hi = (t - lag)[:, None] + (1 - jnp.arange(3))[None, :]
            hi = jnp.clip(hi, 0, M + L - 1)
            h3 = jnp.take_along_axis(shp_w, hi, axis=1)
            n_ltp = jnp.where(has_lag,
                              harm * (0.25 * (h3[:, 0] + h3[:, 2])
                                      + 0.5 * h3[:, 1]), 0.0)

            r = x_sc[:, i] - (lpc_pred + ltp_pred - n_ar - n_lf - n_ltp)
            neg = rand_seed < 0
            r = jnp.where(neg, -r, r)
            r = jnp.clip(r, -31.0, 30.0)

            q_ideal = r - offset
            q_dz = jnp.where(
                q_ideal > rdo, jnp.floor(q_ideal - rdo),
                jnp.where(q_ideal < -rdo, jnp.floor(q_ideal + rdo),
                          jnp.where(q_ideal < 0.0, -1.0, 0.0)))
            q0 = jnp.where(use_dz, q_dz, jnp.floor(q_ideal))
            q0 = q0.astype(jnp.int32)
            v1 = _level_val(q0, offset)
            v2 = _level_val(q0 + 1, offset)
            rd1 = lam * jnp.abs(v1) + (r - v1) ** 2
            rd2 = lam * jnp.abs(v2) + (r - v2) ** 2
            take2 = rd2 < rd1
            q0 = jnp.where(take2, q0 + 1, q0)
            v1 = jnp.where(take2, v2, v1)
            q0 = jnp.clip(q0, -1000, 1000)

            exc = jnp.where(neg, -v1, v1)
            lpc_exc = exc + ltp_pred
            xq_v = lpc_exc + lpc_pred
            xq_w = jax.lax.dynamic_update_slice(
                xq_w, (xq_v * gain)[:, None], (0, t))
            s_lpc = jnp.concatenate([xq_v[:, None], s_lpc[:, :-1]], axis=1)
            s_diff = xq_v - x_sc[:, i]
            s_ar2 = jnp.concatenate([s_diff[:, None], s_ar2[:, :-1]],
                                    axis=1)
            s_lf_ar = s_diff - n_ar
            shp_w = jax.lax.dynamic_update_slice(
                shp_w, (s_lf_ar - n_lf)[:, None], (0, t))
            ltp_w = jax.lax.dynamic_update_slice(
                ltp_w, lpc_exc[:, None], (0, t))
            rand_seed = (rand_seed + q0).astype(jnp.int32)
            return (xq_w, shp_w, ltp_w, s_lpc, s_ar2, s_lf_ar, s_diff,
                    rand_seed), q0

        carry = (xq_w, shp_w, ltp_w, s_lpc, s_ar2, s_lf_ar, s_diff,
                 rand_seed)
        carry, qk = jax.lax.scan(body, carry, jnp.arange(sub))
        (xq_w, shp_w, ltp_w, s_lpc, s_ar2, s_lf_ar, s_diff,
         rand_seed) = carry
        pulses_out.append(qk.T)                 # (S, sub)
        lag_state = jnp.where(params.voiced, lag, lag_state)

    pulses = jnp.concatenate(pulses_out, axis=1)
    new_state = NsqDevState(
        xq=xq_w[:, L:], shp=shp_w[:, L:], s_lpc=s_lpc, s_ar2=s_ar2,
        s_lf_ar=s_lf_ar, s_diff=s_diff,
        lag_prev=jnp.where(params.voiced,
                           params.pitch_l[:, nb_subfr - 1],
                           jnp.zeros_like(lag_state)),
        prev_gain=prev_gain)
    return pulses, xq_w[:, M:], new_state


# ---------------------------------------------------------------------------
# Delayed-decision widening (SURVEY §2.9.7 + VERDICT r4 item 3): the
# (S,) single-state scan above generalizes to (S, N) trellis lanes —
# the batched device form of silk/nsq_del_dec.py (reference
# nsq_del_dec.rs). Decision-delay rings live on a third axis; committed
# (delayed) samples land in the shared work buffers at per-stream
# column t - dd[s]. The host twin is the tested reference; parity is
# tolerance-based (float summation order; the LCG dither cascades any
# boundary flip — see tests/test_nsq_del_dec.py native-twin note).
# ---------------------------------------------------------------------------

DECISION_DELAY = 40
MAX_DD_STATES = 4
BIG_RD = jnp.float32(2.0 ** 27)


class NsqDelDecState(NamedTuple):
    """Cross-frame state for the del-dec kernel (winner-collapsed: the
    per-frame trellis re-expands from these on entry, exactly like the
    reference's per-frame DelayedDecisionState init)."""
    xq: jnp.ndarray         # (S, M) unscaled committed output history
    shp: jnp.ndarray        # (S, M) committed shaping history (scaled)
    s_lpc: jnp.ndarray      # (S, 16) newest-first xq_v history (scaled)
    s_ar2: jnp.ndarray      # (S, 24) warped-chain state (post-rotation)
    s_lf_ar: jnp.ndarray    # (S,)
    s_diff: jnp.ndarray     # (S,)
    lag_prev: jnp.ndarray   # (S,) int32
    prev_gain: jnp.ndarray  # (S,)


def init_nsq_dd_state(n_streams: int,
                      ltp_mem_length: int = 320) -> NsqDelDecState:
    S, M = n_streams, ltp_mem_length
    z = jnp.zeros
    return NsqDelDecState(z((S, M)), z((S, M)), z((S, 16)), z((S, 24)),
                          z(S), z(S), z(S, jnp.int32), jnp.ones(S))


@partial(jax.jit, static_argnames=("nb_subfr", "sub", "M", "order",
                                   "n_states"))
def nsq_del_dec_frame(params: NsqParams, state: NsqDelDecState, *,
                      nb_subfr: int = 4, sub: int = 80, M: int = 320,
                      order: int = SHAPE_ORDER,
                      n_states: int = MAX_DD_STATES,
                      warping: jnp.ndarray | float = 0.0):
    """Delayed-decision quantize of one frame for S streams.

    Returns (pulses (S, L) int32, seed_used (S,) int32, new_state).
    warping: scalar or (S,) allpass coefficient (0 = plain delay line).
    """
    S = params.x.shape[0]
    N = n_states
    L = nb_subfr * sub
    DD = DECISION_DELAY
    f32 = jnp.float32
    cols_ml = jnp.arange(M + L)
    rows = jnp.arange(S)

    w = jnp.broadcast_to(jnp.asarray(warping, f32), (S,))
    # per-stream warped-rotation operator: new_s = rhs @ Lw[s].T with
    # Lw[j, m] = (-w)^(j-m) (see silk/nsq_del_dec.py for the derivation)
    jj = jnp.arange(order)
    dpow = jj[:, None] - jj[None, :]
    Lw = jnp.where(dpow >= 0, (-w[:, None, None]) ** jnp.maximum(dpow, 0),
                   0.0).astype(f32)          # (S, order, order)

    # committed (shared) buffers
    xq_w = jnp.concatenate([state.xq, jnp.zeros((S, L), f32)], axis=1)
    shp_w = jnp.concatenate([state.shp, jnp.zeros((S, L), f32)], axis=1)
    ltp_w = jnp.zeros((S, M + L), f32)

    # trellis state (axis 1 = N)
    seeds = ((jnp.arange(N)[None, :] + (params.seed[:, None] & 3)) & 3
             ).astype(jnp.int32)
    seed_init = seeds
    rd = jnp.zeros((S, N), f32)
    lf_ar = jnp.broadcast_to(state.s_lf_ar[:, None], (S, N))
    diff = jnp.broadcast_to(state.s_diff[:, None], (S, N))
    s_ar2 = jnp.broadcast_to(state.s_ar2[:, None, :], (S, N, order))
    s_lpc = jnp.broadcast_to(state.s_lpc[:, None, :], (S, N, LPC_ORDER))
    r_rand = jnp.zeros((S, N, DD), jnp.int32)
    r_q = jnp.zeros((S, N, DD), f32)
    r_xq = jnp.zeros((S, N, DD), f32)
    r_pred = jnp.zeros((S, N, DD), f32)
    r_shape = jnp.zeros((S, N, DD), f32)
    r_shape = r_shape.at[:, :, 0].set(state.shp[:, M - 1, None])
    delayed_gain = jnp.zeros((S, DD), f32)

    # per-stream decision delay (nsq_del_dec.rs:134-147)
    dd = jnp.full((S,), min(DD, sub), jnp.int32)
    vmin = jnp.min(jnp.maximum(params.pitch_l[:, :nb_subfr]
                               - LTP_ORDER // 2 - 1, 0), axis=1)
    dd = jnp.where(params.voiced, jnp.minimum(dd, vmin), dd)
    lp = jnp.maximum(state.lag_prev - LTP_ORDER // 2 - 1, 0)
    dd = jnp.where(~params.voiced & (state.lag_prev > 0),
                   jnp.minimum(dd, lp), dd)

    prev_gain = state.prev_gain
    lag_state = state.lag_prev
    smpl0 = 0  # python tracker of the ring head (counts down mod DD)

    pulses = jnp.zeros((S, L), jnp.int32)

    def flush(rd, r_q, r_xq, r_shape, pulses, xq_w, shp_w, smpl_idx,
              gain, fo, count_max, shp_base, mask=None):
        """Commit dd[s] delayed samples from each stream's winner.
        fo: pulse/xq base column (frame time); shp_base: absolute shp
        column base. count_max: static bound (DD). mask: (S,) bool —
        streams that flush (None = all)."""
        if mask is None:
            mask = jnp.full((S,), True)
        win = jnp.argmin(rd, axis=1)                      # (S,)
        pen = jnp.where(jnp.arange(N)[None, :] == win[:, None], 0.0,
                        BIG_RD)
        rd = rd + jnp.where(mask[:, None], pen, 0.0)
        wq = jnp.take_along_axis(r_q, win[:, None, None], 1)[:, 0]   # (S,DD)
        wxq = jnp.take_along_axis(r_xq, win[:, None, None], 1)[:, 0]
        wsh = jnp.take_along_axis(r_shape, win[:, None, None], 1)[:, 0]
        last0 = (smpl_idx + dd) % DD
        for i in range(count_max):
            em = (i < dd) & mask                           # (S,) mask
            last = (last0 + DD - 1 - i) % DD
            q_i = jnp.take_along_axis(wq, last[:, None], 1)[:, 0]
            x_i = jnp.take_along_axis(wxq, last[:, None], 1)[:, 0]
            s_i = jnp.take_along_axis(wsh, last[:, None], 1)[:, 0]
            pcol = jnp.clip(fo + i - dd, 0, L - 1)
            pulses = pulses.at[rows, pcol].set(
                jnp.where(em, jnp.floor(q_i + 0.5).astype(jnp.int32),
                          pulses[rows, pcol]))
            xcol = jnp.clip(M + fo + i - dd, 0, M + L - 1)
            xq_w = xq_w.at[rows, xcol].set(
                jnp.where(em, x_i * gain, xq_w[rows, xcol]))
            scol = jnp.clip(shp_base - dd + i, 0, M + L - 1)
            shp_w = shp_w.at[rows, scol].set(
                jnp.where(em, s_i, shp_w[rows, scol]))
        return rd, pulses, xq_w, shp_w, win

    for k in range(nb_subfr):
        fo = k * sub
        half0 = params.interp & (k < 2)
        a_k = jnp.where(half0[:, None], params.a[:, 0], params.a[:, 1])
        b_k = params.b[:, k]
        ar_shp_k = params.ar_shp[:, k, :order]
        gain = jnp.maximum(params.gains[:, k], 1.0 / 65536.0)
        inv_gain = 1.0 / gain
        lag = jnp.where(params.voiced, params.pitch_l[:, k], lag_state)

        interp_mask = jnp.where(params.interp, 1, 3)
        rewhite = params.voiced & ((k & interp_mask) == 0)

        if k == 2:
            # mid-frame winner flush before re-whitening, per stream:
            # only voiced+interp streams rewhite at k==2 in the host
            # twin (nsq_del_dec.rs:169 `if k == 2`), so only they flush
            flush2 = params.voiced & params.interp
            g1 = jnp.maximum(params.gains[:, 1], 1.0 / 65536.0)
            (rd, pulses, xq_w, shp_w, _win) = flush(
                rd, r_q, r_xq, r_shape, pulses, xq_w, shp_w, smpl0,
                g1, fo, DD, M + fo, mask=flush2)
        else:
            flush2 = None

        # ---- LTP re-whitening over committed xq (same as nsq_frame) ----
        W = jnp.minimum(M - 1, lag + LPC_ORDER + LTP_ORDER // 2)
        seg_end = M + fo
        tcol = cols_ml[:seg_end]
        seg_lo = seg_end - W
        res = xq_w[:, :seg_end]
        acc = jnp.zeros_like(res)
        for j in range(LPC_ORDER):
            acc = acc.at[:, j + 1:].add(a_k[:, j:j + 1]
                                        * res[:, :seg_end - j - 1])
        res = res - acc
        valid = (tcol[None, :] >= (seg_lo + LPC_ORDER)[:, None])
        ig = inv_gain * params.ltp_scale if k == 0 else inv_gain
        scaled = res * ig[:, None]
        wr_lo = seg_end - (lag + LTP_ORDER // 2)
        wmask = valid & (tcol[None, :] >= wr_lo[:, None]) & rewhite[:, None]
        ltp_w = ltp_w.at[:, :seg_end].set(
            jnp.where(wmask, scaled, ltp_w[:, :seg_end]))

        # ---- gain-change adjustment ------------------------------------
        changed = gain != prev_gain
        adj = jnp.where(changed, prev_gain / gain, 1.0)
        shp_mask = (cols_ml[None, :] < M + fo) & \
            (cols_ml[None, :] >= fo) & changed[:, None]
        shp_w = jnp.where(shp_mask, shp_w * adj[:, None], shp_w)
        lmask = (cols_ml[None, :] < (M + fo - dd)[:, None]) & \
            (cols_ml[None, :] >= wr_lo[:, None]) & \
            (changed & params.voiced & ~rewhite)[:, None]
        ltp_w = jnp.where(lmask, ltp_w * adj[:, None], ltp_w)
        lf_ar = lf_ar * adj[:, None]
        diff = diff * adj[:, None]
        s_lpc = s_lpc * adj[:, None, None]
        s_ar2 = s_ar2 * adj[:, None, None]
        r_pred = r_pred * adj[:, None, None]
        r_shape = r_shape * adj[:, None, None]
        prev_gain = gain

        x_sc = params.x[:, fo:fo + sub] * inv_gain[:, None]
        harm = params.harm[:, k]
        tilt = params.tilt[:, k]
        lf_ma = params.lf_ma[:, k]
        lf_ar_c = params.lf_ar[:, k]
        lam = params.lam
        offset = params.offset
        rdo = 0.5 * lam - 0.5
        use_dz = lam > 2.0
        voiced = params.voiced
        has_lag = lag > 0
        flush2_c = flush2 if k == 2 else None

        def body(carry, i):
            (xq_w, shp_w, ltp_w, s_lpc, s_ar2, lf_ar, diff, seeds,
             seed_init, rd, r_rand, r_q, r_xq, r_pred, r_shape,
             delayed_gain, pulses, smpl_idx) = carry
            t = M + fo + i

            # shared committed-history reads (per stream)
            li = (t - lag)[:, None] + (2 - jnp.arange(LTP_ORDER))[None, :]
            li = jnp.clip(li, 0, M + L - 1)
            ltp_taps = jnp.take_along_axis(ltp_w, li, axis=1)
            ltp_pred = jnp.where(voiced,
                                 jnp.einsum("sj,sj->s", b_k, ltp_taps),
                                 0.0)
            hi = (t - lag)[:, None] + (1 - jnp.arange(3))[None, :]
            hi = jnp.clip(hi, 0, M + L - 1)
            h3 = jnp.take_along_axis(shp_w, hi, axis=1)
            n_ltp = jnp.where(has_lag,
                              harm * (0.25 * (h3[:, 0] + h3[:, 2])
                                      + 0.5 * h3[:, 1]), 0.0)

            seeds = _silk_rand(seeds)
            neg = seeds < 0
            sgn = jnp.where(neg, -1.0, 1.0)

            lpc_pred = jnp.einsum("sj,snj->sn", a_k, s_lpc)
            n_ar = jnp.einsum("sj,snj->sn", ar_shp_k,
                              s_ar2[:, :, :order]) + tilt[:, None] * lf_ar
            prev_idx = (smpl_idx + 0) % DD
            pshp = jnp.take_along_axis(
                r_shape, jnp.broadcast_to(prev_idx[:, None, None],
                                          (S, N, 1)), 2)[:, :, 0]
            n_lf = lf_ma[:, None] * pshp + lf_ar_c[:, None] * lf_ar

            r = x_sc[:, i][:, None] - (lpc_pred + ltp_pred[:, None]
                                       - n_ar - n_lf - n_ltp[:, None])
            r = sgn * r
            r = jnp.clip(r, -31.0, 30.0)

            q_ideal = r - offset[:, None]
            q_dz = jnp.where(
                q_ideal > rdo[:, None], jnp.floor(q_ideal - rdo[:, None]),
                jnp.where(q_ideal < -rdo[:, None],
                          jnp.floor(q_ideal + rdo[:, None]),
                          jnp.where(q_ideal < 0.0, -1.0, 0.0)))
            q0 = jnp.where(use_dz[:, None], q_dz, jnp.floor(q_ideal))
            q0i = q0.astype(jnp.int32)
            off2 = offset[:, None]
            v1 = _level_val(q0i, off2)
            v2 = jnp.where(q0i == 0, v1 + (1.0 - QUANT_LEVEL_ADJUST),
                           jnp.where(q0i == -1,
                                     jnp.broadcast_to(off2, v1.shape),
                                     v1 + 1.0))
            rd1 = lam[:, None] * jnp.abs(v1) + (r - v1) ** 2
            rd2 = lam[:, None] * jnp.abs(v2) + (r - v2) ** 2
            swap = rd2 < rd1
            c0_q = jnp.where(swap, v2, v1)
            c1_q = jnp.where(swap, v1, v2)
            c0_rd = rd + jnp.where(swap, rd2, rd1)
            c1_rd = rd + jnp.where(swap, rd1, rd2)

            def cand(vq):
                exc = sgn * vq
                lexc = exc + ltp_pred[:, None]
                xqv = lexc + lpc_pred
                d = xqv - x_sc[:, i][:, None]
                lfar = d - n_ar
                return exc, lexc, xqv, d, lfar, lfar - n_lf

            (c0e, c0l, c0x, c0d, c0f, c0s) = cand(c0_q)
            (c1e, c1l, c1x, c1d, c1f, c1s) = cand(c1_q)

            smpl_idx = (smpl_idx + DD - 1) % DD
            last = (smpl_idx + dd) % DD
            last3 = jnp.broadcast_to(last[:, None, None], (S, N, 1))

            # winner + rand-consistency penalty
            win = jnp.argmin(c0_rd, axis=1)
            rr_last = jnp.take_along_axis(r_rand, last3, 2)[:, :, 0]
            wseed = jnp.take_along_axis(rr_last, win[:, None], 1)
            bad = rr_last != wseed
            c0_rd = jnp.where(bad, c0_rd + BIG_RD, c0_rd)
            c1_rd = jnp.where(bad, c1_rd + BIG_RD, c1_rd)

            # replace worst head with best runner-up
            mx = jnp.argmax(c0_rd, axis=1)
            mn = jnp.argmin(c1_rd, axis=1)
            do_rep = (jnp.take_along_axis(c1_rd, mn[:, None], 1)
                      < jnp.take_along_axis(c0_rd, mx[:, None], 1))[:, 0]
            is_mx = jnp.arange(N)[None, :] == mx[:, None]
            repm = do_rep[:, None] & is_mx

            def rep2(A):            # (S, N) arrays: A[mx] <- A[mn]
                src = jnp.take_along_axis(A, mn[:, None], 1)
                return jnp.where(repm, src, A)

            def rep3(A):            # (S, N, T) arrays
                src = jnp.take_along_axis(A, mn[:, None, None], 1)
                return jnp.where(repm[:, :, None], src, A)

            seeds = rep2(seeds)
            seed_init = rep2(seed_init)
            s_ar2 = rep3(s_ar2)
            s_lpc = rep3(s_lpc)
            r_rand = rep3(r_rand)
            r_q = rep3(r_q)
            r_xq = rep3(r_xq)
            r_pred = rep3(r_pred)
            r_shape = rep3(r_shape)
            # the replaced head takes the runner-up candidate
            c0_rd = jnp.where(repm, rep2(c1_rd), c0_rd)
            c0_q = jnp.where(repm, rep2(c1_q), c0_q)
            c0e = jnp.where(repm, rep2(c1e), c0e)
            c0l = jnp.where(repm, rep2(c1l), c0l)
            c0x = jnp.where(repm, rep2(c1x), c0x)
            c0d = jnp.where(repm, rep2(c1d), c0d)
            c0f = jnp.where(repm, rep2(c1f), c0f)
            c0s = jnp.where(repm, rep2(c1s), c0s)

            # delayed emission from the (post-replacement) winner
            win3 = jnp.broadcast_to(win[:, None, None], (S, N, 1))
            wq = jnp.take_along_axis(
                jnp.take_along_axis(r_q, win3, 1)[:, 0], last[:, None],
                1)[:, 0]
            wxq = jnp.take_along_axis(
                jnp.take_along_axis(r_xq, win3, 1)[:, 0], last[:, None],
                1)[:, 0]
            wsh = jnp.take_along_axis(
                jnp.take_along_axis(r_shape, win3, 1)[:, 0],
                last[:, None], 1)[:, 0]
            wpr = jnp.take_along_axis(
                jnp.take_along_axis(r_pred, win3, 1)[:, 0],
                last[:, None], 1)[:, 0]
            dg = jnp.take_along_axis(delayed_gain, last[:, None], 1)[:, 0]
            if k == 0:
                emit = i >= dd
            elif k == 2:
                # streams that flushed restart the delay fill; others
                # kept their pipeline and emit every sample
                emit = jnp.where(flush2_c, i >= dd, True)
            else:
                emit = jnp.full((S,), True)
            pcol = jnp.clip(fo + i - dd, 0, L - 1)
            pulses = pulses.at[rows, pcol].set(
                jnp.where(emit, jnp.floor(wq + 0.5).astype(jnp.int32),
                          pulses[rows, pcol]))
            xcol = jnp.clip(t - dd, 0, M + L - 1)
            xq_w = xq_w.at[rows, xcol].set(
                jnp.where(emit, wxq * dg, xq_w[rows, xcol]))
            shp_w = shp_w.at[rows, xcol].set(
                jnp.where(emit, wsh, shp_w[rows, xcol]))
            ltp_w = ltp_w.at[rows, xcol].set(
                jnp.where(emit, wpr, ltp_w[rows, xcol]))

            # advance every state with its head candidate; warped rotate
            rhs = jnp.concatenate(
                [(c0d + w[:, None] * s_ar2[:, :, 0])[:, :, None],
                 s_ar2[:, :, :-1] + w[:, None, None] * s_ar2[:, :, 1:]],
                axis=2)
            s_ar2 = jnp.einsum("snj,sij->sni", rhs, Lw)
            lf_ar = c0f
            diff = c0d
            s_lpc = jnp.concatenate([c0x[:, :, None], s_lpc[:, :, :-1]],
                                    axis=2)
            si3 = jnp.broadcast_to(smpl_idx[..., None, None]
                                   if smpl_idx.ndim else
                                   jnp.full((S, N, 1), smpl_idx),
                                   (S, N, 1))
            r_xq = jnp.where(jnp.arange(DD)[None, None, :] == si3,
                             c0x[:, :, None], r_xq)
            r_q = jnp.where(jnp.arange(DD)[None, None, :] == si3,
                            c0_q[:, :, None], r_q)
            r_pred = jnp.where(jnp.arange(DD)[None, None, :] == si3,
                               c0l[:, :, None], r_pred)
            r_shape = jnp.where(jnp.arange(DD)[None, None, :] == si3,
                                c0s[:, :, None], r_shape)
            seeds = (seeds + jnp.floor(c0_q + 0.5).astype(jnp.int32)
                     ).astype(jnp.int32)
            r_rand = jnp.where(jnp.arange(DD)[None, None, :] == si3,
                               seeds[:, :, None], r_rand)
            rd = c0_rd
            delayed_gain = jnp.where(
                jnp.arange(DD)[None, :] == smpl_idx[:, None],
                gain[:, None], delayed_gain)
            return (xq_w, shp_w, ltp_w, s_lpc, s_ar2, lf_ar, diff, seeds,
                    seed_init, rd, r_rand, r_q, r_xq, r_pred, r_shape,
                    delayed_gain, pulses, smpl_idx), None

        # smpl index must be traced (it changes per sample); carry as a
        # (S,) vector for uniform indexing even though it is equal across
        # streams
        smpl_vec = jnp.full((S,), smpl0, jnp.int32)
        carry = (xq_w, shp_w, ltp_w, s_lpc, s_ar2, lf_ar, diff, seeds,
                 seed_init, rd, r_rand, r_q, r_xq, r_pred, r_shape,
                 delayed_gain, pulses, smpl_vec)
        carry, _ = jax.lax.scan(body, carry, jnp.arange(sub))
        (xq_w, shp_w, ltp_w, s_lpc, s_ar2, lf_ar, diff, seeds, seed_init,
         rd, r_rand, r_q, r_xq, r_pred, r_shape, delayed_gain, pulses,
         smpl_vec) = carry
        smpl0 = int((0 - (k + 1) * sub) % DD)
        lag_state = jnp.where(params.voiced, lag, lag_state)

    # final flush + winner writeback
    glast = jnp.maximum(params.gains[:, nb_subfr - 1], 1.0 / 65536.0)
    rd, pulses, xq_w, shp_w, win = flush(
        rd, r_q, r_xq, r_shape, pulses, xq_w, shp_w, smpl0, glast, L, DD,
        M + L)
    win3 = win[:, None, None]
    new_state = NsqDelDecState(
        xq=xq_w[:, L:], shp=shp_w[:, L:],
        s_lpc=jnp.take_along_axis(s_lpc, win3, 1)[:, 0],
        s_ar2=jnp.take_along_axis(s_ar2, win3, 1)[:, 0],
        s_lf_ar=jnp.take_along_axis(lf_ar, win[:, None], 1)[:, 0],
        s_diff=jnp.take_along_axis(diff, win[:, None], 1)[:, 0],
        lag_prev=jnp.where(params.voiced, params.pitch_l[:, nb_subfr - 1],
                           jnp.zeros_like(state.lag_prev)),
        prev_gain=prev_gain)
    seed_used = jnp.take_along_axis(seed_init, win[:, None], 1)[:, 0]
    return pulses, seed_used, new_state
