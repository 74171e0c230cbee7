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
