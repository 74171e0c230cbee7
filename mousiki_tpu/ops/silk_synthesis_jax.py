"""Batched SILK synthesis on TPU: the device half of the SILK decoder.

Float formulation of decode_core (reference src/silk/decode_core.rs [HOT];
bit-exact host twin in mousiki_tpu/silk/decode_core.py) over S concurrent
streams. Everything is computed in the output domain, which makes the
fixed-point reference's gain-adjustment rescaling of carried state
unnecessary (multiply decode_core's recurrences through by the subframe
gain and the gain_adj factors cancel):

  * scale: e[n] = gain[subfr(n)] * exc[n]
  * LTP (voiced): r[n] = e[n] + sum_j b_j r[n - lag + 2 - j] over
    [rewhitened history | frame]. The feedback lag is >= pitch-2 >= 30
    samples, so the recurrence runs as a chunked loop (chunk = 16) with
    per-stream lag gathers — the same trick as the CELT comb filter.
  * LPC: y[n] = r[n] + sum_j a_j y[n-1-j], an order-16 IIR via lax.scan
    with an (S, 16) carry — one fused step per sample, all streams wide.

Jittable; shards over streams exactly like the CELT synthesis stage.
PCM parity vs the bit-exact host decoder is float-level (~1e-3 relative;
the reference itself gates hybrid paths by PCM thresholds, SURVEY.md §7).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

LTP_ORDER = 5
MAX_D = 16
CHUNK = 8    # feedback reach is lag-2 >= 14 even at the NB minimum lag


class SilkFrameParams(NamedTuple):
    """Dense per-frame SILK parameters (leading axis = S streams)."""
    exc: jnp.ndarray          # (S, L) float excitation (exc_q14 / 2^14)
    a: jnp.ndarray            # (S, 2, 16) LPC coefs (a_q12 / 2^12) per half
    b: jnp.ndarray            # (S, nb_subfr, 5) LTP taps (q14 / 2^14)
    pitch_l: jnp.ndarray      # (S, nb_subfr) int32 lags (>= CHUNK+2 if voiced)
    gains: jnp.ndarray        # (S, nb_subfr) linear gains (gains_q16 / 2^16)
    voiced: jnp.ndarray       # (S,) bool
    ltp_scale: jnp.ndarray    # (S,) float (ltp_scale_q14 / 2^14)
    interp: jnp.ndarray = None  # (S,) bool: NLSF-interpolated halves
                                # (decode_core k == 2 LTP rewhitening)


class SilkStreamState(NamedTuple):
    out_hist: jnp.ndarray     # (S, H) previous output at the internal rate
    lpc_hist: jnp.ndarray     # (S, 16) y[n-1], y[n-2], ... (output domain)


def init_silk_state(n_streams: int, fs_khz: int = 16) -> SilkStreamState:
    H = 20 * fs_khz  # ltp_mem_length
    return SilkStreamState(jnp.zeros((n_streams, H), jnp.float32),
                           jnp.zeros((n_streams, MAX_D), jnp.float32))


def _lpc_analysis_batched(x, a):
    """residual[n] = x[n] - sum_j a[j] x[n-1-j]; x: (S, T), a: (S, 16)."""
    S, T = x.shape
    acc = x
    for j in range(MAX_D):
        shifted = jnp.pad(x, ((0, 0), (j + 1, 0)))[:, :T]
        acc = acc - a[:, j:j + 1] * shifted
    return acc


@partial(jax.jit, static_argnames=("nb_subfr", "subfr_len"))
def silk_synthesis_step(params: SilkFrameParams, state: SilkStreamState,
                        nb_subfr: int = 4, subfr_len: int = 80):
    """One SILK frame for all streams; returns (out (S, L), new state)."""
    S, L = params.exc.shape
    H = state.out_hist.shape[1]

    sub_idx = jnp.minimum(jnp.arange(L) // subfr_len, nb_subfr - 1)
    g = jnp.take_along_axis(params.gains,
                            jnp.broadcast_to(sub_idx[None, :], (S, L)),
                            axis=1)
    e = params.exc * g

    tap_off = 2 - jnp.arange(LTP_ORDER)                   # B0 at lag-2's +2 .. B4 at -2

    def ltp_chunks(r, c_lo, c_hi, hist_len):
        def ltp_chunk(ci, r):
            n0 = hist_len + (ci - c_lo) * CHUNK
            n = n0 + jnp.arange(CHUNK)
            sub = jnp.minimum((ci * CHUNK) // subfr_len, nb_subfr - 1)
            lag = params.pitch_l[:, sub]                  # (S,)
            bsub = params.b[:, sub, :]                    # (S, 5)
            idx = (n[None, :, None] - lag[:, None, None]
                   + tap_off[None, None, :])              # (S, CHUNK, 5)
            idx = jnp.clip(idx, 0, r.shape[1] - 1)
            past = jnp.take_along_axis(r, idx.reshape(S, -1),
                                       axis=1).reshape(S, CHUNK, LTP_ORDER)
            pred = (past * bsub[:, None, :]).sum(-1)
            cur = jax.lax.dynamic_slice_in_dim(r, n0, CHUNK, axis=1)
            val = cur + jnp.where(params.voiced[:, None], pred, 0.0)
            return jax.lax.dynamic_update_slice_in_dim(r, val, n0, axis=1)

        return jax.lax.fori_loop(c_lo, c_hi, ltp_chunk, r)

    def lpc_scan(a, x, hist):
        def step(carry, xn):
            yn = xn + (carry * a).sum(-1)
            return jnp.concatenate([yn[:, None], carry[:, :-1]], axis=1), yn

        carry, ys = jax.lax.scan(step, hist, x.T)
        return ys.T, carry

    half = (L // 2 // subfr_len) * subfr_len
    a0 = params.a[:, 0, :]
    a1 = params.a[:, 1, :]

    # -- first half: rewhiten history with half-0 LPC, scaled by ltp_scale
    # (decode_core k == 0 rewhitening) --
    white = _lpc_analysis_batched(state.out_hist, a0) \
        * params.ltp_scale[:, None]
    r1 = jnp.concatenate([white, e[:, :half]], axis=1)    # (S, H + half)
    r1 = ltp_chunks(r1, 0, half // CHUNK, H)
    y1, h1 = lpc_scan(a0, r1[:, H:], state.lpc_hist)

    # -- second half: NLSF-interpolated frames rewhiten [history | y1]
    # with the half-1 LPC (decode_core k == 2, no ltp_scale); otherwise
    # the LTP residual recurrence simply continues --
    interp = params.interp
    if interp is None:
        interp = jnp.zeros((S,), bool)
    rew = _lpc_analysis_batched(
        jnp.concatenate([state.out_hist, y1], axis=1), a1)
    r2_init = jnp.where(interp[:, None], rew, r1)
    r2 = jnp.concatenate([r2_init, e[:, half:]], axis=1)  # (S, H + L)
    r2 = ltp_chunks(r2, half // CHUNK, L // CHUNK, H + half)
    y2, h2 = lpc_scan(a1, r2[:, H + half:], h1)

    out = jnp.concatenate([y1, y2], axis=1)
    new_hist = jnp.concatenate([state.out_hist, out], axis=1)[:, -H:]
    return out, SilkStreamState(new_hist, h2)
