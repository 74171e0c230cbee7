"""Batched SILK 16 kHz -> 48 kHz up-resampler on device.

Float formulation of the fixed-point IIR_FIR resampler (reference
src/silk/resampler_private_{up2_hq,iir_fir}.rs [HOT]; bit-exact host twin
in mousiki_tpu/silk/resampler.py):

  * up2_HQ: 2x upsampling through two 3-section allpass chains — a
    per-sample IIR run as one lax.scan with an (S, 6) carry over all
    streams at once.
  * fractional FIR: the 2/3-rate 8-tap interpolation uses *static* source
    indices and fractional-phase rows for a fixed frame length (the host's
    batch/index arithmetic is simulated once at trace time), so it becomes
    a single gather + weight contraction.

State (S, 6+8+delay) mirrors the host ResamplerState (s_iir, s_fir tail,
delay_buf); PCM parity vs the fixed-point host is ~1e-4 relative.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from ..silk import tables as T

_FIR_ORDER = 8
# per internal rate (kHz): host inv_ratio_q16 (resampler_init arithmetic,
# up2x = 1 since 48k is not 2x the input) and the DEC delay-matrix entry
_RATE_PARAMS = {8: (21846, 0), 12: (32768, 4), 16: (43691, 7)}
_IN_KHZ = 16                    # default rate (back-compat)
_INPUT_DELAY = 7


def _i16(v):
    v = int(v) & 0xFFFF
    return v - 0x10000 if v & 0x8000 else v


# allpass coefficients as float (smulwb semantics: int16 coef / 2^16)
_C0 = [_i16(c) / 65536.0 for c in T.SILK_RESAMPLER_UP2_HQ_0]
_C1 = [_i16(c) / 65536.0 for c in T.SILK_RESAMPLER_UP2_HQ_1]
_FRAC = np.asarray(T.SILK_RESAMPLER_FRAC_FIR_12, np.float64) / 32768.0


class Up48Plan(NamedTuple):
    base: jnp.ndarray      # (M,) int32 gather bases into [fir(8) | up(2L)]
    weights: jnp.ndarray   # (M, 8) float32 FIR weights
    gmat: jnp.ndarray      # (8 + 2L, M) dense FIR operator: the fractional
                           # interpolation as ONE matmul on the MXU instead
                           # of an M x 8 gather (which lowers poorly on TPU)
    n_out: int
    in_khz: int = 16       # internal rate (8/12/16 kHz -> 48 kHz)
    delay: int = 7         # host input_delay for this rate pair


def make_up48_plan(in_len: int, in_khz: int = 16) -> Up48Plan:
    """Simulate the host batch/index arithmetic for a fixed frame length
    at internal rate in_khz (8/12/16 kHz -> 48 kHz, host FUNC_IIR_FIR).

    The host processes [delay_buf(in_khz) | input(in_len - delay)] as
    segments of at most 10 ms, resetting the Q16 phase accumulator per
    batch; source indices/phases are therefore static per frame length."""
    inv_ratio, delay = _RATE_PARAMS[in_khz]
    batch = in_khz * 10  # RESAMPLER_MAX_BATCH_SIZE_MS * fs_in_khz
    segments = [min(in_khz, in_len)]
    rest = in_len - segments[0]
    while rest > 0:
        segments.append(min(rest, batch))
        rest -= segments[-1]
    bases, weights = [], []
    up_off = 0  # index of this batch's first upsampled sample in `prefixed`
    for n in segments:
        index_q16 = 0
        max_index = n << 17
        while index_q16 < max_index:
            ti = ((index_q16 & 0xFFFF) * 12) >> 16
            b = index_q16 >> 16
            bases.append(up_off + b)
            w = np.concatenate([_FRAC[ti], _FRAC[11 - ti][::-1]])
            weights.append(w)
            index_q16 += inv_ratio
        up_off += 2 * n
    n_up = _FIR_ORDER + 2 * in_len
    G = np.zeros((n_up, len(bases)), np.float32)
    for m, (b, w) in enumerate(zip(bases, weights)):
        G[b:b + _FIR_ORDER, m] = w
    return Up48Plan(jnp.asarray(bases, jnp.int32),
                    jnp.asarray(np.stack(weights), jnp.float32),
                    jnp.asarray(G), len(bases), in_khz, delay)


class Up48State(NamedTuple):
    s_iir: jnp.ndarray      # (S, 6)
    s_fir: jnp.ndarray      # (S, 8) last upsampled samples
    delay: jnp.ndarray      # (S, 16) host delay_buf (only first 16 used)


def init_up48_state(n_streams: int) -> Up48State:
    return Up48State(jnp.zeros((n_streams, 6), jnp.float32),
                     jnp.zeros((n_streams, 8), jnp.float32),
                     jnp.zeros((n_streams, _IN_KHZ), jnp.float32))


def _allpass_scan(u, s_init, A, B, C, D):
    """First-order allpass section as a parallel affine scan.

    t_n = A t_{n-1} + B u_n with t_{-1} = s_init; out_n = C s_n + D u_n
    where s_n is the pre-update state. Log-depth instead of a per-sample
    lax.scan (which is latency-bound on TPU at ~hundreds of steps).
    """
    from .band_exec_jax import _affine_scan

    Av = jnp.full_like(u, A)
    Av = Av.at[:, 0].set(0.0)
    Bv = B * u
    Bv = Bv.at[:, 0].add(A * s_init)
    t = _affine_scan(Av, Bv, 1)
    s_pre = jnp.concatenate([s_init[:, None], t[:, :-1]], axis=1)
    return C * s_pre + D * u, t[:, -1]


def _up2_scan(x, s_iir):
    """x: (S, L) -> (S, 2L) via the two 3-section allpass chains.

    Section algebra (see the sequential host resampler.py _up2_hq):
      sections 1-2 (coef c):  s' = -c s + (1+c) u,  out = (1-c) s + c u
      section 3 (coef c2):    s' = -(1+c2) s + (2+c2) u,
                              out = -c2 s + (1+c2) u
    """
    new_s = [None] * 6
    outs = []
    for chain, coefs in enumerate((_C0, _C1)):
        u = x
        for sec in range(2):
            c = coefs[sec]
            u, last = _allpass_scan(u, s_iir[:, chain * 3 + sec],
                                    -c, 1.0 + c, 1.0 - c, c)
            new_s[chain * 3 + sec] = last
        c2 = coefs[2]
        u, last = _allpass_scan(u, s_iir[:, chain * 3 + 2],
                                -(1.0 + c2), 2.0 + c2, -c2, 1.0 + c2)
        new_s[chain * 3 + 2] = last
        outs.append(u)
    up = jnp.stack(outs, axis=2).reshape(x.shape[0], -1)  # interleave
    return up, jnp.stack(new_s, axis=1)


def _apply(x_delayed, state_iir, state_fir, gmat):
    up, new_iir = _up2_scan(x_delayed, state_iir)
    prefixed = jnp.concatenate([state_fir, up], axis=1)
    out = jnp.einsum("sj,jm->sm", prefixed, gmat,
                     precision=jax.lax.Precision.HIGHEST)
    return out, new_iir, prefixed[:, -_FIR_ORDER:]


def up48_step(x, state: Up48State, plan: Up48Plan):
    """x: (S, L) float input at plan.in_khz; returns the 48 kHz output
    (S, 48L/in_khz) and the new state.

    Mirrors silk_resampler's delay handling: the first fs_in_khz samples
    come from [delay_buf | head of x]."""
    S, L = x.shape
    d = plan.delay
    if d > 0:
        x_delayed = jnp.concatenate(
            [state.delay[:, :d], x[:, : L - d]], axis=1)
    else:
        x_delayed = x
    out, new_iir, new_fir = _apply(x_delayed, state.s_iir, state.s_fir,
                                   plan.gmat)
    pad = state.delay.shape[1] - d
    new_delay = jnp.concatenate(
        [x[:, L - d:] if d > 0 else jnp.zeros((S, 0), x.dtype),
         jnp.zeros((S, pad), x.dtype)], axis=1)
    return out, Up48State(new_iir, new_fir, new_delay)
