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
_IN_KHZ = 16
_BATCH = 160                    # host RESAMPLER_MAX_BATCH_SIZE_MS * fs_in_khz
_INV_RATIO_Q16 = 43691          # host inv_ratio for 16k -> 48k
_INPUT_DELAY = 7                # host delay matrix entry for 16k -> 48k


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
    n_out: int


def make_up48_plan(in_len: int) -> Up48Plan:
    """Simulate the host batch/index arithmetic for a fixed frame length.

    The host processes [delay_buf(16) | input(in_len - 16)] as segments of
    at most _BATCH samples, resetting the Q16 phase accumulator per batch;
    source indices/phases are therefore static per frame length."""
    segments = [min(_IN_KHZ, in_len)]
    rest = in_len - segments[0]
    while rest > 0:
        segments.append(min(rest, _BATCH))
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
            index_q16 += _INV_RATIO_Q16
        up_off += 2 * n
    return Up48Plan(jnp.asarray(bases, jnp.int32),
                    jnp.asarray(np.stack(weights), jnp.float32),
                    len(bases))


class Up48State(NamedTuple):
    s_iir: jnp.ndarray      # (S, 6)
    s_fir: jnp.ndarray      # (S, 8) last upsampled samples
    delay: jnp.ndarray      # (S, 16) host delay_buf (only first 16 used)


def init_up48_state(n_streams: int) -> Up48State:
    return Up48State(jnp.zeros((n_streams, 6), jnp.float32),
                     jnp.zeros((n_streams, 8), jnp.float32),
                     jnp.zeros((n_streams, _IN_KHZ), jnp.float32))


def _up2_scan(x, s_iir):
    """x: (S, L) -> (S, 2L) via the two allpass chains."""
    c00, c01, c02 = _C0
    c10, c11, c12 = _C1

    def step(s, xn):
        s0, s1, s2, s3, s4, s5 = [s[:, i] for i in range(6)]
        y = xn - s0
        xv = y * c00
        o1 = s0 + xv
        s0 = xn + xv
        y = o1 - s1
        xv = y * c01
        o2 = s1 + xv
        s1 = o1 + xv
        y = o2 - s2
        xv = y + y * c02
        even = s2 + xv
        s2 = o2 + xv
        y = xn - s3
        xv = y * c10
        o1 = s3 + xv
        s3 = xn + xv
        y = o1 - s4
        xv = y * c11
        o2 = s4 + xv
        s4 = o1 + xv
        y = o2 - s5
        xv = y + y * c12
        odd = s5 + xv
        s5 = o2 + xv
        return jnp.stack([s0, s1, s2, s3, s4, s5], 1), jnp.stack([even, odd], 1)

    s, pairs = jax.lax.scan(step, s_iir, x.T)        # pairs: (L, S, 2)
    up = pairs.transpose(1, 0, 2).reshape(x.shape[0], -1)
    return up, s


@partial(jax.jit, static_argnames=("plan_len",))
def _apply(x_delayed, state_iir, state_fir, plan_base, plan_w, plan_len):
    up, new_iir = _up2_scan(x_delayed, state_iir)
    prefixed = jnp.concatenate([state_fir, up], axis=1)
    idx = plan_base[:, None] + jnp.arange(_FIR_ORDER)[None, :]   # (M, 8)
    S = prefixed.shape[0]
    g = jnp.take(prefixed, idx.reshape(-1), axis=1).reshape(
        S, plan_len, _FIR_ORDER)
    out = (g * plan_w[None]).sum(-1)
    return out, new_iir, prefixed[:, -_FIR_ORDER:]


def up48_step(x, state: Up48State, plan: Up48Plan):
    """x: (S, L) float input at 16 kHz; returns (out (S, 3L), new state).

    Mirrors silk_resampler's delay handling: the first fs_in_khz samples
    come from [delay_buf | head of x]."""
    S, L = x.shape
    n = _IN_KHZ - _INPUT_DELAY
    x_delayed = jnp.concatenate(
        [state.delay[:, :_INPUT_DELAY], x[:, : L - _INPUT_DELAY]], axis=1)
    out, new_iir, new_fir = _apply(x_delayed, state.s_iir, state.s_fir,
                                   plan.base, plan.weights, plan.n_out)
    new_delay = jnp.concatenate(
        [x[:, L - _INPUT_DELAY:],
         jnp.zeros((S, _IN_KHZ - _INPUT_DELAY), x.dtype)], axis=1)
    return out, Up48State(new_iir, new_fir, new_delay)
