"""Batched SILK 16 kHz -> 48 kHz up-resampler on device.

Float formulation of the fixed-point IIR_FIR resampler (reference
src/silk/resampler_private_{up2_hq,iir_fir}.rs [HOT]; bit-exact host twin
in mousiki_tpu/silk/resampler.py):

The whole step (up2_HQ allpass chains, fractional FIR, state update) is
linear in (input frame, IIR state, FIR tail), so it is compiled down to a
SINGLE matmul against a probed (L+14, M+14) operator — see Up48Plan.wmat.
The operator is built once per (frame length, rate) by running the exact
sequential filter on basis vectors; at runtime there are no scans and no
gathers, just one MXU contraction.

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
    wmat: jnp.ndarray      # (L+14, M+14) fused affine operator: the WHOLE
                           # step (up2_HQ allpass chains + fractional FIR +
                           # state update) as ONE matmul on the MXU. The
                           # filter is linear in (x, s_iir, s_fir), so its
                           # operator is built once by probing the exact
                           # sequential filter on basis vectors; runtime is
                           # [x | s_iir | s_fir] @ wmat -> [out | s_iir' |
                           # s_fir']. Replaces the log-depth scans whose
                           # generated program was 13 MB / 27 ms per step.
    n_out: int
    in_khz: int = 16       # internal rate (8/12/16 kHz -> 48 kHz)
    delay: int = 7         # host input_delay for this rate pair


def _allpass_np(u, s0, A, B, C, D):
    """Sequential reference of one allpass section (float64, batched)."""
    out = np.empty_like(u)
    t = s0.copy()
    for n in range(u.shape[1]):
        out[:, n] = C * t + D * u[:, n]
        t = A * t + B * u[:, n]
    return out, t


def _up2_np(x, s_iir):
    """x: (P, L) -> (P, 2L) via the two 3-section allpass chains (see
    _up2_scan section algebra in resampler.py _up2_hq; this is the exact sequential form used
    only at plan-build time to probe the linear operator)."""
    new_s = [None] * 6
    outs = []
    for chain, coefs in enumerate((_C0, _C1)):
        u = x
        for sec in range(2):
            c = coefs[sec]
            u, last = _allpass_np(u, s_iir[:, chain * 3 + sec],
                                  -c, 1.0 + c, 1.0 - c, c)
            new_s[chain * 3 + sec] = last
        c2 = coefs[2]
        u, last = _allpass_np(u, s_iir[:, chain * 3 + 2],
                              -(1.0 + c2), 2.0 + c2, -c2, 1.0 + c2)
        new_s[chain * 3 + 2] = last
        outs.append(u)
    up = np.stack(outs, axis=2).reshape(x.shape[0], -1)
    return up, np.stack(new_s, axis=1)


def make_up48_plan(in_len: int, in_khz: int = 16) -> Up48Plan:
    """Build the fused affine operator for a fixed frame length at internal
    rate in_khz (8/12/16 kHz -> 48 kHz, host FUNC_IIR_FIR).

    The host processes [delay_buf(in_khz) | input(in_len - delay)] as
    segments of at most 10 ms, resetting the Q16 phase accumulator per
    batch; source indices/phases are therefore static per frame length.
    The fractional-FIR gather matrix G is composed with the (linear) up2_HQ
    IIR chains by probing the sequential filter on L+14 basis vectors."""
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
    M = len(bases)
    G = np.zeros((n_up, M), np.float64)
    for m, (b, w) in enumerate(zip(bases, weights)):
        G[b:b + _FIR_ORDER, m] = w
    # probe the linear map (x, s_iir, s_fir) -> (out, s_iir', s_fir')
    L, P = in_len, in_len + 14
    X = np.zeros((P, L))
    X[:L] = np.eye(L)
    S_iir = np.zeros((P, 6))
    S_iir[L:L + 6] = np.eye(6)
    S_fir = np.zeros((P, _FIR_ORDER))
    S_fir[L + 6:] = np.eye(_FIR_ORDER)
    up, new_iir = _up2_np(X, S_iir)
    prefixed = np.concatenate([S_fir, up], axis=1)
    out = prefixed @ G
    W = np.concatenate([out, new_iir, prefixed[:, -_FIR_ORDER:]], axis=1)
    return Up48Plan(jnp.asarray(W.astype(np.float32)), M, in_khz, delay)


class Up48State(NamedTuple):
    s_iir: jnp.ndarray      # (S, 6)
    s_fir: jnp.ndarray      # (S, 8) last upsampled samples
    delay: jnp.ndarray      # (S, 16) host delay_buf (only first 16 used)


def init_up48_state(n_streams: int) -> Up48State:
    return Up48State(jnp.zeros((n_streams, 6), jnp.float32),
                     jnp.zeros((n_streams, 8), jnp.float32),
                     jnp.zeros((n_streams, _IN_KHZ), jnp.float32))


def up48_step(x, state: Up48State, plan: Up48Plan):
    """x: (S, L) float input at plan.in_khz; returns the 48 kHz output
    (S, 48L/in_khz) and the new state.

    One matmul against the probed affine operator (see Up48Plan.wmat).
    Mirrors silk_resampler's delay handling: the first fs_in_khz samples
    come from [delay_buf | head of x]."""
    S, L = x.shape
    d = plan.delay
    if d > 0:
        x_delayed = jnp.concatenate(
            [state.delay[:, :d], x[:, : L - d]], axis=1)
    else:
        x_delayed = x
    inp = jnp.concatenate([x_delayed, state.s_iir, state.s_fir], axis=1)
    res = jnp.einsum("sj,jm->sm", inp, plan.wmat,
                     precision=jax.lax.Precision.HIGHEST)
    M = plan.n_out
    out = res[:, :M]
    new_iir = res[:, M:M + 6]
    new_fir = res[:, M + 6:]
    pad = state.delay.shape[1] - d
    new_delay = jnp.concatenate(
        [x[:, L - d:] if d > 0 else jnp.zeros((S, 0), x.dtype),
         jnp.zeros((S, pad), x.dtype)], axis=1)
    return out, Up48State(new_iir, new_fir, new_delay)
