"""Batched CELT synthesis on TPU: the device half of the decoder.

Everything after the host symbol stage is expressed as fused, batched JAX
ops over S concurrent streams (SURVEY.md §7 step 4):

  * denormalise: per-band energy scale via a bin->band gather (VPU)
  * IMDCT: precomputed basis matmuls on the MXU — (S*C, 960) @ (960, 960)
    for long blocks and (S*C*8, 120) @ (120, 120) for short blocks, with a
    vectorized TDAC window/overlap combine (no sequential block loop)
  * comb postfilter: chunked recurrence (chunk = COMBFILTER_MINPERIOD-2)
    with per-stream pitch-lag gathers
  * deemphasis: first-order IIR via associative scan (log-depth)

State lives on device as a pytree of (S, ...) arrays so thousands of
streams persist across frame batches; shard the leading axis over a mesh
for multi-chip scaling (see mousiki_tpu.parallel.streaming).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from ..celt.modes import opus_custom_mode
from ..celt.quant_bands import E_MEANS
from .mdct import imdct_matrix

DECODE_BUFFER_SIZE = 2048
OVERLAP = 120
HALF = OVERLAP // 2
N960 = 960
COMB_MIN = 15
_COMB_GAINS = np.array([
    [0.3066406250, 0.2170410156, 0.1296386719],
    [0.4638671875, 0.2680664062, 0.0],
    [0.7998046875, 0.1000976562, 0.0],
], np.float32)


def _bin_band_map(mode, M):
    """bin index -> band index (int32, len M*shortMdctSize; 21 past end)."""
    nbins = M * mode.short_mdct_size
    out = np.full(nbins, mode.num_ebands, np.int32)
    for b in range(mode.num_ebands):
        out[M * mode.ebands[b]: M * mode.ebands[b + 1]] = b
    return out


class SynthesisConsts(NamedTuple):
    m_long: jnp.ndarray      # (960, 960) IMDCT basis
    m_short: jnp.ndarray     # (120, 120)
    window: jnp.ndarray      # (120,)
    bin_band: jnp.ndarray    # (960,) int32
    e_means: jnp.ndarray     # (22,)
    comb_gains: jnp.ndarray  # (3, 3)


def make_consts(dtype=jnp.float32, n: int = N960) -> SynthesisConsts:
    """Constants for frame size n (120/240/480/960 = LM 0-3)."""
    mode = opus_custom_mode()
    M = n // mode.short_mdct_size
    e_means = np.concatenate([E_MEANS[:21], [0.0]]).astype(np.float32)
    return SynthesisConsts(
        m_long=jnp.asarray(imdct_matrix(n), dtype),
        m_short=jnp.asarray(imdct_matrix(120), dtype),
        window=jnp.asarray(mode.window, dtype),
        bin_band=jnp.asarray(_bin_band_map(mode, M)),
        e_means=jnp.asarray(e_means, dtype),
        comb_gains=jnp.asarray(_COMB_GAINS, dtype),
    )


class StreamState(NamedTuple):
    """Per-stream decoder state resident on device; leading axis = streams."""
    decode_mem: jnp.ndarray       # (S, C, DECODE_BUFFER_SIZE + HALF)
    preemph: jnp.ndarray          # (S, C)
    pf_period: jnp.ndarray        # (S,) int32 (previous frame's)
    pf_gain: jnp.ndarray          # (S,)
    pf_tapset: jnp.ndarray        # (S,) int32
    pf_period_old: jnp.ndarray    # (S,) int32
    pf_gain_old: jnp.ndarray      # (S,)
    pf_tapset_old: jnp.ndarray    # (S,) int32


def init_state(n_streams: int, channels: int = 2, dtype=jnp.float32) -> StreamState:
    S = n_streams
    z = lambda *shape: jnp.zeros(shape, dtype)
    zi = lambda *shape: jnp.zeros(shape, jnp.int32)
    return StreamState(
        decode_mem=z(S, channels, DECODE_BUFFER_SIZE + HALF),
        preemph=z(S, channels),
        pf_period=jnp.full((S,), COMB_MIN, jnp.int32),
        pf_gain=z(S),
        pf_tapset=zi(S),
        pf_period_old=jnp.full((S,), COMB_MIN, jnp.int32),
        pf_gain_old=z(S),
        pf_tapset_old=zi(S),
    )


class FrameDesc(NamedTuple):
    """Dense per-frame descriptors from the host symbol stage (axis 0 = S)."""
    x: jnp.ndarray            # (S, C, 960) unit-norm band shapes
    band_log_e: jnp.ndarray   # (S, C, 22) decoded energies (band 21 = -inf pad)
    transient: jnp.ndarray    # (S,) bool
    silence: jnp.ndarray      # (S,) bool
    pf_pitch: jnp.ndarray     # (S,) int32 new postfilter period
    pf_gain: jnp.ndarray      # (S,) new postfilter gain
    pf_tapset: jnp.ndarray    # (S,) int32


def denormalise(consts: SynthesisConsts, x, band_log_e, silence):
    """freq[s,c,k] = x * 2^(bandLogE[band(k)] + eMeans[band(k)])."""
    lg = band_log_e + consts.e_means[None, None, :]
    g = jnp.exp2(jnp.minimum(32.0, lg))
    gk = jnp.take(g, consts.bin_band, axis=2)
    freq = x * gk
    return jnp.where(silence[:, None, None], 0.0, freq)


def imdct_blocks(consts: SynthesisConsts, freq, transient):
    """Per-block raw IMDCT outputs: returns (S, C, 8?, n2) assembled (S, C, 1020).

    Computes both long (1x960) and short (8x120) decompositions and selects
    per stream; output is the concatenated raw stream of length 960 + HALF
    positions [HALF..) relative to the previous tail (see celt_overlap_add).
    """
    S, C, N = freq.shape
    # f32-accurate MXU matmuls (bf16 default is ~1e-3, too coarse for
    # conformance; HIGHEST uses the 3-pass bf16 decomposition on TPU)
    prec = jax.lax.Precision.HIGHEST
    # long: one block of N
    raw_long = jnp.einsum("sck,nk->scn", freq, consts.m_long,
                          precision=prec)  # (S, C, N)
    # short: de-interleave B=N/120 blocks: block b coefficient k = freq[b + B*k]
    B = N // 120
    fs = freq.reshape(S, C, 120, B).transpose(0, 1, 3, 2)      # (S, C, B, 120)
    raw_short = jnp.einsum("scbk,nk->scbn", fs, consts.m_short,
                           precision=prec).reshape(S, C, N)
    return jnp.where(transient[:, None, None], raw_short, raw_long)


def overlap_windows(consts: SynthesisConsts, raw, prev_tail, transient):
    """Vectorized TDAC combine for both block layouts; returns (out, new_tail).

    T = [prev_tail | raw]; per block b at offset g=b*n2:
      r <  HALF:        out = w[ov-1-r]*T[g+r] - w[r]*T[g+ov-1-r]
      HALF <= r < ov:   out = w[r]*T[g+r] + w[ov-1-r]*T[g+ov-1-r]
      r >= ov:          out = T[g+r]
    computed for n2=960 (1 block) and n2=120 (8 blocks), selected per stream.
    """
    S, C, N = raw.shape
    w = consts.window
    T = jnp.concatenate([prev_tail, raw], axis=-1)  # (S, C, N + HALF)

    def combine(n2):
        B = N // n2
        j = jnp.arange(N)
        r = j % n2
        g = (j // n2) * n2
        i2 = OVERLAP - 1 - r
        tj = T[..., :N]                         # T at absolute pos j
        tm = jnp.take(T, jnp.clip(g + i2, 0, N + HALF - 1), axis=-1)
        head = w[i2] * tj - w[jnp.clip(r, 0, OVERLAP - 1)] * tm
        mid = w[jnp.clip(r, 0, OVERLAP - 1)] * tj + w[jnp.clip(i2, 0, OVERLAP - 1)] * tm
        out = jnp.where(r < HALF, head, jnp.where(r < OVERLAP, mid, tj))
        return out

    out_long = combine(N)
    out_short = combine(120)
    out = jnp.where(transient[:, None, None], out_short, out_long)
    new_tail = T[..., N: N + HALF]
    return out, new_tail


def comb_filter_batched(consts, buf, pos, N, t0, t1, g0, g1, tap0, tap1):
    """In-place-style batched comb filter over buf[..., pos:pos+N].

    buf: (S, C, L); periods t0/t1 (S,) int32 >= 15; gains (S,).
    Processes the blend region (overlap) then the constant tail in chunks of
    COMB_MIN-2 samples so earlier outputs feed later reads.
    """
    S, C, L = buf.shape
    w = consts.window
    gains = consts.comb_gains
    g00 = g0 * gains[tap0, 0]
    g01 = g0 * gains[tap0, 1]
    g02 = g0 * gains[tap0, 2]
    g10 = g1 * gains[tap1, 0]
    g11 = g1 * gains[tap1, 1]
    g12 = g1 * gains[tap1, 2]
    active = (g0 != 0.0) | (g1 != 0.0)
    same = (g0 == g1) & (t0 == t1) & (tap0 == tap1)
    ov = jnp.where(same, 0, OVERLAP)  # per-stream blend length

    def gather(b, offs):
        # b: (S, C, L); offs: (S, n) absolute indices -> (S, C, n)
        return jnp.take_along_axis(b, offs[:, None, :].repeat(C, 1), axis=-1)

    # Both the blend region and the constant tail have feedback lag
    # >= COMB_MIN - 2 = 13 samples (periods are clamped to >= 15), so the
    # whole filter runs as one chunked loop: earlier chunks' outputs are
    # visible to later chunks' reads, matching the sequential reference.
    CHUNK = COMB_MIN - 2
    n_chunks = -(-N // CHUNK)
    # f(i) = w[i]^2 inside the blend window, 1 afterwards
    wsq = jnp.concatenate([w * w, jnp.ones(1, w.dtype)])

    def step(ci, buf):
        start = pos + ci * CHUNK
        rel = ci * CHUNK + jnp.arange(CHUNK)          # sample idx in [0, N)
        j = start + jnp.arange(CHUNK)                 # absolute positions
        offs0 = j[None, :] - t0[:, None]              # (S, CHUNK)
        offs1 = j[None, :] - t1[:, None]
        part0 = (g00[:, None, None] * gather(buf, offs0)
                 + g01[:, None, None] * (gather(buf, offs0 + 1)
                                         + gather(buf, offs0 - 1))
                 + g02[:, None, None] * (gather(buf, offs0 + 2)
                                         + gather(buf, offs0 - 2)))
        part1 = (g10[:, None, None] * gather(buf, offs1)
                 + g11[:, None, None] * (gather(buf, offs1 + 1)
                                         + gather(buf, offs1 - 1))
                 + g12[:, None, None] * (gather(buf, offs1 + 2)
                                         + gather(buf, offs1 - 2)))
        cur = jax.lax.dynamic_slice_in_dim(buf, start, CHUNK, axis=-1)
        in_blend = rel[None, :] < ov[:, None]          # (S, CHUNK)
        f = jnp.where(in_blend, wsq[jnp.minimum(rel, OVERLAP)][None, :], 1.0)
        y = cur + (1 - f)[:, None, :] * part0 + f[:, None, :] * part1
        # after the blend region the reference stops when g1 == 0
        valid = (rel[None, :] < N) & active[:, None] \
            & (in_blend | (g1 != 0.0)[:, None])
        new = jnp.where(valid[:, None, :].repeat(C, 1), y, cur)
        return jax.lax.dynamic_update_slice_in_dim(buf, new, start, axis=-1)

    buf = jax.lax.fori_loop(0, n_chunks, step, buf)
    return buf


def _use_pallas() -> bool:
    import os
    if os.environ.get("MOUSIKI_NO_PALLAS"):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def deemphasis(x, mem, coef=0.85):
    """y[n] = x[n] + coef*y[n-1]; Pallas log-step scan on TPU, associative
    scan elsewhere. Returns (y, new_mem)."""
    S, C, N = x.shape
    if _use_pallas():
        from .pallas_kernels import deemphasis_pallas
        y2, m2 = deemphasis_pallas(x.reshape(S * C, N).astype(jnp.float32),
                                   mem.reshape(S * C).astype(jnp.float32),
                                   float(coef))
        return y2.reshape(S, C, N), m2.reshape(S, C)
    a = jnp.full((S, C, N), coef, x.dtype)
    b = x.at[..., 0].add(coef * mem)

    def combine(l, r):
        al, bl = l
        ar, br = r
        return al * ar, br + ar * bl

    _, y = jax.lax.associative_scan(combine, (a, b), axis=-1)
    return y, y[..., -1]


@partial(jax.jit, static_argnames=("channels", "n"))
def synthesis_step(consts: SynthesisConsts, state: StreamState,
                   desc: FrameDesc, channels: int = 2, n: int = N960,
                   lost=None, freq_plc=None):
    """One frame (n = 120/240/480/960 samples, LM 0-3) for all streams;
    returns (pcm (S, n, C), new state). consts must be make_consts(n=n).

    lost/freq_plc: per-stream packet-loss masking (ops/plc_jax.py): lost
    streams take the PLC re-entry spectrum (already full-scale) instead
    of their denormalised decoded bands; callers must also set the lost
    streams' desc.pf_* to the state's current postfilter params and
    transient/silence to False so the comb blend stays constant."""
    N = n
    freq = denormalise(consts, desc.x, desc.band_log_e, desc.silence)
    if lost is not None:
        freq = jnp.where(lost[:, None, None], freq_plc, freq)
    raw = imdct_blocks(consts, freq, desc.transient)

    # shift decode_mem left by N; previous raw tail lands at DECODE-N
    mem = jnp.roll(state.decode_mem, -N, axis=-1)
    pos = DECODE_BUFFER_SIZE - N
    prev_tail = jax.lax.dynamic_slice_in_dim(mem, pos, HALF, axis=-1)
    out, new_tail = overlap_windows(consts, raw, prev_tail, desc.transient)
    mem = jax.lax.dynamic_update_slice_in_dim(mem, out, pos, axis=-1)
    mem = jax.lax.dynamic_update_slice_in_dim(mem, new_tail, pos + N, axis=-1)

    # postfilter: old->current over first shortMdctSize, current->new for rest
    per = jnp.maximum(state.pf_period, COMB_MIN)
    per_old = jnp.maximum(state.pf_period_old, COMB_MIN)
    blend = min(120, N)
    mem = comb_filter_batched(consts, mem, pos, blend, per_old, per,
                              state.pf_gain_old, state.pf_gain,
                              state.pf_tapset_old, state.pf_tapset)
    if N > blend:
        mem = comb_filter_batched(consts, mem, pos + blend, N - blend,
                                  per, jnp.maximum(desc.pf_pitch, COMB_MIN),
                                  state.pf_gain, desc.pf_gain,
                                  state.pf_tapset, desc.pf_tapset)

    synth = jax.lax.dynamic_slice_in_dim(mem, pos, N, axis=-1)
    pcm, new_preemph = deemphasis(synth, state.preemph)
    pcm = pcm * (1.0 / 32768.0)

    # state rotation (celt_decoder.rs:4011): old <- current, current <- new;
    # for LM != 0 old is then overwritten with the new values too, so only
    # 2.5 ms frames keep the one-frame-delayed "old" postfilter params
    if n == 120:
        old_p, old_g, old_t = per, state.pf_gain, state.pf_tapset
    else:
        old_p = jnp.maximum(desc.pf_pitch, COMB_MIN)
        old_g, old_t = desc.pf_gain, desc.pf_tapset
    new_state = StreamState(
        decode_mem=mem,
        preemph=new_preemph,
        pf_period=jnp.maximum(desc.pf_pitch, COMB_MIN),
        pf_gain=desc.pf_gain,
        pf_tapset=desc.pf_tapset,
        pf_period_old=old_p,
        pf_gain_old=old_g,
        pf_tapset_old=old_t,
    )
    return pcm.transpose(0, 2, 1), new_state
