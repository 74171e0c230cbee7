"""Lockstep device-side CELT symbol decoder: frame stages 1-6.

Decodes, for S streams in lockstep on the TPU (see ops/ec_lockstep.py for
the lane-vectorized range decoder), everything `celt/decoder.py`
decode_with_ec does BEFORE the band loop: silence/postfilter/transient/
intra flags, coarse energy (Laplace), tf_res, spread, dynalloc boosts,
trim, the full bit allocation (rate.py clt_compute_allocation /
interp_bits2pulses in vector form, including the band-skip / intensity /
dual-stereo symbols), and fine energy.  The band-tree walk (stage 7) lives
in ops/celt_lockstep_walk.py.

Parity: reference `src/celt/celt_decoder.rs` celt_decode_with_ec:4140,
`src/celt/quant_bands.rs` unquant_coarse_energy:902, `src/celt/rate.rs`
interp_bits2pulses:505 / clt_compute_allocation:1072.  Integer semantics
are bit-exact (differentially tested against the Python decoder via its
`trace` hook in tests/test_celt_lockstep.py); energy floats are f32 on
device vs f64 on host (tolerance-tested).

Everything here is shape-static over (S,) lanes: data-dependent loops are
masked fixed unrolls or `lax.while_loop`s, per-lane table lookups are
gathers from mode-derived constant tables (_tables below).
"""

from __future__ import annotations

from functools import lru_cache
from typing import NamedTuple

import numpy as np

import jax.numpy as jnp
from jax import lax

from ..celt.modes import BITRES, opus_custom_mode
from ..celt.quant_bands import E_PROB_MODEL
from ..celt.rate import ALLOC_STEPS, LOG2_FRAC_TABLE
from . import ec_lockstep as ec

TRIM_ICDF = [126, 124, 119, 109, 87, 41, 19, 9, 4, 2, 0]
SPREAD_ICDF = [25, 23, 2, 0]
TAPSET_ICDF = [2, 1, 0]
SMALL_ENERGY_ICDF = [2, 1, 0]

TF_SELECT_TABLE = [
    [0, -1, 0, -1, 0, -1, 0, -1],
    [0, -1, 0, -2, 1, 0, 1, -1],
    [0, -2, 0, -3, 2, 0, 1, -1],
    [0, -2, 0, -3, 3, 0, 1, -1],
]

PRED_COEF = [29440 / 32768.0, 26112 / 32768.0, 21248 / 32768.0,
             16384 / 32768.0]
BETA_COEF = [30147 / 32768.0, 22282 / 32768.0, 12124 / 32768.0,
             6554 / 32768.0]
BETA_INTRA = 4915 / 32768.0

MAX_PSEUDO = 40
_I1 = jnp.int32(1)
_I0 = jnp.int32(0)


class ModeTables(NamedTuple):
    """Constant mode-derived tables for one (lm, C) config (numpy)."""
    ebands: np.ndarray        # (22,) i32
    nbands: np.ndarray        # (21,) i32  N per band (coeffs, = M*diff)
    log_n: np.ndarray         # (21,) i32
    caps: np.ndarray          # (21,) i32  init_caps for this (LM, C)
    alloc_vectors: np.ndarray  # (nv, 21) i32
    thresh: np.ndarray        # (21,) i32
    trim_base: np.ndarray     # (21,) i32  trim_offset without trim factor
    cache_k: np.ndarray       # (5, 21) i32   pulse-cache row K (LM+1 major)
    cache_bits: np.ndarray    # (5, 21, MAX_PSEUDO+1) i32
    get_pulses: np.ndarray    # (41,) i32
    e_prob: np.ndarray        # (2, 42) i32  [intra][2*band] fs/decay
    log2_frac: np.ndarray     # (25,) i32
    vtab: np.ndarray          # (210, 130) u32 exact V(n,k) where it fits


@lru_cache(maxsize=8)
def _tables(lm: int, C: int) -> ModeTables:
    mode = opus_custom_mode(48000, 960)
    nb = mode.num_ebands
    eb = np.asarray(mode.ebands, np.int32)
    M = 1 << lm
    nbands = (M * (eb[1:] - eb[:-1])).astype(np.int32)
    caps = np.array(
        [(int(mode.cache.caps[nb * (2 * lm + C - 1) + i]) + 64) * C
         * int(nbands[i]) >> 2 for i in range(nb)], np.int32)
    thresh = np.maximum(C << BITRES,
                        (3 * (eb[1:] - eb[:-1]).astype(np.int64))
                        << (lm + BITRES) >> 4).astype(np.int32)
    # trim_offset = C*n*(trim-5-LM)*(end-j-1)*2^(LM+3) >> 6, minus C<<3 when
    # the band is one coefficient wide; split into the trim-independent base
    n0 = (eb[1:] - eb[:-1]).astype(np.int64)
    trim_base = (C * n0 * (nb - 1 - np.arange(nb)) * (1 << (lm + BITRES))
                 >> 6).astype(np.int32)
    cache_k = np.zeros((5, nb), np.int32)
    cache_bits = np.zeros((5, nb, MAX_PSEUDO + 1), np.int32)
    for row in range(5):
        for j in range(nb):
            ci = int(mode.cache.index[row * nb + j])
            if ci < 0:
                continue
            K = int(mode.cache.bits[ci])
            cache_k[row, j] = K
            cache_bits[row, j, :K + 1] = mode.cache.bits[ci:ci + K + 1]
    gp = np.array([i if i < 8 else (8 + (i & 7)) << ((i >> 3) - 1)
                   for i in range(MAX_PSEUDO + 1)], np.int32)
    e_prob = np.asarray(E_PROB_MODEL[lm], np.int32)
    # exact V(n, k) table where it fits in u32 (libopus only ever codes
    # PVQ leaves with V < 2^32, guaranteed by fits_in32 in the mode build)
    from ..celt.cwrs import pvq_u
    NN, KK = 210, 130
    vt = np.zeros((NN, KK), np.uint32)
    for n in range(2, NN):
        for k in range(1, KK):
            v = pvq_u(n, k) + pvq_u(n, k + 1)
            if v < (1 << 32):
                vt[n, k] = v
            else:
                break
    return ModeTables(
        ebands=eb, nbands=nbands,
        log_n=np.asarray(mode.log_n, np.int32), caps=caps,
        alloc_vectors=np.asarray(mode.alloc_vectors, np.int32),
        thresh=thresh, trim_base=trim_base, cache_k=cache_k,
        cache_bits=cache_bits, get_pulses=gp, e_prob=e_prob,
        log2_frac=np.asarray(LOG2_FRAC_TABLE, np.int32), vtab=vt)


class FrameHeader(NamedTuple):
    silence: jnp.ndarray      # (S,) bool
    pf_pitch: jnp.ndarray     # (S,) i32
    pf_gain: jnp.ndarray      # (S,) f32
    pf_tapset: jnp.ndarray    # (S,) i32
    transient: jnp.ndarray    # (S,) bool
    intra: jnp.ndarray        # (S,) bool


class AllocResult(NamedTuple):
    pulses: jnp.ndarray         # (S, 21) i32
    ebits: jnp.ndarray          # (S, 21) i32
    fine_priority: jnp.ndarray  # (S, 21) i32
    coded_bands: jnp.ndarray    # (S,) i32
    balance: jnp.ndarray        # (S,) i32
    intensity: jnp.ndarray      # (S,) i32
    dual_stereo: jnp.ndarray    # (S,) i32
    anti_collapse_rsv: jnp.ndarray  # (S,) i32


# --------------------------------------------------------------- stage 1


def decode_header(st: ec.EcLanes, active, *, lm: int = 3, start: int = 0):
    """silence, postfilter, transient, intra flags (decoder.py:246-278)."""
    total_bits = st.storage * 8
    tell = ec.ec_tell(st)
    sil_poss = active & (tell < total_bits) & (tell == 1)
    sil_sat = active & (tell >= total_bits)
    bit, st = ec.ec_dec_bit_logp(st, 15, sil_poss)
    silence = sil_sat | bit
    # silence lanes jump their bit accounting to the end of the buffer
    # (decoder.py:256: nbits_total += total - tell)
    tell2 = ec.ec_tell(st)
    st = st._replace(nbits_total=jnp.where(
        silence, st.nbits_total + total_bits - tell2, st.nbits_total))
    act = active & ~silence

    pf_pitch = jnp.zeros_like(tell)
    pf_gain = jnp.zeros(tell.shape, jnp.float32)
    pf_tapset = jnp.zeros_like(tell)
    if start == 0:
        tell = ec.ec_tell(st)
        can_pf = act & (tell + 16 <= total_bits)
        has_pf, st = ec.ec_dec_bit_logp(st, 1, can_pf)
        octave, st = ec.ec_dec_uint(st, jnp.full_like(tell, 6).astype(
            jnp.uint32), has_pf)
        octave = octave.astype(jnp.int32)
        rawbits, st = ec.ec_dec_bits(st, jnp.where(has_pf, 4 + octave, 0),
                                     has_pf)
        pf_pitch = jnp.where(
            has_pf, (16 << octave) + rawbits.astype(jnp.int32) - 1, 0)
        qg, st = ec.ec_dec_bits(st, jnp.where(has_pf, 3, 0), has_pf)
        tell = ec.ec_tell(st)
        can_tap = has_pf & (tell + 2 <= total_bits)
        tap, st = ec.ec_dec_icdf(st, TAPSET_ICDF, 2, can_tap)
        pf_tapset = jnp.where(can_tap, tap, 0)
        pf_gain = jnp.where(has_pf,
                            0.09375 * (qg.astype(jnp.float32) + 1.0), 0.0)

    tell = ec.ec_tell(st)
    can_tr = act & (tell + 3 <= total_bits) if lm > 0 \
        else jnp.zeros_like(act)
    transient, st = ec.ec_dec_bit_logp(st, 3, can_tr)
    transient = transient & can_tr
    tell = ec.ec_tell(st)
    can_in = act & (tell + 3 <= total_bits)
    intra, st = ec.ec_dec_bit_logp(st, 3, can_in)
    intra = intra & can_in
    return FrameHeader(silence, pf_pitch, pf_gain, pf_tapset,
                       transient, intra), st


# --------------------------------------------------------------- stage 2


def decode_coarse(st: ec.EcLanes, active, intra, energy_in, *, C: int,
                  lm: int, start: int = 0, end: int = 21):
    """Coarse energies. energy_in (S, 2, 21) f32 (decoder old_ebands, with
    the C==1 max-merge already applied by the caller). Returns (S, C, 21)
    updated energies for coded channels + st."""
    tb = _tables(lm, C)
    eprob = jnp.asarray(tb.e_prob)
    coef = jnp.where(intra, 0.0, jnp.float32(PRED_COEF[lm]))
    beta = jnp.where(intra, jnp.float32(BETA_INTRA),
                     jnp.float32(BETA_COEF[lm]))
    budget = st.storage * 8
    S = st.rng.shape[0]
    prev = jnp.zeros((S, C), jnp.float32)
    e = energy_in[:, :C, :].astype(jnp.float32)

    def band(carry, i):
        st, prev, e = carry
        for c in range(C):
            tell = ec.ec_tell(st)
            left = budget - tell
            pi = 2 * jnp.minimum(i, 20)
            fs0 = jnp.where(intra, eprob[1, pi], eprob[0, pi]) << 7
            decay = jnp.where(intra, eprob[1, pi + 1],
                              eprob[0, pi + 1]) << 6
            m_lap = active & (left >= 15)
            qi_l, st = ec.ec_laplace_decode(st, fs0.astype(jnp.uint32),
                                            decay, m_lap)
            m_icdf = active & ~m_lap & (left >= 2)
            qi_i, st = ec.ec_dec_icdf(st, SMALL_ENERGY_ICDF, 2, m_icdf)
            qi_i = (qi_i >> 1) ^ -(qi_i & 1)
            m_bit = active & ~m_lap & ~m_icdf & (left >= 1)
            qi_b, st = ec.ec_dec_bit_logp(st, 1, m_bit)
            qi = jnp.where(m_lap, qi_l,
                           jnp.where(m_icdf, qi_i,
                                     jnp.where(m_bit,
                                               -qi_b.astype(jnp.int32), -1)))
            q = qi.astype(jnp.float32)
            old = jnp.maximum(e[:, c, i], -9.0)
            tmp = coef * old + prev[:, c] + q
            e = e.at[:, c, i].set(jnp.where(active, tmp, e[:, c, i]))
            prev = prev.at[:, c].set(
                jnp.where(active, prev[:, c] + q - beta * q, prev[:, c]))
        return (st, prev, e), None

    (st, prev, e), _ = lax.scan(band, (st, prev, e),
                                jnp.arange(start, end, dtype=jnp.int32))
    return e, st


# --------------------------------------------------------------- stage 3


def decode_tf(st: ec.EcLanes, active, transient, *, lm: int,
              start: int = 0, end: int = 21):
    """tf_res per band (decoder.py tf_decode). Returns ((S,21) i32, st)."""
    S = st.rng.shape[0]
    budget = st.storage * 8
    tell = ec.ec_tell(st)
    logp0 = jnp.where(transient, 2, 4)
    tf_select_rsv = (lm > 0) & active & (tell + logp0 + 1 <= budget)
    budget = budget - tf_select_rsv.astype(jnp.int32)
    curr = jnp.zeros(S, jnp.int32)
    tf_changed = jnp.zeros(S, jnp.int32)
    tf_res = jnp.zeros((S, 21), jnp.int32)

    def band(carry, i):
        st, curr, tf_changed, tf_res = carry
        tell = ec.ec_tell(st)
        lo = jnp.where(transient, jnp.where(i == start, 2, 4),
                       jnp.where(i == start, 4, 5))
        can = active & (tell + lo <= budget)
        b2, st = ec.ec_dec_bit_logp_var(st, lo, can)
        curr = jnp.where(can, curr ^ b2.astype(jnp.int32), curr)
        tf_changed = tf_changed | curr
        tf_res = tf_res.at[:, i].set(curr)
        return (st, curr, tf_changed, tf_res), None

    (st, curr, tf_changed, tf_res), _ = lax.scan(
        band, (st, curr, tf_changed, tf_res),
        jnp.arange(start, end, dtype=jnp.int32))

    table = jnp.asarray(TF_SELECT_TABLE[lm], jnp.int32)
    ti = transient.astype(jnp.int32)
    differs = (table[4 * ti + 0 + tf_changed]
               != table[4 * ti + 2 + tf_changed])
    sel_m = tf_select_rsv & differs
    tf_select, st = ec.ec_dec_bit_logp(st, 1, sel_m)
    tf_select = jnp.where(sel_m, tf_select.astype(jnp.int32), 0)
    idx = (4 * ti + 2 * tf_select)[:, None] + tf_res
    tf_res = jnp.where(active[:, None], table[idx], 0)
    return tf_res, st


# --------------------------------------------------------------- stage 4


def decode_spread_dynalloc_trim(st: ec.EcLanes, active, *, C: int, lm: int,
                                start: int = 0, end: int = 21):
    """spread, dynalloc offsets, trim. Returns (spread, offsets(S,21),
    trim, total_bits_frac(S,), tell_frac(S,), st)."""
    tb = _tables(lm, C)
    S = st.rng.shape[0]
    total_bits = st.storage * 8
    tell = ec.ec_tell(st)
    can_sp = active & (tell + 4 <= total_bits)
    spread, st = ec.ec_dec_icdf(st, SPREAD_ICDF, 5, can_sp)
    spread = jnp.where(can_sp, spread, 2)  # SPREAD_NORMAL

    caps = jnp.asarray(tb.caps)
    widthv = C * jnp.asarray(tb.nbands)                     # (21,)
    quanta = jnp.minimum(widthv << BITRES,
                         jnp.maximum(6 << BITRES, widthv))  # (21,)
    total_f = (total_bits << BITRES).astype(jnp.int32)      # per-lane reg
    total_f = jnp.broadcast_to(total_f, (S,))
    tellf = ec.ec_tell_frac(st)
    dyn_logp = jnp.full(S, 6, jnp.int32)
    offsets = jnp.zeros((S, 21), jnp.int32)

    def band(carry, i):
        st, total_f, tellf, dyn_logp, offsets = carry
        boost = jnp.zeros(S, jnp.int32)
        loop_logp = dyn_logp

        def cond(c):
            st_, total_, tell_, lp_, boost_, going_ = c
            return jnp.any(going_)

        def body(c):
            st_, total_, tell_, lp_, boost_, going_ = c
            flag, st_ = ec.ec_dec_bit_logp_var(st_, lp_, going_)
            tell_ = jnp.where(going_, ec.ec_tell_frac(st_), tell_)
            stop = going_ & ~flag
            cont = going_ & flag
            boost_ = jnp.where(cont, boost_ + quanta[i], boost_)
            total_ = jnp.where(cont, total_ - quanta[i], total_)
            lp_ = jnp.where(cont, 1, lp_)
            going_ = cont & (tell_ + (lp_ << BITRES) < total_) \
                & (boost_ < caps[i])
            return (st_, total_, tell_, lp_, boost_, going_)

        going = active & (tellf + (loop_logp << BITRES) < total_f) \
            & (boost < caps[i])
        st, total_f, tellf, loop_logp, boost, _ = lax.while_loop(
            cond, body, (st, total_f, tellf, loop_logp, boost, going))
        offsets = offsets.at[:, i].set(boost)
        dyn_logp = jnp.where(boost > 0, jnp.maximum(2, dyn_logp - 1),
                             dyn_logp)
        return (st, total_f, tellf, dyn_logp, offsets), None

    (st, total_f, tellf, dyn_logp, offsets), _ = lax.scan(
        band, (st, total_f, tellf, dyn_logp, offsets),
        jnp.arange(start, end, dtype=jnp.int32))

    can_tr = active & (tellf + (6 << BITRES) <= total_f)
    trim, st = ec.ec_dec_icdf(st, TRIM_ICDF, 7, can_tr)
    trim = jnp.where(can_tr, trim, 5)
    return spread, offsets, trim, total_f, st


# --------------------------------------------------------------- stage 5


def _celt_udiv_u32(num_u32, den_i32):
    """Unsigned divide exactly like celt_udiv (num may be a wrapped u32)."""
    return ec._udiv32(num_u32.astype(jnp.uint32),
                      den_i32.astype(jnp.uint32)).astype(jnp.int32)


def compute_allocation(st: ec.EcLanes, active, offsets, trim, total_in,
                       *, C: int, lm: int, start: int = 0, end: int = 21):
    """Vector clt_compute_allocation + interp_bits2pulses (rate.py)."""
    tb = _tables(lm, C)
    S = st.rng.shape[0]
    eb = jnp.asarray(tb.ebands)
    nbv = jnp.asarray(tb.nbands)          # N per band (coeffs)
    n0v = eb[1:] - eb[:-1]                # width in eband units
    caps = jnp.asarray(tb.caps)
    threshv = jnp.asarray(tb.thresh)
    av = jnp.asarray(tb.alloc_vectors)    # (nv, 21)
    nv = tb.alloc_vectors.shape[0]
    l2f = jnp.asarray(tb.log2_frac)
    alloc_floor = C << BITRES
    stereo = 1 if C > 1 else 0

    total = jnp.maximum(total_in, 0)
    skip_rsv = jnp.where(total >= (1 << BITRES), 1 << BITRES, 0)
    total = total - skip_rsv
    if C == 2:
        cand = int(LOG2_FRAC_TABLE[end - start])
        intensity_rsv = jnp.where(cand <= total, cand, 0)
        total = total - intensity_rsv
        ds_poss = (intensity_rsv > 0) & (total >= (1 << BITRES))
        dual_stereo_rsv = jnp.where(ds_poss, 1 << BITRES, 0)
        total = total - dual_stereo_rsv
    else:
        intensity_rsv = jnp.zeros(S, jnp.int32)
        dual_stereo_rsv = jnp.zeros(S, jnp.int32)

    # per-band trim offsets (trim per lane)
    j = jnp.arange(21, dtype=jnp.int32)
    trim_off = ((C * n0v * (trim[:, None] - 5 - lm) * (end - j - 1)[None, :]
                 * (1 << (lm + BITRES))) >> 6).astype(jnp.int32)
    trim_off = trim_off - jnp.where(nbv == 1, alloc_floor, 0)[None, :]
    in_range = ((j >= start) & (j < end))[None, :]

    def psum_of(bitsj):
        """Reverse-scan 'done' + threshold accumulation (vectorized)."""
        hit = (bitsj >= threshv[None, :]) & in_range
        # done = any hit at this band or later
        done = jnp.flip(jnp.cumsum(jnp.flip(hit.astype(jnp.int32), 1), 1),
                        1) > 0
        contrib = jnp.where(done, jnp.minimum(bitsj, caps[None, :]),
                            jnp.where(bitsj >= alloc_floor, alloc_floor, 0))
        return jnp.sum(jnp.where(in_range, contrib, 0), axis=1)

    def vec_bits(idx):
        """bits for alloc vector row idx (per lane) inc. trim/offsets."""
        row = av[jnp.clip(idx, 0, nv - 1)]                   # (S, 21)
        b = ((C * n0v[None, :] * row) << lm) >> 2
        b = jnp.where(b > 0, jnp.maximum(0, b + trim_off), b)
        return b + offsets

    # binary search of the highest affordable allocation curve
    lo = jnp.ones(S, jnp.int32)
    hi = jnp.full(S, nv - 1, jnp.int32)
    for _ in range(int(np.ceil(np.log2(max(nv, 2)))) + 1):
        go = lo <= hi
        mid = (lo + hi) >> 1
        psum = psum_of(vec_bits(mid))
        over = psum > total
        hi = jnp.where(go & over, mid - 1, hi)
        lo = jnp.where(go & ~over, mid + 1, lo)
    hi = lo
    lo = lo - 1

    b1r = av[jnp.clip(lo, 0, nv - 1)]
    b1 = ((C * n0v[None, :] * b1r) << lm) >> 2
    b2hi = av[jnp.clip(hi, 0, nv - 1)]
    b2 = ((C * n0v[None, :] * b2hi) << lm) >> 2
    b2 = jnp.where((hi >= nv)[:, None], caps[None, :], b2)
    b1 = jnp.where(b1 > 0, jnp.maximum(0, b1 + trim_off), b1)
    b2 = jnp.where(b2 > 0, jnp.maximum(0, b2 + trim_off), b2)
    b1 = b1 + jnp.where(lo[:, None] > 0, offsets, 0)
    b2 = b2 + offsets
    bits1 = b1
    bits2 = jnp.maximum(0, b2 - bits1)
    skip_start = jnp.where(
        jnp.any((offsets > 0) & in_range, axis=1),
        jnp.max(jnp.where((offsets > 0) & in_range, j[None, :], -1), axis=1),
        start)

    # ---- interp_bits2pulses ----
    lo_i = jnp.zeros(S, jnp.int32)
    hi_i = jnp.full(S, 1 << ALLOC_STEPS, jnp.int32)
    for _ in range(ALLOC_STEPS):
        mid = (lo_i + hi_i) >> 1
        tmp = bits1 + ((mid[:, None] * bits2) >> ALLOC_STEPS)
        psum = psum_of(tmp)
        over = psum > total
        hi_i = jnp.where(over, mid, hi_i)
        lo_i = jnp.where(over, lo_i, mid)

    tmp = bits1 + ((lo_i[:, None] * bits2) >> ALLOC_STEPS)
    hit = (tmp >= threshv[None, :]) & in_range
    done = jnp.flip(jnp.cumsum(jnp.flip(hit.astype(jnp.int32), 1), 1), 1) > 0
    tmp = jnp.where(done, tmp,
                    jnp.where(tmp >= alloc_floor, alloc_floor, 0))
    bits = jnp.minimum(tmp, caps[None, :])
    bits = jnp.where(in_range, bits, 0)
    psum = jnp.sum(bits, axis=1)

    # ---- band-skip loop (one masked EC bit per band, top down) ----
    coded_bands = jnp.full(S, end, jnp.int32)
    in_loop = active
    intensity = jnp.zeros(S, jnp.int32)

    def skip_band(carry, jj):
        st, in_loop, coded_bands, psum, total, intensity_rsv, bits = carry
        jb = jj
        at = in_loop & (coded_bands - 1 == jb)
        hit_floor = at & (jb <= skip_start)
        total = jnp.where(hit_floor, total + skip_rsv, total)
        in_loop = in_loop & ~hit_floor
        at = at & ~hit_floor
        band_width = eb[jnp.clip(coded_bands, 0, 21)] - eb[jnp.clip(jb, 0, 21)]
        left_u = (total - psum).astype(jnp.uint32)
        denom = eb[jnp.clip(coded_bands, 0, 21)] - eb[start]
        per_coeff = _celt_udiv_u32(left_u, jnp.maximum(denom, 1))
        left_r = (left_u.astype(jnp.int32) - denom * per_coeff)
        rem = jnp.maximum(left_r - (eb[jnp.clip(jb, 0, 21)] - eb[start]), 0)
        bj = jnp.take_along_axis(bits, jnp.clip(jb, 0, 20)[:, None],
                                 axis=1)[:, 0]
        band_bits_u = (bj.astype(jnp.uint32)
                       + per_coeff.astype(jnp.uint32)
                       * band_width.astype(jnp.uint32)
                       + rem.astype(jnp.uint32))
        band_bits = band_bits_u.astype(jnp.int32)
        may = at & (band_bits >= jnp.maximum(
            jnp.take(threshv, jnp.clip(jb, 0, 20)),
            alloc_floor + (1 << BITRES)))
        stop_bit, st = ec.ec_dec_bit_logp(st, 1, may)
        stopping = may & stop_bit
        in_loop = in_loop & ~stopping
        took = may & ~stop_bit
        psum = jnp.where(took, psum + (1 << BITRES), psum)
        band_bits = jnp.where(took, band_bits - (1 << BITRES), band_bits)
        cont = at & ~stopping
        psum = jnp.where(cont, psum - bj - intensity_rsv, psum)
        new_irsv = jnp.where(
            intensity_rsv > 0,
            jnp.take(l2f, jnp.clip(jb - start, 0, 24)), intensity_rsv)
        intensity_rsv = jnp.where(cont, new_irsv, intensity_rsv)
        psum = jnp.where(cont, psum + intensity_rsv, psum)
        keep_floor = cont & (band_bits >= alloc_floor)
        psum = jnp.where(keep_floor, psum + alloc_floor, psum)
        newb = jnp.where(keep_floor, alloc_floor, 0)
        bits = jnp.where(
            (cont[:, None]) & (j[None, :] == jb[:, None]),
            newb[:, None], bits)
        coded_bands = jnp.where(cont, coded_bands - 1, coded_bands)
        return (st, in_loop, coded_bands, psum, total, intensity_rsv,
                bits), None

    jjs = jnp.arange(end - 1, start - 1, -1, dtype=jnp.int32)
    jjs = jnp.broadcast_to(jjs[:, None], (jjs.shape[0], S))
    (st, in_loop, coded_bands, psum, total, intensity_rsv, bits), _ = \
        lax.scan(skip_band,
                 (st, in_loop, coded_bands, psum, total, intensity_rsv,
                  bits), jjs)

    # intensity / dual stereo symbols
    has_int = active & (intensity_rsv > 0)
    ift = (coded_bands + 1 - start).astype(jnp.uint32)
    iv, st = ec.ec_dec_uint(st, jnp.maximum(ift, 2), has_int)
    intensity = jnp.where(has_int, start + iv.astype(jnp.int32), 0)
    give_back = (intensity <= start) & (dual_stereo_rsv > 0)
    total = jnp.where(give_back, total + dual_stereo_rsv, total)
    dual_stereo_rsv = jnp.where(give_back, 0, dual_stereo_rsv)
    has_ds = active & (dual_stereo_rsv > 0)
    dsb, st = ec.ec_dec_bit_logp(st, 1, has_ds)
    dual_stereo = jnp.where(has_ds, dsb.astype(jnp.int32), 0)

    # ---- distribute remaining over coded bands ----
    denom = jnp.maximum(eb[jnp.clip(coded_bands, 0, 21)] - eb[start], 1)
    left_u = (total - psum).astype(jnp.uint32)
    per_coeff = _celt_udiv_u32(left_u, denom)
    left = left_u.astype(jnp.int32) - denom * per_coeff
    coded_m = (j[None, :] >= start) & (j[None, :] < coded_bands[:, None])
    bits = bits + jnp.where(coded_m, per_coeff[:, None] * n0v[None, :], 0)
    # sequential one-coeff leftovers: add_j = clip(left - prefix, 0, width)
    pre = jnp.cumsum(jnp.where(coded_m, n0v[None, :], 0), axis=1)
    prefix = pre - jnp.where(coded_m, n0v[None, :], 0)
    add = jnp.clip(left[:, None] - prefix, 0, n0v[None, :])
    bits = bits + jnp.where(coded_m, add, 0)

    # ---- fine/PVQ split, band-sequential balance carry ----
    log_n = jnp.asarray(tb.log_n)
    log_m = lm << BITRES
    FINE_OFFSET = 21
    MAX_FINE_BITS = 8

    def split_band(carry, i):
        balance, bits, ebits, fprio = carry
        is_coded = (i >= start) & (i < coded_bands)
        n = nbv[i]
        bit = jnp.take_along_axis(bits, i[:, None].clip(0, 20),
                                  axis=1)[:, 0] + balance
        # n > 1 branch
        excess_a = jnp.maximum(bit - caps[i], 0)
        bits_a = bit - excess_a
        den = C * n + jnp.where(
            (C == 2) & (n > 2) & (dual_stereo == 0) & (i < intensity), 1, 0)
        nclogn = den * (log_n[i] + log_m)
        offset = (nclogn >> 1) - den * FINE_OFFSET
        offset = offset + jnp.where(n == 2, den << (BITRES - 2), 0)
        offset = offset + jnp.where(
            bits_a + offset < (den * 2) << BITRES, nclogn >> 2,
            jnp.where(bits_a + offset < (den * 3) << BITRES,
                      nclogn >> 3, 0))
        ebv = jnp.maximum(0, bits_a + offset + (den << (BITRES - 1)))
        ebv = _celt_udiv_u32(ebv.astype(jnp.uint32), den) >> BITRES
        ebv = jnp.where(C * ebv > (bits_a >> BITRES),
                        bits_a >> stereo >> BITRES, ebv)
        ebv = jnp.minimum(ebv, MAX_FINE_BITS)
        fp_a = (ebv * (den << BITRES) >= bits_a + offset).astype(jnp.int32)
        bits_a2 = bits_a - ((C * ebv) << BITRES)
        # n == 1 branch
        excess_b = jnp.maximum(0, bit - alloc_floor)
        bits_b = bit - excess_b
        n_is1 = n <= 1
        excess = jnp.where(n_is1, excess_b, excess_a)
        bitsj = jnp.where(n_is1, bits_b, bits_a2)
        ebj = jnp.where(n_is1, 0, ebv)
        fpj = jnp.where(n_is1, 1, fp_a)
        # re-balance unusable excess into fine energy
        extra_fine = jnp.minimum(excess >> (stereo + BITRES),
                                 MAX_FINE_BITS - ebj)
        extra_fine = jnp.where(excess > 0, extra_fine, 0)
        ebj = ebj + extra_fine
        extra_bits = (extra_fine * C) << BITRES
        fpj = jnp.where(excess > 0,
                        (extra_bits >= excess - balance).astype(jnp.int32),
                        fpj)
        excess = excess - extra_bits
        new_balance = jnp.where(is_coded, excess, balance)
        upd = is_coded
        bits = jnp.where(upd[:, None] & (j[None, :] == i[:, None]),
                         bitsj[:, None], bits)
        ebits = jnp.where(upd[:, None] & (j[None, :] == i[:, None]),
                          ebj[:, None], ebits)
        fprio = jnp.where(upd[:, None] & (j[None, :] == i[:, None]),
                          fpj[:, None], fprio)
        return (new_balance, bits, ebits, fprio), None

    ebits = jnp.zeros((S, 21), jnp.int32)
    fprio = jnp.zeros((S, 21), jnp.int32)
    balance = jnp.zeros(S, jnp.int32)
    iis = jnp.arange(start, end, dtype=jnp.int32)
    iis = jnp.broadcast_to(iis[:, None], (iis.shape[0], S))
    (balance, bits, ebits, fprio), _ = lax.scan(
        split_band, (balance, bits, ebits, fprio), iis)

    # skipped bands: all remaining budget becomes fine energy
    skipped = (j[None, :] >= coded_bands[:, None]) & in_range
    eb_sk = (bits >> stereo) >> BITRES
    ebits = jnp.where(skipped, eb_sk, ebits)
    fprio = jnp.where(skipped, (eb_sk < 1).astype(jnp.int32), fprio)
    bits = jnp.where(skipped, 0, bits)

    return AllocResult(pulses=bits, ebits=ebits, fine_priority=fprio,
                       coded_bands=coded_bands, balance=balance,
                       intensity=intensity, dual_stereo=dual_stereo,
                       anti_collapse_rsv=jnp.zeros(S, jnp.int32)), st


# --------------------------------------------------------------- stage 6


def decode_fine(st: ec.EcLanes, active, energy, ebits, *, C: int,
                start: int = 0, end: int = 21):
    """Fine energy: energy (S, C, 21) f32 updated in place per band."""
    def band(carry, i):
        st, e = carry
        fq = jnp.take(ebits, i, axis=1)
        has = active & (fq > 0)
        scale = jnp.exp2(-fq.astype(jnp.float32))
        for c in range(C):
            q2, st = ec.ec_dec_bits(st, jnp.where(has, fq, 0), has)
            corr = (q2.astype(jnp.float32) + 0.5) * scale - 0.5
            e = e.at[:, c, i].set(jnp.where(has, e[:, c, i] + corr,
                                            e[:, c, i]))
        return (st, e), None

    (st, energy), _ = lax.scan(band, (st, energy),
                               jnp.arange(start, end, dtype=jnp.int32))
    return energy, st


def decode_symbols(buf, storage, energy_in, *, C: int, lm: int = 3,
                   start: int = 0, end: int = 21):
    """Stages 1-6 for S packed CELT frames.

    buf (S, L) uint8, storage (S,) i32, energy_in (S, 2, 21) f32 (the
    decoder's old_ebands before this frame).  Returns (hdr, energy,
    tf_res, spread, offsets, trim, alloc, st); the band-tree walk
    (celt_lockstep_walk.decode_bands) continues from st.
    """
    st = ec.ec_init(jnp.asarray(buf, jnp.uint8),
                    jnp.asarray(storage, jnp.int32))
    S = buf.shape[0]
    active = jnp.ones(S, bool)
    hdr, st = decode_header(st, active, lm=lm, start=start)
    e_in = jnp.asarray(energy_in, jnp.float32)
    if C == 1:
        e_in = e_in.at[:, 0, :].set(jnp.maximum(e_in[:, 0, :],
                                                e_in[:, 1, :]))
    energy, st = decode_coarse(st, active, hdr.intra, e_in, C=C, lm=lm,
                               start=start, end=end)
    tf_res, st = decode_tf(st, active, hdr.transient, lm=lm, start=start,
                           end=end)
    spread, offsets, trim, _total_f, st = decode_spread_dynalloc_trim(
        st, active, C=C, lm=lm, start=start, end=end)
    tellf = ec.ec_tell_frac(st)
    bits = ((st.storage * 8) << BITRES) - tellf - 1
    ac_rsv = jnp.where(
        hdr.transient & (lm >= 2) & (bits >= ((lm + 2) << BITRES)),
        1 << BITRES, 0) if lm >= 2 else jnp.zeros(S, jnp.int32)
    bits = bits - ac_rsv
    alloc, st = compute_allocation(st, active, offsets, trim, bits, C=C,
                                   lm=lm, start=start, end=end)
    alloc = alloc._replace(anti_collapse_rsv=ac_rsv)
    energy, st = decode_fine(st, active, energy, alloc.ebits, C=C,
                             start=start, end=end)
    return hdr, energy, tf_res, spread, offsets, trim, alloc, st


def decode_finalise(st: ec.EcLanes, active, energy, ebits, fprio,
                    bits_left, *, C: int, start: int = 0, end: int = 21):
    """unquant_energy_finalise: leftover bits -> half-ulp energy refines."""
    MAX_FINE_BITS = 8

    def one(carry, ip):
        st, e, left = carry
        i, prio = ip[0], ip[1]
        fq = jnp.take(ebits, i, axis=1)
        fp = jnp.take(fprio, i, axis=1)
        eligible = active & (left >= C) & (fq < MAX_FINE_BITS) & (fp == prio)
        scale = jnp.exp2(-(fq.astype(jnp.float32) + 1))
        for c in range(C):
            q2, st = ec.ec_dec_bits(st, jnp.where(eligible, 1, 0), eligible)
            corr = (q2.astype(jnp.float32) - 0.5) * scale
            e = e.at[:, c, i].set(jnp.where(eligible, e[:, c, i] + corr,
                                            e[:, c, i]))
            left = jnp.where(eligible, left - 1, left)
        return (st, e, left), None

    seq = []
    for prio in range(2):
        for i in range(start, end):
            seq.append((i, prio))
    seq = jnp.asarray(seq, jnp.int32)
    (st, energy, bits_left), _ = lax.scan(one, (st, energy, bits_left), seq)
    return energy, st
