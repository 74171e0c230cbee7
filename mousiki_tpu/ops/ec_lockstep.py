"""Lockstep (SIMD-across-streams) range decoder for the TPU.

S independent range decoders advance in lockstep as (S,) vector lanes:
every EC operation is an elementwise update of per-lane state, masked by
an `active` predicate (inactive lanes pass through unchanged). This is
what makes a fully device-side CELT symbol decode possible: the bit
stream is inherently serial WITHIN a stream, but a serving batch carries
hundreds of independent streams, so each sequential symbol step still
does S lanes of useful work on the VPU.

Semantics are bit-exact to the reference range decoder
(reference entdec.rs / entcode.rs; differentially tested against
mousiki_tpu.bitstream.entcode.RangeDecoder in
tests/test_ec_lockstep.py). Notable lockstep adaptations:

- data-dependent loops (normalize, end-window refill, Laplace descent)
  become fixed masked unrolls or `lax.while_loop`s whose trip count is
  the max over lanes (bounds proven from the reference's invariants);
- the icdf linear scan becomes a vectorized count of table entries
  above val (the icdf is non-increasing, so the first-hit index equals
  the count);
- 32-bit integer divisions with a bounded quotient use an exact f32
  path (quotient <= 2^16 makes the f32 estimate within +-1; one masked
  fix-up step lands it) - `_udiv_smallq` - because XLA's u32 division
  emulation on TPU costs ~10x an f32 divide.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import lax

EC_CODE_TOP = jnp.uint32(1 << 31)
EC_CODE_BOT = jnp.uint32(1 << 23)
EC_CODE_EXTRA = 7
EC_SYM_MAX = jnp.uint32(255)
BITRES = 3

_U1 = jnp.uint32(1)
_U0 = jnp.uint32(0)


class EcLanes(NamedTuple):
    """Per-lane range-decoder state ((S,) arrays; buf is (S, L) uint8)."""
    buf: jnp.ndarray          # (S, L) uint8, zero-padded packet bytes
    storage: jnp.ndarray      # (S,) int32 true packet lengths
    offs: jnp.ndarray         # (S,) int32 front read pointer
    end_offs: jnp.ndarray     # (S,) int32 back read count
    end_window: jnp.ndarray   # (S,) uint32
    nend_bits: jnp.ndarray    # (S,) int32
    nbits_total: jnp.ndarray  # (S,) int32
    rng: jnp.ndarray          # (S,) uint32
    val: jnp.ndarray          # (S,) uint32
    rem: jnp.ndarray          # (S,) int32 (last raw byte, pre-shift)
    error: jnp.ndarray        # (S,) bool


def _ilog(v):
    """ec_ilog: 32 - clz(v), 0 for 0. v uint32 -> int32."""
    return jnp.where(v == 0, 0, 32 - lax.clz(v.astype(jnp.uint32))
                     .astype(jnp.int32))


def _udiv_smallq(num, den):
    """Exact floor(num/den) for uint32 num, den >= 1, quotient <= ~2^20.

    f32 rounds num and den to within 2^-24 relative, so the f32 quotient
    is within (1 + 2^-23)-ish of the true ratio; for quotients up to
    ~2^20 the absolute error is < 1 after the -1 bias, and two masked
    +1 fix-ups recover the exact floor. Returns uint32.
    """
    q = (num.astype(jnp.float32) / den.astype(jnp.float32)).astype(jnp.uint32)
    q = jnp.where(q > 0, q - 1, q)           # now q <= true quotient
    r = num - q * den                         # exact in u32 (fits)
    ge = r >= den
    q = jnp.where(ge, q + 1, q)
    r = jnp.where(ge, r - den, r)
    q = jnp.where(r >= den, q + 1, q)
    return q


def _udiv32(num, den):
    """Exact floor(num/den) for full-range uint32 num and den < 2^16:
    schoolbook high/low split into two small-quotient divisions.

    hi16 = num >> 16 has quotient <= 2^16 over den; the remainder-extended
    low half (rem << 16 | low16) < den * 2^16 keeps its quotient <= 2^16
    as well, so both halves use the exact-f32 path. Every CELT ft fits
    den < 2^16 (largest is the Laplace total 32768).
    """
    hi = num >> 16
    lo = num & jnp.uint32(0xFFFF)
    qh = _udiv_smallq(hi, den)
    rh = hi - qh * den
    t = (rh << 16) | lo
    ql = _udiv_smallq(t, den)
    return (qh << 16) + ql


def _read_byte(st: EcLanes, active):
    """Front byte read: returns (byte, new_offs). Past-end reads 0."""
    ok = st.offs < st.storage
    idx = jnp.clip(st.offs, 0, st.buf.shape[1] - 1)
    b = jnp.take_along_axis(st.buf, idx[:, None], axis=1)[:, 0]
    b = jnp.where(ok, b.astype(jnp.int32), 0)
    offs = jnp.where(active & ok, st.offs + 1, st.offs)
    return jnp.where(active, b, 0), offs


def _read_byte_from_end(st: EcLanes, active, end_offs):
    """Back byte read at (storage - 1 - end_offs); past-end reads 0."""
    ok = end_offs < st.storage
    idx = jnp.clip(st.storage - 1 - end_offs, 0, st.buf.shape[1] - 1)
    b = jnp.take_along_axis(st.buf, idx[:, None], axis=1)[:, 0]
    b = jnp.where(ok & active, b.astype(jnp.uint32), _U0)
    new_end = jnp.where(active & ok, end_offs + 1, end_offs)
    return b, new_end


def _normalize(st: EcLanes, active) -> EcLanes:
    """while rng <= 2^23: shift in a (bit-reversed-carry) byte.

    Unrolled 3x: every decode op leaves rng >= 2^7 (the smallest
    post-update range is ext >= rng >> 15 with rng > 2^23), and three
    byte shifts take 2^7 past 2^23.
    """
    rng, val, rem, offs, nbt = st.rng, st.val, st.rem, st.offs, st.nbits_total
    for _ in range(3):
        need = active & (rng <= EC_CODE_BOT)
        tmp = EcLanes(st.buf, st.storage, offs, st.end_offs, st.end_window,
                      st.nend_bits, nbt, rng, val, rem, st.error)
        b, offs2 = _read_byte(tmp, need)
        sym = ((rem << 8) | b) >> 1
        val2 = ((val << 8) + (EC_SYM_MAX & ~sym.astype(jnp.uint32))) \
            & jnp.uint32(0x7FFFFFFF)
        rng = jnp.where(need, rng << 8, rng)
        nbt = jnp.where(need, nbt + 8, nbt)
        val = jnp.where(need, val2, val)
        rem = jnp.where(need, b, rem)
        offs = offs2
    return EcLanes(st.buf, st.storage, offs, st.end_offs, st.end_window,
                   st.nend_bits, nbt, rng, val, rem, st.error)


def ec_init(buf, storage) -> EcLanes:
    """buf: (S, L) uint8 padded packets; storage: (S,) int32 lengths."""
    S = buf.shape[0]
    z32 = jnp.zeros(S, jnp.int32)
    st = EcLanes(buf=buf, storage=storage.astype(jnp.int32), offs=z32,
                 end_offs=z32, end_window=jnp.zeros(S, jnp.uint32),
                 nend_bits=z32, nbits_total=jnp.full(S, 33 - 24, jnp.int32),
                 rng=jnp.full(S, 1 << 7, jnp.uint32),
                 val=jnp.zeros(S, jnp.uint32), rem=z32,
                 error=jnp.zeros(S, bool))
    act = jnp.ones(S, bool)
    b, offs = _read_byte(st, act)
    st = st._replace(offs=offs, rem=b,
                     val=st.rng - 1 - (b >> 1).astype(jnp.uint32))
    return _normalize(st, act)


def ec_tell(st: EcLanes):
    return st.nbits_total - _ilog(st.rng)


def ec_tell_frac(st: EcLanes):
    nbits = (st.nbits_total << BITRES).astype(jnp.uint32)
    l = _ilog(st.rng)
    r = st.rng >> (l - 16).astype(jnp.uint32)
    for _ in range(BITRES):
        r = (r * r) >> 15
        b = (r >> 16).astype(jnp.int32)
        l = (l << 1) | b
        r = r >> b.astype(jnp.uint32)
    return (nbits - l.astype(jnp.uint32)).astype(jnp.int32)


def ec_decode(st: EcLanes, ft, active):
    """Returns (fs, ext). ft (S,) uint32, 2 <= ft < 2^16 (CELT invariant:
    the largest ft any call site uses is the Laplace total 32768)."""
    ftc = jnp.maximum(ft.astype(jnp.uint32), _U1)
    ext = _udiv32(st.rng, ftc)                 # quotient up to 2^30
    s = _udiv_smallq(st.val, jnp.maximum(ext, _U1))  # quotient < ft <= 2^16
    fs = ftc - jnp.minimum(s + 1, ftc)
    return jnp.where(active, fs, _U0), ext


def ec_decode_bin(st: EcLanes, bits, active):
    ext = st.rng >> jnp.asarray(bits, jnp.uint32)
    s = _udiv_smallq(st.val, jnp.maximum(ext, _U1))  # quotient < 2^bits
    ftb = (_U1 << jnp.asarray(bits, jnp.uint32))
    fs = ftb - jnp.minimum(s + 1, ftb)
    return jnp.where(active, fs, _U0), ext


def ec_dec_update(st: EcLanes, ext, fl, fh, ft, active) -> EcLanes:
    fl = fl.astype(jnp.uint32)
    fh = fh.astype(jnp.uint32)
    ft = ft.astype(jnp.uint32)
    s = ext * (ft - fh)
    val = st.val - s
    rng = jnp.where(fl > 0, ext * (fh - fl), st.rng - s)
    st = st._replace(val=jnp.where(active, val, st.val),
                     rng=jnp.where(active, rng, st.rng))
    return _normalize(st, active)


def ec_dec_bit_logp(st: EcLanes, logp: int, active):
    r = st.rng
    s = r >> jnp.uint32(logp)
    ret = st.val < s
    val = jnp.where(ret, st.val, st.val - s)
    rng = jnp.where(ret, s, r - s)
    st = st._replace(val=jnp.where(active, val, st.val),
                     rng=jnp.where(active, rng, st.rng))
    return jnp.where(active, ret, False), _normalize(st, active)


def ec_dec_bit_logp_var(st: EcLanes, logp, active):
    """ec_dec_bit_logp with a per-lane logp (S,) int32."""
    r = st.rng
    s = r >> jnp.asarray(logp, jnp.int32).astype(jnp.uint32)
    ret = st.val < s
    val = jnp.where(ret, st.val, st.val - s)
    rng = jnp.where(ret, s, r - s)
    st = st._replace(val=jnp.where(active, val, st.val),
                     rng=jnp.where(active, rng, st.rng))
    return jnp.where(active, ret, False), _normalize(st, active)


def ec_dec_icdf(st: EcLanes, icdf, ftb: int, active):
    """icdf: shared (n,) uint table (non-increasing). Returns (ret, st)."""
    tab = jnp.asarray(icdf, jnp.uint32)
    r = st.rng >> jnp.uint32(ftb)
    sj = r[:, None] * tab[None, :]                       # (S, n)
    ret = jnp.sum((st.val[:, None] < sj).astype(jnp.int32), axis=1)
    n = tab.shape[0]
    retc = jnp.clip(ret, 0, n - 1)
    s = r * tab[retc]
    t = jnp.where(ret > 0, r * tab[jnp.clip(ret - 1, 0, n - 1)], st.rng)
    st = st._replace(val=jnp.where(active, st.val - s, st.val),
                     rng=jnp.where(active, t - s, st.rng))
    return jnp.where(active, ret, 0), _normalize(st, active)


def ec_dec_bits(st: EcLanes, bits, active):
    """Raw bits from the buffer tail. bits (S,) int32 (0 allowed)."""
    bits = jnp.asarray(bits, jnp.int32)
    window, avail, end_offs = st.end_window, st.nend_bits, st.end_offs
    refill = active & (avail < bits)
    for _ in range(4):
        b, end_offs = _read_byte_from_end(st, refill, end_offs)
        window = jnp.where(refill, window | (b << avail.astype(jnp.uint32)),
                           window)
        avail = jnp.where(refill, avail + 8, avail)
        refill = refill & (avail <= 24)
    bu = bits.astype(jnp.uint32)
    ret = window & ((_U1 << bu) - 1)
    ret = jnp.where(bits > 0, ret, _U0)
    window = jnp.where(active, window >> bu, window)
    avail = jnp.where(active, avail - bits, avail)
    st = st._replace(
        end_window=window, nend_bits=avail, end_offs=end_offs,
        nbits_total=jnp.where(active, st.nbits_total + bits,
                              st.nbits_total))
    return jnp.where(active, ret, _U0), st


def ec_dec_uint(st: EcLanes, ft, active):
    """Uniform decode, ft (S,) uint32 >= 2. Returns (t, st)."""
    ftm = ft.astype(jnp.uint32) - 1
    ftb = _ilog(ftm)
    big = ftb > 8
    # big path: high bits by range coder, low ftb-8 bits raw
    ftb_hi = jnp.where(big, ftb - 8, 0).astype(jnp.uint32)
    ft_hi = (ftm >> ftb_hi) + 1
    fs_hi, ext = ec_decode(st, ft_hi, active & big)
    st1 = ec_dec_update(st, ext, fs_hi, fs_hi + 1, ft_hi, active & big)
    lo, st1 = ec_dec_bits(st1, jnp.where(big, ftb_hi.astype(jnp.int32), 0),
                          active & big)
    t_big = (fs_hi << ftb_hi) | lo
    err = active & big & (t_big > ftm)
    t_big = jnp.where(err, ftm, t_big)
    # small path
    fs_s, ext_s = ec_decode(st1, ftm + 1, active & ~big)
    st2 = ec_dec_update(st1, ext_s, fs_s, fs_s + 1, ftm + 1, active & ~big)
    st2 = st2._replace(error=st2.error | err)
    return jnp.where(big, t_big, fs_s), st2


def ec_laplace_decode(st: EcLanes, fs0, decay, active):
    """Laplace-coded value (coarse energy). fs0/decay (S,) uint32/int32."""
    fs0 = fs0.astype(jnp.uint32)
    decay = decay.astype(jnp.uint32)
    fm, ext = ec_decode_bin(st, 15, active)
    val = jnp.zeros_like(fm, jnp.int32)
    fl = jnp.zeros_like(fm)
    fs = fs0

    big = active & (fm >= fs0)
    val = jnp.where(big, 1, val)
    fl = jnp.where(big, fs0, fl)
    fs = jnp.where(big,
                   (((jnp.uint32(32768 - 32) - fs0) * (16384 - decay))
                    >> 15) + 1, fs)

    def cond(c):
        fl_, fs_, val_, act_ = c
        return jnp.any(act_ & (fs_ > 1) & (fm >= fl_ + 2 * fs_))

    def body(c):
        fl_, fs_, val_, act_ = c
        go = act_ & (fs_ > 1) & (fm >= fl_ + 2 * fs_)
        fs2 = jnp.where(go, fs_ * 2, fs_)
        fl2 = jnp.where(go, fl_ + fs2, fl_)
        fs3 = jnp.where(go, (((fs2 - 2) * decay) >> 15) + 1, fs2)
        val2 = jnp.where(go, val_ + 1, val_)
        return (fl2, fs3, val2, act_)

    fl, fs, val, _ = lax.while_loop(cond, body, (fl, fs, val, big))

    tiny = big & (fs <= 1)
    di = jnp.where(tiny, (fm - fl) >> 1, _U0)
    val = jnp.where(tiny, val + di.astype(jnp.int32), val)
    fl = jnp.where(tiny, fl + 2 * di, fl)

    neg = big & (fm < fl + fs)
    val = jnp.where(big, jnp.where(neg, -val, val), val)
    fl = jnp.where(big & ~neg, fl + fs, fl)

    fh = jnp.minimum(fl + fs, jnp.uint32(32768))
    st = ec_dec_update(st, ext, fl, fh, jnp.full_like(fl, 32768), active)
    return jnp.where(active, val, 0), st
