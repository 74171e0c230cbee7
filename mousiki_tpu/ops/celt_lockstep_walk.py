"""Lockstep device-side CELT band-tree walk (stage 7): the symbol side of
`bands.quant_all_bands` (decode) for S streams as masked vector lanes.

The band/partition recursion of the reference (`src/celt/bands.rs`
quant_all_bands:2575, quant_partition, compute_theta:274) is data-dependent
per stream, so it runs here as a lockstep *interpreter*: every lane owns a
tiny DFS stack over a static per-band "heap" of candidate split nodes
(node id 1 = band root, children 2n/2n+1), and each interpreter iteration
executes at most one entropy op per lane — a theta (triangular or uniform
pdf), a PVQ CWRS index (ec_dec_uint with the exact V(N,K) total), an
intensity inv flag — with per-lane parameters.  Divergent traversal order
(mid-first vs side-first by the rebalance rule) is a per-lane register; the
static heap ids make the *emission* order-independent.

The walk only consumes symbols and integer state; all signal math is
emitted as plan planes (pass 2 in this file) for the existing batched
executor `ops/band_exec_jax.execute_packed`.  Collapse masks, fold/noise
windows and the LCG seed chain are resolved in pass 2 from the decoded
pulse vectors (they never feed back into the symbol stream).

Scope: the canonical 48 kHz mode, LM = 3 (20 ms), start=0, end=21, mono or
stereo.  All 21 bands have N >= 8 at LM 3, so the band-level N==2 stereo
butterfly and N==1 paths never arise here (they exist only for LM < 3).
"""

from __future__ import annotations

from functools import lru_cache
from typing import NamedTuple

import numpy as np

import jax.numpy as jnp
from jax import lax

from ..celt.modes import BITRES, QTHETA_OFFSET, opus_custom_mode
from . import ec_lockstep as ec
from .celt_lockstep import _tables

_EXP2_TABLE8 = np.array([16384, 17866, 19483, 21247, 23170, 25267, 27554,
                         30048], np.int32)

DEPTH_MAX = 8          # lane DFS stack depth (band frame + 5 tree levels)
KIND_TREE = 0
KIND_SBAND = 1         # stereo joint band frame (two quant_band calls)
KIND_DBAND = 2         # dual-stereo band frame
PH_ENTER = 0
PH_MID = 1
PH_DONE = 2


class WalkLayout(NamedTuple):
    """Static per-(lm) node heap layout (numpy, trace-time constants)."""
    nslot: int                  # nodes per channel tree
    base: np.ndarray            # (21,) first slot of each band
    nnodes: np.ndarray          # (21,) node count per band
    dmax: np.ndarray            # (21,)
    s_band: np.ndarray          # (nslot,)
    s_depth: np.ndarray
    s_n: np.ndarray             # node width in coeffs
    s_off: np.ndarray           # offset within band
    s_lm: np.ndarray            # LM at node
    s_thr: np.ndarray           # split threshold cache[cache[0]] + 12
    s_ck: np.ndarray            # pulse-cache row length K
    s_cbits: np.ndarray         # (nslot, 41) pulse-cache bits row
    s_pcap_c: np.ndarray        # child pulse_cap = logN + (lm-1)*8
    s_off_c: np.ndarray         # child theta offset


NPB = 32  # padded slots per band: heap ids 1..31 at slot band*32 + nid-1


@lru_cache(maxsize=4)
def walk_layout(lm: int) -> WalkLayout:
    """Padded layout: every band gets NPB node slots (index = nid-1), so
    the plan-emission pass can scan over bands with ONE compiled body."""
    tb = _tables(lm, 1)
    nb = 21
    N = tb.nbands
    log_n = tb.log_n
    dmax = np.zeros(nb, np.int32)
    for i in range(nb):
        d = 0
        while d + 1 <= lm + 1 and (int(N[i]) >> d) > 2:
            d += 1
        dmax[i] = d
    nnodes = (1 << (dmax + 1)) - 1
    base = (NPB * np.arange(nb)).astype(np.int32)
    nslot = NPB * nb
    s_band = np.repeat(np.arange(nb, dtype=np.int32), NPB)
    s_depth = np.zeros(nslot, np.int32)
    s_n = np.zeros(nslot, np.int32)
    s_off = np.zeros(nslot, np.int32)
    for i in range(nb):
        for nid in range(1, NPB):
            sl = NPB * i + nid - 1
            d = nid.bit_length() - 1
            pos = nid - (1 << d)
            s_depth[sl] = d
            s_n[sl] = max(int(N[i]) >> d, 0) if d <= 4 else 0
            s_off[sl] = pos * max(int(N[i]) >> d, 0)
    s_lm = (lm - s_depth).astype(np.int32)
    rows = np.clip(s_lm + 1, 0, 4)
    s_ck = tb.cache_k[rows, s_band]
    s_cbits = tb.cache_bits[rows, s_band]          # (nslot, 41)
    s_thr = s_cbits[np.arange(nslot), s_ck] + 12
    pcap_c = log_n[s_band] + (s_lm - 1) * (1 << BITRES)
    s_off_c = (pcap_c >> 1) - QTHETA_OFFSET
    return WalkLayout(nslot=nslot, base=base, nnodes=nnodes, dmax=dmax,
                      s_band=s_band, s_depth=s_depth, s_n=s_n, s_off=s_off,
                      s_lm=s_lm, s_thr=s_thr, s_ck=s_ck, s_cbits=s_cbits,
                      s_pcap_c=pcap_c, s_off_c=s_off_c)


# ------------------------------------------------------------ int helpers

def _frac_mul16(a, b):
    return (16384 + a * b) >> 15


def _bitexact_cos(x):
    tmp = (4096 + x * x) >> 13
    x2 = tmp
    x2 = (32767 - x2) + _frac_mul16(
        x2, -7651 + _frac_mul16(x2, 8277 + _frac_mul16(-626, x2)))
    return 1 + x2


def _ilog_pos(v):
    """bit_length of positive int32 (0 -> 0)."""
    return ec._ilog(v.astype(jnp.uint32))


def _bitexact_log2tan(isin, icos):
    lc = _ilog_pos(icos)
    ls = _ilog_pos(isin)
    icos = icos << (15 - lc).astype(jnp.uint32)
    isin = isin << (15 - ls).astype(jnp.uint32)
    return ((ls - lc) * (1 << 11)
            + _frac_mul16(isin, _frac_mul16(isin, -2597) + 7932)
            - _frac_mul16(icos, _frac_mul16(icos, -2597) + 7932))


def _isqrt(x):
    """Exact floor(sqrt(x)) for 0 <= x < 2^24 (f32-exact range)."""
    s = jnp.sqrt(x.astype(jnp.float32)).astype(jnp.int32)
    s = jnp.where((s + 1) * (s + 1) <= x, s + 1, s)
    s = jnp.where(s * s > x, s - 1, s)
    return s


def _tdiv(num, den):
    """C-style trunc division, num any sign, den > 0 (small values)."""
    q = jnp.abs(num) // den
    return jnp.where(num < 0, -q, q)


def _compute_qn(N, b, offset, pulse_cap, stereo_n2):
    n2 = 2 * N - 1 - jnp.where(stereo_n2, 1, 0)
    qb = _tdiv(b + n2 * offset, n2)
    qb = jnp.minimum(qb, b - pulse_cap - (4 << BITRES))
    qb = jnp.minimum(qb, 8 << BITRES)
    tab = jnp.asarray(_EXP2_TABLE8)
    qn = tab[jnp.clip(qb & 7, 0, 7)] >> jnp.clip(14 - (qb >> 3), 0, 31) \
        .astype(jnp.uint32)
    qn = ((qn + 1) >> 1) << 1
    return jnp.where(qb < (1 << BITRES >> 1), 1, qn)


def _dec_theta_shaped(st, qn_tri, want_tri, qn_two, want_two):
    """Shaped-pdf theta decodes sharing ONE range decode + update.

    - triangular pdf (mono split, long blocks: quant_partition B0 == 1)
    - two-row pdf p0=3 (stereo band theta, N > 2: compute_theta
      `stereo and N > 2` branch)
    Lane sets are disjoint; per-lane ft/fl/fh select the pdf.
    """
    active = want_tri | want_two
    # triangular params
    half = qn_tri >> 1
    ft_tri = (half + 1) * (half + 1)
    # two-row params
    x0 = qn_two >> 1
    ft_two = 3 * (x0 + 1) + x0
    ft = jnp.where(want_two, ft_two, ft_tri).astype(jnp.uint32)
    fm, ext = ec.ec_decode(st, jnp.maximum(ft, 2), active)
    fm_i = fm.astype(jnp.int32)
    # triangular resolve
    ft_i = ft_tri
    low_thr = (half * (half + 1)) >> 1
    is_lo = fm_i < low_thr
    it_lo = (_isqrt(8 * fm_i + 1) - 1) >> 1
    it_hi = (2 * (qn_tri + 1) - _isqrt(8 * (ft_i - fm_i - 1) + 1)) >> 1
    it_t = jnp.where(is_lo, it_lo, it_hi)
    fs_t = jnp.where(is_lo, it_t + 1, qn_tri + 1 - it_t)
    fl_t = jnp.where(is_lo, (it_t * (it_t + 1)) >> 1,
                     ft_i - (((qn_tri + 1 - it_t)
                              * (qn_tri + 2 - it_t)) >> 1))
    # two-row resolve
    lo2 = fm_i < (x0 + 1) * 3
    x_2 = jnp.where(lo2, _tdiv(fm_i, 3), x0 + 1 + (fm_i - (x0 + 1) * 3))
    fl_2 = jnp.where(x_2 <= x0, 3 * x_2, (x_2 - 1 - x0) + (x0 + 1) * 3)
    fh_2 = jnp.where(x_2 <= x0, 3 * (x_2 + 1), (x_2 - x0) + (x0 + 1) * 3)
    itheta = jnp.where(want_two, x_2, it_t)
    fl = jnp.where(want_two, fl_2, fl_t)
    fh = jnp.where(want_two, fh_2, fl_t + fs_t)
    st = ec.ec_dec_update(st, ext, fl.astype(jnp.uint32),
                          fh.astype(jnp.uint32), ft, active)
    return jnp.where(active, itheta, 0), st


def _theta_geometry(itheta14, n_child):
    """imid/iside/delta from a q14 theta (compute_theta tail)."""
    imid = jnp.where(itheta14 == 0, 32767,
                     jnp.where(itheta14 == 16384, 0,
                               _bitexact_cos(itheta14)))
    iside = jnp.where(itheta14 == 0, 0,
                      jnp.where(itheta14 == 16384, 32767,
                                _bitexact_cos(16384 - itheta14)))
    mid_edge = (itheta14 == 0) | (itheta14 == 16384)
    delta_mid = jnp.where(itheta14 == 0, -16384, 16384)
    delta = jnp.where(
        mid_edge, delta_mid,
        _frac_mul16((n_child - 1) << 7, _bitexact_log2tan(iside, imid)))
    return imid, iside, delta


class WalkCarry(NamedTuple):
    st: ec.EcLanes
    done: jnp.ndarray        # (S,)
    ib: jnp.ndarray          # next band to enter
    sp: jnp.ndarray          # stack pointer
    balance: jnp.ndarray
    rem: jnp.ndarray         # ctx.remaining_bits
    tell_prev: jnp.ndarray   # tell_frac at previous band entry
    fillcnt: jnp.ndarray     # running fill-leaf counter (seed ranks)
    dual: jnp.ndarray        # current dual_stereo flag (can drop to 0)
    # stack planes (S, DEPTH_MAX)
    f_kind: jnp.ndarray
    f_ch: jnp.ndarray
    f_nid: jnp.ndarray
    f_phase: jnp.ndarray
    f_b: jnp.ndarray         # ENTER: node budget
    f_gain: jnp.ndarray
    f_itheta: jnp.ndarray
    f_first_x: jnp.ndarray   # bool: first child is X/mid
    f_b1: jnp.ndarray        # first child's bits
    f_b2: jnp.ndarray        # second child's base bits
    f_g2: jnp.ndarray        # second child's gain
    f_rb: jnp.ndarray        # remaining_bits mark after qalloc


class WalkEmit(NamedTuple):
    """Per-iteration emission record (stacked by lax.scan)."""
    slot: jnp.ndarray       # global tree slot (ch*nslot + local), -1 none
    split: jnp.ndarray      # bool
    itheta: jnp.ndarray     # split theta q14
    k: jnp.ndarray          # leaf pulse count K (0 => fill leaf)
    idx: jnp.ndarray        # u32 CWRS index
    gain: jnp.ndarray       # f32 leaf gain
    rank: jnp.ndarray       # fill visit rank, -1 none
    band: jnp.ndarray       # band record index, -1 none
    b_band: jnp.ndarray     # band bit budget b
    btheta: jnp.ndarray     # stereo band theta q14 (-1 mono/dual)
    binv: jnp.ndarray       # stereo inv flag


def _set_top(arr, sp, val, mask):
    """arr (S,D); write val at column sp-? for masked lanes."""
    D = arr.shape[1]
    cols = jnp.arange(D, dtype=jnp.int32)[None, :]
    sel = (cols == sp[:, None]) & mask[:, None]
    return jnp.where(sel, val[:, None] if val.ndim == 1 else val, arr)


def _get_at(arr, idx):
    return jnp.take_along_axis(arr, jnp.clip(idx, 0, arr.shape[1] - 1)
                               [:, None], axis=1)[:, 0]


def walk_bands(st: ec.EcLanes, active, *, C: int, lm: int,
               transient, tf_res, spread, alloc, total_bits_frac,
               disable_inv, n_iter: int, start: int = 0, end: int = 21):
    """Run the interpreter; returns (emits stacked (T, S, ...), st, ok).

    total_bits_frac: (S,) = storage*8*8 - anti_collapse_rsv (the
    quant_all_bands total_bits argument).
    """
    lay = walk_layout(lm)
    tb = _tables(lm, C)
    S = st.rng.shape[0]
    nsl = lay.nslot
    sband = jnp.asarray(lay.s_band)
    sdep = jnp.asarray(lay.s_depth)
    s_n = jnp.asarray(lay.s_n)
    s_lm = jnp.asarray(lay.s_lm)
    s_thr = jnp.asarray(lay.s_thr)
    s_ck = jnp.asarray(lay.s_ck)
    s_cb = jnp.asarray(lay.s_cbits)
    s_pcapc = jnp.asarray(lay.s_pcap_c)
    s_offc = jnp.asarray(lay.s_off_c)
    basev = jnp.asarray(lay.base)
    nbv = jnp.asarray(tb.nbands)
    log_n = jnp.asarray(tb.log_n)
    gp = jnp.asarray(tb.get_pulses)
    vt = jnp.asarray(tb.vtab)
    M = 1 << lm

    pulses = alloc.pulses
    coded = alloc.coded_bands
    intensity = alloc.intensity

    # per-band per-lane B at the partition root (post pre-transforms)
    # B_entry = transient ? M : 1; recombine = max(tf,0); B >>= recombine;
    # N_B = (N/B_entry) << recombine; while even(N_B) && tf<0: B<<=1,N_B>>=1
    tfm = tf_res                                     # (S, 21)
    b_ent = jnp.where(transient[:, None], M, 1)
    recomb = jnp.maximum(tfm, 0)
    Bq = b_ent >> recomb.astype(jnp.uint32)
    NBq = (nbv[None, :] // jnp.maximum(b_ent, 1)) << recomb.astype(jnp.uint32)
    tfq = tfm
    for _ in range(3):
        go = ((NBq & 1) == 0) & (tfq < 0)
        Bq = jnp.where(go, Bq << 1, Bq)
        NBq = jnp.where(go, NBq >> 1, NBq)
        tfq = jnp.where(go, tfq + 1, tfq)
    band_bp = Bq                                     # (S, 21)

    z = jnp.zeros(S, jnp.int32)
    zf = jnp.zeros(S, jnp.float32)
    zb = jnp.zeros(S, bool)
    zD = jnp.zeros((S, DEPTH_MAX), jnp.int32)
    zDf = jnp.zeros((S, DEPTH_MAX), jnp.float32)
    zDb = jnp.zeros((S, DEPTH_MAX), bool)

    carry0 = WalkCarry(
        st=st, done=~active, ib=z + start, sp=z, balance=alloc.balance,
        rem=z, tell_prev=z, fillcnt=z, dual=alloc.dual_stereo,
        f_kind=zD, f_ch=zD, f_nid=zD, f_phase=zD, f_b=zD, f_gain=zDf,
        f_itheta=zD, f_first_x=zDb, f_b1=zD, f_b2=zD, f_g2=zDf, f_rb=zD)

    def step(carry: WalkCarry, _):
        st = carry.st
        sp = carry.sp
        done = carry.done | (carry.ib >= end) & (sp == 0)
        live = ~done
        is_band = live & (sp == 0)
        is_node = live & (sp > 0)

        tellf = ec.ec_tell_frac(st)

        # ---------------- band entry (no stack yet) --------------------
        ib = carry.ib
        ibc = jnp.clip(ib, 0, 20)
        prev_p = jnp.take_along_axis(pulses,
                                     jnp.clip(ib - 1, 0, 20)[:, None],
                                     axis=1)[:, 0]
        balance = jnp.where(is_band & (ib > start),
                            carry.balance + prev_p + carry.tell_prev,
                            carry.balance)
        balance = jnp.where(is_band & (ib != start), balance - tellf,
                            balance)
        remaining = total_bits_frac - tellf - 1
        den = jnp.minimum(3, coded - ib)
        curr_bal = _tdiv(balance, jnp.maximum(den, 1))
        p_i = jnp.take_along_axis(pulses, ibc[:, None], axis=1)[:, 0]
        b_band = jnp.clip(jnp.minimum(remaining + 1, p_i + curr_bal),
                          0, 16383)
        b_band = jnp.where(ib <= coded - 1, b_band, 0)
        n_band = nbv[ibc]
        # dual-stereo drop at the intensity band
        dual = jnp.where(is_band & (carry.dual == 1) & (ib == intensity),
                         0, carry.dual)

        # stereo band theta (joint stereo only)
        if C == 2:
            joint = is_band & (dual == 0)
            pcap_b = log_n[ibc] + lm * (1 << BITRES)
            off_b = (pcap_b >> 1) - QTHETA_OFFSET
            qn_b = _compute_qn(n_band, b_band, off_b, pcap_b, zb)
            qn_b = jnp.where(ib >= intensity, 1, qn_b)
            want_theta_b = joint & (qn_b != 1)
            want_inv = joint & (qn_b == 1) & (b_band > (2 << BITRES)) \
                & (remaining > (2 << BITRES))
        else:
            joint = jnp.zeros(S, bool)
            qn_b = jnp.ones(S, jnp.int32)
            want_theta_b = zb
            want_inv = zb

        # ---------------- node entry ------------------------------------
        spt = jnp.maximum(sp - 1, 0)
        kind = _get_at(carry.f_kind, spt)
        ch = _get_at(carry.f_ch, spt)
        nid = _get_at(carry.f_nid, spt)
        b_node = _get_at(carry.f_b, spt)
        gain = _get_at(carry.f_gain, spt)
        is_tree = is_node & (kind == KIND_TREE)
        # frames belong to band ib-1 (BAND_ENTER increments ib at push)
        fband = jnp.clip(ib - 1, 0, 20)
        slot_l = jnp.clip(basev[fband] + nid - 1, 0, nsl - 1)
        n_node = s_n[slot_l]
        depth = sdep[slot_l]
        lm_node = s_lm[slot_l]
        thr = s_thr[slot_l]
        bp = jnp.take_along_axis(band_bp, fband[:, None], axis=1)[:, 0]
        B0n = (bp + (1 << depth).astype(bp.dtype) - 1) >> depth.astype(
            jnp.uint32)
        can_split = is_tree & (lm_node != -1) & (b_node > thr) & (n_node > 2)

        # split: child theta
        n_child = n_node >> 1
        qn_n = _compute_qn(n_child, b_node, s_offc[slot_l],
                           s_pcapc[slot_l], zb)
        want_tri = can_split & (B0n <= 1) & (qn_n != 1)
        want_uint_n = can_split & (B0n > 1) & (qn_n != 1)

        # leaf: bits -> pseudo-pulses (binary search on the cache row)
        is_leaf = is_tree & ~can_split
        bm1 = b_node - 1
        loq = z
        hiq = s_ck[slot_l]
        for _ in range(6):
            midq = (loq + hiq + 1) >> 1
            cbm = s_cb[slot_l, jnp.clip(midq, 0, 40)]
            ge = cbm >= bm1
            hiq = jnp.where(ge, midq, hiq)
            loq = jnp.where(ge, loq, midq)
        lo_val = jnp.where(loq == 0, -1, s_cb[slot_l, jnp.clip(loq, 0, 40)])
        hi_val = s_cb[slot_l, jnp.clip(hiq, 0, 40)]
        q0 = jnp.where(bm1 - lo_val <= hi_val - bm1, loq, hiq)
        q0 = jnp.where((b_node <= 0) | (s_ck[slot_l] == 0), 0, q0)

        # ---------------- EC unit: shaped theta (tri / two-row) ---------
        tell0 = tellf
        it_shaped, st = _dec_theta_shaped(st, qn_n, want_tri,
                                          qn_b, want_theta_b)
        it_tri = it_shaped

        # ---------------- EC unit: uniform uint -------------------------
        # lanes: split theta (short blocks), stereo band theta, PVQ index
        # (the PVQ budget/K lowering must run first for leaf lanes)
        curr_bits = jnp.where(q0 > 0, s_cb[slot_l, jnp.clip(q0, 0, 40)] + 1,
                              0)
        rem1 = jnp.where(is_leaf, carry.rem - curr_bits, carry.rem)

        def low_cond(c):
            remc, qc, cbc = c
            return jnp.any(is_leaf & (remc < 0) & (qc > 0))

        def low_body(c):
            remc, qc, cbc = c
            m = is_leaf & (remc < 0) & (qc > 0)
            remc = jnp.where(m, remc + cbc, remc)
            qc = jnp.where(m, qc - 1, qc)
            cb2 = jnp.where(qc > 0, s_cb[slot_l, jnp.clip(qc, 0, 40)] + 1,
                            0)
            cbc = jnp.where(m, cb2, cbc)
            remc = jnp.where(m, remc - cbc, remc)
            return (remc, qc, cbc)

        rem1, q1, curr_bits = lax.while_loop(
            low_cond, low_body, (rem1, q0, curr_bits))
        K = gp[jnp.clip(q1, 0, 40)]
        is_pvq = is_leaf & (K > 0)
        vft = vt[jnp.clip(n_node, 0, 209), jnp.clip(K, 0, 129)]

        want_uint = want_uint_n | is_pvq
        uft = jnp.where(is_pvq, vft.astype(jnp.uint32),
                        (qn_n + 1).astype(jnp.uint32))
        uval, st = ec.ec_dec_uint(st, jnp.maximum(uft, 2), want_uint)
        uval = uval.astype(jnp.int32)

        # ---------------- EC unit: bit_logp(2) (stereo inv) -------------
        invb, st = ec.ec_dec_bit_logp(st, 2, want_inv)
        invb = invb & ~disable_inv

        tellf2 = ec.ec_tell_frac(st)
        qalloc = tellf2 - tell0

        # ---------------- post: band entry pushes -----------------------
        sp_n = sp
        f_kind, f_ch, f_nid, f_phase = (carry.f_kind, carry.f_ch,
                                        carry.f_nid, carry.f_phase)
        f_b, f_gain, f_itheta = carry.f_b, carry.f_gain, carry.f_itheta
        f_first_x, f_b1, f_b2 = carry.f_first_x, carry.f_b1, carry.f_b2
        f_g2, f_rb = carry.f_g2, carry.f_rb

        rem_band = remaining
        if C == 2:
            it_b = jnp.where(want_theta_b,
                             _tdiv(it_shaped * 16384, jnp.maximum(qn_b, 1)),
                             0)
            b_post = jnp.where(joint, b_band - qalloc, b_band)
            imid_b, iside_b, delta_b = _theta_geometry(it_b, n_band)
            mb = jnp.maximum(0, jnp.minimum(b_post,
                                            (b_post - delta_b) >> 1))
            sb = b_post - mb
            first_x_b = mb >= sb
            mid_f = imid_b.astype(jnp.float32) / 32768.0
            side_f = iside_b.astype(jnp.float32) / 32768.0
            rem_band = jnp.where(joint, remaining - qalloc, remaining)
            # dual: both children get b//2, no rebalance
            db = b_band >> 1
            # band frame (kind1/2) at sp, first tree root at sp+1
            push_band2 = is_band & (dual == 0) & True
            push_dual = is_band & (dual == 1)
            bf_kind = jnp.where(push_dual, KIND_DBAND, KIND_SBAND)
            bf_itheta = it_b
            bf_first_x = jnp.where(push_dual, True, first_x_b)
            bf_b1 = jnp.where(push_dual, db, jnp.where(first_x_b, mb, sb))
            bf_b2 = jnp.where(push_dual, db, jnp.where(first_x_b, sb, mb))
            bf_g2 = jnp.where(push_dual, 1.0,
                              jnp.where(first_x_b, side_f, 1.0))
            root_gain = jnp.where(push_dual, 1.0,
                                  jnp.where(first_x_b, 1.0, side_f))
            root_ch = jnp.where(push_dual, 0,
                                jnp.where(first_x_b, 0, 1))
            any_band_push = is_band
            f_kind = _set_top(f_kind, sp, bf_kind, any_band_push)
            f_phase = _set_top(f_phase, sp, z + PH_MID, any_band_push)
            f_itheta = _set_top(f_itheta, sp, bf_itheta, any_band_push)
            f_first_x = _set_top(f_first_x, sp, bf_first_x, any_band_push)
            f_b1 = _set_top(f_b1, sp, bf_b1, any_band_push)
            f_b2 = _set_top(f_b2, sp, bf_b2, any_band_push)
            f_g2 = _set_top(f_g2, sp, bf_g2, any_band_push)
            f_rb = _set_top(f_rb, sp, rem_band, any_band_push)
            f_kind = _set_top(f_kind, sp + 1, z + KIND_TREE, any_band_push)
            f_ch = _set_top(f_ch, sp + 1, root_ch, any_band_push)
            f_nid = _set_top(f_nid, sp + 1, z + 1, any_band_push)
            f_phase = _set_top(f_phase, sp + 1, z + PH_ENTER, any_band_push)
            f_b = _set_top(f_b, sp + 1, bf_b1, any_band_push)
            f_gain = _set_top(f_gain, sp + 1, root_gain, any_band_push)
            sp_n = jnp.where(is_band, sp + 2, sp_n)
        else:
            it_b = jnp.full(S, -1, jnp.int32)
            # mono: push the band root directly
            f_kind = _set_top(f_kind, sp, z + KIND_TREE, is_band)
            f_ch = _set_top(f_ch, sp, z, is_band)
            f_nid = _set_top(f_nid, sp, z + 1, is_band)
            f_phase = _set_top(f_phase, sp, z + PH_ENTER, is_band)
            f_b = _set_top(f_b, sp, b_band, is_band)
            f_gain = _set_top(f_gain, sp, zf + 1.0, is_band)
            sp_n = jnp.where(is_band, sp + 1, sp_n)

        new_rem = jnp.where(is_band, rem_band, rem1)
        new_ib = jnp.where(is_band, ib + 1, ib)
        new_tell_prev = jnp.where(is_band, tellf, carry.tell_prev)

        # ---------------- post: node split pushes -----------------------
        it_n = jnp.where(want_tri, it_tri,
                         jnp.where(want_uint_n, uval, 0))
        it_n = jnp.where(can_split & (qn_n != 1),
                         _tdiv(it_n * 16384, jnp.maximum(qn_n, 1)), 0)
        b_spl = b_node - qalloc
        imid_n, iside_n, delta_n = _theta_geometry(it_n, n_child)
        # short-block delta adjustment (quant_partition, B0 > 1)
        lm_c = lm_node - 1
        frac_mid = (it_n & 0x3FFF) != 0
        adj = can_split & (B0n > 1) & frac_mid
        d_hi = delta_n - (delta_n >> jnp.clip(4 - lm_c, 0, 31)
                          .astype(jnp.uint32))
        d_lo = jnp.minimum(
            0, delta_n + ((n_child << BITRES) >>
                          jnp.clip(5 - lm_c, 0, 31).astype(jnp.uint32)))
        delta_n = jnp.where(adj, jnp.where(it_n > 8192, d_hi, d_lo),
                            delta_n)
        mb_n = jnp.maximum(0, jnp.minimum(b_spl, (b_spl - delta_n) >> 1))
        sb_n = b_spl - mb_n
        first_x_n = mb_n >= sb_n
        midf_n = imid_n.astype(jnp.float32) / 32768.0
        sidef_n = iside_n.astype(jnp.float32) / 32768.0
        new_rem = jnp.where(can_split, new_rem - qalloc, new_rem)

        f_phase = _set_top(f_phase, spt, z + PH_MID, can_split)
        f_itheta = _set_top(f_itheta, spt, it_n, can_split)
        f_first_x = _set_top(f_first_x, spt, first_x_n, can_split)
        f_b1 = _set_top(f_b1, spt,
                        jnp.where(first_x_n, mb_n, sb_n), can_split)
        f_b2 = _set_top(f_b2, spt,
                        jnp.where(first_x_n, sb_n, mb_n), can_split)
        f_g2 = _set_top(f_g2, spt, gain * jnp.where(first_x_n, sidef_n,
                                                    midf_n), can_split)
        f_rb = _set_top(f_rb, spt, new_rem, can_split)
        # first child
        c_nid = jnp.where(first_x_n, nid * 2, nid * 2 + 1)
        f_kind = _set_top(f_kind, sp, z + KIND_TREE, can_split)
        f_ch = _set_top(f_ch, sp, ch, can_split)
        f_nid = _set_top(f_nid, sp, c_nid, can_split)
        f_phase = _set_top(f_phase, sp, z + PH_ENTER, can_split)
        f_b = _set_top(f_b, sp, jnp.where(first_x_n, mb_n, sb_n), can_split)
        f_gain = _set_top(f_gain, sp,
                          gain * jnp.where(first_x_n, midf_n, sidef_n),
                          can_split)
        sp_n = jnp.where(can_split, sp + 1, sp_n)

        # ---------------- post: leaf emission ---------------------------
        is_fill = is_leaf & (K == 0)
        rank = jnp.where(is_fill, carry.fillcnt, -1)
        fillcnt = jnp.where(is_fill, carry.fillcnt + 1, carry.fillcnt)

        glob_slot = jnp.where(is_tree, ch * nsl + slot_l, -1)
        emit = WalkEmit(
            slot=jnp.where(is_tree & (can_split | is_leaf), glob_slot, -1),
            split=can_split,
            itheta=it_n,
            k=jnp.where(is_pvq, K, 0),
            idx=jnp.where(is_pvq, uval.astype(jnp.uint32), 0),
            gain=jnp.where(is_leaf, gain, 0.0),
            rank=rank,
            band=jnp.where(is_band, ib, -1),
            b_band=b_band,
            btheta=jnp.where(is_band & joint, it_b, -1) if C == 2
            else jnp.full(S, -1, jnp.int32),
            binv=invb)

        # ---------------- resolution: pops and second-child pushes ------
        # A completed leaf pops its own frame; then ancestors resolve:
        # DONE frames pop (cascade continues), the first MID frame
        # rebalances, pushes the second child and stops the cascade.
        sp_n = jnp.where(is_leaf, sp_n - 1, sp_n)
        just_pop = is_leaf
        for _ in range(DEPTH_MAX):
            spt2 = jnp.maximum(sp_n - 1, 0)
            act = just_pop & (sp_n > 0)
            ph = _get_at(f_phase, spt2)
            kd = _get_at(f_kind, spt2)
            # MID frame: resolve second child, stop cascade
            m_mid = act & (ph == PH_MID)
            b1v = _get_at(f_b1, spt2)
            b2v = _get_at(f_b2, spt2)
            rbv = _get_at(f_rb, spt2)
            itv = _get_at(f_itheta, spt2)
            fxv = _get_at(f_first_x, spt2)
            g2v = _get_at(f_g2, spt2)
            chv = _get_at(f_ch, spt2)
            nidv = _get_at(f_nid, spt2)
            consumed = rbv - new_rem
            rebal = b1v - consumed
            edge = jnp.where(fxv, 0, 16384)
            do_reb = (kd != KIND_DBAND) & (rebal > (3 << BITRES)) \
                & (itv != edge)
            b2n = jnp.where(do_reb, b2v + rebal - (3 << BITRES), b2v)
            sec_is_band = kd != KIND_TREE
            s_nid = jnp.where(fxv, nidv * 2 + 1, nidv * 2)
            f_phase = _set_top(f_phase, spt2, z + PH_DONE, m_mid)
            f_kind = _set_top(f_kind, sp_n, z + KIND_TREE, m_mid)
            f_ch = _set_top(f_ch, sp_n,
                            jnp.where(sec_is_band,
                                      jnp.where(fxv, 1, 0), chv), m_mid)
            f_nid = _set_top(f_nid, sp_n,
                             jnp.where(sec_is_band, 1, s_nid), m_mid)
            f_phase = _set_top(f_phase, sp_n, z + PH_ENTER, m_mid)
            f_b = _set_top(f_b, sp_n, b2n, m_mid)
            f_gain = _set_top(f_gain, sp_n, g2v, m_mid)
            sp_n = jnp.where(m_mid, sp_n + 1, sp_n)
            # DONE frame: pop and cascade
            m_done = act & (ph == PH_DONE)
            sp_n = jnp.where(m_done, sp_n - 1, sp_n)
            just_pop = m_done

        done_n = done | ((new_ib >= end) & (sp_n == 0))

        new = WalkCarry(
            st=st, done=done_n, ib=new_ib, sp=sp_n, balance=balance,
            rem=new_rem, tell_prev=new_tell_prev, fillcnt=fillcnt,
            dual=dual, f_kind=f_kind, f_ch=f_ch, f_nid=f_nid,
            f_phase=f_phase, f_b=f_b, f_gain=f_gain, f_itheta=f_itheta,
            f_first_x=f_first_x, f_b1=f_b1, f_b2=f_b2, f_g2=f_g2,
            f_rb=f_rb)
        return new, emit

    carry, emits = lax.scan(step, carry0, None, length=n_iter)
    ok = carry.done | ~active
    return emits, carry, jnp.all(ok)
