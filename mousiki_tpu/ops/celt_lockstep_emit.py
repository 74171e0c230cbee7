"""Lockstep CELT decode, pass 2: resolve signal-plan planes from the walk.

The walk (celt_lockstep_walk) consumes the symbol stream and emits node
records (splits with theta, PVQ leaves with CWRS indices, fill leaves with
visit ranks).  This pass resolves everything that depends on decoded pulse
DATA rather than symbols — collapse masks (reference bands.rs
extract_collapse_mask / the cm folds in quant_band), fold-vs-noise-vs-zero
fill typing, the LCG seed chain, anti-collapse inputs — and assembles the
packed plan-plane pytree consumed by `band_exec_jax.execute_packed`.

The per-band tree resolution runs as ONE lax.scan over bands (the padded
NPB-slot node layout makes every band's tree the same static shape), so
the compiled body is band-count-independent — executable size matters on
the tunneled device (oversized programs fall out of the program store and
get re-uploaded per dispatch).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

import jax.numpy as jnp
from jax import lax

from ..celt.modes import BITRES
from ..celt.plan_pack import TIERS, combos_for_m
from .band_exec_jax import _lcg_jump, cwrs_walk
from .celt_lockstep import _tables
from .celt_lockstep_walk import NPB, walk_layout

_BIT_INTERLEAVE = np.array([0, 1, 1, 1, 2, 3, 3, 3, 2, 3, 3, 3, 2, 3, 3, 3],
                           np.int32)
_BIT_DEINTERLEAVE = np.array(
    [0x00, 0x03, 0x0C, 0x0F, 0x30, 0x33, 0x3C, 0x3F,
     0xC0, 0xC3, 0xCC, 0xCF, 0xF0, 0xF3, 0xFC, 0xFF], np.int32)

FILL_SLOTS_LS = 8
SPREAD_AGGRESSIVE = 3


@lru_cache(maxsize=8)
def _tier_map(lm: int, C: int):
    """Static map of VALID node slots -> tiers; returns per-tier index
    arrays (into the (C*nslot,) padded slot axis) + static n/dst."""
    lay = walk_layout(lm)
    tb = _tables(lm, C)
    M = 1 << lm
    frame = 120 << lm
    eb = tb.ebands
    idxs = [[], [], []]
    ns = [[], [], []]
    dst = [[], [], []]
    for ch in range(C):
        for band in range(21):
            for nid in range(1, int(lay.nnodes[band]) + 1):
                sl = band * NPB + nid - 1
                n = int(lay.s_n[sl])
                if n < 2:
                    continue
                t = 0 if n <= TIERS[0][0] else (1 if n <= TIERS[1][0]
                                                else 2)
                idxs[t].append(ch * lay.nslot + sl)
                ns[t].append(n)
                dst[t].append(ch * frame + M * int(eb[band])
                              + int(lay.s_off[sl]))
    return ([np.asarray(a, np.int32) for a in idxs],
            [np.asarray(a, np.int32) for a in ns],
            [np.asarray(a, np.int32) for a in dst])


@lru_cache(maxsize=8)
def _combo_lut(lm: int):
    """(2, 7) combo-id lookup: [b0 == M][tf+3] per plan_pack.combos_for_m."""
    combos = combos_for_m(1 << lm)
    cid = {bt: i for i, bt in enumerate(combos)}
    out = np.zeros((2, 7), np.int32)
    for row, b0 in enumerate((1, 1 << lm)):
        for tf in range(-3, 4):
            out[row, tf + 3] = cid.get((b0, tf), 0)
    return out


def _scatter_nodes(emits, S, C_nslot):
    """Scatter walk emission records into (S, C_nslot) node planes."""
    T = emits.slot.shape[0]
    rows = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None, :], (T, S))
    sl = jnp.where(emits.slot >= 0, emits.slot, C_nslot)
    rr = rows.reshape(-1)
    cc = sl.reshape(-1)

    def put(init, val):
        return init.at[rr, cc].set(val.reshape(-1))

    n_split = put(jnp.zeros((S, C_nslot + 1), bool), emits.split)
    n_leaf = put(jnp.zeros((S, C_nslot + 1), bool),
                 (emits.slot >= 0) & ~emits.split)
    n_itheta = put(jnp.zeros((S, C_nslot + 1), jnp.int32), emits.itheta)
    n_k = put(jnp.zeros((S, C_nslot + 1), jnp.int32), emits.k)
    n_idx = put(jnp.zeros((S, C_nslot + 1), jnp.uint32), emits.idx)
    n_gain = put(jnp.zeros((S, C_nslot + 1), jnp.float32), emits.gain)
    n_rank = put(jnp.full((S, C_nslot + 1), -1, jnp.int32), emits.rank)
    return (n_split[:, :C_nslot], n_leaf[:, :C_nslot],
            n_itheta[:, :C_nslot], n_k[:, :C_nslot], n_idx[:, :C_nslot],
            n_gain[:, :C_nslot], n_rank[:, :C_nslot])


def _scatter_bands(emits, S):
    T = emits.band.shape[0]
    rows = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None, :], (T, S))
    bb = jnp.where(emits.band >= 0, emits.band, 21)
    rr = rows.reshape(-1)
    cc = bb.reshape(-1)
    b_band = jnp.zeros((S, 22), jnp.int32).at[rr, cc].set(
        emits.b_band.reshape(-1))[:, :21]
    btheta = jnp.full((S, 22), -1, jnp.int32).at[rr, cc].set(
        emits.btheta.reshape(-1))[:, :21]
    binv = jnp.zeros((S, 22), bool).at[rr, cc].set(
        emits.binv.reshape(-1))[:, :21]
    return b_band, btheta, binv


def _collapse_from_iy(iy, n, b_leaf, nmax):
    """extract_collapse_mask (vq.rs): bit j set iff any pulse in block j.

    iy (R, nmax) i32; n, b_leaf (R,) i32 (b_leaf in 1/2/4/8)."""
    pos = jnp.arange(nmax, dtype=jnp.int32)[None, :]
    n0 = n // jnp.maximum(b_leaf, 1)
    blk = jnp.clip(pos // jnp.maximum(n0, 1)[:, None], 0, 7)
    nz = (iy != 0) & (pos < n[:, None])
    hit = jnp.any(nz[:, None, :]
                  & (blk[:, None, :]
                     == jnp.arange(8, dtype=jnp.int32)[None, :, None]),
                  axis=2)
    bits = jnp.sum(hit.astype(jnp.int32)
                   << jnp.arange(8, dtype=jnp.int32)[None, :], axis=1)
    return jnp.where(b_leaf > 1, bits,
                     jnp.any(nz, axis=1).astype(jnp.int32))


def _vec_bitexact_cos(x):
    tmp = (4096 + x * x) >> 13
    x2 = tmp
    x2 = (32767 - x2) + ((16384 + x2 * (
        -7651 + ((16384 + x2 * (8277 + ((16384 + (-626) * x2) >> 15)))
                 >> 15))) >> 15)
    return 1 + x2


def _tree_resolve(spl, lef, it, kk, cmp_, tree_fill, has_lb, Bp_i, td_i,
                  rc_i, transient, M):
    """Resolve one band's tree for all lanes: fill words down, collapse
    masks up (bands.rs quant_partition fill/cm flow).  All args (S, NPB)
    or (S,); returns (band_cm, fill_nonzero (S,NPB), fill_fold)."""
    S = tree_fill.shape[0]
    inter = jnp.asarray(_BIT_INTERLEAVE)
    deinter = jnp.asarray(_BIT_DEINTERLEAVE)
    # pre-transforms of the fill word (quant_band entry)
    f = tree_fill
    Bw = jnp.where(transient, M, 1)
    rcc = rc_i
    for _ in range(3):
        go = rcc > 0
        f = jnp.where(go, inter[f & 0xF]
                      | (inter[jnp.clip(f >> 4, 0, 15)] << 2), f)
        rcc = rcc - 1
        Bw = jnp.where(go, Bw >> 1, Bw)
    tdc = td_i
    for _ in range(3):
        go = tdc > 0
        f = jnp.where(go, f | (f << Bw.astype(jnp.uint32)), f)
        Bw = jnp.where(go, Bw << 1, Bw)
        tdc = tdc - 1
    # descent (heap ids 1..31; depth static per id)
    fills = [None] * 32
    fills[1] = f
    for nid in range(1, 16):
        d = nid.bit_length() - 1
        B_nd = (Bp_i + (1 << d) - 1) >> d
        fv = fills[nid]
        f1 = jnp.where(B_nd == 1, (fv & 1) | (fv << 1), fv)
        Bc = (B_nd + 1) >> 1
        msk = (1 << Bc) - 1
        itn = it[:, nid - 1]
        sm = spl[:, nid - 1]
        f2 = jnp.where(sm & (itn == 0), f1 & msk, f1)
        f2 = jnp.where(sm & (itn == 16384),
                       f1 & (msk << Bc.astype(jnp.uint32)), f2)
        fills[2 * nid] = f2
        fills[2 * nid + 1] = f2 >> Bc.astype(jnp.uint32)
    # leaves + ascent
    cms = [None] * 32
    fnz = jnp.zeros((S, NPB), bool)
    ffo = jnp.zeros((S, NPB), bool)
    for nid in range(31, 0, -1):
        d = nid.bit_length() - 1
        B_nd = (Bp_i + (1 << d) - 1) >> d
        cm_mask = (1 << B_nd) - 1
        lm_ = lef[:, nid - 1]
        ff = fills[nid] & cm_mask
        kq = kk[:, nid - 1]
        pvq_m = lm_ & (kq > 0)
        nz_m = lm_ & (kq == 0) & (ff != 0)
        cm_leaf = jnp.where(pvq_m, cmp_[:, nid - 1],
                            jnp.where(nz_m & has_lb, ff,
                                      jnp.where(nz_m, cm_mask, 0)))
        if 2 * nid + 1 <= 31:
            child = cms[2 * nid] | (cms[2 * nid + 1]
                                    << (B_nd >> 1).astype(jnp.uint32))
        else:
            child = jnp.zeros(S, jnp.int32)
        cms[nid] = jnp.where(lm_, cm_leaf, child)
        fnz = fnz.at[:, nid - 1].set(nz_m)
        ffo = ffo.at[:, nid - 1].set(nz_m & has_lb)
    # root post folds (quant_band resynth tail)
    cm = cms[1]
    Bv = Bp_i
    tdc = td_i
    for _ in range(3):
        go = tdc > 0
        Bv = jnp.where(go, Bv >> 1, Bv)
        cm = jnp.where(go, cm | (cm >> Bv.astype(jnp.uint32)), cm)
        tdc = tdc - 1
    rcc = rc_i
    for _ in range(3):
        go = rcc > 0
        cm = jnp.where(go, deinter[jnp.clip(cm, 0, 15)], cm)
        rcc = rcc - 1
    Bf = Bv << rc_i.astype(jnp.uint32)
    cm = cm & ((1 << Bf.astype(jnp.uint32)) - 1)
    return cm, fnz, ffo


DEFAULT_CAPS = (160, 48, 12)   # per-tier active-leaf slots (<=256 kbps)


def emit_plan(emits, *, C: int, lm: int, hdr, tf_res, spread, alloc,
              seed0, ac_on, final_energy, prev1, prev2,
              start: int = 0, end: int = 21, caps=DEFAULT_CAPS):
    """Resolve plan planes from walk emissions.

    Returns (p, seed_final, collapse_masks, fill_overflow).  seed0: (S,)
    uint32 LCG seed entering the frame (previous frame's EC range value).
    final_energy: (S, C, 21) post-finalise energies; prev1/prev2:
    (S, 2, 21) oldLogE/oldLogE2 (anti-collapse inputs).  caps: per-tier
    compact slot capacities — lanes with more active leaves in a tier
    overflow (ok=False, caller falls back); the default covers <=256 kbps
    with margin, pass a wider profile for higher rates.
    """
    lay = walk_layout(lm)
    tb = _tables(lm, C)
    S = emits.slot.shape[1]
    nsl = lay.nslot
    M = 1 << lm
    eb = tb.ebands
    nbv = jnp.asarray(tb.nbands)
    edges = jnp.asarray((M * eb).astype(np.int32))        # (22,)
    transient = hdr.transient
    arj = jnp.arange(21, dtype=jnp.int32)

    (n_split, n_leaf, n_itheta, n_k, n_idx, n_gain, n_rank) = \
        _scatter_nodes(emits, S, C * nsl)
    b_band, btheta, binv = _scatter_bands(emits, S)

    # ---- per-band B', recombine, time_divide --------------------------
    b_ent = jnp.where(transient[:, None], M, 1)           # (S, 21)
    rc = jnp.maximum(tf_res, 0)
    Bq = b_ent >> rc.astype(jnp.uint32)
    NBq = (nbv[None, :] // jnp.maximum(b_ent, 1)) << rc.astype(jnp.uint32)
    tfq = tf_res
    td = jnp.zeros_like(tf_res)
    for _ in range(3):
        go = ((NBq & 1) == 0) & (tfq < 0)
        Bq = jnp.where(go, Bq << 1, Bq)
        NBq = jnp.where(go, NBq >> 1, NBq)
        tfq = jnp.where(go, tfq + 1, tfq)
        td = jnp.where(go, td + 1, td)
    band_bp = Bq

    # ---- lowband offset chain -----------------------------------------
    lo = jnp.zeros(S, jnp.int32)
    upd = jnp.ones(S, bool)
    lo_used = jnp.zeros((S, 21), jnp.int32)
    for i in range(start, end):
        cond_i = (M * int(eb[i]) - int(tb.nbands[i]) >= M * int(eb[start])
                  or i == start + 1)
        if cond_i:
            lo = jnp.where(upd | (lo == 0), i, lo)
        lo_used = lo_used.at[:, i].set(lo)
        upd = b_band[:, i] > (nbv[i] << BITRES)

    # ---- compact PVQ leaves into serving-profile tier slots -------------
    # The padded node layout has ~700 tier-0 slot candidates; both the
    # CWRS walk here (collapse masks) and execute_packed generate code
    # that scales with tier width, so active leaves are compacted on
    # device into the same small tier shapes the native serving profile
    # uses.  Overflowing lanes get ok=False (caller falls back).
    tier_idx, tier_n, tier_dst = _tier_map(lm, C)
    sdep_all = np.concatenate([lay.s_depth] * C)
    sband_all = np.concatenate([lay.s_band] * C)
    cm_slot = jnp.zeros((S, C * nsl), jnp.int32)
    overflow_t = jnp.zeros(S, bool)
    rowsS = jnp.arange(S, dtype=jnp.int32)[:, None]
    comp = []   # per tier: dict of compact planes
    for t in range(3):
        idx = tier_idx[t]
        CAP = caps[t]
        nmax = TIERS[t][0]
        W = idx.size
        act = jnp.take(n_leaf & (n_k > 0), jnp.asarray(idx), axis=1)
        k = jnp.take(n_k, jnp.asarray(idx), axis=1)
        ii = jnp.take(n_idx, jnp.asarray(idx), axis=1)
        gg = jnp.take(n_gain, jnp.asarray(idx), axis=1)
        nn = jnp.broadcast_to(jnp.asarray(tier_n[t])[None, :], (S, W))
        dd = jnp.broadcast_to(jnp.asarray(tier_dst[t])[None, :], (S, W))
        dep = jnp.asarray(sdep_all[idx])[None, :]
        bnd = jnp.broadcast_to(jnp.asarray(sband_all[idx])[None, :],
                               (S, W))
        bp = jnp.take_along_axis(band_bp, bnd, axis=1)
        bl = ((bp + (1 << dep) - 1) >> dep.astype(jnp.uint32)) \
            .astype(jnp.int32)
        rank = jnp.cumsum(act.astype(jnp.int32), axis=1) - 1
        overflow_t = overflow_t | jnp.any(act & (rank >= CAP), axis=1)
        tgt = jnp.where(act & (rank < CAP), rank, CAP)
        rr = jnp.broadcast_to(rowsS, (S, W)).reshape(-1)
        cc = tgt.reshape(-1)

        def compact(val, dtype):
            buf = jnp.zeros((S, CAP + 1), dtype)
            return buf.at[rr, cc].set(val.reshape(-1))[:, :CAP]

        c_act = compact(act, jnp.bool_)
        c_n = compact(nn, jnp.int32)
        c_k = compact(k, jnp.int32)
        c_idx = compact(ii, jnp.uint32)
        c_gain = compact(gg, jnp.float32)
        c_dst = compact(dd, jnp.int32)
        c_bl = compact(bl, jnp.int32)
        iy = cwrs_walk(c_act.reshape(-1), c_n.reshape(-1),
                       c_k.reshape(-1), c_idx.reshape(-1), nmax)
        cm_c = _collapse_from_iy(iy, c_n.reshape(-1), c_bl.reshape(-1),
                                 nmax).reshape(S, CAP)
        cm_back = jnp.take_along_axis(cm_c, jnp.clip(rank, 0, CAP - 1),
                                      axis=1)
        cm_slot = cm_slot.at[:, jnp.asarray(idx)].set(
            jnp.where(act & (rank < CAP), cm_back, 0))
        comp.append({"active": c_act, "n": c_n, "k": c_k, "idx": c_idx,
                     "gain": c_gain, "dst": c_dst, "b": c_bl})

    # ---- band scan: fill/cm resolution ----------------------------------
    dual_dec = alloc.dual_stereo
    intensity = alloc.intensity

    def bm(x):
        """(S, C*nsl) plane -> band-major (21, S, C, NPB)."""
        return jnp.moveaxis(
            x.reshape(S, C, 21, NPB), 2, 0)

    xs = {
        "i": arj,
        "N_i": nbv,
        "spl": bm(n_split), "lef": bm(n_leaf), "it": bm(n_itheta),
        "kk": bm(n_k), "cmp": bm(cm_slot),
        "Bp": jnp.moveaxis(band_bp, 1, 0), "td": jnp.moveaxis(td, 1, 0),
        "rc": jnp.moveaxis(rc, 1, 0),
        "tfv": jnp.moveaxis(tf_res, 1, 0),
        "lo": jnp.moveaxis(lo_used, 1, 0),
        "btheta": jnp.moveaxis(btheta, 1, 0),
    }

    B_ent_v = jnp.where(transient, M, 1)

    def band_body(masksC, bz):
        i = bz["i"]
        N_i = bz["N_i"]
        lo_i = bz["lo"]
        Bp_i = bz["Bp"]
        can_fold = (lo_i != 0) & ((spread != SPREAD_AGGRESSIVE)
                                  | (B_ent_v > 1) | (bz["tfv"] < 0))
        eff = jnp.maximum(0, edges[jnp.clip(lo_i, 0, 21)] - N_i)
        fold_start = jnp.sum((edges[None, :21] <= eff[:, None])
                             .astype(jnp.int32), axis=1) - 1
        cand = (arj[None, :] >= lo_i[:, None]) & \
            ((arj[None, :] >= i) | (edges[None, :21]
                                    >= (eff + N_i)[:, None]))
        fold_end = jnp.argmax(cand, axis=1)
        hi_m = jnp.maximum(fold_end, fold_start + 1)
        rng_m = (arj[None, :] >= fold_start[:, None]) & \
            (arj[None, :] < hi_m[:, None]) & (arj[None, :] < i)
        # OR of masks over the fold window: masks fit in 8 bits, so a
        # masked max-of-sums... use a simple log-tree OR over 21 columns
        xm = jnp.where(rng_m, masksC[:, :, 0], 0)
        ym = jnp.where(rng_m, masksC[:, :, 1], 0)
        pad = 32 - 21
        xm = jnp.pad(xm, ((0, 0), (0, pad)))
        ym = jnp.pad(ym, ((0, 0), (0, pad)))
        for sh in (16, 8, 4, 2, 1):
            xm = xm[:, :sh] | xm[:, sh:2 * sh]
            ym = ym[:, :sh] | ym[:, sh:2 * sh]
        x_or = xm[:, 0]
        y_or = ym[:, 0]
        full = (1 << B_ent_v) - 1
        x_cm = jnp.where(can_fold, x_or, full)
        y_cm = jnp.where(can_fold, y_or, full)
        has_lb = can_fold

        if C == 1:
            cm1, fnz, ffo = _tree_resolve(
                bz["spl"][:, 0], bz["lef"][:, 0], bz["it"][:, 0],
                bz["kk"][:, 0], bz["cmp"][:, 0], x_cm | y_cm, has_lb,
                Bp_i, bz["td"], bz["rc"], transient, M)
            bandx = bandy = cm1
            fnz_o = fnz[:, None, :]
            ffo_o = ffo[:, None, :]
        else:
            joint = ~((dual_dec == 1) & (i < intensity))
            itb = bz["btheta"]
            fj = x_cm | y_cm
            mskb = (1 << B_ent_v) - 1
            fj = jnp.where(joint & (itb == 0), fj & mskb, fj)
            fj = jnp.where(joint & (itb == 16384),
                           fj & (mskb << B_ent_v.astype(jnp.uint32)), fj)
            fx = jnp.where(joint, fj, x_cm)
            fy = jnp.where(joint, fj >> B_ent_v.astype(jnp.uint32), y_cm)
            lb_y = jnp.where(joint, False, has_lb)
            cmx, fnzx, ffox = _tree_resolve(
                bz["spl"][:, 0], bz["lef"][:, 0], bz["it"][:, 0],
                bz["kk"][:, 0], bz["cmp"][:, 0], fx, has_lb, Bp_i,
                bz["td"], bz["rc"], transient, M)
            cmy, fnzy, ffoy = _tree_resolve(
                bz["spl"][:, 1], bz["lef"][:, 1], bz["it"][:, 1],
                bz["kk"][:, 1], bz["cmp"][:, 1], fy, lb_y, Bp_i,
                bz["td"], bz["rc"], transient, M)
            bandx = jnp.where(joint, cmx | cmy, cmx)
            bandy = jnp.where(joint, cmx | cmy, cmy)
            fnz_o = jnp.stack([fnzx, fnzy], axis=1)
            ffo_o = jnp.stack([ffox, ffoy], axis=1)

        row = jnp.stack([bandx, bandy], axis=1)            # (S, 2)
        onei = (arj[None, :] == i)[:, :, None]
        masksC = jnp.where(onei, row[:, None, :], masksC)
        return masksC, {"fnz": fnz_o, "ffo": ffo_o, "has_lb": has_lb,
                        "eff": jnp.where(has_lb, eff, -1)}

    masksC0 = jnp.zeros((S, 21, 2), jnp.int32)
    masksC, ys = lax.scan(band_body, masksC0, xs)
    fill_nonzero = jnp.moveaxis(ys["fnz"], 0, 2).reshape(S, C * nsl)
    fill_fold = jnp.moveaxis(ys["ffo"], 0, 2).reshape(S, C * nsl)
    has_lb_x = jnp.moveaxis(ys["has_lb"], 0, 1)            # (S, 21)
    eff_lb = jnp.moveaxis(ys["eff"], 0, 1)

    # ---- seed chain -----------------------------------------------------
    A_J, C_J = _lcg_jump()
    A_J = jnp.asarray(A_J)
    C_J = jnp.asarray(C_J)
    s_n_all = jnp.asarray(np.concatenate([lay.s_n] * C))
    RMAX = 640
    rank_c = jnp.clip(n_rank, -1, RMAX - 1)
    is_fill_slot = n_rank >= 0
    draws = jnp.where(is_fill_slot & fill_nonzero, s_n_all[None, :], 0)
    rows = jnp.arange(S, dtype=jnp.int32)[:, None].repeat(C * nsl, 1)
    dr = jnp.zeros((S, RMAX + 1), jnp.int32).at[
        rows.reshape(-1),
        jnp.where(is_fill_slot, rank_c, RMAX).reshape(-1)].add(
        draws.reshape(-1))
    cum = jnp.cumsum(dr[:, :RMAX], axis=1) - dr[:, :RMAX]
    seed_rank = A_J[jnp.clip(cum, 0, A_J.shape[0] - 1)] \
        * seed0[:, None] + C_J[jnp.clip(cum, 0, A_J.shape[0] - 1)]
    seed_slot = jnp.take_along_axis(
        seed_rank, jnp.clip(rank_c, 0, RMAX - 1), axis=1)
    total_draws = jnp.sum(draws, axis=1)
    seed_final = A_J[jnp.clip(total_draws, 0, A_J.shape[0] - 1)] * seed0 \
        + C_J[jnp.clip(total_draws, 0, A_J.shape[0] - 1)]

    # ---- assemble plan planes (compact tier slots) ----------------------
    p = {}
    p["direct"] = jnp.zeros(S, bool)
    p["pvq_active"] = [comp[t]["active"] for t in range(3)]
    p["pvq_n"] = [comp[t]["n"] for t in range(3)]
    p["pvq_k"] = [comp[t]["k"] for t in range(3)]
    p["pvq_b"] = [comp[t]["b"] for t in range(3)]
    p["pvq_spread"] = [
        jnp.broadcast_to(spread[:, None], (S, caps[t])).astype(jnp.int32)
        for t in range(3)]
    p["pvq_gain"] = [comp[t]["gain"] for t in range(3)]
    p["pvq_idx"] = [comp[t]["idx"] for t in range(3)]
    p["pvq_dst"] = [comp[t]["dst"] for t in range(3)]

    # fills: compact each (band, tree) padded node row into FILL_SLOTS_LS
    F = FILL_SLOTS_LS
    act4 = (n_leaf & (n_k == 0) & fill_nonzero).reshape(S, C, 21, NPB)
    fold4 = fill_fold.reshape(S, C, 21, NPB)
    gain4 = n_gain.reshape(S, C, 21, NPB)
    seed4 = seed_slot.reshape(S, C, 21, NPB)
    offs4 = jnp.asarray(lay.s_off.reshape(21, NPB))
    ns4 = jnp.asarray(lay.s_n.reshape(21, NPB))
    ordpos = jnp.cumsum(act4.astype(jnp.int32), axis=3) - 1
    overflow = overflow_t | jnp.any(act4 & (ordpos >= F), axis=(1, 2, 3))
    onehot = (ordpos[..., None] == jnp.arange(F, dtype=jnp.int32)) \
        & act4[..., None]                                  # (S,C,21,NPB,F)
    oh_i = onehot.astype(jnp.int32)
    fill_active = jnp.any(onehot, axis=3)                  # (S, C, 21, F)
    fill_fold_p = jnp.any(onehot & fold4[..., None], axis=3)
    fill_off = jnp.sum(oh_i * offs4[None, None, :, :, None], axis=3)
    fill_n = jnp.sum(oh_i * ns4[None, None, :, :, None], axis=3)
    fill_gain = jnp.sum(jnp.where(onehot, gain4[..., None], 0.0), axis=3)
    fill_seed = jnp.sum(jnp.where(onehot, seed4[..., None],
                                  jnp.uint32(0)), axis=3)

    def to_plane(x, fillval=0):
        """(S, C, 21, F) -> (S, 21, 2, F) with slot axis padded to 2."""
        x = jnp.moveaxis(x, 1, 2)                          # (S, 21, C, F)
        if C == 1:
            pad = jnp.full((S, 21, 1, F), fillval, x.dtype)
            x = jnp.concatenate([x, pad], axis=2)
        return x

    p["fill_active"] = to_plane(fill_active, False)
    p["fill_fold"] = to_plane(fill_fold_p, False)
    p["fill_off"] = to_plane(fill_off)
    p["fill_n"] = to_plane(fill_n)
    p["fill_gain"] = to_plane(fill_gain, 1)
    p["fill_seed"] = to_plane(fill_seed)

    # calls
    clut = jnp.asarray(_combo_lut(lm))
    combo = clut[transient.astype(jnp.int32)[:, None],
                 jnp.clip(tf_res + 3, 0, 6)]               # (S, 21)
    in_rng = ((arj >= start) & (arj < end))[None, :]
    call_active = jnp.zeros((S, 21, 2), bool)
    call_has_lb = jnp.zeros((S, 21, 2), bool)
    call_lb_src = jnp.zeros((S, 21, 2), jnp.int32)
    call_lb_buf = jnp.zeros((S, 21, 2), jnp.int32)
    call_blend = jnp.full((S, 21, 2), -1, jnp.int32)
    call_pre = jnp.zeros((S, 21, 2), jnp.int32)
    call_post = jnp.zeros((S, 21, 2), jnp.int32)
    call_nw = jnp.zeros((S, 21, 2), bool)
    call_nbuf = jnp.zeros((S, 21, 2), jnp.int32)
    not_last = (arj < end - 1)[None, :]
    if C == 1:
        call_active = call_active.at[:, :, 0].set(in_rng)
        call_has_lb = call_has_lb.at[:, :, 0].set(has_lb_x)
        call_lb_src = call_lb_src.at[:, :, 0].set(jnp.maximum(eff_lb, 0))
        call_pre = call_pre.at[:, :, 0].set(combo)
        call_post = call_post.at[:, :, 0].set(combo)
        call_nw = call_nw.at[:, :, 0].set(in_rng & not_last)
    else:
        dual_b = (dual_dec == 1)[:, None] & (arj[None, :]
                                             < intensity[:, None])
        call_active = call_active.at[:, :, 0].set(in_rng)
        call_active = call_active.at[:, :, 1].set(in_rng)
        call_has_lb = call_has_lb.at[:, :, 0].set(has_lb_x)
        call_has_lb = call_has_lb.at[:, :, 1].set(has_lb_x & dual_b)
        call_lb_src = call_lb_src.at[:, :, 0].set(jnp.maximum(eff_lb, 0))
        call_lb_src = call_lb_src.at[:, :, 1].set(
            jnp.where(dual_b, jnp.maximum(eff_lb, 0), 0))
        call_lb_buf = call_lb_buf.at[:, :, 1].set(
            jnp.where(dual_b, 1, 0))
        # blend: after the dual->joint transition the norm buffer below
        # M*eb[intensity] holds the 0.5*(norm+norm2) average
        avg_m = (dual_dec == 1)[:, None] & (arj[None, :]
                                            >= intensity[:, None])
        upto = edges[jnp.clip(intensity, 0, 21)]
        call_blend = call_blend.at[:, :, 0].set(
            jnp.where(avg_m & has_lb_x, upto[:, None], -1))
        call_pre = call_pre.at[:, :, 0].set(combo)
        call_post = call_post.at[:, :, 0].set(combo)
        call_pre = call_pre.at[:, :, 1].set(combo)
        call_post = call_post.at[:, :, 1].set(combo)
        call_nw = call_nw.at[:, :, 0].set(in_rng & not_last)
        call_nw = call_nw.at[:, :, 1].set(in_rng & not_last & dual_b)
        call_nbuf = call_nbuf.at[:, :, 1].set(jnp.where(dual_b, 1, 0))
    p["call_active"] = call_active
    p["call_has_lb"] = call_has_lb
    p["call_lb_src"] = call_lb_src
    p["call_lb_buf"] = call_lb_buf
    p["call_blend_upto"] = call_blend
    p["call_pre"] = call_pre
    p["call_post"] = call_post
    p["call_norm_write"] = call_nw
    p["call_norm_buf"] = call_nbuf
    p["call_dup"] = jnp.zeros((S, 21, 2, 3), jnp.int32)

    # band stereo ops
    if C == 2:
        dual_b = (dual_dec == 1)[:, None] & (arj[None, :]
                                             < intensity[:, None])
        joint_b = in_rng & ~dual_b
        mid_b = jnp.where(btheta == 0, 32767,
                          jnp.where(btheta == 16384, 0,
                                    _vec_bitexact_cos(btheta)))
        p["merge_active"] = joint_b
        p["merge_mid"] = jnp.where(
            joint_b, mid_b.astype(jnp.float32) / 32768.0, 0.0)
        p["merge_inv"] = binv & joint_b
    else:
        p["merge_active"] = jnp.zeros((S, 21), bool)
        p["merge_mid"] = jnp.zeros((S, 21), jnp.float32)
        p["merge_inv"] = jnp.zeros((S, 21), bool)
    p["theta2_active"] = jnp.zeros((S, 21), bool)
    p["theta2_cswap"] = jnp.zeros((S, 21), bool)
    p["theta2_sign"] = jnp.zeros((S, 21), jnp.float32)
    p["theta2_mid"] = jnp.zeros((S, 21), jnp.float32)
    p["theta2_side"] = jnp.zeros((S, 21), jnp.float32)
    p["theta2_inv"] = jnp.zeros((S, 21), bool)
    p["n1_active"] = jnp.zeros((S, 21, 2), bool)
    p["n1_val"] = jnp.zeros((S, 21, 2), jnp.float32)

    # anti-collapse
    p["ac_on"] = ac_on
    p["ac_masks"] = masksC
    p["ac_seed"] = seed_final
    logE = final_energy
    pulses = alloc.pulses
    n0_np = (tb.ebands[1:] - tb.ebands[:-1]).astype(np.int32)
    depth_b = ((1 + pulses) // jnp.asarray(n0_np)[None, :]) >> lm
    thresh = 0.5 * jnp.exp2(-0.125 * depth_b.astype(jnp.float32))
    sqrt_1 = jnp.asarray((1.0 / np.sqrt((n0_np << lm).astype(np.float64)))
                         .astype(np.float32))
    ac_r = jnp.zeros((S, 2, 21), jnp.float32)
    for c in range(C):
        p1 = prev1[:, c, :]
        p2 = prev2[:, c, :]
        if C == 1:
            p1 = jnp.maximum(p1, prev1[:, 1, :])
            p2 = jnp.maximum(p2, prev2[:, 1, :])
        ediff = jnp.maximum(0.0, logE[:, c, :]
                            - jnp.minimum(p1, p2)).astype(jnp.float32)
        r = 2.0 * jnp.exp2(-ediff)
        if lm == 3:
            r = r * 1.41421356
        ac_r = ac_r.at[:, c, :].set(jnp.minimum(thresh, r)
                                    * sqrt_1[None, :])
    p["ac_r"] = ac_r
    return p, seed_final, masksC, overflow
