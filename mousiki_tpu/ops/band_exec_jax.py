"""Batched device executor for CELT band-reconstruction plans.

Runs, for S streams at once on the TPU, everything `bands.quant_all_bands`
(decode side) does to the signal after symbols are known:

  P1  CWRS index -> pulse vector walk (reference cwrs.rs cwrsi), as a
      lax.scan over coefficient positions with a windowed vector search
      over a saturated u32 U(n,k) table (valid streams keep min(n,k+1)
      small because libopus caps V(N,K) < 2^32).
  P2  PVQ spreading rotation (vq.rs exp_rotation): each Givens-chain pass
      is a first-order affine recurrence -> lax.associative_scan, with
      per-leaf segment/stride handled by an index arrangement.
  P3  Band assembly in static band order: per-coefficient gather from the
      leaf pool, fold/noise fills (counter-form LCG), Hadamard/haar
      pre/post transforms as precomputed linear operators selected per
      stream, norm-buffer maintenance, stereo merge / N==2 butterfly.
  P4  anti_collapse (bands.rs:3220) with host-computed r and device LCG.

Validated against the float64 NumPy reference executor (celt/plan.py) and
against libopus PCM end to end. All math f32 on device.
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from ..celt.modes import opus_custom_mode
from ..celt.plan import _post_transforms, _pre_transforms
from ..celt.plan_pack import (FILL_SLOTS, TIERS, combos_for_m,
                              pool_layout)

# ------------------------------------------------------------------ consts

_SPREAD_FACTOR = np.array([44, 15, 10, 5], np.float32)  # [unused, light, normal, aggr]

U_N = 210
U_K = 160


@lru_cache(maxsize=1)
def _u_table() -> np.ndarray:
    """Saturated u32 U(n,k) table, (U_N, U_K); same build as native host."""
    tab = np.zeros((U_K, U_N), np.uint64)
    for k in range(1, U_K):
        tab[k, 1] = 1
        if U_N > 2:
            tab[k, 2] = 2 * k - 1
        for n in range(3, U_N):
            if k == 1:
                tab[k, n] = 1
            else:
                v = tab[k - 1, n] + tab[k - 1, n - 1] + tab[k, n - 1]
                tab[k, n] = min(v, np.uint64(0x1FFFFFFFF))
    full = np.empty((U_N, U_K), np.uint32)
    for n in range(U_N):
        for k in range(U_K):
            v = tab[min(n, k), max(n, k)] if min(n, k) < U_K else 0x1FFFFFFFF
            full[n, k] = min(int(v), 0xFFFFFFFF)
    full[:, 0] = 0
    return full


_LCG_A = 1664525
_LCG_C = 1013904223
_LCG_MAX = 2048


@lru_cache(maxsize=1)
def _lcg_jump() -> tuple[np.ndarray, np.ndarray]:
    """A[j], C[j] with lcg^j(s) = A[j]*s + C[j]  (mod 2^32)."""
    A = np.empty(_LCG_MAX, np.uint32)
    Cc = np.empty(_LCG_MAX, np.uint32)
    a, c = 1, 0
    for j in range(_LCG_MAX):
        A[j] = a
        Cc[j] = c
        a = (a * _LCG_A) & 0xFFFFFFFF
        c = (c * _LCG_A + _LCG_C) & 0xFFFFFFFF
    return A, Cc


@lru_cache(maxsize=None)
def _combo_mats(n_band: int, M: int):
    """(pre, post) stacks of (n_combos, N, N) f32 linear operators."""
    combos = combos_for_m(M)
    pre = np.zeros((len(combos), n_band, n_band), np.float32)
    post = np.zeros_like(pre)
    for ci, (b0, tf) in enumerate(combos):
        eye = np.eye(n_band, dtype=np.float64)
        try:
            pm = np.empty((n_band, n_band))
            qm = np.empty((n_band, n_band))
            for col in range(n_band):
                v = eye[:, col].copy()
                _pre_transforms(v, n_band, b0, tf)
                pm[:, col] = v
                v = eye[:, col].copy()
                _post_transforms(v, n_band, b0, tf)
                qm[:, col] = v
            pre[ci] = pm
            post[ci] = qm
        except Exception:
            pre[ci] = np.eye(n_band)
            post[ci] = np.eye(n_band)
    return pre, post


@lru_cache(maxsize=None)
def _plan_combo_mats_np(frame: int):
    """Numpy stacks for plan_combo_mats (cache holds host arrays only --
    caching jnp arrays would capture tracers when first hit inside jit)."""
    mode = opus_custom_mode(48000, 960)
    eb = [int(v) for v in mode.ebands]
    M = frame // mode.short_mdct_size
    nbmax = 22 * M
    nc = len(combos_for_m(M))
    pre_all = np.zeros((21, nc, nbmax, nbmax), np.float32)
    post_all = np.zeros_like(pre_all)
    eye = np.eye(nbmax, dtype=np.float32)
    for i in range(21):
        n_b = M * (eb[i + 1] - eb[i])
        pre_all[i] = eye
        post_all[i] = eye
        if n_b > 1:
            pre, post = _combo_mats(n_b, M)
            pre_all[i, :, :n_b, :n_b] = pre
            post_all[i, :, :n_b, :n_b] = post
    return pre_all, post_all


def plan_combo_mats(channels: int, frame: int):
    """Stacked per-band pre/post combo operators, padded to NBMAX with
    identity, as DEVICE arrays: (21, NC, NBMAX, NBMAX) f32 each.

    Pass these to execute_packed/plan_synthesis_step_arena as runtime
    arguments -- baked-in constants would add ~36 MB to every compiled
    executable (see the executable-store note in _affine_scan)."""
    pre_all, post_all = _plan_combo_mats_np(frame)
    return jnp.asarray(pre_all), jnp.asarray(post_all)


# ------------------------------------------------------------------ P1 walk

def cwrs_walk(active, n, k0, idx, nmax: int, slack: int = 12):
    """Batched cwrsi walk. active/n/k0 int32, idx uint32 -> iy (B, nmax) i32."""
    U = jnp.asarray(_u_table())
    ar16 = jnp.arange(16, dtype=jnp.int32)
    arn = jnp.arange(nmax, dtype=jnp.int32)

    def step(state, _):
        j, k, kj, idxv, pending, psign, done, iy = state
        m = n - j
        last = j >= n - 1
        work = active & ~done
        mm = jnp.clip(m, 0, U_N - 1)

        p1 = U[mm, jnp.clip(k + 1, 0, U_K - 1)]
        new_sign = (idxv >= p1)
        idx_sub = jnp.where(work & ~last & ~pending & new_sign,
                            idxv - p1, idxv)
        sgn = jnp.where(pending, psign, new_sign)

        lo = jnp.maximum(k - 15, 0)
        colidx = lo[:, None] + ar16[None, :]
        rows = U[mm[:, None], jnp.clip(colidx, 0, U_K - 1)]
        cand = (rows <= idx_sub[:, None]) & (colidx <= k[:, None])
        found = jnp.any(cand, axis=1)
        kidx = jnp.max(jnp.where(cand, colidx, -1), axis=1)
        pval = U[mm, jnp.clip(kidx, 0, U_K - 1)]
        q = kj - kidx
        yval = jnp.where(sgn, -q, q)

        # k can only legitimately short-circuit the tail to zeros when it
        # reached 0 through a resolution; during a windowed retry descent
        # (pending) k == 0 still needs resolving (q = kj pulses at j)
        resolve = work & ~last & ((k > 0) | pending) & found
        retry = work & ~last & (k > 0) & ~found
        fin_zero = work & ~last & (k == 0) & ~pending
        fin_last = work & last

        klast = jnp.where(idxv != 0, -k, k)
        val = jnp.where(fin_last, klast, yval)
        wpos = jnp.where(fin_last, jnp.clip(n - 1, 0, nmax - 1),
                         jnp.clip(j, 0, nmax - 1))
        do_write = resolve | fin_last
        onehot = (arn[None, :] == wpos[:, None]) & do_write[:, None]
        iy = jnp.where(onehot, val[:, None], iy)

        j2 = jnp.where(resolve, j + 1, j)
        k2 = jnp.where(resolve, kidx, jnp.where(retry, lo - 1, k))
        kj2 = jnp.where(resolve, kidx, kj)
        idx2 = jnp.where(resolve, idx_sub - pval, idx_sub)
        pending2 = retry
        psign2 = jnp.where(work & ~last, sgn, psign)
        done2 = done | fin_last | fin_zero
        return (j2, k2, kj2, idx2, pending2, psign2, done2, iy), None

    B = n.shape[0]
    # derive the zero-initialised carry components from the inputs so they
    # inherit the shard_map varying axis (plain jnp.zeros would be
    # "unvarying" and scan would reject the carry type mismatch)
    z = n * 0
    fb = active & False
    iy0 = jnp.zeros((B, nmax), jnp.int32) + z[:, None]
    state0 = (z, k0, k0, idx, fb, fb, ~active, iy0)
    state, _ = lax.scan(step, state0, None, length=nmax + slack)
    return state[-1]


# ------------------------------------------------------------ P2 rotation

def _affine_scan(A, Bv, axis: int):
    """x_t = A_t * x_{t-1} + B_t (x_{-1} irrelevant when A_0 = 0).

    Hillis-Steele doubling with the level as a lax.scan carry, so the
    (roll + mask + fma) body compiles ONCE instead of being unrolled
    log2(Q) times: on TPU every unrolled level costs ~1 MB of executable,
    and oversized executables thrash the device program store (multiple
    >300 MB programs in one process degraded dispatch to ~0.8 s/step)."""
    assert axis == 1
    Q = A.shape[1]
    levels = max(1, (Q - 1).bit_length())
    pos = jnp.arange(Q, dtype=jnp.int32)[None, :]

    def step(carry, k):
        Ac, Bc = carry
        s = jnp.int32(1) << k
        valid = pos >= s
        Ash = jnp.roll(Ac, s, axis=1)
        Bsh = jnp.roll(Bc, s, axis=1)
        Bn = jnp.where(valid, Bc + Ac * Bsh, Bc)
        An = jnp.where(valid, Ac * Ash, Ac)
        return (An, Bn), None

    (_, B_out), _ = lax.scan(step, (A, Bv),
                             jnp.arange(levels, dtype=jnp.int32))
    return B_out


def _rot1_contig(x, valid, first, lastm, c, s):
    """One rot1 pass over chain-contiguous data.

    x: (B, Q) values; valid mask; first/last-in-chain masks; c, s (B, 1).
    Returns the transformed values (invalid positions pass through).
    """
    b = jnp.where(valid, x, 0.0)
    # forward: a_t = c*b_t + s*a_{t-1}, a_0 = b_0 per chain
    A = jnp.where(first | ~valid, 0.0, s)
    Bv = jnp.where(first, b, c * b)
    Bv = jnp.where(valid, Bv, 0.0)
    a = _affine_scan(A, Bv, 1)
    b_next = jnp.roll(b, -1, axis=1)
    out_f = jnp.where(lastm, a, c * a - s * b_next)
    y = jnp.where(valid, out_f, x)
    # backward on flipped chains: d'_v = c*y'_v + (-s)*d'_{v-1}, start v=1
    yf = jnp.flip(jnp.where(valid, y, 0.0), axis=1)
    validf = jnp.flip(valid, axis=1)
    firstf = jnp.flip(lastm, axis=1)   # chain-last becomes flipped-first
    lastf = jnp.flip(first, axis=1)
    # position-within-flipped-chain == 1 marker: previous is flipped-first
    prev_first = jnp.roll(firstf, 1, axis=1)
    prev_first = prev_first.at[:, 0].set(False)
    A2 = jnp.where(firstf | prev_first | ~validf, 0.0, -s)
    B2 = jnp.where(prev_first, yf, c * yf)
    B2 = jnp.where(validf, B2, 0.0)
    d = _affine_scan(A2, B2, 1)
    y_next = jnp.roll(yf, -1, axis=1)
    out_b = c * d + s * y_next
    out_b = jnp.where(firstf, yf, jnp.where(lastf, d, out_b))
    yb = jnp.flip(jnp.where(validf, out_b, yf), axis=1)
    return jnp.where(valid, yb, x)


def rotate_leaves(vals, active, n, k, b_blocks, spread, nmax: int):
    """exp_rotation(dir=-1) batched over leaves. vals (B, nmax)."""
    fK = k.astype(jnp.float32)
    fn = n.astype(jnp.float32)
    factor = jnp.asarray(_SPREAD_FACTOR)[jnp.clip(spread, 0, 3)]
    gain = fn / (fn + factor * fK)
    theta = 0.5 * gain * gain
    c = jnp.cos(0.5 * jnp.pi * theta)[:, None]
    s = jnp.cos(0.5 * jnp.pi * (1.0 - theta))[:, None]
    do_rot = active & (2 * k < n) & (spread != 0)

    stride = jnp.maximum(b_blocks, 1)
    seglen = n // stride
    # stride2 per reference vq.rs exp_rotation
    v = jnp.arange(1, 15, dtype=jnp.int32)
    cond = ((v[None, :] * v[None, :] + v[None, :]) * stride[:, None]
            + (stride[:, None] >> 2)) < n[:, None]
    st2 = 1 + jnp.sum(cond.astype(jnp.int32), axis=1)
    st2 = jnp.where(n >= 8 * stride, st2, 0)

    pos = jnp.arange(nmax, dtype=jnp.int32)[None, :]
    seg = pos // jnp.maximum(seglen, 1)[:, None]
    r = pos - seg * jnp.maximum(seglen, 1)[:, None]
    in_range = pos < (stride * seglen)[:, None]

    out = vals
    # ---- pass A: stride2 chains (only when st2 > 0) ------------------
    # Closed-form chain-contiguous arrangement: each chain gets a fixed
    # CLmax-slot run; q decodes as (seg, chain, t) -> src = seg*seglen +
    # chain + t*st2. Q is padded so seg_count * st2 * CLmax always fits.
    Q = nmax + 128
    stA = jnp.maximum(st2, 1)
    sl = jnp.maximum(seglen, 1)
    clmax = (sl + stA - 1) // stA           # (B,)
    span = stA * clmax                       # slots per segment
    qpos = jnp.arange(Q, dtype=jnp.int32)[None, :]
    segq = qpos // jnp.maximum(span, 1)[:, None]
    remq = qpos - segq * jnp.maximum(span, 1)[:, None]
    chainq = remq // jnp.maximum(clmax, 1)[:, None]
    tq = remq - chainq * jnp.maximum(clmax, 1)[:, None]
    srcq = segq * sl[:, None] + chainq + tq * stA[:, None]
    validq = ((segq < stride[:, None]) & (chainq + tq * stA[:, None]
                                          < sl[:, None]))
    srcq_c = jnp.clip(srcq, 0, nmax - 1)
    xa = jnp.take_along_axis(out, srcq_c, axis=1)
    clenq = (sl[:, None] - chainq + stA[:, None] - 1) // stA[:, None]
    firstA = validq & (tq == 0)
    lastA = validq & (tq == clenq - 1)
    # rot1(seg, seglen, st2, s, c): coefficient args swapped
    ya = _rot1_contig(xa, validq, firstA, lastA, s, c)
    # gather back: position p -> q(p)
    qs = seg * jnp.maximum(span, 1)[:, None] + (r % stA[:, None]) * \
        jnp.maximum(clmax, 1)[:, None] + (r // stA[:, None])
    outA = jnp.take_along_axis(ya, jnp.clip(qs, 0, Q - 1), axis=1)
    out = jnp.where(do_rot[:, None] & (st2 > 0)[:, None] & in_range,
                    outA, out)
    # ---- pass B: stride-1 chains == segments (already contiguous) ----
    firstB = in_range & (r == 0)
    lastB = in_range & (r == jnp.maximum(seglen, 1)[:, None] - 1)
    yb = _rot1_contig(out, in_range, firstB, lastB, c, s)
    out = jnp.where(do_rot[:, None] & in_range, yb, out)
    return out

# ------------------------------------------------------ P3/P4: full executor

def _apply_combo(x, sel, mats: np.ndarray):
    """x (S, N) -> per-stream selected linear transform from mats (NC,N,N).

    One gathered batched matmul instead of NC masked matmuls: keeps the
    XLA graph small (compile time) and puts the work on the MXU. HIGHEST
    precision — bf16 passes would break parity with the f64 reference.
    """
    m = jnp.take(jnp.asarray(mats), sel, axis=0)          # (S, N, N)
    return jnp.einsum("sn,smn->sm", x, m,
                      precision=jax.lax.Precision.HIGHEST)


_BOOL_PLANES = ("direct", "pvq_active", "call_active", "call_has_lb",
                "call_norm_write", "fill_active", "fill_fold",
                "merge_active", "merge_inv", "theta2_active", "theta2_cswap",
                "theta2_inv", "n1_active", "ac_on")
_U32_PLANES = ("pvq_idx", "fill_seed", "ac_seed")
_F32_PLANES = ("pvq_gain", "fill_gain", "merge_mid", "theta2_sign",
               "theta2_mid", "theta2_side", "n1_val", "ac_r")


def _normalize_plan(p: dict) -> dict:
    """Cast plan planes to canonical executor dtypes (bool/i32/u32/f32).

    Accepts both the Python packer's wide dtypes and the narrow
    arena-view dtypes emitted by the native host (host_native.py)."""
    def cast(key, v):
        if key in _BOOL_PLANES:
            return v if v.dtype == jnp.bool_ else (v != 0)
        if key in _U32_PLANES:
            return v.astype(jnp.uint32)
        if key in _F32_PLANES:
            return v.astype(jnp.float32)
        return v.astype(jnp.int32)
    out = {k: ([cast(k, t) for t in p[k]] if isinstance(p[k], list) else
               cast(k, p[k])) for k in PLAN_KEYS if k in p}
    if "call_dup" not in out:  # pre-hybrid plan dicts carry no dup ops
        S = out["direct"].shape[0]
        out["call_dup"] = jnp.zeros((S, 21, 2, 3), jnp.int32)
    return out


@partial(jax.jit, static_argnames=("channels", "frame", "lm", "start", "end"))
def execute_packed(p: dict, x_direct, *, channels: int, frame: int, lm: int,
                   start: int, end: int, mats=None):
    """Run S packed band plans; returns the X plane (S, channels*frame) f32.

    x_direct: (S, channels, frame) fallback spectra for direct streams.
    mats: (pre, post) stacked combo operators from plan_combo_mats — pass
    them as runtime args in production jits (None falls back to baked-in
    constants, acceptable only for small test invocations).
    """
    p = _normalize_plan(p)
    mode = opus_custom_mode(48000, 960)
    eb = [int(v) for v in mode.ebands]
    nb = mode.num_ebands
    M = 1 << lm
    norm_offset = M * eb[start]
    norm_len = M * eb[nb - 1] - norm_offset
    npad = norm_len + 192
    S = p["direct"].shape[0]
    # tier slot counts come from the plane shapes (the host may run a
    # shrunk serving profile — host_native.set_plan_profile); nmax per
    # tier is fixed. Pool offsets follow the actual slot counts.
    tiers = tuple((TIERS[t][0], int(p["pvq_active"][t].shape[1]))
                  for t in range(3))
    offs = [1]
    for nmax, slots in tiers:
        offs.append(offs[-1] + nmax * slots)
    A_J, C_J = _lcg_jump()
    A_J = jnp.asarray(A_J)
    C_J = jnp.asarray(C_J)

    # ---- P1 + P2: PVQ leaves per tier -> pool ------------------------
    parts = [jnp.zeros((S, 1), jnp.float32)]
    for t, (nmax, slots) in enumerate(tiers):
        act = p["pvq_active"][t].reshape(-1)
        n = p["pvq_n"][t].reshape(-1)
        k = p["pvq_k"][t].reshape(-1)
        iy = cwrs_walk(act, n, k, p["pvq_idx"][t].reshape(-1), nmax)
        ryy = jnp.sum((iy * iy).astype(jnp.float32), axis=1)
        g = jnp.where(ryy > 0,
                      p["pvq_gain"][t].reshape(-1) / jnp.sqrt(ryy), 0.0)
        vals = iy.astype(jnp.float32) * g[:, None]
        vals = rotate_leaves(vals, act, n, k, p["pvq_b"][t].reshape(-1),
                             p["pvq_spread"][t].reshape(-1), nmax)
        parts.append(vals.reshape(S, slots * nmax))
    pool = jnp.concatenate(parts, axis=1)

    # Build the pool->X gather map on device from per-slot leaf offsets
    # (pvq_dst): the host used to ship a (S, C*frame) int16 map plane —
    # ~1 MB/step at S=256, 40% of the a16 arena. Spans are disjoint, so a
    # difference-array cumsum reconstructs map[c] = base + (c - dst) inside
    # each slot's [dst, dst+n) span and 0 (the pool zero cell) elsewhere,
    # from just 2 scattered points per slot.
    Cf = channels * frame
    rows = jnp.arange(S, dtype=jnp.int32)[:, None]
    d1 = jnp.zeros((S, Cf + 1), jnp.int32)
    d2 = jnp.zeros((S, Cf + 1), jnp.int32)
    for t, (nmax, slots) in enumerate(tiers):
        base_t = (offs[t] + np.arange(slots, dtype=np.int32) * nmax)
        act = p["pvq_active"][t].astype(jnp.int32)
        dst = p["pvq_dst"][t]
        lo = jnp.where(act > 0, dst, Cf)
        hi = jnp.where(act > 0, dst + p["pvq_n"][t], Cf)
        v = jnp.where(act > 0, jnp.asarray(base_t)[None, :] - dst, 0)
        d1 = d1.at[rows, lo].add(act).at[rows, hi].add(-act)
        d2 = d2.at[rows, lo].add(v).at[rows, hi].add(-v)
    ind = jnp.cumsum(d1[:, :Cf], axis=1)
    cs2 = jnp.cumsum(d2[:, :Cf], axis=1)
    map_dev = ind * jnp.arange(Cf, dtype=jnp.int32)[None, :] + cs2
    X = jnp.take_along_axis(pool, map_dev, axis=1)  # (S, C*frame)

    # ---- P3: band assembly -------------------------------------------
    # Sequential over bands (fold lowbands read previously decoded bands),
    # but as a lax.scan with band-major plan planes so the ~45-op body
    # compiles ONCE for all 21 bands instead of being unrolled 21x2 times
    # (executable size: see the note in _affine_scan).
    if mats is None:
        mats = plan_combo_mats(channels, frame)
    pre_stack, post_stack = mats
    NBMAX = 22 * M
    # + 0*X[:, :1]: inherit the shard_map varying axis (see cwrs_walk)
    norm = jnp.zeros((S, npad), jnp.float32) + 0.0 * X[:, :1]
    norm2 = norm

    n_b_np = np.array([M * (eb[i + 1] - eb[i]) for i in range(start, end)],
                      np.int32)
    boff_np = np.array([M * eb[i] for i in range(start, end)], np.int32)
    nwoff_np = boff_np - norm_offset
    nw_ok_np = (nwoff_np >= 0) & (nwoff_np + n_b_np <= norm_len)
    scale_np = np.where(n_b_np > 1, np.sqrt(n_b_np.astype(np.float64)),
                        1.0).astype(np.float32)

    def bm(x):
        """(S, 21, ...) plan plane -> band-major (nbands, S, ...)."""
        return jnp.moveaxis(x, 1, 0)[start:end]

    xs = {
        "n_b": jnp.asarray(n_b_np), "boff": jnp.asarray(boff_np),
        "nwoff": jnp.asarray(np.clip(nwoff_np, 0, max(0, npad - NBMAX))),
        "nw_ok": jnp.asarray(nw_ok_np), "scale": jnp.asarray(scale_np),
        "is1": jnp.asarray(n_b_np == 1), "is2": jnp.asarray(n_b_np == 2),
        "gt2": jnp.asarray(n_b_np > 2),
        "ca": bm(p["call_active"]), "src": bm(p["call_lb_src"]),
        "lbuf": bm(p["call_lb_buf"]), "blendu": bm(p["call_blend_upto"]),
        "pre": bm(p["call_pre"]), "post": bm(p["call_post"]),
        "nwr": bm(p["call_norm_write"]), "nbuf": bm(p["call_norm_buf"]),
        "dup": bm(p["call_dup"]),
        "fa": bm(p["fill_active"]), "ff": bm(p["fill_fold"]),
        "foff": bm(p["fill_off"]), "fn": bm(p["fill_n"]),
        "fg": bm(p["fill_gain"]), "fseed": bm(p["fill_seed"]),
        "n1a": bm(p["n1_active"]), "n1v": bm(p["n1_val"]),
        "pre_m": pre_stack[start:end], "post_m": post_stack[start:end],
    }
    if channels == 2:
        xs.update({
            "ma": p["merge_active"].T[start:end],
            "mmid": p["merge_mid"].T[start:end],
            "minv": p["merge_inv"].T[start:end],
            "ta": p["theta2_active"].T[start:end],
            "tcsw": p["theta2_cswap"].T[start:end],
            "tsgn": p["theta2_sign"].T[start:end],
            "tmid": p["theta2_mid"].T[start:end],
            "tside": p["theta2_side"].T[start:end],
            "tinv": p["theta2_inv"].T[start:end],
        })
    posb = jnp.arange(NBMAX, dtype=jnp.int32)

    def band_body(carry, bz):
        X, norm, norm2 = carry
        n_b = bz["n_b"]
        boff = bz["boff"]
        valid = (posb < n_b)[None, :]
        bx = []
        for slot in range(channels):
            cur = lax.dynamic_slice(X, (0, slot * frame + boff), (S, NBMAX))
            act = bz["ca"][:, slot]
            src = bz["src"][:, slot]
            gidx = src[:, None] + posb[None, :]
            gc = jnp.clip(gidx, 0, npad - 1)
            nv = jnp.take_along_axis(norm, gc, axis=1)
            n2v = jnp.take_along_axis(norm2, gc, axis=1)
            # special_hybrid_folding (bands.rs): window-local duplicate of
            # the first band's folding data before the gather is consumed
            dup = bz["dup"][:, slot]
            d_rel = posb[None, :] - dup[:, 0:1]
            in_dup = (d_rel >= 0) & (d_rel < dup[:, 2:3])
            sidx = jnp.clip(dup[:, 1:2] + d_rel, 0, n_b - 1)
            nv = jnp.where(in_dup, jnp.take_along_axis(nv, sidx, axis=1), nv)
            n2v = jnp.where(in_dup,
                            jnp.take_along_axis(n2v, sidx, axis=1), n2v)
            blend = gidx < bz["blendu"][:, slot][:, None]
            base = jnp.where((bz["lbuf"][:, slot] == 1)[:, None], n2v, nv)
            scr = jnp.where(blend, 0.5 * (nv + n2v), base)
            scr = jnp.einsum(
                "sn,smn->sm", scr,
                jnp.take(bz["pre_m"], bz["pre"][:, slot], axis=0),
                precision=jax.lax.Precision.HIGHEST)
            # fold/noise fills — all FILL_SLOTS at once (windows disjoint)
            fa = bz["fa"][:, slot, :] & act[:, None]
            offr = bz["foff"][:, slot, :]
            fn = bz["fn"][:, slot, :]
            d = posb[None, None, :] - offr[:, :, None]
            inw = (d >= 0) & (d < fn[:, :, None])
            dc = jnp.clip(d + 1, 0, _LCG_MAX - 1)
            seed0 = bz["fseed"][:, slot, :]
            seeds = A_J[dc] * seed0[:, :, None] + C_J[dc]
            plus = (seeds & jnp.uint32(0x8000)) != 0
            fold_v = jnp.where(plus, scr[:, None, :] + 1.0 / 256,
                               scr[:, None, :] - 1.0 / 256)
            noise_v = (seeds.astype(jnp.int32) >> 20).astype(jnp.float32)
            vals = jnp.where(bz["ff"][:, slot, :][:, :, None],
                             fold_v, noise_v)
            vals = jnp.where(inw, vals, 0.0)
            E = 1e-15 + jnp.sum(vals * vals, axis=2)
            g = bz["fg"][:, slot, :] / jnp.sqrt(E)
            live = fa[:, :, None] & inw
            contrib = jnp.where(live, vals * g[:, :, None], 0.0)
            covered = jnp.any(live, axis=1)
            sl = jnp.where(covered, jnp.sum(contrib, axis=1), cur)
            sl = jnp.einsum(
                "sn,smn->sm", sl,
                jnp.take(bz["post_m"], bz["post"][:, slot], axis=0),
                precision=jax.lax.Precision.HIGHEST)
            # n_b == 1: the n1 sign path replaces the whole band
            sl_n1 = jnp.where(bz["n1a"][:, slot][:, None]
                              & (posb[None, :] == 0),
                              bz["n1v"][:, slot][:, None], cur)
            sl = jnp.where(bz["is1"], sl_n1, sl)
            bx.append(sl)
        # norm writes (pre-merge, as in quant_band)
        nwoff = bz["nwoff"]
        for slot in range(channels):
            nw = (bz["nwr"][:, slot] & bz["ca"][:, slot])
            tobuf2 = bz["nbuf"][:, slot] == 1
            val = bz["scale"] * bx[slot]
            cur_n = lax.dynamic_slice(norm, (0, nwoff), (S, NBMAX))
            cur_n2 = lax.dynamic_slice(norm2, (0, nwoff), (S, NBMAX))
            wmask = valid & bz["nw_ok"]
            norm = lax.dynamic_update_slice(
                norm, jnp.where((nw & ~tobuf2)[:, None] & wmask, val, cur_n),
                (0, nwoff))
            norm2 = lax.dynamic_update_slice(
                norm2,
                jnp.where((nw & tobuf2)[:, None] & wmask, val, cur_n2),
                (0, nwoff))
        if channels == 2:
            # N == 2 stereo butterfly
            ta = bz["ta"] & bz["is2"]
            sgn = bz["tsgn"]
            cs = bz["tcsw"]
            mid = bz["tmid"]
            side = bz["tside"]
            x0, x1 = bx
            der0 = jnp.stack([-sgn * x1[:, 1], sgn * x1[:, 0]], axis=1)
            der1 = jnp.stack([-sgn * x0[:, 1], sgn * x0[:, 0]], axis=1)
            nx = jnp.where(cs[:, None], der0, x0[:, :2])
            ny = jnp.where(cs[:, None], x1[:, :2], der1)
            nx = nx * mid[:, None]
            ny = ny * side[:, None]
            ox = nx - ny
            oy = nx + ny
            oy = jnp.where(bz["tinv"][:, None], -oy, oy)
            ox_f = jnp.concatenate([ox, x0[:, 2:]], axis=1)
            oy_f = jnp.concatenate([oy, x1[:, 2:]], axis=1)
            bx = [jnp.where(ta[:, None], ox_f, x0),
                  jnp.where(ta[:, None], oy_f, x1)]
            # stereo merge (n_b > 2)
            ma = bz["ma"] & bz["gt2"]
            mmid = bz["mmid"]
            x0, x1 = bx
            x0v = jnp.where(valid, x0, 0.0)
            x1v = jnp.where(valid, x1, 0.0)
            xp = jnp.sum(x0v * x1v, axis=1) * mmid
            sd = jnp.sum(x1v * x1v, axis=1)
            el = mmid * mmid + sd - 2 * xp
            er = mmid * mmid + sd + 2 * xp
            degen = (er < 6e-4) | (el < 6e-4)
            lg = 1.0 / jnp.sqrt(jnp.maximum(el, 1e-20))
            rg = 1.0 / jnp.sqrt(jnp.maximum(er, 1e-20))
            lpart = mmid[:, None] * x0
            mx = lg[:, None] * (lpart - x1)
            my = rg[:, None] * (lpart + x1)
            mx = jnp.where(degen[:, None], x0, mx)
            my = jnp.where(degen[:, None], x0, my)
            inv = bz["minv"]
            my = jnp.where(inv[:, None], -my, my)
            x1k = jnp.where(inv[:, None] & bz["gt2"], -x1, x1)
            bx = [jnp.where(ma[:, None], mx, x0),
                  jnp.where(ma[:, None], my, x1k)]
        for slot in range(channels):
            cur = lax.dynamic_slice(X, (0, slot * frame + boff), (S, NBMAX))
            X = lax.dynamic_update_slice(
                X, jnp.where(valid, bx[slot], cur),
                (0, slot * frame + boff))
        return (X, norm, norm2), None

    (X, norm, norm2), _ = lax.scan(band_body, (X, norm, norm2), xs)

    # ---- P4: anti-collapse (whole-plane vectorized) -------------------
    # The per-(band, channel) LCG draw counts are known upfront, so every
    # position's seed comes from one closed-form jump (A_J/C_J); band
    # energies for the renormalise come from one indicator matmul.
    ac_on = p["ac_on"]
    seed0 = p["ac_seed"]
    nbins = M * eb[end]
    band_of = np.full(nbins, -1, np.int32)
    basep = np.zeros(nbins, np.int32)
    for i in range(start, end):
        band_of[M * eb[i]:M * eb[i + 1]] = i
        basep[M * eb[i]:M * eb[i + 1]] = M * eb[i]
    qpos = np.arange(nbins)
    valid_np = band_of >= 0
    band_of_c = np.where(valid_np, band_of, 0).astype(np.int32)
    kpos_np = ((qpos - basep) & (M - 1)).astype(np.int32)
    jpos_np = ((qpos - basep) >> lm).astype(np.int32)
    n0_np = np.array([eb[i + 1] - eb[i] for i in range(nb)], np.int32)
    ind = np.zeros((nbins, nb), np.float32)
    ind[qpos[valid_np], band_of[valid_np]] = 1.0
    in_rng = np.zeros(nb, np.int32)
    in_rng[start:end] = 1

    kk = jnp.arange(M, dtype=jnp.int32)
    cl = ((~p["ac_masks"][:, :, :, None]) >> kk[None, None, None, :]) & 1
    cl = cl * jnp.asarray(in_rng)[None, :, None, None]      # (S, nb, 2, M)
    prefc = jnp.cumsum(cl, axis=3) - cl                     # cleared below k
    cnt = jnp.sum(cl, axis=3) * jnp.asarray(n0_np)[None, :, None]
    cntC = cnt[:, :, :channels].reshape(S, -1)              # (i-major, c-minor)
    cum_prior = (jnp.cumsum(cntC, axis=1) - cntC).reshape(S, nb, channels)

    bmap = jnp.asarray(band_of_c)
    kmap = jnp.asarray(kpos_np)
    jmap = jnp.asarray(jpos_np)
    vmask = jnp.asarray(valid_np)
    n0q = jnp.asarray(n0_np)[bmap]
    indm = jnp.asarray(ind)
    for c in range(channels):
        prefq = prefc[:, bmap, c, kmap]                     # (S, nbins)
        clrq = cl[:, bmap, c, kmap] == 1
        ddraw = prefq * n0q[None, :] + jmap[None, :] + 1
        dd = jnp.clip(cum_prior[:, :, c][:, bmap] + ddraw, 0, _LCG_MAX - 1)
        seeds = A_J[dd] * seed0[:, None] + C_J[dd]
        rq = p["ac_r"][:, c, :][:, bmap]
        val = jnp.where((seeds & jnp.uint32(0x8000)) != 0, rq, -rq)
        xplane = lax.dynamic_slice(X, (0, c * frame), (S, nbins))
        inject = clrq & ac_on[:, None] & vmask[None, :]
        x2 = jnp.where(inject, val, xplane)
        Eb = 1e-15 + jnp.einsum("sq,qb->sb", x2 * x2, indm,
                                precision=jax.lax.Precision.HIGHEST)
        gb = 1.0 / jnp.sqrt(Eb)
        anyb = (cnt[:, :, c] > 0) & ac_on[:, None]          # (S, nb)
        gq = jnp.where(anyb[:, bmap] & vmask[None, :], gb[:, bmap], 1.0)
        X = lax.dynamic_update_slice(X, x2 * gq, (0, c * frame))

    X = jnp.where(p["direct"][:, None], x_direct.reshape(S, -1), X)
    return X


# Keys of the packed-plan pytree consumed by execute_packed (the host's
# decode_plan buffers also carry x_direct/band_log_e/iflags/... outputs).
PLAN_KEYS = (
    "direct", "pvq_active", "pvq_n", "pvq_k", "pvq_b", "pvq_spread",
    "pvq_gain", "pvq_idx", "pvq_dst", "call_active", "call_has_lb",
    "call_lb_src", "call_lb_buf", "call_blend_upto", "call_pre", "call_post",
    "call_norm_write", "call_norm_buf", "fill_active", "fill_fold",
    "fill_off", "fill_n", "fill_gain", "fill_seed", "merge_active",
    "merge_mid", "merge_inv", "theta2_active", "theta2_cswap", "theta2_sign",
    "theta2_mid", "theta2_side", "theta2_inv", "n1_active", "n1_val",
    "ac_on", "ac_masks", "ac_r", "ac_seed", "call_dup")


@partial(jax.jit, static_argnames=("channels",))
def plan_synthesis_step(consts, state, packed, x_direct, band_log_e,
                        transient, silence, pf_pitch, pf_gain, pf_tapset,
                        channels: int = 2, mats=None):
    """Fused device step: band-plan execution + CELT synthesis (20 ms)."""
    from .synthesis_jax import FrameDesc, synthesis_step
    X = execute_packed(packed, x_direct, channels=channels, frame=960,
                       lm=3, start=0, end=21, mats=mats)
    desc = FrameDesc(x=X.reshape(-1, channels, 960), band_log_e=band_log_e,
                     transient=transient, silence=silence, pf_pitch=pf_pitch,
                     pf_gain=pf_gain, pf_tapset=pf_tapset)
    return synthesis_step(consts, state, desc, channels=channels)


def unpack_plan_arenas(a32, a16, a8, *, channels: int, frame: int):
    """Reconstruct the LOGICAL plan-plane dict from the three packed
    arenas (wire format v4 — bit-packed flags, pooled fills/dups, and
    sequential 12-byte PVQ leaf records that are tier-scattered HERE,
    on device, so the host writes one contiguous record stream; the
    numpy twin is host_native.wire_to_logical).

    Traced: slicing at static offsets is free for XLA; f32/u32 planes are
    same-width bitcasts of the int32 arena (no endianness concerns); the
    bitfield splits, the record cumsum, and the pool scatters are a few
    fused elementwise ops — the host-store/arena savings are worth far
    more than they cost. Returns (p, ble, pf_gain, iflags): p has
    PLAN_KEYS (narrow dtypes — execute_packed normalizes), ble is
    (S, 2, 21) f32.
    """
    from ..celt.host_native import (_DUP, _FILL, _PLANE_DTYPES, _POOL,
                                    _TIERS, plan_arena_layout)

    arenas = {"a8": a8, "a16": a16, "a32": a32}

    def nelems(shape):
        n = 1
        for d in shape:
            n *= d
        return n

    # every arena plane scales linearly with S, so recover S from a8's
    # total length via the S=1 layout
    _, sizes1 = plan_arena_layout(1, channels, frame)
    S = a8.shape[0] // sizes1["a8"]
    layout, _ = plan_arena_layout(S, channels, frame)

    def plane(key):
        name, off, shape = layout[key]
        base = key[0] if isinstance(key, tuple) else key
        dt = np.dtype(_PLANE_DTYPES[base])
        v = lax.slice(arenas[name], (off,), (off + nelems(shape),))
        if dt == np.float32:
            v = lax.bitcast_convert_type(v, jnp.float32)
        elif dt == np.uint32:
            v = lax.bitcast_convert_type(v, jnp.uint32)
        elif dt == np.uint16:
            v = lax.bitcast_convert_type(v, jnp.uint16)
        return v.reshape(shape)

    p = {"direct": plane("direct")}
    p["pvq_active"], p["pvq_n"], p["pvq_k"] = [], [], []
    p["pvq_b"], p["pvq_spread"] = [], []
    p["pvq_gain"], p["pvq_idx"], p["pvq_dst"] = [], [], []
    # sequential leaf records -> tier planes (one scatter per tier; the
    # slot index within a tier is a cumsum over same-tier records, which
    # reproduces the host's emission order exactly)
    rec = plane("pvq_rec")                          # (S, R, 3) uint32
    cnt = plane("pvq_cnt").astype(jnp.int32)        # (S,)
    spread_s = plane("spread8").astype(jnp.int32)   # (S,) frame-wide
    R = rec.shape[1]
    w0r = rec[..., 0]                               # uint32 (dst in 21..31)
    validr = jnp.arange(R, dtype=jnp.int32)[None, :] < cnt[:, None]
    tierr = jnp.where(validr, ((w0r >> 19) & 3).astype(jnp.int32), -1)
    rrows = jnp.arange(S, dtype=jnp.int32)[:, None]
    for t, (_, slots) in enumerate(_TIERS):
        sel = tierr == t
        pos = jnp.cumsum(sel.astype(jnp.int32), axis=1) - 1
        j = jnp.where(sel, pos, slots)              # invalid -> dropped
        rt = jnp.zeros((S, slots, 3), jnp.uint32).at[rrows, j].set(
            rec, mode="drop")
        w0 = rt[..., 0]                             # uint32
        k = ((w0 >> 8) & 0xFF).astype(jnp.int32)
        act = (k > 0).astype(jnp.int32)             # scatter hit == active
        p["pvq_active"].append(act)
        p["pvq_n"].append((w0 & 0xFF).astype(jnp.int32))
        p["pvq_k"].append(k)
        p["pvq_b"].append(jnp.where(
            act == 1, 1 << ((w0 >> 16) & 7).astype(jnp.int32), 0))
        p["pvq_spread"].append(spread_s[:, None] * act)
        p["pvq_gain"].append(
            lax.bitcast_convert_type(rt[..., 1], jnp.float32))
        p["pvq_idx"].append(rt[..., 2])
        p["pvq_dst"].append(((w0 >> 21) & 0x7FF).astype(jnp.int32))

    cf = plane("call_flags").astype(jnp.int32)
    p["call_active"] = cf & 1
    p["call_has_lb"] = (cf >> 1) & 1
    p["call_lb_buf"] = (cf >> 2) & 1
    p["call_norm_write"] = (cf >> 3) & 1
    p["call_norm_buf"] = (cf >> 4) & 1
    combo = plane("call_combo")
    p["call_pre"] = combo
    p["call_post"] = combo
    p["call_lb_src"] = plane("call_lb_src")
    p["call_blend_upto"] = plane("call_blend_upto")

    rows = jnp.arange(S, dtype=jnp.int32)[:, None]
    # dup pool -> dense (S, 21, 2, 3); invalid entries drop out of bounds
    dp = plane("dup_pool").astype(jnp.int32)          # (S, _DUP, 4)
    didx = jnp.where(dp[:, :, 3] > 0, dp[:, :, 0], 42)
    dup = jnp.zeros((S, 42, 3), jnp.int32).at[rows, didx].set(
        dp[:, :, 1:4], mode="drop")
    p["call_dup"] = dup.reshape(S, 21, 2, 3)

    # fill pool -> dense (S, 21, 2, F): scatter by callid with an
    # occurrence index among same-call entries (pool order == call order)
    cid8 = plane("fill_cid").astype(jnp.int32)        # (S, _POOL)
    fact = cid8 & 1
    cid = cid8 >> 2
    tri = jnp.asarray(np.tril(np.ones((_POOL, _POOL), bool), -1))
    eq = (cid[:, :, None] == cid[:, None, :]) & (fact[:, None, :] == 1)
    occ = jnp.sum(eq & tri[None], axis=2)             # (S, _POOL)
    fidx = jnp.where(fact == 1, cid * _FILL + jnp.minimum(occ, _FILL - 1),
                     42 * _FILL)
    f4 = (S, 21, 2, _FILL)

    def scat(v, dt):
        return jnp.zeros((S, 42 * _FILL), dt).at[rows, fidx].set(
            v.astype(dt), mode="drop").reshape(f4)

    p["fill_active"] = scat(fact, jnp.int32)
    p["fill_fold"] = scat((cid8 >> 1) & 1, jnp.int32)
    p["fill_off"] = scat(plane("fill_off"), jnp.int32)
    p["fill_n"] = scat(plane("fill_n"), jnp.int32)
    p["fill_gain"] = scat(plane("fill_gain"), jnp.float32)
    p["fill_seed"] = scat(plane("fill_seed"), jnp.uint32)

    bf = plane("bm_flags").astype(jnp.int32)
    mid = plane("bm_mid")
    p["merge_active"] = bf & 1
    p["merge_inv"] = (bf >> 1) & 1
    p["merge_mid"] = mid
    p["theta2_active"] = (bf >> 2) & 1
    p["theta2_cswap"] = (bf >> 3) & 1
    p["theta2_inv"] = (bf >> 4) & 1
    p["theta2_sign"] = jnp.where((bf >> 5) & 1, -1.0, 1.0)
    p["theta2_mid"] = mid
    p["theta2_side"] = plane("bm_side")

    n1 = plane("n1_as").astype(jnp.int32)
    p["n1_active"] = n1 & 1
    p["n1_val"] = jnp.where((n1 >> 1) & 1, -1.0, 1.0)

    for k in ("ac_on", "ac_masks", "ac_r", "ac_seed", "lost8"):
        p[k] = plane(k)
    return p, plane("ble32"), plane("pf32"), plane("iflags")


@partial(jax.jit, static_argnames=("channels", "frame"))
def plan_synthesis_step_arena(consts, state, a32, a16, a8, x_direct,
                              mats=None, channels: int = 2,
                              frame: int = 960):
    """Fused device step from packed arenas: unpack + band-plan execution
    + CELT synthesis (frame = 120/240/480/960 samples, LM 0-3). The host
    ships 3 arena transfers + x_direct per step (see
    host_native.decode_plan_arenas); consts must be make_consts(n=frame),
    mats should be plan_combo_mats(channels, frame) (runtime arg keeps the
    compiled executable small)."""
    from .synthesis_jax import FrameDesc, synthesis_step
    lm = {120: 0, 240: 1, 480: 2, 960: 3}[frame]
    p, ble, pf_gain, iflags = unpack_plan_arenas(a32, a16, a8,
                                                 channels=channels,
                                                 frame=frame)
    X = execute_packed(p, x_direct, channels=channels, frame=frame,
                       lm=lm, start=0, end=21, mats=mats)
    ble_pad = jnp.pad(ble[:, :channels, :], ((0, 0), (0, 0), (0, 1)),
                      constant_values=-28.0)
    desc = FrameDesc(x=X.reshape(-1, channels, frame), band_log_e=ble_pad,
                     transient=iflags[:, 0] != 0, silence=iflags[:, 1] != 0,
                     pf_pitch=iflags[:, 2], pf_gain=pf_gain,
                     pf_tapset=iflags[:, 3])
    return synthesis_step(consts, state, desc, channels=channels, n=frame)


@partial(jax.jit, static_argnames=("channels", "frame", "n_streams"))
def plan_synthesis_step_backing(consts, state, backing, x_direct, mats=None,
                                channels: int = 2, frame: int = 960,
                                n_streams: int = None):
    """plan_synthesis_step_arena over ONE int32 backing buffer holding all
    three arenas (host_native.alloc_plan_arenas packs a32|a16|a8 into a
    single H2D transfer; slicing + bitcasts are free for XLA)."""
    from ..celt.host_native import arena_word_layout
    S = n_streams
    n32, o16, n16, o8, n8, _total = arena_word_layout(S, channels, frame)
    a32 = lax.slice(backing, (0,), (n32,))
    a16 = lax.bitcast_convert_type(
        lax.slice(backing, (o16,), (o16 + (n16 + 1) // 2,)),
        jnp.int16).reshape(-1)[:n16]
    a8 = lax.bitcast_convert_type(
        lax.slice(backing, (o8,), (o8 + (n8 + 3) // 4,)),
        jnp.uint8).reshape(-1)[:n8]
    return plan_synthesis_step_arena(consts, state, a32, a16, a8, x_direct,
                                     mats, channels=channels, frame=frame)


@partial(jax.jit, static_argnames=("channels", "frame", "n_streams"))
def plan_synthesis_step_plc(consts, plc_consts, state, plc_state, backing,
                            x_direct, lost, mats=None, channels: int = 2,
                            frame: int = 960, n_streams: int = None):
    """plan_synthesis_step_backing + per-stream packet-loss concealment.

    lost: (S,) bool, or None to read the arena's lost8 plane (written by
    the host pipeline; riding the arena transfer saves one fixed-cost H2D
    per step). Lost streams ignore their (stale) plan rows and take
    the device PLC re-entry spectrum (ops/plc_jax.py: pitch-extrapolated
    excitation through the LPC envelope, forward-MDCT'd); their postfilter
    params coast at the current state values. The PLC compute sits under a
    lax.cond so loss-free steps skip it without switching executables
    (program alternation costs ~0.8 s on the tunneled device).
    """
    from ..celt.host_native import arena_word_layout
    from .plc_jax import PlcState, celt_plc_freq
    from .synthesis_jax import COMB_MIN, FrameDesc, synthesis_step

    S = n_streams
    n32, o16, n16, o8, n8, _t = arena_word_layout(S, channels, frame)
    a32 = lax.slice(backing, (0,), (n32,))
    a16 = lax.bitcast_convert_type(
        lax.slice(backing, (o16,), (o16 + (n16 + 1) // 2,)),
        jnp.int16).reshape(-1)[:n16]
    a8 = lax.bitcast_convert_type(
        lax.slice(backing, (o8,), (o8 + (n8 + 3) // 4,)),
        jnp.uint8).reshape(-1)[:n8]
    return plan_plc_core(consts, plc_consts, state, plc_state, a32, a16,
                         a8, x_direct, lost, mats, channels=channels,
                         frame=frame, n_streams=S)


def plan_plc_core(consts, plc_consts, state, plc_state, a32, a16, a8,
                  x_direct, lost, mats=None, channels: int = 2,
                  frame: int = 960, n_streams: int = None):
    """Arena-level body of plan_synthesis_step_plc (also the shard_map
    inner of parallel.streaming.sharded_plan_step_plc: each device unpacks
    its OWN local arena triple, and the lax.cond PLC gate is per-shard)."""
    from .plc_jax import PlcState, celt_plc_freq
    from .synthesis_jax import COMB_MIN, FrameDesc, synthesis_step

    S = n_streams
    lm = {120: 0, 240: 1, 480: 2, 960: 3}[frame]
    p, ble, pf_gain, iflags = unpack_plan_arenas(a32, a16, a8,
                                                 channels=channels,
                                                 frame=frame)
    if lost is None:
        lost = p["lost8"] != 0
    X = execute_packed(p, x_direct, channels=channels, frame=frame,
                       lm=lm, start=0, end=21, mats=mats)

    def do_plc(_):
        return celt_plc_freq(plc_consts, state, plc_state, lost,
                             channels=channels, frame=frame)

    def no_plc(_):
        new_plc = PlcState(
            loss_count=jnp.where(lost, plc_state.loss_count + 1,
                                 jnp.zeros_like(plc_state.loss_count)),
            plc_pitch=plc_state.plc_pitch, lpc=plc_state.lpc)
        # 0*x_direct keeps the varying manual axes under shard_map (a
        # fresh zeros constant would mismatch do_plc's output type)
        return (0.0 * x_direct).astype(jnp.float32), new_plc

    freq_plc, new_plc = lax.cond(jnp.any(lost), do_plc, no_plc, None)

    ble_pad = jnp.pad(ble[:, :channels, :], ((0, 0), (0, 0), (0, 1)),
                      constant_values=-28.0)
    desc = FrameDesc(
        x=X.reshape(-1, channels, frame), band_log_e=ble_pad,
        transient=jnp.where(lost, False, iflags[:, 0] != 0),
        silence=jnp.where(lost, False, iflags[:, 1] != 0),
        pf_pitch=jnp.where(lost, jnp.maximum(state.pf_period, COMB_MIN),
                           iflags[:, 2]),
        pf_gain=jnp.where(lost, state.pf_gain, pf_gain),
        pf_tapset=jnp.where(lost, state.pf_tapset, iflags[:, 3]))
    pcm, new_state = synthesis_step(consts, state, desc, channels=channels,
                                    n=frame, lost=lost, freq_plc=freq_plc)
    return pcm, new_state, new_plc


@partial(jax.jit, static_argnames=("channels", "frame", "n_streams"))
def plan_synthesis_scan(consts, plc_consts, state, plc_state, backings,
                        x_directs, losts, mats=None, channels: int = 2,
                        frame: int = 960, n_streams: int = None):
    """lax.scan of plan_synthesis_step_plc over K stacked frames.

    backings: (K, total_words) int32 — K packed plan arenas; x_directs:
    (K, S, C, frame) direct-fallback spectra; losts: (K, S) bool.

    One device dispatch decodes K frames per stream (state threads through
    the scan), so offline/readback consumers — the bench quality gate,
    file decode — pay the tunneled-session per-dispatch cost ONCE instead
    of K times. Returns ((K, S, frame, channels) pcm, state, plc_state).
    """
    def body(carry, inp):
        st, pst = carry
        backing, xd, lost = inp
        pcm, st, pst = plan_synthesis_step_plc(
            consts, plc_consts, st, pst, backing, xd, lost, mats,
            channels=channels, frame=frame, n_streams=n_streams)
        return (st, pst), pcm

    if losts is None:
        def body0(carry, inp):
            return body(carry, (inp[0], inp[1], None))
        (state, plc_state), pcm = lax.scan(
            body0, (state, plc_state), (backings, x_directs))
    else:
        (state, plc_state), pcm = lax.scan(
            body, (state, plc_state), (backings, x_directs, losts))
    return pcm, state, plc_state
