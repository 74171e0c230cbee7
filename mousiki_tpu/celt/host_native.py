"""ctypes binding for the native (C++) CELT host symbol decoder.

The native library implements the serial range-decode half of the CELT
decoder (native/celt_host.cpp) and emits the same frame descriptors as
`CeltDecoder.decode_with_ec(..., return_desc=True)`; the batched JAX
synthesis stage consumes them. Falls back gracefully when the shared
library hasn't been built (`available()` returns False).
"""

from __future__ import annotations

import ctypes as C
import os
import subprocess

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_ROOT, "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libcelt_host.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "celt_host.cpp")

_lib = None


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-pthread",
             "-o", _SO_PATH, _SRC_PATH],
            check=True, capture_output=True, cwd=_NATIVE_DIR)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO_PATH) or (
            os.path.exists(_SRC_PATH)
            and os.path.getmtime(_SRC_PATH) > os.path.getmtime(_SO_PATH)):
        if not os.path.exists(_SRC_PATH) or not _build():
            return None
    try:
        lib = C.CDLL(_SO_PATH)
    except OSError:
        return None
    lib.celt_host_create.restype = C.c_void_p
    lib.celt_host_destroy.argtypes = [C.c_void_p]
    lib.celt_host_reset.argtypes = [C.c_void_p]
    dp = C.POINTER(C.c_double)
    fp = C.POINTER(C.c_float)
    lib.celt_host_set_state.argtypes = [C.c_void_p, dp, dp, dp, C.c_uint32]
    lib.celt_host_get_state.argtypes = [C.c_void_p, dp, dp, dp,
                                        C.POINTER(C.c_uint32)]
    lib.celt_host_decode.restype = C.c_int
    lib.celt_host_decode.argtypes = [
        C.c_void_p, C.c_char_p, C.c_int, C.c_int, C.c_int, C.c_int, C.c_int,
        C.c_int, fp, dp, C.POINTER(C.c_int32), dp]
    lib.celt_host_rng.restype = C.c_uint32
    lib.celt_host_rng.argtypes = [C.c_void_p]
    ip = C.POINTER(C.c_int32)
    lib.celt_host_decode_batch.argtypes = [
        C.POINTER(C.c_void_p), C.c_char_p, ip, ip, C.c_int, C.c_int, C.c_int,
        C.c_int, C.c_int, C.c_int, fp, dp, ip, dp, ip, C.c_int]
    vp = C.POINTER(C.c_void_p)
    lib.celt_host_decode_plan.restype = C.c_int
    lib.celt_host_decode_plan.argtypes = [
        C.c_void_p, C.c_char_p, C.c_int, C.c_int, C.c_int, C.c_int, C.c_int,
        C.c_int, vp, C.c_int, C.c_int]
    lib.celt_host_decode_plan_batch.argtypes = [
        C.POINTER(C.c_void_p), C.c_char_p, ip, ip, C.c_int, C.c_int, C.c_int,
        C.c_int, C.c_int, C.c_int, vp, C.c_int]
    lib.celt_enc_host_create.restype = C.c_void_p
    lib.celt_enc_host_create.argtypes = [C.c_int, C.c_int, C.c_int]
    lib.celt_enc_host_destroy.argtypes = [C.c_void_p]
    lib.celt_enc_host_reset.argtypes = [C.c_void_p]
    lib.celt_enc_host_encode.restype = C.c_int
    lib.celt_enc_host_encode.argtypes = [
        C.c_void_p, fp, C.c_int, ip, fp, C.c_int, C.c_char_p]
    lib.celt_enc_host_encode_batch.argtypes = [
        C.POINTER(C.c_void_p), fp, ip, fp, C.c_int, C.c_int, C.c_int,
        C.c_int, C.c_char_p, ip, C.c_int]
    lib.celt_enc_host_tapset.restype = C.c_int
    lib.celt_enc_host_tapset.argtypes = [C.c_void_p]
    _apply_profile(lib)
    _lib = lib
    return lib


# Packed plan-array layout shared with native/celt_host.cpp (see the
# celt_host_decode_plan comment there) and mousiki_tpu/celt/plan_pack.py.
# _TIERS/_FILL are the FULL profile (no direct fallback up to 510 kbps
# stereo); serving pipelines shrink them via set_plan_profile to shrink
# the per-step H2D arena (streams that overflow a tier fall back to the
# exact direct decoder, so correctness is profile-independent).
_FULL_TIERS = ((16, 224), (48, 48), (176, 16))
_FULL_FILL = 4
_TIERS = _FULL_TIERS
_NB = 21
_FILL = 4
_POOL = _NB * 2 * _FILL   # per-stream fill pool slots (wire planes)
_DUP = 2                  # special-hybrid-folding dup slots (native kDupPool)


def set_plan_profile(tiers=None, fills=None, pool=None) -> None:
    """Set the process-wide plan tier/fill capacities.

    tiers: 3 slot counts for the (n<=16, n<=48, n<=176) leaf tiers;
    fills: fold/noise slots per (band, channel) call (the device dense F
    axis); pool: per-stream fill POOL slots on the wire (<= 42 * fills;
    default the dense bound). None restores the full profile. Must be
    called BEFORE creating plan pipelines / native batches (arena layouts
    and jitted unpack traces bake the profile in; existing
    NativeCeltHostBatch/NativeOpusHostBatch objects keep stale arenas).
    Applies to every loaded native host library.
    """
    global _TIERS, _FILL, _POOL
    t = tuple(int(x) for x in tiers) if tiers is not None \
        else tuple(s for _, s in _FULL_TIERS)
    f = int(fills) if fills is not None else _FULL_FILL
    if len(t) != 3 or not all(1 <= t[i] <= _FULL_TIERS[i][1]
                              for i in range(3)):
        raise ValueError(f"bad tier profile {t}")
    if not 1 <= f <= _FULL_FILL:
        raise ValueError(f"bad fill profile {f}")
    p = int(pool) if pool is not None else _NB * 2 * f
    if not 1 <= p <= _NB * 2 * f:
        raise ValueError(f"bad fill pool {p}")
    _TIERS = tuple((n, t[i]) for i, (n, _) in enumerate(_FULL_TIERS))
    _FILL = f
    _POOL = p
    for lib in _profile_libs():
        lib.celt_host_set_plan_profile(t[0], t[1], t[2], f)
        lib.celt_host_set_fill_pool(p)


def get_plan_profile():
    return tuple(s for _, s in _TIERS), _FILL, _POOL


def _profile_libs():
    """Every loaded native library carrying the plan writer (each .so has
    its own copy of the capacity globals)."""
    libs = []
    if _lib is not None:
        libs.append(_lib)
    import sys
    ohn = sys.modules.get("mousiki_tpu.opus_host_native")
    if ohn is not None and getattr(ohn, "_lib", None) is not None:
        libs.append(ohn._lib)
    return libs


def _apply_profile(lib) -> None:
    """Push the current profile into a freshly loaded library."""
    try:
        lib.celt_host_set_plan_profile.argtypes = [C.c_int, C.c_int,
                                                   C.c_int, C.c_int]
        lib.celt_host_set_fill_pool.argtypes = [C.c_int]
    except AttributeError:
        return
    t, f, p = get_plan_profile()
    lib.celt_host_set_plan_profile(t[0], t[1], t[2], f)
    lib.celt_host_set_fill_pool(p)

# Plane dtypes mirror native PlanOut (celt_host.cpp, wire format v3):
# bit-packed flag planes, pooled sparse records, and ONE sequential
# 16-byte record per PVQ leaf (the device scatters records into the
# executor's tier planes with a cumsum at unpack — v2's tier-SoA layout
# cost ~2 us/frame of scattered host stores).
# ops/band_exec_jax.unpack_plan_arenas reconstructs the executor's
# logical planes on device.
_PLANE_DTYPES = {
    "direct": np.uint8,
    "pvq_rec": np.uint32,      # (R, 3): w0 = n | k<<8 | log2(b)<<16 |
                               # tier<<19 | dst<<21 (active == k>0 after
                               # the tier scatter); w1 = gain f32 bits;
                               # w2 = idx
    "pvq_cnt": np.uint16,      # records written per stream
    "call_flags": np.uint8,    # active|has_lb<<1|lb_buf<<2|nwr<<3|nbuf<<4
    "call_combo": np.uint8,    # pre == post combo id
    "call_lb_src": np.int16, "call_blend_upto": np.int16,
    "dup_pool": np.int16,      # (S, _DUP, 4): [callid, dst, src, n]
    "fill_cid": np.uint8,      # active | fold<<1 | callid<<2
    "fill_off": np.int16, "fill_n": np.int16,
    "fill_gain": np.float32, "fill_seed": np.uint32,
    "bm_flags": np.uint8,      # merge_a|m_inv<<1|t2_a<<2|cswap<<3|
                               # t_inv<<4|sign_neg<<5
    "bm_mid": np.float32, "bm_side": np.float32,
    "n1_as": np.uint8,         # active | neg<<1
    "ac_on": np.uint8, "ac_masks": np.uint8, "ac_r": np.float32,
    "ac_seed": np.uint32, "iflags": np.int32,
    "ble32": np.float32, "pf32": np.float32,
    "spread8": np.uint8,       # frame-wide PVQ spread (one per stream)
    "lost8": np.uint8,
}

# Native pointer-table order (29 entries; see celt_host_decode_plan).
_PTR_ORDER = (["direct", "pvq_rec", "pvq_cnt",
               "call_flags", "call_combo", "call_lb_src",
               "call_blend_upto", "dup_pool", "fill_cid", "fill_off",
               "fill_n", "fill_gain", "fill_seed", "bm_flags", "bm_mid",
               "bm_side", "n1_as", "ac_on", "ac_masks", "ac_r", "ac_seed",
               "x_direct", "band_log_e", "iflags", "pf_gain", "rcs",
               "ble32", "pf32", "spread8"])


def _plane_shapes(S: int, channels: int, frame: int) -> dict:
    c2, b1, fp = (S, _NB, 2), (S, _NB), (S, _POOL)
    R = sum(s for _, s in _TIERS)
    shapes = {
        "direct": (S,),
        "pvq_rec": (S, R, 3), "pvq_cnt": (S,),
        "call_flags": c2, "call_combo": c2, "call_lb_src": c2,
        "call_blend_upto": c2, "dup_pool": (S, _DUP, 4),
        "fill_cid": fp, "fill_off": fp, "fill_n": fp,
        "fill_gain": fp, "fill_seed": fp,
        "bm_flags": b1, "bm_mid": b1, "bm_side": b1,
        "n1_as": c2, "ac_on": (S,), "ac_masks": c2,
        "ac_r": (S, 2, _NB), "ac_seed": (S,), "iflags": (S, 4),
        "ble32": (S, 2, _NB), "pf32": (S,), "spread8": (S,),
        # written by the PYTHON caller (not the native decoder): per-stream
        # lost mask rides the single arena H2D instead of its own transfer
        # (each fixed transfer through the device tunnel costs ~0.1 ms)
        "lost8": (S,),
    }
    return shapes


def wire_to_logical(views: dict) -> dict:
    """Reconstruct the executor's LOGICAL plan planes (plan_pack.pack_plans
    layout) from the v4 wire views — the numpy twin of the device-side
    unpack in ops/band_exec_jax.unpack_plan_arenas (tests compare these to
    the Python packer's output)."""
    S = views["direct"].shape[0]
    out = {"direct": views["direct"]}
    out["pvq_active"], out["pvq_n"], out["pvq_k"] = [], [], []
    out["pvq_b"], out["pvq_spread"] = [], []
    out["pvq_gain"], out["pvq_idx"], out["pvq_dst"] = [], [], []
    rec = views["pvq_rec"]                      # (S, R, 3) uint32
    cnt = views["pvq_cnt"].astype(np.int32)     # (S,)
    R = rec.shape[1]
    w0 = rec[..., 0].astype(np.int64)
    valid = np.arange(R)[None, :] < cnt[:, None]
    tier = np.where(valid, (w0 >> 19) & 3, -1)
    gain_all = rec[..., 1].copy().view(np.float32)
    spread_s = views["spread8"]                 # (S,) frame-wide
    for t, (_, slots) in enumerate(_TIERS):
        sel = tier == t
        # slot index within the tier = running count of same-tier records
        pos = np.cumsum(sel, axis=1) - 1
        act = np.zeros((S, slots), np.uint8)
        n = np.zeros((S, slots), np.uint8)
        k = np.zeros((S, slots), np.uint8)
        b = np.zeros((S, slots), np.uint8)
        gain = np.zeros((S, slots), np.float32)
        idx = np.zeros((S, slots), np.uint32)
        dst = np.zeros((S, slots), np.int16)
        rows, cols = np.nonzero(sel)
        j = pos[rows, cols]
        w = w0[rows, cols]
        act[rows, j] = 1
        n[rows, j] = w & 0xFF
        k[rows, j] = (w >> 8) & 0xFF
        b[rows, j] = 1 << ((w >> 16) & 7)
        gain[rows, j] = gain_all[rows, cols]
        idx[rows, j] = rec[rows, cols, 2]
        dst[rows, j] = (w >> 21) & 0x7FF
        spread = np.broadcast_to(spread_s[:, None],
                                 (S, slots)).astype(np.uint8) * act
        out["pvq_active"].append(act)
        out["pvq_n"].append(n)
        out["pvq_k"].append(k)
        out["pvq_b"].append(b)
        out["pvq_spread"].append(spread)
        out["pvq_gain"].append(gain)
        out["pvq_idx"].append(idx)
        out["pvq_dst"].append(dst)
    cf = views["call_flags"].astype(np.int32)
    out["call_active"] = (cf & 1).astype(np.uint8)
    out["call_has_lb"] = ((cf >> 1) & 1).astype(np.uint8)
    out["call_lb_buf"] = ((cf >> 2) & 1).astype(np.uint8)
    out["call_norm_write"] = ((cf >> 3) & 1).astype(np.uint8)
    out["call_norm_buf"] = ((cf >> 4) & 1).astype(np.uint8)
    out["call_pre"] = views["call_combo"]
    out["call_post"] = views["call_combo"]
    out["call_lb_src"] = views["call_lb_src"]
    out["call_blend_upto"] = views["call_blend_upto"]
    dup = np.zeros((S, _NB, 2, 3), np.int16)
    dp = views["dup_pool"]
    for e in range(_DUP):
        for s in range(S):
            if dp[s, e, 3] > 0:
                cid = int(dp[s, e, 0])
                dup[s, cid // 2, cid % 2] = dp[s, e, 1:4]
    out["call_dup"] = dup
    f4 = (S, _NB, 2, _FILL)
    fa = np.zeros(f4, np.uint8)
    ff = np.zeros(f4, np.uint8)
    foff = np.zeros(f4, np.int16)
    fn = np.zeros(f4, np.int16)
    fg = np.zeros(f4, np.float32)
    fs = np.zeros(f4, np.uint32)
    cid8 = views["fill_cid"].astype(np.int32)
    for s in range(S):
        occ = {}
        for j in range(_POOL):
            v = cid8[s, j]
            if not v & 1:
                continue
            cid = v >> 2
            o = occ.get(cid, 0)
            occ[cid] = o + 1
            b, c = cid // 2, cid % 2
            fa[s, b, c, o] = 1
            ff[s, b, c, o] = (v >> 1) & 1
            foff[s, b, c, o] = views["fill_off"][s, j]
            fn[s, b, c, o] = views["fill_n"][s, j]
            fg[s, b, c, o] = views["fill_gain"][s, j]
            fs[s, b, c, o] = views["fill_seed"][s, j]
    out.update(fill_active=fa, fill_fold=ff, fill_off=foff, fill_n=fn,
               fill_gain=fg, fill_seed=fs)
    bf = views["bm_flags"].astype(np.int32)
    out["merge_active"] = (bf & 1).astype(np.uint8)
    out["merge_inv"] = ((bf >> 1) & 1).astype(np.uint8)
    out["theta2_active"] = ((bf >> 2) & 1).astype(np.uint8)
    out["theta2_cswap"] = ((bf >> 3) & 1).astype(np.uint8)
    out["theta2_inv"] = ((bf >> 4) & 1).astype(np.uint8)
    out["theta2_sign"] = np.where((bf >> 5) & 1, -1.0, 1.0).astype(
        np.float32) * ((bf >> 2) & 1)
    out["merge_mid"] = views["bm_mid"] * (bf & 1)
    out["theta2_mid"] = views["bm_mid"] * ((bf >> 2) & 1)
    out["theta2_side"] = views["bm_side"] * ((bf >> 2) & 1)
    n1 = views["n1_as"].astype(np.int32)
    out["n1_active"] = (n1 & 1).astype(np.uint8)
    out["n1_val"] = np.where((n1 >> 1) & 1, -1.0, 1.0).astype(
        np.float32) * (n1 & 1)
    for k in ("ac_on", "ac_masks", "ac_r", "ac_seed", "iflags", "ble32",
              "pf32"):
        out[k] = views[k]
    return out


def plan_arena_layout(S: int, channels: int, frame: int):
    """Byte layout of the three plan arenas (by element width).

    The whole plan ships to the device as 3 contiguous transfers instead
    of ~40 (each H2D through the device tunnel has ~0.1 ms fixed cost and
    is synchronous). Returns (layout, sizes) where layout maps each plane
    key (or (key, tier)) -> (arena_name, elem_offset, shape) and sizes
    maps arena_name -> element count. Arena dtypes: a32 int32 (f32/u32
    planes are same-width views), a16 int16, a8 uint8. The ble32/pf32
    planes are host-converted f32 copies of band_log_e / pf_gain so the
    descriptor rides the same transfer.
    """
    shapes = _plane_shapes(S, channels, frame)
    arena_of = {1: "a8", 2: "a16", 4: "a32"}
    layout = {}
    sizes = {"a8": 0, "a16": 0, "a32": 0}
    for key in list(shapes):
        base = key[0] if isinstance(key, tuple) else key
        dt = np.dtype(_PLANE_DTYPES[base])
        name = arena_of[dt.itemsize]
        n = int(np.prod(shapes[key]))
        layout[key] = (name, sizes[name], shapes[key])
        sizes[name] += n
    return layout, sizes


def arena_word_layout(S: int, channels: int, frame: int):
    """Word offsets of the three arenas inside ONE int32 backing buffer
    (a32 | a16 | a8, each padded to whole words). Returns
    (n32, w16_off, n16, w8_off, n8, total_words)."""
    _, sizes = plan_arena_layout(S, channels, frame)
    n32 = sizes["a32"]
    w16 = (sizes["a16"] + 1) // 2
    w8 = (sizes["a8"] + 3) // 4
    return n32, n32, sizes["a16"], n32 + w16, sizes["a8"], n32 + w16 + w8


def alloc_plan_arenas(S: int, channels: int, frame: int):
    """Zeroed plan arenas + the separate native output arrays.

    All three arenas are views of ONE int32 backing buffer (returned as
    arenas["backing"]) so the whole plan ships to the device as a single
    H2D transfer. np.zeros gets lazily-mapped zero pages, so allocation
    is cheap; the native decoder only writes flagged slots and the device
    executor masks by those flags (zero defaults are correct for every
    plane, including call_blend_upto where 0 and -1 both mean "no blend").
    """
    layout, sizes = plan_arena_layout(S, channels, frame)
    n32, o16, n16, o8, n8, total = arena_word_layout(S, channels, frame)
    backing = np.zeros(total, np.int32)
    arenas = {"backing": backing,
              "a32": backing[:n32],
              "a16": backing[o16: o16 + (n16 + 1) // 2].view(np.int16)[:n16],
              "a8": backing[o8: o8 + (n8 + 3) // 4].view(np.uint8)[:n8]}
    aux = {"x_direct": np.zeros((S, channels, frame), np.float32),
           "band_log_e": np.zeros((S, 2, _NB), np.float64),
           "pf_gain": np.zeros(S, np.float64),
           "rcs": np.zeros(S, np.int32)}
    return arenas, aux, layout


def plan_views(arenas: dict, aux: dict, layout: dict) -> dict:
    """Typed numpy views of every plan plane (the old dict-of-arrays
    interface, now backed by the arenas)."""
    out = {}
    for key, (name, off, shape) in layout.items():
        base = key[0] if isinstance(key, tuple) else key
        dt = np.dtype(_PLANE_DTYPES[base])
        n = int(np.prod(shape))
        flat = arenas[name][off:off + n]
        v = flat.view(dt).reshape(shape)
        if isinstance(key, tuple):
            out.setdefault(base, [None, None, None])[key[1]] = v
        else:
            out[base] = v
    out.update(aux)
    return out


def _plan_ptr_table(views: dict):
    ptrs = (C.c_void_p * len(_PTR_ORDER))()
    for k, key in enumerate(_PTR_ORDER):
        arr = views[key[0]][key[1]] if isinstance(key, tuple) else views[key]
        ptrs[k] = arr.ctypes.data_as(C.c_void_p)
    return ptrs


def available() -> bool:
    return _load() is not None


class NativeCeltHost:
    """One stream's native host-side CELT symbol decoder.

    Mirrors the state of `CeltDecoder` that affects symbol decode
    (old band energies, log-e memories, noise rng); produces the same
    FrameDesc dict the Python decoder exports with return_desc=True.
    """

    def __init__(self, channels: int = 2, stream_channels: int = 2,
                 start: int = 0, end: int = 21, disable_inv: bool | None = None):
        lib = _load()
        if lib is None:
            raise RuntimeError("native celt host library unavailable")
        self._lib = lib
        self._st = lib.celt_host_create()
        self.channels = channels
        self.stream_channels = stream_channels
        self.start = start
        self.end = end
        self.disable_inv = (stream_channels == 1) if disable_inv is None \
            else disable_inv

    def __del__(self):
        if getattr(self, "_st", None):
            self._lib.celt_host_destroy(self._st)
            self._st = None

    def reset(self):
        self._lib.celt_host_reset(self._st)

    # -- state sync with a Python CeltDecoder --------------------------
    def load_state_from(self, dec) -> None:
        e = np.ascontiguousarray(dec.old_ebands, np.float64)
        l1 = np.ascontiguousarray(dec.old_log_e, np.float64)
        l2 = np.ascontiguousarray(dec.old_log_e2, np.float64)
        dp = C.POINTER(C.c_double)
        self._lib.celt_host_set_state(
            self._st, e.ctypes.data_as(dp), l1.ctypes.data_as(dp),
            l2.ctypes.data_as(dp), C.c_uint32(dec.rng & 0xFFFFFFFF))

    def get_state(self):
        e = np.empty((2, 21), np.float64)
        l1 = np.empty((2, 21), np.float64)
        l2 = np.empty((2, 21), np.float64)
        rng = C.c_uint32()
        dp = C.POINTER(C.c_double)
        self._lib.celt_host_get_state(
            self._st, e.ctypes.data_as(dp), l1.ctypes.data_as(dp),
            l2.ctypes.data_as(dp), C.byref(rng))
        return e, l1, l2, rng.value

    @property
    def rng(self) -> int:
        return self._lib.celt_host_rng(self._st)

    # -- decode ---------------------------------------------------------
    def decode_desc(self, data: bytes, frame_size: int) -> dict:
        """Decode one frame's symbols; returns a FrameDesc dict."""
        Cch = self.stream_channels
        CC = self.channels
        x = np.zeros((Cch, frame_size), np.float32)
        band_log_e = np.zeros((2, 21), np.float64)
        iflags = np.zeros(4, np.int32)
        pf_gain = C.c_double()
        dp = C.POINTER(C.c_double)
        fp = C.POINTER(C.c_float)
        rc = self._lib.celt_host_decode(
            self._st, data, len(data), frame_size, Cch, self.start, self.end,
            1 if self.disable_inv else 0, x.ctypes.data_as(fp),
            band_log_e.ctypes.data_as(dp),
            iflags.ctypes.data_as(C.POINTER(C.c_int32)), C.byref(pf_gain))
        if rc < 0:
            raise ValueError(f"native celt decode failed (rc={rc})")
        if Cch != CC:
            x = np.repeat(x, CC, axis=0)[:CC]
        return {
            "x": x,
            "band_log_e": band_log_e[:CC].copy(),
            "transient": bool(iflags[0]),
            "silence": bool(iflags[1]),
            "pf_pitch": int(iflags[2]),
            "pf_gain": float(pf_gain.value),
            "pf_tapset": int(iflags[3]),
        }


class NativeCeltHostBatch:
    """S independent native host decoders driven by one multithreaded call.

    Feed one packet payload per stream per step; outputs land in dense
    (S, C, N) / (S, 2, 21) arrays ready to become a batched FrameDesc for
    the device synthesis stage.
    """

    def __init__(self, n_streams: int, channels: int = 2,
                 start: int = 0, end: int = 21,
                 disable_inv: bool | None = None, n_threads: int = 0):
        lib = _load()
        if lib is None:
            raise RuntimeError("native celt host library unavailable")
        self._lib = lib
        self.S = n_streams
        self.channels = channels
        self.start = start
        self.end = end
        self.disable_inv = (channels == 1) if disable_inv is None else disable_inv
        self.n_threads = n_threads
        self._states = (C.c_void_p * n_streams)(
            *[lib.celt_host_create() for _ in range(n_streams)])
        self._bufs = {}  # frame_size -> preallocated output arrays

    def __del__(self):
        if getattr(self, "_states", None) is not None and self._lib is not None:
            for st in self._states:
                if st:
                    self._lib.celt_host_destroy(st)
            self._states = None

    def decode(self, payloads: list, frame_size: int):
        """payloads: S byte strings. Returns (x, band_log_e, iflags, pf_gains, rcs).

        Outputs are freshly allocated every call: the caller (and JAX,
        which may alias numpy buffers zero-copy on the CPU backend) can
        hold them across steps without copy-vs-overwrite races.
        """
        S, Cch = self.S, self.channels
        assert len(payloads) == S
        blob = b"".join(payloads)
        # the native decoder fully overwrites every output element
        x = np.empty((S, Cch, frame_size), np.float32)
        ble = np.empty((S, 2, 21), np.float64)
        iflags = np.empty((S, 4), np.int32)
        pf_gains = np.empty(S, np.float64)
        rcs = np.empty(S, np.int32)
        if frame_size not in self._bufs:
            # offs/lens are consumed synchronously inside the call
            self._bufs[frame_size] = (np.empty(S, np.int32),
                                      np.empty(S, np.int32))
        offs, lens = self._bufs[frame_size]
        pos = 0
        for i, p in enumerate(payloads):
            offs[i] = pos
            lens[i] = len(p)
            pos += lens[i]
        dp = C.POINTER(C.c_double)
        fp = C.POINTER(C.c_float)
        ip = C.POINTER(C.c_int32)
        self._lib.celt_host_decode_batch(
            self._states, blob, offs.ctypes.data_as(ip),
            lens.ctypes.data_as(ip), S, frame_size, Cch, self.start, self.end,
            1 if self.disable_inv else 0, x.ctypes.data_as(fp),
            ble.ctypes.data_as(dp), iflags.ctypes.data_as(ip),
            pf_gains.ctypes.data_as(dp), rcs.ctypes.data_as(ip),
            self.n_threads)
        return x, ble, iflags, pf_gains, rcs

    def set_plan_buffers(self, n: int) -> None:
        """Size the plan arena ring (default 1 buffer, reused in place).

        n=2 enables double buffering so a pipeline can overlap the native
        symbol decode of frame k+1 (worker thread, GIL released inside
        the C call) with the H2D transfer + device execution of frame k
        — the two steps then write/read different arenas. Clears any
        existing arenas (layouts may embed a stale plan profile)."""
        if n < 1:
            raise ValueError("need >= 1 plan buffer")
        if getattr(self, "_plan_nbufs", 1) == n:
            return
        self._plan_nbufs = n
        self._plan_db = {}

    def decode_plan_arenas(self, payloads: list, frame_size: int):
        """Symbol-only batch decode emitting packed band plans.

        Returns (arenas, aux, layout): three contiguous plan arenas (see
        plan_arena_layout) ready for single-shot H2D transfer, plus the
        separate native outputs {x_direct, band_log_e, pf_gain, rcs}.

        The arena set is a ring of set_plan_buffers(n) buffers (default
        1, reused in place): the native decoder re-memsets every flag
        plane and the device executor masks all value planes by those
        flags, so stale values in inactive slots are never read. With
        one buffer, callers rely on jnp.asarray copying H2D before the
        next step overwrites it (the strictly-serialized pipelines);
        with two, the overlapped pipeline writes buffer k+1 while buffer
        k transfers. Callers that stash arenas across steps must copy.
        The f32 ble32/pf32 arena planes are filled from the native f64
        outputs so the descriptor rides the arena transfer.
        """
        S, Cch = self.S, self.channels
        assert len(payloads) == S
        key = ("plan", frame_size)
        if key not in self._bufs:
            self._bufs[key] = (np.empty(S, np.int32), np.empty(S, np.int32))
        offs, lens = self._bufs[key]
        if not hasattr(self, "_plan_db"):
            self._plan_db = {}
        nbufs = getattr(self, "_plan_nbufs", 1)
        if frame_size not in self._plan_db:
            ring = []
            for _ in range(nbufs):
                arenas, aux, layout = alloc_plan_arenas(S, Cch, frame_size)
                views = plan_views(arenas, aux, layout)
                ring.append((arenas, aux, layout, views,
                             _plan_ptr_table(views)))
            self._plan_db[frame_size] = [0, ring]
        db = self._plan_db[frame_size]
        arenas, aux, layout, views, ptrs = db[1][db[0]]
        db[0] = (db[0] + 1) % len(db[1])
        blob = b"".join(p for p in payloads if p is not None)
        # vectorized marshal: len() map + cumsum beat the per-payload
        # python loop ~4x at S=256 (the host stage is the serving wall)
        lens[:] = np.fromiter(
            (0 if p is None else len(p) for p in payloads),
            np.int32, count=len(payloads))
        lost8 = views["lost8"]
        lost8[:] = lens == 0
        np.cumsum(lens[:-1], out=offs[1:], dtype=np.int32)
        offs[0] = 0
        ip = C.POINTER(C.c_int32)
        self._lib.celt_host_decode_plan_batch(
            self._states, blob, offs.ctypes.data_as(ip),
            lens.ctypes.data_as(ip), S, frame_size, Cch, self.start, self.end,
            1 if self.disable_inv else 0, ptrs, self.n_threads)
        return arenas, aux, layout

    def decode_plan_chunk(self, frames: list, frame_size: int):
        """Decode K frame batches straight into ONE contiguous
        (K, total_words) int32 backing — the stacked-arena lax.scan input
        of pipeline.decode_frames_scanned without the per-frame
        backing.copy() + np.stack() round (2 * K * arena_bytes of pure
        memcpy per chunk on the 1-core serving host).

        frames: list of K payload lists (each length S; None = lost).
        Returns (backing2d, aux_list, any_direct) where backing2d is the
        (K, total_words) arena stack (reused across calls with the same
        (K, frame_size) — callers must consume/copy before the next call)
        and aux_list holds each frame's {x_direct, band_log_e, ...}.
        """
        S, Cch = self.S, self.channels
        K = len(frames)
        key = ("plan", frame_size)
        if key not in self._bufs:
            self._bufs[key] = (np.empty(S, np.int32), np.empty(S, np.int32))
        offs, lens = self._bufs[key]
        if not hasattr(self, "_plan_chunk_db"):
            self._plan_chunk_db = {}
        ck = (K, frame_size)
        if ck not in self._plan_chunk_db:
            layout, _ = plan_arena_layout(S, Cch, frame_size)
            n32, o16, n16, o8, n8, total = arena_word_layout(
                S, Cch, frame_size)
            backing2d = np.zeros((K, total), np.int32)
            slots = []
            for k in range(K):
                b = backing2d[k]
                arenas = {
                    "backing": b, "a32": b[:n32],
                    "a16": b[o16:o16 + (n16 + 1) // 2].view(np.int16)[:n16],
                    "a8": b[o8:o8 + (n8 + 3) // 4].view(np.uint8)[:n8]}
                aux = {"x_direct": np.zeros((S, Cch, frame_size), np.float32),
                       "band_log_e": np.zeros((S, 2, _NB), np.float64),
                       "pf_gain": np.zeros(S, np.float64),
                       "rcs": np.zeros(S, np.int32)}
                views = plan_views(arenas, aux, layout)
                slots.append((arenas, aux, layout, views,
                              _plan_ptr_table(views)))
            self._plan_chunk_db[ck] = (backing2d, slots)
        backing2d, slots = self._plan_chunk_db[ck]
        ip = C.POINTER(C.c_int32)
        aux_list = []
        any_direct = False
        for k, payloads in enumerate(frames):
            # a short list would leave stale offs/lens entries pointing
            # past the joined blob (scratch buffers are reused)
            assert len(payloads) == S, (k, len(payloads), S)
            arenas, aux, layout, views, ptrs = slots[k]
            blob = b"".join(p for p in payloads if p is not None)
            lens[:] = np.fromiter(
                (0 if p is None else len(p) for p in payloads),
                np.int32, count=len(payloads))
            lost8 = views["lost8"]
            lost8[:] = lens == 0
            np.cumsum(lens[:-1], out=offs[1:], dtype=np.int32)
            offs[0] = 0
            self._lib.celt_host_decode_plan_batch(
                self._states, blob, offs.ctypes.data_as(ip),
                lens.ctypes.data_as(ip), S, frame_size, Cch, self.start,
                self.end, 1 if self.disable_inv else 0, ptrs, self.n_threads)
            name, off, shape = layout["direct"]
            any_direct |= bool(arenas[name][off:off + shape[0]].any())
            aux_list.append(aux)
        return backing2d, aux_list, any_direct

    def decode_plan(self, payloads: list, frame_size: int) -> dict:
        """decode_plan_arenas, presented as the LOGICAL dict-of-planes
        (wire format v2 unpacked; test/debug interface — the production
        path ships the packed arenas and unpacks on device)."""
        arenas, aux, layout = self.decode_plan_arenas(payloads, frame_size)
        views = plan_views(arenas, aux, layout)
        out = wire_to_logical(views)
        out.update(aux)
        return out


class NativeCeltEncoderBatch:
    """S native CELT symbol encoders driven by one multithreaded batch
    call: the back half of the plan-split encode pipeline (the device
    front end computes the MDCT spectrum + analysis decisions, this
    stage runs coarse/fine energy, tf, spread, dynalloc, allocation,
    PVQ search and range coding — native/celt_host.cpp encoder section,
    mirroring celt/encoder.py encode_with_ec)."""

    MAX_BYTES = 1275

    def __init__(self, n_streams: int, channels: int = 2,
                 complexity: int = 5, disable_inv: bool = False,
                 n_threads: int = 0):
        lib = _load()
        if lib is None:
            raise RuntimeError("native celt host library unavailable")
        self._lib = lib
        self.S = n_streams
        self.channels = channels
        self.n_threads = n_threads
        self._states = (C.c_void_p * n_streams)(
            *[lib.celt_enc_host_create(channels, complexity,
                                       1 if disable_inv else 0)
              for _ in range(n_streams)])
        self._out = np.zeros((n_streams, self.MAX_BYTES), np.uint8)
        self._lens = np.zeros(n_streams, np.int32)

    def __del__(self):
        if getattr(self, "_states", None) is not None and self._lib is not None:
            for st in self._states:
                if st:
                    self._lib.celt_enc_host_destroy(st)
            self._states = None

    def encode(self, freq: np.ndarray, iparams: np.ndarray,
               fparams: np.ndarray, frame_size: int = 960) -> list:
        """freq: (S, C, frame) float32 device-front MDCT spectra.
        iparams: (S, 6) int32 [silence, pf_on, pitch_index, qg,
        is_transient, nbytes]. fparams: (S, 3) float32 [tone_freq,
        toneishness, tf_estimate]. Returns S packets (bytes)."""
        S = self.S
        freq = np.ascontiguousarray(freq, np.float32)
        iparams = np.ascontiguousarray(iparams, np.int32)
        fparams = np.ascontiguousarray(fparams, np.float32)
        assert freq.shape == (S, self.channels, frame_size)
        ip = C.POINTER(C.c_int32)
        fp = C.POINTER(C.c_float)
        self._lib.celt_enc_host_encode_batch(
            self._states, freq.ctypes.data_as(fp),
            iparams.ctypes.data_as(ip), fparams.ctypes.data_as(fp), S,
            self.channels, frame_size, self.MAX_BYTES,
            self._out.ctypes.data_as(C.c_char_p),
            self._lens.ctypes.data_as(ip), self.n_threads)
        pkts = []
        for s in range(S):
            ln = int(self._lens[s])
            pkts.append(bytes(self._out[s, :ln]) if ln > 0 else None)
        return pkts

    def tapsets(self) -> np.ndarray:
        """Per-stream tapset decisions (feed the next front_step)."""
        return np.asarray(
            [self._lib.celt_enc_host_tapset(st) for st in self._states],
            np.int32)
