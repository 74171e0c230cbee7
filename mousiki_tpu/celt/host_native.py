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
    _lib = lib
    return lib


# Packed plan-array layout shared with native/celt_host.cpp (see the
# celt_host_decode_plan comment there) and mousiki_tpu/celt/plan_pack.py.
_TIERS = ((16, 224), (48, 48), (176, 16))
_NB = 21
_FILL = 4


def alloc_plan_buffers(S: int, channels: int, frame: int) -> dict:
    """Allocate the packed plan tensors + frame-descriptor outputs.

    Zero-initialized (np.zeros gets lazily-mapped zero pages from calloc,
    so this is cheap): the native decoder only writes the slots it flags
    active, and several value planes (e.g. mono ac_r channel 1) are read
    unconditionally by the masked device executor.
    """
    t = lambda dt: [np.zeros((S, slots), dt) for _, slots in _TIERS]
    return {
        "direct": np.zeros(S, np.bool_),
        "pvq_active": t(np.bool_),
        "pvq_n": t(np.int32), "pvq_k": t(np.int32), "pvq_b": t(np.int32),
        "pvq_spread": t(np.int32), "pvq_gain": t(np.float32),
        "pvq_idx": t(np.uint32),
        "map": np.zeros((S, channels * frame), np.int32),
        "call_active": np.zeros((S, _NB, 2), np.bool_),
        "call_has_lb": np.zeros((S, _NB, 2), np.bool_),
        "call_lb_src": np.zeros((S, _NB, 2), np.int32),
        "call_lb_buf": np.zeros((S, _NB, 2), np.int32),
        "call_blend_upto": np.full((S, _NB, 2), -1, np.int32),
        "call_pre": np.zeros((S, _NB, 2), np.int32),
        "call_post": np.zeros((S, _NB, 2), np.int32),
        "call_norm_write": np.zeros((S, _NB, 2), np.bool_),
        "call_norm_buf": np.zeros((S, _NB, 2), np.int32),
        "fill_active": np.zeros((S, _NB, 2, _FILL), np.bool_),
        "fill_fold": np.zeros((S, _NB, 2, _FILL), np.bool_),
        "fill_off": np.zeros((S, _NB, 2, _FILL), np.int32),
        "fill_n": np.zeros((S, _NB, 2, _FILL), np.int32),
        "fill_gain": np.ones((S, _NB, 2, _FILL), np.float32),
        "fill_seed": np.zeros((S, _NB, 2, _FILL), np.uint32),
        "merge_active": np.zeros((S, _NB), np.bool_),
        "merge_mid": np.zeros((S, _NB), np.float32),
        "merge_inv": np.zeros((S, _NB), np.bool_),
        "theta2_active": np.zeros((S, _NB), np.bool_),
        "theta2_cswap": np.zeros((S, _NB), np.bool_),
        "theta2_sign": np.zeros((S, _NB), np.float32),
        "theta2_mid": np.zeros((S, _NB), np.float32),
        "theta2_side": np.zeros((S, _NB), np.float32),
        "theta2_inv": np.zeros((S, _NB), np.bool_),
        "n1_active": np.zeros((S, _NB, 2), np.bool_),
        "n1_val": np.zeros((S, _NB, 2), np.float32),
        "ac_on": np.zeros(S, np.bool_),
        "ac_masks": np.zeros((S, _NB, 2), np.int32),
        "ac_r": np.zeros((S, 2, _NB), np.float32),
        "ac_seed": np.zeros(S, np.uint32),
        "x_direct": np.zeros((S, channels, frame), np.float32),
        "band_log_e": np.zeros((S, 2, _NB), np.float64),
        "iflags": np.zeros((S, 4), np.int32),
        "pf_gain": np.zeros(S, np.float64),
        "rcs": np.zeros(S, np.int32),
    }


def _plan_ptr_table(bufs: dict):
    order = (["direct"]
             + [("pvq_active", t) for t in range(3)]
             + [("pvq_n", t) for t in range(3)]
             + [("pvq_k", t) for t in range(3)]
             + [("pvq_b", t) for t in range(3)]
             + [("pvq_spread", t) for t in range(3)]
             + [("pvq_gain", t) for t in range(3)]
             + [("pvq_idx", t) for t in range(3)]
             + ["map", "call_active", "call_has_lb", "call_lb_src",
                "call_lb_buf", "call_blend_upto", "call_pre", "call_post",
                "call_norm_write", "call_norm_buf", "fill_active",
                "fill_fold", "fill_off", "fill_n", "fill_gain", "fill_seed",
                "merge_active", "merge_mid", "merge_inv", "theta2_active",
                "theta2_cswap", "theta2_sign", "theta2_mid", "theta2_side",
                "theta2_inv", "n1_active", "n1_val", "ac_on", "ac_masks",
                "ac_r", "ac_seed", "x_direct", "band_log_e", "iflags",
                "pf_gain", "rcs"])
    ptrs = (C.c_void_p * len(order))()
    for k, key in enumerate(order):
        arr = bufs[key[0]][key[1]] if isinstance(key, tuple) else bufs[key]
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

    def decode_plan(self, payloads: list, frame_size: int) -> dict:
        """Symbol-only batch decode emitting packed band plans.

        Returns the plan-buffer dict (see alloc_plan_buffers): the packed
        plan tensors for ops/band_exec_jax.execute_packed plus band_log_e,
        iflags, pf_gain, x_direct (fallback spectra), direct and rcs.
        """
        S, Cch = self.S, self.channels
        assert len(payloads) == S
        key = ("plan", frame_size)
        if key not in self._bufs:
            self._bufs[key] = (np.empty(S, np.int32), np.empty(S, np.int32))
        offs, lens = self._bufs[key]
        # fresh buffers every call (see decode): JAX on the CPU backend may
        # alias these zero-copy, so reuse across steps would race
        bufs = alloc_plan_buffers(S, Cch, frame_size)
        ptrs = _plan_ptr_table(bufs)
        blob = b"".join(payloads)
        pos = 0
        for i, p in enumerate(payloads):
            offs[i] = pos
            lens[i] = len(p)
            pos += lens[i]
        ip = C.POINTER(C.c_int32)
        self._lib.celt_host_decode_plan_batch(
            self._states, blob, offs.ctypes.data_as(ip),
            lens.ctypes.data_as(ip), S, frame_size, Cch, self.start, self.end,
            1 if self.disable_inv else 0, ptrs, self.n_threads)
        return bufs
