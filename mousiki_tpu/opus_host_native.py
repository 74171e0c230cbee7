"""ctypes binding for the unified native Opus host stage.

libopus_host.so (native/opus_host.cpp + celt_host.cpp + silk_host.cpp)
routes mixed SILK / CELT / hybrid 20 ms packets per stream: CELT frames
emit packed band plans, SILK frames decode to 16 kHz pcm, hybrid frames
do both over one shared range decoder (the reference's decode_frame
topology, src/opus_decoder.rs:453). Consumed by
pipeline.OpusStreamPipeline.
"""

from __future__ import annotations

import ctypes as C
import os
import subprocess

import numpy as np

from .celt.host_native import (_plan_ptr_table, alloc_plan_arenas,
                               plan_views)

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_NATIVE_DIR = os.path.join(_ROOT, "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libopus_host.so")
_SRCS = ["opus_host.cpp", "celt_host.cpp", "silk_host.cpp"]

_lib = None

# Feeder sentinel: this stream's 20 ms tick is a buffered chunk of an
# already-decoded multiframe SILK packet — the native batch must neither
# decode nor conceal (pipeline.OpusStreamPipeline.push/tick).
SKIP = object()


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-pthread",
             "-o", _SO_PATH] + _SRCS,
            check=True, capture_output=True, cwd=_NATIVE_DIR)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    srcs = [os.path.join(_NATIVE_DIR, s) for s in _SRCS]
    if not all(os.path.exists(s) for s in srcs):
        return None
    if not os.path.exists(_SO_PATH) or any(
            os.path.getmtime(s) > os.path.getmtime(_SO_PATH) for s in srcs):
        if not _build():
            return None
    try:
        lib = C.CDLL(_SO_PATH)
    except OSError:
        return None
    lib.celt_host_create.restype = C.c_void_p
    lib.celt_host_destroy.argtypes = [C.c_void_p]
    lib.silk_host_create.restype = C.c_void_p
    lib.silk_host_destroy.argtypes = [C.c_void_p]
    ip = C.POINTER(C.c_int32)
    sp = C.POINTER(C.c_int16)
    vp = C.POINTER(C.c_void_p)
    fp = C.POINTER(C.c_float)
    lib.opus_host_decode_plan_batch.argtypes = [
        vp, vp, vp, ip, C.c_char_p, ip, ip, C.c_int, C.c_int, C.c_int, vp,
        sp, ip, ip, ip, C.c_char_p, ip, ip, C.c_int, fp, ip]
    lib.silk_host_decode.restype = C.c_int
    lib.silk_host_decode.argtypes = [C.c_void_p, C.c_char_p, C.c_int,
                                     C.c_int, C.c_int, sp]
    from .celt.host_native import _apply_profile
    _apply_profile(lib)
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


class NativeOpusHostBatch:
    """S independent (CELT state, SILK state) pairs driven by one
    TOC-routed multithreaded batch call."""

    def __init__(self, n_streams: int, channels: int = 1,
                 n_threads: int = 0):
        lib = _load()
        if lib is None:
            raise RuntimeError("native opus host library unavailable")
        if channels not in (1, 2):
            raise ValueError("channels must be 1 or 2")
        self._lib = lib
        self.S = n_streams
        self.channels = channels
        self.n_threads = n_threads
        self._celt = (C.c_void_p * n_streams)(
            *[lib.celt_host_create() for _ in range(n_streams)])
        self._silk = (C.c_void_p * n_streams)(
            *[lib.silk_host_create() for _ in range(n_streams)])
        # stereo pipelines: a side-channel SILK state + an 8-int stereo
        # state (s_mid/s_side/pred_prev/prev_mid_only/active) per stream
        if channels == 2:
            self._silk_side = (C.c_void_p * n_streams)(
                *[lib.silk_host_create() for _ in range(n_streams)])
            self._ssts = np.zeros((n_streams, 8), np.int32)
        else:
            self._silk_side = None
            self._ssts = None
        self._lenbufs = (np.empty(n_streams, np.int32),
                        np.empty(n_streams, np.int32))

    def __del__(self):
        if getattr(self, "_celt", None) is not None and self._lib is not None:
            for st in self._celt:
                if st:
                    self._lib.celt_host_destroy(st)
            for st in self._silk:
                if st:
                    self._lib.silk_host_destroy(st)
            if self._silk_side is not None:
                for st in self._silk_side:
                    if st:
                        self._lib.silk_host_destroy(st)
            self._celt = self._silk = self._silk_side = None

    # Per-stream SilkFrameParams wire layout (native kSilkParamF/I):
    # floats [exc 320 | a 32 | b 20 | gains 4 | ltp_scale 1], ints
    # [pitch 4 | voiced, interp, vad 3]
    SILK_PARAM_F = 377
    SILK_PARAM_I = 7

    def decode(self, packets: list, frame_size: int = 960,
               fec_packets: list | None = None, silk_params: bool = False):
        """packets: S whole Opus packets (20 ms, code 0).

        Returns (arenas, aux, layout, silk16, modes, silk_fs): the CELT
        plan arenas (zero rows for SILK-only streams), (S, 320) int16
        SILK pcm at each stream's internal rate (fs*20 valid samples,
        zero for CELT-only), per-stream mode tags (0 CELT / 1 SILK /
        2 hybrid, 3 PLC-concealed, 4 FEC-recovered) and SILK internal
        rates in kHz. Stereo pipelines (channels=2) accept stereo CELT
        packets; SILK/hybrid packets are mono-coded and the caller
        duplicates their output. fec_packets (optional, per lost stream):
        the NEXT packet whose in-band LBRR replaces the loss when
        present. rcs rides in aux (1 = concealed, 2 = FEC-recovered)."""
        S = self.S
        assert len(packets) == S
        offs, lens = self._lenbufs
        # double-buffered reused arenas (see celt/host_native.py
        # decode_plan_arenas for the safety argument); silk16 is fully
        # overwritten by the native call for every stream, every step
        if not hasattr(self, "_plan_db"):
            self._plan_db = {}
        if frame_size not in self._plan_db:
            # single reused arena set (see celt/host_native.py
            # decode_plan_arenas for the buffering/safety argument)
            arenas, aux, layout = alloc_plan_arenas(
                S, self.channels, frame_size)
            views = plan_views(arenas, aux, layout)
            plane = 640 if self.channels == 2 else 320
            self._plan_db[frame_size] = (arenas, aux, layout, views,
                                         _plan_ptr_table(views),
                                         np.zeros((S, plane), np.int16))
        arenas, aux, layout, views, ptrs, silk16 = self._plan_db[frame_size]
        if silk_params and not hasattr(self, "_sparams"):
            self._sparams = (np.zeros((S, self.SILK_PARAM_F), np.float32),
                             np.zeros((S, self.SILK_PARAM_I), np.int32))
        modes = np.zeros(S, np.int32)
        silk_fs = np.full(S, 16, np.int32)
        silk_stereo = np.zeros(S, np.int32)
        blob = b"".join(p for p in packets
                        if p is not None and p is not SKIP)
        pos = 0
        for i, p in enumerate(packets):
            offs[i] = pos
            if p is SKIP:       # buffered multiframe chunk (feeder)
                lens[i] = -1
            elif p is None:     # lost frame
                lens[i] = 0
            else:
                lens[i] = len(p)
                pos += lens[i]
        if fec_packets is not None:
            fec_offs = np.zeros(S, np.int32)
            fec_lens = np.zeros(S, np.int32)
            fec_blob = b"".join(p for p in fec_packets if p is not None)
            fpos = 0
            for i, p in enumerate(fec_packets):
                fec_offs[i] = fpos
                fec_lens[i] = 0 if p is None else len(p)
                fpos += fec_lens[i]
        else:
            fec_blob = b""
            fec_offs = np.zeros(S, np.int32)
            fec_lens = np.zeros(S, np.int32)
        ip = C.POINTER(C.c_int32)
        sp = C.POINTER(C.c_int16)
        ssts_p = (self._ssts.ctypes.data_as(ip) if self._ssts is not None
                  else None)
        self._lib.opus_host_decode_plan_batch(
            self._celt, self._silk, self._silk_side, ssts_p, blob,
            offs.ctypes.data_as(ip), lens.ctypes.data_as(ip), S,
            self.channels, 1 if self.channels == 1 else 0, ptrs,
            silk16.ctypes.data_as(sp), modes.ctypes.data_as(ip),
            silk_fs.ctypes.data_as(ip), silk_stereo.ctypes.data_as(ip),
            fec_blob, fec_offs.ctypes.data_as(ip),
            fec_lens.ctypes.data_as(ip), self.n_threads,
            (self._sparams[0].ctypes.data_as(C.POINTER(C.c_float))
             if silk_params else None),
            (self._sparams[1].ctypes.data_as(ip) if silk_params else None))
        if silk_params:
            return (arenas, aux, layout, silk16, modes, silk_fs,
                    silk_stereo, self._sparams)
        return (arenas, aux, layout, silk16, modes, silk_fs, silk_stereo)

    def decode_silk_frames(self, s: int, payload: bytes, fs_khz: int,
                           frame_ms: int) -> np.ndarray:
        """Direct single-stream SILK decode of a whole 10-60 ms frame
        (used by the pipeline feeder for 40/60 ms packets; the batched
        20 ms path then consumes the buffered chunks via SKIP ticks).
        Returns (fs_khz * frame_ms,) int16."""
        n = fs_khz * frame_ms
        out = np.zeros(max(n, 320), np.int16)
        sp = C.POINTER(C.c_int16)
        rc = self._lib.silk_host_decode(
            self._silk[s], payload, len(payload), fs_khz, frame_ms,
            out.ctypes.data_as(sp))
        if rc < 0:
            raise ValueError(f"stream {s}: silk multiframe decode rc={rc}")
        return out[:n]
