"""End-to-end batched CELT streaming pipeline: packets -> PCM at scale.

Glues the native (C++) host symbol stage to the batched device synthesis
stage (SURVEY.md §7 production topology):

  S packets --celt_host_decode_batch--> FrameDesc (dense tensors)
            --synthesis_step (jit, optionally mesh-sharded)--> (S, 960, C) pcm

One instance owns S independent stream states on both sides. The host
stage falls back to the validated Python decoder when the shared library
is unavailable (results are identical; it is just slower).
"""

from __future__ import annotations

import numpy as np

from .celt.decoder import CeltDecoder
from .ops.synthesis_jax import (FrameDesc, init_state, make_consts,
                                synthesis_step)

_LOW_E = -28.0


class CeltStreamPipeline:
    """Decode S parallel CELT streams, one 48 kHz frame per step.

    use_plan=True selects the plan split (the production fast path): the
    native host decodes only symbols, emitting packed band plans; all PVQ
    band reconstruction runs fused with synthesis on the device
    (ops/band_exec_jax.plan_synthesis_step). Requires the native library.
    """

    def __init__(self, n_streams: int, channels: int = 2,
                 use_native: bool | None = None, mesh=None,
                 host_threads: int = 0, use_plan: bool = False):
        import jax

        self.S = n_streams
        self.channels = channels
        self._native = None
        self._py_hosts = None
        self.use_plan = use_plan
        self.mesh = mesh
        self._plan_shards = None
        if use_plan:
            if use_native is False:
                raise ValueError("plan mode requires the native host")
            use_native = True
            if mesh is not None:
                n_dev = mesh.devices.size
                if n_streams % n_dev:
                    raise ValueError("n_streams must divide the mesh size")

        if use_native is not False:
            try:
                from .celt import host_native
                if host_native.available():
                    if use_plan and mesh is not None:
                        # one native batch per device shard: each shard's
                        # arenas transfer to its own device and the
                        # shard_map'd step unpacks them locally
                        n_dev = mesh.devices.size
                        self._plan_shards = [
                            host_native.NativeCeltHostBatch(
                                n_streams // n_dev, channels=channels,
                                disable_inv=channels == 1,
                                n_threads=host_threads)
                            for _ in range(n_dev)]
                        self._native = self._plan_shards[0]
                    else:
                        self._native = host_native.NativeCeltHostBatch(
                            n_streams, channels=channels,
                            disable_inv=channels == 1, n_threads=host_threads)
            except Exception:
                self._native = None
        if self._native is None:
            if use_native is True:
                raise RuntimeError("native celt host requested but unavailable")
            self._py_hosts = [
                CeltDecoder(channels=channels, stream_channels=channels)
                for _ in range(n_streams)]
            for h in self._py_hosts:
                h.disable_inv = channels == 1

        self.consts = make_consts()
        self.state = init_state(n_streams, channels)
        if mesh is not None:
            from .parallel.streaming import (replicate_consts, shard_state,
                                             sharded_synthesis_step)
            self.consts = replicate_consts(mesh, self.consts)
            self.state = shard_state(mesh, self.state)
            self._step = sharded_synthesis_step(mesh, channels=channels)
        else:
            import functools
            self._step = jax.jit(functools.partial(
                synthesis_step, channels=channels))
        if use_plan:
            from .ops.band_exec_jax import (plan_combo_mats,
                                            plan_synthesis_step_plc)
            from .ops.plc_jax import init_plc_state, make_plc_consts
            self._plan_step_fn = plan_synthesis_step_plc
            self.plc_state = init_plc_state(n_streams, channels)
            mode = __import__(
                "mousiki_tpu.celt.modes", fromlist=["opus_custom_mode"]
            ).opus_custom_mode(48000, 960)
            self._plc_consts = {960: make_plc_consts(960, mode.window)}
            self._lost_none = np.zeros(n_streams, bool)
            # per-frame-size caches (LM 0-3): synthesis consts, combo
            # operators (device-resident runtime args), and the all-zero
            # device x_direct fallback (only shipped when some stream fell
            # back to the direct decoder)
            self._plan_consts = {960: self.consts}
            self._plan_mats = {960: plan_combo_mats(channels, 960)}
            self._xd_zeros = {}
            self._cpu_backend = jax.devices()[0].platform == "cpu"
            self._prev_xfer = []
            if mesh is not None:
                from .parallel.streaming import replicate, shard_state
                self._plan_mats = {960: replicate(mesh,
                                                  self._plan_mats[960])}
                self._plc_consts = {960: replicate(mesh,
                                                   self._plc_consts[960])}
                self.plc_state = shard_state(mesh, self.plc_state)
                self._sharded_plan_steps = {}

    def _plan_step(self, frame_size, state, *args):
        if frame_size not in self._plan_consts:
            from .ops.band_exec_jax import plan_combo_mats
            self._plan_consts[frame_size] = make_consts(n=frame_size)
            self._plan_mats[frame_size] = plan_combo_mats(self.channels,
                                                          frame_size)
            if self.mesh is not None:
                from .parallel.streaming import replicate, replicate_consts
                self._plan_consts[frame_size] = replicate_consts(
                    self.mesh, self._plan_consts[frame_size])
                self._plan_mats[frame_size] = replicate(
                    self.mesh, self._plan_mats[frame_size])
        if frame_size not in self._plc_consts:
            from .celt.modes import opus_custom_mode
            from .ops.plc_jax import make_plc_consts
            pc = make_plc_consts(frame_size,
                                 opus_custom_mode(48000, 960).window)
            if self.mesh is not None:
                from .parallel.streaming import replicate
                pc = replicate(self.mesh, pc)
            self._plc_consts[frame_size] = pc
        if self.mesh is not None:
            # PLC-aware sharded step: the lost8 plane in each shard's
            # arena drives per-shard concealment (VERDICT r4 item 5)
            if frame_size not in self._sharded_plan_steps:
                from .parallel.streaming import sharded_plan_step_plc
                self._sharded_plan_steps[frame_size] = sharded_plan_step_plc(
                    self.mesh, channels=self.channels, frame=frame_size,
                    n_streams=self.S)
            pcm, new_state, self.plc_state = \
                self._sharded_plan_steps[frame_size](
                    self._plan_consts[frame_size],
                    self._plc_consts[frame_size], state, self.plc_state,
                    *args, self._plan_mats[frame_size])
            return pcm, new_state
        backing, xd = args
        pcm, new_state, self.plc_state = self._plan_step_fn(
            self._plan_consts[frame_size], self._plc_consts[frame_size],
            state, self.plc_state, backing, xd, None,
            self._plan_mats[frame_size], channels=self.channels,
            frame=frame_size, n_streams=self.S)
        return pcm, new_state

    # ------------------------------------------------------------------
    def _host_decode(self, payloads: list, frame_size: int) -> FrameDesc:
        import jax.numpy as jnp

        S, C = self.S, self.channels
        if self._native is not None:
            x, ble2, iflags, pf_gains, rcs = self._native.decode(
                payloads, frame_size)
            if np.any(rcs < 0):
                bad = int(np.argmax(rcs < 0))
                raise ValueError(
                    f"stream {bad}: native celt decode failed rc={rcs[bad]}")
            transient = iflags[:, 0] != 0
            silence = iflags[:, 1] != 0
            pf_pitch = iflags[:, 2]
            pf_tapset = iflags[:, 3]
            ble = ble2[:, :C, :]
        else:
            x = np.zeros((S, C, frame_size))
            ble = np.zeros((S, C, 21))
            transient = np.zeros(S, bool)
            silence = np.zeros(S, bool)
            pf_pitch = np.zeros(S, np.int32)
            pf_tapset = np.zeros(S, np.int32)
            pf_gains = np.zeros(S)
            for s, payload in enumerate(payloads):
                d = self._py_hosts[s].decode_with_ec(payload, frame_size,
                                                     return_desc=True)
                x[s] = d["x"]
                ble[s] = d["band_log_e"][:C]
                transient[s] = d["transient"]
                silence[s] = d["silence"]
                pf_pitch[s] = d["pf_pitch"]
                pf_tapset[s] = d["pf_tapset"]
                pf_gains[s] = d["pf_gain"]

        ble_pad = np.full((S, C, 22), _LOW_E, np.float32)
        ble_pad[:, :, :21] = ble
        desc = FrameDesc(
            x=jnp.asarray(x, jnp.float32),
            band_log_e=jnp.asarray(ble_pad),
            transient=jnp.asarray(transient),
            silence=jnp.asarray(silence),
            pf_pitch=jnp.asarray(pf_pitch, jnp.int32),
            pf_gain=jnp.asarray(pf_gains, jnp.float32),
            pf_tapset=jnp.asarray(pf_tapset, jnp.int32),
        )
        # the native batch allocates fresh output buffers per call, so JAX
        # may alias or transfer them asynchronously without races
        return desc

    def _host_decode_plan(self, payloads: list, frame_size: int,
                          to_device: bool = True):
        """Plan-mode host stage: one packed arena (+ conditional x_direct).

        The whole plan ships as ONE contiguous H2D transfer; x_direct only
        transfers when some stream fell back to the direct decoder
        (otherwise a cached device zeros array is passed). With a mesh,
        each device shard gets its own native batch + arena triple and
        the global arrays are assembled shard-wise (no reshard).
        to_device=False returns the host-side tuple for a later
        _plan_args_to_device call (decode_stream overlaps the pure-CPU
        native stage with the device execution)."""
        if self.mesh is not None:
            return self._host_decode_plan_sharded(payloads, frame_size)
        arenas, aux, layout = self._native.decode_plan_arenas(payloads,
                                                              frame_size)
        rcs = aux["rcs"]
        if np.any(rcs < 0):
            bad = int(np.argmax(rcs < 0))
            raise ValueError(
                f"stream {bad}: native celt plan decode failed rc={rcs[bad]}")
        # the lost mask rides the arena transfer (lost8 plane, written by
        # decode_plan_arenas) instead of paying its own fixed-cost H2D
        name, off, shape = layout["direct"]
        any_direct = bool(arenas[name][off:off + shape[0]].any())
        host = (arenas, aux, any_direct)
        if not to_device:
            return host
        return self._plan_args_to_device(host, frame_size)

    def _plan_args_to_device(self, host, frame_size: int):
        """H2D half of the plan host stage (strictly serialized against
        device executions; see decode_stream)."""
        import jax.numpy as jnp

        arenas, aux, any_direct = host
        if frame_size not in self._xd_zeros:
            self._xd_zeros[frame_size] = jnp.zeros(
                (self.S, self.channels, frame_size), jnp.float32)
            self._xd_zeros[frame_size].block_until_ready()
        xd = (jnp.asarray(aux["x_direct"]) if any_direct
              else self._xd_zeros[frame_size])
        # Deterministically reap the PREVIOUS step's transfer buffers:
        # jax.Array lifetimes otherwise wait on the cyclic GC, and with
        # fresh multi-MB transfers per step the buffer backlog degrades
        # the transfer path several-fold within a few hundred steps.
        # PjRt defers the actual free until the buffer's usage holds
        # drop, so explicit delete() is race-free even if the previous
        # execution is still in flight.
        for _buf in self._prev_xfer:
            try:
                _buf.delete()
            except Exception:
                pass  # already deleted / donated
        # one H2D transfer: the three arenas share an int32 backing buffer
        # (each fixed transfer through the device tunnel costs ~0.1 ms).
        # On the CPU backend jnp.asarray ALIASES numpy buffers zero-copy,
        # and decode_stream's overlap overwrites the single reused arena
        # on the next native decode — copy there. TPU H2D always copies.
        backing = arenas["backing"]
        if self._cpu_backend:
            backing = backing.copy()
        backing_dev = jnp.asarray(backing)
        self._prev_xfer = [backing_dev]
        if xd is not self._xd_zeros.get(frame_size):
            self._prev_xfer.append(xd)
        return (backing_dev, xd)

    def _host_decode_plan_sharded(self, payloads: list, frame_size: int):
        import jax
        import jax.numpy as jnp

        from .parallel.streaming import make_global_sharded

        n_dev = self.mesh.devices.size
        S_loc = self.S // n_dev
        parts = {"a32": [], "a16": [], "a8": [], "xd": []}
        any_direct = False
        for d in range(n_dev):
            sub = payloads[d * S_loc:(d + 1) * S_loc]
            arenas, aux, layout = self._plan_shards[d].decode_plan_arenas(
                sub, frame_size)
            rcs = aux["rcs"]
            if np.any(rcs < 0):
                bad = int(np.argmax(rcs < 0))
                raise ValueError(f"stream {d * S_loc + bad}: native celt "
                                 f"plan decode failed rc={rcs[bad]}")
            name, off, shape = layout["direct"]
            any_direct |= bool(arenas[name][off:off + shape[0]].any())
            parts["a32"].append(arenas["a32"])
            parts["a16"].append(arenas["a16"])
            parts["a8"].append(arenas["a8"])
            parts["xd"].append(aux["x_direct"].astype(np.float32))
        if frame_size not in self._xd_zeros:
            from jax.sharding import NamedSharding, PartitionSpec
            z = jnp.zeros((self.S, self.channels, frame_size), jnp.float32)
            self._xd_zeros[frame_size] = jax.device_put(
                z, NamedSharding(self.mesh, PartitionSpec("streams")))
        xd = (make_global_sharded(self.mesh, parts["xd"]) if any_direct
              else self._xd_zeros[frame_size])
        return (make_global_sharded(self.mesh, parts["a32"]),
                make_global_sharded(self.mesh, parts["a16"]),
                make_global_sharded(self.mesh, parts["a8"]), xd)

    def step(self, payloads: list, frame_size: int = 960):
        """Decode one frame for every stream.

        payloads: S CELT payload byte strings (one per stream).
        Returns a device array (S, frame_size, channels), float32 in [-1, 1].
        """
        if self.use_plan:
            args = self._host_decode_plan(payloads, frame_size)
            pcm, self.state = self._plan_step(frame_size, self.state, *args)
            return pcm
        desc = self._host_decode(payloads, frame_size)
        pcm, self.state = self._step(self.consts, self.state, desc)
        return pcm

    def decode_stream(self, frames_iter, frame_size: int = 960,
                      chunk: int = 1):
        """Generator over frames of S payloads, overlapping the host symbol
        stage of frame k+1 with the device synthesis of frame k (SURVEY.md
        §7.4): device dispatch is asynchronous, so the next host decode runs
        while the chip works; consumers block only when they read a result.

        chunk > 1 (plan mode, no mesh): decode `chunk` frames per device
        dispatch via the scanned step — one stacked-arena H2D + one
        dispatch per chunk instead of per frame, amortizing the tunnel's
        fixed per-transfer/per-dispatch costs at the price of
        chunk * 20 ms of added latency. Yields (S, frame, C) results one
        frame at a time, exactly as chunk=1 does.
        """
        if chunk > 1:
            # Overlapped chunk serving: dispatch chunk i (async), then run
            # the pure-CPU native decode of chunk i+1 while the device
            # executes i — steady-state wall is max(host, H2D+device)
            # instead of their sum (the same overlap the per-frame branch
            # below gets for free from async dispatch). Safe with the
            # single reused (K, words) backing: _dispatch_chunk's
            # jnp.asarray stages the transfer before returning, so the
            # next native decode may overwrite it.
            assert self.use_plan and self.mesh is None
            it = iter(frames_iter)

            def next_batch():
                b = []
                for payloads in it:
                    b.append(payloads)
                    if len(b) >= chunk:
                        break
                return b

            batch = next_batch()
            if not batch:
                return
            host = self._host_decode_chunk(batch, frame_size)
            short = len(batch) < chunk
            while True:
                pcm = self._dispatch_chunk(host, frame_size)
                nxt = [] if short else next_batch()
                if nxt:
                    host = self._host_decode_chunk(nxt, frame_size)
                    short = len(nxt) < chunk
                pcm.block_until_ready()
                for k in range(pcm.shape[0]):
                    yield pcm[k]
                if not nxt:
                    return

        if self.use_plan and self.mesh is None and not getattr(
                self, "overlap_host", False):
            # Single-threaded plan mode (the default): H2D + dispatch
            # serialized with the native decode of the NEXT frame filling
            # the single reused arena while the device works. On a 1-core
            # host this beats the threaded overlap below (measured A/B:
            # 779x vs 730x at S=256 — the tunnel H2D is itself host-CPU
            # work, so a second thread only adds switches); on multi-core
            # hosts set pipe.overlap_host = True.
            self._native.set_plan_buffers(1)
            it = iter(frames_iter)
            try:
                host = self._host_decode_plan(next(it), frame_size,
                                              to_device=False)
            except StopIteration:
                return
            for payloads in it:
                args = self._plan_args_to_device(host, frame_size)
                out, self.state = self._plan_step(frame_size, self.state,
                                                  *args)
                host = self._host_decode_plan(payloads, frame_size,
                                              to_device=False)
                out.block_until_ready()
                yield out
            args = self._plan_args_to_device(host, frame_size)
            out, self.state = self._plan_step(frame_size, self.state, *args)
            out.block_until_ready()
            yield out
            return

        if self.use_plan and self.mesh is None:
            # Plan mode, threaded overlap (opt-in, multi-core hosts — see
            # the default branch above; SURVEY §7.4): the native symbol
            # decode of frame k+1 runs on a WORKER thread (the C batch
            # call releases the GIL) into arena buffer (k+1)%2 while the
            # main thread transfers buffer k%2 H2D, dispatches, and blocks
            # on frame k. H2D transfers stay strictly ordered against
            # device executions in the main thread (on a tunneled device,
            # transfers racing enqueued executions degrade the transfer
            # path) — only host CPU work overlaps them. Steady-state wall
            # is max(native, H2D+device) instead of their sum.
            from concurrent.futures import ThreadPoolExecutor
            self._native.set_plan_buffers(2)
            it = iter(frames_iter)
            try:
                first = next(it)
            except StopIteration:
                return
            with ThreadPoolExecutor(max_workers=1) as pool:
                host = self._host_decode_plan(first, frame_size,
                                              to_device=False)
                for payloads in it:
                    fut = pool.submit(self._host_decode_plan, payloads,
                                      frame_size, False)
                    args = self._plan_args_to_device(host, frame_size)
                    out, self.state = self._plan_step(frame_size, self.state,
                                                      *args)
                    out.block_until_ready()
                    host = fut.result()
                    yield out
                args = self._plan_args_to_device(host, frame_size)
                out, self.state = self._plan_step(frame_size, self.state,
                                                  *args)
                out.block_until_ready()
                yield out
            return

        pending = None
        for payloads in frames_iter:
            if self.use_plan:
                args = self._host_decode_plan(payloads, frame_size)
                if pending is not None:
                    yield pending
                pending, self.state = self._plan_step(frame_size,
                                                      self.state, *args)
                pending.block_until_ready()
            else:
                desc = self._host_decode(payloads, frame_size)
                if pending is not None:
                    yield pending
                pending, self.state = self._step(self.consts, self.state,
                                                 desc)
        if pending is not None:
            yield pending

    def decode_frames_scanned(self, frames: list, frame_size: int = 960):
        """Decode a whole list of frames (each: S payloads) in ONE device
        dispatch via lax.scan over stacked plan arenas.

        For offline consumers that read the PCM back to the host (the
        bench quality gate, file decode) this pays the tunneled-session
        per-dispatch executable-reload cost once instead of len(frames)
        times. Returns a (K, S, frame, channels) device array.
        Plan mode, no mesh, 48k family only.
        """
        import jax.numpy as jnp

        from .ops.band_exec_jax import plan_synthesis_scan

        host = self._host_decode_chunk(frames, frame_size)
        return self._dispatch_chunk(host, frame_size)

    def _host_decode_chunk(self, frames: list, frame_size: int):
        """Pure-CPU half of the scanned chunk decode (native symbol
        stage into the contiguous (K, words) backing)."""
        assert self.use_plan and self.mesh is None
        if not frames:
            raise ValueError("decode_frames_scanned needs >= 1 frame batch")
        # K arenas decoded natively into ONE contiguous (K, words) backing:
        # the scan input transfers as-is, no per-frame copy + stack
        backing2d, aux_list, any_direct = self._native.decode_plan_chunk(
            frames, frame_size)
        # NB: the native decoder has already advanced through ALL K frames
        # before this check runs — a raise here leaves the native stream
        # states desynced for the whole chunk (the per-frame `step` path
        # raises immediately instead). Chunk mode trades precise failure
        # state for dispatch amortization; callers that need to survive
        # malformed packets should use step().
        for k, aux in enumerate(aux_list):
            rcs = aux["rcs"]
            if np.any(rcs < 0):
                bad = int(np.argmax(rcs < 0))
                raise ValueError(f"chunk frame {k} stream {bad}: native "
                                 f"celt plan decode failed rc={rcs[bad]}")
        return backing2d, aux_list, any_direct, len(frames)

    def _dispatch_chunk(self, host, frame_size: int):
        """Device half: H2D the stacked arenas + one scanned dispatch.
        The returned (K, S, frame, C) array is ASYNC — callers may run
        more host work before blocking on it."""
        import jax.numpy as jnp

        from .ops.band_exec_jax import plan_synthesis_scan

        backing2d, aux_list, any_direct, K = host
        if frame_size not in self._plan_consts:
            from .ops.band_exec_jax import plan_combo_mats
            self._plan_consts[frame_size] = make_consts(n=frame_size)
            self._plan_mats[frame_size] = plan_combo_mats(self.channels,
                                                          frame_size)
        if frame_size not in self._plc_consts:
            from .celt.modes import opus_custom_mode
            from .ops.plc_jax import make_plc_consts
            self._plc_consts[frame_size] = make_plc_consts(
                frame_size, opus_custom_mode(48000, 960).window)
        xd_shape = (self.S, self.channels, frame_size)
        if any_direct:
            xd_dev = jnp.asarray(np.stack(
                [aux["x_direct"] for aux in aux_list]))
        else:
            # no direct-decoder fallback anywhere: build the (K, S, C, N)
            # zeros on device instead of staging+transferring host zeros
            # (~12 MB for a 200-frame gate batch through the tunnel)
            xd_dev = jnp.zeros((K,) + xd_shape, jnp.float32)
        pcm, self.state, self.plc_state = plan_synthesis_scan(
            self._plan_consts[frame_size],
            self._plc_consts[frame_size], self.state, self.plc_state,
            jnp.asarray(backing2d.copy() if self._cpu_backend
                        else backing2d), xd_dev,
            None, self._plan_mats[frame_size],
            channels=self.channels, frame=frame_size, n_streams=self.S)
        assert pcm.shape[0] == K
        return pcm


class SilkStreamPipeline:
    """Decode S parallel mono SILK streams with the batched device
    16 kHz -> 48 kHz up-resampler on the back. The speech-side counterpart
    of CeltStreamPipeline (SURVEY.md §7 step 4). Two synthesis placements:

    * ``synthesis="host"`` — native host symbol+synthesis stage
      (int16-exact, ~20 us/frame/core); only the resampler runs on device.
    * ``synthesis="device"`` — the SILK plan split (SURVEY §2.9.5): the
      native host decodes SYMBOLS only (side info + excitation build,
      silk_host_decode_symbols) and the LTP/LPC core synthesis runs as the
      batched device kernel ops/silk_synthesis_jax.py, fused with the
      resampler in one jitted step; out_hist/lpc_hist live on device.
      Float-level PCM (~1e-3 of full scale vs the bit-exact host).
      Lossless 20 ms batches (host PLC needs synthesized PCM).
    """

    def __init__(self, n_streams: int, fs_khz: int = 16, frame_ms: int = 20,
                 synthesis: str = "host"):
        from .ops.silk_resampler_jax import (init_up48_state, make_up48_plan,
                                             up48_step)
        from .silk import host_native as silk_native

        if not silk_native.available():
            raise RuntimeError("native silk host library unavailable")
        if fs_khz not in (8, 12, 16):
            raise ValueError("SILK internal rate must be 8/12/16 kHz")
        if synthesis not in ("host", "device"):
            raise ValueError("synthesis must be 'host' or 'device'")
        if synthesis == "device" and frame_ms != 20:
            raise ValueError("device synthesis: 20 ms frames (v1 scope)")
        import jax

        self.S = n_streams
        self.fs_khz = fs_khz
        self.frame_ms = frame_ms
        self.synthesis = synthesis
        self.hosts = [silk_native.NativeSilkHost() for _ in range(n_streams)]
        plan = make_up48_plan(fs_khz * frame_ms, fs_khz)
        # operator as runtime arg, not closure constant (see
        # OpusStreamPipeline: embedded constants re-upload per dispatch)
        self._up_w = jax.device_put(plan.wmat)
        meta = plan._replace(wmat=None)
        self._rs_state = init_up48_state(n_streams)
        self._up48_step = jax.jit(
            lambda x, st, w: up48_step(x, st, meta._replace(wmat=w)))
        if synthesis == "device":
            from .ops.silk_synthesis_jax import (SilkFrameParams,
                                                 init_silk_state,
                                                 silk_synthesis_step)
            self._silk_state = init_silk_state(n_streams, fs_khz)
            self._Params = SilkFrameParams
            sub = fs_khz * frame_ms // 4

            def fused(params, silk_st, rs_st, w):
                xq, silk_st = silk_synthesis_step(params, silk_st,
                                                  nb_subfr=4, subfr_len=sub)
                out, rs_st = up48_step(xq, rs_st, meta._replace(wmat=w))
                return out, silk_st, rs_st

            self._fused_step = jax.jit(fused)

    def _step_device(self, payloads: list):
        import jax.numpy as jnp

        L = self.fs_khz * self.frame_ms
        S = self.S
        exc = np.empty((S, L), np.float32)
        a = np.empty((S, 2, 16), np.float32)
        b = np.empty((S, 4, 5), np.float32)
        pitch = np.empty((S, 4), np.int32)
        gains = np.empty((S, 4), np.float32)
        voiced = np.empty(S, bool)
        interp = np.empty(S, bool)
        ltp_scale = np.empty(S, np.float32)
        for s, pl in enumerate(payloads):
            d = self.hosts[s].decode_symbols(pl, self.fs_khz)
            exc[s] = d["exc"]
            a[s] = d["a"]
            b[s] = d["b"]
            pitch[s] = d["pitch_l"]
            gains[s] = d["gains"]
            voiced[s] = d["voiced"]
            interp[s] = d["interp"]
            ltp_scale[s] = d["ltp_scale"]
        params = self._Params(
            exc=jnp.asarray(exc), a=jnp.asarray(a), b=jnp.asarray(b),
            pitch_l=jnp.asarray(pitch), gains=jnp.asarray(gains),
            voiced=jnp.asarray(voiced), ltp_scale=jnp.asarray(ltp_scale),
            interp=jnp.asarray(interp))
        out, self._silk_state, self._rs_state = self._fused_step(
            params, self._silk_state, self._rs_state, self._up_w)
        return out / 32768.0

    def step(self, payloads: list):
        """payloads: S SILK payload byte strings -> (S, 48*frame_ms) f32."""
        import jax.numpy as jnp

        if self.synthesis == "device":
            return self._step_device(payloads)
        L = self.fs_khz * self.frame_ms
        x = np.empty((self.S, L), np.float32)
        for s, pl in enumerate(payloads):
            x[s] = self.hosts[s].decode(pl, self.fs_khz, self.frame_ms)
        out, self._rs_state = self._up48_step(jnp.asarray(x), self._rs_state,
                                              self._up_w)
        return out / 32768.0


class OpusStreamPipeline:
    """Decode S parallel mono Opus streams of mixed SILK / CELT / hybrid
    20 ms packets, one frame per step, batched on device.

    The native unified host (opus_host_native) routes each packet by TOC:
    CELT frames emit packed band plans, SILK(WB) frames decode to 16 kHz
    pcm, hybrid frames run SILK then resume the same range decoder into
    the CELT plan decode (reference decode_frame topology,
    opus_decoder.rs:453). One fused jitted device step then runs CELT
    band reconstruction + synthesis, the batched 16k->48k up-resampler,
    and sums the two paths — per-stream mode needs no explicit masks
    because inactive components carry all-zero inputs.

    Scope: 20 ms steps (push/tick feeder splits multi-frame and 40/60 ms
    SILK packets), streams keep a consistent mode (no per-stream mode
    switching with transition smoothing — use OpusDecoder for those).
    Mono pipelines take NB/MB/WB SILK, hybrid and mono CELT; stereo
    pipelines take stereo CELT, stereo SILK (native mid/side decode +
    MS->LR, silk_host.cpp), STEREO HYBRID (joint mid/side WB SILK +
    stereo CELT resume on one range decoder), MONO HYBRID (mono CELT
    half direct-decoded with a resumed range decoder, duplicated) and
    mono SILK (duplicated to both channels).
    """

    def __init__(self, n_streams: int, host_threads: int = 0,
                 channels: int = 1, mesh=None,
                 silk_synthesis: str = "host"):
        import jax
        import jax.numpy as jnp

        from .opus_host_native import NativeOpusHostBatch
        from .ops.band_exec_jax import plan_combo_mats
        from .ops.silk_resampler_jax import (init_up48_state, make_up48_plan,
                                             up48_step)

        self.S = n_streams
        self.channels = channels
        self.mesh = mesh
        if silk_synthesis not in ("host", "device"):
            raise ValueError("silk_synthesis must be 'host' or 'device'")
        if silk_synthesis == "device" and channels != 1:
            raise ValueError("device SILK synthesis: mono pipelines (v1)")
        self._silk_device = silk_synthesis == "device"
        self._native_shards = None
        if mesh is not None:
            n_dev = mesh.devices.size
            if n_streams % n_dev:
                raise ValueError("n_streams must divide the mesh size")
            # one native host batch per device shard (arena layouts are
            # per-shard; each shard's arrays transfer to its own device)
            self._native_shards = [
                NativeOpusHostBatch(n_streams // n_dev, channels,
                                    host_threads)
                for _ in range(n_dev)]
            self._native = self._native_shards[0]
        else:
            self._native = NativeOpusHostBatch(n_streams, channels,
                                               host_threads)
        self.consts = make_consts()
        self.state = init_state(n_streams, channels)
        # one up-resampler plan per SILK internal rate; a stream's rate
        # selects its output (and which state advances) by mask
        self._rates = (8, 12, 16)
        # stereo pipelines resample each SILK channel independently
        # (stereo SILK decodes natively to L/R planes): one resampler row
        # per (stream, channel)
        self._rows = n_streams * channels
        self.rs_states = {r: init_up48_state(self._rows)
                          for r in self._rates}
        plans = {r: make_up48_plan(20 * r, r) for r in self._rates}
        # the resampler operators must be runtime ARGUMENTS, not closure
        # captures: on a tunneled device an executable's embedded array
        # constants are re-uploaded on every dispatch (measured 26 ms/step
        # for a 1.3 MB operator as a constant vs 0.05 ms as an arg)
        self._up_ws = {r: jax.device_put(plans[r].wmat) for r in self._rates}
        plan_metas = {r: plans[r]._replace(wmat=None) for r in self._rates}

        # ONE fused program per step: steady-state decode dispatches a
        # single executable, with every multi-MB operand (arenas, combo
        # mats, resampler operators) passed as runtime args. Two tunnel
        # rules, both measured: (1) embedded array constants are
        # re-uploaded per dispatch; (2) any device->host readback
        # permanently degrades dispatch to executable-reupload mode
        # (~1 s/step) — consumers should read results only in processes
        # that don't own a serving loop.
        from .celt.modes import opus_custom_mode
        from .ops.plc_jax import init_plc_state, make_plc_consts
        self.plc_state = init_plc_state(n_streams, channels)
        # runtime ARGUMENT, not a closure capture: the PLC consts include
        # a 3.7 MB forward-MDCT basis, and embedded array constants are
        # re-uploaded on every dispatch through the device tunnel
        self._plc_consts = make_plc_consts(
            960, opus_custom_mode(48000, 960).window)

        def step_core(consts, plc_consts, state, plc_state, rs_states,
                      prev_fs, silk_prev, backing, x_direct, silk16,
                      silk_fs, sdel, mats, up_ws, sf=None, si=None,
                      silk_dev_state=None, dev_mask=None, *, S_eff):
            from .ops.band_exec_jax import plan_synthesis_step_plc
            n_streams = S_eff  # local S under shard_map, global otherwise
            pcm, new_state, new_plc = plan_synthesis_step_plc(
                consts, plc_consts, state, plc_state, backing, x_direct,
                None, mats, channels=channels, n_streams=n_streams)
            new_silk_dev = silk_dev_state
            if sf is not None:
                # device-SILK lane (silk_synthesis="device", VERDICT r4
                # item 7): WB mode-5 streams carry SilkFrameParams on the
                # wire instead of host-synthesized pcm; the LTP/LPC core
                # runs here (ops/silk_synthesis_jax.py) and its output
                # replaces those streams' silk16 rows. Masked streams run
                # the kernel on stale-but-valid params and are discarded.
                from .ops.silk_synthesis_jax import (SilkFrameParams,
                                                     silk_synthesis_step)
                S_ = sf.shape[0]
                params = SilkFrameParams(
                    exc=sf[:, :320],
                    a=sf[:, 320:352].reshape(S_, 2, 16),
                    b=sf[:, 352:372].reshape(S_, 4, 5),
                    pitch_l=jnp.maximum(si[:, :4], 18),
                    gains=sf[:, 372:376],
                    voiced=si[:, 4] != 0,
                    ltp_scale=sf[:, 376],
                    interp=si[:, 5] != 0)
                xq_dev, silk_dev2 = silk_synthesis_step(
                    params, silk_dev_state, nb_subfr=4, subfr_len=80)
                m = dev_mask[:, None]
                silk16 = jnp.where(m, xq_dev.astype(jnp.float32),
                                   silk16.astype(jnp.float32))
                # only device-SILK streams advance their device state
                new_silk_dev = jax.tree.map(
                    lambda a_, b_: jnp.where(dev_mask.reshape(
                        (-1,) + (1,) * (a_.ndim - 1)), a_, b_),
                    silk_dev2, silk_dev_state)
            # the SILK decode API feeds its resampler through a 1-sample
            # delay (the s_mid stereo-prediction tail; silk/dec_api.py:330
            # resamples samples_out1[1:]) — mirror it for exact alignment.
            # Stereo-SILK rows (sdel) are already delayed: the MS->LR unmix
            # rewrites the history slot, so its output window x1[1:L+1]
            # bakes the 1-sample delay in (silk_host.cpp stereo_ms_to_lr_c).
            xs = silk16.astype(jnp.float32)  # (rows, 320)
            fs_rows = jnp.repeat(silk_fs, channels)
            pfs_rows = jnp.repeat(prev_fs, channels)
            sdel_rows = jnp.repeat(sdel, channels)
            up = jnp.zeros((xs.shape[0], 960), jnp.float32)
            new_rs = {}
            new_prev = jnp.zeros_like(silk_prev)
            for r in (8, 12, 16):
                L = 20 * r
                on = fs_rows == r
                switched = on & (pfs_rows != r)
                st_r = jax.tree.map(
                    lambda z: jnp.where(switched.reshape(
                        (-1,) + (1,) * (z.ndim - 1)), 0.0, z), rs_states[r])
                x_mono = jnp.concatenate([silk_prev[:, None], xs[:, : L - 1]],
                                         axis=1)
                x = jnp.where(sdel_rows[:, None], xs[:, :L], x_mono)
                up_r, rs_r = up48_step(x, st_r,
                                       plan_metas[r]._replace(wmat=up_ws[r]))
                up = jnp.where(on[:, None], up_r, up)
                new_rs[r] = jax.tree.map(
                    lambda a, b: jnp.where(on.reshape(
                        (-1,) + (1,) * (a.ndim - 1)), a, b), rs_r,
                    rs_states[r])
                new_prev = jnp.where(on, xs[:, L - 1], new_prev)
            if channels == 2:
                upc = up.reshape(n_streams, 2, 960)
                out = pcm + jnp.transpose(upc, (0, 2, 1)) * (1.0 / 32768.0)
            else:
                out = pcm + up[:, :, None] * (1.0 / 32768.0)
            return out, new_state, new_plc, new_rs, new_prev, new_silk_dev

        import functools
        if mesh is None:
                self._step = jax.jit(functools.partial(step_core,
                                                   S_eff=n_streams))
        else:
            # shard_map over the streams axis: per-shard arenas/pcm/fs
            # and per-shard lax.cond PLC; consts/mats/resampler operators
            # replicated. No collectives in steady state (SURVEY §2.9).
            from jax.sharding import PartitionSpec as P
            try:
                from jax import shard_map as _sm
            except ImportError:
                from jax.experimental.shard_map import shard_map as _sm
            n_dev = mesh.devices.size
            inner = functools.partial(step_core,
                                      S_eff=n_streams // n_dev)
            P_s, P_r = P("streams"), P()
            in_specs = (P_r, P_r, P_s, P_s, P_s, P_s, P_s, P_s, P_s, P_s,
                        P_s, P_s, P_r, P_r)
            if self._silk_device:
                # + sf, si, silk_dev_state, dev_mask (all stream-sharded)
                in_specs = in_specs + (P_s, P_s, P_s, P_s)
            out_specs = (P_s, P_s, P_s, P_s, P_s, P_s)
            try:
                sm = _sm(inner, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)
            except TypeError:   # older jax: no check_vma kwarg
                sm = _sm(inner, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs)
            self._step = jax.jit(sm)
        self._mats = plan_combo_mats(channels, 960)
        self.silk_prev = jnp.zeros((self._rows,), jnp.float32)
        self.prev_fs = jnp.full((n_streams,), 16, jnp.int32)
        self._xd_zeros = jnp.zeros((n_streams, channels, 960), jnp.float32)
        self.silk_dev_state = None
        if self._silk_device:
            from .ops.silk_synthesis_jax import init_silk_state
            self.silk_dev_state = init_silk_state(n_streams, 16)
            self._last_real_mode = np.zeros(n_streams, np.int32)
        if mesh is not None:
            from .parallel.streaming import replicate, shard_state
            if self.silk_dev_state is not None:
                self.silk_dev_state = shard_state(mesh, self.silk_dev_state)
            self.state = shard_state(mesh, self.state)
            self.plc_state = shard_state(mesh, self.plc_state)
            self.rs_states = shard_state(mesh, self.rs_states)
            self.silk_prev = shard_state(mesh, self.silk_prev)
            self.prev_fs = shard_state(mesh, self.prev_fs)
            self._xd_zeros = shard_state(mesh, self._xd_zeros)
            self.consts = replicate(mesh, self.consts)
            self._plc_consts = replicate(mesh, self._plc_consts)
            self._mats = replicate(mesh, self._mats)
            self._up_ws = replicate(mesh, self._up_ws)
        self._xd_zeros.block_until_ready()
        self._prev_xfer = []
        self.last_modes = None
        self._queues = None  # feeder mode (push/tick), built on first push

    def push(self, s: int, packet: bytes | None) -> None:
        """Feeder mode: queue one packet (or None = one lost 20 ms tick)
        for stream s, then call tick() to decode 20 ms for all streams.

        Accepts multi-frame packets (codes 1-3) and 10/40/60 ms SILK
        frames (reference packet framing, src/packet.rs:316): CELT and
        hybrid frames are 20 ms each and re-wrapped as code-0 packets;
        40/60 ms SILK frames decode natively in one call at tick time
        and feed 20 ms chunks; 10 ms SILK frames pair up per tick (an
        unpaired half zero-pads its second 10 ms). 2.5-10 ms CELT and
        10 ms hybrid frames need the OpusDecoder path (the fused device
        step is fixed at 960 samples)."""
        from collections import deque

        from .bitstream.packet import parse_packet

        if self._queues is None:
            self._queues = [deque() for _ in range(self.S)]
        q = self._queues[s]
        if packet is None:
            q.append(None)
            return
        toc = packet[0]
        config = toc >> 3
        frames = parse_packet(packet).frames
        toc0 = bytes([toc & 0xFC])  # same config + stereo bit, code 0
        if config >= 16:  # CELT: (config & 3) = 2.5/5/10/20 ms
            if (config & 3) != 3:
                raise ValueError("feeder supports 20 ms CELT frames only")
            for f in frames:
                q.append(("f", toc0 + f))
        elif config >= 12:  # hybrid: 10/20 ms
            if (config & 1) != 1:
                raise ValueError("feeder supports 20 ms hybrid frames only")
            for f in frames:
                q.append(("f", toc0 + f))
        else:  # SILK: 10/20/40/60 ms
            dur = (10, 20, 40, 60)[config & 3]
            fs = 8 if config < 4 else (12 if config < 8 else 16)
            if dur == 10:
                # half-tick frames: paired up at tick time (a steady
                # 10 ms stream delivers two packets per 20 ms tick); an
                # unpaired half zero-pads its second 10 ms
                for f in frames:
                    q.append(("h", f, fs))
            elif dur == 20:
                for f in frames:
                    q.append(("f", toc0 + f))
            else:
                for f in frames:
                    q.append(("m", f, fs, dur))

    def tick(self):
        """Feeder mode: decode the next 20 ms for every stream from its
        queue (an empty queue underruns as a lost tick -> PLC). Returns a
        device array (S, 960, channels) float32."""
        from .opus_host_native import SKIP

        assert self._queues is not None, "push() packets before tick()"
        packets = [None] * self.S
        fills = {}
        for s in range(self.S):
            q = self._queues[s]
            item = q.popleft() if q else None
            if item is None:
                packets[s] = None
                continue
            if item[0] == "f":
                packets[s] = item[1]
                continue
            if item[0] == "h":  # 10 ms SILK half-tick frames, paired
                _, pay, fs = item
                half1 = self._native.decode_silk_frames(s, pay, fs, 10)
                if q and q[0][0] == "h" and q[0][2] == fs:
                    _, pay2, _ = q.popleft()
                    half2 = self._native.decode_silk_frames(s, pay2, fs, 10)
                else:
                    half2 = np.zeros(10 * fs, np.int16)  # half underrun
                chunk = np.concatenate([half1, half2])
                fills[s] = (chunk, fs)
                packets[s] = SKIP
                continue
            if item[0] == "m":  # head of a 40/60 ms SILK frame: decode now
                _, pay, fs, dur = item
                pcm = self._native.decode_silk_frames(s, pay, fs, dur)
                L = 20 * fs
                for k in range(dur // 20 - 1, 0, -1):
                    q.appendleft(("pcm", pcm[k * L:(k + 1) * L], fs))
                chunk = pcm[:L]
            else:  # buffered 20 ms chunk
                _, chunk, fs = item
            fills[s] = (chunk, fs)
            packets[s] = SKIP
        return self.step(packets, 960, _fills=fills)

    def step(self, packets: list, frame_size: int = 960,
             fec_packets: list | None = None, _fills: dict | None = None):
        """packets: S whole Opus packets (one 20 ms frame each); None
        entries are lost frames. fec_packets (optional): per lost stream,
        the NEXT packet — its in-band LBRR replaces the loss when present
        (SILK/hybrid), otherwise PLC conceals. Returns a device array
        (S, 960, channels), float32."""
        import jax.numpy as jnp

        if frame_size != 960:
            # the native opus_host plan path hard-codes 20 ms plane offsets;
            # any other frame size would corrupt the arena layout
            raise ValueError("OpusStreamPipeline supports 20 ms (960-sample) "
                             f"frames only, got {frame_size}")
        if self.mesh is not None:
            return self._step_sharded(packets, fec_packets, _fills)
        if self._silk_device:
            (arenas, aux, layout, silk16, modes, silk_fs, silk_stereo,
             sparams) = self._native.decode(packets, frame_size,
                                            fec_packets, silk_params=True)
            # loss scope guard: device-SILK streams keep their synthesis
            # state on device, so the host PLC has no pcm history for
            # them (same scope as SilkStreamPipeline's device mode)
            concealed = np.isin(modes, (3, 4))
            bad = concealed & (self._last_real_mode == 5)
            if bad.any():
                raise ValueError(
                    "silk_synthesis='device' serves lossless SILK "
                    f"streams; stream {int(np.argmax(bad))} lost a frame "
                    "(use the default host synthesis for lossy SILK)")
            self._last_real_mode = np.where(concealed,
                                            self._last_real_mode, modes)
        else:
            (arenas, aux, layout, silk16, modes, silk_fs,
             silk_stereo) = self._native.decode(packets, frame_size,
                                                fec_packets)
        if _fills:
            for s, (chunk, fs) in _fills.items():
                silk16[s, :len(chunk)] = chunk
                if self.channels == 2:  # duplicate the mono chunk
                    silk16[s, 320:320 + len(chunk)] = chunk
                silk_fs[s] = fs
        rcs = aux["rcs"]
        if np.any(rcs < 0):
            bad = int(np.argmax(rcs < 0))
            raise ValueError(f"stream {bad}: native opus host decode "
                             f"failed rc={rcs[bad]}")
        self.last_modes = modes
        # device CELT PLC only for PLC-concealed streams (rc 1), not for
        # FEC-recovered ones (rc 2: the LBRR frame replaces the loss);
        # the mask rides the arena transfer (lost8 plane)
        name, off, _sh = layout["lost8"]
        arenas[name][off:off + self.S] = (rcs == 1).view(np.int8)
        name, off, shape = layout["direct"]
        any_direct = bool(arenas[name][off:off + shape[0]].any())
        xd = jnp.asarray(aux["x_direct"]) if any_direct else self._xd_zeros
        # reap the previous step's transfer buffers (see _plan_args_to_device)
        for _buf in self._prev_xfer:
            try:
                _buf.delete()
            except Exception:
                pass
        fs_dev = jnp.asarray(silk_fs)
        rows16 = silk16.reshape(self._rows, 320)
        backing_dev = jnp.asarray(arenas["backing"])
        rows_dev = jnp.asarray(rows16)
        st_dev = jnp.asarray(silk_stereo != 0)
        self._prev_xfer = [backing_dev, rows_dev, st_dev]
        if xd is not self._xd_zeros:
            self._prev_xfer.append(xd)
        if self._silk_device:
            sf_dev = jnp.asarray(sparams[0])
            si_dev = jnp.asarray(sparams[1])
            dev_mask = jnp.asarray(modes == 5)
            (pcm, self.state, self.plc_state, self.rs_states,
             self.silk_prev, self.silk_dev_state) = self._step(
                self.consts, self._plc_consts, self.state, self.plc_state,
                self.rs_states, self.prev_fs, self.silk_prev,
                backing_dev, xd, rows_dev, fs_dev, st_dev,
                self._mats, self._up_ws, sf_dev, si_dev,
                self.silk_dev_state, dev_mask)
            self._prev_xfer.extend([sf_dev, si_dev])
        else:
            (pcm, self.state, self.plc_state, self.rs_states,
             self.silk_prev, _) = self._step(
                self.consts, self._plc_consts, self.state, self.plc_state,
                self.rs_states, self.prev_fs, self.silk_prev,
                backing_dev, xd,
                rows_dev, fs_dev, st_dev,
                self._mats, self._up_ws)
        if self.prev_fs is not fs_dev:
            self._prev_xfer.append(self.prev_fs)
        self.prev_fs = fs_dev
        return pcm

    def _step_sharded(self, packets: list, fec_packets, _fills):
        """Mesh-mode step: per-shard native host decode (each shard's
        arenas/silk pcm are assembled into global arrays sharded on the
        streams axis), then the shard_map'd fused device step with
        per-shard PLC. Matches the single-chip step() exactly
        (tests/test_pipeline.py::test_mixed_sharded_matches_unsharded)."""
        import jax.numpy as jnp

        from .parallel.streaming import make_global_sharded

        n_dev = self.mesh.devices.size
        S_loc = self.S // n_dev
        parts = {"backing": [], "xd": [], "rows": [], "fs": [], "st": [],
                 "sf": [], "si": []}
        modes_all = []
        any_direct = False
        for d, nat in enumerate(self._native_shards):
            lo = d * S_loc
            sub = packets[lo: lo + S_loc]
            fec_sub = (None if fec_packets is None
                       else fec_packets[lo: lo + S_loc])
            if self._silk_device:
                (arenas, aux, layout, silk16, modes, silk_fs,
                 silk_stereo, sparams) = nat.decode(
                    sub, 960, fec_sub, silk_params=True)
                parts["sf"].append(sparams[0].copy())
                parts["si"].append(sparams[1].copy())
            else:
                (arenas, aux, layout, silk16, modes, silk_fs,
                 silk_stereo) = nat.decode(sub, 960, fec_sub)
            if _fills:
                for s, (chunk, fs) in _fills.items():
                    if lo <= s < lo + S_loc:
                        sl = s - lo
                        silk16[sl, :len(chunk)] = chunk
                        if self.channels == 2:
                            silk16[sl, 320:320 + len(chunk)] = chunk
                        silk_fs[sl] = fs
            rcs = aux["rcs"]
            if np.any(rcs < 0):
                bad = int(np.argmax(rcs < 0))
                raise ValueError(f"stream {lo + bad}: native opus host "
                                 f"decode failed rc={rcs[bad]}")
            modes_all.extend(modes)
            name, off, _sh = layout["lost8"]
            arenas[name][off:off + S_loc] = (rcs == 1).view(np.int8)
            name, off, shape = layout["direct"]
            any_direct |= bool(arenas[name][off:off + shape[0]].any())
            parts["backing"].append(arenas["backing"].copy())
            parts["xd"].append(aux["x_direct"].astype(np.float32))
            parts["rows"].append(
                silk16.reshape(S_loc * self.channels, 320).copy())
            parts["fs"].append(silk_fs.copy())
            parts["st"].append((silk_stereo != 0).copy())
        self.last_modes = modes_all
        for _buf in self._prev_xfer:
            try:
                _buf.delete()
            except Exception:
                pass
        mk = lambda key: make_global_sharded(self.mesh, parts[key])  # noqa
        backing_dev = mk("backing")
        rows_dev = mk("rows")
        fs_dev = mk("fs")
        st_dev = mk("st")
        xd = mk("xd") if any_direct else self._xd_zeros
        self._prev_xfer = [backing_dev, rows_dev, st_dev]
        if xd is not self._xd_zeros:
            self._prev_xfer.append(xd)
        if self._silk_device:
            modes_np = np.asarray(modes_all, np.int32)
            concealed = np.isin(modes_np, (3, 4))
            bad = concealed & (self._last_real_mode == 5)
            if bad.any():
                raise ValueError(
                    "silk_synthesis='device' serves lossless SILK "
                    f"streams; stream {int(np.argmax(bad))} lost a frame")
            self._last_real_mode = np.where(concealed,
                                            self._last_real_mode, modes_np)
            sf_dev = mk("sf")
            si_dev = mk("si")
            dev_mask = make_global_sharded(
                self.mesh, [m == 5 for m in
                            (np.asarray(modes_all[d * S_loc:(d + 1) * S_loc],
                                        np.int32) for d in range(n_dev))])
            self._prev_xfer.extend([sf_dev, si_dev])
            (pcm, self.state, self.plc_state, self.rs_states,
             self.silk_prev, self.silk_dev_state) = self._step(
                self.consts, self._plc_consts, self.state, self.plc_state,
                self.rs_states, self.prev_fs, self.silk_prev,
                backing_dev, xd, rows_dev, fs_dev, st_dev,
                self._mats, self._up_ws, sf_dev, si_dev,
                self.silk_dev_state, dev_mask)
        else:
            (pcm, self.state, self.plc_state, self.rs_states,
             self.silk_prev, _) = self._step(
                self.consts, self._plc_consts, self.state, self.plc_state,
                self.rs_states, self.prev_fs, self.silk_prev,
                backing_dev, xd, rows_dev, fs_dev, st_dev,
                self._mats, self._up_ws)
        if self.prev_fs is not fs_dev:
            self._prev_xfer.append(self.prev_fs)
        self.prev_fs = fs_dev
        return pcm

    def decode_stream(self, frames_iter, frame_size: int = 960):
        """Generator over frames of S packets (strictly serialized; see
        CeltStreamPipeline.decode_stream)."""
        for packets in frames_iter:
            pcm = self.step(packets, frame_size)
            pcm.block_until_ready()
            yield pcm


class SilkEncodePipeline:
    """Batched SILK encode with the device noise-shaping quantizer
    (SURVEY.md §2.9.7): S per-stream encoders run the reference analysis
    chain (burg LPC, 3-stage pitch, shaping analysis) on host threads,
    and every quantizer round executes as ONE batched nsq_frame dispatch
    on the TPU (ops/silk_nsq_jax.py via parallel/nsq_batch.py). Packets
    are standard SILK mono Opus frames. The kernel's lanes are
    independent, so a stream's packets don't depend on its batch — the
    speech-side counterpart of CeltEncodePipeline.

    Batching engages for WB (16 kHz internal) 20 ms frames — the kernel's
    static shape; NB/MB analysis falls back to the host quantizer inline.
    """

    def __init__(self, n_streams: int, bitrate: int = 24000):
        from .bitstream.packet import Mode
        from .opus_encoder import APP_VOIP, OpusEncoder
        from .parallel.nsq_batch import NsqBatchExecutor

        self.S = n_streams
        self._ex = NsqBatchExecutor(n_streams)
        self.encs = []
        for _ in range(n_streams):
            e = OpusEncoder(48000, 1, APP_VOIP)
            e.set_bitrate(bitrate)
            e.force_mode = Mode.SILK
            e.silk.nsq_fn = self._ex.hook
            self.encs.append(e)

    def step(self, pcm) -> list:
        """pcm: (S, 960) or (S, 960, 1) float in [-1, 1] -> S packets."""
        pcm = np.asarray(pcm, np.float64)
        if pcm.ndim == 2:
            pcm = pcm[:, :, None]
        tasks = [
            (lambda s=s: self.encs[s].encode(pcm[s], pcm.shape[1]))
            for s in range(self.S)
        ]
        return self._ex.run(tasks)


class CeltEncodePipeline:
    """Batched CELT encode: the device front half (preemphasis, tone
    detection, prefilter pitch search + application, transient analysis,
    forward MDCT — ops/encode_front_jax.py, SURVEY §2.9.8) feeding S host
    symbol encoders (coarse/fine energy, allocation, PVQ search, range
    coding). Packets are standard CELT-only Opus frames, decodable by any
    conformant decoder. CBR per-frame byte budgets (v1 scope).
    """

    def __init__(self, n_streams: int, channels: int = 2,
                 bitrate: int = 128000, frame_size: int = 960):
        import jax.numpy as jnp

        from .celt.encoder import CeltEncoder
        from .ops.encode_front_jax import (front_step, init_front_state,
                                           make_front_consts)
        self.S = n_streams
        self.channels = channels
        self.frame = frame_size
        self.nbytes = max(12, int(bitrate * frame_size / (8 * 48000)))
        self._consts = make_front_consts(frame_size)
        self._state = init_front_state(n_streams, channels, frame_size)
        self._front = front_step
        self._jnp = jnp
        # native symbol back half (C++ PVQ search + range coding, ~200x
        # the Python encoder's speed); byte-identical to the Python
        # encode_with_ec precomputed path (tests/test_encode_native.py)
        self._native = None
        try:
            from .celt.host_native import NativeCeltEncoderBatch
            self._native = NativeCeltEncoderBatch(n_streams,
                                                  channels=channels)
        except (RuntimeError, OSError, AttributeError):
            self._native = None
        self.encs = None
        if self._native is None:
            self.encs = [CeltEncoder(channels=channels,
                                     stream_channels=channels)
                         for _ in range(n_streams)]

    def front(self, pcm):
        """Device half only (jitted): returns the analysis tensors."""
        jnp = self._jnp
        if self._native is not None:
            tapset = self._native.tapsets()
        else:
            tapset = np.asarray([e.tapset_decision for e in self.encs],
                                np.int32)
        nby = np.full(self.S, self.nbytes, np.int32)
        out, self._state = self._front(
            self._consts, self._state, jnp.asarray(pcm, jnp.float32),
            jnp.asarray(nby), jnp.asarray(tapset),
            channels=self.channels, frame=self.frame)
        return out

    def _native_back(self, host) -> list:
        """One frame's native symbol-encode from a fetched front dict."""
        S = self.S
        iparams = np.zeros((S, 6), np.int32)
        iparams[:, 0] = host["silence"]
        iparams[:, 1] = host["pf_on"]
        iparams[:, 2] = host["pitch_index"]
        iparams[:, 3] = host["qg"]
        iparams[:, 4] = host["is_transient"]
        iparams[:, 5] = self.nbytes
        fparams = np.stack([host["tone_freq"], host["toneishness"],
                            host["tf_estimate"]], axis=1)
        freq = host["freq"]
        if freq.dtype != np.float32:
            freq = freq.astype(np.float32)   # compact f16 readback
        return self._native.encode(freq, iparams, fparams,
                                   self.frame)

    def step(self, pcm) -> list:
        """pcm: (S, frame, channels) float in [-1, 1] -> S packets."""
        import jax
        out = self.front(pcm)
        host = jax.device_get(out)  # one batched readback
        if self._native is not None:
            return self._native_back(host)
        pkts = []
        for s in range(self.S):
            pre = {k: host[k][s] for k in host}
            pkts.append(self.encs[s].encode_with_ec(
                np.asarray(pcm[s], np.float64), self.frame, self.nbytes,
                precomputed=pre))
        return pkts

    def step_chunk(self, pcms) -> list:
        """Encode K frames per stream in ONE device dispatch + ONE
        readback (ops/encode_front_jax.front_scan): pcms is
        (K, S, frame, channels) float in [-1, 1]; returns a list of K
        lists of S packets. The native tapset feedback is applied once
        per chunk (up to K frames of lag — a valid, in-stream-signaled
        encoder choice), which is what makes the chunk a single scan.
        On a tunneled device the per-readback fixed cost dominates the
        encode path, so throughput scales ~linearly with K."""
        import jax
        import jax.numpy as jnp

        from .ops.encode_front_jax import front_scan
        assert self._native is not None, "chunked encode needs the native back half"
        tapset = self._native.tapsets()
        nby = np.full(self.S, self.nbytes, np.int32)
        outs, self._state = front_scan(
            self._consts, self._state, jnp.asarray(pcms, jnp.float32),
            jnp.asarray(nby), jnp.asarray(tapset),
            channels=self.channels, frame=self.frame, compact=True)
        hosts = jax.device_get(outs)  # one readback for all K frames
        K = pcms.shape[0]
        return [self._native_back({k: hosts[k][i] for k in hosts})
                for i in range(K)]

    def encode_stream(self, pcms_iter):
        """Pipelined chunked encode: generator over (K, S, frame, ch)
        chunks yielding one list of S packets per FRAME, overlapping the
        native C++ symbol back half of chunk i with the device front of
        chunk i+1 (they share nothing but the tapset feedback, which is
        a valid in-stream-signaled encoder choice already allowed K
        frames of lag in step_chunk; here it lags up to 2K). The
        device->host copy is started asynchronously at dispatch so the
        blocking device_get at chunk i+1 finds the bytes already
        landed; on a tunneled device this hides the native back half
        entirely behind the device round-trip (VERDICT r4 item 4)."""
        import jax
        import jax.numpy as jnp

        from .ops.encode_front_jax import front_scan
        assert self._native is not None, \
            "pipelined encode needs the native back half"

        def _drain(pending):
            hosts, K = pending
            hosts = jax.device_get(hosts)
            return [self._native_back({k: hosts[k][i] for k in hosts})
                    for i in range(K)]

        pending = None
        for pcms in pcms_iter:
            tapset = self._native.tapsets()
            nby = np.full(self.S, self.nbytes, np.int32)
            outs, self._state = front_scan(
                self._consts, self._state, jnp.asarray(pcms, jnp.float32),
                jnp.asarray(nby), jnp.asarray(tapset),
                channels=self.channels, frame=self.frame, compact=True)
            try:
                for leaf in jax.tree_util.tree_leaves(outs):
                    leaf.copy_to_host_async()
            except Exception:
                pass  # backend without async host copies
            if pending is not None:
                for pkts in _drain(pending):
                    yield pkts
            pending = (outs, pcms.shape[0])
        if pending is not None:
            for pkts in _drain(pending):
                yield pkts
