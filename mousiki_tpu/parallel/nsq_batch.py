"""Thread-barrier batching of SILK encoder NSQ calls onto the device.

The SILK encoder's noise-shaping quantizer is the per-sample hot loop of
the encode side (reference src/silk/nsq.rs, SURVEY.md §2.9.7). The host
analysis chain (pitch, burg LPC, shaping analysis) is per-stream Python,
but the NSQ itself has a batched device kernel (ops/silk_nsq_jax.py)
whose lanes are independent streams. This module lets S concurrent
encoder workers share ONE device dispatch per quantizer round:

  * every worker runs its frame analysis on its own thread and, where
    silk/encoder.py would call nsq_shaped, calls the injected hook;
  * the hook parks the thread on a barrier; when no worker is runnable
    (all parked or finished), the coordinator batches the parked calls,
    runs nsq_frame once on the device, writes each lane's pulses and
    NsqState back, and releases the threads.

Calls outside the kernel's static shape (non-WB rates, 10 ms frames,
order < 16) fall back to the host nsq_shaped inline — the batch only
ever contains homogeneous (S, 320) WB lanes. Lanes are independent in
the kernel, so a stream's packets are identical whether it is encoded
alone or inside a batch (tests/test_encode_pipeline.py).
"""

from __future__ import annotations

import threading

import numpy as np

_FS_KHZ = 16
_L = _FS_KHZ * 20            # WB 20 ms frame
_M = _FS_KHZ * 20            # ltp_mem_length
_NB = 4
_SUB = _L // _NB
_ORDER = 24                  # shaping AR capacity (kernel SHAPE_ORDER)


class NsqBatchExecutor:
    """Runs S encode tasks on threads, batching their NSQ calls.

    use_del_dec=True (default) runs the (S, 4)-state delayed-decision
    device trellis (ops/silk_nsq_jax.nsq_del_dec_frame) with warped
    feedback — the device form of the encoder's default host quantizer;
    False selects the single-state kernel."""

    def __init__(self, n_slots: int, use_del_dec: bool = True):
        self.S = n_slots
        self.use_del_dec = use_del_dec
        self._cv = threading.Condition()
        self._running = 0
        self._waiting = []       # parked requests
        self._jit = None

    # ---------------------------------------------------------------- hook
    def hook(self, x, st_nsq, ctl, **kw):
        """Drop-in replacement for silk.noise_shape.nsq_shaped."""
        if (kw["frame_length"] != _L or kw["lpc_order"] != 16
                or kw["nb_subfr"] != _NB or kw["ltp_mem_length"] != _M
                or ctl.ar.shape[1] > _ORDER):
            if self.use_del_dec:
                from ..silk.nsq_del_dec import nsq_del_dec_best
                return nsq_del_dec_best(
                    x, st_nsq, ctl, **kw, n_states=4,
                    warping=983 * _FS_KHZ / 65536.0)
            from ..silk.noise_shape import nsq_shaped
            return nsq_shaped(x, st_nsq, ctl, **kw)
        req = {"x": np.asarray(x, np.float64), "st": st_nsq, "ctl": ctl,
               "kw": kw, "event": threading.Event(), "pulses": None,
               "seed": None}
        with self._cv:
            self._waiting.append(req)
            self._running -= 1
            self._cv.notify_all()
        # the coordinator re-increments _running for every released request
        # BEFORE setting its event, so the barrier can never observe a
        # "running == 0" window while a released thread is still resuming
        req["event"].wait()
        if self.use_del_dec:
            return req["pulses"], req["seed"]
        return req["pulses"]

    # ------------------------------------------------------------ dispatch
    def _device_fn(self):
        if self._jit is None:
            from functools import partial

            import jax

            from ..ops import silk_nsq_jax as dnsq
            self._dnsq = dnsq
            if self.use_del_dec:
                self._jit = partial(dnsq.nsq_del_dec_frame, nb_subfr=_NB,
                                    sub=_SUB, M=_M, n_states=4,
                                    warping=983 * _FS_KHZ / 65536.0)
            else:
                self._jit = partial(dnsq.nsq_frame, nb_subfr=_NB,
                                    sub=_SUB, M=_M)
        return self._jit

    def _dispatch(self, reqs):
        import jax.numpy as jnp

        from ..silk import noise_shape as ns

        dnsq_fn = self._device_fn()
        dnsq = self._dnsq
        S = self.S
        n = len(reqs)
        P = dict(x=np.zeros((S, _L), np.float32),
                 a=np.zeros((S, 2, 16), np.float32),
                 b=np.zeros((S, _NB, 5), np.float32),
                 ar_shp=np.zeros((S, _NB, _ORDER), np.float32),
                 harm=np.zeros((S, _NB), np.float32),
                 tilt=np.zeros((S, _NB), np.float32),
                 lf_ma=np.zeros((S, _NB), np.float32),
                 lf_ar=np.zeros((S, _NB), np.float32),
                 gains=np.ones((S, _NB), np.float32),
                 pitch_l=np.full((S, _NB), 64, np.int32),
                 lam=np.zeros(S, np.float32), offset=np.zeros(S, np.float32),
                 voiced=np.zeros(S, bool), seed=np.zeros(S, np.int32),
                 ltp_scale=np.ones(S, np.float32),
                 interp=np.zeros(S, bool))
        st = dict(xq=np.zeros((S, _M), np.float32),
                  shp=np.zeros((S, _M), np.float32),
                  s_lpc=np.zeros((S, 16), np.float32),
                  s_ar2=np.zeros((S, _ORDER), np.float32),
                  s_lf_ar=np.zeros(S, np.float32),
                  s_diff=np.zeros(S, np.float32),
                  lag_prev=np.zeros(S, np.int32),
                  prev_gain=np.ones(S, np.float32))
        for i, r in enumerate(reqs):
            kw, ctl, stn = r["kw"], r["ctl"], r["st"]
            P["x"][i] = r["x"]
            for h in range(2):
                P["a"][i, h] = np.asarray(kw["pred_coef_q12"][h],
                                          np.float64)[:16] / 4096.0
            P["b"][i] = np.asarray(kw["ltp_coef_q14"],
                                   np.float64).reshape(_NB, 5) / 16384.0
            o = ctl.ar.shape[1]
            P["ar_shp"][i, :, :o] = ctl.ar
            P["harm"][i] = ctl.harm_shape_gain
            P["tilt"][i] = ctl.tilt
            P["lf_ma"][i] = ctl.lf_ma
            P["lf_ar"][i] = ctl.lf_ar
            P["gains"][i] = np.maximum(1, np.asarray(
                kw["gains_q16"], np.int64)) / 65536.0
            P["pitch_l"][i] = kw["pitch_l"]
            P["lam"][i] = ctl.lambda_
            voiced = kw["signal_type"] == 2
            P["voiced"][i] = voiced
            P["offset"][i] = ns._QUANT_OFFSETS[1 if voiced else 0][
                ctl.quant_offset_type]
            P["seed"][i] = kw["seed"]
            P["ltp_scale"][i] = kw["ltp_scale_q14"] / 16384.0
            P["interp"][i] = kw["nlsf_interp_flag"]
            st["xq"][i] = stn.xq[:_M]
            st["shp"][i] = stn.s_ltp_shp[:_M]
            st["s_lpc"][i] = stn.s_lpc[31:15:-1]
            st["s_ar2"][i] = stn.s_ar2[:_ORDER]
            st["s_lf_ar"][i] = stn.s_lf_ar
            st["s_diff"][i] = stn.s_diff
            st["lag_prev"][i] = stn.lag_prev
            st["prev_gain"][i] = stn.prev_gain
        params = dnsq.NsqParams(**{k: jnp.asarray(v) for k, v in P.items()})
        if self.use_del_dec:
            state = dnsq.NsqDelDecState(
                **{k: jnp.asarray(v) for k, v in st.items()})
            pulses, seed_used, new_state = self._jit(params, state)
            seed_used = np.asarray(seed_used)
        else:
            state = dnsq.NsqDevState(
                **{k: jnp.asarray(v) for k, v in st.items()})
            pulses, _xq, new_state = self._jit(params, state)
            seed_used = None
        pulses = np.asarray(pulses)
        ns_xq = np.asarray(new_state.xq)
        ns_shp = np.asarray(new_state.shp)
        ns_slpc = np.asarray(new_state.s_lpc)
        ns_sar2 = np.asarray(new_state.s_ar2)
        ns_lf = np.asarray(new_state.s_lf_ar)
        ns_sd = np.asarray(new_state.s_diff)
        ns_lag = np.asarray(new_state.lag_prev)
        ns_pg = np.asarray(new_state.prev_gain)
        for i, r in enumerate(reqs):
            stn = r["st"]
            stn.xq[:_M] = ns_xq[i]
            stn.xq[_M:] = 0.0
            stn.s_ltp_shp[:_M] = ns_shp[i]
            stn.s_ltp_shp[_M:] = 0.0
            stn.s_lpc[:16] = 0.0
            stn.s_lpc[16:] = ns_slpc[i][::-1]
            stn.s_ar2[:_ORDER] = ns_sar2[i]
            stn.s_lf_ar = float(ns_lf[i])
            stn.s_diff = float(ns_sd[i])
            stn.lag_prev = int(ns_lag[i])
            stn.prev_gain = float(ns_pg[i])
            r["pulses"] = [int(v) for v in pulses[i]]
            if seed_used is not None:
                r["seed"] = int(seed_used[i])
        with self._cv:
            self._running += len(reqs)
        for r in reqs:
            r["event"].set()

    # ----------------------------------------------------------------- run
    def run(self, tasks):
        """Run the callables on threads; returns their results in order.
        NSQ calls made by the tasks (through `hook`) are batched."""
        results = [None] * len(tasks)
        errors = []

        def work(i, fn):
            try:
                results[i] = fn()
            except Exception as e:      # surface in the caller
                errors.append((i, e))
            finally:
                with self._cv:
                    self._running -= 1
                    self._cv.notify_all()

        threads = []
        with self._cv:
            self._running = len(tasks)
        for i, fn in enumerate(tasks):
            t = threading.Thread(target=work, args=(i, fn), daemon=True)
            threads.append(t)
            t.start()
        while True:
            with self._cv:
                self._cv.wait_for(lambda: self._running == 0)
                reqs, self._waiting = self._waiting, []
            if not reqs:
                break
            try:
                for k in range(0, len(reqs), self.S):
                    self._dispatch(reqs[k:k + self.S])
            except Exception as e:
                # release every parked thread (they fail fast on pulses
                # None) so the barrier can't deadlock on a device error
                with self._cv:
                    self._running += sum(1 for r in reqs
                                         if not r["event"].is_set())
                for r in reqs:
                    r["event"].set()
                errors.append((-1, e))
        for t in threads:
            t.join()
        if errors:
            raise errors[0][1]
        return results
