"""Measure the device NSQ scan kernel (ops/silk_nsq_jax) on the real TPU.

The per-sample scan is latency-bound (like all quantizer feedback), so
step time is ~flat in S: aggregate realtime-x scales linearly with batch.
Usage: python tools/probe_nsq_tpu.py [S...]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))

from mousiki_tpu.ops import silk_nsq_jax as dnsq

FS, SUB, NB = 16, 80, 4
L, M = NB * 80, 320

print("device:", jax.devices()[0], flush=True)

for S in [int(a) for a in (sys.argv[1:] or ["256", "1024", "4096"])]:
    rng = np.random.default_rng(0)
    params = dnsq.NsqParams(
        x=jnp.asarray(rng.standard_normal((S, L)) * 3000, jnp.float32),
        a=jnp.asarray(rng.standard_normal((S, 2, 16)) * 0.1, jnp.float32),
        b=jnp.asarray(rng.standard_normal((S, NB, 5)) * 0.1, jnp.float32),
        ar_shp=jnp.asarray(rng.standard_normal((S, NB, 24)) * 0.05,
                           jnp.float32),
        harm=jnp.full((S, NB), 0.3, jnp.float32),
        tilt=jnp.full((S, NB), 0.2, jnp.float32),
        lf_ma=jnp.full((S, NB), -0.1, jnp.float32),
        lf_ar=jnp.full((S, NB), 0.7, jnp.float32),
        gains=jnp.full((S, NB), 0.5, jnp.float32),
        pitch_l=jnp.asarray(rng.integers(64, 280, (S, NB)), jnp.int32),
        lam=jnp.full(S, 1.2, jnp.float32),
        offset=jnp.full(S, 0.1, jnp.float32),
        voiced=jnp.asarray(rng.integers(0, 2, S).astype(bool)),
        seed=jnp.asarray(rng.integers(0, 4, S), jnp.int32),
        ltp_scale=jnp.ones(S, jnp.float32),
        interp=jnp.zeros(S, bool))
    state = dnsq.init_nsq_state(S, M)

    t0 = time.time()
    pulses, xq, state = dnsq.nsq_frame(params, state, nb_subfr=NB, sub=SUB,
                                       M=M)
    jax.block_until_ready(pulses)
    print(f"S={S}: first call {time.time()-t0:.1f}s", flush=True)
    n = 12
    t0 = time.perf_counter()
    for _ in range(n):
        pulses, xq, state = dnsq.nsq_frame(params, state, nb_subfr=NB,
                                           sub=SUB, M=M)
    jax.block_until_ready(pulses)
    dt = (time.perf_counter() - t0) / n
    print(f"S={S}: {dt*1e3:.1f} ms/frame-step -> "
          f"{S*0.02/dt:.0f}x realtime aggregate", flush=True)
