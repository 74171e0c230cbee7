"""Standalone perf probe for the lockstep device CELT decoder.

Usage: python -c "import sys; sys.argv=['x','256']; \
    exec(open('tools/bench_lockstep.py').read())"
(the axon plugin fails to register when a script dir shadows sys.path[0]).

NOTE (axon tunnel): any device->host readback switches the session into
per-dispatch executable-reupload mode — all readbacks happen AFTER the
timed windows.
"""
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.getcwd(), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

from mousiki_tpu.bitstream.packet import parse_packet          # noqa: E402
from mousiki_tpu.ops import celt_lockstep_top as top           # noqa: E402
from mousiki_tpu.ops.band_exec_jax import plan_combo_mats      # noqa: E402
from mousiki_tpu.ops.synthesis_jax import init_state as synth_init  # noqa: E402
from mousiki_tpu.ops.synthesis_jax import make_consts          # noqa: E402
from mousiki_tpu.testing import oracle                         # noqa: E402

S = int(sys.argv[1]) if len(sys.argv) > 1 else 256
C = 2
FRAME = 960
BITRATE = int(sys.argv[2]) if len(sys.argv) > 2 else 96000
enc = oracle.RefEncoder(48000, C, oracle.APP_RESTRICTED_LOWDELAY)
enc.ctl_set(oracle.SET_BITRATE, BITRATE)
sig = oracle.make_test_signal(FRAME * 40, C, kind="mix", seed=3)
pcm16 = oracle.float_to_i16(sig)
pkts = []
for f in range(32):
    pkt = enc.encode(pcm16[f * FRAME:(f + 1) * FRAME].reshape(-1))
    pkts.append(parse_packet(pkt).frames[0])
L = 512
buf = np.zeros((S, L), np.uint8)
st = np.zeros(S, np.int32)
for s in range(S):
    p = pkts[s % len(pkts)]
    buf[s, :len(p)] = np.frombuffer(p, np.uint8)
    st[s] = len(p)
dev = jax.devices()[0]
print("device:", dev, flush=True)
bufd = jax.device_put(jnp.asarray(buf), dev)
std = jax.device_put(jnp.asarray(st), dev)
consts = make_consts(n=FRAME)
sstate = synth_init(S, C)
lstate = top.init_state(S)
mats = plan_combo_mats(C, FRAME)
t0 = time.time()
pcm, sstate, lstate, ok = top.lockstep_synthesis_step(
    consts, sstate, lstate, bufd, std, mats, C=C, frame=FRAME)
pcm.block_until_ready()
print("compile+first:", round(time.time() - t0, 1), "s", flush=True)
rates = []
for trial in range(3):
    t0 = time.time()
    NIT = 10
    for _ in range(NIT):
        pcm, sstate, lstate, ok2 = top.lockstep_synthesis_step(
            consts, sstate, lstate, bufd, std, mats, C=C, frame=FRAME)
    pcm.block_until_ready()
    dt = (time.time() - t0) / NIT
    rates.append(0.02 * S / dt)
    print(f"step: {dt*1e3:.2f} ms  -> {0.02*S/dt:.0f}x realtime",
          flush=True)
print("ok(first step):", bool(np.asarray(ok).all()))
