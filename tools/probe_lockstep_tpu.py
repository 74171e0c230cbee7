"""Probe the fused lockstep CELT decode step on the REAL TPU.

Measures: compile time, generated-code size, steady-state step latency at
S lanes (packets -> PCM entirely on device), then (after all timing, since
any D2H readback flips the tunneled session into re-upload mode) verifies
ok lanes and PCM parity of lane 0 vs the exact Python decoder.

Usage: python tools/probe_lockstep_tpu.py [S] [C] [n_steps]
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
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

from mousiki_tpu.bitstream.packet import parse_packet
from mousiki_tpu.ops import celt_lockstep_top as top
from mousiki_tpu.ops.band_exec_jax import plan_combo_mats
from mousiki_tpu.ops.synthesis_jax import init_state as synth_init
from mousiki_tpu.ops.synthesis_jax import make_consts
from mousiki_tpu.testing import oracle

S = int(sys.argv[1]) if len(sys.argv) > 1 else 256
C = int(sys.argv[2]) if len(sys.argv) > 2 else 2
N_STEPS = int(sys.argv[3]) if len(sys.argv) > 3 else 24
FRAME = 960
NF = 24

print("device:", jax.devices()[0], flush=True)

enc = oracle.RefEncoder(48000, C, oracle.APP_RESTRICTED_LOWDELAY)
enc.ctl_set(oracle.SET_BITRATE, 128000 if C == 2 else 72000)
sig = oracle.make_test_signal(FRAME * (NF + 1), C, seed=3)
pcm16 = oracle.float_to_i16(sig)
pays = []
for f in range(NF):
    pkt = enc.encode(pcm16[f * FRAME:(f + 1) * FRAME].reshape(-1))
    pays.append(parse_packet(pkt).frames[0])
L = (max(len(p) for p in pays) + 127) // 128 * 128  # fixed pad width
print("payload max:", max(len(p) for p in pays), "L:", L, flush=True)


def pack_step(i):
    buf = np.zeros((S, L), np.uint8)
    st = np.zeros(S, np.int32)
    for s in range(S):
        p = pays[(i + s) % NF]
        buf[s, :len(p)] = np.frombuffer(p, np.uint8)
        st[s] = len(p)
    return buf, st


consts = make_consts(n=FRAME)
sstate = synth_init(S, C)
lstate = top.init_state(S)
mats = plan_combo_mats(C, FRAME)

buf0, st0 = pack_step(0)
bufs = [jnp.asarray(b) for b, _ in (pack_step(i) for i in range(8))]
sts = [jnp.asarray(pack_step(i)[1]) for i in range(8)]

fn = top.lockstep_synthesis_step
t0 = time.time()
lowered = jax.jit(
    lambda c, ss, ls, b, s, m: fn(c, ss, ls, b, s, m, C=C, frame=FRAME)
).lower(consts, sstate, lstate, bufs[0], sts[0], mats)
compiled = lowered.compile()
ma = compiled.memory_analysis()
print(f"compile: {time.time()-t0:.1f}s  code "
      f"{ma.generated_code_size_in_bytes/1e6:.1f} MB  "
      f"tmp {ma.temp_size_in_bytes/1e6:.1f} MB", flush=True)

# warm (first executions load the program)
t0 = time.time()
pcm, sstate, lstate, ok = compiled(consts, sstate, lstate, bufs[0], sts[0],
                                   mats)
jax.block_until_ready(pcm)
print(f"first exec: {time.time()-t0:.2f}s", flush=True)
for i in range(3):
    pcm, sstate, lstate, ok = compiled(consts, sstate, lstate,
                                       bufs[i % 8], sts[i % 8], mats)
jax.block_until_ready(pcm)

# steady state
t0 = time.perf_counter()
for i in range(N_STEPS):
    pcm, sstate, lstate, ok = compiled(consts, sstate, lstate,
                                       bufs[i % 8], sts[i % 8], mats)
jax.block_until_ready(pcm)
dt = time.perf_counter() - t0
step_ms = dt / N_STEPS * 1e3
x = S * N_STEPS * 0.02 / dt
print(f"steady: {step_ms:.2f} ms/step  ->  {x:.0f}x realtime "
      f"(S={S}, C={C})", flush=True)

# ---- correctness readback (AFTER timing) ----------------------------
okv = np.asarray(ok)
print("ok lanes:", int(okv.sum()), "/", S, flush=True)

from mousiki_tpu.celt.decoder import CeltDecoder
dec = CeltDecoder(channels=C, stream_channels=C, end=21, disable_inv=C == 1)
sstate2 = synth_init(1, C)
lstate2 = top.init_state(1)
worst = 0.0
for f in range(6):
    truth = dec.decode_with_ec(pays[f], FRAME)
    b = np.zeros((1, L), np.uint8)
    b[0, :len(pays[f])] = np.frombuffer(pays[f], np.uint8)
    pcm1, sstate2, lstate2, ok1 = top.lockstep_synthesis_step(
        consts, sstate2, lstate2, jnp.asarray(b),
        jnp.asarray([len(pays[f])], np.int32), mats, C=C, frame=FRAME)
    err = float(np.abs(np.asarray(pcm1)[0] - truth).max())
    worst = max(worst, err)
print("pcm err (6 frames, S=1):", worst, flush=True)
