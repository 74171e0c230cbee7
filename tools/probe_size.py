import os, sys, time
import numpy as np
import jax, jax.numpy as jnp
from mousiki_tpu.ops import celt_lockstep_top as top
from mousiki_tpu.ops.band_exec_jax import plan_combo_mats
from mousiki_tpu.ops.synthesis_jax import make_consts, init_state as synth_init

S = 256
C = 2
buf = jnp.zeros((S, 512), jnp.uint8)
st = jnp.full((S,), 300, jnp.int32)
state = top.init_state(S)

def sz(name, fn, *args, **kw):
    t0 = time.time()
    comp = jax.jit(fn, **kw).lower(*args).compile()
    ma = comp.memory_analysis()
    print(name, "code:", round(ma.generated_code_size_in_bytes/1e6, 1), "MB",
          "compile:", round(time.time()-t0, 1), "s", flush=True)

def full(buf, st, state):
    return top.decode_frames(buf, st, state, C=C, lm=3)[0]["ac_seed"]
sz("decode_frames", full, buf, st, state)

consts = make_consts(n=960)
sstate = synth_init(S, C)
mats = plan_combo_mats(C, 960)
def step(consts, sstate, lstate, buf, st, mats):
    return top.lockstep_synthesis_step(consts, sstate, lstate, buf, st,
                                       mats, C=C, frame=960)
sz("full step", step, consts, sstate, state, buf, st, mats)
