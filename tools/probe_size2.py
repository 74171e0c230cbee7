import os, time
import numpy as np
import jax, jax.numpy as jnp
from mousiki_tpu.ops import celt_lockstep_top as top
from mousiki_tpu.ops import celt_lockstep as ls
from mousiki_tpu.ops import celt_lockstep_walk as lw
from mousiki_tpu.ops import celt_lockstep_emit as le
from mousiki_tpu.ops.band_exec_jax import execute_packed, plan_combo_mats

S, C = 256, 2
buf = jnp.zeros((S, 512), jnp.uint8)
st = jnp.full((S,), 300, jnp.int32)
state = top.init_state(S)

def sz(name, fn, *args):
    t0 = time.time()
    comp = jax.jit(fn).lower(*args).compile()
    ma = comp.memory_analysis()
    print(name, round(ma.generated_code_size_in_bytes/1e6, 1), "MB",
          round(time.time()-t0, 1), "s", flush=True)

# build plan planes on host once (shapes only matter)
p, ble, hdr, _st2, ok = top.decode_frames(buf, st, state, C=C, lm=3)
p = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)), p)
mats = plan_combo_mats(C, 960)
xd = jnp.zeros((S, C, 960), jnp.float32)

def ex(p, xd, mats):
    return execute_packed(p, xd, channels=C, frame=960, lm=3, start=0,
                          end=21, mats=mats)
sz("execute_packed(mine)", ex, p, xd, mats)

def scat(buf, st, state):
    hdr, energy, tf_res, spread, offsets, trim, alloc, stt = \
        ls.decode_symbols(buf, st, state.old_ebands, C=C, lm=3)
    total_f = ((stt.storage * 8) << 3) - alloc.anti_collapse_rsv
    emits, carry, _ok = lw.walk_bands(
        stt, jnp.ones(S, bool), C=C, lm=3, transient=hdr.transient,
        tf_res=tf_res, spread=spread, alloc=alloc, total_bits_frac=total_f,
        disable_inv=jnp.zeros(S, bool), n_iter=1700)
    return le._scatter_nodes(emits, S, C * lw.walk_layout(3).nslot)[0]
sz("stages+walk+scatter", scat, buf, st, state)
