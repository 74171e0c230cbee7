"""Full device-side lockstep CELT decode: packets in, PCM out.

Composes the lockstep symbol stages (celt_lockstep), the band-tree walk
(celt_lockstep_walk), plan emission (celt_lockstep_emit), the batched plan
executor (band_exec_jax.execute_packed) and the CELT synthesis
(synthesis_jax) into ONE jitted program per step.  The host's only job is
to pad packets into a (S, L) byte matrix — the entire decoder, including
entropy decoding, runs on the TPU.

Decoder state (energies, postfilter, LCG seed chain) lives on device as a
pytree; semantics follow celt/decoder.py (reference celt_decoder.rs
celt_decode_with_ec:4140).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from . import ec_lockstep as ec
from .celt_lockstep import decode_finalise, decode_symbols
from .celt_lockstep_emit import emit_plan
from .celt_lockstep_walk import walk_bands

# structural worst case for the interpreter trip count at LM 3 (all nodes
# of every band visited, plus band-entry iterations and slack)
N_ITER_LM3 = {1: 840, 2: 1700}


class LockstepState(NamedTuple):
    """Per-stream decoder state living on device."""
    rng: jnp.ndarray          # (S,) uint32: EC range value == noise seed
    old_ebands: jnp.ndarray   # (S, 2, 21) f32 coarse-energy memory
    old_log_e: jnp.ndarray    # (S, 2, 21) f32
    old_log_e2: jnp.ndarray   # (S, 2, 21) f32


def init_state(S: int) -> LockstepState:
    z = jnp.zeros((S, 2, 21), jnp.float32)
    return LockstepState(rng=jnp.zeros(S, jnp.uint32), old_ebands=z,
                         old_log_e=z - 28.0, old_log_e2=z - 28.0)


def decode_frames(buf, storage, state: LockstepState, *, C: int,
                  lm: int = 3, n_iter: int | None = None, caps=None):
    """Symbol-decode S packed CELT frames fully on device.

    Returns (p, ble, hdr, new_state, ok): p = plan planes for
    execute_packed, ble = (S, C, 21) final band energies, hdr = header
    flags (incl. postfilter params), new_state, ok = all lanes completed
    their walk within the iteration budget.
    """
    from .celt_lockstep_emit import DEFAULT_CAPS
    if n_iter is None:
        n_iter = N_ITER_LM3[C]
    if caps is None:
        caps = DEFAULT_CAPS
    S = buf.shape[0]
    active = jnp.ones(S, bool)
    hdr, energy, tf_res, spread, offsets, trim, alloc, st = decode_symbols(
        buf, storage, state.old_ebands, C=C, lm=lm)
    total_f = ((st.storage * 8) << 3) - alloc.anti_collapse_rsv
    emits, carry, all_done = walk_bands(
        st, active, C=C, lm=lm, transient=hdr.transient, tf_res=tf_res,
        spread=spread, alloc=alloc, total_bits_frac=total_f,
        disable_inv=jnp.full(S, C == 1), n_iter=n_iter)
    st = carry.st
    has_ac = alloc.anti_collapse_rsv > 0
    acb, st = ec.ec_dec_bits(st, jnp.where(has_ac, 1, 0), has_ac)
    ac_on = has_ac & (acb > 0)
    bits_left = st.storage * 8 - ec.ec_tell(st)
    energy, st = decode_finalise(st, active, energy, alloc.ebits,
                                 alloc.fine_priority, bits_left, C=C)
    p, seed_final, masks, overflow = emit_plan(
        emits, C=C, lm=lm, hdr=hdr, tf_res=tf_res, spread=spread,
        alloc=alloc, seed0=state.rng, ac_on=ac_on, final_energy=energy,
        prev1=state.old_log_e, prev2=state.old_log_e2, caps=tuple(caps))

    sil = hdr.silence
    energy = jnp.where(sil[:, None, None], -28.0, energy)
    # ---- energy state update (celt/decoder.py:373-445) -----------------
    old2 = jnp.zeros((S, 2, 21), jnp.float32)
    old2 = old2.at[:, :C, :].set(energy)
    if C == 1:
        old2 = old2.at[:, 1, :].set(old2[:, 0, :])
    ole = state.old_log_e
    ole2 = state.old_log_e2
    tr = hdr.transient[:, None, None]
    new_ole2 = jnp.where(tr, ole2, ole)
    new_ole = jnp.where(tr, jnp.minimum(ole, old2), old2)
    new_state = LockstepState(
        rng=st.rng, old_ebands=old2, old_log_e=new_ole,
        old_log_e2=new_ole2)
    err = st.error | (ec.ec_tell(st) > st.storage * 8) | ~carry.done
    return p, energy, hdr, new_state, ~overflow & ~err


@partial(jax.jit, static_argnames=("C", "frame", "n_iter", "caps"))
def lockstep_synthesis_step(consts, sstate, lstate, buf, storage,
                            mats=None, C: int = 2, frame: int = 960,
                            n_iter: int = None, caps=None):
    """One fused device step: S packets -> (S, frame/..., C) PCM.

    consts/sstate: synthesis_jax make_consts / StreamState; lstate:
    LockstepState.  mats: plan_combo_mats(C, frame).
    """
    from .band_exec_jax import execute_packed
    from .synthesis_jax import FrameDesc, synthesis_step
    lm = {120: 0, 240: 1, 480: 2, 960: 3}[frame]
    S = buf.shape[0]
    p, ble, hdr, new_lstate, ok = decode_frames(
        buf, storage, lstate, C=C, lm=lm, n_iter=n_iter, caps=caps)
    x_direct = jnp.zeros((S, C, frame), jnp.float32)
    X = execute_packed(p, x_direct, channels=C, frame=frame, lm=lm,
                       start=0, end=21, mats=mats)
    ble_pad = jnp.pad(ble, ((0, 0), (0, 0), (0, 1)),
                      constant_values=-28.0)
    desc = FrameDesc(x=X.reshape(S, C, frame), band_log_e=ble_pad,
                     transient=hdr.transient, silence=hdr.silence,
                     pf_pitch=hdr.pf_pitch, pf_gain=hdr.pf_gain,
                     pf_tapset=hdr.pf_tapset)
    pcm, new_sstate = synthesis_step(consts, sstate, desc, channels=C,
                                     n=frame)
    return pcm, new_sstate, new_lstate, ok
