"""Multi-chip batched streaming: shard the stream axis over a device mesh.

The codec has no cross-stream coupling, so the natural parallelism is pure
data parallelism over thousands of concurrent audio streams (SURVEY.md §2.9
"parallelism inventory"): the stream-state pytree and frame descriptors are
sharded on axis 0 across the mesh; the IMDCT bases/window are replicated.
All collectives stay on ICI (there are none in steady state — host feed and
PCM drain are the only boundaries).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.synthesis_jax import (FrameDesc, StreamState, SynthesisConsts,
                                 init_state, make_consts, synthesis_step)


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(devs, axis_names=("streams",))


def shard_state(mesh: Mesh, state: StreamState) -> StreamState:
    sh = NamedSharding(mesh, P("streams"))
    return jax.tree.map(lambda x: jax.device_put(x, sh), state)


def shard_desc(mesh: Mesh, desc: FrameDesc) -> FrameDesc:
    sh = NamedSharding(mesh, P("streams"))
    return jax.tree.map(lambda x: jax.device_put(x, sh), desc)


def replicate_consts(mesh: Mesh, consts: SynthesisConsts) -> SynthesisConsts:
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sh), consts)


def sharded_synthesis_step(mesh: Mesh, channels: int = 2):
    """Returns a jitted step with stream-axis sharding constraints."""
    stream_sh = NamedSharding(mesh, P("streams"))

    @partial(jax.jit, static_argnames=())
    def step(consts, state, desc):
        pcm, new_state = synthesis_step(consts, state, desc, channels=channels)
        pcm = jax.lax.with_sharding_constraint(pcm, stream_sh)
        new_state = jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(x, stream_sh), new_state)
        return pcm, new_state

    return step


# ----------------------------------------------------------- plan sharding
def _spec_like(tree, spec):
    return jax.tree.map(lambda _: spec, tree,
                        is_leaf=lambda x: isinstance(x, jnp.ndarray))


def sharded_plan_step(mesh: Mesh, channels: int = 2, frame: int = 960):
    """shard_map'd PRODUCTION plan step (the path bench.py measures):
    plan arenas, x_direct, and stream state sharded over the mesh's
    "streams" axis; synthesis consts and combo operators replicated.

    Each device unpacks ITS OWN local arena triple (the plane-major arena
    layout is per-shard: unpack_plan_arenas derives the local S from the
    local a8 length), so there are no collectives at all in steady state
    -- pure data parallelism over streams (SURVEY.md §2.9).
    """
    from functools import partial

    try:
        from jax import shard_map as _shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map as _shard_map

    def shard_map(f, mesh, in_specs, out_specs):
        # check_vma=False: pallas_call outputs carry no vma annotation,
        # which trips the varying-manual-axes checker on the TPU backend
        # (the deemphasis kernel inside the synthesis step); the stream
        # axis is embarrassingly parallel so the check buys nothing here
        try:
            return _shard_map(f, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs, check_vma=False)
        except TypeError:   # older jax: no check_vma kwarg
            return _shard_map(f, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs)

    from ..ops.band_exec_jax import plan_synthesis_step_arena
    from ..ops.synthesis_jax import SynthesisConsts

    P_s = P("streams")
    P_r = P()

    def inner(consts, state, a32, a16, a8, xd, mats):
        return plan_synthesis_step_arena(consts, state, a32, a16, a8, xd,
                                         mats, channels=channels,
                                         frame=frame)

    # spec prefixes: whole subtrees take one spec
    in_specs = (P_r, jax.tree.map(lambda _: P_s, StreamState(
        *([0] * len(StreamState._fields)))), P_s, P_s, P_s, P_s, P_r)
    out_specs = (P_s, jax.tree.map(lambda _: P_s, StreamState(
        *([0] * len(StreamState._fields)))))
    sm = shard_map(inner, mesh, in_specs, out_specs)
    return jax.jit(sm)


def sharded_plan_step_plc(mesh: Mesh, channels: int = 2, frame: int = 960,
                          n_streams: int = None):
    """shard_map'd plan step WITH device PLC (closes VERDICT r4 item 5:
    the sharded production path previously used plan_synthesis_step_arena,
    silently ignoring the host's lost8 plane — a lost frame under a mesh
    produced unconcealed output and diverged from the single-chip path).

    The lost mask rides each shard's arena (lost8 plane); the PLC compute
    sits under a PER-SHARD lax.cond, so shards without losses skip it.
    State, plc_state, arenas and x_direct shard on the streams axis;
    consts/plc_consts/mats replicate. No collectives in steady state.
    """
    try:
        from jax import shard_map as _shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map as _shard_map

    def shard_map(f, mesh, in_specs, out_specs):
        # check_vma=False: pallas_call outputs carry no vma annotation,
        # which trips the varying-manual-axes checker on the TPU backend
        # (the deemphasis kernel inside the synthesis step); the stream
        # axis is embarrassingly parallel so the check buys nothing here
        try:
            return _shard_map(f, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs, check_vma=False)
        except TypeError:   # older jax: no check_vma kwarg
            return _shard_map(f, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs)

    from ..ops.band_exec_jax import plan_plc_core

    n_dev = mesh.devices.size
    assert n_streams is not None and n_streams % n_dev == 0
    S_loc = n_streams // n_dev
    P_s = P("streams")
    P_r = P()

    def inner(consts, plc_consts, state, plc_state, a32, a16, a8, xd,
              mats):
        return plan_plc_core(consts, plc_consts, state, plc_state,
                             a32, a16, a8, xd, None, mats,
                             channels=channels, frame=frame,
                             n_streams=S_loc)

    state_spec = jax.tree.map(lambda _: P_s, StreamState(
        *([0] * len(StreamState._fields))))
    in_specs = (P_r, P_r, state_spec, P_s, P_s, P_s, P_s, P_s, P_r)
    out_specs = (P_s, state_spec, P_s)
    sm = shard_map(inner, mesh, in_specs, out_specs)
    return jax.jit(sm)


def make_global_sharded(mesh: Mesh, shard_arrays):
    """Assemble per-device host arrays into one global array sharded on
    axis 0 over the "streams" axis (one shard per device, no copies
    beyond the per-device H2D transfers)."""
    devs = list(mesh.devices.flat)
    assert len(shard_arrays) == len(devs)
    sh = NamedSharding(mesh, P("streams"))
    bufs = [jax.device_put(np.ascontiguousarray(a), d)
            for a, d in zip(shard_arrays, devs)]
    global_shape = (sum(a.shape[0] for a in shard_arrays),)         + tuple(shard_arrays[0].shape[1:])
    return jax.make_array_from_single_device_arrays(global_shape, sh, bufs)


def replicate(mesh: Mesh, tree):
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
