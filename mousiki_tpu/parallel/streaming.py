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
