"""Pallas TPU kernels for the batched synthesis hot path.

`deemphasis_pallas`: the CELT de-emphasis IIR y[n] = x[n] + a*y[n-1]
(celt_decoder.rs deemphasis:2198) over a (rows, N) batch, computed as a
log-step prefix scan entirely in VMEM — 10 shift+fma passes for N=960
instead of a 960-step sequential loop, with the carried state folded in
via a precomputed power ramp. One grid step per 8-row block keeps the
working set in a single (8, N) float32 tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_BLOCK = 8


def _deemph_kernel(x_ref, mem_ref, pow_ref, y_ref, newmem_ref, *, coef, n):
    y = x_ref[:, :].astype(jnp.float32)
    # log-step scan: after pass k, y[n] = sum_{j<2^k} a^j x[n-j]
    pos = jax.lax.broadcasted_iota(jnp.int32, y.shape, 1)
    step = 1
    a_pow = jnp.float32(coef)
    while step < n:
        rolled = pltpu.roll(y, step, 1)
        mask = pos >= step
        y = y + a_pow * jnp.where(mask, rolled, 0.0)
        a_pow = a_pow * a_pow
        step *= 2
    # fold the carried state after the scan: y[n] += a^(n+1) * mem
    y = y + mem_ref[:, :] * pow_ref[:, :]
    y_ref[:, :] = y
    newmem_ref[:, :] = y[:, n - 1:n]


@functools.partial(jax.jit, static_argnames=("coef", "interpret"))
def deemphasis_pallas(x, mem, coef: float = 0.85, interpret: bool = False):
    """x: (rows, N) float32; mem: (rows,) carried y[-1]. Returns (y, mem')."""
    rows, n = x.shape
    pad_rows = (-rows) % ROW_BLOCK
    if pad_rows:
        x = jnp.pad(x, ((0, pad_rows), (0, 0)))
        mem = jnp.pad(mem, (0, pad_rows))
    rows_p = x.shape[0]
    powers = (coef ** (jnp.arange(n, dtype=jnp.float32) + 1.0))[None, :]
    grid = (rows_p // ROW_BLOCK,)
    y, new_mem = pl.pallas_call(
        functools.partial(_deemph_kernel, coef=coef, n=n),
        out_shape=(jax.ShapeDtypeStruct((rows_p, n), jnp.float32),
                   jax.ShapeDtypeStruct((rows_p, 1), jnp.float32)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((ROW_BLOCK, n), lambda i: (i, 0)),
            pl.BlockSpec((ROW_BLOCK, 1), lambda i: (i, 0)),
            pl.BlockSpec((1, n), lambda i: (0, 0)),
        ],
        out_specs=(pl.BlockSpec((ROW_BLOCK, n), lambda i: (i, 0)),
                   pl.BlockSpec((ROW_BLOCK, 1), lambda i: (i, 0))),
        interpret=interpret,
    )(x, mem[:, None], powers)
    return y[:rows], new_mem[:rows, 0]
