"""Neural inference primitives in JAX — the natural TPU win (SURVEY §2.9.9).

Parity: reference `src/nnet.rs` (LinearLayer:25, compute_generic_dense/gru/
conv1d/glu, compute_activation:111). All ops are batched over a leading
stream axis and jit/vmap-friendly; dense products hit the MXU. Sparse
int8 weights from the libopus blob are densified at load (TPU prefers
dense bf16/int8 matmuls over gather-sparse).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

ACTIVATION_LINEAR = 0
ACTIVATION_SIGMOID = 1
ACTIVATION_TANH = 2
ACTIVATION_RELU = 3
ACTIVATION_SOFTMAX = 4
ACTIVATION_SWISH = 5


class Linear(NamedTuple):
    """Dense layer: y = W @ x + b (+ diag shortcut for GRU-style layers)."""
    w: jnp.ndarray            # (out, in)
    b: jnp.ndarray | None
    diag: jnp.ndarray | None  # (3*in,) tri-diagonal shortcut or None


def activation(x, kind: int):
    if kind == ACTIVATION_LINEAR:
        return x
    if kind == ACTIVATION_SIGMOID:
        return jax.nn.sigmoid(x)
    if kind == ACTIVATION_TANH:
        return jnp.tanh(x)
    if kind == ACTIVATION_RELU:
        return jnp.maximum(x, 0.0)
    if kind == ACTIVATION_SOFTMAX:
        return jax.nn.softmax(x, axis=-1)
    if kind == ACTIVATION_SWISH:
        return x * jax.nn.sigmoid(x)
    raise ValueError(kind)


def linear(layer: Linear, x):
    """x: (..., in) -> (..., out)."""
    y = jnp.einsum("...i,oi->...o", x, layer.w,
                   precision=jax.lax.Precision.HIGHEST)
    if layer.b is not None:
        y = y + layer.b
    if layer.diag is not None:
        m = x.shape[-1]
        d = layer.diag.reshape(3, m)
        y = y + jnp.concatenate([d[0] * x, d[1] * x, d[2] * x], axis=-1)
    return y


def dense(layer: Linear, x, act: int = ACTIVATION_LINEAR):
    return activation(linear(layer, x), act)


def gru(input_w: Linear, recurrent_w: Linear, state, x):
    """One GRU step (libopus gate layout: z | r | h); returns new state."""
    n = state.shape[-1]
    zrh = linear(input_w, x)
    recur = linear(recurrent_w, state)
    z = jax.nn.sigmoid(zrh[..., :n] + recur[..., :n])
    r = jax.nn.sigmoid(zrh[..., n:2 * n] + recur[..., n:2 * n])
    h = jnp.tanh(zrh[..., 2 * n:] + r * recur[..., 2 * n:])
    return z * state + (1.0 - z) * h


def glu(layer: Linear, x):
    return x * jax.nn.sigmoid(linear(layer, x))


def conv1d_step(layer: Linear, mem, x, act: int = ACTIVATION_LINEAR):
    """Streaming 1-D conv: mem holds (ksize-1)*in_size history.

    Returns (y, new_mem)."""
    total = layer.w.shape[1]
    in_size = x.shape[-1]
    if total == in_size:
        buf = x
        new_mem = mem
    else:
        buf = jnp.concatenate([mem, x], axis=-1)
        new_mem = buf[..., in_size:]
    y = activation(linear(layer._replace(diag=None), buf), act)
    return y, new_mem


# --- libopus weight-blob loading -----------------------------------------

WEIGHT_BLOCK_SIZE = 64
WEIGHT_NAME_LEN = 44


def parse_weight_blob(data: bytes) -> dict:
    """Parse the libopus weight-blob format (parity src/dnn_weights.rs:27):
    repeated [64-byte header | payload]: i32 size@12, i32 block_size@16,
    NUL-terminated name@20 (44 bytes)."""
    out = {}
    pos = 0
    while pos < len(data):
        if len(data) - pos < WEIGHT_BLOCK_SIZE:
            raise ValueError("truncated blob header")
        header = data[pos: pos + WEIGHT_BLOCK_SIZE]
        size = int.from_bytes(header[12:16], "little", signed=True)
        block_size = int.from_bytes(header[16:20], "little", signed=True)
        if size < 0 or block_size < size:
            raise ValueError("bad blob sizes")
        name_bytes = header[20: 20 + WEIGHT_NAME_LEN]
        if name_bytes[-1] != 0:
            raise ValueError("unterminated name")
        name = name_bytes.split(b"\x00")[0].decode()
        payload = data[pos + WEIGHT_BLOCK_SIZE: pos + WEIGHT_BLOCK_SIZE + size]
        if len(payload) != size:
            raise ValueError("truncated payload")
        out[name] = payload
        pos += WEIGHT_BLOCK_SIZE + block_size
    return out


def write_weight_blob(arrays: dict) -> bytes:
    """Inverse of parse_weight_blob (for tests / repacking)."""
    out = bytearray()
    for name, payload in arrays.items():
        block_size = (len(payload) + 63) & ~63
        header = bytearray(WEIGHT_BLOCK_SIZE)
        header[0:4] = b"DNNw"
        header[12:16] = len(payload).to_bytes(4, "little")
        header[16:20] = block_size.to_bytes(4, "little")
        nb = name.encode()[: WEIGHT_NAME_LEN - 1]
        header[20: 20 + len(nb)] = nb
        out += header + payload + b"\x00" * (block_size - len(payload))
    return bytes(out)


def _f32(buf: bytes) -> np.ndarray:
    return np.frombuffer(buf, "<f4").copy()


def _i8(buf: bytes) -> np.ndarray:
    return np.frombuffer(buf, np.int8).copy()


def _densify_sparse8x4(weights_i8, idx, rows, scale):
    """Expand libopus 8x4-block sparse int8 weights to a dense float matrix.

    idx stream per 8-row band: [nb_blocks, col0, col1, ...]; each block is
    8x4 int8 values (column-major 4-wide), scaled per output row.
    """
    # Infer cols from the max column index
    pos = 0
    blocks = []
    band = 0
    max_col = 0
    while pos < len(idx):
        nb = int(idx[pos])
        pos += 1
        cols = [int(c) for c in idx[pos: pos + nb]]
        pos += nb
        blocks.append((band, cols))
        max_col = max([max_col] + [c + 4 for c in cols])
        band += 8
    w = np.zeros((rows, max_col), np.float32)
    wpos = 0
    for band, cols in blocks:
        for c in cols:
            blk = weights_i8[wpos: wpos + 32].reshape(4, 8).T  # 8 rows x 4 cols
            w[band: band + 8, c: c + 4] = blk
            wpos += 32
    return w * scale[:, None]


def load_linear(arrays: dict, prefix: str, nb_inputs: int,
                nb_outputs: int) -> Linear:
    """Build a Linear from blob arrays using libopus naming conventions:
    <prefix>_weights_float / _weights+_weights_idx+_scale, _bias, _diag."""
    b = arrays.get(prefix + "_bias")
    bias = jnp.asarray(_f32(b)) if b else None
    d = arrays.get(prefix + "_diag")
    diag = jnp.asarray(_f32(d)) if d else None
    wf = arrays.get(prefix + "_weights_float")
    if wf is not None:
        w = _f32(wf).reshape(nb_inputs, nb_outputs).T  # column-major storage
        return Linear(jnp.asarray(w), bias, diag)
    wi = arrays.get(prefix + "_weights")
    if wi is not None:
        scale = _f32(arrays[prefix + "_scale"])
        idx = np.frombuffer(arrays[prefix + "_weights_idx"], "<i4")
        w = _densify_sparse8x4(_i8(wi), idx, nb_outputs, scale)
        if w.shape[1] < nb_inputs:
            w = np.pad(w, ((0, 0), (0, nb_inputs - w.shape[1])))
        return Linear(jnp.asarray(w[:, :nb_inputs]), bias, diag)
    raise KeyError(f"no weights for {prefix}")
