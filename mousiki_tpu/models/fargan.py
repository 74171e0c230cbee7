"""FARGAN vocoder in JAX, batched over streams (reference src/fargan.rs).

Auto-regressive GAN vocoder used by Deep-PLC/DRED: per 40-sample subframe,
a conditioning net (period embedding + dense/conv/dense) drives a signal
net of a framewise conv+GLU, three gated GRUs with pitch-prediction
injections, and a skip/output dense. All math follows the reference graph;
weights come from the libopus blob via models.nnet.load_linear (the blob
itself ships separately — synthetic weights exercise the graph in tests).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from .nnet import (ACTIVATION_SIGMOID, ACTIVATION_TANH, Linear, dense, glu,
                   gru, conv1d_step, linear)

FARGAN_CONT_SAMPLES = 320
FARGAN_NB_SUBFRAMES = 4
FARGAN_SUBFRAME_SIZE = 40
FARGAN_FRAME_SIZE = FARGAN_NB_SUBFRAMES * FARGAN_SUBFRAME_SIZE
FARGAN_DEEMPHASIS = 0.85
PITCH_MAX_PERIOD = 256
NB_FEATURES = 20


class FarganModel(NamedTuple):
    cond_pembed: jnp.ndarray          # (n_periods, embed_dim)
    cond_fdense1: Linear
    cond_fconv1: Linear
    cond_fdense2: Linear
    cond_gain_dense: Linear
    fwc0_conv: Linear
    fwc0_glu: Linear
    gru1_in: Linear
    gru1_rec: Linear
    gru1_glu: Linear
    gru2_in: Linear
    gru2_rec: Linear
    gru2_glu: Linear
    gru3_in: Linear
    gru3_rec: Linear
    gru3_glu: Linear
    skip_dense: Linear
    skip_glu: Linear
    sig_dense_out: Linear
    gain_dense_out: Linear


class FarganState(NamedTuple):
    pitch_buf: jnp.ndarray    # (S, PITCH_MAX_PERIOD)
    cond_conv1_mem: jnp.ndarray
    fwc0_mem: jnp.ndarray
    gru1: jnp.ndarray
    gru2: jnp.ndarray
    gru3: jnp.ndarray
    deemph: jnp.ndarray       # (S,)


def init_state(model: FarganModel, n_streams: int) -> FarganState:
    S = n_streams
    conv1_hist = model.cond_fconv1.w.shape[1] - model.cond_fdense1.w.shape[0]
    fwc0_hist = 0  # fwc0 kernel covers exactly one frame of inputs
    return FarganState(
        pitch_buf=jnp.zeros((S, PITCH_MAX_PERIOD)),
        cond_conv1_mem=jnp.zeros((S, max(conv1_hist, 0))),
        fwc0_mem=jnp.zeros((S, fwc0_hist)),
        gru1=jnp.zeros((S, model.gru1_rec.w.shape[1])),
        gru2=jnp.zeros((S, model.gru2_rec.w.shape[1])),
        gru3=jnp.zeros((S, model.gru3_rec.w.shape[1])),
        deemph=jnp.zeros((S,)),
    )


def compute_cond(model: FarganModel, state: FarganState, features, period):
    """features: (S, 20); period: (S,) int -> (cond (S, C), new_state)."""
    emb = model.cond_pembed[jnp.clip(period - 32, 0,
                                     model.cond_pembed.shape[0] - 1)]
    x = jnp.concatenate([features, emb], axis=-1)
    x = dense(model.cond_fdense1, x, ACTIVATION_TANH)
    y, new_mem = conv1d_step(model.cond_fconv1, state.cond_conv1_mem, x,
                             ACTIVATION_TANH)
    cond = dense(model.cond_fdense2, y, ACTIVATION_TANH)
    return cond, state._replace(cond_conv1_mem=new_mem)


def _gather_pred(pitch_buf, period, n):
    """pred[i] = pitch_buf[wrap(PITCH_MAX - period - 2 + i)] (period-looped)."""
    S = pitch_buf.shape[0]
    i = jnp.arange(n)[None, :]
    pos = PITCH_MAX_PERIOD - period[:, None] - 2 + i
    # wrap positions >= PITCH_MAX back by one period (ar loop)
    pos = jnp.where(pos >= PITCH_MAX_PERIOD, pos - period[:, None], pos)
    pos = jnp.clip(pos, 0, PITCH_MAX_PERIOD - 1)
    return jnp.take_along_axis(pitch_buf, pos, axis=1)


def run_subframe(model: FarganModel, state: FarganState, cond, period):
    """One 40-sample subframe for all streams; returns (pcm, new_state)."""
    gain = jnp.exp(linear(model.cond_gain_dense, cond)[..., 0])
    gain_inv = 1.0 / (1e-5 + gain)

    pred = jnp.clip(gain_inv[:, None]
                    * _gather_pred(state.pitch_buf, period,
                                   FARGAN_SUBFRAME_SIZE + 4), -1.0, 1.0)
    prev = jnp.clip(gain_inv[:, None]
                    * state.pitch_buf[:, -FARGAN_SUBFRAME_SIZE:], -1.0, 1.0)

    fwc0_in = jnp.concatenate([cond, pred, prev], axis=-1)
    x, fwc0_mem = conv1d_step(model.fwc0_conv, state.fwc0_mem, fwc0_in,
                              ACTIVATION_TANH)
    x = glu(model.fwc0_glu, x)
    pitch_gate = jax.nn.sigmoid(linear(model.gain_dense_out, x))  # (S, 4)

    pshift = pred[:, 2: 2 + FARGAN_SUBFRAME_SIZE]
    g1_in = jnp.concatenate([x, pitch_gate[:, 0:1] * pshift, prev], axis=-1)
    gru1 = gru(model.gru1_in, model.gru1_rec, state.gru1, g1_in)
    g2_base = glu(model.gru1_glu, gru1)
    g2_in = jnp.concatenate([g2_base, pitch_gate[:, 1:2] * pshift, prev], axis=-1)
    gru2 = gru(model.gru2_in, model.gru2_rec, state.gru2, g2_in)
    g3_base = glu(model.gru2_glu, gru2)
    g3_in = jnp.concatenate([g3_base, pitch_gate[:, 2:3] * pshift, prev], axis=-1)
    gru3 = gru(model.gru3_in, model.gru3_rec, state.gru3, g3_in)
    g3_out = glu(model.gru3_glu, gru3)

    skip_cat = jnp.concatenate(
        [g2_base, g3_base, g3_out, x, pitch_gate[:, 3:4] * pshift, prev],
        axis=-1)
    skip = dense(model.skip_dense, skip_cat, ACTIVATION_TANH)
    skip = glu(model.skip_glu, skip)
    pcm = dense(model.sig_dense_out, skip, ACTIVATION_TANH) * gain[:, None]

    pitch_buf = jnp.concatenate(
        [state.pitch_buf[:, FARGAN_SUBFRAME_SIZE:], pcm], axis=-1)

    # deemphasis across the subframe (sequential scan folded into cumprod)
    def deemph(carry, s):
        y = s + FARGAN_DEEMPHASIS * carry
        return y, y
    dcarry, dout = jax.lax.scan(deemph, state.deemph, pcm.T)
    pcm_out = dout.T

    new_state = state._replace(pitch_buf=pitch_buf, fwc0_mem=fwc0_mem,
                               gru1=gru1, gru2=gru2, gru3=gru3, deemph=dcarry)
    return pcm_out, new_state


def synthesize_frame(model: FarganModel, state: FarganState, features, period):
    """One 160-sample frame (4 subframes) for all streams."""
    cond, state = compute_cond(model, state, features, period)
    outs = []
    for _ in range(FARGAN_NB_SUBFRAMES):
        pcm, state = run_subframe(model, state, cond, period)
        outs.append(pcm)
    return jnp.concatenate(outs, axis=-1), state


def random_model(key, cond_dim=256, gru_dim=128, embed_dim=12,
                 n_periods=224) -> FarganModel:
    """Synthetic weights for graph/shape testing (real weights load from the
    libopus blob via models.nnet.load_linear)."""
    ks = iter(jax.random.split(key, 40))

    def lin(nin, nout, scale=0.08):
        return Linear(jax.random.normal(next(ks), (nout, nin)) * scale,
                      jnp.zeros(nout), None)

    sub = FARGAN_SUBFRAME_SIZE
    fwc0_in = cond_dim + (sub + 4) + sub
    g1_in_dim = cond_dim + sub + sub
    g2_in_dim = gru_dim + sub + sub
    skip_in = gru_dim * 3 + cond_dim + sub + sub
    return FarganModel(
        cond_pembed=jax.random.normal(next(ks), (n_periods, embed_dim)) * 0.1,
        cond_fdense1=lin(NB_FEATURES + embed_dim, cond_dim),
        cond_fconv1=lin(cond_dim * 2, cond_dim),
        cond_fdense2=lin(cond_dim, cond_dim),
        cond_gain_dense=lin(cond_dim, 1),
        fwc0_conv=lin(fwc0_in, cond_dim),
        fwc0_glu=lin(cond_dim, cond_dim),
        gru1_in=lin(g1_in_dim, 3 * gru_dim),
        gru1_rec=lin(gru_dim, 3 * gru_dim),
        gru1_glu=lin(gru_dim, gru_dim),
        gru2_in=lin(g2_in_dim, 3 * gru_dim),
        gru2_rec=lin(gru_dim, 3 * gru_dim),
        gru2_glu=lin(gru_dim, gru_dim),
        gru3_in=lin(g2_in_dim, 3 * gru_dim),
        gru3_rec=lin(gru_dim, 3 * gru_dim),
        gru3_glu=lin(gru_dim, gru_dim),
        skip_dense=lin(skip_in, gru_dim),
        skip_glu=lin(gru_dim, gru_dim),
        sig_dense_out=lin(gru_dim, sub),
        gain_dense_out=lin(cond_dim, 4),
    )


def from_blob(arrays: dict, cond_dim: int = 256, gru_dim: int = 128,
              embed_dim: int = 12) -> FarganModel:
    """Build FARGAN from a parsed libopus weight blob using the reference
    names (fargan.rs init_fargan_from_weights). Layer input dims are the
    known architecture constants — passing them explicitly guards against
    the inference-from-padded-storage overestimate in load_linear_auto
    (blob rows are padded to 8, cols to 4)."""
    from .nnet import load_linear_auto as la

    sub = FARGAN_SUBFRAME_SIZE
    fwc0_in = cond_dim + (sub + 4) + sub
    g1_in = cond_dim + 2 * sub
    g2_in = gru_dim + 2 * sub
    skip_in = gru_dim * 3 + cond_dim + 2 * sub
    pembed = la(arrays, "cond_net_pembed", nb_outputs=embed_dim)
    return FarganModel(
        cond_pembed=pembed.w.T,    # (n_periods, embed_dim) lookup table
        cond_fdense1=la(arrays, "cond_net_fdense1",
                        NB_FEATURES + embed_dim, cond_dim),
        cond_fconv1=la(arrays, "cond_net_fconv1", cond_dim * 2, cond_dim),
        cond_fdense2=la(arrays, "cond_net_fdense2", cond_dim, cond_dim),
        cond_gain_dense=la(arrays, "sig_net_cond_gain_dense", cond_dim, 1),
        fwc0_conv=la(arrays, "sig_net_fwc0_conv", fwc0_in, cond_dim),
        fwc0_glu=la(arrays, "sig_net_fwc0_glu_gate", cond_dim, cond_dim),
        gru1_in=la(arrays, "sig_net_gru1_input", g1_in, 3 * gru_dim),
        gru1_rec=la(arrays, "sig_net_gru1_recurrent", gru_dim, 3 * gru_dim),
        gru1_glu=la(arrays, "sig_net_gru1_glu_gate", gru_dim, gru_dim),
        gru2_in=la(arrays, "sig_net_gru2_input", g2_in, 3 * gru_dim),
        gru2_rec=la(arrays, "sig_net_gru2_recurrent", gru_dim, 3 * gru_dim),
        gru2_glu=la(arrays, "sig_net_gru2_glu_gate", gru_dim, gru_dim),
        gru3_in=la(arrays, "sig_net_gru3_input", g2_in, 3 * gru_dim),
        gru3_rec=la(arrays, "sig_net_gru3_recurrent", gru_dim, 3 * gru_dim),
        gru3_glu=la(arrays, "sig_net_gru3_glu_gate", gru_dim, gru_dim),
        skip_dense=la(arrays, "sig_net_skip_dense", skip_in, gru_dim),
        skip_glu=la(arrays, "sig_net_skip_glu_gate", gru_dim, gru_dim),
        sig_dense_out=la(arrays, "sig_net_sig_dense_out", gru_dim, sub),
        gain_dense_out=la(arrays, "sig_net_gain_dense_out", cond_dim, 4),
    )
