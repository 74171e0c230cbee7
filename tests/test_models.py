"""Neural stack tests: blob roundtrip, layer primitives vs numpy reference
semantics, FARGAN graph smoke (synthetic weights)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from mousiki_tpu.models.nnet import (ACTIVATION_TANH, Linear, dense, glu, gru,
                                     linear, load_linear, parse_weight_blob,
                                     write_weight_blob)


def test_blob_roundtrip():
    arrays = {"dense1_weights_float": np.arange(12, dtype="<f4").tobytes(),
              "dense1_bias": np.ones(3, "<f4").tobytes(),
              "x" * 40: b"\x01\x02"}
    blob = write_weight_blob(arrays)
    back = parse_weight_blob(blob)
    assert set(back) == set(arrays)
    for k in arrays:
        assert back[k] == arrays[k]


def test_load_linear_float():
    w = np.arange(12, dtype="<f4")  # stored column-major: (in=4, out=3)
    arrays = {"l_weights_float": w.tobytes(),
              "l_bias": np.array([1, 2, 3], "<f4").tobytes()}
    lay = load_linear(arrays, "l", 4, 3)
    x = jnp.asarray(np.array([1.0, 0.0, 0.0, 0.0], np.float32))
    y = np.asarray(linear(lay, x))
    # column-major: W[out, in] with w.reshape(in, out).T -> col0 = w[0:3]
    assert np.allclose(y, w.reshape(4, 3).T[:, 0] + [1, 2, 3])


def test_gru_semantics():
    # against a direct numpy reference of the libopus gate layout
    rng = np.random.default_rng(0)
    n, m = 5, 7
    wi = rng.standard_normal((3 * n, m)).astype(np.float32) * 0.3
    wr = rng.standard_normal((3 * n, n)).astype(np.float32) * 0.3
    x = rng.standard_normal(m).astype(np.float32)
    h = rng.standard_normal(n).astype(np.float32)
    out = np.asarray(gru(Linear(jnp.asarray(wi), None, None),
                         Linear(jnp.asarray(wr), None, None),
                         jnp.asarray(h), jnp.asarray(x)))
    zrh = wi @ x
    rec = wr @ h
    z = 1 / (1 + np.exp(-(zrh[:n] + rec[:n])))
    r = 1 / (1 + np.exp(-(zrh[n:2*n] + rec[n:2*n])))
    hh = np.tanh(zrh[2*n:] + r * rec[2*n:])
    want = z * h + (1 - z) * hh
    assert np.allclose(out, want, atol=1e-5)


def test_fargan_graph_smoke():
    from mousiki_tpu.models.fargan import (init_state, random_model,
                                           synthesize_frame)
    model = random_model(jax.random.PRNGKey(0))
    S = 3
    state = init_state(model, S)
    feats = jnp.zeros((S, 20))
    period = jnp.full((S,), 100, jnp.int32)
    step = jax.jit(synthesize_frame)
    for _ in range(2):
        pcm, state = step(model, state, feats, period)
    assert pcm.shape == (S, 160)
    assert np.isfinite(np.asarray(pcm)).all()
