"""Pallas deemphasis kernel vs the associative-scan reference
(interpret mode so it runs on the CPU test backend)."""



import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

pytestmark = pytest.mark.tpu


def test_pallas_deemphasis_matches_scan():
    from mousiki_tpu.ops.pallas_kernels import deemphasis_pallas
    from mousiki_tpu.ops.synthesis_jax import deemphasis

    rng = np.random.default_rng(1)
    S, C, N = 3, 2, 960
    x = (rng.standard_normal((S, C, N)) * 1000).astype(np.float32)
    mem = (rng.standard_normal((S, C)) * 100).astype(np.float32)
    want, want_mem = deemphasis(jnp.asarray(x), jnp.asarray(mem))
    got, got_mem = deemphasis_pallas(jnp.asarray(x.reshape(S * C, N)),
                                     jnp.asarray(mem.reshape(S * C)),
                                     interpret=True)
    scale = np.abs(np.asarray(want)).max()
    assert np.abs(np.asarray(got).reshape(S, C, N) - np.asarray(want)).max() \
        < 1e-4 * scale
    assert np.abs(np.asarray(got_mem).reshape(S, C)
                  - np.asarray(want_mem)).max() < 1e-4 * scale
