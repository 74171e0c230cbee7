"""Deep PLC: neural concealment gluing features + FARGAN (+ DRED FEC).

Reference celt/deep_plc.rs (LpcNetPlcState:349,483): keep a feature
history from the decoded output; on loss, synthesize audio with FARGAN
from the last (or DRED-injected) features, warm-starting the vocoder
from decode history (fargan_cont); blend back on recovery. PitchDNN
(pitchdnn.rs:91) estimates the period driving FARGAN."""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from .fargan import init_state as fargan_init, synthesize_frame
from .lpcnet_features import FRAME_SIZE, FeatureExtractor
from .nnet import ACTIVATION_TANH, Linear, dense, gru


class PitchDnn(NamedTuple):
    dense_in: Linear
    gru_i: Linear
    gru_r: Linear
    dense_out: Linear


def random_pitchdnn(key) -> PitchDnn:
    import jax
    import jax.numpy as jnp

    def lin(k, nin, nout):
        return Linear(jax.random.normal(k, (nout, nin)) * 0.2 / np.sqrt(nin),
                      jnp.zeros(nout), None)

    k = jax.random.split(key, 4)
    return PitchDnn(lin(k[0], 20, 64), lin(k[1], 64, 192), lin(k[2], 64, 192),
                    lin(k[3], 64, 1))


def compute_pitchdnn(model: PitchDnn, state, features):
    """Returns (period estimate in samples at 16 kHz, new gru state)."""
    import jax.numpy as jnp

    h = dense(model.dense_in, jnp.asarray(features, jnp.float32),
              ACTIVATION_TANH)
    state = gru(model.gru_i, model.gru_r, state, h)
    raw = dense(model.dense_out, state)
    period = 32.0 + 224.0 * jnp.clip(0.5 * (raw[0] + 1.0), 0.0, 1.0)
    return period, state


class DeepPlcState:
    """Feature tracking + neural concealment for one stream."""

    def __init__(self, fargan_model=None, pitch_model=None):
        import jax

        self.extractor = FeatureExtractor()
        self.fargan_model = fargan_model
        self.pitch_model = pitch_model or random_pitchdnn(jax.random.PRNGKey(3))
        self.pitch_state = np.zeros(64, np.float32)
        self.fargan_state = None
        self.last_features = np.zeros(20)
        self.fec_queue = []       # DRED-injected feature vectors
        self.loss_count = 0

    def update(self, pcm16k: np.ndarray) -> None:
        """Track features over the decoded (good) audio, 10 ms at a time."""
        for off in range(0, len(pcm16k) - FRAME_SIZE + 1, FRAME_SIZE):
            self.last_features = self.extractor.compute(
                pcm16k[off: off + FRAME_SIZE])
        self.loss_count = 0

    def inject_fec_features(self, features_list) -> None:
        """Queue DRED-recovered feature vectors for upcoming losses."""
        self.fec_queue = [np.asarray(f) for f in features_list]

    def conceal(self, n_samples: int) -> np.ndarray:
        """Generate concealment audio at 16 kHz with FARGAN."""
        import jax.numpy as jnp

        if self.fargan_model is None:
            self.loss_count += 1
            return np.zeros(n_samples)
        if self.fargan_state is None:
            self.fargan_state = fargan_init(self.fargan_model, 1)
        out = []
        feats = (self.fec_queue.pop(0) if self.fec_queue
                 else self.last_features)
        period, self.pitch_state = compute_pitchdnn(
            self.pitch_model, self.pitch_state, feats)
        while sum(len(o) for o in out) < n_samples:
            pcm, self.fargan_state = synthesize_frame(
                self.fargan_model, self.fargan_state,
                jnp.asarray(feats, jnp.float32)[None, :],
                jnp.asarray([int(period)], jnp.int32))
            out.append(np.asarray(pcm[0]))
        self.loss_count += 1
        return np.concatenate(out)[:n_samples]
