"""Batched device DRED recovery (parallel/deep_recovery.py) vs the
per-stream decoder path (dred.opus_dred_process + models.deep_plc)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

pytestmark = pytest.mark.tpu

from mousiki_tpu.dred import opus_dred_parse, opus_dred_process
from mousiki_tpu.models import dred as M
from mousiki_tpu.models.dred import synthetic_stats
from mousiki_tpu.models.deep_plc import compute_pitchdnn, random_pitchdnn
from mousiki_tpu.models.fargan import (init_state as fargan_init,
                                       random_model as fargan_random,
                                       synthesize_frame)
from mousiki_tpu.opus_encoder import OpusEncoder
from mousiki_tpu.parallel.deep_recovery import BatchedDeepRecovery


def _speechish(n, fs=48000, seed=7):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / fs
    f0 = 120 + 30 * np.sin(2 * np.pi * 2.3 * t)
    sig = 0.3 * np.sin(2 * np.pi * np.cumsum(f0) / fs)
    sig *= 0.6 + 0.4 * np.sin(2 * np.pi * 4.0 * t) ** 2
    sig += 0.01 * rng.standard_normal(n)
    return sig.astype(np.float32)[:, None]


def _dred_packets(seed, n_frames=10):
    enc = OpusEncoder(48000, 1)
    enc.set_bitrate(24000)
    enc.set_dred_duration(40)
    sig = _speechish(960 * n_frames, seed=seed)
    return [enc.encode(sig[f * 960:(f + 1) * 960], 960)
            for f in range(n_frames)]


def test_batched_rdovae_matches_per_stream():
    S = 3
    stats = synthetic_stats()
    dreds = []
    for s in range(S):
        pkts = _dred_packets(seed=10 + s)
        d = None
        for p in reversed(pkts):
            d = opus_dred_parse(p, stats)
            if d is not None:
                break
        assert d is not None, "no DRED extension found"
        dreds.append(d)

    rec = BatchedDeepRecovery(S, stats=stats)
    feats, n10 = rec.process(dreds)
    maxn10 = feats.shape[1]
    for s in range(S):
        want = opus_dred_process(dreds[s], model=rec.dec_model, stats=stats)
        want = np.asarray(want)              # (n10_s, 20) chronological
        got = feats[s, maxn10 - n10[s]:]
        assert got.shape == want.shape
        err = np.abs(got - want).max()
        assert err < 1e-4, (s, err)


def test_batched_conceal_matches_per_stream():
    S = 3
    n_frames = 5
    fargan = fargan_random(jax.random.PRNGKey(2))
    pitch = random_pitchdnn(jax.random.PRNGKey(3))
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((S, n_frames, 20)).astype(np.float32) * 0.3

    rec = BatchedDeepRecovery(S, fargan_model=fargan, pitch_model=pitch)
    got = np.asarray(rec.conceal(feats))

    # per-stream reference: same models, one stream at a time
    for s in range(S):
        fst = fargan_init(fargan, 1)
        pst = np.zeros(64, np.float32)
        outs = []
        for k in range(n_frames):
            period, pst = compute_pitchdnn(pitch, pst, feats[s, k])
            pcm, fst = synthesize_frame(
                fargan, fst, jnp.asarray(feats[s, k])[None, :],
                jnp.asarray([period], jnp.float32).astype(jnp.int32))
            outs.append(np.asarray(pcm[0]))
        want = np.concatenate(outs)
        err = np.abs(got[s] - want).max()
        assert err < 1e-4, (s, err)
