"""DRED: RDOVAE graph smoke + latent transport bit-exact roundtrip."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from mousiki_tpu.bitstream.entcode import RangeDecoder, RangeEncoder
from mousiki_tpu.models import dred as D


def test_laplace_p0_roundtrip():
    enc = RangeEncoder(200)
    vals = [0, 1, -1, 3, -7, 12, 0, -25, 8, 0]
    for v in vals:
        D.laplace_encode_p0(enc, v, 100 << 7, 150 << 7)
    enc.done()
    dec = RangeDecoder(enc.data())
    got = [D.laplace_decode_p0(dec, 100 << 7, 150 << 7) for _ in vals]
    assert got == vals


def test_latent_transport_roundtrip():
    stats = D.synthetic_stats(1)
    rng = np.random.default_rng(2)
    lat = [rng.standard_normal(D.DRED_LATENT_DIM) * 2 for _ in range(8)]
    st = rng.standard_normal(D.DRED_STATE_DIM)
    payload = D.dred_encode(lat, st, stats, q0=6, dq=4, offset=100)
    pkt = D.dred_parse(payload, stats)
    assert (pkt.q0, pkt.dq, pkt.offset) == (6, 4, 100)
    # quantized values decode exactly
    srow = (stats.state_scale[6], stats.state_dzone[6],
            stats.state_r[6], stats.state_p0[6])
    want_state = D._quantize(st, srow[0], srow[1])
    want_state[(srow[2] == 0) | (srow[3] == 255)] = 0
    assert np.array_equal(pkt.state_q, want_state)
    assert len(pkt.latents_q) >= 4
    for i, lq in enumerate(pkt.latents_q):
        lvl = D.q_level(i, 6, 4)
        row = (stats.latent_scale[lvl], stats.latent_dzone[lvl],
               stats.latent_r[lvl], stats.latent_p0[lvl])
        want = D._quantize(lat[i], row[0], row[1])
        want[(row[2] == 0) | (row[3] == 255)] = 0
        assert np.array_equal(lq, want), i


def test_rdovae_graph():
    import jax.numpy as jnp
    enc = D.random_enc(jax.random.PRNGKey(0))
    dec = D.random_dec(jax.random.PRNGKey(1))
    es = D.enc_init_state(enc)
    feats = jnp.zeros(2 * D.DRED_NUM_FEATURES) + 0.1
    lats, init_state, es = D.encode_dframe(enc, es, feats)
    assert lats.shape == (D.DRED_PADDED_LATENT_DIM,)
    assert init_state.shape == (D.DRED_PADDED_STATE_DIM,)
    ds = D.dec_init_state(dec, init_state)
    out, ds = D.decode_qframe(dec, ds, lats)
    assert out.shape == (80,)
    # second step exercises conv/gru state plumbing
    lats2, _, es = D.encode_dframe(enc, es, feats * 2)
    out2, ds = D.decode_qframe(dec, ds, lats2)
    assert np.isfinite(np.asarray(out2)).all()


def test_extension_wrap():
    from mousiki_tpu.bitstream.extensions import (ExtensionData,
                                                  extensions_generate,
                                                  extensions_parse)
    stats = D.synthetic_stats(0)
    rng = np.random.default_rng(5)
    payload = D.dred_encode([rng.standard_normal(21)], rng.standard_normal(19),
                            stats)
    data = extensions_generate(
        [ExtensionData(id=D.DRED_EXTENSION_ID, frame=0, data=payload)], 1)
    back = extensions_parse(data, 1)
    found = [e for e in back if e.id == D.DRED_EXTENSION_ID]
    assert found and found[0].data == payload


def test_feature_extractor_and_deep_plc():
    from mousiki_tpu.models.deep_plc import DeepPlcState
    from mousiki_tpu.models.fargan import random_model
    from mousiki_tpu.models.lpcnet_features import FeatureExtractor

    t = np.arange(16000) / 16000.0
    sig = 0.5 * np.sin(2 * np.pi * 200 * t)
    fx = FeatureExtractor()
    feats = [fx.compute(sig[i * 160:(i + 1) * 160]) for i in range(20)]
    f = np.stack(feats[5:])
    assert f.shape[1] == 20
    # pitch feature ~ 80 samples (200 Hz at 16 kHz)
    periods = 200 + 100 * f[:, 18]
    assert np.abs(periods.mean() - 80) < 8, periods.mean()
    assert f[:, 19].mean() > 0.3  # strongly voiced

    plc = DeepPlcState(fargan_model=random_model(
        __import__("jax").random.PRNGKey(0)))
    plc.update(sig[:3200])
    out = plc.conceal(320)
    assert out.shape == (320,)
    assert np.isfinite(out).all()
    plc.inject_fec_features([feats[-1], feats[-1]])
    out2 = plc.conceal(160)
    assert np.isfinite(out2).all()


def test_deep_plc_in_decoder():
    """With a (synthetic) model loaded, loss concealment runs through
    FARGAN and blends into the classic PLC without artifacts blowing up."""
    from mousiki_tpu.models.fargan import random_model
    from mousiki_tpu.opus_decoder import OpusDecoder
    from mousiki_tpu.opus_encoder import OpusEncoder, APP_VOIP
    from mousiki_tpu.bitstream.packet import Mode

    t = np.arange(48000) / 48000.0
    sig = np.clip(0.5 * np.sin(2 * np.pi * 220 * t), -0.9, 0.9)[:, None]
    enc = OpusEncoder(48000, 1, APP_VOIP)
    enc.set_bitrate(24000)
    enc.force_mode = Mode.SILK
    dec = OpusDecoder(48000, 1)
    dec.set_deep_plc(random_model(jax.random.PRNGKey(0)))
    for f in range(6):
        out = dec.decode(enc.encode(sig[f * 960:(f + 1) * 960], 960), 960)
        assert np.isfinite(out).all()
    lost = dec.decode(None, 960)  # neural concealment path
    assert lost.shape == (960, 1)
    assert np.isfinite(lost).all()
    dec.inject_dred_features([np.zeros(20)])
    lost2 = dec.decode(None, 960)
    assert np.isfinite(lost2).all()
    # recovery continues normally
    out = dec.decode(enc.encode(sig[:960], 960), 960)
    assert np.isfinite(out).all()
