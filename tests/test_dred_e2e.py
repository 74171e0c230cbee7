"""DRED end to end: encoder embeds extension id 126 in packet padding,
decoder parses/processes it and recovers lost frames through the neural
concealment path.

Reference surface: src/dred_encoder.rs:439 (emission),
src/opus_encoder.rs:1666 (packet embedding), src/dred.rs:463,509,608
(opus_dred_parse / opus_dred_process / opus_decoder_dred_decode). With
synthetic weights the *plumbing* is asserted: the latent transport is
bit-exact through packet padding, features reach the concealment queue,
and padded packets stay decodable (libopus included).
"""

import numpy as np
import pytest

from mousiki_tpu.opus_decoder import OpusDecoder
from mousiki_tpu.opus_encoder import OpusEncoder
from mousiki_tpu.testing import oracle

needs_oracle = pytest.mark.skipif(not oracle.available(),
                                  reason="oracle missing")


def _speechish(n, fs=48000, seed=7):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / fs
    f0 = 120 + 30 * np.sin(2 * np.pi * 2.3 * t)
    sig = 0.3 * np.sin(2 * np.pi * np.cumsum(f0) / fs)
    sig += 0.1 * np.sin(2 * np.pi * 3 * np.cumsum(f0) / fs)
    sig *= 0.6 + 0.4 * np.sin(2 * np.pi * 4.0 * t) ** 2
    sig += 0.01 * rng.standard_normal(n)
    return sig.astype(np.float32)[:, None]


def _encode_stream(n_frames=16, dred_frames=40):
    enc = OpusEncoder(48000, 1, oracle.APP_VOIP)
    enc.set_bitrate(24000)
    enc.set_dred_duration(dred_frames)
    sig = _speechish(960 * n_frames)
    pkts = [enc.encode(sig[f * 960:(f + 1) * 960], 960)
            for f in range(n_frames)]
    return enc, pkts, sig


def test_dred_extension_emitted_and_parsed():
    enc, pkts, _ = _encode_stream()
    dec = OpusDecoder(48000, 1)
    found = 0
    for pkt in pkts[2:]:
        dred = dec.dred_parse(pkt)
        if dred is not None:
            found += 1
            assert dred.nb_latents >= 1
            assert dred.state_q.shape[-1] >= 19
    assert found >= 10, f"DRED present in only {found} packets"


def test_dred_latent_transport_bit_exact():
    """The payload embedded in the packet is byte-identical to the
    encoder's emission, and parses to identical quantized latents."""
    from mousiki_tpu.models.dred import dred_parse, synthetic_stats

    enc, pkts, _ = _encode_stream()
    dec = OpusDecoder(48000, 1)
    dred = dec.dred_parse(pkts[-1])
    assert dred is not None
    assert dred.payload == enc._dred_last_payload
    want = dred_parse(enc._dred_last_payload, synthetic_stats())
    assert dred.q0 == want.q0 and dred.dq == want.dq
    np.testing.assert_array_equal(dred.state_q, want.state_q)
    assert len(dred.latents_q) == len(want.latents_q)
    for a, b in zip(dred.latents_q, want.latents_q):
        np.testing.assert_array_equal(a, b)


def test_dred_process_features():
    enc, pkts, _ = _encode_stream()
    dec = OpusDecoder(48000, 1)
    dred = dec.dred_parse(pkts[-1])
    feats = dec.dred_process(dred)
    assert len(feats) == 4 * dred.nb_latents
    assert all(f.shape == (20,) for f in feats)
    assert np.isfinite(np.stack(feats)).all()


def test_dred_decode_recovers_lost_frames():
    """Drop packets mid-stream; the DRED from the next packet feeds the
    neural concealment path and produces finite, non-silent audio."""
    import jax
    from mousiki_tpu.models.fargan import random_model

    enc, pkts, _ = _encode_stream()
    dec = OpusDecoder(48000, 1)
    dec.set_deep_plc(random_model(jax.random.PRNGKey(3)))

    for pkt in pkts[:8]:
        dec.decode(pkt, 960)
    # packets 8,9 lost; packet 10 arrives carrying DRED for the gap
    dred = dec.dred_parse(pkts[10])
    assert dred is not None
    dec.dred_process(dred)
    out = []
    for k in (2, 1):  # lost spans, oldest first: offsets in 10 ms units
        pcm = dec.dred_decode(dred, dred_offset_10ms=2 * k, frame_size=960)
        assert pcm.shape == (960, 1)
        assert np.isfinite(pcm).all()
        out.append(pcm)
    # concealment queue consumed: features actually reached deep PLC
    assert dec.deep_plc.fec_queue == [] or len(dec.deep_plc.fec_queue) < 4
    # stream continues cleanly
    pcm = dec.decode(pkts[10], 960)
    assert np.isfinite(pcm).all()


@needs_oracle
def test_dred_padded_packets_decode_in_libopus():
    """Packets carrying DRED padding must remain fully decodable by
    libopus with final_range equality vs our decoder."""
    enc, pkts, _ = _encode_stream(n_frames=12)
    ref = oracle.RefDecoder(48000, 1)
    mine = OpusDecoder(48000, 1)
    n_padded = 0
    for pkt in pkts:
        if mine.dred_parse(pkt) is not None:
            n_padded += 1
        a = mine.decode(pkt, 960)
        b = ref.decode_float(pkt, 960)
        assert mine.final_range == ref.final_range()
        assert np.abs(a - b).max() < 1e-4
    assert n_padded >= 8
