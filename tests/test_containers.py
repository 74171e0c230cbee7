"""Ogg container tests: page roundtrip, CRC, full encode->mux->demux->decode,
and parsing the reference test vector tiny.ogg (read-only fixture)."""

import os

import numpy as np
import pytest

from mousiki_tpu.containers.ogg import (OggStreamReader, OggStreamWriter,
                                        ogg_crc, parse_opus_head, parse_page)
from mousiki_tpu.containers.opusfile import OggOpusReader, OggOpusWriter
from mousiki_tpu.testing import oracle

TINY_OGG = "/root/reference/testdata/tiny.ogg"


def test_page_roundtrip():
    w = OggStreamWriter(1234)
    pkts = [b"hello", b"x" * 600, b"", b"tail"]
    data = w.page_out(pkts, granule=999, bos=True)
    page, lacing, nxt = parse_page(data)
    assert page.serial == 1234 and page.bos and page.granule_pos == 999
    r = OggStreamReader(data)
    got = []
    while True:
        p = r.next_packet()
        if p is None:
            break
        got.append(p[0])
    assert got == pkts


def test_continued_packet_across_pages():
    w = OggStreamWriter(7)
    big = bytes(range(256)) * 40  # 10240 bytes
    # emit as a single page (the writer splits into 255-segments internally)
    data = w.page_out([big], granule=1)
    r = OggStreamReader(data)
    pkt, gran = r.next_packet()
    assert pkt == big and gran == 1


@pytest.mark.skipif(not os.path.exists(TINY_OGG), reason="fixture missing")
def test_parse_reference_tiny_ogg():
    data = open(TINY_OGG, "rb").read()
    r = OggOpusReader(data)
    assert r.head["version"] == 1
    assert r.channels in (1, 2)
    pkts = list(r.packets())
    assert len(pkts) >= 1


@pytest.mark.skipif(not oracle.available(), reason="oracle missing")
def test_full_file_roundtrip():
    from mousiki_tpu.opus_encoder import OpusEncoder

    sig = oracle.make_test_signal(960 * 10, 2, seed=4)
    enc = OpusEncoder(48000, 2)
    enc.set_bitrate(96000)
    wr = OggOpusWriter(channels=2, preskip=120)
    for f in range(10):
        pkt = enc.encode(sig[f * 960:(f + 1) * 960], 960)
        wr.write_packet(pkt, 960)
    blob = wr.finish()

    rd = OggOpusReader(blob)
    assert rd.channels == 2
    pcm = rd.decode_all()
    assert pcm.shape[0] == 960 * 10 - 120
    # quality sanity vs source (aligned at codec delay 120 == preskip)
    a = sig[:len(pcm), 0]
    b = pcm[: len(a), 0]
    snr = 10 * np.log10((a ** 2).mean() / ((a - b) ** 2).mean() + 1e-12)
    assert snr > 5.0, snr


def test_opusfile_seek():
    """pcm_seek: decode-from-offset must match the straight-through decode
    (after preroll re-priming) to concealment-level accuracy."""
    import numpy as np
    from mousiki_tpu.containers.opusfile import OggOpusReader, OggOpusWriter
    from mousiki_tpu.opus_encoder import OpusEncoder

    t = np.arange(48000 * 2) / 48000.0
    sig = np.stack([0.4 * np.sin(2 * np.pi * 330 * t),
                    0.3 * np.sin(2 * np.pi * 550 * t)], 1)
    enc = OpusEncoder(48000, 2)
    enc.set_bitrate(96000)
    w = OggOpusWriter(2, preskip=0)
    for f in range(100):
        w.write_packet(enc.encode(sig[f * 960:(f + 1) * 960], 960), 960)
    blob = w.finish()

    rd = OggOpusReader(blob)
    full = rd.decode_all()
    rd2 = OggOpusReader(blob)
    assert rd2.pcm_total() == 96000
    target = 960 * 37 + 123
    got = rd2.read_from(target, 4800)
    want = full[target: target + 4800]
    err = np.abs(got - want).max()
    assert got.shape == want.shape
    assert err < 2e-2, err  # preroll re-priming: near-identical audio
