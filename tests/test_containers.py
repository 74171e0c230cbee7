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


def _make_stream(freq, nframes, channels, serial, comments=None):
    from mousiki_tpu.opus_encoder import OpusEncoder

    enc = OpusEncoder(48000, channels)
    enc.set_bitrate(64000 * channels)
    t = np.arange(960 * nframes) / 48000.0
    sig = np.tile((0.4 * np.sin(2 * np.pi * freq * t))[:, None],
                  (1, channels))
    w = OggOpusWriter(channels, serial=serial, comments=comments)
    for f in range(nframes):
        w.write_packet(enc.encode(sig[f * 960:(f + 1) * 960], 960), 960)
    return w.finish()


def test_chained_file_links_and_decode():
    """Two concatenated Ogg Opus streams = one chained file; the reader
    exposes both links and decodes across the boundary
    (reference opusfile/reader.rs chained_files_advance_across_links)."""
    from mousiki_tpu.containers.opusfile import OpusFile

    a = _make_stream(440, 10, 1, serial=111, comments=["TITLE=first"])
    b = _make_stream(880, 6, 2, serial=222, comments=["TITLE=second"])
    f = OpusFile(a + b)
    assert f.link_count == 2
    assert f.serialno(0) == 111 and f.serialno(1) == 222
    assert f.channel_count(0) == 1 and f.channel_count(1) == 2
    # the writer's granule convention: preskip + written samples
    assert f.pcm_total(0) == 10 * 960
    assert f.pcm_total(1) == 6 * 960
    assert f.tags(0)["comments"] == ["TITLE=first"]
    assert f.tags(1)["comments"] == ["TITLE=second"]
    pcm = f.decode_all()
    assert pcm.shape == (f.pcm_total() - 2 * 312, 2)
    # both tones present in their halves (skip codec ramp-in)
    n0 = 10 * 960 - 312
    assert np.abs(pcm[n0 // 2: n0]).max() > 0.1
    assert np.abs(pcm[n0 + (len(pcm) - n0) // 4:]).max() > 0.1


def test_multiplexed_foreign_stream_skipped():
    """Pages of a non-Opus serial interleaved with the Opus stream are
    ignored (multiplexed file support, reader.rs serialno filtering)."""
    from mousiki_tpu.containers.opusfile import OpusFile

    a = _make_stream(440, 6, 1, serial=111)
    # craft a foreign stream: BOS + one data page under another serial
    fw = OggStreamWriter(999)
    foreign = [fw.page_out([b"\x01vorbis-ish-header"], 0, bos=True),
               fw.page_out([b"foreign-data"], 1000),
               fw.page_out([b"foreign-end"], 2000, eos=True)]
    # interleave: foreign BOS after opus BOS page, data pages in the middle
    pages = []
    off = 0
    while off < len(a):
        _pg, _lac, nxt = parse_page(a, off)
        pages.append(a[off:nxt])
        off = nxt
    mux = (pages[0] + foreign[0] + b"".join(pages[1:3]) + foreign[1]
           + b"".join(pages[3:]) + foreign[2])
    f = OpusFile(mux)
    assert f.link_count == 1
    assert f.serialno(0) == 111
    assert f.pcm_total() == 6 * 960
    assert f.decode_all().shape == (f.pcm_total() - 312, 2)


def test_picture_tag_parse():
    """METADATA_BLOCK_PICTURE parsing with PNG header-derived dimensions
    (reference opusfile/picture.rs)."""
    import base64
    import struct

    from mousiki_tpu.containers.picture import (FORMAT_PNG, OpusPictureTag,
                                                picture_from_tags)

    png = (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
           + struct.pack(">IIBB", 32, 32, 8, 6) + b"\x00\x00\x00"
           + b"\x00\x00\x00\x00")
    block = (struct.pack(">I", 3)
             + struct.pack(">I", 9) + b"image/png"
             + struct.pack(">I", 5) + b"cover"
             + struct.pack(">IIII", 0, 0, 0, 0)
             + struct.pack(">I", len(png)) + png)
    tag = "METADATA_BLOCK_PICTURE=" + base64.b64encode(block).decode()
    pic = OpusPictureTag.parse(tag)
    assert pic.picture_type == 3
    assert pic.mime_type == b"image/png"
    assert pic.description == b"cover"
    assert (pic.width, pic.height, pic.depth, pic.colors) == (32, 32, 32, 0)
    assert pic.format == FORMAT_PNG
    assert pic.data == png
    assert len(picture_from_tags([tag, "TITLE=x"])) == 1

    # file icon (type 1) must be a 32x32 PNG: a GIF icon is rejected
    gif = b"GIF89a" + struct.pack("<HH", 32, 32) + b"\x00\x00\x00\x00"
    bad = (struct.pack(">I", 1)
           + struct.pack(">I", 9) + b"image/gif"
           + struct.pack(">I", 0)
           + struct.pack(">IIII", 0, 0, 0, 0)
           + struct.pack(">I", len(gif)) + gif)
    with pytest.raises(ValueError):
        OpusPictureTag.parse(base64.b64encode(bad).decode())


def test_opusfile_fuzz_robustness():
    """Byte-corrupted chained files must never escape with an unexpected
    exception; bad packets are skipped like opusfile's OP_EBADPACKET."""
    import struct

    from mousiki_tpu.containers.opusfile import OpusFile

    a = _make_stream(440, 6, 1, serial=5)
    blob = bytearray(a * 2)
    rng = np.random.default_rng(0)
    for _ in range(60):
        b = bytearray(blob)
        for _ in range(int(rng.integers(1, 20))):
            b[int(rng.integers(0, len(b)))] = int(rng.integers(0, 256))
        try:
            f = OpusFile(bytes(b))
            f.pcm_total()
            f.decode_all()
        except (ValueError, KeyError, IndexError, struct.error):
            pass


def test_opusfile_read_stereo_variants():
    from mousiki_tpu.containers.opusfile import OpusFile

    blob = _make_stream(440, 6, 1, serial=7)
    f = OpusFile(blob)
    flt = f.read_float_stereo()
    i16 = OpusFile(blob).read_stereo()
    assert flt.shape == i16.shape and flt.shape[1] == 2
    assert i16.dtype == np.int16
    err = np.abs(flt - i16 / 32768.0).max()
    assert err < 1e-3  # in-range content: straight requantization


def test_opusenc_pull_pages():
    """drain_pages streams the file incrementally; concatenated drains +
    finish byte-equal the one-shot output (libopusenc pull encoder)."""
    from mousiki_tpu.containers.opusfile import OpusEnc, OpusFile

    rate = 48000
    t = np.arange(rate) / rate
    pcm = (0.4 * np.sin(2 * np.pi * 330 * t))[:, None]

    one = OpusEnc(rate, 1, bitrate=64000)
    one.write(pcm)
    whole = one.finish()

    pull = OpusEnc(rate, 1, bitrate=64000)
    parts = []
    for i in range(0, len(pcm), 9600):
        pull.write(pcm[i: i + 9600])
        parts.append(pull.drain_pages())
    parts.append(pull.finish())
    assert b"".join(parts) == whole
    assert OpusFile(b"".join(parts)).pcm_total() == OpusFile(
        whole).pcm_total()
