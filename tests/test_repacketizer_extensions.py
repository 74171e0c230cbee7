"""Repacketizer/pad/unpad (byte-parity vs libopus) + extension roundtrips."""

import ctypes as C

import numpy as np
import pytest

from mousiki_tpu.bitstream.extensions import (ExtensionData, extensions_generate,
                                              extensions_parse)
from mousiki_tpu.bitstream.packet import parse_packet
from mousiki_tpu.bitstream.repacketizer import (Repacketizer, opus_packet_pad,
                                                opus_packet_unpad)
from mousiki_tpu.testing import oracle

needs_oracle = pytest.mark.skipif(not oracle.available(), reason="oracle missing")


def make_packets(n=6, ch=1, br=32000):
    enc = oracle.RefEncoder(48000, ch, oracle.APP_AUDIO)
    enc.ctl_set(oracle.SET_BITRATE, br)
    sig = oracle.make_test_signal(960 * (n + 1), ch)
    pcm16 = oracle.float_to_i16(sig)
    return [enc.encode(pcm16[f * 960:(f + 1) * 960].reshape(-1)) for f in range(n)]


@needs_oracle
def test_pad_byte_parity_with_libopus():
    lib = C.CDLL("libopus.so.0")
    lib.opus_packet_pad.restype = C.c_int
    for pkt in make_packets(4):
        for add in (1, 2, 5, 300):
            newlen = len(pkt) + add
            buf = C.create_string_buffer(bytes(pkt), newlen)
            assert lib.opus_packet_pad(buf, len(pkt), newlen) == 0
            mine = opus_packet_pad(pkt, newlen)
            assert mine == buf.raw[:newlen]
            assert parse_packet(opus_packet_unpad(mine)).frames == \
                parse_packet(pkt).frames


@needs_oracle
def test_repacketizer_merge_decodable():
    pkts = make_packets(3)
    rp = Repacketizer()
    for p in pkts:
        rp.cat(p)
    merged = rp.out()
    assert parse_packet(merged).frames == [parse_packet(p).frames[0] for p in pkts]
    ref = oracle.RefDecoder(48000, 1)
    assert ref.decode_float(merged, 2880).shape[0] == 2880
    for b0, b1 in [(0, 1), (1, 3), (0, 2)]:
        part = rp.out_range(b0, b1)
        assert parse_packet(part).frames == \
            [parse_packet(p).frames[0] for p in pkts[b0:b1]]


@needs_oracle
def test_multistream_pad_byte_parity_with_libopus():
    """opus_multistream_packet_pad/unpad vs libopus (2-stream packet)."""
    from mousiki_tpu.bitstream.repacketizer import (
        opus_multistream_packet_pad, opus_multistream_packet_unpad)
    lib = C.CDLL("libopus.so.0")
    lib.opus_multistream_packet_pad.restype = C.c_int
    lib.opus_multistream_packet_unpad.restype = C.c_int

    p0s = make_packets(3, br=24000)
    p1s = make_packets(3, br=40000)
    for p0, p1 in zip(p0s, p1s):
        # build a 2-stream multistream packet: stream 0 self-delimited
        rp = Repacketizer()
        rp.cat(p0)
        ms = rp.out_range(0, rp.nb_frames, self_delimited=True) + p1
        for add in (1, 2, 7, 260):
            newlen = len(ms) + add
            buf = C.create_string_buffer(bytes(ms), newlen)
            assert lib.opus_multistream_packet_pad(
                buf, len(ms), newlen, 2) == 0
            mine = opus_multistream_packet_pad(ms, newlen, 2)
            assert mine == buf.raw[:newlen]
            # unpad both ways and compare byte-for-byte
            buf2 = C.create_string_buffer(bytes(mine), len(mine))
            rc = lib.opus_multistream_packet_unpad(buf2, len(mine), 2)
            assert rc > 0
            theirs = buf2.raw[:rc]
            ours = opus_multistream_packet_unpad(mine, 2)
            assert ours == theirs


def test_extension_roundtrip_simple():
    exts = [
        ExtensionData(33, 0, b"hello world"),
        ExtensionData(5, 0, b"x"),
        ExtensionData(40, 1, b"\x01\x02\x03" * 100),
        ExtensionData(4, 2, b""),
    ]
    blob = extensions_generate(exts, 3)
    got = extensions_parse(blob, 3)
    want = sorted(exts, key=lambda e: e.frame)
    assert [(e.id, e.frame, e.data) for e in got] == \
        [(e.id, e.frame, e.data) for e in want]


def test_extension_roundtrip_padded():
    exts = [ExtensionData(100, 0, b"A" * 300)]
    blob = extensions_generate(exts, 1, pad_to=512)
    assert len(blob) == 512
    got = extensions_parse(blob, 1)
    assert got[0].id == 100 and got[0].data == b"A" * 300


def test_extension_frame_skip():
    exts = [ExtensionData(7, 5, b"z")]
    blob = extensions_generate(exts, 8)
    got = extensions_parse(blob, 8)
    assert got[0].frame == 5 and got[0].id == 7
