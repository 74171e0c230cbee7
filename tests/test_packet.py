"""Packet-layer tests: TOC semantics + framing, cross-checked against libopus
packets generated live by the oracle (mirrors the reference's packet_helpers
test strategy without copying fixtures)."""

import numpy as np
import pytest

from mousiki_tpu.bitstream.packet import (
    Bandwidth, InvalidPacket, Mode, packet_get_nb_frames, packet_get_nb_samples,
    parse_packet, samples_per_frame, toc_bandwidth, toc_channels, toc_mode,
)
from mousiki_tpu.testing import oracle

needs_oracle = pytest.mark.skipif(not oracle.available(), reason="libopus oracle missing")


def test_toc_configs():
    # config 0: SILK NB 10ms; config 31: CELT FB 20ms
    assert toc_mode(0x00) == Mode.SILK
    assert toc_bandwidth(0x00) == Bandwidth.NARROWBAND
    assert samples_per_frame(b"\x00") == 480
    assert toc_mode(0xFC) == Mode.CELT
    assert toc_bandwidth(0xFC) == Bandwidth.FULLBAND
    assert samples_per_frame(b"\xfc") == 960
    assert toc_channels(0xFC) == 2
    assert toc_channels(0xF8) == 1
    # hybrid configs 12-15
    assert toc_mode(12 << 3) == Mode.HYBRID
    assert toc_bandwidth(12 << 3) == Bandwidth.SUPERWIDEBAND
    assert toc_bandwidth(14 << 3) == Bandwidth.FULLBAND
    assert samples_per_frame(bytes([12 << 3])) == 480
    assert samples_per_frame(bytes([13 << 3])) == 960
    # SILK 60 ms (sz code 3)
    assert samples_per_frame(bytes([3 << 3])) == 2880


def test_code0():
    pkt = bytes([0xFC]) + b"abc"
    p = parse_packet(pkt)
    assert p.frames == [b"abc"]
    assert packet_get_nb_frames(pkt) == 1
    assert packet_get_nb_samples(pkt) == 960


def test_code1_cbr():
    pkt = bytes([0xFD]) + b"abcdef"
    p = parse_packet(pkt)
    assert p.frames == [b"abc", b"def"]
    with pytest.raises(InvalidPacket):
        parse_packet(bytes([0xFD]) + b"abcde")  # odd length


def test_code2_vbr():
    pkt = bytes([0xFE, 2]) + b"ab" + b"cdef"
    p = parse_packet(pkt)
    assert p.frames == [b"ab", b"cdef"]


def test_code3_cbr_and_padding():
    # 3 CBR frames of 2 bytes each + 2 padding bytes (pad len byte = 2)
    pkt = bytes([0xFF, 0x40 | 3, 2]) + b"aabbcc" + b"\x00\x00"
    p = parse_packet(pkt)
    assert p.frames == [b"aa", b"bb", b"cc"]
    assert p.packet_offset == len(pkt)


def test_code3_vbr():
    pkt = bytes([0xFF, 0x80 | 3, 1, 2]) + b"a" + b"bb" + b"cccc"
    p = parse_packet(pkt)
    assert p.frames == [b"a", b"bb", b"cccc"]


def test_self_delimited():
    inner = bytes([0xFC, 3]) + b"xyz"
    p = parse_packet(inner + b"trailing", self_delimited=True)
    assert p.frames == [b"xyz"]
    assert p.packet_offset == len(inner)


def test_long_frame_two_byte_size():
    size = 400
    nb2 = (size - 252) // 4 * 4 + 252
    assert nb2 <= size
    b0 = 252 + ((size - 252) & 0x3)
    b1 = (size - b0) // 4
    pkt = bytes([0xFE, b0, b1]) + b"x" * size + b"y" * 10
    p = parse_packet(pkt)
    assert len(p.frames[0]) == size
    assert len(p.frames[1]) == 10


@needs_oracle
@pytest.mark.parametrize("app,mode", [
    (oracle.APP_RESTRICTED_LOWDELAY, Mode.CELT),
    (oracle.APP_VOIP, None),
])
def test_parse_real_packets(app, mode):
    enc = oracle.RefEncoder(48000, 2, app)
    enc.ctl_set(oracle.SET_BITRATE, 64000)
    sig = oracle.make_test_signal(48000, 2)
    pcm = oracle.float_to_i16(sig)
    for off in range(0, 48000 - 960, 960):
        pkt = enc.encode(pcm[off: off + 960].reshape(-1))
        p = parse_packet(pkt)
        assert sum(len(f) for f in p.frames) <= len(pkt)
        assert packet_get_nb_samples(pkt) in (480, 960, 1920, 2880)
        if mode is not None:
            assert p.mode == mode


@needs_oracle
def test_multiframe_real_packet():
    enc = oracle.RefEncoder(48000, 1, oracle.APP_AUDIO)
    enc.ctl_set(oracle.SET_BITRATE, 32000)
    sig = oracle.make_test_signal(2880 * 4, 1)
    pcm = oracle.float_to_i16(sig)
    pkt = enc.encode(pcm[:2880].reshape(-1))  # 60 ms → multi-frame packet
    p = parse_packet(pkt)
    assert len(p.frames) >= 1
    assert packet_get_nb_samples(pkt) == 2880
