"""High-level API + multistream tests (differential vs libopus multistream)."""

import ctypes as C

import numpy as np
import pytest

from mousiki_tpu.codec import (Application, Bandwidth, Channels, Decoder,
                               Encoder, FrameDuration)
from mousiki_tpu.multistream import MultistreamDecoder, MultistreamEncoder
from mousiki_tpu.testing import oracle

pytestmark = pytest.mark.skipif(not oracle.available(), reason="oracle missing")


def test_codec_api_roundtrip():
    enc = Encoder(48000, Channels.STEREO,
                  Application.RESTRICTED_LOWDELAY).set_bitrate(96000)
    dec = Decoder(48000, Channels.STEREO)
    sig = oracle.make_test_signal(960 * 6, 2)
    for f in range(5):
        pkt = enc.encode_float(sig[f * 960:(f + 1) * 960], FrameDuration.MS_20)
        out = dec.decode_float(pkt, 960)
        assert out.shape == (960, 2)
    i16 = dec.decode(pkt, 960)
    assert i16.dtype == np.int16


def _lib_ms_decoder(fs, channels, streams, coupled, mapping):
    lib = C.CDLL("libopus.so.0")
    lib.opus_multistream_decoder_create.restype = C.c_void_p
    err = C.c_int()
    m = (C.c_ubyte * channels)(*mapping)
    st = lib.opus_multistream_decoder_create(
        C.c_int32(fs), C.c_int(channels), C.c_int(streams), C.c_int(coupled),
        m, C.byref(err))
    assert err.value == 0
    lib.opus_multistream_decode_float.restype = C.c_int
    return lib, st


@pytest.mark.parametrize("channels", [3, 6])
def test_multistream_roundtrip_vs_libopus(channels):
    enc = MultistreamEncoder.surround(48000, channels)
    enc.set_bitrate(64000 * channels)
    dec = MultistreamDecoder(48000, channels, enc.streams, enc.coupled,
                             enc.mapping)
    lib, st = _lib_ms_decoder(48000, channels, enc.streams, enc.coupled,
                              enc.mapping)
    rng = np.random.default_rng(5)
    sig = np.zeros((960 * 5, channels))
    t = np.arange(960 * 5) / 48000.0
    for ch in range(channels):
        sig[:, ch] = 0.3 * np.sin(2 * np.pi * (200 + 130 * ch) * t)
    for f in range(5):
        pkt = enc.encode(sig[f * 960:(f + 1) * 960], 960)
        mine = dec.decode(pkt, 960)
        ref = np.zeros(960 * channels, np.float32)
        n = lib.opus_multistream_decode_float(
            C.c_void_p(st), pkt, C.c_int32(len(pkt)),
            ref.ctypes.data_as(C.POINTER(C.c_float)), C.c_int(960), C.c_int(0))
        assert n == 960, n
        ref = ref.reshape(960, channels)
        assert np.abs(mine - ref).max() < 1e-4, f"frame {f}"


def test_surround_rate_allocation():
    """Rate split matches the reference formula's structure: coupled gets
    ~2x a mono channel, LFE a small capped share, totals stay sane
    (opus_multistream.rs:407-470)."""
    from mousiki_tpu.multistream import (MultistreamEncoder,
                                         surround_rate_allocation)

    # 5.1: 4 streams (2 coupled + C + LFE), LFE last
    rates = surround_rate_allocation(4, 2, 3, 256000, 960, 48000)
    assert len(rates) == 4
    assert all(r > 0 for r in rates)
    assert rates[0] == rates[1]                 # both coupled equal
    assert rates[0] > rates[2] > rates[3]       # coupled > centre > LFE
    assert rates[3] < 40000                     # LFE capped small
    # coupled carries ~2x the per-channel payload of the mono centre
    assert 1.5 < rates[0] / rates[2] < 2.5
    assert abs(sum(rates) - 256000) < 256000 // 10

    enc = MultistreamEncoder.surround(48000, 6)
    assert enc.lfe_stream == 3
    enc.set_bitrate(256000)
    got = [e.bitrate for e in enc.encoders]
    assert got == rates


def test_surround_masking_offset_and_masks():
    """Energy-mask plumbing: quiet channels get negative masks and a
    negative SILK rate offset; a flat mask yields the +0.2 floor
    (opus_encoder.rs:1552-1587)."""
    from mousiki_tpu.bitstream.packet import Bandwidth
    from mousiki_tpu.multistream import MultistreamEncoder, surround_masks
    from mousiki_tpu.opus_encoder import compute_surround_masking_rate_offset

    # all-zero mask -> depth = 0.2 -> +3200 bps at WB
    assert compute_surround_masking_rate_offset(
        np.zeros(21), Bandwidth.WIDEBAND, 1) == 3200
    # deeply masked -> -2 per band -> 16000*(-2+0.2) = -28800
    assert compute_surround_masking_rate_offset(
        np.full(21, -5.0), Bandwidth.WIDEBAND, 1) == -28800

    # 5.1 input where the LFE/centre are quiet vs loud fronts
    t = np.arange(960) / 48000.0
    pcm = np.zeros((960, 6))
    pcm[:, 0] = 0.8 * np.sin(2 * np.pi * 500 * t)   # L loud
    pcm[:, 1] = 0.01 * np.sin(2 * np.pi * 500 * t)  # C quiet
    pcm[:, 2] = 0.8 * np.cos(2 * np.pi * 500 * t)   # R loud
    streams, coupled, mapping = 4, 2, [0, 4, 1, 2, 3, 5]
    masks = surround_masks(pcm, mapping, streams, coupled)
    assert len(masks) == 4 and masks[0].shape == (42,)
    # the quiet centre (stream 2) is masked below the loud fronts
    assert masks[2].mean() < masks[0].mean() - 0.5

    enc = MultistreamEncoder.surround(48000, 6)
    enc.set_bitrate(300000)
    pkt = enc.encode(pcm, 960)
    assert len(pkt) > 0
    assert enc.encoders[2].energy_mask is not None
