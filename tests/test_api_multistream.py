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
