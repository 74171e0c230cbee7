"""ctl surface, lightweight SILK decoder facade, TIC/TOC registry."""

import numpy as np
import pytest

from mousiki_tpu import ctl as C
from mousiki_tpu.opus_decoder import OpusDecoder
from mousiki_tpu.opus_encoder import OpusEncoder, APP_VOIP
from mousiki_tpu.testing import oracle

needs_oracle = pytest.mark.skipif(not oracle.available(), reason="no oracle")


def test_decoder_ctls():
    dec = OpusDecoder(48000, 2)
    assert C.opus_decoder_ctl(dec, C.OPUS_GET_SAMPLE_RATE) == 48000
    C.opus_decoder_ctl(dec, C.OPUS_SET_GAIN, 256)
    assert C.opus_decoder_ctl(dec, C.OPUS_GET_GAIN) == 256
    assert dec.decode_gain == 256
    with pytest.raises(ValueError):
        C.opus_decoder_ctl(dec, C.OPUS_SET_GAIN, 99999)
    C.opus_decoder_ctl(dec, C.OPUS_SET_COMPLEXITY, 5)
    assert C.opus_decoder_ctl(dec, C.OPUS_GET_COMPLEXITY) == 5
    assert C.opus_decoder_ctl(dec, C.OPUS_GET_FINAL_RANGE) == 0
    C.opus_decoder_ctl(dec, C.OPUS_SET_PHASE_INVERSION_DISABLED, True)
    assert C.opus_decoder_ctl(dec, C.OPUS_GET_PHASE_INVERSION_DISABLED)
    C.opus_decoder_ctl(dec, C.OPUS_RESET_STATE)
    assert C.opus_decoder_ctl(dec, C.OPUS_GET_LAST_PACKET_DURATION) == 0
    with pytest.raises(ValueError):
        C.opus_decoder_ctl(dec, 9999)


@needs_oracle
def test_decoder_pitch_and_duration():
    t = np.arange(48000) / 48000.0
    sig = np.clip(0.5 * np.sin(2 * np.pi * 130 * t), -0.9, 0.9)[:, None]
    enc = OpusEncoder(48000, 1, APP_VOIP)
    enc.set_bitrate(24000)
    dec = OpusDecoder(48000, 1)
    for f in range(10):
        pkt = enc.encode(sig[f * 960:(f + 1) * 960], 960)
        dec.decode(pkt, 960)
    assert C.opus_decoder_ctl(dec, C.OPUS_GET_LAST_PACKET_DURATION) == 960
    pitch = C.opus_decoder_ctl(dec, C.OPUS_GET_PITCH)
    # 130 Hz at 48k -> period ~369 samples; allow octave ambiguity
    assert pitch > 0 and (300 < pitch < 440 or 150 < pitch < 220)
    assert C.opus_decoder_ctl(dec, C.OPUS_GET_BANDWIDTH) > 0


def test_encoder_ctls():
    enc = OpusEncoder(48000, 1, APP_VOIP)
    C.opus_encoder_ctl(enc, C.OPUS_SET_BITRATE, 32000)
    assert C.opus_encoder_ctl(enc, C.OPUS_GET_BITRATE) == 32000
    C.opus_encoder_ctl(enc, C.OPUS_SET_PACKET_LOSS_PERC, 10)
    assert C.opus_encoder_ctl(enc, C.OPUS_GET_PACKET_LOSS_PERC) == 10
    C.opus_encoder_ctl(enc, C.OPUS_SET_INBAND_FEC, True)
    assert C.opus_encoder_ctl(enc, C.OPUS_GET_INBAND_FEC)
    C.opus_encoder_ctl(enc, C.OPUS_SET_DTX, True)
    assert C.opus_encoder_ctl(enc, C.OPUS_GET_DTX)
    C.opus_encoder_ctl(enc, C.OPUS_SET_FORCE_MODE, 1000)
    from mousiki_tpu.bitstream.packet import Mode
    assert enc.force_mode == Mode.SILK
    C.opus_encoder_ctl(enc, C.OPUS_SET_FORCE_MODE, C.OPUS_AUTO)
    assert enc.force_mode is None
    assert C.opus_encoder_ctl(enc, C.OPUS_GET_LOOKAHEAD) > 0
    assert C.opus_encoder_ctl(enc, C.OPUS_GET_SAMPLE_RATE) == 48000
    C.opus_encoder_ctl(enc, C.OPUS_RESET_STATE)


def test_lightweight_decoder():
    """SILK-only facade: decode SILK packets, 3x repeat upsample."""
    from mousiki_tpu.bitstream.packet import Mode
    from mousiki_tpu.lightweight import LightweightDecoder, LightweightError

    renc = OpusEncoder(48000, 1, APP_VOIP)
    renc.set_bitrate(24000)
    renc.force_mode = Mode.SILK
    t = np.arange(48000) / 48000.0
    sig = np.clip(0.4 * np.sin(2 * np.pi * 200 * t), -0.9, 0.9)[:, None]
    dec = LightweightDecoder()
    got = []
    for f in range(10):
        pkt = renc.encode(sig[f * 960:(f + 1) * 960], 960)
        bw, stereo, out = dec.decode_float32(pkt)
        assert not stereo
        assert len(out) == 960  # 320 internal * 3
        got.append(out)
        # int16/int24 converters agree in scale
        _, _, pcm_bytes = dec.decode(pkt)
        assert len(pcm_bytes) == 960 * 2
    out = np.concatenate(got)[:, 0]
    assert np.abs(out).max() > 0.1  # real audio came through
    with pytest.raises(LightweightError):
        dec.decode(b"\xfc\x00")   # CELT config rejected


def test_tictoc():
    import mousiki_tpu.utils.debug as D
    D.ENABLED = True
    reg = D.TicToc()
    with reg.span("stage_a"):
        sum(range(1000))
    reg.tic("stage_b")
    reg.toc("stage_b")
    rep = reg.report()
    assert "stage_a" in rep and "stage_b" in rep
    D.ENABLED = False


def test_sample_format_wrappers():
    from mousiki_tpu.bitstream.packet import Mode

    t = np.arange(960) / 48000.0
    sig16 = (np.sin(2 * np.pi * 440 * t) * 20000).astype(np.int16)[:, None]
    enc = OpusEncoder(48000, 1)
    pkt = enc.encode_int16(sig16, 960)
    dec = OpusDecoder(48000, 1)
    o16 = dec.decode_int16(pkt, 960)
    assert o16.dtype == np.int16 and o16.shape == (960, 1)
    dec24 = OpusDecoder(48000, 1)
    o24 = dec24.decode_int24(pkt, 960)
    assert o24.dtype == np.int32
    assert np.abs(o24 // 256 - o16.astype(np.int32)).max() <= 1
    pkt24 = enc.encode_int24(sig16.astype(np.int32) * 256, 960)
    assert len(pkt24) > 10


def test_opus_tags_roundtrip():
    from mousiki_tpu.containers.ogg import opus_tags, parse_opus_tags

    blob = opus_tags("vend", ["TITLE=x", "ARTIST=y"])
    out = parse_opus_tags(blob)
    assert out["vendor"] == "vend"
    assert out["comments"] == ["TITLE=x", "ARTIST=y"]
