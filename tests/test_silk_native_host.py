"""Differential test: native C++ SILK host vs the bit-exact Python decoder
on real packets (SILK is integer-deterministic, so equality is exact)."""

import numpy as np
import pytest

from mousiki_tpu.bitstream.packet import Mode, parse_packet, toc_bandwidth
from mousiki_tpu.opus_encoder import OpusEncoder, APP_VOIP
from mousiki_tpu.silk import host_native
from mousiki_tpu.testing import oracle

pytestmark = pytest.mark.skipif(
    not (host_native.available() and oracle.available()),
    reason="native silk host or oracle missing")

_BW_KHZ = {1101: 8, 1102: 12, 1103: 16}


def _decode_py(payloads, fs_khz, frame_ms):
    """Reference: the Python decoder's raw decode_frame output (pre-resampler,
    matching the native host's internal-rate frames)."""
    from mousiki_tpu.bitstream.entcode import RangeDecoder
    from mousiki_tpu.silk.dec_api import DecControl, silk_decode
    from mousiki_tpu.silk.structs import SilkDecoder
    import mousiki_tpu.silk.dec_api as D

    silk = SilkDecoder()
    ctl = DecControl()
    ctl.n_channels_api = 1
    ctl.n_channels_internal = 1
    ctl.api_sample_rate = fs_khz * 1000
    ctl.internal_sample_rate = fs_khz * 1000
    ctl.payload_size_ms = frame_ms
    outs = []
    orig = D.decode_frame

    def spy(st, dec, lost_flag, cond):
        pout = orig(st, dec, lost_flag, cond)
        outs.extend(pout)
        return pout

    D.decode_frame = spy
    try:
        for payload in payloads:
            dec = RangeDecoder(payload)
            for i in range(max(1, frame_ms // 20)):
                silk_decode(silk, ctl, 0, i == 0, dec)
    finally:
        D.decode_frame = orig
    return np.asarray(outs, np.int64)


@pytest.mark.parametrize("bitrate,frame_size,fec", [
    (12000, 960, False),   # NB
    (16000, 960, False),   # MB
    (24000, 960, False),   # WB voiced
    (24000, 960, True),    # WB with LBRR skip-parse
    (24000, 1920, False),  # 40 ms multi-frame
    (24000, 2880, False),  # 60 ms multi-frame
])
def test_native_silk_matches_python(bitrate, frame_size, fec):
    t = np.arange(48000 * 2) / 48000.0
    sig = np.clip(0.4 * np.sin(2 * np.pi * 140 * t)
                  * (1 + 0.4 * np.sin(2 * np.pi * 3 * t))
                  + 0.2 * np.sin(2 * np.pi * 800 * t), -0.9, 0.9)[:, None]
    enc = OpusEncoder(48000, 1, APP_VOIP)
    enc.set_bitrate(bitrate)
    enc.force_mode = Mode.SILK
    if fec:
        enc.inband_fec = True
        enc.packet_loss_perc = 20
    n = (48000 * 2) // frame_size
    pkts = [enc.encode(sig[f * frame_size:(f + 1) * frame_size], frame_size)
            for f in range(n)]
    parsed = [parse_packet(p) for p in pkts]
    fs_khz = _BW_KHZ[int(toc_bandwidth(pkts[0][0]))]
    frame_ms = frame_size // 48

    payloads = [p.frames[0] for p in parsed]
    want = _decode_py(payloads, fs_khz, frame_ms)
    nat = host_native.NativeSilkHost()
    got = np.concatenate([nat.decode(pl, fs_khz, frame_ms)
                          for pl in payloads]).astype(np.int64)
    assert got.shape == want.shape
    assert np.array_equal(got, want), \
        f"first diff at {np.argmax(got != want)}"


def test_native_silk_plc_matches_python():
    """Lost frames: native PLC + CNG must be int-exact vs the Python
    decoder's loss path (plc.py/cng.py are already int-exact twins of
    plc.rs/cng.rs)."""
    from mousiki_tpu.bitstream.entcode import RangeDecoder
    from mousiki_tpu.silk.dec_api import DecControl, silk_decode
    from mousiki_tpu.silk.structs import SilkDecoder
    import mousiki_tpu.silk.dec_api as D

    t = np.arange(48000 * 2) / 48000.0
    sig = np.clip(0.4 * np.sin(2 * np.pi * 140 * t)
                  * (1 + 0.4 * np.sin(2 * np.pi * 3 * t))
                  + 0.2 * np.sin(2 * np.pi * 800 * t), -0.9, 0.9)[:, None]
    enc = OpusEncoder(48000, 1, APP_VOIP)
    enc.set_bitrate(24000)
    enc.force_mode = Mode.SILK
    n = 40
    pkts = [enc.encode(sig[f * 960:(f + 1) * 960], 960) for f in range(n)]
    payloads = [parse_packet(p).frames[0] for p in pkts]
    fs_khz = _BW_KHZ[int(toc_bandwidth(pkts[0][0]))]
    lost = np.zeros(n, bool)
    lost[[7, 8, 15, 22, 30]] = True   # incl. a 2-frame burst

    # python reference: raw internal-rate frames (clean + concealed)
    silk = SilkDecoder()
    ctl = DecControl()
    ctl.n_channels_api = 1
    ctl.n_channels_internal = 1
    ctl.api_sample_rate = fs_khz * 1000
    ctl.internal_sample_rate = fs_khz * 1000
    ctl.payload_size_ms = 20
    outs = []
    import mousiki_tpu.silk.plc as P
    orig_glue = P.plc_glue_frames

    # capture AFTER the postamble: CNG and the glue gain-ramp mutate the
    # frame in place after decode_frame returns (glue is the last touch)
    def spy(st, frame, length):
        orig_glue(st, frame, length)
        outs.extend(frame[:length])

    D.plc_glue_frames = spy
    try:
        for f in range(n):
            if lost[f]:
                silk_decode(silk, ctl, 1, True, None)   # FLAG_PACKET_LOST
            else:
                silk_decode(silk, ctl, 0, True, RangeDecoder(payloads[f]))
    finally:
        D.plc_glue_frames = orig_glue
    want = np.asarray(outs, np.int64)

    nat = host_native.NativeSilkHost()
    got = []
    for f in range(n):
        if lost[f]:
            got.append(nat.plc())
        else:
            got.append(nat.decode(payloads[f], fs_khz, 20))
    got = np.concatenate(got).astype(np.int64)
    assert got.shape == want.shape
    assert np.array_equal(got, want), \
        f"first diff at frame {np.argmax(got != want) // (fs_khz * 20)}"
