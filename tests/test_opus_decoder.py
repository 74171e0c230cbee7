"""Full Opus decoder differential tests vs libopus (SILK/CELT/hybrid modes,
frame sizes, API rates, transitions, PLC/FEC) — the test_opus_decode
strategy of SURVEY.md §4.2 run live against the oracle."""

import numpy as np
import pytest

from mousiki_tpu.opus_decoder import OpusDecoder
from mousiki_tpu.testing import oracle

pytestmark = pytest.mark.skipif(not oracle.available(), reason="libopus oracle missing")


def run_case(ch, bw, mode, br, frame, nf=8, fs_api=48000, exact=True, seed=5):
    enc = oracle.RefEncoder(48000, ch, oracle.APP_VOIP)
    enc.ctl_set(oracle.SET_BITRATE, br)
    if mode:
        enc.ctl_set(oracle.SET_FORCE_MODE, mode)
    if bw:
        enc.ctl_set(oracle.SET_BANDWIDTH, bw)
    ref = oracle.RefDecoder(fs_api, ch)
    dec = OpusDecoder(fs_api, ch)
    sig = oracle.make_test_signal(frame * (nf + 1), ch, seed=seed)
    pcm16 = oracle.float_to_i16(sig)
    out_n = frame * fs_api // 48000
    for f in range(nf):
        pkt = enc.encode(pcm16[f * frame:(f + 1) * frame].reshape(-1))
        r = ref.decode_float(pkt, out_n)
        m = dec.decode(pkt, out_n)
        assert ref.final_range() == dec.final_range, f"range desync frame {f}"
        err = np.abs(m - r).max()
        if exact:
            assert err == 0.0, f"frame {f}: err {err}"
        else:
            assert err < 5e-5, f"frame {f}: err {err}"


@pytest.mark.parametrize("bw,br", [
    (oracle.BANDWIDTH_NARROWBAND, 16000),
    (oracle.BANDWIDTH_MEDIUMBAND, 20000),
    (oracle.BANDWIDTH_WIDEBAND, 24000),
])
def test_silk_mono_bandwidths(bw, br):
    run_case(1, bw, oracle.MODE_SILK_ONLY, br, 960)


def test_silk_stereo():
    run_case(2, oracle.BANDWIDTH_WIDEBAND, oracle.MODE_SILK_ONLY, 32000, 960)


@pytest.mark.parametrize("frame", [480, 1920, 2880])
def test_silk_frame_sizes(frame):
    run_case(1, oracle.BANDWIDTH_WIDEBAND, oracle.MODE_SILK_ONLY, 24000, frame)


@pytest.mark.parametrize("fs_api", [8000, 16000, 24000])
def test_silk_api_rates(fs_api):
    run_case(1, oracle.BANDWIDTH_WIDEBAND, oracle.MODE_SILK_ONLY, 24000, 960,
             fs_api=fs_api)


@pytest.mark.parametrize("ch,bw,br", [
    (1, oracle.BANDWIDTH_SUPERWIDEBAND, 32000),
    (2, oracle.BANDWIDTH_FULLBAND, 64000),
])
def test_hybrid(ch, bw, br):
    run_case(ch, bw, oracle.MODE_HYBRID, br, 960, exact=False)


def test_mode_transitions():
    """Switch SILK -> CELT -> hybrid -> SILK mid-stream (transition paths)."""
    enc = oracle.RefEncoder(48000, 1, oracle.APP_AUDIO)
    ref = oracle.RefDecoder(48000, 1)
    dec = OpusDecoder(48000, 1)
    sig = oracle.make_test_signal(960 * 25, 1, seed=11)
    pcm16 = oracle.float_to_i16(sig)
    plan = ([(oracle.MODE_SILK_ONLY, oracle.BANDWIDTH_WIDEBAND, 24000)] * 5
            + [(oracle.MODE_CELT_ONLY, oracle.BANDWIDTH_FULLBAND, 64000)] * 5
            + [(oracle.MODE_HYBRID, oracle.BANDWIDTH_FULLBAND, 40000)] * 5
            + [(oracle.MODE_SILK_ONLY, oracle.BANDWIDTH_NARROWBAND, 12000)] * 5)
    for f, (mode, bw, br) in enumerate(plan):
        enc.ctl_set(oracle.SET_FORCE_MODE, mode)
        enc.ctl_set(oracle.SET_BANDWIDTH, bw)
        enc.ctl_set(oracle.SET_BITRATE, br)
        pkt = enc.encode(pcm16[f * 960:(f + 1) * 960].reshape(-1))
        r = ref.decode_float(pkt, 960)
        m = dec.decode(pkt, 960)
        assert ref.final_range() == dec.final_range, f"range desync frame {f}"
        assert np.abs(m - r).max() < 5e-5, f"frame {f}"


def test_plc_and_fec():
    """Drop packets; compare PLC output and FEC recovery vs libopus."""
    enc = oracle.RefEncoder(48000, 1, oracle.APP_VOIP)
    enc.ctl_set(oracle.SET_BITRATE, 24000)
    enc.ctl_set(oracle.SET_FORCE_MODE, oracle.MODE_SILK_ONLY)
    enc.ctl_set(oracle.SET_BANDWIDTH, oracle.BANDWIDTH_WIDEBAND)
    enc.ctl_set(oracle.SET_INBAND_FEC, 1)
    enc.ctl_set(oracle.SET_PACKET_LOSS_PERC, 20)
    ref = oracle.RefDecoder(48000, 1)
    dec = OpusDecoder(48000, 1)
    sig = oracle.make_test_signal(960 * 22, 1, seed=13)
    pcm16 = oracle.float_to_i16(sig)
    pkts = [enc.encode(pcm16[f * 960:(f + 1) * 960].reshape(-1)) for f in range(20)]
    lost = {5, 6, 11}
    for f, pkt in enumerate(pkts):
        if f in lost:
            if f + 1 not in lost and f + 1 < len(pkts):
                # FEC recovery from next packet
                r = ref.decode_float(pkts[f + 1], 960, fec=1)
                m = dec.decode(pkts[f + 1], 960, decode_fec=True)
            else:
                r = ref.decode_float(None, 960)
                m = dec.decode(None, 960)
        else:
            r = ref.decode_float(pkt, 960)
            m = dec.decode(pkt, 960)
        assert np.abs(m - r).max() < 5e-5, f"frame {f}: {np.abs(m-r).max()}"


def test_celt_plc_quality():
    """Pitch-based CELT PLC: under 15% random loss on tonal content the
    concealed stream must stay close to the original and never blow up."""
    import random

    enc = oracle.RefEncoder(48000, 1, oracle.APP_RESTRICTED_LOWDELAY)
    enc.ctl_set(oracle.SET_BITRATE, 64000)
    t = np.arange(48000 * 2) / 48000.0
    sig = np.clip(0.5 * np.sin(2 * np.pi * 220 * t)
                  * (1 + 0.3 * np.sin(2 * np.pi * 2 * t)), -0.9, 0.9
                  ).astype(np.float32)[:, None]
    p16 = oracle.float_to_i16(sig)
    pkts = [enc.encode(p16[f * 960:(f + 1) * 960].reshape(-1), 960)
            for f in range(100)]
    rng = random.Random(3)
    dec = OpusDecoder(48000, 1)
    out = np.concatenate([
        dec.decode(None if rng.random() < 0.15 else pkt, 960)
        for pkt in pkts])[:, 0]
    assert np.abs(out).max() < 1.5  # no blowup
    a = sig[: len(out), 0]
    best = -99
    for lag in range(0, 400):
        b = out[lag:][: len(a) - lag]
        aa = a[: len(b)]
        best = max(best, 10 * np.log10(
            (aa ** 2).mean() / ((aa - b) ** 2).mean() + 1e-12))
    assert best > 15.0, best
