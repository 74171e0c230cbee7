"""Opus encoder (CELT path) conformance: packets must decode identically in
libopus and our decoder (final-range equality), with quality at parity with
the libopus encoder at the same rate."""

import numpy as np
import pytest

from mousiki_tpu.opus_decoder import OpusDecoder
from mousiki_tpu.opus_encoder import OpusEncoder
from mousiki_tpu.testing import oracle

pytestmark = pytest.mark.skipif(not oracle.available(), reason="oracle missing")


def snr_db(x, y, lag=120):
    a = x[: len(x) - lag]
    b = y[lag: len(x)]
    n = min(len(a), len(b))
    a, b = a[:n].ravel(), b[:n].ravel()
    return 10 * np.log10((a ** 2).mean() / ((a - b) ** 2).mean() + 1e-12)


@pytest.mark.parametrize("channels,frame", [(1, 960), (2, 960), (2, 480), (2, 240)])
def test_encoder_streams_decodable(channels, frame):
    enc = OpusEncoder(48000, channels)
    enc.set_bitrate(64000 * channels)
    mydec = OpusDecoder(48000, channels)
    refdec = oracle.RefDecoder(48000, channels)
    sig = oracle.make_test_signal(frame * 12, channels, seed=21)
    for f in range(10):
        pkt = enc.encode(sig[f * frame:(f + 1) * frame], frame)
        mine = mydec.decode(pkt, frame)
        ref = refdec.decode_float(pkt, frame)
        assert mydec.final_range == refdec.final_range(), f"frame {f}"
        assert enc.final_range == refdec.final_range(), f"enc range frame {f}"
        assert np.abs(mine - ref).max() < 1e-4


def test_encoder_quality_parity():
    """Within 1.5 dB of libopus CELT at the same CBR rate."""
    sig = oracle.make_test_signal(960 * 25, 2, seed=21)
    pcm16 = oracle.float_to_i16(sig)

    oenc = oracle.RefEncoder(48000, 2, oracle.APP_RESTRICTED_LOWDELAY)
    oenc.ctl_set(oracle.SET_BITRATE, 96000)
    oenc.ctl_set(oracle.SET_VBR, 0)
    odec = oracle.RefDecoder(48000, 2)
    ref_out = np.concatenate([
        odec.decode_float(oenc.encode(pcm16[f * 960:(f + 1) * 960].reshape(-1)), 960)
        for f in range(25)])

    enc = OpusEncoder(48000, 2)
    enc.set_bitrate(96000)
    dec = oracle.RefDecoder(48000, 2)
    my_out = np.concatenate([
        dec.decode_float(enc.encode(sig[f * 960:(f + 1) * 960], 960), 960)
        for f in range(25)])

    ref_snr = snr_db(sig, ref_out)
    my_snr = snr_db(sig, my_out)
    assert my_snr > ref_snr - 1.5, f"mine {my_snr:.1f} dB vs libopus {ref_snr:.1f} dB"


def test_encoder_silence():
    enc = OpusEncoder(48000, 2)
    dec = oracle.RefDecoder(48000, 2)
    pkt = enc.encode(np.zeros((960, 2)), 960)
    out = dec.decode_float(pkt, 960)
    assert np.abs(out).max() < 1e-4


def test_silk_encoder_streams_decodable():
    from mousiki_tpu.opus_encoder import APP_VOIP

    t = np.arange(48000) / 48000.0
    sig = np.clip(
        0.4 * np.sin(2 * np.pi * 140 * t) * (1 + 0.4 * np.sin(2 * np.pi * 3 * t))
        + 0.2 * np.sin(2 * np.pi * 800 * t), -0.95, 0.95)[:, None]
    enc = OpusEncoder(48000, 1, APP_VOIP)
    enc.set_bitrate(24000)
    ref = oracle.RefDecoder(48000, 1)
    mydec = OpusDecoder(48000, 1)
    for f in range(15):
        pkt = enc.encode(sig[f * 960:(f + 1) * 960], 960)
        r = ref.decode_float(pkt, 960)
        m = mydec.decode(pkt, 960)
        assert ref.final_range() == mydec.final_range
        assert np.abs(m - r).max() == 0.0


def test_silk_encoder_quality_floor():
    from mousiki_tpu.opus_encoder import APP_VOIP

    t = np.arange(48000) / 48000.0
    sig = np.clip(
        0.4 * np.sin(2 * np.pi * 140 * t) * (1 + 0.4 * np.sin(2 * np.pi * 3 * t))
        + 0.2 * np.sin(2 * np.pi * 800 * t), -0.95, 0.95)[:, None]
    enc = OpusEncoder(48000, 1, APP_VOIP)
    enc.set_bitrate(24000)
    ref = oracle.RefDecoder(48000, 1)
    out = np.concatenate([
        ref.decode_float(enc.encode(sig[f * 960:(f + 1) * 960], 960), 960)
        for f in range(40)])[:, 0]
    a = sig[: len(out), 0]
    best = -99
    for lag in range(0, 500):
        b = out[lag:][: len(a) - lag]
        aa = a[: len(b)]
        best = max(best, 10 * np.log10(
            (aa ** 2).mean() / ((aa - b) ** 2).mean() + 1e-12))
    assert best > 6.0, best


def test_silk_voiced_coding():
    """Periodic input must engage voiced coding (pitch+LTP symbols) and the
    streams must stay bit-exact in libopus; quality well above the unvoiced
    path at a generous rate."""
    from mousiki_tpu.opus_encoder import APP_VOIP

    t = np.arange(48000 * 2) / 48000.0
    sig = np.clip(
        0.5 * np.sin(2 * np.pi * 130 * t) * (1 + 0.3 * np.sin(2 * np.pi * 2 * t)),
        -0.95, 0.95)[:, None]
    from mousiki_tpu.bitstream.packet import Mode
    enc = OpusEncoder(48000, 1, APP_VOIP)
    enc.set_bitrate(48000)
    enc.force_mode = Mode.SILK   # keep SILK-only (int-exact cross-decode)
    ref = oracle.RefDecoder(48000, 1)
    mydec = OpusDecoder(48000, 1)
    voiced_frames = 0
    outs = []
    for f in range(40):
        pkt = enc.encode(sig[f * 960:(f + 1) * 960], 960)
        r = ref.decode_float(pkt, 960)
        m = mydec.decode(pkt, 960)
        assert ref.final_range() == mydec.final_range
        assert np.abs(m - r).max() == 0.0
        if enc.silk.mirror.indices.signal_type == 2:
            voiced_frames += 1
        outs.append(r)
    assert voiced_frames > 20, f"only {voiced_frames} voiced frames"
    out = np.concatenate(outs)[:, 0]
    a = sig[: len(out), 0]
    best = -99
    for lag in range(0, 500):
        b = out[lag:][: len(a) - lag]
        aa = a[: len(b)]
        best = max(best, 10 * np.log10(
            (aa ** 2).mean() / ((aa - b) ** 2).mean() + 1e-12))
    assert best > 12.0, best


def test_hybrid_encoder():
    """Hybrid (SILK WB + CELT high bands, one range coder): streams must be
    bit-exact in libopus; HF content must survive (CELT part active)."""
    from mousiki_tpu.opus_encoder import APP_VOIP

    rng = np.random.default_rng(5)
    t = np.arange(48000 * 2) / 48000.0
    sig = np.clip(
        0.4 * np.sin(2 * np.pi * 140 * t) * (1 + 0.4 * np.sin(2 * np.pi * 3 * t))
        + 0.15 * np.sin(2 * np.pi * 10000 * t), -0.95, 0.95)[:, None]
    enc = OpusEncoder(48000, 1, APP_VOIP)
    enc.set_bitrate(48000)   # VOIP >= 32k auto-selects hybrid
    ref = oracle.RefDecoder(48000, 1)
    mydec = OpusDecoder(48000, 1)
    outs = []
    for f in range(30):
        pkt = enc.encode(sig[f * 960:(f + 1) * 960], 960)
        assert pkt[0] >> 3 in (12, 13, 14, 15), "not a hybrid TOC"
        r = ref.decode_float(pkt, 960)
        m = mydec.decode(pkt, 960)
        assert ref.final_range() == mydec.final_range
        assert np.abs(m - r).max() < 1e-5
        outs.append(r)
    out = np.concatenate(outs)[:, 0]
    # HF energy (>9 kHz) present in the decode at a sane level
    spec_in = np.abs(np.fft.rfft(sig[:len(out), 0]))
    spec_out = np.abs(np.fft.rfft(out))
    hf = slice(int(9500 * len(out) / 48000), int(10500 * len(out) / 48000))
    assert spec_out[hf].max() > 0.1 * spec_in[hf].max()
    # overall quality floor
    a = sig[: len(out), 0]
    best = -99
    for lag in range(0, 600):
        b = out[lag:][: len(a) - lag]
        aa = a[: len(b)]
        best = max(best, 10 * np.log10(
            (aa ** 2).mean() / ((aa - b) ** 2).mean() + 1e-12))
    assert best > 8.0, best


def test_silk_stereo_encoder():
    """Stereo SILK (LR->MS + quantized predictors): bit-exact cross-decode
    and a stereo-image quality floor."""
    from mousiki_tpu.opus_encoder import APP_VOIP

    t = np.arange(48000 * 2) / 48000.0
    L = np.clip(0.4 * np.sin(2 * np.pi * 140 * t)
                * (1 + 0.4 * np.sin(2 * np.pi * 3 * t)), -0.95, 0.95)
    R = np.clip(0.3 * np.sin(2 * np.pi * 140 * t + 0.7)
                * (1 + 0.4 * np.sin(2 * np.pi * 3 * t))
                + 0.1 * np.sin(2 * np.pi * 500 * t), -0.95, 0.95)
    sig = np.stack([L, R], 1)
    enc = OpusEncoder(48000, 2, APP_VOIP)
    enc.set_bitrate(40000)
    ref = oracle.RefDecoder(48000, 2)
    mydec = OpusDecoder(48000, 2)
    outs = []
    for f in range(30):
        pkt = enc.encode(sig[f * 960:(f + 1) * 960], 960)
        assert pkt[0] & 0x4, "stereo flag missing in TOC"
        r = ref.decode_float(pkt, 960)
        m = mydec.decode(pkt, 960)
        assert ref.final_range() == mydec.final_range
        assert np.abs(m - r).max() == 0.0
        outs.append(r)
    out = np.concatenate(outs)
    a = sig[: len(out)]
    best = -99
    for lag in range(0, 600):
        b = out[lag:][: len(a) - lag]
        aa = a[: len(b)]
        best = max(best, 10 * np.log10(
            (aa ** 2).mean() / ((aa - b) ** 2).mean() + 1e-12))
    assert best > 10.0, best


@pytest.mark.parametrize("frame_size,channels", [(1920, 1), (2880, 1), (1920, 2)])
def test_silk_multiframe_packets(frame_size, channels):
    """40/60 ms SILK packets: multi-frame payloads with conditional coding
    (delta gains, delta pitch lags) must stay bit-exact in libopus."""
    from mousiki_tpu.bitstream.packet import Mode
    from mousiki_tpu.opus_encoder import APP_VOIP

    t = np.arange(48000 * 2) / 48000.0
    base = 0.4 * np.sin(2 * np.pi * 140 * t) * (1 + 0.4 * np.sin(2 * np.pi * 3 * t))
    if channels == 1:
        sig = np.clip(base + 0.2 * np.sin(2 * np.pi * 800 * t), -0.95, 0.95)[:, None]
    else:
        sig = np.stack([np.clip(base, -0.95, 0.95),
                        np.clip(0.3 * np.sin(2 * np.pi * 140 * t + 0.7), -0.95, 0.95)], 1)
    enc = OpusEncoder(48000, channels, APP_VOIP)
    enc.set_bitrate(24000 * channels)
    enc.force_mode = Mode.SILK
    ref = oracle.RefDecoder(48000, channels)
    mydec = OpusDecoder(48000, channels)
    for f in range((48000 * 2) // frame_size):
        pkt = enc.encode(sig[f * frame_size:(f + 1) * frame_size], frame_size)
        r = ref.decode_float(pkt, frame_size)
        m = mydec.decode(pkt, frame_size)
        assert ref.final_range() == mydec.final_range
        assert np.abs(m - r).max() == 0.0


def test_silk_fec_lbrr():
    """In-band FEC: LBRR frames ride the next packet, streams stay
    bit-exact, and FEC recovery beats PLC under loss."""
    import random
    from mousiki_tpu.bitstream.packet import Mode
    from mousiki_tpu.opus_encoder import APP_VOIP

    t = np.arange(48000 * 2) / 48000.0
    sig = np.clip(0.4 * np.sin(2 * np.pi * 150 * t)
                  * (1 + 0.4 * np.sin(2 * np.pi * 3 * t)), -0.9, 0.9)[:, None]
    enc = OpusEncoder(48000, 1, APP_VOIP)
    enc.set_bitrate(24000)
    enc.force_mode = Mode.SILK
    enc.inband_fec = True
    enc.packet_loss_perc = 20
    ref = oracle.RefDecoder(48000, 1)
    mydec = OpusDecoder(48000, 1)
    pkts = []
    for f in range(30):
        pkt = enc.encode(sig[f * 960:(f + 1) * 960], 960)
        pkts.append(pkt)
        r = ref.decode_float(pkt, 960)
        m = mydec.decode(pkt, 960)
        assert ref.final_range() == mydec.final_range
        assert np.abs(m - r).max() == 0.0
    # FEC decode parity with libopus
    ref2 = oracle.RefDecoder(48000, 1)
    my2 = OpusDecoder(48000, 1)
    for f in range(10):
        ref2.decode_float(pkts[f], 960)
        my2.decode(pkts[f], 960)
    fr = ref2.decode_float(pkts[11], 960, fec=1)
    fm = my2.decode(pkts[11], 960, decode_fec=True)
    assert np.abs(fm - fr).max() == 0.0


def test_dtx():
    """DTX: sustained silence produces TOC-only packets with periodic
    refresh; the decoder survives them."""
    from mousiki_tpu.opus_encoder import APP_VOIP

    enc = OpusEncoder(48000, 1, APP_VOIP)
    enc.set_bitrate(24000)
    enc.dtx = True
    dec = OpusDecoder(48000, 1)
    sizes = []
    for _ in range(25):
        pkt = enc.encode(np.zeros((960, 1)), 960)
        sizes.append(len(pkt))
        out = dec.decode(pkt, 960)
        assert np.abs(out).max() < 0.01
    assert sizes.count(1) >= 18          # mostly TOC-only
    assert any(s > 1 for s in sizes[3:])  # periodic refresh


def test_hybrid_stereo_encoder():
    """Stereo hybrid: SILK mid/side + CELT stereo high bands, range-exact."""
    from mousiki_tpu.opus_encoder import APP_VOIP

    t = np.arange(48000 * 2) / 48000.0
    L = np.clip(0.4 * np.sin(2 * np.pi * 140 * t)
                * (1 + 0.4 * np.sin(2 * np.pi * 3 * t))
                + 0.1 * np.sin(2 * np.pi * 10000 * t), -0.95, 0.95)
    R = np.clip(0.3 * np.sin(2 * np.pi * 140 * t + 0.7)
                + 0.1 * np.sin(2 * np.pi * 9000 * t), -0.95, 0.95)
    sig = np.stack([L, R], 1)
    enc = OpusEncoder(48000, 2, APP_VOIP)
    enc.set_bitrate(80000)
    ref = oracle.RefDecoder(48000, 2)
    mydec = OpusDecoder(48000, 2)
    outs = []
    for f in range(25):
        pkt = enc.encode(sig[f * 960:(f + 1) * 960], 960)
        assert (pkt[0] >> 3) in (12, 13, 14, 15) and (pkt[0] & 0x4)
        r = ref.decode_float(pkt, 960)
        m = mydec.decode(pkt, 960)
        assert ref.final_range() == mydec.final_range
        assert np.abs(m - r).max() < 1e-5
        outs.append(r)
    out = np.concatenate(outs)
    a = sig[: len(out)]
    best = -99
    for lag in range(0, 600):
        b = out[lag:][: len(a) - lag]
        aa = a[: len(b)]
        best = max(best, 10 * np.log10(
            (aa ** 2).mean() / ((aa - b) ** 2).mean() + 1e-12))
    assert best > 12.0, best


@pytest.mark.parametrize("frame_size", [3840, 4800, 5760])
def test_long_packets_via_repacketizer(frame_size):
    """80/100/120 ms packets (code 3 merge): decode exactly in libopus."""
    t = np.arange(48000 * 2) / 48000.0
    sig = np.stack([np.clip(0.4 * np.sin(2 * np.pi * 330 * t), -0.9, 0.9)] * 2, 1)
    enc = OpusEncoder(48000, 2)
    enc.set_bitrate(96000)
    ref = oracle.RefDecoder(48000, 2)
    mydec = OpusDecoder(48000, 2)
    for f in range((48000 * 2) // frame_size):
        pkt = enc.encode(sig[f * frame_size:(f + 1) * frame_size], frame_size)
        r = ref.decode_float(pkt, frame_size)
        m = mydec.decode(pkt, frame_size)
        assert ref.final_range() == mydec.final_range
        assert np.abs(m - r).max() < 2e-4


def test_hp_filter_tracks_and_rejects_dc():
    """VOIP input HP: DC offset removed, cutoff tracks voiced pitch
    (opus_encoder.rs hp_cutoff + silk/hp_variable_cutoff.rs)."""
    from mousiki_tpu.hp_filter import HighPassState, dc_reject, hp_cutoff

    # dc_reject closed form == reference recurrence
    rng = np.random.default_rng(7)
    x = rng.standard_normal((960, 2))
    mem = np.zeros(4)
    mem[0], mem[2] = 0.3, -0.2
    got = dc_reject(x, 3, mem, 48000)
    coef, coef2 = 6.3 * 3 / 48000, 1 - 6.3 * 3 / 48000
    m = [0.3, -0.2]
    want = np.empty_like(x)
    for i in range(960):
        for c in range(2):
            want[i, c] = x[i, c] - m[c]
            m[c] = coef * x[i, c] + coef2 * m[c]
    assert np.abs(got - want).max() < 1e-12
    assert abs(mem[0] - m[0]) < 1e-12 and abs(mem[2] - m[1]) < 1e-12

    # variable HP: strong attenuation at 20 Hz, transparent at 1 kHz
    t = np.arange(48000) / 48000.0
    memf = np.zeros(4)
    lo = hp_cutoff(np.sin(2 * np.pi * 20 * t)[:, None], 100, memf, 48000)
    memf = np.zeros(4)
    hi = hp_cutoff(np.sin(2 * np.pi * 1000 * t)[:, None], 100, memf, 48000)
    assert np.sqrt((lo[24000:] ** 2).mean() * 2) < 0.1
    assert abs(np.sqrt((hi[24000:] ** 2).mean() * 2) - 1.0) < 0.01

    # cutoff tracker: voiced 300 Hz pitch pulls the corner above 60 Hz
    st = HighPassState()
    assert st.cutoff_hz() == 60
    for _ in range(50):
        st.update_from_silk(2, 16000 // 300, 16)
    for _ in range(300):
        cut = st.cutoff_hz()
    assert 70 <= cut <= 100


def test_encoder_hp_removes_dc_end_to_end():
    """A DC-offset voiced signal encoded at VOIP should decode (in libopus)
    with the DC gone and the tone intact."""
    from mousiki_tpu.bitstream.packet import Mode
    from mousiki_tpu.opus_encoder import APP_VOIP
    t = np.arange(48000) / 48000.0
    sig = (0.25 + 0.3 * np.sin(2 * np.pi * 220 * t))[:, None]
    enc = OpusEncoder(48000, 1, APP_VOIP)
    enc.set_bitrate(24000)
    enc.force_mode = Mode.SILK
    dec = oracle.RefDecoder(48000, 1)
    out = np.concatenate(
        [dec.decode_float(enc.encode(sig[f * 960:(f + 1) * 960], 960), 960)
         for f in range(50)])[:, 0]
    tail = out[24000:]
    assert abs(tail.mean()) < 0.02, tail.mean()        # DC rejected
    assert np.sqrt((tail - tail.mean()) @ (tail - tail.mean())
                   / len(tail)) > 0.1                  # tone survived


def test_bandwidth_transition_lp_ramp():
    """Dropping the bitrate mid-stream triggers the LP down-switch ramp:
    the bandwidth holds while the variable cutoff narrows, then switches
    (silk/control_audio_bandwidth.rs + lp_variable_cutoff.rs). Packets stay
    libopus-decodable throughout."""
    from mousiki_tpu.bitstream.packet import Mode, toc_bandwidth
    from mousiki_tpu.opus_encoder import APP_VOIP
    from mousiki_tpu.silk.lp_filter import TRANSITION_FRAMES

    t = np.arange(48000 * 4) / 48000.0
    sig = np.clip(0.4 * np.sin(2 * np.pi * 150 * t)
                  * (1 + 0.3 * np.sin(2 * np.pi * 3 * t)), -0.9, 0.9)[:, None]
    enc = OpusEncoder(48000, 1, APP_VOIP)
    enc.force_mode = Mode.SILK
    enc.set_bitrate(24000)  # WB
    dec = oracle.RefDecoder(48000, 1)
    bws = []
    for f in range(160):
        if f == 20:
            enc.set_bitrate(9000)  # desired NB
        pkt = enc.encode(sig[f * 960:(f + 1) * 960], 960)
        bws.append(int(toc_bandwidth(pkt[0])))
        dec.decode(pkt, 960)  # must stay decodable
    assert bws[19] == 1103  # WB before the drop
    # ramp holds WB for TRANSITION_FRAMES//2 frames, then switches to NB
    hold = TRANSITION_FRAMES // 2
    assert all(b == 1103 for b in bws[20: 20 + hold - 1])
    assert bws[22 + hold] == 1101
    assert enc.silk.lp.mode == 0


@pytest.mark.parametrize("fs,app", [
    (8000, oracle.APP_VOIP), (12000, oracle.APP_VOIP),
    (16000, oracle.APP_VOIP), (24000, oracle.APP_VOIP),
    (16000, oracle.APP_RESTRICTED_LOWDELAY),
    (24000, oracle.APP_RESTRICTED_LOWDELAY),
])
def test_encoder_api_rates(fs, app):
    """Non-48k API input: packets decode in libopus with sensible quality.

    Reference: opus_encoder.rs accepts 8/12/16/24/48 kHz API rates; our
    core runs at 48 kHz behind the Kaiser input resampler."""
    frame = fs // 50  # 20 ms
    enc = OpusEncoder(fs, 1, app)
    enc.set_bitrate(32000)
    refdec = oracle.RefDecoder(fs, 1)
    t = np.arange(frame * 30) / fs
    sig = (0.4 * np.sin(2 * np.pi * 440 * t)
           + 0.2 * np.sin(2 * np.pi * 880 * t)).astype(np.float32)[:, None]
    outs = []
    for f in range(30):
        pkt = enc.encode(sig[f * frame:(f + 1) * frame], frame)
        assert len(pkt) >= 1
        outs.append(refdec.decode_float(pkt, frame))
    got = np.concatenate(outs).ravel()
    # search alignment (resampler + codec delay), then gate SNR
    ref = sig.ravel()
    best = -99.0
    for lag in range(0, fs // 10):
        n = min(len(ref) - lag, len(got) - frame)
        a = ref[: n]
        b = got[lag: lag + n]
        best = max(best, 10 * np.log10(
            (a ** 2).mean() / ((a - b) ** 2).mean() + 1e-12))
    assert best > 8.0, (fs, app, best)


def test_encoder_int_wrappers_api_rate():
    """encode_int16/encode_int24 work at non-48k rates too."""
    enc = OpusEncoder(16000, 1, oracle.APP_VOIP)
    enc.set_bitrate(24000)
    rng = np.random.default_rng(0)
    pcm16 = (rng.standard_normal((320, 1)) * 3000).astype(np.int16)
    pkt = enc.encode_int16(pcm16, 320)
    assert len(pkt) > 1
    pkt = enc.encode_int24((pcm16.astype(np.int32) << 8), 320)
    assert len(pkt) > 1
