"""SILK encoder analysis stack (silk/enc_analysis.py): burg LPC, 3-stage
pitch search, LTP fitting. Reference behavior: burg_modified_flp.rs,
pitch_analysis_core_flp.rs, quant_ltp_gains.rs."""

import math

import numpy as np
import pytest

from mousiki_tpu.silk import enc_analysis as EA


def test_burg_first_order_matches_reference_constants():
    # burg_modified_flp.rs test vectors
    a = np.zeros(1)
    x = np.array([1.0, 0.5, 0.25], np.float32)
    a, res = EA.burg_modified(x, 0.1, 3, 1, 1)
    assert abs(a[0] - 0.7999866) < 1e-5
    assert abs(res - 0.11248992) < 1e-6


def test_burg_clamps_prediction_gain():
    x = np.array([1.0, 0.5, 0.25], np.float32)
    a, res = EA.burg_modified(x, 0.9, 3, 1, 1)
    assert abs(a[0] - 0.31622776) < 1e-5
    assert abs(res - 0.28125) < 1e-6


def test_burg_recovers_ar2_process():
    rng = np.random.default_rng(7)
    n = 320
    x = np.zeros(n + 16)
    e = rng.standard_normal(n + 16)
    for i in range(2, n + 16):
        x[i] = 1.2 * x[i - 1] - 0.7 * x[i - 2] + 0.1 * e[i]
    a, _ = EA.burg_modified(x[16:], 1e-4, 80, 4, 2)
    assert abs(a[0] - 1.2) < 0.05
    assert abs(a[1] + 0.7) < 0.05


@pytest.mark.parametrize("fs_khz", [8, 12, 16])
def test_pitch_analysis_finds_period(fs_khz):
    # 200 Hz glottal-ish train at the internal rate; core should lock to
    # the period within one contour step
    period = fs_khz * 5  # 200 Hz
    n = (20 + 20) * fs_khz
    t = np.arange(n)
    x = 3000.0 * ((t % period) < 3).astype(np.float64)
    x += 10.0 * np.random.default_rng(0).standard_normal(n)
    found, pitch_l, lag_ix, cont_ix, corr = EA.pitch_analysis_core(
        x, 0, 0.7, 0.3, fs_khz, 2, 4, 0.0)
    assert found == 0
    for p in pitch_l:
        assert abs(p - period) <= max(3, period * 0.03), (p, period)
    assert corr > 0.6


def test_find_pitch_lags_unvoiced_on_noise():
    fs = 16
    n = 40 * fs
    x = 500.0 * np.random.default_rng(3).standard_normal(n)
    res, voiced, pitch_l, *_ = EA.find_pitch_lags(
        x, 20 * fs, fs, 4, prev_lag=0, prev_signal_type_voiced=False,
        ltp_corr_prev=0.0, speech_activity=1.0)
    assert not voiced
    assert len(res) == n


def test_quant_ltp_gains_picks_matching_vector():
    # Build XX/xX for a known 5-tap response near a codebook vector: the
    # RD search should achieve low residual energy
    rng = np.random.default_rng(1)
    XX = np.zeros((4, 5, 5))
    xX = np.zeros((4, 5))
    from mousiki_tpu.silk import tables as T
    cb = np.asarray(T.SILK_LTP_VQ_PTRS_Q14[1], np.float64) / 128.0
    target = cb[4]
    for k in range(4):
        M = rng.standard_normal((5, 80))
        XXk = M @ M.T / 80.0
        XX[k] = XXk * 0.01
        xX[k] = XX[k] @ target
    b, idxs, per, slg, gain_db = EA.quant_ltp_gains(XX, xX, 80, 4, 0)
    # residual 1.001 + b XX b - 2 b xX minimized near b = target
    for k in range(4):
        r_chosen = 1.001 + b[k] @ XX[k] @ b[k] - 2.0 * b[k] @ xX[k]
        r_zero = 1.001
        assert r_chosen <= r_zero + 1e-9


def test_ltp_analysis_filter_whitens_periodic_residual():
    fs = 16
    sub = 5 * fs
    ltp_mem = 20 * fs
    n = ltp_mem + 4 * sub
    period = 100
    rng = np.random.default_rng(5)
    base = rng.standard_normal(period)
    x = np.tile(base, n // period + 1)[:n] * 1000.0
    b = np.zeros((4, 5))
    b[:, 2] = 1.0  # pure single-tap predictor at the lag
    out = EA.ltp_analysis_filter(x, ltp_mem - 16, b, [period] * 4,
                                 [1.0] * 4, sub, 4, 16)
    # perfectly periodic signal + correct lag => residual ~ 0
    assert np.abs(out).max() < 1e-6 * np.abs(x).max() + 1e-9


def test_residual_energy_scales_with_gains():
    rng = np.random.default_rng(2)
    sub, order = 80, 16
    x_pre = rng.standard_normal(4 * (sub + order))
    a = rng.standard_normal(order) * 0.01
    n1 = EA.residual_energy(x_pre, [a, a], [1.0, 1.0, 1.0, 1.0], sub, 4,
                            order)
    n2 = EA.residual_energy(x_pre, [a, a], [2.0, 2.0, 2.0, 2.0], sub, 4,
                            order)
    assert np.allclose(n2, 4.0 * n1)


def test_encoder_shaping_path_roundtrip_quality():
    """End-to-end: the reference-analysis + noise-shaping encoder path
    produces valid SILK streams whose decode tracks the input."""
    from mousiki_tpu.opus_decoder import OpusDecoder
    from mousiki_tpu.opus_encoder import APP_VOIP, OpusEncoder
    from mousiki_tpu.bitstream.packet import Mode

    t = np.arange(48000) / 48000.0
    f0 = 150 + 20 * np.sin(2 * np.pi * 0.9 * t)
    sig = (0.3 * np.sign(np.sin(2 * np.pi * np.cumsum(f0) / 48000))
           * np.exp(-2 * ((t * 5) % 1))).astype(np.float32)
    enc = OpusEncoder(48000, 1, APP_VOIP)
    enc.set_bitrate(16000)
    enc.force_mode = Mode.SILK
    enc.silk.use_nsq_shaping = True
    dec = OpusDecoder(48000, 1)
    outs = []
    for f in range(50):
        pkt = enc.encode(sig[f * 960:(f + 1) * 960][:, None], 960)
        outs.append(dec.decode(pkt, 960))
    out = np.concatenate(outs).ravel()
    e_in = float(np.sqrt((sig[: 50 * 960] ** 2).mean()))
    e_out = float(np.sqrt((out ** 2).mean()))
    assert 0.5 * e_in < e_out < 2.0 * e_in
