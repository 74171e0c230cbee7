"""SILK encoder (mono, 10/20 ms): produces valid SILK streams.

Parity scope this round: the normative symbol writers (gains_quant, NLSF
stage-1/2 encode, encode_indices, encode_pulses incl. shell coder and LSB
escapes) mirror libopus exactly, so every stream decodes bit-consistently
in libopus and our decoder. The analysis side (LPC estimation, gain
selection, excitation quantization) is a float/greedy implementation:
unvoiced-style coding without LTP — valid and reasonable; the NSQ
delayed-decision quantizer and pitch/LTP path are the next quality step
(reference src/silk/{nsq,nsq_del_dec,pitch_analysis_core}.rs [HOT]).
"""

from __future__ import annotations

import math

import numpy as np

from . import tables as T
from .dec_api import DecCtrl
from .decode_core import silk_rand
from .decode_indices import nlsf_unpack
from .decode_params import (INV_SCALE_Q16, N_LEVELS_QGAIN,
                            NLSF_QUANT_LEVEL_ADJ_Q10, OFFSET_GQ,
                            nlsf_stabilize, nlsf2a)
from .decode_pulses import (LOG2_SHELL_CODEC_FRAME_LENGTH, N_RATE_LEVELS,
                            SHELL_CODEC_FRAME_LENGTH, SILK_MAX_PULSES)
from .fixed_math import (i16, i32, sat16, silk_log2lin, silk_lin2log, smulbb,
                         smulwb)
from .structs import (NLSF_CB_NB_MB, NLSF_CB_WB, TYPE_UNVOICED)

SCALE_Q16 = (65536 * (N_LEVELS_QGAIN - 1)) // (((88 - 2) * 128) // 6)
QUANT_LEVEL_ADJUST_Q10 = 80


class _BudgetExceeded(Exception):
    """Raised when an encode attempt would overflow the byte budget."""


def gains_quant(gains_q16, prev_ind, conditional, nb_subfr):
    """Quantize subframe gains; returns (indices, dequant gains, prev_ind)."""
    ind = [0] * nb_subfr
    out = [0] * nb_subfr
    for k in range(nb_subfr):
        ind[k] = smulwb(SCALE_Q16, silk_lin2log(gains_q16[k]) - OFFSET_GQ)
        if ind[k] < prev_ind:
            ind[k] += 1
        ind[k] = max(0, min(N_LEVELS_QGAIN - 1, ind[k]))
        if k == 0 and not conditional:
            ind[k] = max(min(ind[k], N_LEVELS_QGAIN - 1),
                         prev_ind + T.MIN_DELTA_GAIN_QUANT)
            ind[k] = max(ind[k], prev_ind - 16)
            prev_ind = ind[k]
        else:
            ind[k] = ind[k] - prev_ind
            double_step = 2 * T.MAX_DELTA_GAIN_QUANT - N_LEVELS_QGAIN + prev_ind
            if ind[k] > double_step:
                ind[k] = double_step + ((ind[k] - double_step + 1) >> 1)
            ind[k] = max(T.MIN_DELTA_GAIN_QUANT,
                         min(T.MAX_DELTA_GAIN_QUANT, ind[k]))
            if ind[k] > double_step:
                prev_ind += (ind[k] << 1) - double_step
                prev_ind = min(prev_ind, N_LEVELS_QGAIN - 1)
            else:
                prev_ind += ind[k]
            ind[k] -= T.MIN_DELTA_GAIN_QUANT
        out[k] = silk_log2lin(min(smulwb(INV_SCALE_Q16, prev_ind) + OFFSET_GQ,
                                  3967))
    return ind, out, prev_ind


def nlsf_encode(nlsf_q15, cb, signal_type):
    """Stage-1 weighted NN search + greedy stage-2 residual quantization.

    Returns (indices list [stage1, res...], coded nlsf_q15)."""
    order = cb.order
    half = (1 if signal_type == 2 else 0) * cb.n_vectors
    # stage 1: nearest codebook vector (weighted squared error)
    best_i1 = 0
    best_err = None
    for i1 in range(cb.n_vectors):
        base = i1 * order
        err = 0.0
        for i in range(order):
            d = (nlsf_q15[i] - (cb.cb1_nlsf_q8[base + i] << 7)) / 32768.0
            err += d * d * cb.cb1_wght_q9[base + i]
        if best_err is None or err < best_err:
            best_err = err
            best_i1 = i1
    ec_ix, pred_q8 = nlsf_unpack(cb, best_i1)
    base = best_i1 * order
    # residual targets in Q10 of the weighted domain
    targets = [0.0] * order
    for i in range(order):
        w = cb.cb1_wght_q9[base + i]
        targets[i] = ((nlsf_q15[i] - (cb.cb1_nlsf_q8[base + i] << 7)) * w) / (1 << 14)
    # greedy backward quantization mirroring the decoder recursion
    indices = [0] * order
    out_q10 = 0
    for i in range(order - 1, -1, -1):
        pred_q10 = smulbb(out_q10, pred_q8[i]) >> 8
        best = None
        for cand in range(-10, 11):
            v = i16(cand << 10)
            if v > 0:
                v = i16(v - NLSF_QUANT_LEVEL_ADJ_Q10)
            elif v < 0:
                v = i16(v + NLSF_QUANT_LEVEL_ADJ_Q10)
            # decoder: out = smlawb(pred, v, step_q16) = pred + (v*step)>>16
            recon = pred_q10 + ((v * cb.quant_step_size_q16) >> 16)
            e = abs(recon - targets[i])
            if best is None or e < best[0]:
                best = (e, cand)
        indices[i] = best[1]
        # propagate the decoder-exact reconstruction
        v = i16(indices[i] << 10)
        if v > 0:
            v = i16(v - NLSF_QUANT_LEVEL_ADJ_Q10)
        elif v < 0:
            v = i16(v + NLSF_QUANT_LEVEL_ADJ_Q10)
        out_q10 = i16(pred_q10 + ((v * cb.quant_step_size_q16) >> 16))
    from .decode_params import nlsf_decode
    coded = nlsf_decode([best_i1] + indices, cb)
    return [best_i1] + indices, coded


def encode_indices(st_like, enc, ix, cond_coding, pitch_contour_icdf=None,
                   pitch_low_icdf=None):
    """Mirror of decode_indices for the symbol stream."""
    # signal type / quant offset
    typ = (ix.signal_type << 1) + ix.quant_offset_type
    if typ >= 2:
        enc.enc_icdf(typ - 2, T.SILK_TYPE_OFFSET_VAD_ICDF, 8)
    else:
        enc.enc_icdf(typ, T.SILK_TYPE_OFFSET_NO_VAD_ICDF, 8)
    # gains
    if cond_coding == 2:
        enc.enc_icdf(ix.gains_indices[0], T.SILK_DELTA_GAIN_ICDF, 8)
    else:
        enc.enc_icdf(ix.gains_indices[0] >> 3,
                     T.SILK_GAIN_ICDF[ix.signal_type], 8)
        enc.enc_icdf(ix.gains_indices[0] & 7, T.SILK_UNIFORM8_ICDF, 8)
    for i in range(1, st_like.nb_subfr):
        enc.enc_icdf(ix.gains_indices[i], T.SILK_DELTA_GAIN_ICDF, 8)
    # NLSF
    cb = st_like.psnlsf_cb
    half = (1 if ix.signal_type == 2 else 0) * cb.n_vectors
    enc.enc_icdf(ix.nlsf_indices[0], cb.cb1_icdf[half: half + cb.n_vectors], 8)
    ec_ix, _ = nlsf_unpack(cb, ix.nlsf_indices[0])
    for i in range(cb.order):
        val = ix.nlsf_indices[i + 1]
        icdf = cb.ec_icdf[ec_ix[i]: ec_ix[i] + 8]
        if val >= 4:
            enc.enc_icdf(8, icdf, 8)
            enc.enc_icdf(val - 4, T.SILK_NLSF_EXT_ICDF, 8)
        elif val <= -4:
            enc.enc_icdf(0, icdf, 8)
            enc.enc_icdf(-val - 4, T.SILK_NLSF_EXT_ICDF, 8)
        else:
            enc.enc_icdf(val + 4, icdf, 8)
    if st_like.nb_subfr == 4:
        enc.enc_icdf(ix.nlsf_interp_coef_q2,
                     T.SILK_NLSF_INTERPOLATION_FACTOR_ICDF, 8)
    # (voiced pitch/LTP would be coded here; unvoiced-only this round)
    assert ix.signal_type != 2, "voiced encode lands with the NSQ/pitch work"
    enc.enc_icdf(ix.seed, T.SILK_UNIFORM4_ICDF, 8)


def _combine_and_check(inp, max_pulses):
    out = []
    bad = False
    for k in range(len(inp) // 2):
        s = inp[2 * k] + inp[2 * k + 1]
        if s > max_pulses:
            bad = True
        out.append(s)
    return out, bad


def _shell_encode(enc, abs_pulses16):
    t0, t1, t2, t3 = T.SILK_SHELL_CODE_TABLES
    offs = T.SILK_SHELL_CODE_TABLE_OFFSETS

    def enc_split(child1, p, table):
        if p > 0:
            o = offs[p]
            enc.enc_icdf(child1, table[o: o + p + 1], 8)

    p1 = [abs_pulses16[2 * i] + abs_pulses16[2 * i + 1] for i in range(8)]
    p2 = [p1[2 * i] + p1[2 * i + 1] for i in range(4)]
    p3 = [p2[2 * i] + p2[2 * i + 1] for i in range(2)]
    p4 = p3[0] + p3[1]
    enc_split(p3[0], p4, t3)
    enc_split(p2[0], p3[0], t2)
    enc_split(p1[0], p2[0], t1)
    enc_split(abs_pulses16[0], p1[0], t0)
    enc_split(abs_pulses16[2], p1[1], t0)
    enc_split(p1[2], p2[1], t1)
    enc_split(abs_pulses16[4], p1[2], t0)
    enc_split(abs_pulses16[6], p1[3], t0)
    enc_split(p2[2], p3[1], t2)
    enc_split(p1[4], p2[2], t1)
    enc_split(abs_pulses16[8], p1[4], t0)
    enc_split(abs_pulses16[10], p1[5], t0)
    enc_split(p1[6], p2[3], t1)
    enc_split(abs_pulses16[12], p1[6], t0)
    enc_split(abs_pulses16[14], p1[7], t0)


def encode_pulses(enc, signal_type, quant_offset_type, pulses, frame_length):
    """Normative excitation encode (mirror of decode_pulses)."""
    n_blocks = frame_length >> LOG2_SHELL_CODEC_FRAME_LENGTH
    if n_blocks * SHELL_CODEC_FRAME_LENGTH < frame_length:
        n_blocks += 1
    padded = list(pulses) + [0] * (n_blocks * 16 - len(pulses))
    abs_pulses = [abs(p) for p in padded]
    sum_pulses = [0] * n_blocks
    n_rshifts = [0] * n_blocks
    scaled_abs = list(abs_pulses)
    for i in range(n_blocks):
        blk = scaled_abs[i * 16:(i + 1) * 16]
        while True:
            l1, bad1 = _combine_and_check(blk, T.SILK_MAX_PULSES_TABLE[0])
            l2, bad2 = _combine_and_check(l1, T.SILK_MAX_PULSES_TABLE[1])
            l3, bad3 = _combine_and_check(l2, T.SILK_MAX_PULSES_TABLE[2])
            l4, bad4 = _combine_and_check(l3, T.SILK_MAX_PULSES_TABLE[3])
            if bad1 or bad2 or bad3 or bad4:
                n_rshifts[i] += 1
                blk = [v >> 1 for v in blk]
            else:
                sum_pulses[i] = l4[0]
                break
        scaled_abs[i * 16:(i + 1) * 16] = blk

    # choose rate level by estimated bits
    best = None
    for k in range(N_RATE_LEVELS - 1):
        bits = T.SILK_RATE_LEVELS_BITS_Q5[signal_type >> 1][k]
        nb = T.SILK_PULSES_PER_BLOCK_BITS_Q5[k]
        for i in range(n_blocks):
            if n_rshifts[i] > 0:
                bits += nb[SILK_MAX_PULSES + 1]
            else:
                bits += nb[sum_pulses[i]]
        if best is None or bits < best[0]:
            best = (bits, k)
    rate_level = best[1]
    enc.enc_icdf(rate_level, T.SILK_RATE_LEVELS_ICDF[signal_type >> 1], 8)
    cdf = T.SILK_PULSES_PER_BLOCK_ICDF[rate_level]
    last_cdf = T.SILK_PULSES_PER_BLOCK_ICDF[N_RATE_LEVELS - 1]
    for i in range(n_blocks):
        if n_rshifts[i] == 0:
            enc.enc_icdf(sum_pulses[i], cdf, 8)
        else:
            enc.enc_icdf(SILK_MAX_PULSES + 1, cdf, 8)
            for _ in range(n_rshifts[i] - 1):
                enc.enc_icdf(SILK_MAX_PULSES + 1, last_cdf, 8)
            enc.enc_icdf(sum_pulses[i], last_cdf, 8)
    for i in range(n_blocks):
        if sum_pulses[i] > 0:
            _shell_encode(enc, scaled_abs[i * 16:(i + 1) * 16])
    for i in range(n_blocks):
        if n_rshifts[i] > 0:
            nls = n_rshifts[i]
            for k in range(16):
                abs_q = abs(padded[i * 16 + k])
                for j in range(nls - 1, 0, -1):
                    enc.enc_icdf((abs_q >> j) & 1, T.SILK_LSB_ICDF, 8)
                enc.enc_icdf(abs_q & 1, T.SILK_LSB_ICDF, 8)
            sum_pulses[i] |= nls << 5
    # signs
    base = 7 * (quant_offset_type + (signal_type << 1))
    icdf_row = T.SILK_SIGN_ICDF[base: base + 7]
    for i in range(n_blocks):
        p = sum_pulses[i]
        if p > 0:
            icdf = [icdf_row[min(p & 0x1F, 6)], 0]
            for j in range(16):
                q = padded[i * 16 + j]
                if q != 0:
                    enc.enc_icdf(0 if q < 0 else 1, icdf, 8)


class SilkEncoder:
    """Mono SILK encoder state (fs 8/12/16 kHz internal)."""

    def __init__(self):
        self.fs_khz = 0
        self.api_fs_hz = 0
        self.prev_gain_ind = 10
        self.prev_nlsf_q15 = None
        self.s_lpc_hist = [0] * 16  # reconstructed sLPC tail (Q14)
        self.seed_ctr = 0
        self.first = True
        self.resampler = None
        self.hp_mem = 0.0

    def snapshot(self):
        import copy
        return (self.fs_khz, self.api_fs_hz, self.prev_gain_ind,
                None if self.prev_nlsf_q15 is None else list(self.prev_nlsf_q15),
                list(self.s_lpc_hist), self.seed_ctr, self.first,
                copy.deepcopy(self.resampler), self.hp_mem)

    def restore(self, snap):
        (self.fs_khz, self.api_fs_hz, self.prev_gain_ind, nlsf,
         hist, self.seed_ctr, self.first, self.resampler, self.hp_mem) = snap
        self.prev_nlsf_q15 = None if nlsf is None else list(nlsf)
        self.s_lpc_hist = list(hist)

    def set_fs(self, fs_khz: int, api_fs_hz: int):
        from .resampler import resampler_init
        from .structs import ResamplerState
        if self.fs_khz != fs_khz or self.api_fs_hz != api_fs_hz:
            self.resampler = ResamplerState()
            if api_fs_hz != fs_khz * 1000:
                resampler_init(self.resampler, api_fs_hz, fs_khz * 1000, True)
            else:
                self.resampler = None
            self.fs_khz = fs_khz
            self.api_fs_hz = api_fs_hz
            self.prev_gain_ind = 10
            self.prev_nlsf_q15 = None
            self.s_lpc_hist = [0] * 16
            self.first = True

    @property
    def lpc_order(self):
        return 16 if self.fs_khz == 16 else 10

    @property
    def psnlsf_cb(self):
        return NLSF_CB_WB if self.fs_khz == 16 else NLSF_CB_NB_MB

    # -- analysis helpers ------------------------------------------------
    def _lpc_analysis(self, x):
        """Float LPC -> stabilized NLSF_Q15 (levinson on autocorrelation)."""
        d = self.lpc_order
        w = np.hanning(len(x) + 2)[1:-1]
        xw = x * w
        r = np.correlate(xw, xw, "full")[len(x) - 1: len(x) + d]
        r[0] *= 1.0001
        r[0] += 1e-3 * len(x)
        a = np.zeros(d)
        err = r[0]
        for i in range(d):
            acc = r[i + 1] - np.dot(a[:i], r[i:0:-1][:i])
            k = acc / max(err, 1e-9)
            k = np.clip(k, -0.98, 0.98)
            a_new = a.copy()
            a_new[i] = k
            a_new[:i] = a[:i] - k * a[i - 1::-1][:i]
            a = a_new
            err *= (1 - k * k)
        # bandwidth expansion for safety
        a = a * (0.96 ** np.arange(1, d + 1))
        # LSF via P/Q root method
        poly = np.concatenate([[1.0], -a])
        p = np.concatenate([poly, [0.0]]) + np.concatenate([[0.0], poly[::-1]])
        q = np.concatenate([poly, [0.0]]) - np.concatenate([[0.0], poly[::-1]])
        # deflate known roots at z=-1 (P) and z=1 (Q)
        p = np.polynomial.polynomial.polydiv(p[::-1], [1.0, 1.0])[0][::-1]
        q = np.polynomial.polynomial.polydiv(q[::-1], [-1.0, 1.0])[0][::-1]
        angles = []
        for pol in (p, q):
            roots = np.roots(pol)
            ang = np.angle(roots)
            angles.extend(a0 for a0 in ang if 1e-5 < a0 < np.pi - 1e-5)
        angles = sorted(angles)[:d]
        while len(angles) < d:
            angles.append((len(angles) + 1) * np.pi / (d + 1))
        nlsf = [int(min(32767, max(0, round(a0 / np.pi * 32768)))) for a0 in angles]
        nlsf_stabilize(nlsf, self.psnlsf_cb.delta_min_q15, d)
        return nlsf

    # -- frame encode ----------------------------------------------------
    def encode_frame(self, enc, x16, nb_subfr, target_rate_bps, coarsen=1.0):
        """Encode one frame of int16 samples at the internal rate."""
        from .structs import SideInfoIndices
        d = self.lpc_order
        frame_length = len(x16)
        subfr_length = frame_length // nb_subfr
        x = np.asarray(x16, np.float64)

        nlsf_q15 = self._lpc_analysis(x)
        nlsf_idx, coded_nlsf = nlsf_encode(nlsf_q15, self.psnlsf_cb,
                                           TYPE_UNVOICED)
        a_q12 = nlsf2a(coded_nlsf, d)

        # residual for gain estimation (float analysis filter)
        a = np.array(a_q12, np.float64) / 4096.0
        res = x.copy()
        for j in range(d):
            res[j + 1:] -= a[j] * x[: frame_length - j - 1]

        # per-subframe gains: scale so pulse RMS lands near ~1.3; push
        # toward the bitrate target with a crude rate knob
        rate_scale = max(0.6, 24000.0 / max(8000, target_rate_bps)) * coarsen
        gains_q16 = []
        for k in range(nb_subfr):
            seg = res[k * subfr_length:(k + 1) * subfr_length]
            rms = math.sqrt(float(seg @ seg) / len(seg)) + 1e-3
            # pulse_rms target ~1.3/rate_scale: exc_Q14 = res*2^30/gain,
            # pulse = exc>>14 => gain = rms * 2^16 * rate_scale / 1.3
            g = int(max(65536, min(1 << 30, rms * 50412.0 * rate_scale)))
            gains_q16.append(g)
        cond = False  # independent coding each frame (simple + robust)
        gains_idx, gains_dq, self.prev_gain_ind = gains_quant(
            gains_q16, self.prev_gain_ind, cond, nb_subfr)

        ix = SideInfoIndices()
        ix.signal_type = TYPE_UNVOICED
        ix.quant_offset_type = 0
        ix.gains_indices = gains_idx
        ix.nlsf_indices = nlsf_idx
        ix.nlsf_interp_coef_q2 = 4
        ix.seed = self.seed_ctr & 3
        self.seed_ctr += 1

        class _St:
            pass
        st = _St()
        st.nb_subfr = nb_subfr
        st.psnlsf_cb = self.psnlsf_cb
        encode_indices(st, enc, ix, 0)

        # closed-loop excitation quantization (zero-shaping NSQ)
        offset_q10 = T.SILK_QUANTIZATION_OFFSETS_Q10[ix.signal_type >> 1][
            ix.quant_offset_type]
        pulses = [0] * frame_length
        rand_seed = i32(ix.seed)
        hist = list(self.s_lpc_hist)
        for k in range(nb_subfr):
            gain = gains_dq[k]
            inv_gain = (1 << 30) / gain
            for i in range(subfr_length):
                n = k * subfr_length + i
                pred_q10 = d >> 1
                for j in range(d):
                    h = hist[-1 - j] if i - 1 - j < 0 or True else 0
                    pred_q10 += (hist[len(hist) - 1 - j] * a_q12[j]) >> 16
                target_q14 = int(round(x[n] * inv_gain)) - (pred_q10 << 4)
                rand_seed = silk_rand(rand_seed)
                sign = -1 if rand_seed < 0 else 1
                want = sign * target_q14
                base = want - (offset_q10 << 4)
                q = int(round(base / 16384.0))
                bestq, beste = 0, None
                for cand in (q - 1, q, q + 1):
                    v = cand << 14
                    if v > 0:
                        v -= QUANT_LEVEL_ADJUST_Q10 << 4
                    elif v < 0:
                        v += QUANT_LEVEL_ADJUST_Q10 << 4
                    v += offset_q10 << 4
                    e = abs(v - want)
                    if beste is None or e < beste:
                        beste, bestq = e, cand
                pulses[n] = max(-1000, min(1000, bestq))
                v = pulses[n] << 14
                if v > 0:
                    v -= QUANT_LEVEL_ADJUST_Q10 << 4
                elif v < 0:
                    v += QUANT_LEVEL_ADJUST_Q10 << 4
                v += offset_q10 << 4
                recon_exc = sign * v
                slpc = recon_exc + (pred_q10 << 4)
                hist.append(slpc)
                hist = hist[-16:]
                rand_seed = i32(rand_seed + pulses[n])
        self.s_lpc_hist = hist[-16:]
        encode_pulses(enc, ix.signal_type, ix.quant_offset_type, pulses,
                      frame_length)
        self.first = False


def silk_encode_packet(senc: SilkEncoder, enc, pcm_api, fs_khz, api_fs_hz,
                       frame_ms, bitrate_bps, coarsen=1.0):
    """Top-level mono SILK packet payload: VAD/LBRR flags + one frame."""
    from .resampler import silk_resampler
    senc.set_fs(fs_khz, api_fs_hz)
    if senc.resampler is not None:
        x16 = silk_resampler(senc.resampler, [sat16(int(round(v)))
                                              for v in pcm_api], len(pcm_api))
    else:
        x16 = [sat16(int(round(v))) for v in pcm_api]
    nb_subfr = 4 if frame_ms == 20 else 2
    frame_length = fs_khz * frame_ms
    x16 = (list(x16) + [0] * frame_length)[:frame_length]
    enc.enc_bit_logp(1, 1)   # VAD flag: active
    enc.enc_bit_logp(0, 1)   # LBRR flag
    senc.encode_frame(enc, x16, nb_subfr, bitrate_bps, coarsen)
    if enc.get_error():
        raise _BudgetExceeded
