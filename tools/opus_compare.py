#!/usr/bin/env python
"""Psychoacoustic audio comparison (opus_compare / dred_vectors gate).

Port of the reference quality gate (src/bin/dred_vectors.rs:430-745):
16 kHz mono float input, biquad pre-emphasis, Blackman-Harris 640-point
spectra on 10 ms hops, two-sided psychoacoustic frequency smearing
(psydecay), temporal masking, loudness-domain (x^0.2) band errors -> the
(err4, err16, pitch) triple with pass/fail thresholds. Usable as a module
(`compare(ref, test)`) or CLI on raw f32/s16 files.
"""

from __future__ import annotations

import sys

import numpy as np

NFREQS = 320
WIN = 640
STEP = 160
NBANDS = 17
BANDS = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
         272, 320]
PITCH_MIN, PITCH_MAX, PITCH_FRAME = 32, 256, 320
LOUDNESS = 0.2

# reference threshold presets
OPUS_THRESHOLDS = (0.5, 1.5, 0.25)
DRED_DECODE_THRESHOLDS = (0.5, 0.15, 0.02)
FARGAN_THRESHOLDS = (0.25, 1.0, 0.15)


def biquad(x):
    a = (-1.97354, 0.97417)
    b = (-2.0, 1.0)
    mem = [0.0, 0.0]
    out = np.empty(len(x))
    for i, xi in enumerate(np.asarray(x, np.float64)):
        yi = xi + mem[0]
        mem[0] = mem[1] + (b[0] * xi - a[0] * yi)
        mem[1] = b[1] * xi - a[1] * yi
        out[i] = yi
    return out


def _psydecay():
    i = np.arange(NFREQS)
    f = 16000.0 * i / (2.0 * NFREQS)
    deriv = ((8.288e-8 * f) / (3.4225e-16 * f ** 4 + 1.0)
             + 0.009694 / (5.476e-7 * f * f + 1.0) + 1e-4)
    deriv = deriv * 16000.0 / (2.0 * NFREQS)
    return 0.0031623 ** deriv, 0.1 ** deriv  # decay_l, decay_r


def _spectrum(x, nframes):
    n = (np.arange(WIN) + 0.5) / WIN
    win = (0.35875 - 0.48829 * np.cos(2 * np.pi * n)
           + 0.14128 * np.cos(4 * np.pi * n)
           - 0.01168 * np.cos(6 * np.pi * n))
    idx = np.arange(nframes)[:, None] * STEP + np.arange(WIN)[None, :]
    frames = x[idx] * win[None, :]
    spec = np.fft.rfft(frames, axis=1)[:, :NFREQS] / WIN  # mini_kfft scaling
    return (spec.real ** 2 + spec.imag ** 2) + 0.1


def _xcorr(x, offset):
    seg = x[offset - PITCH_MAX - 1: offset + PITCH_FRAME]
    filt = seg[1:] - 0.8 * seg[:-1]          # len PITCH_FRAME + PITCH_MAX
    frame = filt[PITCH_MAX:]
    xx = float(frame @ frame)
    out = np.empty(PITCH_MAX + 1)
    for i in range(PITCH_MAX + 1):
        past = filt[PITCH_MAX - i: PITCH_MAX - i + PITCH_FRAME]
        out[i] = float(frame @ past) / np.sqrt(
            xx * float(past @ past) + PITCH_FRAME)
    return out


def compare(reference, actual, thresholds=OPUS_THRESHOLDS, verbose=False):
    """reference/actual: 16 kHz mono float arrays. Returns dict with
    err4/err16/pitch metrics and pass flag."""
    x = biquad(reference)
    y = biquad(actual[: len(x)])
    if len(y) != len(x) or len(x) < WIN:
        raise ValueError("length mismatch or too short")
    nframes = (len(x) - WIN + STEP) // STEP

    pitch_error, pitch_count = 0.0, 0
    for frame in range(2, max(2, nframes - 2)):
        off = frame * STEP
        xc = _xcorr(x, off)
        yc = _xcorr(y, off)
        p = PITCH_MIN + int(np.argmax(xc[PITCH_MIN: PITCH_MAX + 1]))
        if xc[p] > 0.7:
            pitch_error += abs(xc[p] - yc[p])
            pitch_count += 1
    if pitch_count:
        pitch_error /= pitch_count

    X = _spectrum(x, nframes)
    Y = _spectrum(y, nframes)
    decay_l, decay_r = _psydecay()
    norm = np.ones(NFREQS)
    for i in range(1, NFREQS):
        norm[i] = 1.0 + decay_r[i] * norm[i - 1]
    for i in range(NFREQS - 2, -1, -1):
        norm[i] += decay_l[i] * norm[i + 1]
    norm = 1.0 / norm
    for arr in (X, Y):
        for i in range(1, NFREQS):
            arr[:, i] += decay_r[i] * arr[:, i - 1]
        for i in range(NFREQS - 2, -1, -1):
            arr[:, i] += decay_l[i] * arr[:, i + 1]
        arr *= norm[None, :]
    max_e = X.max(axis=1, keepdims=True)
    floor = 1e-8 * max_e
    X = np.maximum(X, floor)
    Y = np.maximum(Y, floor)
    for frame in range(1, nframes):
        X[frame] += 0.5 * X[frame - 1]
        Y[frame] += 0.5 * Y[frame - 1]
    for frame in range(nframes - 2, -1, -1):
        X[frame] += 0.1 * X[frame + 1]
        Y[frame] += 0.1 * Y[frame + 1]

    f_bin = np.arange(NFREQS) * np.pi / 960.0
    thresh = 0.1 / (0.15 * 0.15 + f_bin * f_bin)
    err4 = err16 = t2 = 0.0
    for frame in range(nframes):
        xb, yb = X[frame], Y[frame]
        ef2 = ef4 = tf2 = 0.0
        for band in range(NBANDS):
            lo, hi = BANDS[band], BANDS[band + 1]
            w = 1.0 / (hi - lo)
            re = ((yb[lo:hi] + thresh[lo:hi]) ** LOUDNESS
                  - (xb[lo:hi] + thresh[lo:hi]) ** LOUDNESS)
            eb2 = float((w * re * re).sum()) / (hi - lo)
            tb2 = float((w * (xb[lo:hi] + thresh[lo:hi])
                         ** (2 * LOUDNESS)).sum()) / (hi - lo)
            re4 = ((yb[lo:hi] + 10 * thresh[lo:hi]) ** LOUDNESS
                   - (xb[lo:hi] + 10 * thresh[lo:hi]) ** LOUDNESS)
            eb4 = float((w * re4 * re4).sum()) / (hi - lo)
            ef2 += eb2
            ef4 += eb4 * eb4
            tf2 += tb2
        ef2 /= NBANDS
        ef4 /= NBANDS
        ef4 *= ef4
        tf2 /= NBANDS
        err4 += ef2 * ef2
        err16 += ef4 * ef4
        t2 += tf2
    err4 = 100.0 * (err4 / nframes) ** 0.25 / np.sqrt(t2)
    err16 = 100.0 * (err16 / nframes) ** (1.0 / 16.0) / np.sqrt(t2)
    ok = (err4 <= thresholds[0] and err16 <= thresholds[1]
          and pitch_error <= thresholds[2])
    if verbose:
        print(f"err4 = {err4:.4f}, err16 = {err16:.4f}, "
              f"pitch = {pitch_error:.4f} -> "
              f"{'PASSED' if ok else 'FAILED'}")
    return dict(err4=float(err4), err16=float(err16),
                pitch=float(pitch_error), ok=bool(ok))


def main():
    if len(sys.argv) != 3:
        print("usage: opus_compare.py <ref.f32|s16> <test.f32|s16> "
              "(16 kHz mono)", file=sys.stderr)
        sys.exit(1)

    def load(p):
        raw = open(p, "rb").read()
        if p.endswith(".f32"):
            return np.frombuffer(raw, "<f4").astype(np.float64) * 32768
        return np.frombuffer(raw, "<i2").astype(np.float64)

    r = compare(load(sys.argv[1]), load(sys.argv[2]), verbose=True)
    sys.exit(0 if r["ok"] else 1)


if __name__ == "__main__":
    main()
