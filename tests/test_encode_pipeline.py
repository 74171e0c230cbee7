"""CeltEncodePipeline: device front half (ops/encode_front_jax.py) vs the
pure-host CeltEncoder, and end-to-end decodability in libopus."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from mousiki_tpu.testing import oracle

pytestmark = pytest.mark.skipif(not oracle.available(),
                                reason="libopus oracle unavailable")


def _signal(n_frames, channels, kind="music", seed=0):
    n = 960 * n_frames
    sig = oracle.make_test_signal(n, channels, seed=seed)
    if kind == "clicks":
        rng = np.random.default_rng(seed)
        for p in rng.integers(960, n - 960, 6):
            sig[p: p + 120] += 0.5 * rng.standard_normal((120, channels))
    return np.clip(sig, -0.95, 0.95).astype(np.float32)


def _toc(channels):
    # CELT-only fullband 20 ms TOC byte
    return bytes([(31 << 3) | (4 if channels == 2 else 0)])


@pytest.mark.parametrize("channels,kind", [(2, "music"), (1, "music"),
                                           (2, "clicks")])
def test_front_matches_host_analysis(channels, kind):
    """Device front analyses agree with the host encoder's on the same
    audio (pitch/transient decisions may differ on knife-edge frames;
    the MDCT must match within float tolerance whenever they agree)."""
    from mousiki_tpu.celt.encoder import CeltEncoder
    from mousiki_tpu.ops.encode_front_jax import (front_step,
                                                  init_front_state,
                                                  make_front_consts)

    n_frames = 8
    sig = _signal(n_frames, channels, kind)
    consts = make_front_consts(960)
    state = init_front_state(1, channels, 960)
    host = CeltEncoder(channels=channels, stream_channels=channels)
    nbytes = np.array([320], np.int32)

    agree = 0
    for f in range(n_frames):
        pcm = sig[f * 960:(f + 1) * 960]
        tapset = np.array([host.tapset_decision], np.int32)
        out, state = front_step(consts, state, jnp.asarray(pcm[None]),
                                jnp.asarray(nbytes), jnp.asarray(tapset),
                                channels=channels, frame=960)
        # host reference: run its internal analysis pieces on the same
        # frame (drive a full encode to keep its state in lockstep)
        import mousiki_tpu.celt.encoder as CE
        captured = {}
        orig = CE.CeltEncoder._compute_mdcts

        def spy(self, inb, short_blocks, LM, CC):
            r = orig(self, inb, short_blocks, LM, CC)
            captured["freq"] = r.copy()
            captured["short"] = short_blocks
            return r

        CE.CeltEncoder._compute_mdcts = spy
        try:
            host.encode_with_ec(pcm.astype(np.float64), 960, 320)
        finally:
            CE.CeltEncoder._compute_mdcts = orig

        dev_tr = bool(np.asarray(out["is_transient"])[0])
        host_tr = bool(captured["short"])
        if dev_tr == host_tr:
            agree += 1
            got = np.asarray(out["freq"])[0]
            want = captured["freq"]
            scale = np.abs(want).max() + 1.0
            err = np.abs(got - want).max() / scale
            assert err < 2e-3, (f, err)
    assert agree >= n_frames - 1, f"transient decisions diverged: {agree}"


@pytest.mark.parametrize("channels,bitrate", [(2, 128000), (1, 96000),
                                              (2, 64000)])
def test_encode_pipeline_packets_decode_in_libopus(channels, bitrate):
    from mousiki_tpu.pipeline import CeltEncodePipeline
    sys_path_tools = __import__("os").path.join(
        __import__("os").path.dirname(__import__("os").path.dirname(
            __import__("os").path.abspath(__file__))), "tools")
    import sys
    if sys_path_tools not in sys.path:
        sys.path.insert(0, sys_path_tools)
    from opus_compare import compare

    S = 3
    n_frames = 24
    sigs = [_signal(n_frames, channels, "music", seed=s) for s in range(S)]
    pipe = CeltEncodePipeline(S, channels=channels, bitrate=bitrate)
    decs = [oracle.RefDecoder(48000, channels) for _ in range(S)]
    outs = [[] for _ in range(S)]
    for f in range(n_frames):
        pcm = np.stack([sigs[s][f * 960:(f + 1) * 960] for s in range(S)])
        pkts = pipe.step(pcm)
        for s, p in enumerate(pkts):
            assert p is not None and len(p) > 10
            outs[s].append(decs[s].decode_float(_toc(channels) + p, 960))

    def downmix_16k(x48):
        taps = 96
        t = np.arange(-taps, taps + 1, dtype=np.float64)
        h = np.sinc(t / 3.0) / 3.0 * np.hanning(2 * taps + 1)
        mono = np.asarray(x48, np.float64)
        if mono.ndim > 1:
            mono = mono.mean(axis=1)
        return np.convolve(mono, h, mode="same")[::3]

    for s in range(S):
        ref = downmix_16k(sigs[s][: n_frames * 960])
        got = downmix_16k(np.concatenate(outs[s], axis=0))
        r = compare(32768.0 * ref.astype(np.float32),
                    32768.0 * got.astype(np.float32))
        assert r["err4"] < 0.5, (s, r)


def test_silk_encode_pipeline_batched_nsq():
    """SilkEncodePipeline: S encoder workers with the batched device NSQ
    (parallel/nsq_batch.py). Packets must (a) be identical to a
    single-stream pipeline's (kernel lanes are independent), and (b)
    decode in libopus with sane quality."""
    from mousiki_tpu.pipeline import SilkEncodePipeline

    S, F = 3, 8
    sigs = [oracle.make_test_signal(960 * (F + 1), 1, seed=10 + s)
            for s in range(S)]

    pipe = SilkEncodePipeline(S, bitrate=24000)
    solo = SilkEncodePipeline(1, bitrate=24000)
    pkts = [[] for _ in range(S)]
    solo_pkts = []
    for f in range(F):
        pcm = np.stack([sigs[s][f * 960:(f + 1) * 960, 0] for s in range(S)])
        out = pipe.step(pcm)
        for s in range(S):
            pkts[s].append(out[s])
        solo_pkts.append(solo.step(pcm[:1])[0])

    # lane independence: stream 0 batched == stream 0 alone
    assert solo_pkts == pkts[0]

    # decodability + quality vs the input in libopus itself
    for s in range(S):
        dec = oracle.RefDecoder(48000, 1)
        got = np.concatenate([dec.decode_float(p, 960)[:, 0]
                              for p in pkts[s]])
        want = sigs[s][: len(got), 0]
        # skip the encoder delay/warmup frame, compare band-limited content
        a, b = want[960:], got[960:]
        best = -1e9
        for lag in range(0, 400):
            bb = b[lag:][: len(a) - lag]
            aa = a[: len(bb)]
            best = max(best, 10 * np.log10(
                (aa ** 2).mean() / ((aa - bb) ** 2).mean() + 1e-12))
        assert best > 2.0, best   # WB-coded noise signal: loose sanity gate


def test_encode_stream_overlap_matches_chunked_quality():
    """encode_stream (pipelined native-back/device-front overlap) yields
    the same number of frames as step_chunk and packets of equivalent
    quality (bit-exactness is not required: the tapset feedback lags up
    to 2K frames instead of K — a valid in-stream-signaled choice)."""
    from mousiki_tpu.pipeline import CeltEncodePipeline
    S, K, n_chunks = 2, 4, 3
    n_frames = K * n_chunks
    sigs = [_signal(n_frames, 2, "music", seed=s) for s in range(S)]

    def chunks():
        for c in range(n_chunks):
            yield np.stack([np.stack(
                [sigs[s][(c * K + k) * 960:(c * K + k + 1) * 960]
                 for s in range(S)]) for k in range(K)])

    pipe = CeltEncodePipeline(S, channels=2, bitrate=96000)
    if pipe._native is None:
        pytest.skip("native celt encoder unavailable")
    got = list(pipe.encode_stream(chunks()))
    assert len(got) == n_frames   # one S-packet list per frame
    decs = [oracle.RefDecoder(48000, 2) for _ in range(S)]
    outs = [[] for _ in range(S)]
    for pkts in got:
        for s, p in enumerate(pkts):
            assert p is not None and len(p) > 10
            outs[s].append(decs[s].decode_float(_toc(2) + p, 960))
    import os as _os
    import sys as _sys
    tools = _os.path.join(_os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))), "tools")
    if tools not in _sys.path:
        _sys.path.insert(0, tools)
    from opus_compare import compare

    def downmix_16k(x48):
        taps = 96
        t = np.arange(-taps, taps + 1, dtype=np.float64)
        h = np.sinc(t / 3.0) / 3.0 * np.hanning(2 * taps + 1)
        mono = np.asarray(x48, np.float64)
        if mono.ndim > 1:
            mono = mono.mean(axis=1)
        return np.convolve(mono, h, mode="same")[::3]

    for s in range(S):
        ref = downmix_16k(sigs[s][: n_frames * 960])
        got = downmix_16k(np.concatenate(outs[s], axis=0))
        r = compare(32768.0 * ref.astype(np.float32),
                    32768.0 * got.astype(np.float32))
        assert r["err4"] < 0.5, (s, r)
