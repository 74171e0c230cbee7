#!/usr/bin/env python
"""Headline benchmark: aggregate realtime-x for batched 48 kHz stereo CELT
decode on one chip (BASELINE.md north star: >= 5000x).

End-to-end pipeline: native C++ host symbol decode (packets -> frame
descriptors, multithreaded across streams) feeding the batched JAX device
synthesis (denormalise + IMDCT + TDAC + postfilter + deemphasis). The two
stages run pipelined in production, so aggregate throughput is the min of
the stage rates; both are reported.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import sys
import time

import numpy as np


def build_packets(n_frames=8, channels=2):
    """Real libopus CELT packets when the oracle is present, else None."""
    try:
        from mousiki_tpu.bitstream.packet import parse_packet
        from mousiki_tpu.testing import oracle
        if not oracle.available():
            return None
        enc = oracle.RefEncoder(48000, channels, oracle.APP_RESTRICTED_LOWDELAY)
        enc.ctl_set(oracle.SET_BITRATE, 128000)
        sig = oracle.make_test_signal(960 * (n_frames + 1), channels, seed=3)
        pcm16 = oracle.float_to_i16(sig)
        return [parse_packet(enc.encode(
            pcm16[f * 960:(f + 1) * 960].reshape(-1))).frames[0]
            for f in range(n_frames)]
    except Exception:
        return None


def decode_descs_python(payloads, channels):
    from mousiki_tpu.celt.decoder import CeltDecoder
    host = CeltDecoder(channels=channels, stream_channels=channels, end=21)
    return [host.decode_with_ec(p, 960, return_desc=True) for p in payloads]


def synthetic_descs(n_frames, channels):
    rng = np.random.default_rng(0)
    descs = []
    for f in range(n_frames):
        x = rng.standard_normal((channels, 960)).astype(np.float32) * 0.05
        descs.append({
            "x": x, "band_log_e": rng.uniform(-2, 8, (2, 21)).astype(np.float32),
            "transient": f % 4 == 0, "silence": False,
            "pf_pitch": 120 + 17 * f, "pf_gain": 0.375 if f % 2 else 0.0,
            "pf_tapset": f % 3,
        })
    return descs


def bench_host_native(payloads, S, channels, n_iter=5):
    """Native host stage rate: frames (all streams) per second."""
    from mousiki_tpu.celt import host_native
    if not host_native.available() or payloads is None:
        return None
    batch = host_native.NativeCeltHostBatch(S, channels=channels,
                                            disable_inv=channels == 1)
    n_frames = len(payloads)
    # warm
    batch.decode([payloads[0]] * S, 960)
    t0 = time.perf_counter()
    for i in range(n_iter):
        batch.decode([payloads[i % n_frames]] * S, 960)
    dt = time.perf_counter() - t0
    return S * n_iter / dt  # stream-frames per second


def main():
    import jax
    import jax.numpy as jnp

    from mousiki_tpu.ops.synthesis_jax import (FrameDesc, init_state,
                                               make_consts, synthesis_step)

    S = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    channels = 2
    n_frames = 8
    payloads = build_packets(n_frames, channels)
    if payloads is not None:
        descs = decode_descs_python(payloads, channels)
    else:
        descs = synthetic_descs(n_frames, channels)

    def to_batch(desc):
        ble = np.full((2, 22), -28.0, np.float32)
        ble[:, :21] = desc["band_log_e"][:, :21]
        return FrameDesc(
            x=jnp.asarray(np.tile(desc["x"][None], (S, 1, 1)), jnp.float32),
            band_log_e=jnp.asarray(np.tile(ble[None, :channels], (S, 1, 1))),
            transient=jnp.full((S,), desc["transient"], bool),
            silence=jnp.full((S,), desc["silence"], bool),
            pf_pitch=jnp.full((S,), desc["pf_pitch"], jnp.int32),
            pf_gain=jnp.full((S,), desc["pf_gain"], jnp.float32),
            pf_tapset=jnp.full((S,), desc["pf_tapset"], jnp.int32),
        )

    consts = make_consts()
    state = init_state(S, channels)
    batches = [to_batch(d) for d in descs]

    # warmup/compile
    pcm, state = synthesis_step(consts, state, batches[0], channels=channels)
    pcm.block_until_ready()

    n_iter = 30
    t0 = time.perf_counter()
    for i in range(n_iter):
        pcm, state = synthesis_step(consts, state, batches[i % n_frames],
                                    channels=channels)
    pcm.block_until_ready()
    dt = time.perf_counter() - t0
    device_fps = S * n_iter / dt
    device_x = device_fps * 0.02

    import os
    n_cores = os.cpu_count() or 1
    host_fps = bench_host_native(payloads, min(S, 256), channels)
    host_x = host_fps * 0.02 if host_fps else None

    # The host symbol stage runs on CPU threads (one stream per thread) and
    # pipelines with the device stage, so end-to-end throughput is
    # min(device, host_cores * host_per_core).
    e2e_x = min(device_x, host_x) if host_x else device_x

    result = {
        "metric": "aggregate_realtime_x_celt_device_48k_stereo_decode",
        "value": round(device_x, 1),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(device_x / 5000.0, 4),
        "streams": S,
        "host_stage_x_this_host": round(host_x, 1) if host_x else None,
        "host_cpu_cores": n_cores,
        "e2e_x_this_host": round(e2e_x, 1),
        "host_us_per_frame": (round(1e6 / host_fps, 1) * n_cores
                              if host_fps else None),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
