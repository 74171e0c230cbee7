#!/usr/bin/env python
"""Headline benchmark: aggregate realtime-x for batched 48 kHz stereo CELT
decode on one chip (BASELINE.md north star: >= 5000x).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The device stage (denormalise + IMDCT + TDAC + postfilter + deemphasis) is
what runs here, fed with real frame descriptors decoded from real libopus
packets on the host. The host symbol stage rate is reported as a secondary
field (it is the Python reference implementation this round; the native
C++ host decoder is the next milestone).
"""

import json
import sys
import time

import numpy as np


def build_descs(n_frames=8, channels=2):
    from mousiki_tpu.bitstream.packet import parse_packet
    from mousiki_tpu.celt.decoder import CeltDecoder
    from mousiki_tpu.testing import oracle

    if oracle.available():
        enc = oracle.RefEncoder(48000, channels, oracle.APP_RESTRICTED_LOWDELAY)
        enc.ctl_set(oracle.SET_BITRATE, 128000)
        host = CeltDecoder(channels=channels, stream_channels=channels, end=21)
        sig = oracle.make_test_signal(960 * (n_frames + 1), channels, seed=3)
        pcm16 = oracle.float_to_i16(sig)
        descs = []
        host_t0 = time.perf_counter()
        for f in range(n_frames):
            pkt = enc.encode(pcm16[f * 960:(f + 1) * 960].reshape(-1))
            p = parse_packet(pkt)
            descs.append(host.decode_with_ec(p.frames[0], 960, return_desc=True))
        host_dt = time.perf_counter() - host_t0
        return descs, host_dt / n_frames
    # no oracle: synthesize plausible descriptors
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
    return descs, float("nan")


def main():
    import jax
    import jax.numpy as jnp

    from mousiki_tpu.ops.synthesis_jax import (FrameDesc, init_state,
                                               make_consts, synthesis_step)

    S = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    channels = 2
    n_frames = 8
    descs, host_per_frame = build_descs(n_frames, channels)

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

    frames_per_sec = S * n_iter / dt
    realtime_x = frames_per_sec * 0.02
    result = {
        "metric": "aggregate_realtime_x_celt_device_48k_stereo_decode",
        "value": round(realtime_x, 1),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(realtime_x / 5000.0, 4),
        "streams": S,
        "frames_per_sec": round(frames_per_sec, 1),
        "device": str(jax.devices()[0]),
        "host_symbol_stage_ms_per_frame": (round(host_per_frame * 1e3, 2)
                                           if host_per_frame == host_per_frame
                                           else None),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
