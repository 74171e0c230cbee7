#!/usr/bin/env python
"""Split the plan-pipeline step time on the real TPU into its serial
host-CPU parts: native symbol decode, H2D arena staging, dispatch+device.

Usage: python tools/probe_step_split.py [S] [n_steps]
Prints one line per phase (median over windows) so bench regressions can
be attributed before touching code.
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from mousiki_tpu.bitstream.packet import parse_packet  # noqa: E402
from mousiki_tpu.celt import host_native  # noqa: E402
from mousiki_tpu.pipeline import CeltStreamPipeline  # noqa: E402
from mousiki_tpu.testing import oracle  # noqa: E402


def main():
    import jax.numpy as jnp

    S = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    host_native.set_plan_profile((144, 40, 6), 2, 8)
    nf = 48
    enc = oracle.RefEncoder(48000, 2, oracle.APP_RESTRICTED_LOWDELAY)
    enc.ctl_set(oracle.SET_BITRATE, 128000)
    sig = oracle.make_test_signal(960 * (nf + 1), 2, seed=3)
    pcm16 = oracle.float_to_i16(sig)
    pays = [parse_packet(enc.encode(
        pcm16[f * 960:(f + 1) * 960].reshape(-1))).frames[0]
        for f in range(nf)]

    pipe = CeltStreamPipeline(S, channels=2, use_plan=True)
    pipe._native.set_plan_buffers(1)

    def batch(i):
        return [pays[(i + s) % nf] for s in range(S)]

    # warm/compile
    for _ in range(3):
        args = pipe._host_decode_plan(batch(0), 960)
        pcm, pipe.state = pipe._plan_step(960, pipe.state, *args)
        pcm.block_until_ready()

    t_native = t_h2d = t_disp = t_block = 0.0
    arena_bytes = pipe._native.decode_plan_arenas(batch(0), 960)[0][
        "backing"].nbytes
    for i in range(n):
        t0 = time.perf_counter()
        host = pipe._host_decode_plan(batch(i), 960, to_device=False)
        t1 = time.perf_counter()
        args = pipe._plan_args_to_device(host, 960)
        t2 = time.perf_counter()
        pcm, pipe.state = pipe._plan_step(960, pipe.state, *args)
        t3 = time.perf_counter()
        pcm.block_until_ready()
        t4 = time.perf_counter()
        t_native += t1 - t0
        t_h2d += t2 - t1
        t_disp += t3 - t2
        t_block += t4 - t3
    tot = t_native + t_h2d + t_disp + t_block
    sc = 1e6 / (n * S)  # us per frame per stream
    print(f"S={S} steps={n} arena={arena_bytes / S:.0f} B/stream")
    print(f"native   {t_native * sc:7.2f} us/frame  ({t_native / n * 1e3:6.2f} ms/step)")
    print(f"h2d      {t_h2d * sc:7.2f} us/frame  ({t_h2d / n * 1e3:6.2f} ms/step)")
    print(f"dispatch {t_disp * sc:7.2f} us/frame  ({t_disp / n * 1e3:6.2f} ms/step)")
    print(f"block    {t_block * sc:7.2f} us/frame  ({t_block / n * 1e3:6.2f} ms/step)")
    print(f"TOTAL    {tot * sc:7.2f} us/frame  -> {0.02 / (tot * sc * 1e-6):.0f}x realtime e2e")


if __name__ == "__main__":
    main()
