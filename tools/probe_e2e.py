#!/usr/bin/env python
"""Quick e2e probe of the plan pipeline on the real device: median-of-N
window rate at a given S, plus the host-stage cost. Perf phases only (no
PCM readback — that would flip the tunneled session into per-dispatch
executable-reupload mode). Usage: probe_e2e.py [S] [n_steps] [n_win]"""

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    S = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    n_win = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    from bench import build_packets
    from mousiki_tpu.celt import host_native
    from mousiki_tpu.pipeline import CeltStreamPipeline

    host_native.set_plan_profile((144, 40, 8), 2)
    payloads, _ = build_packets()
    assert payloads is not None
    nf = len(payloads)
    pipe = CeltStreamPipeline(S, channels=2, use_plan=True)

    def frames(n, off=0):
        for i in range(n):
            yield [payloads[(off + i + s) % nf] for s in range(S)]

    for pcm in pipe.decode_stream(frames(8), 960):
        pcm.block_until_ready()

    rates = []
    for w in range(n_win):
        t0 = time.perf_counter()
        n = max(4, n_steps // n_win)
        for pcm in pipe.decode_stream(frames(n, off=w * n), 960):
            pass
        dt = time.perf_counter() - t0
        rates.append(S * n * 0.02 / dt)
    med = statistics.median(rates)

    host_us = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(10):
            pipe._native.decode_plan_arenas(
                [payloads[(i + s) % nf] for s in range(S)], 960)
        host_us = min(host_us, (time.perf_counter() - t0) / 10 / S * 1e6)

    print(f"S={S} e2e_x={med:.1f} (windows: "
          f"{', '.join(f'{r:.0f}' for r in rates)}) host_us={host_us:.1f} "
          f"wall_us={0.02e6 / med:.1f}")


if __name__ == "__main__":
    main()
