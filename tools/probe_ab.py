#!/usr/bin/env python
"""A/B the serialized vs overlapped plan decode_stream in ONE process,
interleaving windows so host-VM speed drift hits both arms equally.
Usage: probe_ab.py [S] [steps_per_win] [n_win]"""

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
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    n_win = int(sys.argv[3]) if len(sys.argv) > 3 else 6

    from bench import build_packets
    from mousiki_tpu.celt import host_native
    from mousiki_tpu.pipeline import CeltStreamPipeline

    host_native.set_plan_profile((144, 40, 8), 2)
    payloads, _ = build_packets()
    nf = len(payloads)
    pipe = CeltStreamPipeline(S, channels=2, use_plan=True)

    def frames(k, off=0):
        for i in range(k):
            yield [payloads[(off + i + s) % nf] for s in range(S)]

    for pcm in pipe.decode_stream(frames(6), 960):
        pcm.block_until_ready()
    pipe.overlap_host = True
    for pcm in pipe.decode_stream(frames(6), 960):
        pcm.block_until_ready()

    res = {"ser": [], "ovl": []}
    hus = []
    for w in range(n_win):
        for arm in ("ser", "ovl"):
            pipe.overlap_host = arm == "ovl"
            t0 = time.perf_counter()
            for pcm in pipe.decode_stream(frames(n, off=w * n), 960):
                pass
            res[arm].append(S * n * 0.02 / (time.perf_counter() - t0))
        t0 = time.perf_counter()
        for i in range(4):
            pipe._native.decode_plan_arenas(
                [payloads[(i + s) % nf] for s in range(S)], 960)
        hus.append((time.perf_counter() - t0) / 4 / S * 1e6)

    for arm in ("ser", "ovl"):
        print(f"{arm}: med={statistics.median(res[arm]):.1f} "
              f"({', '.join(f'{r:.0f}' for r in res[arm])})")
    print(f"host_us: med={statistics.median(hus):.1f} min={min(hus):.1f}")


if __name__ == "__main__":
    main()
