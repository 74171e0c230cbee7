#!/usr/bin/env python
"""Quick A/B of plan decode_stream serving modes on the real device:
per-frame streaming vs chunk=4 vs chunk=8 (stacked-arena scan dispatch).
Usage: probe_chunk.py [S] [steps_per_win] [n_win]"""

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
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    n_win = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    from bench import build_packets
    from mousiki_tpu.celt import host_native
    from mousiki_tpu.pipeline import CeltStreamPipeline

    host_native.set_plan_profile((144, 40, 6), 2, 8)
    payloads, _ = build_packets()
    nf = len(payloads)
    pipe = CeltStreamPipeline(S, channels=2, use_plan=True)

    def frames(k, off=0):
        for i in range(k):
            yield [payloads[(off + i + s) % nf] for s in range(S)]

    arms = [("stream", 1), ("chunk4", 4), ("chunk8", 8)]
    for _, ck in arms:  # compile + warm
        for pcm in pipe.decode_stream(frames(max(2 * ck, 4)), 960, chunk=ck):
            pass
    res = {a: [] for a, _ in arms}
    for w in range(n_win):
        for a, ck in arms:
            t0 = time.perf_counter()
            for pcm in pipe.decode_stream(frames(n, off=w * n), 960,
                                          chunk=ck):
                pass
            res[a].append(S * n * 0.02 / (time.perf_counter() - t0))
    for a, _ in arms:
        print(f"{a}: med={statistics.median(res[a]):.1f} "
              f"({', '.join(f'{r:.0f}' for r in res[a])})")


if __name__ == "__main__":
    main()
