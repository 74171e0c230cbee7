"""Host plan-stage cost split probe (VERDICT r4 item 2 artifact).

Reproduces the numbers in PROBE_HOST.md: builds the standalone
bench_plan harness in timing and lite-profile variants, times the real
batched serving path (NativeCeltHostBatch at S=256), isolates the python
marshal, and replays the pure-EC floor. Run on a quiet box; this VM
class shows +/-15% scheduling noise on single runs (median of 5 is
reported for each number).
"""

import os
import statistics
import struct
import subprocess
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def sh(cmd):
    subprocess.run(cmd, shell=True, check=True, cwd=ROOT)


def load_pkts(path="/tmp/plan_packets.bin"):
    if not os.path.exists(path):
        subprocess.run([sys.executable, "tools/gen_plan_packets.py"],
                       cwd=ROOT)
    data = open(path, "rb").read()
    n = struct.unpack("<i", data[:4])[0]
    pos, pkts = 4, []
    for _ in range(n):
        ln = struct.unpack("<i", data[pos:pos + 4])[0]
        pos += 4
        pkts.append(data[pos:pos + ln])
        pos += ln
    return pkts


def standalone(n=5):
    sh("g++ -O3 -march=native -pthread -I native -o /tmp/probe_bp "
       "native/bench_plan.cpp native/celt_host.cpp")
    vals = []
    for _ in range(n):
        out = subprocess.run(["/tmp/probe_bp", "/tmp/plan_packets.bin",
                              "40000"], capture_output=True, text=True,
                             cwd=ROOT).stdout
        vals.append(float(out.split()[0]))
    return statistics.median(vals)


def lite_profile():
    sh("g++ -O3 -march=native -pthread -DPLAN_PROF -DPLAN_PROF_LITE "
       "-I native -o /tmp/probe_bpl native/bench_plan.cpp "
       "native/celt_host.cpp")
    out = subprocess.run(["/tmp/probe_bpl", "/tmp/plan_packets.bin",
                          "40000"], capture_output=True, text=True,
                         cwd=ROOT).stdout
    return out


def batch_and_marshal(pkts, S=256, n=5):
    sys.path.insert(0, ROOT)
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from mousiki_tpu.celt import host_native
    host_native.set_plan_profile((144, 40, 6), 2, 8)
    nat = host_native.NativeCeltHostBatch(S, channels=2)
    pls = [pkts[s % len(pkts)] for s in range(S)]
    nat.decode_plan_arenas(pls, 960)
    vals = []
    for _ in range(n):
        t0 = time.perf_counter()
        for _ in range(30):
            nat.decode_plan_arenas(pls, 960)
        vals.append((time.perf_counter() - t0) / (30 * S) * 1e6)
    batch_us = statistics.median(vals)
    # python marshal alone
    offs = np.empty(S, np.int32)
    lens = np.empty(S, np.int32)
    t0 = time.perf_counter()
    R = 300
    for _ in range(R):
        b"".join(p for p in pls if p is not None)
        lens[:] = np.fromiter((0 if p is None else len(p) for p in pls),
                              np.int32, count=S)
        np.cumsum(lens[:-1], out=offs[1:], dtype=np.int32)
        offs[0] = 0
    marshal_us = (time.perf_counter() - t0) / (R * S) * 1e6
    return batch_us, marshal_us


def main():
    pkts = load_pkts()
    print(f"corpus: {len(pkts)} payloads (128 kbps stereo music)")
    t = standalone()
    print(f"standalone single-state decode: {t:.2f} us/frame (median of 5)")
    print(lite_profile())
    b, m = batch_and_marshal(pkts)
    print(f"batched serving path (S=256): {b:.2f} us/frame")
    print(f"  python marshal share: {m:.3f} us/frame")
    print(f"  batch-vs-standalone delta (state/arena cache misses): "
          f"{b - m - t:.2f} us/frame")


if __name__ == "__main__":
    main()
