#!/usr/bin/env python
"""Write a packets.bin corpus (bench_plan.cpp / bench_host.cpp format:
int32 count, then per packet int32 len + payload bytes) of CELT payloads
from the libopus oracle, matching bench.py's perf traffic (48 kHz stereo
128 kbps restricted-lowdelay)."""

import struct
import sys

sys.path.insert(0, ".")

from mousiki_tpu.bitstream.packet import parse_packet  # noqa: E402
from mousiki_tpu.testing import oracle  # noqa: E402


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/plan_packets.bin"
    n_frames = int(sys.argv[2]) if len(sys.argv) > 2 else 48
    enc = oracle.RefEncoder(48000, 2, oracle.APP_RESTRICTED_LOWDELAY)
    enc.ctl_set(oracle.SET_BITRATE, 128000)
    sig = oracle.make_test_signal(960 * (n_frames + 1), 2, seed=3)
    pcm16 = oracle.float_to_i16(sig)
    pays = []
    for f in range(n_frames):
        pkt = enc.encode(pcm16[f * 960:(f + 1) * 960].reshape(-1))
        pays.append(parse_packet(pkt).frames[0])
    with open(out, "wb") as fh:
        fh.write(struct.pack("<i", len(pays)))
        for p in pays:
            fh.write(struct.pack("<i", len(p)))
            fh.write(p)
    print(out, len(pays), "payloads,", sum(map(len, pays)), "bytes")


if __name__ == "__main__":
    main()
