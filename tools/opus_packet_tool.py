#!/usr/bin/env python
"""Encode/decode OPUSPKT1 packet streams (examples/opus_packet_tool.rs twin).

encode: 16-bit LE stereo 48 kHz PCM -> u16-length-prefixed packet stream
decode: OPUSPKT1 packet stream -> 16-bit LE PCM
"""

import struct
import sys

sys.path.insert(0, ".")

import numpy as np

MAGIC = b"OPUSPKT1"
FRAME_SIZE = 960
SAMPLE_RATE = 48000
CHANNELS = 2
APPLICATION = 2049
BITRATE = 64000


def encode(inp, outp):
    from mousiki_tpu.opus_encoder import OpusEncoder

    pcm = np.frombuffer(open(inp, "rb").read(), "<i2").astype(np.float64)
    pcm = pcm.reshape(-1, CHANNELS) / 32768.0
    enc = OpusEncoder(SAMPLE_RATE, CHANNELS, APPLICATION)
    enc.set_bitrate(BITRATE)
    with open(outp, "wb") as f:
        f.write(MAGIC)
        n = 0
        for off in range(0, len(pcm) - FRAME_SIZE + 1, FRAME_SIZE):
            pkt = enc.encode(pcm[off: off + FRAME_SIZE], FRAME_SIZE)
            f.write(struct.pack("<H", len(pkt)))
            f.write(pkt)
            n += 1
    print(f"encoded {n} packets")


def decode(inp, outp):
    from mousiki_tpu.opus_decoder import OpusDecoder

    data = open(inp, "rb").read()
    if data[:8] != MAGIC:
        raise SystemExit("invalid packet header: magic")
    dec = OpusDecoder(SAMPLE_RATE, CHANNELS)
    pos = 8
    n = 0
    with open(outp, "wb") as f:
        while pos + 2 <= len(data):
            (plen,) = struct.unpack_from("<H", data, pos)
            pos += 2
            if plen == 0 or pos + plen > len(data):
                break
            pcm = dec.decode(data[pos: pos + plen], FRAME_SIZE)
            pos += plen
            f.write(np.clip(pcm * 32768.0, -32768,
                            32767).astype("<i2").tobytes())
            n += 1
    print(f"decoded {n} packets")


if __name__ == "__main__":
    if len(sys.argv) != 4 or sys.argv[1] not in ("encode", "decode"):
        print("usage: opus_packet_tool.py <encode|decode> <input> <output>",
              file=sys.stderr)
        sys.exit(1)
    (encode if sys.argv[1] == "encode" else decode)(sys.argv[2], sys.argv[3])
