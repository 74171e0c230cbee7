"""The TPU serving path: decode S parallel CELT streams end to end
through the native host symbol stage + jitted device synthesis
(this framework's flagship pipeline; no reference equivalent — the
reference decodes one stream per call)."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))  # runnable from anywhere

import sys

import numpy as np

from mousiki_tpu.opus_encoder import OpusEncoder
from mousiki_tpu.pipeline import CeltStreamPipeline


def main():
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    enc = OpusEncoder(48000, 2)
    enc.set_bitrate(96000)
    t = np.arange(960 * 25) / 48000.0
    sig = np.stack([0.3 * np.sin(2 * np.pi * 440 * t),
                    0.3 * np.sin(2 * np.pi * 660 * t)], 1)
    pkts = [enc.encode(sig[f * 960:(f + 1) * 960], 960) for f in range(25)]
    payloads = [p[1:] for p in pkts]  # strip TOC: pipeline takes payloads

    pipe = CeltStreamPipeline(S)
    for pl in payloads:
        out = pipe.step([pl] * S)
    print(f"decoded {len(payloads)} frames x {S} streams -> "
          f"last block {np.asarray(out).shape}")


if __name__ == "__main__":
    main()
