"""Write an .opus file from arbitrary-rate PCM
(reference examples/libopusenc_example.rs)."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))  # runnable from anywhere

import sys

import numpy as np

import mousiki_tpu as m


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "tone.opus"
    rate = 44100
    t = np.arange(rate * 2) / rate
    pcm = (0.4 * np.sin(2 * np.pi * 440 * t))[:, None]
    oe = m.OpusEnc(rate, 1, bitrate=64000,
                   comments=["TITLE=tone", "ARTIST=mousiki_tpu"])
    for i in range(0, len(pcm), 4410):
        oe.write(pcm[i: i + 4410])
    open(out_path, "wb").write(oe.finish())
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
