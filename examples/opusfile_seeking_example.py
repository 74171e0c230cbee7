"""Seek inside an Ogg Opus stream and read a window of samples
(reference examples/opusfile_seeking_example.rs)."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))  # runnable from anywhere

import sys

import numpy as np

import mousiki_tpu as m
from mousiki_tpu.containers.opusfile import OggOpusReader


def main():
    if len(sys.argv) >= 2:
        data = open(sys.argv[1], "rb").read()
    else:  # synthesize a file to seek in
        rate = 48000
        t = np.arange(rate * 2) / rate
        oe = m.OpusEnc(rate, 1, bitrate=64000)
        oe.write((0.4 * np.sin(2 * np.pi * 330 * t))[:, None])
        data = oe.finish()
    rd = OggOpusReader(data)
    total = rd.pcm_total()
    target = total // 2
    window = rd.read_from(target, 4800)
    print(f"pcm_total={total}, read {window.shape} at sample {target}, "
          f"rms={np.sqrt((window ** 2).mean()):.3f}")


if __name__ == "__main__":
    main()
