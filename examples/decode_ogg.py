"""Decode an .opus (Ogg Opus) file to raw f32 PCM on stdout
(reference examples/decode.rs)."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))  # runnable from anywhere

import sys

import mousiki_tpu as m


def main():
    if len(sys.argv) != 2:
        print("usage: decode_ogg.py <file.opus>", file=sys.stderr)
        sys.exit(1)
    f = m.OpusFile(open(sys.argv[1], "rb").read())
    print(f"links={f.link_count} channels={f.channel_count(0)} "
          f"pcm_total={f.pcm_total()}", file=sys.stderr)
    pcm = f.decode_all()
    sys.stdout.buffer.write(pcm.astype("<f4").tobytes())


if __name__ == "__main__":
    main()
