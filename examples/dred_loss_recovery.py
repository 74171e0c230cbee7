"""DRED loss recovery demo: encode speech with deep redundancy, drop
packets in transit, and recover the lost audio from the next packet's
embedded DRED payload through the neural concealment path.

(reference surface: opus_demo's -dred option + dred.rs public API)
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))  # runnable from anywhere

import numpy as np


def main():
    import jax

    from mousiki_tpu.models.fargan import random_model
    from mousiki_tpu.opus_decoder import OpusDecoder
    from mousiki_tpu.opus_encoder import APP_VOIP, OpusEncoder

    fs, n_frames = 48000, 25
    t = np.arange(960 * n_frames) / fs
    f0 = 140 + 25 * np.sin(2 * np.pi * 2.0 * t)
    sig = (0.35 * np.sin(2 * np.pi * np.cumsum(f0) / fs)
           * (0.6 + 0.4 * np.sin(2 * np.pi * 3.5 * t) ** 2)
           ).astype(np.float32)[:, None]

    enc = OpusEncoder(fs, 1, APP_VOIP)
    enc.set_bitrate(24000)
    enc.set_dred_duration(40)   # embed ~400 ms of redundancy per packet
    packets = [enc.encode(sig[f * 960:(f + 1) * 960], 960)
               for f in range(n_frames)]
    dred_bytes = sum(len(p) for p in packets)
    print(f"encoded {n_frames} packets, {dred_bytes} bytes total "
          f"(DRED embedded as extension id 126 in packet padding)")

    dec = OpusDecoder(fs, 1)
    # synthetic FARGAN weights here; load a real blob via
    # models.fargan.from_blob(parse_weight_blob(open(path,'rb').read()))
    dec.set_deep_plc(random_model(jax.random.PRNGKey(0)))

    lost = {12, 13}   # 40 ms burst loss
    out = []
    f = 0
    while f < n_frames:
        if f in lost:
            # find the next received packet carrying DRED for this gap
            nxt = f
            while nxt in lost:
                nxt += 1
            dred = dec.dred_parse(packets[nxt])
            gap = [g for g in range(f, nxt)]
            if dred is not None:
                dec.dred_process(dred)
                for i, g in enumerate(gap):
                    off = 2 * (len(gap) - i)  # 10 ms units before "now"
                    out.append(dec.dred_decode(dred, off, 960))
                print(f"frames {gap}: recovered via DRED "
                      f"({dred.nb_latents} latents in packet {nxt})")
            else:
                for g in gap:
                    out.append(dec.decode(None, 960))
                print(f"frames {gap}: no DRED found, classic PLC")
            f = nxt
            continue
        out.append(dec.decode(packets[f], 960))
        f += 1
    pcm = np.concatenate(out)
    print(f"decoded {len(pcm)} samples, rms={np.sqrt((pcm ** 2).mean()):.3f}")


if __name__ == "__main__":
    main()
