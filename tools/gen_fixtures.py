#!/usr/bin/env python
"""Generate oracle-free conformance fixtures (tests/fixtures/golden.npz).

Run with libopus installed: encodes deterministic signals with the
LIBOPUS encoder across modes/bandwidths, stores the packets plus our
decoder's PCM (which the differential suite proves equal to libopus
within 1e-4). tests/test_fixture_vectors.py then locks decode output
against these without needing the oracle — the analogue of the
reference's committed test vectors (reference tests/fixtures/*,
trivial_example.rs golden hash).
"""

import hashlib
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mousiki_tpu.opus_decoder import OpusDecoder
from mousiki_tpu.testing import oracle

CONFIGS = [
    # name, app, channels, bitrate, bandwidth(or None), frames
    ("celt_fb_stereo_128k", oracle.APP_RESTRICTED_LOWDELAY, 2, 128000, None),
    ("celt_fb_mono_64k", oracle.APP_RESTRICTED_LOWDELAY, 1, 64000, None),
    ("celt_low_48k", oracle.APP_RESTRICTED_LOWDELAY, 2, 48000, None),
    ("silk_wb_16k", oracle.APP_VOIP, 1, 16000, 1103),
    ("silk_nb_8k", oracle.APP_VOIP, 1, 8000, 1101),
    ("hybrid_swb_40k", oracle.APP_VOIP, 1, 40000, 1104),
    ("hybrid_fb_48k", oracle.APP_VOIP, 1, 48000, 1105),
    ("audio_music_96k", oracle.APP_AUDIO, 2, 96000, None),
]
N_FRAMES = 12


def main():
    assert oracle.available(), "libopus oracle required to generate"
    out = {}
    manifest = []
    for name, app, ch, br, bw in CONFIGS:
        enc = oracle.RefEncoder(48000, ch, app)
        enc.ctl_set(oracle.SET_BITRATE, br)
        if bw is not None:
            enc.ctl_set(oracle.SET_BANDWIDTH, bw)
        sig = oracle.make_test_signal(960 * (N_FRAMES + 1), ch, seed=17)
        pcm16 = oracle.float_to_i16(sig)
        pkts = [enc.encode(pcm16[f * 960:(f + 1) * 960].reshape(-1))
                for f in range(N_FRAMES)]
        # golden decode: our decoder (== libopus <= 1e-4, proven by the
        # differential suite); store float32 PCM + the final ranges
        dec = OpusDecoder(48000, ch)
        pcm = []
        ranges = []
        for p in pkts:
            pcm.append(dec.decode(p, 960).astype(np.float32))
            ranges.append(dec.final_range)
        pcm = np.concatenate(pcm, axis=0)
        lens = np.array([len(p) for p in pkts], np.int32)
        out[f"{name}__packets"] = np.frombuffer(b"".join(pkts), np.uint8)
        out[f"{name}__lens"] = lens
        out[f"{name}__pcm"] = pcm
        out[f"{name}__ranges"] = np.array(ranges, np.uint32)
        manifest.append((name, ch))
        sha = hashlib.sha256(pcm.tobytes()).hexdigest()[:16]
        print(f"{name}: {sum(lens)} packet bytes, pcm sha {sha}")
    out["__manifest_names"] = np.array([m[0] for m in manifest])
    out["__manifest_ch"] = np.array([m[1] for m in manifest], np.int32)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "fixtures", "golden.npz")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(path, **out)
    print("wrote", path, os.path.getsize(path), "bytes")


if __name__ == "__main__":
    main()
