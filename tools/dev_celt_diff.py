"""Dev harness: decode libopus-generated CELT-only packets with our decoder
and diff PCM against libopus's own float decode."""

import numpy as np

from mousiki_tpu.testing import oracle
from mousiki_tpu.bitstream.packet import parse_packet
from mousiki_tpu.celt.decoder import CeltDecoder

FS = 48000
CH = 2
FRAMES = 20

enc = oracle.RefEncoder(FS, CH, oracle.APP_RESTRICTED_LOWDELAY)
enc.ctl_set(oracle.SET_BITRATE, 96000)
ref = oracle.RefDecoder(FS, CH)

sig = oracle.make_test_signal(FS, CH, FS)
pcm16 = oracle.float_to_i16(sig)

dec = CeltDecoder(channels=CH, stream_channels=CH, downsample=1, end=21)

worst = 0.0
for f in range(FRAMES):
    frame = pcm16[f * 960:(f + 1) * 960].reshape(-1)
    pkt = enc.encode(frame)
    p = parse_packet(pkt)
    assert p.mode.name == "CELT", p.mode
    ref_pcm = ref.decode_float(pkt, 960)
    my_pcm = dec.decode_with_ec(p.frames[0], 960)
    err = np.abs(my_pcm - ref_pcm).max()
    rms = np.sqrt(np.mean(ref_pcm ** 2)) + 1e-12
    print(f"frame {f}: pkt={len(pkt)}B maxerr={err:.3e} rel={err/rms:.3e}")
    worst = max(worst, err / rms)
print("worst rel err:", worst)
