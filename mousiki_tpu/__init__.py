"""mousiki_tpu — a TPU-native Opus codec pipeline built from scratch in JAX.

Architecture (see SURVEY.md §7):
  * All inherently-serial bitstream work (range coding, TOC/framing, symbol
    decode) runs host-side and produces struct-of-arrays *frame descriptors*.
  * All per-frame DSP (IMDCT synthesis, PVQ denormalisation, SILK LPC/LTP
    synthesis, postfilter, resamplers, neural nets) runs as batched, jitted
    JAX/XLA/Pallas code over thousands of concurrent streams.

Capability parity target: cijiugechu/mousiki (a pure-Rust libopus), i.e. a
full Opus encoder/decoder (SILK/CELT/hybrid, 8-48 kHz, mono/stereo, FEC/PLC/
DTX/CNG), multistream/projection, repacketizer/extensions, neural DRED +
Deep-PLC/FARGAN, and Ogg container I/O.
"""

__version__ = "0.1.0"
