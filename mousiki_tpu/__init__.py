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

__all__ = [
    "Application", "Bandwidth", "Channels", "Decoder", "Encoder",
    "FrameDuration", "MultistreamDecoder", "MultistreamEncoder",
    "OggOpusReader", "OggOpusWriter", "OpusDecoder", "OpusEncoder",
    "OpusEnc", "OpusFile", "Repacketizer", "Signal",
]


def __getattr__(name):
    # lazy re-exports so `import mousiki_tpu` stays light (jax loads on use)
    if name in ("Encoder", "Decoder", "Application", "Bandwidth", "Channels",
                "Signal", "FrameDuration"):
        from . import codec
        return getattr(codec, name)
    if name in ("OpusEncoder",):
        from .opus_encoder import OpusEncoder
        return OpusEncoder
    if name in ("OpusDecoder",):
        from .opus_decoder import OpusDecoder
        return OpusDecoder
    if name in ("MultistreamEncoder", "MultistreamDecoder"):
        from . import multistream
        return getattr(multistream, name)
    if name in ("OggOpusReader", "OggOpusWriter", "OpusFile", "OpusEnc"):
        from .containers import opusfile
        return getattr(opusfile, name)
    if name == "Repacketizer":
        from .bitstream.repacketizer import Repacketizer
        return Repacketizer
    raise AttributeError(f"module 'mousiki_tpu' has no attribute {name!r}")
