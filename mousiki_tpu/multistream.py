"""Multistream (surround) Opus: N elementary streams + channel mapping.

Parity: reference src/opus_multistream.rs (decoder:953, encoder:1716) —
packets carry nb_streams elementary packets, all but the last in
self-delimited framing; `mapping[ch]` selects the decoded channel
(255 = silent). Coupled streams are stereo, the rest mono.
"""

from __future__ import annotations

import numpy as np

from .bitstream.packet import parse_packet
from .bitstream.repacketizer import _enc_size
from .opus_decoder import OpusDecoder
from .opus_encoder import OpusEncoder


DEFAULT_SURROUND = {
    1: (1, 0, [0]),
    2: (1, 1, [0, 1]),
    3: (2, 1, [0, 2, 1]),            # L C R -> stream0 L/R, stream1 C
    4: (2, 2, [0, 1, 2, 3]),
    5: (3, 2, [0, 4, 1, 2, 3]),
    6: (4, 2, [0, 4, 1, 2, 3, 5]),
    7: (4, 3, [0, 4, 1, 2, 3, 5, 6]),
    8: (5, 3, [0, 6, 1, 2, 3, 4, 5, 7]),
}


class MultistreamDecoder:
    def __init__(self, fs: int, channels: int, streams: int,
                 coupled_streams: int, mapping: list[int]):
        if not (0 < streams and 0 <= coupled_streams <= streams
                and len(mapping) == channels):
            raise ValueError("bad layout")
        self.fs = fs
        self.channels = channels
        self.streams = streams
        self.coupled = coupled_streams
        self.mapping = list(mapping)
        self.decoders = [OpusDecoder(fs, 2 if s < coupled_streams else 1)
                         for s in range(streams)]

    def decode(self, data: bytes | None, frame_size: int) -> np.ndarray:
        outs = []
        if data is None:
            for dec in self.decoders:
                outs.append(dec.decode(None, frame_size))
        else:
            pos = 0
            for s in range(self.streams):
                self_delim = s < self.streams - 1
                parsed = parse_packet(data[pos:], self_delimited=self_delim)
                # rebuild an ordinary packet for this stream's decoder
                sub = data[pos: pos + parsed.packet_offset]
                if self_delim:
                    sub = _strip_self_delim(sub, parsed)
                outs.append(self.decoders[s].decode(sub, frame_size))
                pos += parsed.packet_offset
        # channel mapping
        n = min(o.shape[0] for o in outs)
        result = np.zeros((n, self.channels))
        decoded_channels = []
        for s, o in enumerate(outs):
            decoded_channels.append(o[:n, 0])
            if s < self.coupled:
                decoded_channels.append(o[:n, 1])
        for ch, m in enumerate(self.mapping):
            if m != 255:
                result[:, ch] = decoded_channels[m]
        return result

    @property
    def final_range(self) -> int:
        r = 0
        for d in self.decoders:
            r ^= d.final_range
        return r & 0xFFFFFFFF


def _strip_self_delim(sub: bytes, parsed) -> bytes:
    """Convert a self-delimited elementary packet to regular framing."""
    # Re-emit: TOC + frames with standard framing
    frames = parsed.frames
    toc_code = sub[0] & 0x3
    out = bytearray([sub[0]])
    if toc_code == 0:
        out[0] = (sub[0] & 0xFC) | 0
        out += frames[0]
    elif len(frames) == 2 and len(frames[0]) == len(frames[1]):
        out[0] = (sub[0] & 0xFC) | 1
        out += frames[0] + frames[1]
    elif len(frames) == 2:
        out[0] = (sub[0] & 0xFC) | 2
        out += _enc_size(len(frames[0])) + frames[0] + frames[1]
    else:
        out[0] = (sub[0] & 0xFC) | 3
        out.append(0x80 | len(frames))
        for f in frames[:-1]:
            out += _enc_size(len(f))
        for f in frames:
            out += f
    return bytes(out)


class MultistreamEncoder:
    def __init__(self, fs: int, channels: int, streams: int,
                 coupled_streams: int, mapping: list[int]):
        self.fs = fs
        self.channels = channels
        self.streams = streams
        self.coupled = coupled_streams
        self.mapping = list(mapping)
        self.encoders = [OpusEncoder(fs, 2 if s < coupled_streams else 1)
                         for s in range(streams)]

    @classmethod
    def surround(cls, fs: int, channels: int):
        streams, coupled, mapping = DEFAULT_SURROUND[channels]
        return cls(fs, channels, streams, coupled, mapping)

    def set_bitrate(self, total_bps: int):
        per = total_bps // self.streams
        for e in self.encoders:
            e.set_bitrate(per)

    def encode(self, pcm: np.ndarray, frame_size: int) -> bytes:
        # inverse mapping: stream-channel index -> input channel
        inv = {}
        for ch, m in enumerate(self.mapping):
            if m != 255:
                inv[m] = ch
        out = bytearray()
        idx = 0
        packets = []
        for s in range(self.streams):
            if s < self.coupled:
                chans = [inv.get(idx, None), inv.get(idx + 1, None)]
                idx += 2
                buf = np.zeros((frame_size, 2))
                for k, ch in enumerate(chans):
                    if ch is not None:
                        buf[:, k] = pcm[:, ch]
            else:
                ch = inv.get(idx, None)
                idx += 1
                buf = np.zeros((frame_size, 1))
                if ch is not None:
                    buf[:, 0] = pcm[:, ch]
            packets.append(self.encoders[s].encode(buf, frame_size))
        for s, pkt in enumerate(packets):
            if s < self.streams - 1:
                out += _to_self_delim(pkt)
            else:
                out += pkt
        return bytes(out)

    @property
    def final_range(self) -> int:
        r = 0
        for e in self.encoders:
            r ^= e.final_range
        return r & 0xFFFFFFFF


def _to_self_delim(pkt: bytes) -> bytes:
    """Convert a regular (code 0) packet to self-delimited framing."""
    code = pkt[0] & 0x3
    if code != 0:
        raise NotImplementedError("elementary packets are code 0 here")
    return bytes([pkt[0]]) + _enc_size(len(pkt) - 1) + pkt[1:]
