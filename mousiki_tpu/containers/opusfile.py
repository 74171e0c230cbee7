"""Ogg Opus file read/write (opusfile + libopusenc equivalents).

Parity targets: reference `src/opusfile/` (whole-file decode, seek, tags)
and `src/libopusenc/` (Ogg muxing, headers); RFC 7845 framing.
"""

from __future__ import annotations

import numpy as np

from .ogg import (OggStreamReader, OggStreamWriter, opus_head, opus_tags,
                  parse_opus_head)


class OggOpusWriter:
    """Minimal libopusenc equivalent: packets -> .opus byte stream."""

    def __init__(self, channels: int, preskip: int = 312, serial: int = 0x6d6b74,
                 vendor: str = "mousiki_tpu", comments=None):
        self.channels = channels
        self.preskip = preskip
        self.writer = OggStreamWriter(serial)
        self.pages = [
            self.writer.page_out([opus_head(channels, preskip)], 0, bos=True),
            self.writer.page_out([opus_tags(vendor, comments)], 0),
        ]
        self.granule = preskip
        self._pending: list[bytes] = []
        self._pending_samples = 0

    def write_packet(self, packet: bytes, samples_48k: int,
                     flush: bool = False) -> None:
        self._pending.append(packet)
        self._pending_samples += samples_48k
        # one page per ~1s of audio or 50 packets
        if flush or self._pending_samples >= 48000 or len(self._pending) >= 50:
            self._flush_page(False)

    def _flush_page(self, eos: bool) -> None:
        if not self._pending and not eos:
            return
        self.granule += self._pending_samples
        self.pages.append(self.writer.page_out(self._pending, self.granule,
                                               eos=eos))
        self._pending = []
        self._pending_samples = 0

    def finish(self) -> bytes:
        self._flush_page(True)
        return b"".join(self.pages)


class OggOpusReader:
    """Minimal opusfile equivalent: .opus bytes -> packets / decoded PCM."""

    def __init__(self, data: bytes):
        self.stream = OggStreamReader(data)
        head_pkt = self.stream.next_packet()
        if head_pkt is None:
            raise ValueError("no OpusHead")
        self.head = parse_opus_head(head_pkt[0])
        tags_pkt = self.stream.next_packet()
        self.tags_raw = tags_pkt[0] if tags_pkt else b""
        self.channels = self.head["channels"]
        self.preskip = self.head["preskip"]

    def packets(self):
        while True:
            p = self.stream.next_packet()
            if p is None:
                return
            yield p

    def decode_all(self, decoder=None) -> np.ndarray:
        """Decode the whole stream to float PCM at 48 kHz."""
        from ..bitstream.packet import packet_get_nb_samples
        from ..opus_decoder import OpusDecoder

        dec = decoder or OpusDecoder(48000, self.channels)
        out = []
        for pkt, _gran in self.packets():
            n = packet_get_nb_samples(pkt, 48000)
            out.append(dec.decode(pkt, n))
        if not out:
            return np.zeros((0, self.channels))
        pcm = np.concatenate(out)
        gain = self.head["gain_q8"]
        if gain:
            pcm = pcm * (10.0 ** (gain / (20.0 * 256.0)))
        return pcm[self.preskip:]

    # -- seeking (opusfile pcm_seek parity, reader.rs:275-293) ------------
    def pcm_total(self) -> int:
        """Total 48 kHz samples after preskip (scans granule positions)."""
        last = 0
        for _pkt, gran in self.packets():
            if gran is not None and gran > 0:
                last = gran
        self.stream.reset()
        self.stream.next_packet()  # head
        self.stream.next_packet()  # tags
        return max(0, last - self.preskip)

    def pcm_seek(self, target: int, decoder=None):
        """Seek to an absolute 48 kHz sample offset (post-preskip domain).

        Rewinds, skips packets whose page granule ends before the target,
        re-primes the decoder with up to 200 ms of preroll (the reference
        decodes ahead after a raw seek to rebuild state), and returns a
        decoder positioned so the next decoded sample is `target`; also
        returns the number of samples to trim from the first decode."""
        from ..bitstream.packet import packet_get_nb_samples
        from ..opus_decoder import OpusDecoder

        dec = decoder or OpusDecoder(48000, self.channels)
        target_abs = target + self.preskip
        self.stream.reset()
        self.stream.next_packet()  # head
        self.stream.next_packet()  # tags

        # collect packets with running sample offsets
        entries = []
        pos = 0
        for pkt, _gran in self.packets():
            n = packet_get_nb_samples(pkt, 48000)
            entries.append((pos, n, pkt))
            pos += n
        # find the packet containing the target; preroll (state re-prime)
        idx = 0
        for i, (p0, n, _pkt) in enumerate(entries):
            if p0 + n > target_abs:
                idx = i
                break
        else:
            idx = max(0, len(entries) - 1)
        start = max(0, idx - 10)
        for p0, n, pkt in entries[start:idx]:
            dec.decode(pkt, n)
        trim = target_abs - entries[idx][0] if entries else 0
        self._seek_entries = entries[idx:]
        return dec, trim

    def read_from(self, target: int, n_samples: int, decoder=None) -> np.ndarray:
        """Seek + decode n_samples at `target` (post-preskip 48 kHz)."""
        dec, trim = self.pcm_seek(target, decoder)
        out = []
        got = -trim
        for _p0, n, pkt in self._seek_entries:
            out.append(dec.decode(pkt, n))
            got += n
            if got >= n_samples:
                break
        if not out:
            return np.zeros((0, self.channels))
        pcm = np.concatenate(out)[trim: trim + n_samples]
        gain = self.head["gain_q8"]
        if gain:
            pcm = pcm * (10.0 ** (gain / (20.0 * 256.0)))
        return pcm
