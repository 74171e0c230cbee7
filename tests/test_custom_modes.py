"""Custom CELT modes: non-48k rates / arbitrary even frame sizes.

Parity targets: src/celt/modes.rs compute_ebands / compute_allocation_table
/ build_custom_mode (the `custom_modes` feature), celt_decoder.rs
opus_custom_decode. Layout goldens are deterministic outputs of the
normative mode-construction algorithm (identical across interoperable
implementations); round trips are self-consistency gates — custom streams
are by definition not decodable by standard Opus, so there is no oracle.
"""

import numpy as np
import pytest

from mousiki_tpu.celt.custom import (OpusCustomDecoder, OpusCustomEncoder,
                                     opus_custom_mode_create)
from mousiki_tpu.celt.modes import (EBAND5MS, compute_allocation_table,
                                    compute_ebands, opus_custom_mode)


def test_canonical_mode_unchanged():
    m = opus_custom_mode(48000, 960)
    assert m.max_lm == 3 and m.short_mdct_size == 120 and m.overlap == 120
    assert list(m.ebands) == EBAND5MS
    assert m.num_ebands == m.effective_ebands == 21
    assert m.preemph == (0.85, 0.0, 1.0, 1.0)


def test_compute_ebands_goldens():
    """Normative layout algorithm vs known-good layouts."""
    l1 = compute_ebands(48000, 480, (48000 + 480) // (2 * 480))
    assert list(l1) == [0, 2, 4, 6, 8, 10, 12, 15, 18, 22, 26, 30, 34, 40,
                        46, 54, 64, 74, 88, 106, 128, 154, 190, 240, 310,
                        400]
    l2 = compute_ebands(16000, 320, (16000 + 320) // (2 * 320))
    assert list(l2) == [0, 4, 8, 12, 16, 20, 26, 32, 38, 44, 52, 60, 70, 80,
                        92, 108, 126, 148, 176, 212, 256, 308]
    # 400*short == fs short-circuits to the canonical layout
    assert list(compute_ebands(48000, 120, 200)) == EBAND5MS


def test_allocation_interpolation_golden():
    eb = compute_ebands(48000, 240, (48000 + 240) // (2 * 240))
    t = compute_allocation_table(48000, 240, eb).reshape(-1)
    assert list(t[:25]) == [0] * 25
    assert list(t[25:50]) == [90, 85, 80, 77, 75, 72, 69, 63, 56, 49, 40,
                              34, 31, 29, 20, 18, 10, 2, 0, 0, 0, 0, 0, 0, 0]
    assert list(t[-25:]) == [200, 200, 200, 200, 200, 200, 200, 200, 200,
                             200, 200, 198, 195, 193, 188, 183, 178, 174,
                             170, 164, 159, 153, 148, 129, 104]


def test_mode_validation_errors():
    for fs, frame in [(7999, 960), (96001, 960), (48000, 38), (48000, 1026),
                      (48000, 961), (8000, 7)]:
        with pytest.raises(ValueError):
            opus_custom_mode_create(fs, frame)


def test_band_invariants_sweep():
    """Monotone edges, widths non-decreasing vs last, <=2x growth — the
    invariants the reference debug-asserts for every custom layout."""
    for fs in (8000, 11025, 16000, 22050, 24000, 32000, 44100, 96000):
        for frame in (160, 320, 480, 640, 960, 1024):
            if frame * 1000 < fs or (frame >> 3) * 300 > fs * 8:
                continue
            try:
                m = opus_custom_mode_create(fs, frame)
            except ValueError:
                continue
            eb = [int(v) for v in m.ebands]
            assert all(b > a for a, b in zip(eb, eb[1:])), (fs, frame, eb)
            last_w = eb[-1] - eb[-2]
            for i in range(1, m.num_ebands):
                assert eb[i] - eb[i - 1] <= last_w, (fs, frame, eb)
                assert eb[i + 1] - eb[i] <= 2 * (eb[i] - eb[i - 1]), \
                    (fs, frame, eb)
            assert m.overlap == (m.short_mdct_size >> 2) << 2


@pytest.mark.parametrize("fs,frame,ch", [
    (44100, 1024, 2),   # 22 bands, lm3
    (16000, 320, 1),    # canonical layout at 16 kHz
    (32000, 640, 2),
    (8000, 160, 1),     # 3-tap pre/de-emphasis response
    (96000, 960, 2),    # lm2 at 96 kHz
    (24000, 480, 1),    # 3-tap response, mid rate
])
def test_custom_roundtrip_snr_and_final_range(fs, frame, ch):
    m = opus_custom_mode_create(fs, frame)
    enc = OpusCustomEncoder(m, ch)
    dec = OpusCustomDecoder(m, ch)
    nfr = 8
    t = np.arange(frame * nfr) / fs
    sig = 0.4 * np.sin(2 * np.pi * 440 * t) + 0.2 * np.sin(2 * np.pi * 1711 * t)
    pcm_in = np.stack([sig] * ch, axis=1)
    outs = []
    for f in range(nfr):
        pkt = enc.encode_float(pcm_in[f * frame:(f + 1) * frame], 120)
        assert pkt and len(pkt) <= 120
        outs.append(dec.decode_float(pkt))
        # conformance workhorse: encoder and decoder must agree on the
        # final range state after every frame
        assert dec.final_range == enc.final_range, (fs, frame, f)
    out = np.concatenate(outs)[:, 0]
    ref = pcm_in[:, 0]
    d = m.overlap  # codec delay = one overlap
    r = ref[frame:frame * (nfr - 1) - d]
    o = out[frame + d:frame * (nfr - 1)]
    snr = 10 * np.log10(np.sum(r ** 2) / max(np.sum((o - r) ** 2), 1e-12))
    assert snr > 20.0, (fs, frame, snr)


def test_custom_plc_and_int16_entry():
    m = opus_custom_mode_create(44100, 512)
    enc = OpusCustomEncoder(m, 1)
    dec = OpusCustomDecoder(m, 1)
    t = np.arange(512 * 4) / 44100
    sig = (0.5 * np.sin(2 * np.pi * 330 * t)).reshape(-1, 1)
    for f in range(3):
        pkt = enc.encode(np.rint(sig[f * 512:(f + 1) * 512] * 32767)
                         .astype(np.int16), 100)
        out = dec.decode(pkt)
        assert out.shape == (512, 1) and out.dtype == np.int16
    lost = dec.decode(None)  # PLC frame
    assert lost.shape == (512, 1)
    assert np.abs(lost.astype(np.float64)).max() <= 32767
