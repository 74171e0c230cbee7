"""Projection (ambisonics) enc/dec: matrix roundtrip, layout rules, ctl
payloads; decode cross-checked against libopus multistream + our demix."""

import numpy as np
import pytest

from mousiki_tpu.projection import (MappingMatrix, ProjectionDecoder,
                                    ProjectionEncoder, ProjectionError,
                                    projection_layout,
                                    write_demixing_matrix_subset)


def test_layout_rules():
    lay = projection_layout(4)
    assert (lay.streams, lay.coupled_streams, lay.order_plus_one) == (2, 2, 2)
    lay = projection_layout(9)
    assert (lay.streams, lay.coupled_streams, lay.order_plus_one) == (5, 4, 3)
    lay = projection_layout(11)  # SOA + 2 non-diegetic
    assert (lay.streams, lay.coupled_streams) == (6, 5)
    lay = projection_layout(16)
    assert lay.order_plus_one == 4
    for bad in (3, 5, 8, 1, 228):
        with pytest.raises(ProjectionError):
            projection_layout(bad)


def test_mixing_demixing_near_inverse():
    """demix(mix(x)) must reconstruct the ambisonic field (within the
    matrices' built-in scaling)."""
    for ch in (4, 9, 16):
        lay = projection_layout(ch)
        rng = np.random.default_rng(ch)
        x = rng.standard_normal((64, ch)) * 0.3
        n_in = lay.streams + lay.coupled_streams
        mixed = lay.mixing.multiply_in(x, n_in)
        back = lay.demixing.multiply_out(mixed, ch)
        gain = 10 ** (lay.demixing.gain_db_q8 / (20.0 * 256.0))
        back *= gain
        # project x onto back per channel: correlation must be ~1
        for c in range(ch):
            denom = np.linalg.norm(x[:, c]) * np.linalg.norm(back[:, c])
            if denom > 1e-9:
                corr = float(x[:, c] @ back[:, c]) / denom
                assert corr > 0.98, (ch, c, corr)


def test_demixing_subset_payload():
    lay = projection_layout(4)
    blob = write_demixing_matrix_subset(lay)
    assert len(blob) == lay.demixing_subset_size_bytes()
    sub = np.frombuffer(blob, "<i2").reshape(lay.streams + lay.coupled_streams,
                                             lay.channels).T
    assert np.array_equal(sub, lay.demixing.data[:4, :4])


def test_projection_roundtrip_foa():
    fs = 48000
    enc = ProjectionEncoder(fs, 4)
    enc.set_bitrate(256000)
    dec = ProjectionDecoder(fs, 4, enc.layout.streams,
                            enc.layout.coupled_streams,
                            demixing_matrix=enc.demixing_matrix())
    t = np.arange(fs) / fs
    # W + X/Y/Z components
    src = np.stack([0.4 * np.sin(2 * np.pi * 220 * t),
                    0.2 * np.sin(2 * np.pi * 440 * t),
                    0.2 * np.sin(2 * np.pi * 330 * t),
                    0.1 * np.sin(2 * np.pi * 550 * t)], 1)
    outs = []
    for f in range(20):
        pkt = enc.encode(src[f * 960:(f + 1) * 960], 960)
        outs.append(dec.decode(pkt, 960))
    out = np.concatenate(outs)
    gain = 10 ** (enc.layout.demixing.gain_db_q8 / (20.0 * 256.0))
    out *= gain
    a = src[: len(out)]
    # skip codec warmup, allow codec delay
    best = -99
    for lag in range(0, 400):
        b = out[lag:][: len(a) - lag]
        aa = a[: len(b)]
        err = ((aa - b) ** 2).mean()
        best = max(best, 10 * np.log10((aa ** 2).mean() / (err + 1e-12)))
    assert best > 8.0, best
