"""Differential tests: lockstep device CELT symbol stages 1-6 vs the
Python decoder's trace hook, on real libopus packets.

Each lane of the batch is one frame of a continuous stream; per-frame
input energy state is captured from the sequential Python decode so the
lockstep stages are tested statelessly.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from mousiki_tpu.bitstream.packet import parse_packet
from mousiki_tpu.celt.decoder import CeltDecoder
from mousiki_tpu.ops import celt_lockstep as ls
from mousiki_tpu.testing import oracle

# opt-in lane: giant CPU compiles (see pyproject addopts)
pytestmark = [pytest.mark.lockstep,
              pytest.mark.skipif(not oracle.available(),
                                reason="libopus oracle missing")]


def collect(channels, bitrate, n_frames=24, kind="mix", seed=3,
            transient=False):
    """Encode a stream, decode sequentially with trace; return batch."""
    frame_size = 960
    enc = oracle.RefEncoder(48000, channels, oracle.APP_RESTRICTED_LOWDELAY)
    enc.ctl_set(oracle.SET_BITRATE, bitrate)
    dec = CeltDecoder(channels=channels, stream_channels=channels, end=21,
                      disable_inv=channels == 1)
    if transient:
        rng = np.random.default_rng(7)
        n = frame_size * (n_frames + 1)
        sig = np.zeros((n, channels), np.float32)
        for pos in range(500, n - 100, 777):
            sig[pos:pos + 60] += (rng.standard_normal((60, channels))
                                  * 0.6).astype(np.float32)
        sig = np.clip(sig, -0.9, 0.9)
    else:
        sig = oracle.make_test_signal(frame_size * (n_frames + 1), channels,
                                      kind=kind, seed=seed)
    pcm16 = oracle.float_to_i16(sig)
    pkts, traces, energies = [], [], []
    for f in range(n_frames):
        pkt = enc.encode(
            pcm16[f * frame_size:(f + 1) * frame_size].reshape(-1))
        p = parse_packet(pkt)
        energies.append(dec.old_ebands.copy())
        tr = {}
        dec.decode_with_ec(p.frames[0], frame_size, trace=tr)
        pkts.append(p.frames[0])
        traces.append(tr)
    L = max(len(p) for p in pkts)
    buf = np.zeros((n_frames, L), np.uint8)
    storage = np.zeros(n_frames, np.int32)
    for s, p in enumerate(pkts):
        buf[s, :len(p)] = np.frombuffer(p, np.uint8)
        storage[s] = len(p)
    return buf, storage, np.stack(energies), traces


def run_stages(buf, storage, energies, C):
    return ls.decode_symbols(jnp.asarray(buf), jnp.asarray(storage),
                             jnp.asarray(energies, jnp.float32), C=C)


@pytest.mark.parametrize("channels,bitrate,kind,transient", [
    (1, 32000, "mix", False),
    (1, 64000, "mix", False),
    (1, 128000, "tone", False),
    (2, 64000, "mix", False),
    (2, 96000, "mix", False),
    (2, 192000, "mix", False),
    (2, 96000, "mix", True),
    (1, 96000, "mix", True),
    (2, 510000, "mix", False),
    (1, 8000, "mix", False),
    (2, 12000, "noise", False),
])
def test_symbol_stages(channels, bitrate, kind, transient):
    buf, storage, energies, traces = collect(channels, bitrate,
                                             kind=kind, transient=transient)
    hdr, energy, tf_res, spread, offsets, trim, alloc, st = run_stages(
        buf, storage, energies, channels)
    hdr = [np.asarray(x) for x in hdr]
    energy = np.asarray(energy)
    tf_res = np.asarray(tf_res)
    spread = np.asarray(spread)
    offsets = np.asarray(offsets)
    trim = np.asarray(trim)
    pulses = np.asarray(alloc.pulses)
    ebits = np.asarray(alloc.ebits)
    fprio = np.asarray(alloc.fine_priority)
    coded = np.asarray(alloc.coded_bands)
    balance = np.asarray(alloc.balance)
    intensity = np.asarray(alloc.intensity)
    dual = np.asarray(alloc.dual_stereo)
    ac_rsv = np.asarray(alloc.anti_collapse_rsv)
    tell = np.asarray(st.nbits_total - np.asarray(
        [0])) if False else None
    from mousiki_tpu.ops import ec_lockstep as ecls
    tells = np.asarray(ecls.ec_tell(st))

    for s, tr in enumerate(traces):
        where = f"lane {s}"
        assert hdr[0][s] == tr["silence"], where
        if tr["silence"]:
            continue
        assert hdr[1][s] == tr["pf_pitch"], where
        assert abs(hdr[2][s] - tr["pf_gain"]) < 1e-6, where
        assert hdr[3][s] == tr["pf_tapset"], where
        assert hdr[4][s] == tr["transient"], where
        assert hdr[5][s] == tr["intra"], where
        assert list(tf_res[s]) == tr["tf_res"], where
        assert spread[s] == tr["spread"], where
        assert list(offsets[s]) == tr["offsets"], where
        assert trim[s] == tr["trim"], where
        a = tr["alloc"]
        assert list(pulses[s]) == a.pulses, where
        assert list(ebits[s]) == a.ebits, where
        assert list(fprio[s]) == a.fine_priority, where
        assert coded[s] == a.coded_bands, where
        assert balance[s] == a.balance, where
        assert intensity[s] == a.intensity, where
        assert dual[s] == a.dual_stereo, where
        assert ac_rsv[s] == tr["anti_collapse_rsv"], where
        assert tells[s] == tr["tell_post_fine"], where
        np.testing.assert_allclose(
            energy[s, :, :], tr["fine"][: energy.shape[1]], atol=2e-4,
            err_msg=where)
