"""Differential tests: lockstep device band-tree walk (stage 7) vs the
Python decoder's plan recorder, on real libopus packets."""

import numpy as np
import pytest

import jax.numpy as jnp

from mousiki_tpu.bitstream.packet import parse_packet
from mousiki_tpu.celt.decoder import CeltDecoder
from mousiki_tpu.celt.plan import FOLD, NOISE, PVQ
from mousiki_tpu.ops import celt_lockstep as ls
from mousiki_tpu.ops import celt_lockstep_walk as lw
from mousiki_tpu.ops import ec_lockstep as ecl
from mousiki_tpu.testing import oracle

# opt-in lane: giant CPU compiles (see pyproject addopts)
pytestmark = [pytest.mark.lockstep,
              pytest.mark.skipif(not oracle.available(),
                                reason="libopus oracle missing")]

FRAME = 960
LM = 3


def collect(channels, bitrate, n_frames=20, kind="mix", seed=3,
            transient=False):
    enc = oracle.RefEncoder(48000, channels, oracle.APP_RESTRICTED_LOWDELAY)
    enc.ctl_set(oracle.SET_BITRATE, bitrate)
    dec = CeltDecoder(channels=channels, stream_channels=channels, end=21,
                      disable_inv=channels == 1)
    if transient:
        rng = np.random.default_rng(11)
        n = FRAME * (n_frames + 1)
        sig = np.zeros((n, channels), np.float32)
        for pos in range(500, n - 100, 777):
            sig[pos:pos + 60] += (rng.standard_normal((60, channels))
                                  * 0.6).astype(np.float32)
        sig = np.clip(sig, -0.9, 0.9)
    else:
        sig = oracle.make_test_signal(FRAME * (n_frames + 1), channels,
                                      kind=kind, seed=seed)
    pcm16 = oracle.float_to_i16(sig)
    pkts, traces, plans, energies = [], [], [], []
    for f in range(n_frames):
        pkt = enc.encode(pcm16[f * FRAME:(f + 1) * FRAME].reshape(-1))
        p = parse_packet(pkt)
        energies.append(dec.old_ebands.copy())
        tr = {}
        desc = dec.decode_with_ec(p.frames[0], FRAME, trace=tr,
                                  record_plan=True, return_desc=True)
        pkts.append(p.frames[0])
        traces.append(tr)
        plans.append(desc["plan"])
    L = max(len(p) for p in pkts)
    buf = np.zeros((n_frames, L), np.uint8)
    storage = np.zeros(n_frames, np.int32)
    for s, p in enumerate(pkts):
        buf[s, :len(p)] = np.frombuffer(p, np.uint8)
        storage[s] = len(p)
    return buf, storage, np.stack(energies), traces, plans


def run_walk(buf, storage, energies, C, n_iter=1500):
    hdr, energy, tf_res, spread, offsets, trim, alloc, st = \
        ls.decode_symbols(jnp.asarray(buf), jnp.asarray(storage),
                          jnp.asarray(energies, jnp.float32), C=C)
    total_f = ((st.storage * 8) << 3) - alloc.anti_collapse_rsv
    S = buf.shape[0]
    emits, carry, all_done = lw.walk_bands(
        st, jnp.ones(S, bool), C=C, lm=LM, transient=hdr.transient,
        tf_res=tf_res, spread=spread, alloc=alloc,
        total_bits_frac=total_f,
        disable_inv=jnp.full(S, C == 1), n_iter=n_iter)
    return hdr, energy, tf_res, spread, alloc, emits, carry, all_done


def plan_leaves_by_slot(plan, lay, C):
    """Map FramePlan PVQ/fill leaves to lockstep global slot ids."""
    out = {}
    fills = []
    nbase = None
    from mousiki_tpu.celt.modes import opus_custom_mode
    mode = opus_custom_mode(48000, 960)
    eb = [int(v) for v in mode.ebands]
    band_start = [8 * e for e in eb]

    def slot_of(dst, n):
        ch = dst // FRAME
        off = dst - ch * FRAME
        band = max(i for i in range(21) if band_start[i] <= off)
        rel = off - band_start[band]
        nb = band_start[band + 1] - band_start[band]
        d = 0
        while (nb >> d) != n:
            d += 1
            assert d < 6, (dst, n)
        pos = rel // n
        nid = (1 << d) + pos
        return ch * lay.nslot + int(lay.base[band]) + nid - 1

    for kind, op in plan.ops:
        if kind != "call":
            continue
        for lf in op.leaves:
            if lf.kind == PVQ:
                out[slot_of(lf.dst, lf.n)] = lf
            elif lf.kind in (FOLD, NOISE):
                fills.append((slot_of(lf.dst, lf.n), lf))
    return out, fills


@pytest.mark.parametrize("channels,bitrate,kind,transient", [
    (1, 64000, "mix", False),
    (1, 32000, "mix", False),
    (1, 128000, "mix", False),
    (1, 96000, "mix", True),
    (2, 96000, "mix", False),
    (2, 64000, "mix", False),
    (2, 192000, "mix", False),
    (2, 96000, "mix", True),
    (2, 320000, "tone", False),
    (1, 16000, "noise", False),
])
def test_walk_leaves(channels, bitrate, kind, transient):
    buf, storage, energies, traces, plans = collect(
        channels, bitrate, transient=transient)
    hdr, energy, tf_res, spread, alloc, emits, carry, all_done = \
        run_walk(buf, storage, energies, channels)
    assert bool(all_done)
    lay = lw.walk_layout(LM)
    S = buf.shape[0]
    e_slot = np.asarray(emits.slot)        # (T, S)
    e_split = np.asarray(emits.split)
    e_k = np.asarray(emits.k)
    e_idx = np.asarray(emits.idx)
    e_gain = np.asarray(emits.gain)
    e_rank = np.asarray(emits.rank)
    tells = np.asarray(ecl.ec_tell(carry.st))

    for s in range(S):
        tr = traces[s]
        if tr["silence"]:
            continue
        truth, truth_fills = plan_leaves_by_slot(plans[s], lay, channels)
        mine = {}
        mine_fills = {}
        for t in range(e_slot.shape[0]):
            sl = e_slot[t, s]
            if sl < 0 or e_split[t, s]:
                continue
            if e_k[t, s] > 0:
                mine[sl] = (e_k[t, s], e_idx[t, s], e_gain[t, s])
            elif e_rank[t, s] >= 0:
                mine_fills[sl] = (e_rank[t, s], e_gain[t, s])
        t_pvq = {sl: (lf.k, lf.idx & 0xFFFFFFFF, lf.gain)
                 for sl, lf in truth.items()}
        assert set(mine.keys()) == set(t_pvq.keys()), \
            f"lane {s}: pvq slots {sorted(mine)} vs {sorted(t_pvq)}"
        for sl in mine:
            mk, mi, mg = mine[sl]
            tk, ti, tg = t_pvq[sl]
            assert mk == tk and mi == ti, (s, sl, mine[sl], t_pvq[sl])
            assert abs(mg - tg) < 1e-4 * max(1.0, abs(tg)), (s, sl, mg, tg)
        # fill leaves: the plan records only NONZERO fills (zero fills are
        # silent); the walk emits every q==0 leaf and resolves zero/fold/
        # noise in pass 2 — so truth must be a subset, in visit order.
        t_fill_slots = {sl for sl, _ in truth_fills}
        assert t_fill_slots <= set(mine_fills.keys()), \
            f"lane {s}: fill slots {sorted(mine_fills)} vs {sorted(t_fill_slots)}"
        t_order = [sl for sl, _ in truth_fills]
        t_ranks = [mine_fills[sl][0] for sl in t_order]
        assert t_ranks == sorted(t_ranks), f"lane {s} fill order"
        # EC position after the band loop (before the anti-collapse bit)
        expected = tr["tell_post_bands"]
        if tr["anti_collapse_rsv"] > 0:
            expected -= 1
        assert tells[s] == expected, \
            f"lane {s}: tell {tells[s]} vs {expected}"
