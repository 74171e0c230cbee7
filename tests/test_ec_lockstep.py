"""Differential test: lockstep (S,)-lane range decoder vs the scalar
Python RangeDecoder (itself differentially tested against libopus via
final-range equality throughout the suite).

Every lane gets a different random buffer and the SAME op sequence, with
per-op random active masks, so masked pass-through is exercised too.
"""

import numpy as np
import pytest

# opt-in lane: giant CPU compiles (see pyproject addopts)
pytestmark = pytest.mark.lockstep

import jax.numpy as jnp

from mousiki_tpu.bitstream.entcode import RangeDecoder
from mousiki_tpu.bitstream.laplace import laplace_decode as py_laplace
from mousiki_tpu.ops import ec_lockstep as ec

S = 16
L = 64


def make_lanes(rng):
    bufs = rng.integers(0, 256, (S, L), dtype=np.uint8)
    lens = rng.integers(4, L + 1, S).astype(np.int32)
    for s in range(S):
        bufs[s, lens[s]:] = 0
    py = [RangeDecoder(bytes(bufs[s, :lens[s]])) for s in range(S)]
    st = ec.ec_init(jnp.asarray(bufs), jnp.asarray(lens))
    return py, st


def check_state(py, st, where=""):
    rng_v = np.asarray(st.rng)
    val_v = np.asarray(st.val)
    tell = np.asarray(ec.ec_tell(st))
    tellf = np.asarray(ec.ec_tell_frac(st))
    for s in range(S):
        assert rng_v[s] == py[s].rng, f"{where} lane {s} rng"
        assert val_v[s] == py[s].val, f"{where} lane {s} val"
        assert tell[s] == py[s].tell(), f"{where} lane {s} tell"
        assert tellf[s] == py[s].tell_frac(), f"{where} lane {s} tell_frac"


def test_init_matches():
    py, st = make_lanes(np.random.default_rng(0))
    check_state(py, st, "init")


def test_random_op_soup():
    rng = np.random.default_rng(1)
    py, st = make_lanes(rng)
    icdf_tapset = np.array([2, 1, 0], np.uint8)
    icdf_spread = np.array([25, 23, 2, 0], np.uint8)
    for step in range(60):
        op = rng.integers(0, 6)
        active_np = rng.integers(0, 2, S).astype(bool)
        if step < 4:
            active_np[:] = True
        active = jnp.asarray(active_np)
        if op == 0:
            logp = int(rng.integers(1, 16))
            got, st = ec.ec_dec_bit_logp(st, logp, active)
            got = np.asarray(got)
            for s in range(S):
                if active_np[s]:
                    assert int(got[s]) == py[s].dec_bit_logp(logp), \
                        f"step {step} bit_logp lane {s}"
        elif op == 1:
            tab, ftb = (icdf_tapset, 2) if rng.integers(2) else \
                (icdf_spread, 5)
            got, st = ec.ec_dec_icdf(st, tab, ftb, active)
            got = np.asarray(got)
            tab_py = [int(v) for v in tab]
            for s in range(S):
                if active_np[s]:
                    assert int(got[s]) == py[s].dec_icdf(tab_py, ftb), \
                        f"step {step} icdf lane {s}"
        elif op == 2:
            ft = int(rng.integers(2, 2000))
            got, st = ec.ec_dec_uint(st, jnp.full(S, ft, jnp.uint32), active)
            got = np.asarray(got)
            for s in range(S):
                if active_np[s]:
                    assert int(got[s]) == py[s].dec_uint(ft), \
                        f"step {step} uint({ft}) lane {s}"
        elif op == 3:
            bits = int(rng.integers(1, 15))
            got, st = ec.ec_dec_bits(st, jnp.full(S, bits, jnp.int32),
                                     active)
            got = np.asarray(got)
            for s in range(S):
                if active_np[s]:
                    assert int(got[s]) == py[s].dec_bits(bits), \
                        f"step {step} bits lane {s}"
        elif op == 4:
            # laplace with a realistic coarse-energy model entry
            fs0 = int(rng.integers(1, 160)) << 7
            decay = int(rng.integers(1, 255)) << 6
            got, st = ec.ec_laplace_decode(
                st, jnp.full(S, fs0, jnp.uint32),
                jnp.full(S, decay, jnp.uint32), active)
            got = np.asarray(got)
            for s in range(S):
                if active_np[s]:
                    assert int(got[s]) == py_laplace(py[s], fs0, decay), \
                        f"step {step} laplace lane {s}"
        else:
            # triangular-ish decode/update pair (theta path)
            ft = int(rng.integers(4, 600))
            fs, ext = ec.ec_decode(st, jnp.full(S, ft, jnp.uint32), active)
            fs = np.asarray(fs)
            fl_v = np.zeros(S, np.uint32)
            fh_v = np.zeros(S, np.uint32)
            for s in range(S):
                if active_np[s]:
                    fs_py = py[s].decode(ft)
                    assert int(fs[s]) == fs_py, f"step {step} decode lane {s}"
                    fl_v[s] = fs_py
                    fh_v[s] = fs_py + 1
                    py[s].update(fs_py, fs_py + 1, ft)
            st = ec.ec_dec_update(st, ext, jnp.asarray(fl_v),
                                  jnp.asarray(fh_v),
                                  jnp.full(S, ft, jnp.uint32), active)
        check_state(py, st, f"step {step} (op {op})")


def test_real_packet_prefix():
    """Run the soup over real CELT payload bytes (high-entropy suffix)."""
    pytest.importorskip("mousiki_tpu.testing.oracle")
    from mousiki_tpu.testing import oracle
    if not oracle.available():
        pytest.skip("no oracle")
    from mousiki_tpu.bitstream.packet import parse_packet
    enc = oracle.RefEncoder(48000, 2, oracle.APP_RESTRICTED_LOWDELAY)
    enc.ctl_set(oracle.SET_BITRATE, 128000)
    sig = oracle.make_test_signal(960 * (S + 1), 2, seed=3)
    pcm16 = oracle.float_to_i16(sig)
    pays = [parse_packet(enc.encode(pcm16[f * 960:(f + 1) * 960]
                                    .reshape(-1))).frames[0]
            for f in range(S)]
    Lp = max(len(p) for p in pays)
    bufs = np.zeros((S, Lp), np.uint8)
    lens = np.zeros(S, np.int32)
    for s, p in enumerate(pays):
        bufs[s, :len(p)] = np.frombuffer(p, np.uint8)
        lens[s] = len(p)
    py = [RangeDecoder(p) for p in pays]
    st = ec.ec_init(jnp.asarray(bufs), jnp.asarray(lens))
    check_state(py, st, "init")
    act = jnp.ones(S, bool)
    rng = np.random.default_rng(7)
    for step in range(40):
        op = rng.integers(0, 3)
        if op == 0:
            logp = int(rng.integers(1, 16))
            got, st = ec.ec_dec_bit_logp(st, logp, act)
            for s in range(S):
                assert int(np.asarray(got)[s]) == py[s].dec_bit_logp(logp)
        elif op == 1:
            ft = int(rng.integers(2, 1 << 14))
            got, st = ec.ec_dec_uint(st, jnp.full(S, ft, jnp.uint32), act)
            for s in range(S):
                assert int(np.asarray(got)[s]) == py[s].dec_uint(ft)
        else:
            bits = int(rng.integers(1, 20))
            got, st = ec.ec_dec_bits(st, jnp.full(S, bits, jnp.int32), act)
            for s in range(S):
                assert int(np.asarray(got)[s]) == py[s].dec_bits(bits)
        check_state(py, st, f"pkt step {step}")
