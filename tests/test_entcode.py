"""Range coder tests: roundtrip across all symbol types + bit accounting.

Mirrors the reference's inline entdec/entenc tests and libopus ec_tester
semantics (SURVEY.md §4.1) without copying fixtures: randomized op tapes are
encoded then decoded and must match exactly, with consistent tell()."""

import random

import pytest

from mousiki_tpu.bitstream import RangeDecoder, RangeEncoder, laplace_decode, laplace_encode


def roundtrip_tape(seed, n_ops=200, size=1200):
    rng = random.Random(seed)
    enc = RangeEncoder(size)
    tape = []
    for _ in range(n_ops):
        kind = rng.randrange(5)
        if enc.tell() > size * 8 - 64:
            break
        if kind == 0:
            ft = rng.randrange(2, 1 << 15)
            val = rng.randrange(ft)
            enc.encode(val, val + 1, ft)
            tape.append(("ft", ft, val))
        elif kind == 1:
            bits = rng.randrange(1, 17)
            val = rng.randrange(1 << bits)
            enc.enc_bits(val, bits)
            tape.append(("bits", bits, val))
        elif kind == 2:
            ft = rng.randrange(2, 1 << 20)
            val = rng.randrange(ft)
            enc.enc_uint(val, ft)
            tape.append(("uint", ft, val))
        elif kind == 3:
            logp = rng.randrange(1, 15)
            val = rng.randrange(2)
            enc.enc_bit_logp(val, logp)
            tape.append(("bitlogp", logp, val))
        else:
            # random icdf table with 4 symbols over ftb=7
            icdf = [90, 50, 20, 0]
            val = rng.randrange(4)
            enc.enc_icdf(val, icdf, 7)
            tape.append(("icdf", tuple(icdf), val))
    enc.done()
    assert enc.error == 0
    data = enc.data()

    dec = RangeDecoder(data)
    for op in tape:
        kind = op[0]
        if kind == "ft":
            _, ft, val = op
            fs = dec.decode(ft)
            assert fs == val, (op, fs)
            dec.update(val, val + 1, ft)
        elif kind == "bits":
            _, bits, val = op
            assert dec.dec_bits(bits) == val, op
        elif kind == "uint":
            _, ft, val = op
            assert dec.dec_uint(ft) == val, op
        elif kind == "bitlogp":
            _, logp, val = op
            assert dec.dec_bit_logp(logp) == val, op
        else:
            _, icdf, val = op
            assert dec.dec_icdf(list(icdf), 7) == val, op
    return enc, dec


@pytest.mark.parametrize("seed", range(20))
def test_roundtrip_random_tapes(seed):
    roundtrip_tape(seed)


def test_tell_monotone_and_bounds():
    enc = RangeEncoder(256)
    prev = enc.tell()
    assert prev >= 0
    tells = []
    for i in range(50):
        enc.enc_bit_logp(i & 1, 3)
        t = enc.tell()
        assert t >= prev
        # tell_frac/8 rounds up to tell
        assert (enc.tell_frac() + 7) >> 3 == t or enc.tell_frac() >> 3 <= t
        tells.append(t)
        prev = t
    enc.done()
    dec = RangeDecoder(enc.data())
    for i in range(50):
        assert dec.dec_bit_logp(3) == (i & 1)
        assert dec.tell() == tells[i]


def test_uint_large_ft():
    for ft in (257, 1000, 65536, 1 << 24, (1 << 31) - 5):
        enc = RangeEncoder(64)
        vals = [0, 1, ft // 2, ft - 1]
        for v in vals:
            enc.enc_uint(v, ft)
        enc.done()
        dec = RangeDecoder(enc.data())
        for v in vals:
            assert dec.dec_uint(ft) == v


def test_laplace_roundtrip():
    cases = [(0, 10000, 8000), (1, 10000, 8000), (-1, 10000, 8000),
             (5, 6000, 12000), (-17, 4000, 14000), (30, 3000, 15000),
             (-100, 3000, 15000), (100, 3000, 15000)]
    enc = RangeEncoder(256)
    coded = []
    for v, fs, decay in cases:
        coded.append(laplace_encode(enc, v, fs, decay))
    enc.done()
    assert enc.error == 0
    dec = RangeDecoder(enc.data())
    for (v, fs, decay), cv in zip(cases, coded):
        got = laplace_decode(dec, fs, decay)
        assert got == cv, (v, cv, got)


def test_patch_initial_bits():
    enc = RangeEncoder(64)
    for i in range(20):
        enc.enc_bit_logp((i * 5 >> 1) & 1, 2)
    enc.patch_initial_bits(0b01, 2)
    enc.done()
    assert enc.error == 0
    data = enc.data()
    assert (data[0] >> 6) == 0b01


def test_shrink_preserves_tail_bits():
    enc = RangeEncoder(200)
    enc.encode(3, 4, 10)
    enc.enc_bits(0x2A, 6)
    enc.shrink(10)
    enc.done()
    dec = RangeDecoder(enc.data())
    fs = dec.decode(10)
    assert fs == 3
    dec.update(3, 4, 10)
    assert dec.dec_bits(6) == 0x2A
