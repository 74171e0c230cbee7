"""CELT mode: the static 48 kHz / 960-sample configuration, built at import.

Instead of baking generated tables like reference `src/celt/
static_mode_48000_960.rs`, we construct the mode programmatically (the way
libopus's custom-mode builder does) and cache it. All derived tables
(logN, pulse cache, caps, window) are computed from first principles; the
only raw constants are the normative band layout and the psychoacoustic
allocation matrix, which every interoperable Opus implementation shares.

Parity: reference `src/celt/modes.rs`, `rate.rs` (compute_pulse_cache).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from functools import lru_cache

import numpy as np

from .cwrs import get_required_bits, log2_frac

BITRES = 3
MAX_PSEUDO = 40
LOG_MAX_PSEUDO = 6
CELT_MAX_PULSES = 128
MAX_FINE_BITS = 8
FINE_OFFSET = 21
QTHETA_OFFSET = 4
QTHETA_OFFSET_TWOPHASE = 16

# Band edges in units of (fs/400)/2-sample bins (2.5 ms MDCT at LM=0), the
# universal 21-band Bark-derived layout every Opus stream uses at 48 kHz.
EBAND5MS = [0, 1, 2, 3, 4, 5, 6, 7, 8, 10, 12, 14, 16,
            20, 24, 28, 34, 40, 48, 60, 78, 100]

# Psychoacoustic bit-allocation matrix: 11 quality rows x 21 bands, in
# 1/32 bit/sample units. Normative for interop (both sides must agree).
BAND_ALLOCATION = [
    [0] * 21,
    [90, 80, 75, 69, 63, 56, 49, 40, 34, 29, 20, 18, 10, 0, 0, 0, 0, 0, 0, 0, 0],
    [110, 100, 90, 84, 78, 71, 65, 58, 51, 45, 39, 32, 26, 20, 12, 0, 0, 0, 0, 0, 0],
    [118, 110, 103, 93, 86, 80, 75, 70, 65, 59, 53, 47, 40, 31, 23, 15, 4, 0, 0, 0, 0],
    [126, 119, 112, 104, 95, 89, 83, 78, 72, 66, 60, 54, 47, 39, 32, 25, 17, 12, 1, 0, 0],
    [134, 127, 120, 114, 103, 97, 91, 85, 78, 72, 66, 60, 54, 47, 41, 35, 29, 23, 16, 10, 1],
    [144, 137, 130, 124, 113, 107, 101, 95, 88, 82, 76, 70, 64, 57, 51, 45, 39, 33, 26, 15, 1],
    [152, 145, 138, 132, 123, 117, 111, 105, 98, 92, 86, 80, 74, 67, 61, 55, 49, 43, 36, 20, 1],
    [162, 155, 148, 142, 133, 127, 121, 115, 108, 102, 96, 90, 84, 77, 71, 65, 59, 53, 46, 30, 1],
    [172, 165, 158, 152, 143, 137, 131, 125, 118, 112, 106, 100, 94, 87, 81, 75, 69, 63, 56, 45, 20],
    [200, 200, 200, 200, 200, 200, 200, 200, 198, 193, 188, 183, 178, 173, 168, 163, 158, 153, 148, 129, 104],
]


def get_pulses(i: int) -> int:
    """Pseudo-pulse index -> pulse count (1:1 below 8, then doubling octaves)."""
    return i if i < 8 else (8 + (i & 7)) << ((i >> 3) - 1)


def fits_in32(n: int, k: int) -> bool:
    """Whether V(n, k) fits in an unsigned 32-bit integer."""
    max_n = [32767, 32767, 32767, 1476, 283, 109, 60, 40, 29, 24, 20, 18, 16, 14, 13]
    max_k = [32767, 32767, 32767, 32767, 1172, 238, 95, 53, 36, 27, 22, 18, 16, 15, 13]
    if n >= 14:
        return False if k >= 14 else n <= max_n[k]
    return k <= max_k[n]


@dataclass(frozen=True)
class PulseCache:
    index: np.ndarray  # (maxLM+2) * nbEBands, int16, -1 = band vanishes
    bits: np.ndarray   # uint8 table rows: [K, bits(1 pulse)-1, ...]
    caps: np.ndarray   # (maxLM+1) * 2 * nbEBands, uint8


@dataclass(frozen=True)
class CeltMode:
    fs: int
    overlap: int
    num_ebands: int
    effective_ebands: int
    preemph: tuple
    ebands: np.ndarray          # int16, len num_ebands+1 (units: shortMdctSize/2.5ms bins)
    max_lm: int
    num_short_mdcts: int
    short_mdct_size: int
    log_n: np.ndarray           # int16, log2 band width in 1/8 bits at LM=0
    window: np.ndarray          # float32, len overlap
    alloc_vectors: np.ndarray   # uint8 (nbAllocVectors, num_ebands)
    cache: PulseCache

    @property
    def num_alloc_vectors(self) -> int:
        return self.alloc_vectors.shape[0]

    def frame_size(self, lm: int) -> int:
        return self.short_mdct_size << lm


def compute_pulse_cache(ebands, log_n, max_lm: int) -> PulseCache:
    """Build the PVQ bits cache + per-band bit caps (parity: rate.rs:330)."""
    nb = len(ebands) - 1
    index = np.full(nb * (max_lm + 2), -1, np.int32)
    entries = []  # (n, K, offset)
    curr = 0
    for i in range(max_lm + 2):
        for j in range(nb):
            n = int(ebands[j + 1] - ebands[j])
            n = (n << i) >> 1
            row = i * nb + j
            # Reuse an existing table for any earlier band with the same width
            found = False
            for k in range(i + 1):
                for n_idx in range(nb):
                    if k == i and n_idx >= j:
                        break
                    other = (int(ebands[n_idx + 1] - ebands[n_idx]) << k) >> 1
                    if n == other:
                        index[row] = index[k * nb + n_idx]
                        found = True
                        break
                if found:
                    break
            if index[row] == -1 and n != 0:
                k = 0
                while k < MAX_PSEUDO and fits_in32(n, get_pulses(k + 1)):
                    k += 1
                entries.append((n, k, curr))
                index[row] = curr
                curr += k + 1

    bits = np.zeros(curr, np.uint8)
    for n, k, offset in entries:
        required = get_required_bits(n, get_pulses(k), BITRES)
        bits[offset] = k
        for j in range(1, k + 1):
            bits[offset + j] = required[get_pulses(j)] - 1

    caps = np.zeros((max_lm + 1) * 2 * nb, np.uint8)
    for i in range(max_lm + 1):
        for c in (1, 2):
            for j in range(nb):
                band_width = int(ebands[j + 1] - ebands[j])
                n0 = band_width
                if (n0 << i) == 1:
                    max_bits = (c * (1 + MAX_FINE_BITS)) << BITRES
                else:
                    lm0 = 0
                    if n0 > 2:
                        n0 >>= 1
                        lm0 = -1
                    elif n0 <= 1:
                        lm0 = min(i, 1)
                        n0 <<= lm0
                    row = (lm0 + 1) * nb + j
                    cache_offset = int(index[row])
                    entry_k = int(bits[cache_offset])
                    max_bits = int(bits[cache_offset + entry_k]) + 1
                    # account for theta splitting up to the target LM
                    n = n0
                    for k_iter in range(i - lm0):
                        max_bits <<= 1
                        offset = ((int(log_n[j]) + ((lm0 + k_iter) << BITRES)) >> 1) - QTHETA_OFFSET
                        num = 459 * ((2 * n - 1) * offset + max_bits)
                        den = ((2 * n - 1) << 9) - 459
                        qb = (num + (den >> 1)) // den
                        qb = min(qb, 57)
                        max_bits += qb
                        n <<= 1
                    if c == 2:
                        max_bits <<= 1
                        offset = ((int(log_n[j]) + (i << BITRES)) >> 1) - (
                            QTHETA_OFFSET_TWOPHASE if n == 2 else QTHETA_OFFSET)
                        ndof = 2 * n - 1 - (1 if n == 2 else 0)
                        scale, qb_cap = (512, 64) if n == 2 else (487, 61)
                        num = scale * (max_bits + ndof * offset)
                        den = (ndof << 9) - scale
                        qb = min((num + (den >> 1)) // den, qb_cap)
                        max_bits += qb
                    ndof = c * n + (1 if c == 2 and n > 2 else 0)
                    offset = ((int(log_n[j]) + (i << BITRES)) >> 1) - FINE_OFFSET
                    if n == 2:
                        offset += (1 << BITRES) >> 2
                    num = max_bits + ndof * offset
                    den = (ndof - 1) << BITRES
                    qb = min((num + (den >> 1)) // den, MAX_FINE_BITS)
                    max_bits += (c * qb) << BITRES
                max_bits = (4 * max_bits // (c * (band_width << i))) - 64
                assert 0 <= max_bits < 256
                caps[i * 2 * nb + (c - 1) * nb + j] = max_bits
    return PulseCache(index=index.astype(np.int16), bits=bits, caps=caps)


@lru_cache(maxsize=4)
def opus_custom_mode(fs: int = 48000, frame_size: int = 960) -> CeltMode:
    """The canonical mode: only 48kHz/960 (and its LM subdivisions) for now."""
    if fs != 48000 or frame_size not in (120, 240, 480, 960):
        raise NotImplementedError("only the canonical 48k mode family is supported")
    max_lm = 3
    short_mdct = 120
    overlap = 120
    ebands = np.array(EBAND5MS, np.int16)
    nb = len(ebands) - 1
    log_n = np.array(
        [log2_frac(int(ebands[i + 1] - ebands[i]), BITRES) for i in range(nb)],
        np.int16,
    )
    i = np.arange(overlap, dtype=np.float64)
    inner = np.sin(0.5 * math.pi * (i + 0.5) / overlap)
    window = np.sin(0.5 * math.pi * inner * inner).astype(np.float32)
    cache = compute_pulse_cache(ebands, log_n, max_lm)
    return CeltMode(
        fs=fs,
        overlap=overlap,
        num_ebands=nb,
        effective_ebands=nb,
        preemph=(0.85, 0.0, 1.0, 1.0),
        ebands=ebands,
        max_lm=max_lm,
        num_short_mdcts=1 << max_lm,
        short_mdct_size=short_mdct,
        log_n=log_n,
        window=window,
        alloc_vectors=np.array(BAND_ALLOCATION, np.uint8),
        cache=cache,
    )


def bits2pulses(mode: CeltMode, band: int, lm: int, bits: int) -> int:
    """Bit budget -> pseudo-pulse index via binary search of the cache row."""
    if bits <= 0:
        return 0
    cache_index = int(mode.cache.index[(lm + 1) * mode.num_ebands + band])
    if cache_index < 0:
        return 0
    table = mode.cache.bits[cache_index:]
    lo = 0
    hi = int(table[0])
    bits -= 1
    for _ in range(LOG_MAX_PSEUDO):
        mid = (lo + hi + 1) >> 1
        if int(table[mid]) >= bits:
            hi = mid
        else:
            lo = mid
    lo_val = -1 if lo == 0 else int(table[lo])
    if bits - lo_val <= int(table[hi]) - bits:
        return lo
    return hi


def pulses2bits(mode: CeltMode, band: int, lm: int, pulses: int) -> int:
    if pulses == 0:
        return 0
    cache_index = int(mode.cache.index[(lm + 1) * mode.num_ebands + band])
    if cache_index < 0:
        return 0
    return int(mode.cache.bits[cache_index + pulses]) + 1
