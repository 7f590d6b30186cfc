"""Canonical k-mer extraction over 2-bit packed sequence (host, vectorised).

Replaces the reference's per-base rolling KmerPair<k> update
(Kmer.tpp:30-283: bitset<2k> forward + reverse-complement rolled one
nucleotide at a time) with an O(L log k) doubling-window construction that
computes *all* k-mer values of a sequence in ~10 vectorised numpy passes —
the same trick a Pallas kernel uses on device (log-depth scan instead of a
sequential carry).

Representation: a k<=55-mer is a pair of uint64 lanes
    hi = value of bases[0:27]   (big-endian base order, 54 bits)
    lo = value of bases[27:55]  (56 bits)
so lexicographic order on (hi, lo) equals lexicographic order on the base
string. The canonical form is min(forward, reverse-complement), matching the
reference's "lowest of the two" rule (Kmer.tpp:226-255; the exact tie order
only needs to be internally consistent).

Encoding: A=0, C=1, G=2, T=3 (Nucleotide.hpp:40-70 uses the same 2-bit
alphabet); any other byte invalidates every window containing it
(Kmer.tpp:45-74).
"""

from __future__ import annotations

import numpy as np

from ..constants import KMER_SIZE

# byte -> 2-bit code lookup; 255 = invalid
_CODE_LUT = np.full(256, 255, dtype=np.uint8)
for i, b in enumerate(b"ACGT"):
    _CODE_LUT[b] = i
for i, b in enumerate(b"acgt"):
    _CODE_LUT[b] = i

_DECODE = np.frombuffer(b"ACGT", dtype=np.uint8)


def encode_bases(seq: bytes | np.ndarray):
    """Sequence bytes -> (codes uint8 [L], valid bool [L])."""
    arr = np.frombuffer(seq, dtype=np.uint8) if isinstance(seq, (bytes, bytearray)) else np.asarray(seq, np.uint8)
    codes = _CODE_LUT[arr]
    valid = codes != 255
    return np.where(valid, codes, 0).astype(np.uint8), valid


def decode_kmer(hi: int, lo: int, k: int = KMER_SIZE) -> str:
    """Debug helper: (hi, lo) -> base string."""
    n_hi = min(27, k)
    n_lo = k - n_hi
    out = []
    for j in range(n_hi):
        out.append(int((hi >> (2 * (n_hi - 1 - j))) & 3))
    for j in range(n_lo):
        out.append(int((lo >> (2 * (n_lo - 1 - j))) & 3))
    return bytes(_DECODE[out]).decode()


def _windows_be(codes64, lengths_needed, max_n):
    """Big-endian doubling windows: W[n][i] = sum_{j<n} codes[i+j] * 4^(n-1-j).

    Returns dict n -> uint64 array of length L (positions beyond L-n are
    garbage; callers mask with validity).
    """
    w = {1: codes64}
    n = 1
    while n < max_n:
        cur = w[n]
        shifted = np.empty_like(cur)
        shifted[:-n] = cur[n:]
        shifted[-n:] = 0
        w[2 * n] = (cur << np.uint64(2 * n)) | shifted
        n *= 2
    return w


def _windows_le(codes64, max_n):
    """Little-endian complemented windows: V[n][i] = sum_{j<n} (3-codes[i+j]) * 4^j."""
    v = {1: np.uint64(3) - codes64}
    n = 1
    while n < max_n:
        cur = v[n]
        shifted = np.empty_like(cur)
        shifted[:-n] = cur[n:]
        shifted[-n:] = 0
        v[2 * n] = cur | (shifted << np.uint64(2 * n))
        n *= 2
    return v


def _compose_be(w, start, length):
    """Value of `length` bases starting at offset `start` from doubling windows."""
    total = None
    pos = start
    remaining = length
    for n in (64, 32, 16, 8, 4, 2, 1):
        if n > remaining or n not in w:
            continue
        while remaining >= n:
            part = np.empty_like(w[n])
            if pos == 0:
                part[:] = w[n]
            else:
                part[:-pos] = w[n][pos:]
                part[-pos:] = 0
            total = part if total is None else ((total << np.uint64(2 * n)) | part)
            pos += n
            remaining -= n
    assert remaining == 0
    return total if total is not None else np.zeros_like(w[1])


def _compose_le(v, start, length):
    """Little-endian compose: sum_{j<length} (3-codes[start+i+j]) * 4^j."""
    total = None
    shift = 0
    pos = start
    remaining = length
    for n in (64, 32, 16, 8, 4, 2, 1):
        if n > remaining or n not in v:
            continue
        while remaining >= n:
            part = np.empty_like(v[n])
            if pos == 0:
                part[:] = v[n]
            else:
                part[:-pos] = v[n][pos:]
                part[-pos:] = 0
            contrib = part << np.uint64(2 * shift)
            total = contrib if total is None else (total | contrib)
            shift += n
            pos += n
            remaining -= n
    assert remaining == 0
    return total if total is not None else np.zeros_like(v[1])


def kmer_lanes(codes, valid, k: int = KMER_SIZE):
    """All k-mers of a sequence as canonical uint64 lane pairs.

    Dispatches to the native C++ rolling kernel when available (bit-identical;
    tests/test_native.py), falling back to the numpy doubling-window path.

    Args:
      codes: [L] uint8 2-bit codes; valid: [L] bool.
    Returns:
      (hi, lo, ok): uint64 [L-k+1] canonical lanes + validity mask.
    """
    from .. import native

    if codes.shape[0] >= k and native.available():
        return native.kmer_lanes(codes, valid, k)
    return _kmer_lanes_numpy(codes, valid, k)


def _kmer_lanes_numpy(codes, valid, k: int = KMER_SIZE):
    length = codes.shape[0]
    if length < k:
        z = np.zeros(0, dtype=np.uint64)
        return z, z, np.zeros(0, dtype=bool)

    n_hi = min(27, k)
    n_lo = k - n_hi

    c64 = codes.astype(np.uint64)
    w = _windows_be(c64, None, 32)
    v = _windows_le(c64, 32)

    f_hi = _compose_be(w, 0, n_hi)
    f_lo = _compose_be(w, n_hi, n_lo) if n_lo else np.zeros_like(f_hi)
    # reverse complement halves: rc_hi = V_{n_hi}[i + n_lo], rc_lo = V_{n_lo}[i]
    r_hi_full = _compose_le(v, n_lo, n_hi)
    r_lo = _compose_le(v, 0, n_lo) if n_lo else np.zeros_like(f_hi)

    num = length - k + 1
    f_hi, f_lo = f_hi[:num], f_lo[:num]
    r_hi, r_lo = r_hi_full[:num], r_lo[:num]

    fwd_smaller = (f_hi < r_hi) | ((f_hi == r_hi) & (f_lo <= r_lo))
    hi = np.where(fwd_smaller, f_hi, r_hi)
    lo = np.where(fwd_smaller, f_lo, r_lo)

    inv = (~valid).astype(np.int32)
    csum = np.concatenate([[0], np.cumsum(inv)])
    ok = (csum[k:] - csum[:-k]) == 0
    return hi, lo, ok


# --- 64-bit mixing for hashing lane pairs (bloom filters / table sharding) ---

def lane_search(table_hi, table_lo, hi, lo):
    """Exact vectorised lexicographic binary search over a (hi, lo)-lexsorted
    lane table. Returns int64 indices into the table, -1 where absent.

    Replaces the reference's per-leaf binary search (LinearMap.tpp:123-212)
    with two searchsorted passes: the hi lane bounds the run, then a manual
    vectorised binary search resolves lo inside each run — exact for runs of
    any length (repetitive sequence can share one hi prefix thousands deep).
    """
    n = len(table_hi)
    out = np.full(len(hi), -1, dtype=np.int64)
    if n == 0 or len(hi) == 0:
        return out
    left = np.searchsorted(table_hi, hi, side="left").astype(np.int64)
    right = np.searchsorted(table_hi, hi, side="right").astype(np.int64)
    lft, r = left, right.copy()
    lft = lft.copy()
    while True:
        active = lft < r
        if not active.any():
            break
        mid = (lft + r) >> 1
        go_right = active & (table_lo[np.minimum(mid, n - 1)] < lo)
        lft = np.where(go_right, mid + 1, lft)
        r = np.where(active & ~go_right, mid, r)
    cur = np.minimum(lft, n - 1)
    found = (lft < right) & (table_lo[cur] == lo)
    return np.where(found, lft, out)


_M1 = np.uint64(0xFF51AFD7ED558CCD)
_M2 = np.uint64(0xC4CEB9FE1A85EC53)
_M3 = np.uint64(0x9E3779B97F4A7C15)


def mix64(x):
    """splitmix64 finaliser — the TPU-friendly stand-in for ntHash's NTP64
    (nthash.hpp): multiplicative mixing lowers to int ops on device."""
    x = np.asarray(x, dtype=np.uint64).copy()
    x ^= x >> np.uint64(30)
    x *= _M1
    x ^= x >> np.uint64(27)
    x *= _M2
    x ^= x >> np.uint64(31)
    return x


def hash_lanes(hi, lo):
    """Primary 64-bit hash of a k-mer lane pair."""
    return mix64(np.asarray(hi, np.uint64) ^ mix64(np.asarray(lo, np.uint64) + _M3))


def bloom_hashes(hi, lo, num_hashes, num_bits):
    """Kirsch-Mitzenmacher double hashing: h_i = h1 + i*h2 mod num_bits
    (the same trick ntHash uses for multiple seeds, nthash.hpp:18-22)."""
    h1 = hash_lanes(hi, lo)
    h2 = mix64(h1 ^ _M2) | np.uint64(1)
    nb = np.uint64(num_bits)
    idx = np.empty((num_hashes,) + h1.shape, dtype=np.uint64)
    h = h1.copy()
    for i in range(num_hashes):
        idx[i] = h % nb
        h = h + h2
    return idx
