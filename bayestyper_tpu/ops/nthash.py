"""ntHash NTP64 + the reference's `.bloomMeta`/`.bloomData` bloom format.

Independent vectorised reimplementation of the published ntHash rolling hash
(Mohamadi et al., Bioinformatics 2016) and the reference's bloom file pair
(KmerBloom.cpp:63-164 save/load; external/ntHash/BloomFilter.hpp:55-161
insertF/containsF bit layout). The per-base seeds and multi-hash constants
below are the published ntHash constants (nthash.hpp:23-27,18-21) — they are
part of the FILE FORMAT: a bloom built with any other constants cannot be
read by the reference binary, so byte-compatibility requires them verbatim.

Everything operates on canonical (hi, lo) lane pairs from ops.kmers so the
whole pipeline keeps one k-mer representation; base strings are never
materialised.
"""

from __future__ import annotations

import math
import os

import numpy as np

# published ntHash 64-bit base seeds for A, C, G, T (nthash.hpp:23-27);
# order matches the 2-bit codes of ops.kmers.encode_bases (A=0,C=1,G=2,T=3)
NT_SEEDS = np.array(
    [
        0x3C8BFBB395C60474,
        0x3193C18562A02B4C,
        0x20323ED082572324,
        0x295549F54BE24456,
    ],
    dtype=np.uint64,
)
MULTI_SEED = np.uint64(0x90B45D39FB6DA1FA)  # nthash.hpp:21
MULTI_SHIFT = np.uint64(27)                  # nthash.hpp:18


def _rol(v: np.uint64, s: int) -> np.uint64:
    s &= 63
    if s == 0:
        return v
    return np.uint64((int(v) << s | int(v) >> (64 - s)) & 0xFFFFFFFFFFFFFFFF)


# msTab equivalent: all 64 rotations of each base seed (nthash.hpp vecA..vecT)
_MS_TAB = np.zeros((4, 64), dtype=np.uint64)
for _b in range(4):
    for _r in range(64):
        _MS_TAB[_b, _r] = _rol(NT_SEEDS[_b], _r)


def lanes_to_codes(hi, lo, k: int) -> np.ndarray:
    """[N] canonical lane pairs -> [N, k] 2-bit base codes.

    Lane layout (ops.kmers): hi holds the first min(27, k) bases big-endian,
    lo the remainder.
    """
    hi = np.asarray(hi, np.uint64)
    lo = np.asarray(lo, np.uint64)
    n_hi = min(27, k)
    n_lo = k - n_hi
    out = np.empty((len(hi), k), np.uint8)
    for j in range(n_hi):
        out[:, j] = (hi >> np.uint64(2 * (n_hi - 1 - j))).astype(np.uint8) & 3
    for j in range(n_lo):
        out[:, n_hi + j] = (
            lo >> np.uint64(2 * (n_lo - 1 - j))
        ).astype(np.uint8) & 3
    return out


def ntp64(hi, lo, k: int) -> np.ndarray:
    """Vectorised NTP64 (nthash.hpp:262-267): XOR of per-position rotated
    base seeds. Matches the reference byte-for-byte (golden-tested)."""
    codes = lanes_to_codes(hi, lo, k)
    h = np.zeros(codes.shape[0], np.uint64)
    for i in range(k):
        h ^= _MS_TAB[codes[:, i], (k - 1 - i) % 64]
    return h


def multi_hash_locations(h: np.ndarray, k: int, num_hashes: int,
                         num_bits: int) -> np.ndarray:
    """[num_hashes, N] bloom bit positions (BloomFilter.hpp insertF:55-67):
    h_0 = h % m; h_i = (h * (i ^ k*multiSeed)) ^>>27 % m."""
    m = np.uint64(num_bits)
    locs = np.empty((num_hashes, len(h)), np.uint64)
    locs[0] = h % m
    # uint64 wraparound is the intended modular arithmetic here
    with np.errstate(over="ignore"):
        kseed = np.uint64((k * int(MULTI_SEED)) & 0xFFFFFFFFFFFFFFFF)
        for i in range(1, num_hashes):
            mh = h * (np.uint64(i) ^ kseed)
            mh = mh ^ (mh >> MULTI_SHIFT)
            locs[i] = mh % m
    return locs


def opt_num_bits(fpr: float, num_kmers: int) -> int:
    """libbf optimal sizing, as vendored (KmerBloom.cpp:134-139)."""
    ln2 = math.log(2)
    return int(math.ceil(-(num_kmers * math.log(fpr) / ln2 / ln2)))


def opt_num_hashes(num_bits: int, num_kmers: int) -> int:
    """KmerBloom.cpp:142-146."""
    return int(math.ceil(num_bits / num_kmers * math.log(2)))


class ReferenceKmerBloom:
    """Drop-in interop with the reference's bloom artifacts.

    File pair: `<prefix>.bloomMeta` = one line
    "num_kmers\\tnum_bits\\tkmer_size"; `<prefix>.bloomData` = the raw bit
    array, MSB-first within each byte (bit b lives at byte b//8, mask
    1 << (7 - b%8); BloomFilter.hpp:58-60). num_hashes is recomputed from
    (num_bits, num_kmers) at load exactly like KmerBloom.cpp:80-89.
    """

    def __init__(self, num_kmers: int, num_bits: int, kmer_size: int,
                 data: np.ndarray | None = None):
        self.num_kmers = max(int(num_kmers), 1)
        self.num_bits = int(num_bits)
        self.kmer_size = int(kmer_size)
        self.num_hashes = opt_num_hashes(self.num_bits, self.num_kmers)
        nbytes = (self.num_bits + 7) // 8
        if data is None:
            data = np.zeros(nbytes, np.uint8)
        assert len(data) == nbytes
        self.data = data

    @classmethod
    def with_optimal_parameters(cls, num_kmers: int, fpr: float,
                                kmer_size: int) -> "ReferenceKmerBloom":
        num_kmers = max(int(num_kmers), 1)
        return cls(num_kmers, opt_num_bits(fpr, num_kmers), kmer_size)

    def add(self, hi, lo):
        locs = multi_hash_locations(
            ntp64(hi, lo, self.kmer_size), self.kmer_size, self.num_hashes,
            self.num_bits,
        ).ravel()
        byte = (locs >> np.uint64(3)).astype(np.int64)
        mask = (np.uint64(1) << (np.uint64(7) - (locs & np.uint64(7)))).astype(
            np.uint8
        )
        np.bitwise_or.at(self.data, byte, mask)

    def contains(self, hi, lo) -> np.ndarray:
        locs = multi_hash_locations(
            ntp64(hi, lo, self.kmer_size), self.kmer_size, self.num_hashes,
            self.num_bits,
        )
        byte = (locs >> np.uint64(3)).astype(np.int64)
        mask = (np.uint64(1) << (np.uint64(7) - (locs & np.uint64(7)))).astype(
            np.uint8
        )
        hit = (self.data[byte] & mask) != 0
        return hit.all(axis=0)

    def save(self, prefix: str):
        with open(prefix + ".bloomMeta", "w") as fh:
            fh.write(f"{self.num_kmers}\t{self.num_bits}\t{self.kmer_size}\n")
        with open(prefix + ".bloomData", "wb") as fh:
            fh.write(self.data.tobytes())

    @classmethod
    def load(cls, prefix: str) -> "ReferenceKmerBloom":
        with open(prefix + ".bloomMeta") as fh:
            parts = fh.readline().split("\t")
        assert len(parts) == 3
        num_kmers, num_bits, k = int(parts[0]), int(parts[1]), int(parts[2])
        data = np.fromfile(prefix + ".bloomData", dtype=np.uint8)
        nbytes = (num_bits + 7) // 8
        assert len(data) >= nbytes, "truncated .bloomData"
        return cls(num_kmers, num_bits, k, data[:nbytes])

    @staticmethod
    def exists(prefix: str) -> bool:
        return os.path.exists(prefix + ".bloomMeta") and os.path.exists(
            prefix + ".bloomData"
        )
