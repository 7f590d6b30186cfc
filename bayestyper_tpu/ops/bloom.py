"""Bloom filter over canonical k-mer lane pairs.

Replaces the reference's ntHash BloomFilter (external/ntHash/BloomFilter.hpp:
atomic-OR bit inserts with NTP64 rolling hashes) and its KmerBloom<k> facade
(src/kmerBloom/KmerBloom.cpp:54-200). The TPU-era design:

  * host build: vectorised numpy scatter-OR over a uint64 bit array — the
    whole KMC table streams through in batches, no per-kmer locking (the
    reference needs 65536-way mutex striping, KmerBloom.cpp:204-215; a
    vectorised build doesn't).
  * membership: gather + bit-test, vectorised over query batches. A Pallas
    device variant keeps the bit array in HBM and does the same gather.
  * sizing: optimal bits/hashes formulas (KmerBloom.cpp:134-146):
      bits/element = -log(fpr) / log(2)^2,  hashes = bits/element * log(2)

File format (save/load) is a numpy .npz with {bits, num_hashes, num_bits,
num_kmers, kmer_size} — the reference's .bloomMeta/.bloomData text+raw pair
(KmerBloom.cpp:63-89,149-164) is a different hash family (ntHash), so
artifacts are not interchangeable; both ends of this pipeline use this format.
"""

from __future__ import annotations

import math

import numpy as np

from ..constants import KMER_SIZE
from .kmers import bloom_hashes


class KmerBloomFilter:
    def __init__(self, num_bits: int, num_hashes: int, kmer_size: int = KMER_SIZE,
                 bits: np.ndarray | None = None, num_kmers: int = 0):
        assert num_bits > 0 and num_hashes > 0
        self.num_bits = int(num_bits)
        self.num_hashes = int(num_hashes)
        self.kmer_size = kmer_size
        self.num_kmers = num_kmers
        num_words = (self.num_bits + 63) // 64
        if bits is None:
            self.bits = np.zeros(num_words, dtype=np.uint64)
        else:
            assert bits.shape == (num_words,)
            self.bits = bits

    @classmethod
    def with_optimal_parameters(cls, expected_kmers: int, fpr: float = 0.001,
                                kmer_size: int = KMER_SIZE):
        """Optimal sizing (KmerBloom.cpp:134-146)."""
        expected_kmers = max(int(expected_kmers), 1)
        bits_per_elem = -math.log(fpr) / (math.log(2) ** 2)
        num_bits = max(64, int(math.ceil(expected_kmers * bits_per_elem)))
        num_hashes = max(1, int(round(bits_per_elem * math.log(2))))
        return cls(num_bits, num_hashes, kmer_size, num_kmers=expected_kmers)

    def _positions(self, hi, lo):
        return bloom_hashes(hi, lo, self.num_hashes, self.num_bits)

    def add(self, hi, lo):
        """Vectorised insert of a batch of lane pairs."""
        idx = self._positions(hi, lo)  # [num_hashes, N]
        words = (idx >> np.uint64(6)).ravel()
        masks = (np.uint64(1) << (idx & np.uint64(63))).ravel()
        np.bitwise_or.at(self.bits, words, masks)

    def contains(self, hi, lo):
        """Vectorised membership query: [N] bool."""
        idx = self._positions(hi, lo)
        words = idx >> np.uint64(6)
        masks = np.uint64(1) << (idx & np.uint64(63))
        hits = (self.bits[words] & masks) != 0
        return hits.all(axis=0)

    def contains_and_add(self, hi, lo):
        """Query then insert (used for second-occurrence detection in the
        multigroup kmer pass, KmerCounter.cpp:105-169). Returns pre-insert
        membership. Duplicates within the batch count as repeat hits."""
        idx = self._positions(hi, lo)
        words = idx >> np.uint64(6)
        masks = np.uint64(1) << (idx & np.uint64(63))
        present = np.ones(idx.shape[1], dtype=bool)
        for h in range(self.num_hashes):
            w, m = words[h], masks[h]
            had = (self.bits[w] & m) != 0
            # sequential semantics for duplicates inside the batch: mark
            # repeats of the same (word, mask) after their first occurrence
            key = w ^ (m * np.uint64(0x9E3779B97F4A7C15))
            _, first_idx = np.unique(key, return_index=True)
            is_first = np.zeros(len(w), dtype=bool)
            is_first[first_idx] = True
            had = had | ~is_first
            present &= had
            np.bitwise_or.at(self.bits, w, m)
        return present

    @property
    def fill_fraction(self):
        return np.unpackbits(self.bits.view(np.uint8)).mean()

    def save(self, path: str):
        np.savez_compressed(
            path,
            bits=self.bits,
            num_bits=self.num_bits,
            num_hashes=self.num_hashes,
            num_kmers=self.num_kmers,
            kmer_size=self.kmer_size,
        )

    @classmethod
    def load(cls, path: str):
        with np.load(path) as z:
            return cls(
                num_bits=int(z["num_bits"]),
                num_hashes=int(z["num_hashes"]),
                kmer_size=int(z["kmer_size"]),
                bits=z["bits"],
                num_kmers=int(z["num_kmers"]),
            )


def device_bloom_prepare(bloom: "KmerBloomFilter", hi, lo):
    """Host-side position precompute for device_bloom_contains: returns
    (word_idx [H, N], bit_shift [H, N]) int32/uint32 arrays (JAX x32-safe —
    64-bit hashing stays on the host where uint64 is native)."""
    idx = bloom._positions(hi, lo)          # [num_hashes, N] uint64
    word = (idx // np.uint64(32)).astype(np.int64)
    shift = (idx % np.uint64(32)).astype(np.uint32)
    return word.astype(np.int32), shift


def device_bloom_query(bloom: "KmerBloomFilter", hi, lo):
    """End-to-end device query: host hashing + device gather/bit-test.
    Matches bloom.contains bit-for-bit (tested)."""
    import jax.numpy as jnp

    word, shift = device_bloom_prepare(bloom, hi, lo)
    bits32 = jnp.asarray(bloom.bits.view(np.uint32))
    gathered = jnp.take(bits32, jnp.asarray(word), axis=0)
    present = ((gathered >> jnp.asarray(shift)) & 1).astype(bool)
    return present.all(axis=0)
