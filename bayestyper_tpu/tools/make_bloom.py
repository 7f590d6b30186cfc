"""makeBloom: KMC table -> k-mer bloom filter file.

Equivalent of bayesTyperTools makeBloom (MakeBloom.cpp:39-375): streams the
KMC database and inserts every k-mer into an optimally-sized bloom filter
(fpr 0.001), vectorised instead of the reference's reader+inserter thread
pipeline. Includes the reference's statistical self-test (testbloom,
MakeBloom.cpp:311-375): zero false negatives and a bounded random-kmer FPR.
"""

from __future__ import annotations

import numpy as np

from ..io.kmc import KmcReader
from ..ops.bloom import KmerBloomFilter

BLOOM_FPR = 0.001  # MakeBloom.cpp false_positive_rate


def kmc_to_bloom(kmc_prefix: str, out_path: str | None = None,
                 fpr: float = BLOOM_FPR, run_test: bool = False,
                 reference_format: bool = False):
    """reference_format=True writes the reference's `.bloomMeta/.bloomData`
    pair (ntHash bit layout, readable by the reference binary) instead of the
    native npz (ops.nthash.ReferenceKmerBloom)."""
    reader = KmcReader(kmc_prefix)
    if reference_format:
        from ..ops.nthash import ReferenceKmerBloom

        bloom = ReferenceKmerBloom.with_optimal_parameters(
            reader.info.total_kmers, fpr, reader.info.kmer_length
        )
    else:
        bloom = KmerBloomFilter.with_optimal_parameters(
            reader.info.total_kmers, fpr, reader.info.kmer_length
        )
    test_hi, test_lo = [], []
    for hi, lo, _ in reader.batches():
        bloom.add(hi, lo)
        if run_test and len(test_hi) < 16:
            test_hi.append(hi[:4096])
            test_lo.append(lo[:4096])
    reader.close()

    if run_test and test_hi:
        hi = np.concatenate(test_hi)
        lo = np.concatenate(test_lo)
        assert bloom.contains(hi, lo).all(), "bloom false negative"
        rng = np.random.default_rng(0)
        rh = rng.integers(0, 1 << 54, 100000, dtype=np.uint64)
        rl = rng.integers(0, 1 << 56, 100000, dtype=np.uint64)
        observed_fpr = bloom.contains(rh, rl).mean()
        assert observed_fpr < 10 * fpr + 1e-4, observed_fpr

        # perturbed arm (testbloom, MakeBloom.cpp:311-375): flip one random
        # base of each sampled k-mer, re-canonicalise, and measure the
        # positive rate. Genuine single-base neighbours in the table are
        # true positives, so only the remainder is held to the FPR bound.
        from ..ops.kmers import _DECODE, encode_bases, kmer_lanes
        from ..ops.nthash import lanes_to_codes

        k = reader.info.kmer_length
        codes = lanes_to_codes(hi, lo, k)                  # [n, k] 0..3
        n = len(codes)
        pos = rng.integers(0, k, n)
        shift = rng.integers(1, 4, n).astype(np.uint8)     # != original
        codes[np.arange(n), pos] = (
            codes[np.arange(n), pos] + shift
        ) % 4
        # re-canonicalise via the sequence path ('N'-joined rows)
        buf = np.full((n, k + 1), ord("N"), np.uint8)
        buf[:, :k] = _DECODE[codes]
        c2, valid = encode_bases(buf.reshape(-1))
        phi, plo, ok = kmer_lanes(c2, valid, k)
        phi, plo = phi[ok], plo[ok]
        assert len(phi) == n
        hit = bloom.contains(phi, plo)
        # exact membership of the perturbed k-mers in the sampled set (a
        # lower bound on table membership: the reference uses the full
        # exact set; the sampled set keeps the debug mode streaming)
        from ..ops.kmers import lane_search

        order = np.lexsort((lo, hi))
        is_member = lane_search(hi[order], lo[order], phi, plo) >= 0
        perturbed_fpr = (hit & ~is_member).mean()
        # near-neighbour bias bound: 20x target fpr + slack (the reference
        # only reports these rates; asserting keeps the self-test a test)
        assert perturbed_fpr < 20 * fpr + 1e-3, perturbed_fpr

    if reference_format:
        out = out_path or kmc_prefix
        bloom.save(out)
        return bloom, out + ".bloomMeta/.bloomData"
    out = out_path or (kmc_prefix + ".bloom.npz")
    bloom.save(out)
    return bloom, out
