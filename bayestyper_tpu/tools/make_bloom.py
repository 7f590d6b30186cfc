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

    if reference_format:
        out = out_path or kmc_prefix
        bloom.save(out)
        return bloom, out + ".bloomMeta/.bloomData"
    out = out_path or (kmc_prefix + ".bloom.npz")
    bloom.save(out)
    return bloom, out
