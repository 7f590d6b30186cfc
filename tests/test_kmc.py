"""KMC database format round-trip + built-in counter tests."""

import numpy as np

from bayestyper_tpu.io.kmc import KmcReader, count_kmers_from_sequences, write_kmc1
from bayestyper_tpu.ops.kmers import encode_bases, kmer_lanes


def test_kmc1_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    k = 55
    n = 5000
    hi = rng.integers(0, 1 << 54, n, dtype=np.uint64)
    lo = rng.integers(0, 1 << 56, n, dtype=np.uint64)
    # dedupe
    order = np.lexsort((lo, hi))
    hi, lo = hi[order], lo[order]
    keep = np.ones(n, bool)
    keep[1:] = (hi[1:] != hi[:-1]) | (lo[1:] != lo[:-1])
    hi, lo = hi[keep], lo[keep]
    counts = rng.integers(1, 300, len(hi), dtype=np.uint64)

    path = str(tmp_path / "sample")
    write_kmc1(path, hi, lo, counts, kmer_length=k)

    r = KmcReader(path)
    assert r.info.kmer_length == k
    assert r.info.total_kmers == len(hi)
    got_hi, got_lo, got_counts = [], [], []
    for bh, bl, bc in r.batches(batch_size=1024):
        got_hi.append(bh)
        got_lo.append(bl)
        got_counts.append(bc)
    got_hi = np.concatenate(got_hi)
    got_lo = np.concatenate(got_lo)
    got_counts = np.concatenate(got_counts)

    np.testing.assert_array_equal(np.sort(got_hi), np.sort(hi))
    ours = {(int(a), int(b)): int(c) for a, b, c in zip(hi, lo, counts)}
    theirs = {(int(a), int(b)): int(c) for a, b, c in zip(got_hi, got_lo, got_counts)}
    assert ours == theirs


def test_kmc_small_k(tmp_path):
    # k < 27: lo lane unused
    rng = np.random.default_rng(1)
    k = 21
    hi = np.unique(rng.integers(0, 1 << 42, 500, dtype=np.uint64))
    lo = np.zeros_like(hi)
    counts = rng.integers(1, 10, len(hi), dtype=np.uint64)
    path = str(tmp_path / "smallk")
    write_kmc1(path, hi, lo, counts, kmer_length=k)
    r = KmcReader(path)
    bh, bl, bc = next(r.batches())
    np.testing.assert_array_equal(bh, np.sort(hi))
    assert (bl == 0).all()


def test_builtin_counter_matches_bruteforce():
    rng = np.random.default_rng(2)
    seq = "".join(rng.choice(list("ACGT"), 500)).encode()
    k = 31
    hi, lo, counts = count_kmers_from_sequences([seq, seq], k)
    # every kmer seen twice (once per copy) times its occurrences
    codes, valid = encode_bases(seq)
    h2, l2, ok = kmer_lanes(codes, valid, k)
    from collections import Counter

    ref = Counter(zip(h2[ok].tolist(), l2[ok].tolist()))
    ours = dict(zip(zip(hi.tolist(), lo.tolist()), counts.tolist()))
    assert ours == {key: 2 * v for key, v in ref.items()}


def test_counter_to_kmc_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    seq = "".join(rng.choice(list("ACGT"), 2000)).encode()
    hi, lo, counts = count_kmers_from_sequences([seq], 55)
    path = str(tmp_path / "ecoli_like")
    write_kmc1(path, hi, lo, counts, kmer_length=55)
    r = KmcReader(path)
    bh, bl, bc = next(r.batches())
    np.testing.assert_array_equal(bh, hi)
    np.testing.assert_array_equal(bl, lo)
    np.testing.assert_array_equal(bc, counts)
