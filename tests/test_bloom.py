"""Bloom filter statistical tests (the spirit of the reference's built-in
makeBloom self-test, MakeBloom.cpp:311-375: original TP rate must be 1,
random-kmer FP rate near the configured bound)."""

import numpy as np

from bayestyper_tpu.ops.bloom import KmerBloomFilter


def _random_lanes(rng, n):
    return (
        rng.integers(0, 1 << 54, n, dtype=np.uint64),
        rng.integers(0, 1 << 56, n, dtype=np.uint64),
    )


def test_bloom_no_false_negatives():
    rng = np.random.default_rng(0)
    hi, lo = _random_lanes(rng, 20000)
    bf = KmerBloomFilter.with_optimal_parameters(20000, fpr=0.001)
    bf.add(hi, lo)
    assert bf.contains(hi, lo).all()


def test_bloom_false_positive_rate():
    rng = np.random.default_rng(1)
    hi, lo = _random_lanes(rng, 20000)
    bf = KmerBloomFilter.with_optimal_parameters(20000, fpr=0.001)
    bf.add(hi, lo)
    qhi, qlo = _random_lanes(rng, 50000)
    fpr = bf.contains(qhi, qlo).mean()
    assert fpr < 0.005, fpr


def test_bloom_save_load(tmp_path):
    rng = np.random.default_rng(2)
    hi, lo = _random_lanes(rng, 1000)
    bf = KmerBloomFilter.with_optimal_parameters(1000, fpr=0.01)
    bf.add(hi, lo)
    path = str(tmp_path / "test.bloom.npz")
    bf.save(path)
    bf2 = KmerBloomFilter.load(path)
    assert bf2.num_bits == bf.num_bits
    assert bf2.contains(hi, lo).all()


def test_contains_and_add_second_occurrence():
    rng = np.random.default_rng(3)
    hi, lo = _random_lanes(rng, 100)
    bf = KmerBloomFilter.with_optimal_parameters(10000, fpr=0.001)
    first = bf.contains_and_add(hi, lo)
    assert not first.any()
    second = bf.contains_and_add(hi, lo)
    assert second.all()
    # duplicates within one batch: second copy sees the first
    dup_hi = np.concatenate([hi[:10], hi[:10]])
    dup_lo = np.concatenate([lo[:10], lo[:10]])
    bf2 = KmerBloomFilter.with_optimal_parameters(10000, fpr=0.001)
    r = bf2.contains_and_add(dup_hi, dup_lo)
    assert not r[:10].any()
    assert r[10:].all()


def test_device_bloom_matches_host():
    import numpy as np
    from bayestyper_tpu.ops.bloom import KmerBloomFilter, device_bloom_query

    rng = np.random.default_rng(8)
    hi, lo = _random_lanes(rng, 5000)
    bf = KmerBloomFilter.with_optimal_parameters(5000, 0.001)
    bf.add(hi, lo)
    qhi, qlo = _random_lanes(rng, 3000)
    all_hi = np.concatenate([hi[:1000], qhi])
    all_lo = np.concatenate([lo[:1000], qlo])
    host = bf.contains(all_hi, all_lo)
    dev = np.asarray(device_bloom_query(bf, all_hi, all_lo))
    np.testing.assert_array_equal(host, dev)
