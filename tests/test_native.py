"""Native C++ kernels must agree bit-for-bit with the numpy implementations."""

import numpy as np
import pytest

from bayestyper_tpu import native
from bayestyper_tpu.ops.bloom import KmerBloomFilter
from bayestyper_tpu.ops.kmers import encode_bases, kmer_lanes

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no compiler)"
)


@pytest.mark.parametrize("k", [21, 27, 31, 55])
def test_native_kmer_lanes_match_numpy(k):
    rng = np.random.default_rng(4)
    seq = "".join(rng.choice(list("ACGT"), 3000))
    seq = seq[:100] + "N" + seq[101:]
    codes, valid = encode_bases(seq.encode())
    hi1, lo1, ok1 = kmer_lanes(codes, valid, k)
    hi2, lo2, ok2 = native.kmer_lanes(codes, valid, k)
    np.testing.assert_array_equal(ok1, ok2)
    np.testing.assert_array_equal(hi1[ok1], hi2[ok2])
    np.testing.assert_array_equal(lo1[ok1], lo2[ok2])


def test_native_lane_lookup():
    rng = np.random.default_rng(5)
    hi = np.sort(rng.integers(0, 1 << 54, 1000, dtype=np.uint64))
    lo = rng.integers(0, 1 << 56, 1000, dtype=np.uint64)
    order = np.lexsort((lo, hi))
    hi, lo = hi[order], lo[order]
    idx = native.lane_lookup(hi, lo, hi[::7], lo[::7])
    np.testing.assert_array_equal(idx, np.arange(1000)[::7])
    # absent keys -> -1
    miss = native.lane_lookup(hi, lo, hi[:5], lo[:5] ^ np.uint64(1))
    assert (miss == -1).all()


def test_native_bloom_matches_numpy():
    rng = np.random.default_rng(6)
    hi = rng.integers(0, 1 << 54, 5000, dtype=np.uint64)
    lo = rng.integers(0, 1 << 56, 5000, dtype=np.uint64)
    bf_np = KmerBloomFilter.with_optimal_parameters(5000, 0.001)
    bf_na = KmerBloomFilter.with_optimal_parameters(5000, 0.001)
    bf_np.add(hi, lo)
    native.bloom_insert(bf_na.bits, bf_na.num_bits, bf_na.num_hashes, hi, lo)
    np.testing.assert_array_equal(bf_np.bits, bf_na.bits)
    q = native.bloom_query(bf_na.bits, bf_na.num_bits, bf_na.num_hashes, hi, lo)
    assert q.all()


def test_native_speedup():
    rng = np.random.default_rng(7)
    seq = "".join(rng.choice(list("ACGT"), 2_000_000)).encode()
    codes, valid = encode_bases(seq)
    import time

    # best-of-3 per side: this VM sees ±20-40% host steal, so a single
    # wall-clock pair is too noisy to compare
    t_np = min(
        _timed(lambda: kmer_lanes(codes, valid, 55)) for _ in range(3)
    )
    t_na = min(
        _timed(lambda: native.kmer_lanes(codes, valid, 55)) for _ in range(3)
    )
    hi1, lo1, ok1 = kmer_lanes(codes, valid, 55)
    hi2, lo2, ok2 = native.kmer_lanes(codes, valid, 55)
    np.testing.assert_array_equal(hi1, hi2)
    print(f"numpy {t_np:.3f}s native {t_na:.3f}s ({t_np / t_na:.1f}x)")
    assert t_na < t_np * 2  # native should not be slower


def _timed(fn):
    import time

    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def test_rooted_lookup_matches_plain():
    rng = np.random.default_rng(9)
    n = 200_000
    hi = np.sort(rng.integers(0, 2**54, n).astype(np.uint64))
    lo = rng.integers(0, 2**56, n).astype(np.uint64)
    order = np.lexsort((lo, hi))
    hi, lo = hi[order], lo[order]
    q_hit_hi, q_hit_lo = hi[::13], lo[::13]
    q_miss_hi = hi[::17]
    q_miss_lo = lo[::17] ^ np.uint64(1)
    qhi = np.concatenate([q_hit_hi, q_miss_hi])
    qlo = np.concatenate([q_hit_lo, q_miss_lo])
    roots, shift = native.build_lane_roots(hi)
    got = native.lane_lookup_rooted(hi, lo, roots, shift, qhi, qlo)
    want = native.lane_lookup(hi, lo, qhi, qlo)
    np.testing.assert_array_equal(got, want)


def test_merge_lookup_matches_plain():
    rng = np.random.default_rng(10)
    n = 50_000
    hi = rng.integers(0, 2**30, n).astype(np.uint64)
    lo = rng.integers(0, 2**20, n).astype(np.uint64)
    order = np.lexsort((lo, hi))
    hi, lo = hi[order], lo[order]
    keep = np.ones(n, bool)
    keep[1:] = (hi[1:] != hi[:-1]) | (lo[1:] != lo[:-1])
    hi, lo = hi[keep], lo[keep]
    # ascending query stream with hits and misses, split into two batches
    qhi = np.repeat(hi[::3], 2)
    qlo = np.repeat(lo[::3], 2)
    qlo[1::2] ^= np.uint64(1)
    order = np.lexsort((qlo, qhi))
    qhi, qlo = qhi[order], qlo[order]
    mid = len(qhi) // 2
    i1, cur = native.lane_merge_lookup(hi, lo, qhi[:mid], qlo[:mid], 0)
    i2, _ = native.lane_merge_lookup(hi, lo, qhi[mid:], qlo[mid:], cur)
    got = np.concatenate([i1, i2])
    want = native.lane_lookup(hi, lo, qhi, qlo)
    np.testing.assert_array_equal(got, want)


def test_multigroup_pass_matches_numpy():
    rng = np.random.default_rng(12)
    n = 300_000
    # force plenty of duplicates
    pool_hi = rng.integers(0, 2**54, n // 4).astype(np.uint64)
    pool_lo = rng.integers(0, 2**56, n // 4).astype(np.uint64)
    sel = rng.integers(0, n // 4, n)
    hi, lo = pool_hi[sel], pool_lo[sel]
    member_any = rng.random(n) < 0.7

    midx, u_hi, u_lo, u_member, ex_multi = native.multigroup_pass(
        hi, lo, member_any
    )

    order = np.lexsort((lo, hi))
    sh, sl = hi[order], lo[order]
    first = np.ones(n, bool)
    first[1:] = (sh[1:] != sh[:-1]) | (sl[1:] != sl[:-1])
    urow_sorted = np.cumsum(first) - 1
    want_midx = np.empty(n, np.int64)
    want_midx[order] = urow_sorted
    want_u_hi, want_u_lo = sh[first], sl[first]
    occ = np.bincount(want_midx, minlength=len(want_u_hi))
    want_ex = (occ > 1)[want_midx]
    want_member = np.zeros(len(want_u_hi), bool)
    want_member[want_midx[member_any]] = True

    np.testing.assert_array_equal(midx, want_midx)
    np.testing.assert_array_equal(u_hi, want_u_hi)
    np.testing.assert_array_equal(u_lo, want_u_lo)
    np.testing.assert_array_equal(u_member, want_member)
    np.testing.assert_array_equal(ex_multi, want_ex)
