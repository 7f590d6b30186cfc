"""Canonical k-mer extraction vs brute-force reference."""

import numpy as np
import pytest

from bayestyper_tpu.ops.kmers import (
    bloom_hashes,
    decode_kmer,
    encode_bases,
    hash_lanes,
    kmer_lanes,
)

COMP = {"A": "T", "C": "G", "G": "C", "T": "A"}


def revcomp(s):
    return "".join(COMP[c] for c in reversed(s))


def brute_force(seq, k):
    out = []
    for i in range(len(seq) - k + 1):
        window = seq[i : i + k]
        if any(c not in "ACGT" for c in window):
            out.append(None)
        else:
            out.append(min(window, revcomp(window)))
    return out


@pytest.mark.parametrize("k", [5, 27, 31, 55])
def test_kmer_lanes_match_bruteforce(k):
    rng = np.random.default_rng(3)
    seq = "".join(rng.choice(list("ACGT"), 300))
    # inject some Ns
    seq = seq[:50] + "N" + seq[51:200] + "NN" + seq[202:]
    codes, valid = encode_bases(seq.encode())
    hi, lo, ok = kmer_lanes(codes, valid, k)
    ref = brute_force(seq, k)
    assert len(ref) == len(hi)
    for i, r in enumerate(ref):
        if r is None:
            assert not ok[i]
        else:
            assert ok[i]
            assert decode_kmer(int(hi[i]), int(lo[i]), k) == r, i


def test_kmer_canonical_strand_invariance():
    rng = np.random.default_rng(5)
    seq = "".join(rng.choice(list("ACGT"), 200))
    rc = revcomp(seq)
    c1, v1 = encode_bases(seq.encode())
    c2, v2 = encode_bases(rc.encode())
    h1, l1, _ = kmer_lanes(c1, v1, 55)
    h2, l2, _ = kmer_lanes(c2, v2, 55)
    # same multiset of canonical kmers
    s1 = sorted(zip(h1.tolist(), l1.tolist()))
    s2 = sorted(zip(h2.tolist(), l2.tolist()))
    assert s1 == s2


def test_hashes_deterministic_and_spread():
    rng = np.random.default_rng(9)
    seq = "".join(rng.choice(list("ACGT"), 5000))
    codes, valid = encode_bases(seq.encode())
    hi, lo, ok = kmer_lanes(codes, valid, 55)
    h = hash_lanes(hi, lo)
    assert h.dtype == np.uint64
    # deterministic
    np.testing.assert_array_equal(h, hash_lanes(hi, lo))
    # well spread: no collisions among ~5k distinct kmers
    assert len(np.unique(h)) > len(h) - 3
    idx = bloom_hashes(hi, lo, 3, 1 << 20)
    assert idx.shape == (3, len(hi))
    assert (idx < (1 << 20)).all()
