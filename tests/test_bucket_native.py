"""The fused native bucket assembly (bt_build_bucket) must produce
bit-identical ClusterBucket arrays to the numpy fallback — including the
greedy-cover use_sparse/sparsity results (shared splitmix64 tie-break)."""

import dataclasses

import numpy as np
import pytest

from bayestyper_tpu import native
from bayestyper_tpu.engine import FinalizedCluster, _build_bucket_batch
from bayestyper_tpu.io.samples import Sample
from tests.test_writer_batch import _FakePloidy, _mk_variant


class _FakeUCounts:
    def __init__(self, rows, offs, index):
        self.rows = rows
        self.offs = offs
        self._index = index


def _mk_inputs(rng, s):
    fcs = []
    offs = [0]
    rows = []
    index = {}
    for ci in range(17):
        k = int(rng.integers(1, 60))
        h = int(rng.integers(2, 9))
        v = int(rng.integers(1, 3))
        variants = [
            _mk_variant(10 + 100 * ci + 7 * vi, "A", ["G"]) for vi in range(v)
        ]
        fc = FinalizedCluster(
            cluster_id=1000 + ci * 13,
            chrom="chr1",
            variants=variants,
            hap_allele=rng.integers(0, 2, (h, v)).astype(np.int16),
            kmer_hi=rng.integers(0, 2**54, k).astype(np.uint64),
            kmer_lo=rng.integers(0, 2**56, k).astype(np.uint64),
            # every path kmer occurs on >=1 haplotype (production invariant
            # behind the greedy cover's best>0 assert)
            mult=np.maximum(
                rng.integers(0, 3, (k, h)).astype(np.uint8),
                np.eye(1, h, dtype=np.uint8)[0][None, :],
            ),
            member=rng.random((k, v, h)) < 0.5,
            inter_mult_female=rng.integers(0, 2, k).astype(np.uint8),
            inter_mult_male=rng.integers(0, 3, k).astype(np.uint8),
            non_covered_alleles=[[] for _ in variants],
            num_excluded=0,
        )
        index[fc.cluster_id] = ci
        offs.append(offs[-1] + k)
        rows.append(rng.integers(0, 40, (k, s)).astype(np.uint8))
        fcs.append(fc)
    ucounts = _FakeUCounts(
        np.concatenate(rows), np.asarray(offs, np.int64), index
    )
    return fcs, ucounts


@pytest.mark.skipif(not native.available(), reason="no native library")
def test_native_bucket_matches_fallback(monkeypatch):
    rng = np.random.default_rng(3)
    s = 3
    samples = [Sample(f"s{i}", i % 2, "") for i in range(s)]
    ploidy = _FakePloidy({"chr1": [2] * s})
    fcs, ucounts = _mk_inputs(rng, s)
    caps = (32, 64, 16, 4)

    b_native = _build_bucket_batch(fcs, caps, samples, ploidy, ucounts, 42)
    monkeypatch.setattr(native, "available", lambda: False)
    b_numpy = _build_bucket_batch(fcs, caps, samples, ploidy, ucounts, 42)

    for f in dataclasses.fields(b_native):
        a = np.asarray(getattr(b_native, f.name))
        b = np.asarray(getattr(b_numpy, f.name))
        assert a.dtype == b.dtype, f.name
        assert a.shape == b.shape, f.name
        np.testing.assert_array_equal(a, b, err_msg=f.name)


def test_packed_upload_bit_exact(monkeypatch):
    """The ragged packed upload (_device_bucket) must reconstruct the exact
    dense bucket tensors that device_arrays() would have transferred."""
    from bayestyper_tpu import engine

    rng = np.random.default_rng(7)
    s = 3
    samples = [Sample(f"s{i}", i % 2, "") for i in range(s)]
    ploidy = _FakePloidy({"chr1": [2] * s})
    fcs, ucounts = _mk_inputs(rng, s)
    caps = (32, 64, 16, 4)

    host = _build_bucket_batch(fcs, caps, samples, ploidy, ucounts, 42)
    monkeypatch.setattr(engine, "_PACKED_UPLOAD_MIN_BYTES", 0)
    packed = engine._device_bucket(host, fcs, samples)
    dense = host.device_arrays()
    for f in dataclasses.fields(dense):
        a = np.asarray(getattr(dense, f.name))
        b = np.asarray(getattr(packed, f.name))
        assert a.dtype == b.dtype, f.name
        assert a.shape == b.shape, f.name
        np.testing.assert_array_equal(a, b, err_msg=f.name)
