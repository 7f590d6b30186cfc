"""Co-scheduling invariance: genotype_buckets_multi (one compiled scan over
several buckets) must produce bit-identical per-cluster results to per-bucket
genotype_bucket calls, and results must not depend on how clusters are packed
into chunks (subsample + Gibbs streams are keyed on cluster_id)."""

import jax
import numpy as np
import pytest

from bayestyper_tpu.model.buckets import build_bucket
from bayestyper_tpu.model.gibbs import (
    GibbsConfig,
    genotype_bucket,
    genotype_buckets_multi,
    make_outcome_space,
)
from bayestyper_tpu.ops.distributions import np_build_count_log_prob_tables
from tests.test_gibbs import make_snv_cluster

S = 3
CFG = GibbsConfig(
    num_chains=3, burn_in=10, num_samples=20, kmer_subsampling_rate=0.8,
    max_total_mult=8,
)


def _tables():
    import jax.numpy as jnp

    p = np.full(S, 0.4)
    size = np.full(S, 40.0)
    rates = np.full(S, 1e-3)
    return jnp.asarray(np_build_count_log_prob_tables(p, size, rates, 255))


def _clusters(rng, n, cid0=0):
    gts = [[tuple(sorted(rng.integers(0, 2, 2))) for _ in range(S)]
           for _ in range(n)]
    return [
        make_snv_cluster(rng, g, num_kmers_per_allele=12, cluster_id=cid0 + i)
        for i, g in enumerate(gts)
    ]


def test_multi_matches_per_bucket():
    rng = np.random.default_rng(11)
    key = jax.random.PRNGKey(5)
    tables = _tables()
    outcomes = make_outcome_space(2)

    cls_a = _clusters(rng, 3, cid0=100)
    cls_b = _clusters(rng, 2, cid0=300)
    b_a = build_bucket(cls_a, (4, 32, 2, 1), S).device_arrays()
    b_b = build_bucket(cls_b, (2, 32, 2, 1), S).device_arrays()

    t_a, w_a = genotype_bucket(key, b_a, tables, outcomes, CFG)
    t_b, w_b = genotype_bucket(key, b_b, tables, outcomes, CFG)
    (t_ma, t_mb), (w_ma, w_mb) = genotype_buckets_multi(
        key, (b_a, b_b), tables, (outcomes, outcomes), (CFG, CFG)
    )
    np.testing.assert_array_equal(np.asarray(t_a), np.asarray(t_ma))
    np.testing.assert_array_equal(np.asarray(t_b), np.asarray(t_mb))
    np.testing.assert_array_equal(np.asarray(w_a), np.asarray(w_ma))
    np.testing.assert_array_equal(np.asarray(w_b), np.asarray(w_mb))


def test_chunk_packing_invariance():
    rng = np.random.default_rng(23)
    key = jax.random.PRNGKey(5)
    tables = _tables()
    outcomes = make_outcome_space(2)

    cls = _clusters(rng, 5, cid0=700)
    # packing 1: all five in one bucket
    b_all = build_bucket(cls, (8, 32, 2, 1), S).device_arrays()
    t_all, _ = genotype_bucket(key, b_all, tables, outcomes, CFG)
    # packing 2: 2 + 3 across two buckets of different padded sizes
    b1 = build_bucket(cls[:2], (2, 32, 2, 1), S).device_arrays()
    b2 = build_bucket(cls[2:], (4, 32, 2, 1), S).device_arrays()
    (t1, t2), _ = genotype_buckets_multi(
        key, (b1, b2), tables, (outcomes, outcomes), (CFG, CFG)
    )
    np.testing.assert_array_equal(np.asarray(t_all)[:2], np.asarray(t1)[:2])
    np.testing.assert_array_equal(np.asarray(t_all)[2:5], np.asarray(t2)[:3])


def test_kmer_padding_invariance():
    """The subsample + cap streams are keyed per (cluster, chain, k-mer
    SLOT) via prefix-stable per-slot uniforms (_slot_uniform), so bucketing
    the same cluster into a larger K size class must not change its result.
    jax.random.uniform would NOT give this (its threefry counter pairing is
    shape-dependent) — this test pins the property that lets size-class
    granularity change without re-pinning goldens."""
    rng = np.random.default_rng(31)
    key = jax.random.PRNGKey(5)
    tables = _tables()
    outcomes = make_outcome_space(2)

    cls = _clusters(rng, 3, cid0=900)
    cfg_cap = GibbsConfig(
        num_chains=3, burn_in=10, num_samples=20, kmer_subsampling_rate=0.8,
        max_total_mult=8, apply_cap=True, max_haplotype_variant_kmers=7,
    )
    for cfg in (CFG, cfg_cap):
        t32, w32 = genotype_bucket(
            key, build_bucket(cls, (4, 32, 2, 1), S).device_arrays(),
            tables, outcomes, cfg,
        )
        t128, w128 = genotype_bucket(
            key, build_bucket(cls, (4, 128, 2, 1), S).device_arrays(),
            tables, outcomes, cfg,
        )
        np.testing.assert_array_equal(np.asarray(t32), np.asarray(t128))
        np.testing.assert_array_equal(
            np.asarray(w32), np.asarray(w128)[:, :, :32]
        )
        assert not np.asarray(w128)[:, :, 32:].any()
