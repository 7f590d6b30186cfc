"""Multi-chip sharding tests on the virtual 8-device CPU mesh: the genotype
kernel shards cluster-data-parallel with chip-count-invariant results, and
the noise chain's psum coupling works under shard_map."""

import numpy as np
import jax
import jax.numpy as jnp

from bayestyper_tpu.model.gibbs import GibbsConfig, genotype_bucket, make_outcome_space
from bayestyper_tpu.parallel.mesh import (
    genotype_bucket_sharded,
    make_mesh,
    noise_chain_sharded,
    shard_bucket,
)

import sys
sys.path.insert(0, "/root/repo")
from __graft_entry__ import _make_demo_bucket


def test_chip_count_invariance():
    """Counter-based per-cluster PRNG makes tallies identical regardless of
    how many devices the bucket is sharded over (the TPU analogue of the
    reference's thread-count independence, README v1.5)."""
    bucket, tables = _make_demo_bucket(num_clusters=16)
    outcomes = make_outcome_space(bucket.num_haplotypes)
    cfg = GibbsConfig(num_chains=2, burn_in=5, num_samples=10, max_total_mult=8)
    key = jax.random.PRNGKey(3)

    tally1, _ = genotype_bucket(key, bucket, tables, outcomes, cfg)

    mesh = make_mesh(8)
    tally8, _ = genotype_bucket_sharded(key, bucket, tables, outcomes, cfg, mesh)

    np.testing.assert_array_equal(np.asarray(tally1), np.asarray(tally8))


def test_noise_chain_psum():
    bucket, tables = _make_demo_bucket(num_clusters=16)
    outcomes = make_outcome_space(bucket.num_haplotypes)
    cfg = GibbsConfig(num_chains=1, burn_in=3, num_samples=5, max_total_mult=8)
    mesh = make_mesh(8)

    rate_sum, trace = noise_chain_sharded(
        jax.random.PRNGKey(0), bucket, tables,
        jnp.full(bucket.num_samples, 0.01), (1.0, 0.01), outcomes, cfg, 0, mesh,
    )
    rs = np.asarray(rate_sum)
    assert rs.shape == (bucket.num_samples,)
    assert np.isfinite(rs).all() and (rs > 0).all()
    assert np.asarray(trace).shape == (8, bucket.num_samples)
