"""Chunk-stacking invariance: the [B]-stacked programs (one compiled scan
body vmapped over a leading chunk axis) must produce bit-identical
per-cluster results to the per-chunk *_multi programs they replace — and
dummy all-zero padding chunks must not perturb anything."""

import jax
import jax.numpy as jnp
import numpy as np

from bayestyper_tpu.model.buckets import (
    build_bucket,
    slice_bucket,
    stack_buckets,
    zero_bucket_like,
)
from bayestyper_tpu.model.gibbs import (
    GibbsConfig,
    genotype_bucket,
    genotype_stacked,
    joint_chains_multi,
    joint_chains_stacked,
    make_outcome_space,
    noise_chains_multi,
    noise_chains_stacked,
)
from bayestyper_tpu.ops.distributions import np_build_count_log_prob_tables
from tests.test_gibbs import make_snv_cluster

S = 3
CFG = GibbsConfig(
    num_chains=3, burn_in=10, num_samples=20, kmer_subsampling_rate=0.8,
    max_total_mult=8,
)


def _tables():
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


def _chunks(rng, sizes, cid0=100):
    out = []
    cid = cid0
    for n in sizes:
        cls = _clusters(rng, n, cid0=cid)
        cid += 50
        out.append(build_bucket(cls, (4, 32, 2, 1), S).device_arrays())
    return out


def test_genotype_stacked_matches_per_chunk():
    rng = np.random.default_rng(41)
    key = jax.random.PRNGKey(5)
    tables = _tables()
    outcomes = make_outcome_space(2)

    chunks = _chunks(rng, [3, 4, 2])
    sb = stack_buckets(chunks)
    t_st, w_st = genotype_stacked(key, sb, tables, outcomes, CFG)
    assert t_st.shape[0] == 3
    for b, bucket in enumerate(chunks):
        t_one, w_one = genotype_bucket(key, bucket, tables, outcomes, CFG)
        np.testing.assert_array_equal(np.asarray(t_one), np.asarray(t_st)[b])
        np.testing.assert_array_equal(np.asarray(w_one), np.asarray(w_st)[b])


def test_genotype_stacked_dummy_padding_inert():
    rng = np.random.default_rng(43)
    key = jax.random.PRNGKey(5)
    tables = _tables()
    outcomes = make_outcome_space(2)

    chunks = _chunks(rng, [3, 2], cid0=400)
    sb2 = stack_buckets(chunks)
    sb4 = stack_buckets(chunks + [zero_bucket_like(chunks[0])] * 2)
    t2, w2 = genotype_stacked(key, sb2, tables, outcomes, CFG)
    t4, w4 = genotype_stacked(key, sb4, tables, outcomes, CFG)
    np.testing.assert_array_equal(np.asarray(t2), np.asarray(t4)[:2])
    np.testing.assert_array_equal(np.asarray(w2), np.asarray(w4)[:2])


def test_slice_bucket_roundtrip():
    rng = np.random.default_rng(47)
    chunks = _chunks(rng, [2, 3], cid0=800)
    sb = stack_buckets(chunks)
    back = slice_bucket(sb, 1)
    np.testing.assert_array_equal(
        np.asarray(back.counts), np.asarray(chunks[1].counts)
    )
    np.testing.assert_array_equal(
        np.asarray(back.cluster_id), np.asarray(chunks[1].cluster_id)
    )


def test_noise_stacked_matches_multi():
    rng = np.random.default_rng(53)
    key = jax.random.PRNGKey(9)
    tables = _tables()
    outcomes = make_outcome_space(2)
    num_chains = 3

    chunks = _chunks(rng, [3, 2], cid0=1200)
    init_rates = jnp.full((num_chains, S), 2e-3)
    prior = (1.0, 0.01)

    rs_multi, tr_multi = noise_chains_multi(
        key, tuple(chunks), tables, init_rates, prior,
        (outcomes, outcomes), (CFG, CFG), num_chains=num_chains,
    )
    sb = stack_buckets(chunks)
    nv = jnp.stack([c.cluster_valid for c in chunks])
    rs_st, tr_st = noise_chains_stacked(
        key, (sb,), (nv,), tables, init_rates, prior,
        (outcomes,), (CFG,), num_chains=num_chains,
    )
    np.testing.assert_array_equal(np.asarray(rs_multi), np.asarray(rs_st))
    np.testing.assert_array_equal(np.asarray(tr_multi), np.asarray(tr_st))


def test_noise_stacked_valid_mask_excludes():
    """Masked clusters must contribute nothing to the pooled statistics:
    a stacked run with extra clusters masked out equals a run without them."""
    rng = np.random.default_rng(59)
    key = jax.random.PRNGKey(9)
    tables = _tables()
    outcomes = make_outcome_space(2)
    num_chains = 2

    chunks = _chunks(rng, [3, 2], cid0=1600)
    init_rates = jnp.full((num_chains, S), 2e-3)
    prior = (1.0, 0.01)

    # baseline: only chunk 0 contributes
    rs_base, _ = noise_chains_stacked(
        key, (stack_buckets([chunks[0]]),),
        (jnp.stack([chunks[0].cluster_valid]),), tables, init_rates, prior,
        (outcomes,), (CFG,), num_chains=num_chains,
    )
    # same with chunk 1 riding along fully masked
    sb = stack_buckets(chunks)
    nv = jnp.stack([
        np.asarray(chunks[0].cluster_valid),
        np.zeros_like(np.asarray(chunks[1].cluster_valid)),
    ])
    rs_masked, _ = noise_chains_stacked(
        key, (sb,), (nv,), tables, init_rates, prior,
        (outcomes,), (CFG,), num_chains=num_chains,
    )
    np.testing.assert_array_equal(np.asarray(rs_base), np.asarray(rs_masked))


def test_joint_stacked_matches_multi():
    rng = np.random.default_rng(61)
    key = jax.random.PRNGKey(13)
    tables = _tables()
    outcomes = make_outcome_space(2)
    num_chains = 2

    chunks = _chunks(rng, [2, 3], cid0=2000)
    init_rates = jnp.full((num_chains, S), 2e-3)
    prior = (1.0, 0.01)

    t_multi, w_multi, tr_multi = joint_chains_multi(
        key, tuple(chunks), tables, init_rates, prior,
        (outcomes, outcomes), (CFG, CFG), num_chains=num_chains,
    )
    sb = stack_buckets(chunks)
    t_st, w_st, tr_st = joint_chains_stacked(
        key, (sb,), tables, init_rates, prior,
        (outcomes,), (CFG,), num_chains=num_chains,
    )
    np.testing.assert_array_equal(np.asarray(tr_multi), np.asarray(tr_st))
    for b in range(2):
        np.testing.assert_array_equal(
            np.asarray(t_multi[b]), np.asarray(t_st[0])[b]
        )
        np.testing.assert_array_equal(
            np.asarray(w_multi[b]), np.asarray(w_st[0])[b]
        )
