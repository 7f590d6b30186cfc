"""Production path vs the reference-semantics oracle (tests/oracle.py).

Three layers of evidence, strongest first:
  1. Deterministic parts EXACT: count log-pmf tables (incl. sequential tail
     fold) and the per-diplotype log-likelihood contraction match the scalar
     float64 oracle to f32 tolerance.
  2. Posterior agreement: the batched device Gibbs and the scalar oracle
     Gibbs (independent RNG streams, independent code paths) produce the
     same per-sample genotype posteriors within MCMC tolerance across
     scenarios: diploid SNV, ambiguous het, haploid + null ploidy,
     intercluster reference-copy kmers, dense (non-sparse) prior.
  3. Joint-noise mode: posterior mean noise rates agree within tolerance.

A future optimization that shifts posteriors (e.g. breaking the HWE prior,
the spike-slab size distribution, or the LL clamp semantics) fails here even
if the pinned goldens are re-pinned.
"""

import numpy as np
import pytest

import jax

from bayestyper_tpu.model.buckets import build_bucket, greedy_minimum_cover, cover_tiebreak_key
from bayestyper_tpu.model.gibbs import (
    GibbsConfig, genotype_bucket, make_outcome_space,
)
from bayestyper_tpu.ops.distributions import np_build_count_log_prob_tables

from tests import oracle


def _make_cluster(rng, k=24, h=2, s=3, ploidy=None, with_inter=False,
                  coverage=30.0, truth=None):
    """Random small cluster with NB-ish counts consistent with `truth`
    (a list of per-sample diplotypes as haplotype index pairs)."""
    # haplotype multiplicities: each kmer belongs to 1-2 haplotypes
    mult = np.zeros((k, h), np.uint8)
    for kk in range(k):
        which = rng.choice(h, size=rng.integers(1, min(h, 2) + 1), replace=False)
        mult[kk, which] = 1
    inter = np.zeros((k, s), np.uint8)
    if with_inter:
        inter[rng.random(k) < 0.3] = 1
    if ploidy is None:
        ploidy = np.full(s, 2, np.int8)
    ploidy = np.asarray(ploidy, np.int8)
    if truth is None:
        truth = [tuple(sorted(rng.integers(0, h, 2))) for _ in range(s)]
    counts = np.zeros((k, s), np.uint8)
    for si in range(s):
        h1, h2 = truth[si]
        m = inter[:, si].astype(np.int64)
        if ploidy[si] >= 1:
            m = m + mult[:, h1]
        if ploidy[si] == 2:
            m = m + mult[:, h2]
        lam = coverage / 2.0 * m
        c = rng.poisson(lam) + (rng.random(k) < 0.02)  # a little noise
        counts[:, si] = np.minimum(c, 255).astype(np.uint8)
    hap_allele = np.arange(h, dtype=np.int16)[:, None]  # V=1, allele = hap
    num_alleles = np.array([h], np.int16)
    return oracle.OracleCluster(
        mult=mult, inter=inter, counts=counts, ploidy=ploidy,
        hap_allele=hap_allele, num_alleles=num_alleles,
    ), truth


def _bucket_from_cluster(cl: "oracle.OracleCluster", cluster_id=7, seed=1,
                         cap=(1, None, None, 1)):
    k, h = cl.mult.shape
    v = cl.hap_allele.shape[1]
    cap_c, cap_k, cap_h, cap_v = cap
    cap_k = cap_k or k
    cap_h = cap_h or h
    member = np.zeros((k, v, h), bool)
    member[:, 0, :] = cl.mult > 0
    # real path kmers always touch >= 1 haplotype; synthetic pure-noise rows
    # (mult == 0 everywhere) are uncoverable and are not cover rows
    cover = greedy_minimum_cover(
        cl.mult, (cl.counts.sum(axis=1) > 0) & cl.mult.any(axis=1),
        cover_tiebreak_key(seed, cluster_id),
    )
    cluster = dict(
        mult=cl.mult, inter_mult=cl.inter, counts=cl.counts,
        ploidy=cl.ploidy, hap_allele=cl.hap_allele,
        num_alleles=cl.num_alleles, member=member, cover=cover,
        cluster_id=cluster_id,
    )
    bucket = build_bucket([cluster], (cap_c, cap_k, cap_h, cap_v), cl.s)
    sparsity = float(bucket.sparsity[0])
    use_sparse = bool(bucket.use_sparse[0])
    return bucket.device_arrays(), sparsity, use_sparse


def _production_posteriors(cl, bucket, tables, num_chains=24, burn=100,
                           samples=400, max_total_mult=8):
    cfg = GibbsConfig(
        num_chains=num_chains, burn_in=burn, num_samples=samples,
        kmer_subsampling_rate=1.0, max_total_mult=max_total_mult,
        apply_cap=False, has_inter=bool(cl.inter.any()),
    )
    osp = make_outcome_space(bucket.num_haplotypes)
    key = jax.random.PRNGKey(11)
    tally, _ = genotype_bucket(key, bucket, tables, osp, cfg)
    t = np.asarray(tally)[0].sum(axis=0)  # [S, O]
    # bucket H == cluster H in these tests, so outcome layouts coincide
    return oracle.posteriors_from_tally(cl, t.astype(np.int64))


@pytest.fixture(scope="module")
def nb_params():
    # 30x coverage-ish NB per haploid copy
    mean, var = np.float64(15.0), np.float64(40.0)
    var = max(var, mean / 0.99)
    p = mean / var
    size = mean * mean / (var - mean)
    return p, size


def test_tables_match_sequential_tail_fold(nb_params):
    p, size = nb_params
    rates = np.array([1e-3, 2e-2])
    ours = np_build_count_log_prob_tables(
        np.array([p, p]), np.array([size, size]), rates, max_multiplicity=12,
    )
    ref = oracle.oracle_tables(
        np.array([p, p]), np.array([size, size]), rates, max_multiplicity=12,
    )
    assert np.allclose(ours, ref.astype(np.float32), atol=2e-4, rtol=1e-5), (
        np.abs(ours - ref).max()
    )


def test_diplotype_log_likelihood_exact(nb_params):
    from bayestyper_tpu.model.gibbs import compute_log_likelihoods

    p, size = nb_params
    rng = np.random.default_rng(3)
    cl, _ = _make_cluster(rng, k=24, h=4, s=3, with_inter=True)
    bucket, _, _ = _bucket_from_cluster(cl)
    rates = np.full(3, 1e-3)
    tables64 = np_build_count_log_prob_tables(
        np.full(3, p), np.full(3, size), rates, max_multiplicity=16,
    )
    import jax.numpy as jnp

    osp = make_outcome_space(4)
    w = jnp.ones((1, 1, 24), bool)
    ll = compute_log_likelihoods(
        bucket, osp, jnp.asarray(tables64), w, max_total_mult=12,
        include_noise_row=True, has_inter=True,
    )
    ll = np.asarray(ll)[0, 0]  # [S, O]

    outcomes = oracle.enumerate_outcomes(4)
    ref_tab = tables64.astype(np.float64)
    for s in range(3):
        for oi, (h1, h2) in enumerate(outcomes):
            if h1 is None:  # null outcome column zeroed by the kernel
                continue
            want = oracle.diplotype_log_likelihood(
                cl, ref_tab, s, h1, h2, np.ones(24, bool), max_total_mult=12,
            )
            got = ll[s, oi]
            assert abs(got - want) < 5e-3 + 1e-5 * abs(want), (
                s, oi, got, want
            )


def _compare_posteriors(cl, truth, seed=5, tol=0.04, num_chains=24,
                        samples=400, coverage_note=""):
    p = 15.0 / 40.0
    size = 15.0 * 15.0 / (40.0 - 15.0)
    s_n = cl.s
    rates = np.full(s_n, 1e-3)
    tables = np_build_count_log_prob_tables(
        np.full(s_n, p), np.full(s_n, size), rates, max_multiplicity=16,
    )
    bucket, sparsity, use_sparse = _bucket_from_cluster(cl)
    gpp_prod, app_prod = _production_posteriors(
        cl, bucket, np.asarray(tables), num_chains=num_chains, samples=samples,
    )
    tally, _, _ = oracle.oracle_gibbs(
        cl, tables.astype(np.float64), num_chains=num_chains, burn_in=100,
        num_samples=samples, seed=seed, sparsity=sparsity,
        use_sparse=use_sparse, max_total_mult=8,
    )
    gpp_ref, app_ref = oracle.posteriors_from_tally(cl, tally)
    dmax = np.abs(gpp_prod - gpp_ref).max()
    amax = np.abs(app_prod - app_ref).max()
    assert dmax < tol and amax < tol, (
        f"GPP delta {dmax:.4f} APP delta {amax:.4f} {coverage_note}"
    )
    # both must also agree on the MAP genotype for every called sample
    for s in range(s_n):
        if cl.ploidy[s] == 0:
            continue
        assert gpp_prod[s, 0].argmax() == gpp_ref[s, 0].argmax()


def test_posterior_diploid_snv():
    rng = np.random.default_rng(10)
    cl, truth = _make_cluster(rng, k=24, h=2, s=3)
    _compare_posteriors(cl, truth)


def test_posterior_ambiguous_low_coverage():
    rng = np.random.default_rng(11)
    cl, truth = _make_cluster(rng, k=8, h=2, s=2, coverage=6.0)
    _compare_posteriors(cl, truth, tol=0.06, num_chains=32, samples=500)


def test_posterior_haploid_and_null():
    rng = np.random.default_rng(12)
    cl, truth = _make_cluster(
        rng, k=20, h=3, s=3, ploidy=[2, 1, 0],
        truth=[(0, 1), (2, 2), (0, 0)],
    )
    _compare_posteriors(cl, truth)


def test_posterior_with_intercluster_multiplicity():
    rng = np.random.default_rng(13)
    cl, truth = _make_cluster(rng, k=24, h=2, s=2, with_inter=True)
    _compare_posteriors(cl, truth)


def test_posterior_dense_prior():
    # empty cover -> dense Dirichlet prior branch on both sides
    rng = np.random.default_rng(14)
    cl, truth = _make_cluster(rng, k=16, h=2, s=2)
    bucket, sparsity, use_sparse = _bucket_from_cluster(cl)
    # force the dense branch by zeroing counts' cover... instead build the
    # bucket with an empty cover:
    member = np.zeros((cl.k, 1, cl.h), bool)
    member[:, 0, :] = cl.mult > 0
    cluster = dict(
        mult=cl.mult, inter_mult=cl.inter, counts=cl.counts,
        ploidy=cl.ploidy, hap_allele=cl.hap_allele,
        num_alleles=cl.num_alleles, member=member, cover=[],
        cluster_id=7,
    )
    bucket = build_bucket([cluster], (1, cl.k, cl.h, 1), cl.s).device_arrays()
    p = 15.0 / 40.0
    size = 15.0 * 15.0 / (40.0 - 15.0)
    rates = np.full(cl.s, 1e-3)
    tables = np_build_count_log_prob_tables(
        np.full(cl.s, p), np.full(cl.s, size), rates, max_multiplicity=16,
    )
    gpp_prod, _ = _production_posteriors(cl, bucket, np.asarray(tables))
    tally, _, _ = oracle.oracle_gibbs(
        cl, tables.astype(np.float64), num_chains=24, burn_in=100,
        num_samples=400, seed=6, sparsity=0.5, use_sparse=False,
        max_total_mult=8,
    )
    gpp_ref, _ = oracle.posteriors_from_tally(cl, tally)
    assert np.abs(gpp_prod - gpp_ref).max() < 0.04


def test_joint_noise_rates_agree():
    """Joint-noise mode: posterior mean noise rates within tolerance.

    The production path pools noise statistics across clusters; with a
    single cluster the pooled update reduces to the reference's per-cluster
    accumulation (sampleNoiseParameters, CountDistribution.cpp:173-186)."""
    import jax.numpy as jnp
    from bayestyper_tpu.model.gibbs import noise_chains_multi

    rng = np.random.default_rng(20)
    cl, truth = _make_cluster(rng, k=32, h=2, s=2, coverage=30.0)
    # add unambiguous noise: some kmers with zero multiplicity everywhere
    # but small nonzero counts
    cl.mult[-8:, :] = 0
    cl.counts[-8:, :] = rng.poisson(0.8, (8, 2)).astype(np.uint8)

    p = 15.0 / 40.0
    size = 15.0 * 15.0 / (40.0 - 15.0)
    tables = np_build_count_log_prob_tables(
        np.full(2, p), np.full(2, size), np.full(2, 1e-3),
        max_multiplicity=16,
    )
    bucket, sparsity, use_sparse = _bucket_from_cluster(cl)

    prior = (1.0, 0.01)
    num_chains, burn, samples = 12, 100, 300
    cfg = GibbsConfig(
        num_chains=1, burn_in=burn, num_samples=samples,
        kmer_subsampling_rate=1.0, max_total_mult=8, apply_cap=False,
        has_inter=False,
    )
    osp = make_outcome_space(2)
    key = jax.random.PRNGKey(3)
    init = jnp.full((num_chains, 2), 1e-2, jnp.float32)
    rate_sums, traces = noise_chains_multi(
        key, (bucket,), jnp.asarray(tables), init, prior, (osp,), (cfg,),
        num_chains=num_chains,
    )
    prod_mean = np.asarray(rate_sums).sum(axis=0) / (num_chains * samples)

    _, _, ref_traces = oracle.oracle_gibbs(
        cl, tables.astype(np.float64), num_chains=num_chains, burn_in=burn,
        num_samples=samples, seed=9, sparsity=sparsity,
        use_sparse=use_sparse, max_total_mult=8,
        noise=dict(prior=prior, init_rates=np.full(2, 1e-2)),
    )
    ref_mean = np.mean(
        [t[burn:].mean(axis=0) for t in ref_traces], axis=0
    )
    # rates are tiny; compare on log scale within 25%
    assert np.all(np.abs(np.log(prod_mean) - np.log(ref_mean)) < 0.25), (
        prod_mean, ref_mean,
    )
