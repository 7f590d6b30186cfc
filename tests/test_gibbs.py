"""End-to-end Gibbs sampler test: simulate k-mer counts for known genotypes,
run the bucketized sampler, and verify the calls + evidence statistics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bayestyper_tpu.model.buckets import (
    build_bucket, cover_tiebreak_key, greedy_minimum_cover,
)
from bayestyper_tpu.model.gibbs import (
    GibbsConfig,
    genotype_bucket,
    make_outcome_space,
)
from bayestyper_tpu.model.stats import FilterConfig, collect_bucket_stats
from bayestyper_tpu.ops.distributions import np_build_count_log_prob_tables

HAPLOID_MEAN = 15.0
HAPLOID_VAR = 30.0
NOISE_RATE = 0.05


def _nb_sample(rng, mean, var, mult, size):
    if mult == 0:
        return rng.poisson(NOISE_RATE, size)
    m, v = mean * mult, var * mult
    p = m / v
    r = m * m / (v - m)
    return rng.negative_binomial(r, p, size)


def make_snv_cluster(rng, genotypes, num_kmers_per_allele=20, cluster_id=0):
    """Biallelic SNV: hap0=ref allele0, hap1=alt allele1.

    genotypes: list of (a1, a2) per sample.
    """
    s = len(genotypes)
    k = 2 * num_kmers_per_allele
    mult = np.zeros((k, 2), dtype=np.uint8)
    mult[:num_kmers_per_allele, 0] = 1
    mult[num_kmers_per_allele:, 1] = 1

    counts = np.zeros((k, s), dtype=np.uint8)
    for si, (a1, a2) in enumerate(genotypes):
        m0 = (a1 == 0) + (a2 == 0)
        m1 = (a1 == 1) + (a2 == 1)
        counts[:num_kmers_per_allele, si] = np.clip(
            _nb_sample(rng, HAPLOID_MEAN, HAPLOID_VAR, m0, num_kmers_per_allele),
            0, 255,
        )
        counts[num_kmers_per_allele:, si] = np.clip(
            _nb_sample(rng, HAPLOID_MEAN, HAPLOID_VAR, m1, num_kmers_per_allele),
            0, 255,
        )

    member = np.zeros((k, 1, 2), dtype=bool)
    member[:, 0, :] = mult > 0

    cover = greedy_minimum_cover(
        mult, (counts > 0).any(axis=1), cover_tiebreak_key(1, cluster_id)
    )
    return {
        "mult": mult,
        "inter_mult": np.zeros((k, s), dtype=np.uint8),
        "counts": counts,
        "ploidy": np.full(s, 2, dtype=np.int8),
        "hap_allele": np.array([[0], [1]], dtype=np.int16),
        "num_alleles": np.array([2], dtype=np.int16),
        "member": member,
        "cover": cover,
        "cluster_id": cluster_id,
    }


@pytest.fixture(scope="module")
def run_result():
    rng = np.random.default_rng(7)
    genotypes = [(0, 0), (0, 1), (1, 1)]  # hom-ref, het, hom-alt
    clusters = [
        make_snv_cluster(rng, genotypes, cluster_id=i) for i in range(3)
    ]
    bucket = build_bucket(clusters, size_class=(4, 64, 4, 2), num_samples=3)
    bucket = bucket.device_arrays()

    tables = jnp.asarray(
        np_build_count_log_prob_tables(
            np.full(3, HAPLOID_MEAN / HAPLOID_VAR),
            np.full(3, HAPLOID_MEAN**2 / (HAPLOID_VAR - HAPLOID_MEAN)),
            np.full(3, NOISE_RATE),
            16,
        )
    )

    outcomes = make_outcome_space(4)
    # 0.5 subsampling: the default 0.1 leaves ~2 kmers per chain on these
    # tiny 20-kmer alleles — call outcomes become RNG-stream lottery (real
    # 55-mer clusters carry ~110 kmers per allele)
    cfg = GibbsConfig(num_chains=4, burn_in=30, num_samples=80,
                      max_total_mult=8, kmer_subsampling_rate=0.5)
    tally, w = genotype_bucket(jax.random.PRNGKey(11), bucket, tables, outcomes, cfg)

    filters = FilterConfig(
        min_genotype_posterior=0.99,
        min_number_of_kmers=1.0,
        min_fraction_observed_kmers=(0.9, 0.9, 0.9),
    )
    stats = collect_bucket_stats(
        bucket, outcomes, tally, w, filters, allele_capacity=4
    )
    return bucket, outcomes, cfg, np.asarray(tally), np.asarray(w), stats


def test_tally_totals(run_result):
    bucket, outcomes, cfg, tally, w, stats = run_result
    # every (valid cluster, chain, sample) tallies exactly num_samples draws
    totals = tally.sum(axis=-1)
    assert (totals == cfg.num_samples).all()


def test_genotype_calls(run_result):
    bucket, outcomes, cfg, tally, w, stats = run_result
    gt = np.asarray(stats.gt)  # [C, S, V, 2]
    expected = np.array([[0, 0], [0, 1], [1, 1]])
    for c in range(3):
        np.testing.assert_array_equal(gt[c, :, 0, :], expected)


def test_gpp_confident(run_result):
    bucket, outcomes, cfg, tally, w, stats = run_result
    gq = np.asarray(stats.gq)
    assert (gq[:3, :, 0] > 20).all(), gq[:3, :, 0]


def test_allele_posteriors(run_result):
    _, _, _, _, _, stats = run_result
    app = np.asarray(stats.app)  # [C, S, V, A]
    # hom-ref sample: allele0 posterior ~1, allele1 ~0
    assert app[0, 0, 0, 0] > 0.95
    assert app[0, 0, 0, 1] < 0.05
    # het: both ~1
    assert app[0, 1, 0, 0] > 0.95 and app[0, 1, 0, 1] > 0.95


def test_nak_fak(run_result):
    bucket, outcomes, cfg, tally, w, stats = run_result
    nak = np.asarray(stats.nak)
    fak = np.asarray(stats.fak)
    # het sample carries both alleles; expected NAK ~= mean subset size
    # = rate * 20 kmers = 10
    assert 3.0 < nak[0, 1, 0, 0] < 17.0
    assert 3.0 < nak[0, 1, 0, 1] < 17.0
    # carried alleles have most kmers observed
    assert fak[0, 1, 0, 0] > 0.8
    # hom-ref sample, allele 0: all kmers observed
    assert fak[0, 0, 0, 0] > 0.9


def test_mac_reasonable(run_result):
    _, _, _, _, _, stats = run_result
    mac = np.asarray(stats.mac)
    # het sample: count/multiplicity ~ haploid mean 15
    val = mac[0, 1, 0, 0]
    if val >= 0:  # only defined when kmers were subsampled for the allele
        assert 5.0 < val < 30.0, val


def test_padding_cluster_harmless(run_result):
    bucket, outcomes, cfg, tally, w, stats = run_result
    # padding cluster (index 3) has null ploidy: all tallies on the null outcome
    assert (tally[3, :, :, :-1] == 0).all()
    assert (tally[3, :, :, -1] == cfg.num_samples).all()


def test_noise_mode_ll_decomposition():
    """LL with include_noise_row=False plus the analytic noise term must equal
    the frozen-noise LL built with the same rates — including for kmers with
    dip_mult==0 but inter_mult>0, whose genomic NB(count|inter) contribution
    the noise path must NOT drop (calcDiplotypeLogProb scores dip+inter,
    VariantClusterHaplotypes.cpp:45-74)."""
    from bayestyper_tpu.model.gibbs import (
        compute_log_likelihoods,
        compute_noise_terms,
        subsample_masks,
    )

    rng = np.random.default_rng(21)
    s = 2
    cl = make_snv_cluster(rng, [(0, 1), (1, 1)], num_kmers_per_allele=10)
    # give some kmers intercluster multiplicity, including kmers where one
    # haplotype has dip_mult 0 (the alt-allele kmers for hap0 outcomes)
    inter = np.zeros((20, s), dtype=np.uint8)
    inter[::3] = 2
    cl["inter_mult"] = inter
    bucket = build_bucket([cl], size_class=(1, 64, 2, 1), num_samples=s)
    bucket = bucket.device_arrays()

    rates = np.array([0.05, 0.1])
    tables = jnp.asarray(
        np_build_count_log_prob_tables(
            np.full(s, 0.5), np.full(s, 7.5), rates, 16
        )
    )
    outcomes = make_outcome_space(2)
    key = jax.random.PRNGKey(3)
    w = subsample_masks(key, bucket.kmer_valid, 1, 1.0)

    ll_full = compute_log_likelihoods(
        bucket, outcomes, tables, w, 16, include_noise_row=True
    )
    ll_part = compute_log_likelihoods(
        bucket, outcomes, tables, w, 16, include_noise_row=False
    )
    a, b, c0 = compute_noise_terms(bucket, outcomes, w)
    log_r = np.log(rates)
    analytic = (
        a * log_r[None, None, :, None]
        - b * rates[None, None, :, None]
        - c0
    )
    # null outcome column is zeroed in both paths
    got = np.asarray(ll_part + analytic)[..., :-1]
    want = np.asarray(ll_full)[..., :-1]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)
    # the old behaviour dropped the inter>0/dip==0 genomic terms entirely:
    # ensure those terms are actually nonzero in this fixture
    assert np.abs(want - np.asarray(ll_part)[..., :-1]).max() > 1.0


def test_apply_kmer_cap_exact_semantics():
    """The shuffled-order per-(haplotype, variant) cap: with single-membership
    kmers the counter equals the true kept count, so each pair must keep
    EXACTLY min(cap, bernoulli-selected) kmers (isMaxHaplotypeVariantKmer,
    VariantClusterHaplotypes.cpp:159-178). Multi-membership kmers may exceed
    the true count (the reference caps the counter, not the membership), so
    they are only checked for the subset property.
    """
    from bayestyper_tpu.model.buckets import _pack_member_bits
    from bayestyper_tpu.model.gibbs import apply_kmer_cap

    rng = np.random.default_rng(9)
    c, ch, k, v, h, cap = 2, 3, 256, 1, 2, 20
    member_bool = np.zeros((c, k, v, h), dtype=bool)
    member_bool[:, 0::2, 0, 0] = True   # hap0-only kmers
    member_bool[:, 1::2, 0, 1] = True   # hap1-only kmers
    member = jnp.asarray(_pack_member_bits(member_bool))

    w = jnp.asarray(rng.random((c, ch, k)) < 0.9)
    out = np.asarray(
        apply_kmer_cap(jax.random.PRNGKey(0), w, member, h, cap)
    )
    w_np = np.asarray(w)
    assert not (out & ~w_np).any()  # subset of the Bernoulli mask
    for ci in range(c):
        for xi in range(ch):
            for hap, sl in ((0, slice(0, None, 2)), (1, slice(1, None, 2))):
                kept = out[ci, xi, sl].sum()
                selected = w_np[ci, xi, sl].sum()
                assert kept == min(cap, selected), (ci, xi, hap, kept)


def test_apply_kmer_cap_multi_membership_subset():
    """Kmers on several (haplotype, variant) pairs survive while ANY pair is
    under cap; the output stays a subset of the Bernoulli mask and single-pair
    kmers never exceed the cap."""
    from bayestyper_tpu.model.buckets import _pack_member_bits
    from bayestyper_tpu.model.gibbs import apply_kmer_cap

    rng = np.random.default_rng(10)
    c, ch, k, v, h, cap = 1, 2, 192, 1, 2, 15
    member_bool = np.zeros((c, k, v, h), dtype=bool)
    member_bool[:, 0::3, 0, 0] = True
    member_bool[:, 1::3, 0, 1] = True
    member_bool[:, 2::3, 0, :] = True  # shared kmers
    member = jnp.asarray(_pack_member_bits(member_bool))

    w = jnp.ones((c, ch, k), dtype=bool)
    out = np.asarray(apply_kmer_cap(jax.random.PRNGKey(1), w, member, h, cap))
    # single-membership kept counts are bounded by the cap
    for xi in range(ch):
        assert out[0, xi, 0::3].sum() <= cap
        assert out[0, xi, 1::3].sum() <= cap
        # far fewer kmers survive than the 192 selected
        assert out[0, xi].sum() <= 3 * cap
        assert out[0, xi].sum() >= cap


def test_noise_chain_multi_pools_across_size_classes():
    """noise_chain_multi must couple ALL size classes through the per-
    iteration gamma update (the reference estimates noise from every
    single-cluster group regardless of size, InferenceEngine.cpp:141-151).
    Rates estimated from two differently-shaped buckets together should land
    near the simulated truth."""
    from bayestyper_tpu.model.gibbs import noise_chain_multi

    rng = np.random.default_rng(13)
    genotypes = [(0, 1), (1, 1), (0, 0)]
    small = [make_snv_cluster(rng, genotypes, 20, cluster_id=i)
             for i in range(2)]
    large = [make_snv_cluster(rng, genotypes, 60, cluster_id=10 + i)
             for i in range(2)]
    b_small = build_bucket(small, (2, 64, 4, 1), 3).device_arrays()
    b_large = build_bucket(large, (2, 128, 4, 1), 3).device_arrays()

    tables = jnp.asarray(
        np_build_count_log_prob_tables(
            np.full(3, HAPLOID_MEAN / HAPLOID_VAR),
            np.full(3, HAPLOID_MEAN**2 / (HAPLOID_VAR - HAPLOID_MEAN)),
            np.full(3, 1e-3),
            16,
        )
    )
    cfg = GibbsConfig(num_chains=1, burn_in=40, num_samples=100,
                      kmer_subsampling_rate=1.0, max_total_mult=8)
    outs = (make_outcome_space(4), make_outcome_space(4))
    prior = (1.0, 0.01)
    sums = []
    for chain in range(4):
        k_init = jax.random.fold_in(jax.random.PRNGKey(5), chain)
        init = jax.random.gamma(k_init, prior[0], (3,)) * prior[1]
        rate_sum, trace = noise_chain_multi(
            jax.random.PRNGKey(5), (b_small, b_large), tables, init, prior,
            outs, (cfg, cfg), chain_idx=chain,
        )
        assert trace.shape == (140, 3)
        sums.append(np.asarray(rate_sum))
    mean = np.sum(sums, axis=0) / (100 * 4)
    # simulated noise rate is NOISE_RATE=0.05 on mult-0 kmers
    assert (mean > 0.005).all() and (mean < 0.5).all(), mean
