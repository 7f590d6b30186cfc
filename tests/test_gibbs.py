"""End-to-end Gibbs sampler test: simulate k-mer counts for known genotypes,
run the bucketized sampler, and verify the calls + evidence statistics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bayestyper_tpu.model.buckets import build_bucket, greedy_minimum_cover
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

    cover = greedy_minimum_cover(mult, (counts > 0).any(axis=1), rng)
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
    cfg = GibbsConfig(num_chains=4, burn_in=30, num_samples=80, max_total_mult=8)
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
    # het sample carries both alleles; expected NAK ~= mean subset size = 0.1*20=2
    assert 0.3 < nak[0, 1, 0, 0] < 8.0
    assert 0.3 < nak[0, 1, 0, 1] < 8.0
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
