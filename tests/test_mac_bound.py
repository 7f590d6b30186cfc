"""MAC truncation error bound (VERDICT r2 item 8).

MAC (mean allele kmer count) depends on the sampled outcome through the
diplotype multiplicity, so collect_bucket_stats computes it over the top-T
outcomes by tally. With T = O the computation is EXACT (every outcome with
posterior mass contributes); the engine now uses T = O for all classes with
O <= 64 (H <= 10) and T = 8 above that.

This test quantifies the top-8 truncation error on an adversarially DENSE
posterior — flat likelihoods over H = 16 haplotypes (O = 153 outcomes), the
worst case for truncation — by comparing T = 8 against the exact T = O on
the same tallies. All other stats (GT/GQ/GPP/APP/NAK/FAK) are exact by
construction and must be bit-identical between the two calls.
"""

import numpy as np
import jax
import jax.numpy as jnp

from bayestyper_tpu.model.buckets import build_bucket
from bayestyper_tpu.model.gibbs import (
    GibbsConfig, genotype_bucket, make_outcome_space,
)
from bayestyper_tpu.model.stats import FilterConfig, collect_bucket_stats
from bayestyper_tpu.ops.distributions import np_build_count_log_prob_tables


def _dense_posterior_bucket(rng, h=16, k=64, s=2):
    """A cluster whose haplotypes are barely distinguishable: every kmer is
    shared by ~half the haplotypes, so the posterior spreads over many
    diplotypes and top-8 truncation actually bites."""
    # near-identical haplotypes: a shared backbone plus one low-signal
    # private kmer each -> the likelihood barely separates diplotypes and
    # the posterior stays spread over many outcomes
    mult = np.zeros((k, h), np.uint8)
    mult[: k - h, :] = 1                      # backbone shared by all
    for j in range(h):
        mult[k - h + j, j] = 1                # one private kmer per hap
    counts = np.zeros((k, s), np.uint8)
    for si in range(s):
        lam = 2.0 * (mult[:, rng.integers(h)] + mult[:, rng.integers(h)])
        counts[:, si] = np.minimum(rng.poisson(np.maximum(lam, 0.4)), 255)
    member = np.zeros((k, 1, h), bool)
    member[:, 0, :] = mult > 0
    cluster = dict(
        mult=mult, inter_mult=np.zeros((k, s), np.uint8), counts=counts,
        ploidy=np.full(s, 2, np.int8),
        hap_allele=np.arange(h, dtype=np.int16)[:, None],
        num_alleles=np.array([h], np.int16),
        member=member, cover=[], cluster_id=3,
    )
    return build_bucket([cluster], (1, k, h, 1), s).device_arrays()


def test_mac_top8_truncation_bounded():
    rng = np.random.default_rng(77)
    h, s = 16, 2
    bucket = _dense_posterior_bucket(rng, h=h, k=64, s=s)
    osp = make_outcome_space(h)

    p = 15.0 / 40.0
    size = 15.0 * 15.0 / (40.0 - 15.0)
    tables = jnp.asarray(np_build_count_log_prob_tables(
        np.full(s, p), np.full(s, size), np.full(s, 1e-3),
        max_multiplicity=16,
    ))
    cfg = GibbsConfig(num_chains=48, burn_in=30, num_samples=200,
                      kmer_subsampling_rate=1.0, max_total_mult=8,
                      apply_cap=False, has_inter=False)
    tally, w = genotype_bucket(jax.random.PRNGKey(5), bucket, tables, osp, cfg)

    # the posterior must actually be dense for this to be a worst case
    t = np.asarray(tally)[0].sum(axis=(0,))  # [S, O]
    occupied = (t > 0).sum(axis=-1)
    assert (occupied > 8).any(), f"posterior not dense: {occupied}"

    filters = FilterConfig.from_model(np.full(s, 30.0), 0.99, 1.0)
    exact = collect_bucket_stats(bucket, osp, tally, w, filters,
                                 allele_capacity=h,
                                 mac_top_t=osp.num_outcomes)
    top8 = collect_bucket_stats(bucket, osp, tally, w, filters,
                                allele_capacity=h, mac_top_t=8)

    mac_e = np.asarray(exact.mac)[0]
    mac_8 = np.asarray(top8.mac)[0]
    both = (mac_e >= 0) & (mac_8 >= 0)
    err = np.abs(mac_e - mac_8)[both]
    # top-8 covers the highest-tally outcomes; on this adversarially flat
    # posterior the residual mass shifts MAC by well under one count unit
    assert err.max() < 1.0, f"MAC top-8 error {err.max():.3f}"
    # alleles whose mass lies entirely inside the top-8 are identical
    assert np.median(err) < 0.25

    # every other statistic is tally-exact and independent of T
    for field in ("gpp", "app", "gq", "gt", "saf", "nak", "fak"):
        a = np.asarray(getattr(exact, field))
        b = np.asarray(getattr(top8, field))
        assert np.array_equal(a, b), field


def test_mac_exact_when_outcomes_small():
    """Engine policy: T = O (exact) for O <= 64."""
    from bayestyper_tpu.engine import _mac_top_t

    assert _mac_top_t(make_outcome_space(2)) == make_outcome_space(2).num_outcomes
    assert _mac_top_t(make_outcome_space(4)) == make_outcome_space(4).num_outcomes
    assert _mac_top_t(make_outcome_space(8)) == make_outcome_space(8).num_outcomes
    assert _mac_top_t(make_outcome_space(16)) == 8
    assert _mac_top_t(make_outcome_space(64)) == 8
