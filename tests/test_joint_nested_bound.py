"""Bound the joint-mode nested frozen-noise approximation.

Reference semantics (estimateNoiseAndGenotypes, InferenceEngine.cpp:384-472,
per-iteration resample :428-443): in `--noise-genotyping` mode EVERY group —
including nested containment families — samples diplotypes each iteration
and contributes its zero-multiplicity counts to the pooled per-iteration
noise gamma update.

Production (engine.genotype_unit_joint) excludes nested families from the
joint phase and genotypes them post-hoc under the joint-estimated noise
rates FROZEN at their posterior mean (PARITY "Nested clusters" documented
approximation #3). Two deviations follow:

  1. the pooled noise rates miss the nested family's noise counts;
  2. the family's posteriors are computed under fixed rather than
     per-iteration-resampled rates.

This test implements BOTH semantics as scalar float64 oracles (`_run_joint`
with and without family pooling + a frozen-rate pass) on a family of one
deletion parent demoting one contained SNV child plus independent SNV
clusters, and bounds the noise-rate and GPP deviations — in a realistic
regime (noise evidence dominated by the independent bulk, as in any real
unit where nested families are a rare fraction) and in a pathological one
(the family holds a large share of the noise evidence).
"""

import numpy as np

from tests.oracle import (
    MAX_COUNT,
    OracleCluster,
    _log_discrete_sample,
    _sample_sparse_frequencies,
    diplotype_log_likelihood,
    enumerate_outcomes,
    hwe_prior,
    oracle_tables,
    poisson_log_pmf,
)

S = 2
MEAN, VAR = 18.0, 40.0
PRIOR = (1.0, 0.01)


def _mk_cluster(rng, h, n_per_hap, noise_kmers, noise_count_rate, gts=None):
    """Cluster with n_per_hap kmers per haplotype + noise_kmers kmers of
    multiplicity 0 everywhere (pure noise evidence). `gts` pins the truth
    (needed for a COHERENT nested family: the child's counts must agree
    with the parent's deletion status)."""
    k = h * n_per_hap + noise_kmers
    mult = np.zeros((k, h), np.int64)
    for hh in range(h):
        mult[hh * n_per_hap : (hh + 1) * n_per_hap, hh] = 1
    counts = np.zeros((k, S), np.int64)
    if gts is None:
        gts = [tuple(rng.integers(0, h, 2)) for _ in range(S)]
    for s, (a1, a2) in enumerate(gts):
        for hh in range(h):
            m = (a1 == hh) + (a2 == hh)
            if m:
                mm, vv = MEAN * m, VAR * m
                counts[hh * n_per_hap : (hh + 1) * n_per_hap, s] = \
                    rng.negative_binomial(mm * mm / (vv - mm), mm / vv,
                                          n_per_hap)
    counts[h * n_per_hap :, :] = rng.poisson(noise_count_rate,
                                             (noise_kmers, S))
    return OracleCluster(
        mult=mult, inter=np.zeros((k, S), np.int64), counts=counts,
        ploidy=np.full(S, 2, np.int64),
        hap_allele=np.arange(h, dtype=np.int64)[:, None],
        num_alleles=np.array([h], np.int64),
    ), gts


def _valid_outcomes(outcomes, pl, freqs):
    cand = []
    for oi, (h1, h2) in enumerate(outcomes):
        if pl == 2:
            ok = h1 is not None and h2 is not None
        elif pl == 1:
            ok = h1 is not None and h2 is None
        else:
            ok = h1 is None
        if not ok:
            continue
        if h1 is not None and freqs[h1] <= 0:
            continue
        if h2 is not None and freqs[h2] <= 0:
            continue
        cand.append(oi)
    return cand


def _sample_cluster(rng, cl, outcomes, freqs, tabs, ploidy):
    """One iteration of diplotype sampling for one cluster; returns
    (selected outcome per sample, haplotype counts)."""
    hap_counts = np.zeros(cl.h, np.int64)
    sel = []
    w = np.ones(cl.k, bool)
    for s in range(cl.s):
        cand = _valid_outcomes(outcomes, int(ploidy[s]), freqs)
        lps = []
        for oi in cand:
            h1, h2 = outcomes[oi]
            lps.append(
                hwe_prior(freqs, h1, h2)
                + diplotype_log_likelihood(cl, tabs, s, h1, h2, w)
            )
        pick = cand[_log_discrete_sample(rng, np.asarray(lps))]
        sel.append(pick)
        h1, h2 = outcomes[pick]
        if h1 is not None:
            hap_counts[h1] += 1
        if h2 is not None:
            hap_counts[h2] += 1
    return sel, hap_counts


def _noise_stats(cl, outcomes, sel):
    """Zero-multiplicity sufficient statistics (a, b) per sample at the
    sampled outcomes (getNoiseCounts, VariantClusterGenotyper.cpp:757-779;
    null-ploidy samples contribute every kmer)."""
    a = np.zeros(cl.s)
    b = np.zeros(cl.s)
    for s in range(cl.s):
        h1, h2 = outcomes[sel[s]]
        for kk in range(cl.k):
            m = int(cl.inter[kk, s])
            if h1 is not None:
                m += int(cl.mult[kk, h1])
            if h2 is not None:
                m += int(cl.mult[kk, h2])
            if m == 0:
                a[s] += int(cl.counts[kk, s])
                b[s] += 1.0
    return a, b


def _run_joint(clusters, tables0, chains, burn, iters, seed,
               include_family_in_pool=True, frozen_rates=None):
    """Scalar joint-mode Gibbs.

    clusters: list of (cluster, role) where role is 'indep', 'parent' or
    ('child', parent_idx, demote_allele). Parent outcomes demote their
    child's ploidy by one level per demoting-allele copy
    (VariantClusterGroup::runGibbsSample ploidy demotion).
    frozen_rates: if set, noise rows stay fixed at these rates and no gamma
    update runs (the production post-hoc mode).
    Returns (tallies per cluster [S, O], mean post-burn-in rates).
    """
    out_spaces = [enumerate_outcomes(cl.h) for cl, _ in clusters]
    tallies = [np.zeros((cl.s, len(osp)), np.int64)
               for (cl, _), osp in zip(clusters, out_spaces)]
    rate_sum = np.zeros(S)
    rate_n = 0
    shape0, scale0 = PRIOR

    for chain in range(chains):
        rng = np.random.default_rng((seed, chain))
        tabs = tables0.copy()
        rates = np.full(S, 1e-3) if frozen_rates is None else frozen_rates
        for s in range(S):
            for c in range(MAX_COUNT + 1):
                tabs[s, 0, c] = poisson_log_pmf(c, rates[s])
        freqs_list = [np.full(cl.h, 1.0 / cl.h) for cl, _ in clusters]
        for it in range(iters):
            sels = [None] * len(clusters)
            for ci, (cl, role) in enumerate(clusters):
                if isinstance(role, tuple) and role[0] == "child":
                    _, pi, dem = role
                    pout = out_spaces[pi]
                    ploidy = np.zeros(cl.s, np.int64)
                    for s in range(cl.s):
                        h1, h2 = pout[sels[pi][s]]
                        keep = 0
                        for hh in (h1, h2):
                            if hh is not None and hh != dem:
                                keep += 1
                        ploidy[s] = keep
                else:
                    ploidy = cl.ploidy
                sel, hap_counts = _sample_cluster(
                    rng, cl, out_spaces[ci], freqs_list[ci], tabs, ploidy
                )
                sels[ci] = sel
                if hap_counts.sum() > 0:
                    freqs_list[ci] = _sample_sparse_frequencies(
                        rng, hap_counts, 0.5
                    )
            if frozen_rates is None:
                a_tot = np.zeros(S)
                b_tot = np.zeros(S)
                for ci, (cl, role) in enumerate(clusters):
                    is_family = role != "indep"
                    if is_family and not include_family_in_pool:
                        continue
                    a, b = _noise_stats(cl, out_spaces[ci], sels[ci])
                    a_tot += a
                    b_tot += b
                for s in range(S):
                    rates[s] = rng.gamma(
                        shape0 + a_tot[s], scale0 / (b_tot[s] * scale0 + 1.0)
                    )
                    for c in range(MAX_COUNT + 1):
                        tabs[s, 0, c] = poisson_log_pmf(c, rates[s])
            if it >= burn:
                for ci in range(len(clusters)):
                    for s, oi in enumerate(sels[ci]):
                        tallies[ci][s, oi] += 1
                if frozen_rates is None:
                    rate_sum += rates
                    rate_n += 1
    mean_rates = rate_sum / max(rate_n, 1)
    return tallies, mean_rates


def _gpp(tally):
    t = tally.astype(np.float64)
    return t / np.maximum(t.sum(axis=1, keepdims=True), 1.0)


def _setup(rng, n_indep, indep_noise_kmers, family_noise_kmers):
    tables = oracle_tables(
        np.full(S, MEAN / VAR),
        np.full(S, MEAN * MEAN / (VAR - MEAN)),
        np.full(S, 1e-3), 8,
    )
    true_rate = 0.08
    clusters = []
    for _ in range(n_indep):
        cl, _ = _mk_cluster(rng, 2, 10, indep_noise_kmers, true_rate)
        clusters.append((cl, "indep"))
    # parent: ref (hap 0, retains) vs deletion (hap 1, demotes the child).
    # COHERENT truth: no sample carries the deletion, so the child's
    # diploid counts are consistent with its undemoted state — rate
    # inflation from demotion-orphaned genomic counts would otherwise
    # swamp the comparison in BOTH semantics.
    parent, _ = _mk_cluster(
        rng, 2, 12, family_noise_kmers, true_rate,
        gts=[(0, 0)] * S,
    )
    child, _ = _mk_cluster(rng, 2, 8, family_noise_kmers, true_rate)
    pi = len(clusters)
    clusters.append((parent, "parent"))
    clusters.append((child, ("child", pi, 1)))
    return clusters, tables


def _deviation(n_indep, indep_noise, family_noise, seed=11):
    rng = np.random.default_rng(seed)
    clusters, tables = _setup(rng, n_indep, indep_noise, family_noise)
    chains, burn, iters = 6, 40, 160

    # (A) reference: family participates per iteration
    t_ref, rates_ref = _run_joint(
        clusters, tables, chains, burn, iters, seed=101,
        include_family_in_pool=True,
    )
    # (B) production: joint over independents only (family still sampled,
    # masked from the pool — its draws touch nothing else), then the family
    # re-genotyped under the frozen mean rates
    t_prod_joint, rates_prod = _run_joint(
        clusters, tables, chains, burn, iters, seed=101,
        include_family_in_pool=False,
    )
    t_prod_frozen, _ = _run_joint(
        clusters, tables, chains, burn, iters, seed=202,
        frozen_rates=rates_prod,
    )
    fam_idx = [i for i, (_, role) in enumerate(clusters) if role != "indep"]
    gpp_dev = max(
        np.abs(_gpp(t_ref[i]) - _gpp(t_prod_frozen[i])).max()
        for i in fam_idx
    )
    rate_dev = np.abs(rates_ref - rates_prod).max() / rates_ref.max()
    # MCMC resolution: the same reference semantics re-run with a different
    # seed — deviations below this are noise, not approximation error
    t_ref2, rates_ref2 = _run_joint(
        clusters, tables, chains, burn, iters, seed=707,
        include_family_in_pool=True,
    )
    mcmc_gpp = max(
        np.abs(_gpp(t_ref[i]) - _gpp(t_ref2[i])).max() for i in fam_idx
    )
    mcmc_rate = np.abs(rates_ref - rates_ref2).max() / rates_ref.max()
    return gpp_dev, rate_dev, mcmc_gpp, mcmc_rate


def test_realistic_regime_deviation_negligible():
    """Real units: nested families are a rare fraction of the noise pool
    (the reference draws min(N, 100k) variants; families are <<1% of them).
    8 independent clusters vs 1 family -> the frozen-noise approximation
    must be indistinguishable from per-iteration participation within MCMC
    resolution."""
    gpp_dev, rate_dev, mcmc_gpp, mcmc_rate = _deviation(
        n_indep=8, indep_noise=12, family_noise=6
    )
    assert rate_dev <= max(2.0 * mcmc_rate, 0.12), (rate_dev, mcmc_rate)
    assert gpp_dev <= max(2.0 * mcmc_gpp, 0.05), (gpp_dev, mcmc_gpp)


def test_pathological_regime_bounded():
    """Worst case: the family carries HALF the unit's noise evidence (never
    true in practice). The rate deviation is then bounded by the family's
    share of the pooled statistics, and the family GPP deviation stays
    bounded (documented in PARITY 'Nested clusters' approximation #3)."""
    gpp_dev, rate_dev, mcmc_gpp, mcmc_rate = _deviation(
        n_indep=1, indep_noise=10, family_noise=10
    )
    # At TOY pool sizes the Gamma(1, 0.01) prior dominates the conjugate
    # update (tens of observations vs a real unit's millions), so halving
    # the pooled observations shifts the prior shrinkage itself — the rate
    # deviation here is bounded by that shrinkage ratio, NOT by an
    # expectation difference (both modes estimate the same true rate).
    # What must stay bounded for outputs is the family GPP deviation.
    assert rate_dev <= 0.75, (rate_dev, mcmc_rate)
    assert gpp_dev <= max(3.0 * mcmc_gpp, 0.10), (gpp_dev, mcmc_gpp)
