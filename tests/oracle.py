"""Reference-semantics oracle: a slow, scalar, float64 NumPy rendering of the
reference implementation's per-cluster Gibbs sampler and count model.

This is NOT copied code — it is a from-scratch transliteration of the
*semantics* read out of the reference sources, kept deliberately scalar and
sequential so each line maps 1:1 onto the cited C++:

  - NB logPmf + size scaling            NegativeBinomialDistribution.cpp:122-147
  - count log-pmf caches + tail fold    CountDistribution.cpp:215-347
  - calcCountLogProb dispatch           CountDistribution.cpp:255-265
  - diplotype log-prob (HWE + kmers)    VariantClusterGenotyper.cpp:597-666
  - diplotype enumeration + sampling    VariantClusterGenotyper.cpp:668-755
  - inverse-CDF log sampler             DiscreteSampler.cpp:77-126
  - sparse spike-slab simplex sampler   FrequencyDistribution.cpp:143-303
  - dense Dirichlet sampler             FrequencyDistribution.cpp:75-93
  - noise sufficient statistics         VariantClusterGenotyper.cpp:757-779
  - noise gamma update                  CountDistribution.cpp:173-200
  - posterior tallies -> GPP/APP        VariantClusterGenotyper.cpp:249-370

The production path (bayestyper_tpu.model.gibbs) reformulates all of this as
batched device tensor programs; tests/test_oracle.py asserts the two agree —
exactly for the deterministic parts (tables, log-likelihoods, sufficient
statistics) and within MCMC tolerance for posteriors.

RNG streams intentionally differ (the reference uses mt19937 per chain, the
production path counter-based threefry): agreement is asserted on
*distributions/posteriors*, exactly as the north star specifies (GT/GPP/GQ
within tolerance, not RNG-stream equality).
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np
from scipy import special as sp

MAX_COUNT = 255
DIRICHLET_PARAMETER = 1.0


# ---------------------------------------------------------------------------
# Count model
# ---------------------------------------------------------------------------

def log_addition(a: float, b: float) -> float:
    """Utils::logAddition (Utils.hpp:105-124)."""
    if a < b:
        a, b = b, a
    return a + math.log1p(math.exp(b - a))


def nb_log_pmf(obs: int, p: float, size: float, size_scale: int) -> float:
    """NegativeBinomialDistribution::logPmf (NegativeBinomialDistribution.cpp:143-147)."""
    sz = size * size_scale
    return (
        sp.gammaln(obs + sz) - sp.gammaln(sz) - sp.gammaln(obs + 1.0)
        + sz * math.log(p) + obs * math.log1p(-p)
    )


def poisson_log_pmf(obs: int, rate: float) -> float:
    """CountDistribution::poissonLogProb (CountDistribution.cpp:349-352)."""
    return obs * math.log(rate) - rate - sp.gammaln(obs + 1.0)


def _fold_tail_sequential(value: float, term_fn, start: int) -> float:
    """The reference's sequential tail fold: keep logAddition-ing successive
    pmf terms until the sum converges by doubleCompare or exceeds 0
    (CountDistribution.cpp:285-306, 321-341)."""
    limit = start
    prev = 0.0
    while True:
        limit += 1
        prev = value
        value = log_addition(value, term_fn(limit))
        if value > 0:
            return 0.0
        # Utils::doubleCompare: |a-b| <= |a|*epsilon*100
        if abs(prev - value) <= abs(prev) * np.finfo(np.float64).eps * 100:
            return value


def oracle_tables(p, size, noise_rates, max_multiplicity):
    """Per-sample [M+1, 256] combined tables: row 0 noise Poisson, rows >= 1
    genomic NB at that multiplicity, count=255 cell tail-folded with the
    reference's sequential convergence loop (CountDistribution.cpp:215-347)."""
    p = np.atleast_1d(np.asarray(p, np.float64))
    size = np.atleast_1d(np.asarray(size, np.float64))
    rates = np.atleast_1d(np.asarray(noise_rates, np.float64))
    s_n = p.shape[0]
    tables = np.zeros((s_n, max_multiplicity + 1, MAX_COUNT + 1), np.float64)
    for s in range(s_n):
        for c in range(MAX_COUNT + 1):
            tables[s, 0, c] = poisson_log_pmf(c, rates[s])
        tables[s, 0, MAX_COUNT] = _fold_tail_sequential(
            tables[s, 0, MAX_COUNT], lambda c: poisson_log_pmf(c, rates[s]),
            MAX_COUNT,
        )
        for m in range(1, max_multiplicity + 1):
            for c in range(MAX_COUNT + 1):
                tables[s, m, c] = nb_log_pmf(c, p[s], size[s], m)
            tables[s, m, MAX_COUNT] = _fold_tail_sequential(
                tables[s, m, MAX_COUNT],
                lambda c, m=m: nb_log_pmf(c, p[s], size[s], m), MAX_COUNT,
            )
    return tables


# ---------------------------------------------------------------------------
# Cluster + Gibbs
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class OracleCluster:
    """One cluster: K kmers x H haplotypes x S samples, scalar layout."""
    mult: np.ndarray       # [K, H] int - per-haplotype path multiplicity
    inter: np.ndarray      # [K, S] int - intercluster (reference-copy) mult
    counts: np.ndarray     # [K, S] int - observed per-sample kmer counts
    ploidy: np.ndarray     # [S] int    - 0 null, 1 haploid, 2 diploid
    hap_allele: np.ndarray  # [H, V] int - haplotype -> allele per variant
    num_alleles: np.ndarray  # [V] int

    @property
    def k(self):
        return self.mult.shape[0]

    @property
    def h(self):
        return self.mult.shape[1]

    @property
    def s(self):
        return self.counts.shape[1]


def enumerate_outcomes(h):
    """[O] list of (h1, h2) with h2 = None for haploid, (None, None) null —
    the same [pairs | singles | null] layout as make_outcome_space."""
    # match np.triu_indices order: row-major upper triangle
    out = [(i, j) for i in range(h) for j in range(i, h)]
    for i in range(h):
        out.append((i, None))
    out.append((None, None))
    return out


def diplotype_log_likelihood(cluster: OracleCluster, tables, s, h1, h2, w,
                             max_total_mult=None):
    """Sum over kmers of calcCountLogProb at the diplotype's multiplicity
    (VariantClusterGenotyper.cpp:619-641 + getUniqueKmerMultiplicity,
    VariantClusterHaplotypes.cpp:45-74). `w` is the [K] bool kmer subset.

    `max_total_mult` mimics the production static clamp (rows above it use
    the clamp row); None = clamp at the table edge like the reference."""
    mmax = tables.shape[1] - 1 if max_total_mult is None else max_total_mult
    ll = 0.0
    for kk in range(cluster.k):
        if not w[kk]:
            continue
        m = int(cluster.inter[kk, s])
        if h1 is not None:
            m += int(cluster.mult[kk, h1])
        if h2 is not None:
            m += int(cluster.mult[kk, h2])
        m = min(m, mmax)
        ll += tables[s, m, min(int(cluster.counts[kk, s]), MAX_COUNT)]
    return ll


def hwe_prior(freqs, h1, h2):
    """HWE diplotype prior from haplotype frequencies
    (calcDiplotypeLogProb, VariantClusterGenotyper.cpp:601-618)."""
    if h1 is None:
        return 0.0  # null outcome scored as log-prob 0 (:745)
    if h2 is None:
        return math.log(freqs[h1])
    if h1 == h2:
        return 2.0 * math.log(freqs[h1])
    return math.log(2.0) + math.log(freqs[h1]) + math.log(freqs[h2])


def _log_discrete_sample(rng, log_probs):
    """LogDiscreteSampler::sample (DiscreteSampler.cpp:77-126): max-shifted
    exp, cumulative sum, one uniform, first index with csum > u."""
    m = np.max(log_probs)
    p = np.exp(np.asarray(log_probs) - m)
    csum = np.cumsum(p)
    u = rng.random() * csum[-1]
    return int(np.searchsorted(csum, u, side="right"))


def _sample_sparse_frequencies(rng, counts, sparsity, alpha=DIRICHLET_PARAMETER):
    """SparseFrequencyDistribution::sampleFrequencies
    (FrequencyDistribution.cpp:143-303): sample the active-set size over
    equivalence classes, expand with uniform zero-count haplotypes, then
    Gamma(count + alpha) normalised."""
    h = counts.shape[0]
    n_plus = int((counts > 0).sum())
    n_total = int(counts.sum())
    assert n_total > 0 and n_plus > 0

    # log P(j) over j = n_plus .. h (updateCachedSimplexProbVector)
    logps = []
    for j in range(n_plus, h + 1):
        log_card = (
            sp.gammaln(h - n_plus + 1)
            - sp.gammaln(j - n_plus + 1) - sp.gammaln(h - j + 1)
        )
        log_prior = j * math.log(sparsity) + (h - j) * math.log1p(-sparsity)
        log_assign = sp.gammaln(j * alpha) - sp.gammaln(n_total + j * alpha)
        logps.append(log_card + log_prior + log_assign)
    j = n_plus + _log_discrete_sample(rng, np.asarray(logps))

    active = list(np.flatnonzero(counts > 0))
    zeros = list(np.flatnonzero(counts == 0))
    while len(active) < j:
        pick = int(rng.integers(0, len(zeros)))
        active.append(zeros.pop(pick))

    freqs = np.zeros(h, np.float64)
    for idx in active:
        freqs[idx] = rng.gamma(counts[idx] + alpha, 1.0)
    return freqs / freqs.sum()


def _sample_dense_frequencies(rng, counts, alpha=DIRICHLET_PARAMETER):
    """FrequencyDistribution::sampleFrequencies (FrequencyDistribution.cpp:75-93)."""
    g = np.array([rng.gamma(c + alpha, 1.0) for c in counts])
    return g / g.sum()


def oracle_gibbs(cluster: OracleCluster, tables, num_chains, burn_in,
                 num_samples, seed, sparsity=None, use_sparse=True,
                 max_total_mult=None, noise=None):
    """Full chains of the reference Gibbs over one cluster.

    Per iteration (VariantClusterGroup::runGibbsSample -> sampleDiplotypes):
      1. active set = haplotypes with non-zero frequency (:672-681)
      2. per sample: enumerate valid outcomes for its ploidy, log-prob = HWE
         prior + kmer LL, sample via the log inverse-CDF sampler (:683-705)
      3. haplotype observation counts -> frequency resample (:781-785)

    `noise`: optional dict(prior=(shape, scale), init_rates=[S]) switches on
    joint noise estimation — per iteration the zero-multiplicity sufficient
    statistics update per-sample Poisson rates by the conjugate gamma draw
    (sampleNoiseParameters, CountDistribution.cpp:173-186) and the noise row
    of the tables is rebuilt.

    Returns (tally [S, O] int, freq_mean [H], rate_traces or None).
    """
    outcomes = enumerate_outcomes(cluster.h)
    o_n = len(outcomes)
    tally = np.zeros((cluster.s, o_n), np.int64)
    freq_acc = np.zeros(cluster.h, np.float64)
    if sparsity is None:
        sparsity = 0.5
    sparsity = min(sparsity, 1.0 - np.finfo(np.float64).eps * 100)
    rate_traces = []

    for chain in range(num_chains):
        rng = np.random.default_rng((seed, chain))
        tabs = tables.copy()
        if noise is not None:
            rates = np.asarray(noise["init_rates"], np.float64).copy()
            for s in range(cluster.s):
                for c in range(MAX_COUNT + 1):
                    tabs[s, 0, c] = poisson_log_pmf(c, rates[s])
        freqs = np.full(cluster.h, 1.0 / cluster.h)
        w = np.ones(cluster.k, bool)
        trace = []
        for it in range(burn_in + num_samples):
            hap_counts = np.zeros(cluster.h, np.int64)
            sel = []
            for s in range(cluster.s):
                pl = int(cluster.ploidy[s])
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
                    # reference enumerates only non-zero-frequency haplotypes
                    # (:672-681); zero-frequency prior is -inf, equivalent
                    if h1 is not None and freqs[h1] <= 0:
                        continue
                    if h2 is not None and freqs[h2] <= 0:
                        continue
                    lp = hwe_prior(freqs, h1, h2) + diplotype_log_likelihood(
                        cluster, tabs, s, h1, h2, w, max_total_mult
                    )
                    cand.append((oi, lp))
                pick = cand[_log_discrete_sample(
                    rng, np.asarray([lp for _, lp in cand])
                )][0]
                sel.append(pick)
                h1, h2 = outcomes[pick]
                if h1 is not None:
                    hap_counts[h1] += 1
                if h2 is not None:
                    hap_counts[h2] += 1
            if hap_counts.sum() > 0:
                if use_sparse:
                    freqs = _sample_sparse_frequencies(rng, hap_counts, sparsity)
                else:
                    freqs = _sample_dense_frequencies(rng, hap_counts)
            if noise is not None:
                # zero-multiplicity kmers at the sampled diplotype feed the
                # conjugate gamma update (getNoiseCounts + sampleNoiseParameters)
                shape0, scale0 = noise["prior"]
                for s in range(cluster.s):
                    h1, h2 = outcomes[sel[s]]
                    a = b = 0.0
                    for kk in range(cluster.k):
                        m = int(cluster.inter[kk, s])
                        if h1 is not None:
                            m += int(cluster.mult[kk, h1])
                        if h2 is not None:
                            m += int(cluster.mult[kk, h2])
                        if m == 0:
                            a += int(cluster.counts[kk, s])
                            b += 1.0
                    rates[s] = rng.gamma(
                        shape0 + a, scale0 / (b * scale0 + 1.0)
                    )
                    for c in range(MAX_COUNT + 1):
                        tabs[s, 0, c] = poisson_log_pmf(c, rates[s])
                trace.append(rates.copy())
            if it >= burn_in:
                for s, oi in enumerate(sel):
                    tally[s, oi] += 1
                freq_acc += freqs
        if noise is not None:
            rate_traces.append(np.asarray(trace))

    denom = num_chains * num_samples
    return tally, freq_acc / denom, (rate_traces if noise is not None else None)


def oracle_gibbs_coupled(clusters, shared, tables, num_chains, burn_in,
                         num_samples, seed, sparsities, use_sparse=True,
                         max_total_mult=None, zero_count_ignores_shared=True):
    """Joint Gibbs over clusters of ONE group with SHARED k-mers coupled
    through their summed diplotype multiplicities — the reference's
    multicluster mechanism (KmerCounts.cpp:197-223,
    VariantClusterHaplotypes.cpp:197-233, updateMulticlusterDiplotypeLogProb
    VariantClusterGenotyper.cpp:569-595) rendered exactly: when cluster i
    scores a diplotype, each shared k-mer's multiplicity is its own
    contribution PLUS the contribution of every other cluster's CURRENT
    sampled diplotype.

    Args:
      clusters: list of OracleCluster over the same samples. Each cluster's
        `mult` rows are indexed by GLOBAL k-mer ids via `shared`.
      shared: dict global_kmer_id -> list of (cluster_idx, local_kmer_idx)
        for k-mers present in more than one cluster. Counts for a shared
        k-mer must be identical in every listed cluster.
      zero_count_ignores_shared: the reference scores a multicluster k-mer
        whose observed count is zero at OWN multiplicity only
        (getMulticlusterKmerMultiplicity,
        VariantClusterHaplotypes.cpp:85-93: the `getSampleCount == 0`
        branch skips the shared total) — True reproduces that; False keeps
        the fully-coupled variant.
    Returns list of per-cluster tallies [S, O_i].
    """
    n_cl = len(clusters)
    outcomes = [enumerate_outcomes(cl.h) for cl in clusters]
    tallies = [np.zeros((cl.s, len(o)), np.int64)
               for cl, o in zip(clusters, outcomes)]
    mmax = tables.shape[1] - 1 if max_total_mult is None else max_total_mult

    # local kmer -> (shared entry list) lookup per cluster
    shared_of = [dict() for _ in clusters]
    for gid, members in shared.items():
        for ci, kk in members:
            shared_of[ci][kk] = [m for m in members if m[0] != ci]

    for chain in range(num_chains):
        rng = np.random.default_rng((seed, chain))
        freqs = [np.full(cl.h, 1.0 / cl.h) for cl in clusters]
        # current sampled outcome per cluster per sample (haplotype pair)
        cur = [[outcomes[ci][-1] for _ in range(clusters[ci].s)]
               for ci in range(n_cl)]

        def other_mult(ci, kk, s):
            tot = 0
            for cj, kj in shared_of[ci].get(kk, ()):
                h1, h2 = cur[cj][s]
                if h1 is not None:
                    tot += int(clusters[cj].mult[kj, h1])
                if h2 is not None:
                    tot += int(clusters[cj].mult[kj, h2])
            return tot

        for it in range(burn_in + num_samples):
            for ci, cl in enumerate(clusters):
                hap_counts = np.zeros(cl.h, np.int64)
                for s in range(cl.s):
                    pl = int(cl.ploidy[s])
                    cand = []
                    for oi, (h1, h2) in enumerate(outcomes[ci]):
                        if pl == 2:
                            ok = h1 is not None and h2 is not None
                        elif pl == 1:
                            ok = h1 is not None and h2 is None
                        else:
                            ok = h1 is None
                        if not ok:
                            continue
                        if h1 is not None and freqs[ci][h1] <= 0:
                            continue
                        if h2 is not None and freqs[ci][h2] <= 0:
                            continue
                        lp = hwe_prior(freqs[ci], h1, h2)
                        for kk in range(cl.k):
                            cnt = int(cl.counts[kk, s])
                            m = int(cl.inter[kk, s])
                            if cnt > 0 or not zero_count_ignores_shared:
                                m += other_mult(ci, kk, s)
                            if h1 is not None:
                                m += int(cl.mult[kk, h1])
                            if h2 is not None:
                                m += int(cl.mult[kk, h2])
                            lp += tables[s, min(m, mmax),
                                         min(cnt, MAX_COUNT)]
                        cand.append((oi, lp))
                    pick = cand[_log_discrete_sample(
                        rng, np.asarray([x for _, x in cand])
                    )][0]
                    cur[ci][s] = outcomes[ci][pick]
                    h1, h2 = outcomes[ci][pick]
                    if h1 is not None:
                        hap_counts[h1] += 1
                    if h2 is not None:
                        hap_counts[h2] += 1
                    if it >= burn_in:
                        tallies[ci][s, pick] += 1
                if hap_counts.sum() > 0:
                    if use_sparse:
                        freqs[ci] = _sample_sparse_frequencies(
                            rng, hap_counts, sparsities[ci]
                        )
                    else:
                        freqs[ci] = _sample_dense_frequencies(rng, hap_counts)
    return tallies


def posteriors_from_tally(cluster: OracleCluster, tally):
    """Genotype (GPP) and allele (APP) posteriors per variant from outcome
    tallies (getGenotypeSampleStats, VariantClusterGenotyper.cpp:249-370).

    Returns (gpp [S, V, G], app [S, V, A]) with G = A*(A+1)/2 over the
    variant's alleles (diploid packing g = b*(b+1)/2 + a with a <= b)."""
    outcomes = enumerate_outcomes(cluster.h)
    v_n = cluster.hap_allele.shape[1]
    a_max = int(cluster.num_alleles.max())
    g_max = a_max * (a_max + 1) // 2
    gpp = np.zeros((cluster.s, v_n, g_max), np.float64)
    app = np.zeros((cluster.s, v_n, a_max), np.float64)
    for s in range(cluster.s):
        total = tally[s].sum()
        if total == 0:
            continue
        for oi, (h1, h2) in enumerate(outcomes):
            cnt = tally[s, oi]
            if cnt == 0 or h1 is None:
                continue
            for v in range(v_n):
                a1 = int(cluster.hap_allele[h1, v])
                if h2 is not None:
                    a2 = int(cluster.hap_allele[h2, v])
                    lo, hi = min(a1, a2), max(a1, a2)
                    gpp[s, v, hi * (hi + 1) // 2 + lo] += cnt
                    app[s, v, lo] += cnt
                    if lo != hi:
                        app[s, v, hi] += cnt
                else:
                    gpp[s, v, a1] += cnt
                    app[s, v, a1] += cnt
        gpp[s] /= total
        app[s] /= total
    return gpp, app
