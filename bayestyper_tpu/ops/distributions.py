"""Count-model numerics: negative binomial + Poisson log-PMFs and the 256x256
device-resident log-PMF cache tables.

TPU-first reformulation of the reference count model
(CountDistribution.cpp:215-352, NegativeBinomialDistribution.cpp:41-168): the
reference precomputes per-sample lookup tables
``genomic[multiplicity][count]`` / ``noise[count]`` on the host and indexes
them scalar-at-a-time inside the Gibbs loop.  Here the same tables are built
*vectorised on device* and consumed by batched gathers / one-hot matmuls in
the Gibbs kernel, so the whole table build is a single fused XLA program.

Parameterisation (NegativeBinomialDistribution.cpp:66-79):
  NB(p, size):  mean = size*(1-p)/p,  var = size*(1-p)/p^2
  logPmf(obs, size_scale) = lgamma(obs + size*s) - lgamma(size*s) - lgamma(obs+1)
                            + size*s*log(p) + obs*log(1-p)
  where s = kmer multiplicity (the haploid NB is scaled by multiplicity).

The count=255 cell folds in the tail mass P(X >= 255)
(CountDistribution.cpp:285-306): we evaluate the tail by summing extra pmf
terms with logsumexp instead of the reference's sequential convergence loop —
same value within fp tolerance, fully parallel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constants import MAX_KMER_COUNT, MAX_KMER_MULTIPLICITY, NB_MAX_P

# Extra counts summed into the count=255 tail cell. The reference iterates until
# logAddition converges; 4096 terms is far past convergence for any realistic
# NB/Poisson parameterisation (mean < 255 by construction of uint8 counts).
_TAIL_TERMS = 4096


def nb_moments_to_parameters(mean, var):
    """Method-of-moments (p, size) with the variance floor p <= 0.99.

    Mirrors NegativeBinomialDistribution::momentsToParameters
    (NegativeBinomialDistribution.cpp:66-79).
    """
    var = jnp.maximum(var, mean / NB_MAX_P)
    p = mean / var
    size = mean * mean / (var - mean)
    return p, size


def nb_mean(p, size):
    return size * (1.0 - p) / p


def nb_var(p, size):
    return size * (1.0 - p) / (p * p)


def nb_log_pmf(obs, p, size, size_scale=1):
    """NB log pmf with multiplicity-scaled size (NegativeBinomialDistribution.cpp:143-147)."""
    obs = jnp.asarray(obs, jnp.float32)
    s = jnp.asarray(size_scale, jnp.float32)
    sz = size * s
    return (
        jax.lax.lgamma(obs + sz)
        - jax.lax.lgamma(sz)
        - jax.lax.lgamma(obs + 1.0)
        + sz * jnp.log(p)
        + obs * jnp.log1p(-p)
    )


def poisson_log_pmf(obs, rate):
    """Poisson log pmf (CountDistribution.cpp:349-352)."""
    obs = jnp.asarray(obs, jnp.float32)
    return obs * jnp.log(rate) - rate - jax.lax.lgamma(obs + 1.0)


def _fold_tail(table_last_col, extra_terms):
    """logsumexp-fold tail mass into the final count column, clipped at log(1)=0."""
    folded = jax.scipy.special.logsumexp(
        jnp.concatenate([table_last_col[..., None], extra_terms], axis=-1), axis=-1
    )
    return jnp.minimum(folded, 0.0)


def build_genomic_log_pmf_table(p, size, max_multiplicity=MAX_KMER_MULTIPLICITY):
    """Full [max_multiplicity+1, 256] genomic log-PMF table for one sample.

    Row m is the NB log pmf with size scaled by m; row 0 is the degenerate
    "multiplicity zero" distribution (0 at count 0, -inf elsewhere) — the
    reference stores the same convention (CountDistribution.cpp:267-281)
    although lookups at multiplicity 0 are routed to the noise table.
    The count=255 column folds in the tail mass (CountDistribution.cpp:285-306).
    """
    counts = jnp.arange(MAX_KMER_COUNT + 1, dtype=jnp.float32)
    mults = jnp.arange(1, max_multiplicity + 1, dtype=jnp.float32)

    table = nb_log_pmf(counts[None, :], p, size, mults[:, None])

    tail_counts = MAX_KMER_COUNT + 1 + jnp.arange(_TAIL_TERMS, dtype=jnp.float32)
    tail = nb_log_pmf(tail_counts[None, :], p, size, mults[:, None])
    last = _fold_tail(table[:, -1], tail)
    table = table.at[:, -1].set(last)

    row0 = jnp.full((1, MAX_KMER_COUNT + 1), -jnp.inf, dtype=jnp.float32)
    row0 = row0.at[0, 0].set(0.0)
    return jnp.concatenate([row0, table], axis=0)


def build_noise_log_pmf_table(rate):
    """[256] Poisson noise log-PMF table with tail folding (CountDistribution.cpp:314-347)."""
    counts = jnp.arange(MAX_KMER_COUNT + 1, dtype=jnp.float32)
    table = poisson_log_pmf(counts, rate)
    tail_counts = MAX_KMER_COUNT + 1 + jnp.arange(_TAIL_TERMS, dtype=jnp.float32)
    tail = poisson_log_pmf(tail_counts, rate)
    last = _fold_tail(table[-1], tail)
    return table.at[-1].set(last)


def build_count_log_prob_table(p, size, noise_rate, max_multiplicity=MAX_KMER_MULTIPLICITY):
    """Combined per-sample [max_multiplicity+1, 256] table implementing
    calcCountLogProb's dispatch (CountDistribution.cpp:255-265): row 0 is the
    *noise* log pmf, rows >= 1 are the genomic NB log pmf at that multiplicity.

    This is the single table the Gibbs kernel gathers from:
        log P(count | multiplicity) = table[multiplicity, count]
    """
    genomic = build_genomic_log_pmf_table(p, size, max_multiplicity)
    noise = build_noise_log_pmf_table(noise_rate)
    return genomic.at[0].set(noise)


# Vectorised over samples: p, size, noise_rate are [S] -> [S, M+1, 256].
build_count_log_prob_tables = jax.vmap(
    build_count_log_prob_table, in_axes=(0, 0, 0), out_axes=0
)


def np_build_genomic_tables(p, size, max_multiplicity=MAX_KMER_MULTIPLICITY):
    """Host float64 genomic NB rows ([S, M+1, 256], row 0 left zero).

    Noise-rate independent — build once per unit and patch noise rows per
    use (np_build_count_log_prob_tables): the gammaln/logsumexp sweep over
    256x255 cells per sample is the expensive part."""
    import numpy as np
    from scipy import special as sp

    p = np.atleast_1d(np.asarray(p, np.float64))
    size = np.atleast_1d(np.asarray(size, np.float64))
    num_samples = p.shape[0]

    from scipy import stats as st

    counts = np.arange(MAX_KMER_COUNT + 1, dtype=np.float64)
    mults = np.arange(1, max_multiplicity + 1, dtype=np.float64)

    tables = np.zeros((num_samples, max_multiplicity + 1, MAX_KMER_COUNT + 1),
                      dtype=np.float64)
    for s in range(num_samples):
        sz = size[s] * mults[:, None]
        g = (
            sp.gammaln(counts[None, :] + sz)
            - sp.gammaln(sz)
            - sp.gammaln(counts[None, :] + 1.0)
            + sz * np.log(p[s])
            + counts[None, :] * np.log1p(-p[s])
        )
        # fold tail mass into count=255: the reference's convergence loop
        # (CountDistribution.cpp:285-306) sums pmf terms from 255 upward
        # until logAddition converges, i.e. its limit is log P(X >= 255) —
        # the NB survival function, which scipy evaluates exactly. (A
        # truncated term sum diverges from that limit for rows whose mean
        # lies far beyond the truncation horizon.)
        # scipy's logsf underflows to -inf in the far tail; P(X >= 255) is
        # bounded below by pmf(255), and at such magnitudes the reference's
        # loop converges on its first terms (a geometric-ratio correction
        # far below double precision of the cell), so the pmf term is the
        # exact fallback
        logsf = st.nbinom.logsf(MAX_KMER_COUNT - 1, sz[:, 0], p[s])
        g255 = np.minimum(np.maximum(logsf, g[:, MAX_KMER_COUNT]), 0.0)
        tables[s, 1:, : MAX_KMER_COUNT + 1] = g
        tables[s, 1:, MAX_KMER_COUNT] = g255
    return tables


def np_build_count_log_prob_tables(p, size, noise_rates,
                                   max_multiplicity=MAX_KMER_MULTIPLICITY,
                                   genomic=None):
    """Host float64 table builder (numpy) for maximum precision.

    The reference computes its caches in double (CountDistribution.cpp:58-59);
    building in f64 and shipping f32 tables to the device keeps table entries
    within f32 rounding of the reference, whereas f32 lgamma on device drifts
    by ~1e-3. Used for the static (frozen-noise) tables; the per-iteration
    noise path in joint mode is analytic and needs no tables.

    `genomic`: optional precomputed np_build_genomic_tables result (the
    noise-rate-independent rows) to avoid rebuilding it per rate set.
    """
    import numpy as np
    from scipy import special as sp

    p = np.atleast_1d(np.asarray(p, np.float64))
    size = np.atleast_1d(np.asarray(size, np.float64))
    rates = np.atleast_1d(np.asarray(noise_rates, np.float64))
    num_samples = p.shape[0]

    from scipy import stats as st

    if genomic is None:
        genomic = np_build_genomic_tables(p, size, max_multiplicity)
    tables = genomic.copy()
    counts = np.arange(MAX_KMER_COUNT + 1, dtype=np.float64)
    for s in range(num_samples):
        n = (
            counts * np.log(rates[s])
            - rates[s]
            - sp.gammaln(counts + 1.0)
        )
        # exact tail fold: log P(X >= 255) via the Poisson survival
        # function (the limit of CountDistribution.cpp:321-341's loop)
        ntail = np.minimum(
            np.maximum(st.poisson.logsf(MAX_KMER_COUNT - 1, rates[s]),
                       n[MAX_KMER_COUNT]),
            0.0,
        )
        tables[s, 0, :] = n
        tables[s, 0, MAX_KMER_COUNT] = ntail

    return tables.astype(np.float32)


def log_addition(a, b):
    """Pairwise logsumexp matching Utils::logAddition (Utils.hpp:105-124)."""
    hi = jnp.maximum(a, b)
    lo = jnp.minimum(a, b)
    return hi + jnp.log1p(jnp.exp(lo - hi))
