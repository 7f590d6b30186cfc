"""Per-sample k-mer count model: negative-binomial genomic counts fitted from
parameter k-mers, and a gamma-Poisson noise model updated by Gibbs.

Reformulates CountDistribution (CountDistribution.cpp:51-352):
  * NB fit: method-of-moments on parameter-kmer count stats at the modal
    intercluster multiplicity, with the fitted size divided by that
    multiplicity (setGenomicCountDistributions, CountDistribution.cpp:66-141).
  * Noise: per-sample Poisson rate with a Gamma(shape, scale) prior; the
    conjugate Gibbs update consumes sufficient statistics
    (num_observations, count_sum) gathered from zero-multiplicity k-mers
    (sampleNoiseParameters, CountDistribution.cpp:173-200). On a device mesh
    the sufficient statistics are merged with psum instead of the reference's
    mutex-guarded CountAllocation merge (InferenceEngine.cpp:96-98).
  * The 256x256 log-PMF cache tables live as device arrays produced by
    ops.distributions and are gathered/contracted inside the Gibbs kernel.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import (
    MAX_KMER_COUNT,
    MAX_NB_KMER_MULTIPLICITY,
    MIN_NB_KMER_COUNT,
    NB_MAX_P,
    NOISE_RATE_PRIOR_SCALE,
    NOISE_RATE_PRIOR_SHAPE,
)
from ..ops.distributions import np_build_count_log_prob_tables


@dataclasses.dataclass
class NegativeBinomialParams:
    """Fitted per-sample NB parameters (p, size) plus provenance for logging."""

    p: np.ndarray            # [S]
    size: np.ndarray         # [S]
    modal_multiplicity: np.ndarray  # [S] multiplicity the fit was taken at
    num_kmers: np.ndarray    # [S] kmers behind the fit

    @property
    def mean(self):
        return self.size * (1.0 - self.p) / self.p

    @property
    def var(self):
        return self.size * (1.0 - self.p) / (self.p * self.p)


def fit_genomic_nb(parameter_kmer_stats):
    """Fit per-sample NB from parameter-kmer stats binned by multiplicity.

    Args:
      parameter_kmer_stats: structured per-sample stats, shape [S, M+1] where
        entry (s, m) holds (count, mean, var) of observed k-mer counts for
        parameter k-mers with intercluster multiplicity m. Arrays:
        a dict {"count": [S, M+1], "mean": [S, M+1], "var": [S, M+1]}.

    Mirrors setGenomicCountDistributions (CountDistribution.cpp:66-141):
    choose the multiplicity in 1..32 with the most k-mers, method-of-moments
    at that multiplicity, then divide size by the multiplicity to get the
    haploid distribution.
    """
    counts = np.asarray(parameter_kmer_stats["count"], dtype=np.int64)
    means = np.asarray(parameter_kmer_stats["mean"], dtype=np.float64)
    variances = np.asarray(parameter_kmer_stats["var"], dtype=np.float64)

    num_samples = counts.shape[0]
    hi = min(MAX_NB_KMER_MULTIPLICITY, counts.shape[1] - 1)

    p_out = np.zeros(num_samples)
    size_out = np.zeros(num_samples)
    modal = np.zeros(num_samples, dtype=np.int64)
    nk = np.zeros(num_samples, dtype=np.int64)

    for s in range(num_samples):
        window = counts[s, 1 : hi + 1]
        m_star = int(np.argmax(window)) + 1
        n_kmers = int(counts[s, m_star])
        if n_kmers < MIN_NB_KMER_COUNT:
            # Matches the reference's warning path; the fit proceeds regardless
            # (CountDistribution.cpp:109-113).
            pass
        mean = means[s, m_star]
        var = variances[s, m_star]
        var = max(var, mean / NB_MAX_P)
        p = mean / var
        size = mean * mean / (var - mean)
        size /= m_star  # scale to haploid multiplicity (CountDistribution.cpp:124)
        p_out[s] = p
        size_out[s] = size
        modal[s] = m_star
        nk[s] = n_kmers

    return NegativeBinomialParams(p=p_out, size=size_out, modal_multiplicity=modal, num_kmers=nk)


class CountModel:
    """Holds per-sample NB parameters + noise rates and the device PMF tables.

    ``tables`` is a [S, max_mult+1, 256] float32 device array where row 0 of
    the multiplicity axis is the noise Poisson log pmf and rows >= 1 the
    genomic NB log pmf (calcCountLogProb dispatch, CountDistribution.cpp:255-265).
    """

    def __init__(self, nb_params: NegativeBinomialParams, noise_rates,
                 max_multiplicity=MAX_KMER_COUNT,
                 prior_shape=NOISE_RATE_PRIOR_SHAPE,
                 prior_scale=NOISE_RATE_PRIOR_SCALE):
        self.nb = nb_params
        self.noise_rates = jnp.asarray(noise_rates, jnp.float32)
        self.max_multiplicity = max_multiplicity
        self.prior_shape = prior_shape
        self.prior_scale = prior_scale
        self._p = jnp.asarray(nb_params.p, jnp.float32)
        self._size = jnp.asarray(nb_params.size, jnp.float32)
        self.refresh_tables()

    @classmethod
    def init_noise_from_prior(cls, nb_params, key,
                              prior_shape=NOISE_RATE_PRIOR_SHAPE,
                              prior_scale=NOISE_RATE_PRIOR_SCALE,
                              max_multiplicity=MAX_KMER_COUNT):
        """resetNoiseRates (CountDistribution.cpp:163-171): draw rates from the prior."""
        num_samples = len(nb_params.p)
        rates = jax.random.gamma(key, prior_shape, (num_samples,)) * prior_scale
        return cls(nb_params, rates, max_multiplicity, prior_shape, prior_scale)

    def refresh_tables(self):
        self.tables = jnp.asarray(
            np_build_count_log_prob_tables(
                np.asarray(self._p), np.asarray(self._size),
                np.asarray(self.noise_rates), self.max_multiplicity,
            )
        )

    def sample_noise_rates(self, key, num_observations, count_sum):
        """Conjugate gamma update of the per-sample noise rates.

        Mirrors sampleNoiseParameters (CountDistribution.cpp:173-186):
          rate_s ~ Gamma(shape + count_sum_s,
                         scale / (num_observations_s * scale + 1))
        Callers psum the sufficient statistics across the mesh first.
        """
        shape = self.prior_shape + count_sum.astype(jnp.float32)
        scale = self.prior_scale / (
            num_observations.astype(jnp.float32) * self.prior_scale + 1.0
        )
        rates = jax.random.gamma(key, shape) * scale
        self.noise_rates = rates
        self.refresh_tables()
        return rates


def noise_update_rates(key, num_observations, count_sum,
                       prior_shape=NOISE_RATE_PRIOR_SHAPE,
                       prior_scale=NOISE_RATE_PRIOR_SCALE):
    """Pure-functional noise rate update usable inside jit (same math as above)."""
    shape = prior_shape + count_sum.astype(jnp.float32)
    scale = prior_scale / (num_observations.astype(jnp.float32) * prior_scale + 1.0)
    return jax.random.gamma(key, shape) * scale
