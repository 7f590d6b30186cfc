"""Device-side samplers: log-space categorical, Dirichlet, and the sparse
spike-and-slab simplex sampler over haplotype frequencies.

TPU-first reformulation of the reference samplers:
  * LogDiscreteSampler (DiscreteSampler.cpp:100-126) — sequential log-space
    cumulative sums + binary-search inverse CDF — becomes a Gumbel-max
    categorical, which draws from the identical distribution with one
    vectorised reduction and composes with vmap over samples/clusters/chains.
  * FrequencyDistribution::sampleFrequencies (FrequencyDistribution.cpp:75-93)
    — per-element Gamma(count+1, 1) draws normalised to the simplex — is the
    standard Gamma-normalisation Dirichlet sampler, done batched.
  * SparseFrequencyDistribution::sampleFrequencies
    (FrequencyDistribution.cpp:209-303) — spike-and-slab over the simplex:
    sample the active-set size from cached log-prob vectors over equivalence
    classes (updateCachedSimplexProbVector, FrequencyDistribution.cpp:143-196),
    then expand the observed set with uniformly drawn zero-count haplotypes.
    The uniform-without-replacement expansion becomes a Gumbel top-k over the
    zero-count set (equivalent in distribution).

All samplers use counter-based keys (jax.random.fold_in) so results are
independent of device count, replacing the reference's per-object mt19937
streams (InferenceEngine.cpp:70, FrequencyDistribution.cpp:44).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constants import DIRICHLET_PARAMETER

NEG_INF = -1e30  # finite stand-in for -inf so masked logits never produce NaN


def fixed_round_gamma(key, alpha, rounds: int = 6):
    """Gamma(alpha, 1) sampling via Marsaglia-Tsang with a FIXED number of
    rejection rounds (masked select of the first acceptance) instead of
    jax.random.gamma's data-dependent while_loop — the while_loop under
    vmap-inside-scan dominates XLA compile time of the Gibbs programs and
    runs masked-iteration slow on TPU. Acceptance per round is >96%, so
    `rounds=6` fails with probability < 1e-8; failures fall back to the
    distribution mean. alpha < 1 uses the standard boost
    gamma(a) = gamma(a+1) * U^(1/a).
    """
    alpha = jnp.asarray(alpha, jnp.float32)
    k_boost, k_norm, k_unif = jax.random.split(key, 3)

    a_eff = jnp.where(alpha < 1.0, alpha + 1.0, alpha)
    d = a_eff - 1.0 / 3.0
    c = 1.0 / jnp.sqrt(9.0 * d)

    xs = jax.random.normal(k_norm, (rounds,) + alpha.shape)
    us = jax.random.uniform(k_unif, (rounds,) + alpha.shape, minval=1e-12)
    v = (1.0 + c[None] * xs) ** 3
    ok = (v > 0) & (
        jnp.log(us) < 0.5 * xs * xs + d[None] - d[None] * v
        + d[None] * jnp.log(jnp.where(v > 0, v, 1.0))
    )
    # first accepted round per element, selected by a cumulative mask —
    # NOT take_along_axis, which lowers to a serialized gather on TPU and
    # dominated the whole Gibbs iteration (measured 60% of the scan step)
    any_ok = ok.any(axis=0)
    is_first = ok & (jnp.cumsum(ok.astype(jnp.int32), axis=0) == 1)
    dv = d[None] * v
    sample = jnp.sum(jnp.where(is_first, dv, 0.0), axis=0)
    sample = jnp.where(any_ok, sample, a_eff)  # mean fallback (p < 1e-8)

    boost = jax.random.uniform(k_boost, alpha.shape, minval=1e-12) ** (
        1.0 / jnp.maximum(alpha, 1e-12)
    )
    return jnp.where(alpha < 1.0, sample * boost, sample)


def log_categorical(key, log_probs, axis=-1):
    """Sample from an unnormalised log-probability vector via max-shifted
    inverse CDF — the same construction as LogDiscreteSampler::sample
    (DiscreteSampler.cpp:106-126: exponentiate relative to the running max,
    cumulative sum, one uniform, binary-search the inverse CDF).

    ONE uniform per draw instead of one Gumbel per CATEGORY: the Gibbs scans
    sample a categorical over up to H(H+1)/2+H+1 outcomes per (cluster,
    chain, sample, iteration), and the per-category threefry bits dominated
    the scan step for large-H classes (measured ~1/3 of step time at H=64).
    Masked entries should be set to <= NEG_INF.
    """
    if axis != -1:
        log_probs = jnp.moveaxis(log_probs, axis, -1)
    m = jnp.max(log_probs, axis=-1, keepdims=True)
    p = jnp.exp(log_probs - m)                       # masked entries -> 0
    csum = jnp.cumsum(p, axis=-1)
    total = csum[..., -1:]
    u = jax.random.uniform(
        key, log_probs.shape[:-1] + (1,), dtype=log_probs.dtype
    ) * total
    # smallest index with csum > u (matches the reference's search of the
    # first cumulative sum exceeding the draw, DiscreteSampler.cpp:77-104)
    return jnp.sum((csum <= u).astype(jnp.int32), axis=-1)


def dirichlet_from_counts(key, counts, valid_mask, alpha=DIRICHLET_PARAMETER):
    """Dense Dirichlet resample of frequencies from observation counts.

    Mirrors FrequencyDistribution::sampleFrequencies
    (FrequencyDistribution.cpp:75-93): f_i ~ Gamma(counts_i + alpha, 1),
    normalised. Entries with valid_mask=False get frequency 0.
    """
    a = jnp.where(valid_mask, counts.astype(jnp.float32) + alpha, 1.0)
    g = fixed_round_gamma(key, a) * valid_mask
    total = jnp.sum(g, axis=-1, keepdims=True)
    return g / jnp.maximum(total, 1e-30)


def _simplex_size_log_probs(n_plus, n_total, n_valid, max_h, sparsity, alpha):
    """Log-probabilities over the active-set size j = n_plus + t, t = 0..max_h-?

    Mirrors updateCachedSimplexProbVector (FrequencyDistribution.cpp:143-196):
      log P(j) = lgamma(n_valid - n_plus + 1)
                 - lgamma(j - n_plus + 1) - lgamma(n_valid - j + 1)   # cardinality
                 + j*log(sp) + (n_valid - j)*log(1 - sp)              # prior
                 + lgamma(j*alpha) - lgamma(n_total + j*alpha)        # assignment
    Entries with j > n_valid are masked. Returns a [max_h + 1] vector over t.
    """
    t = jnp.arange(max_h + 1, dtype=jnp.float32)
    j = n_plus.astype(jnp.float32) + t
    nv = n_valid.astype(jnp.float32)
    np_f = n_plus.astype(jnp.float32)
    nt = n_total.astype(jnp.float32)

    log_card = (
        jax.lax.lgamma(nv - np_f + 1.0)
        - jax.lax.lgamma(t + 1.0)
        - jax.lax.lgamma(nv - j + 1.0)
    )
    log_prior = j * jnp.log(sparsity) + (nv - j) * jnp.log1p(-sparsity)
    log_assign = jax.lax.lgamma(j * alpha) - jax.lax.lgamma(nt + j * alpha)

    logp = log_card + log_prior + log_assign
    return jnp.where(j <= nv, logp, NEG_INF)


def sample_sparse_frequencies(
    key, counts, valid_mask, sparsity, alpha=DIRICHLET_PARAMETER
):
    """Spike-and-slab simplex resample (SparseFrequencyDistribution::sampleFrequencies,
    FrequencyDistribution.cpp:209-303).

    Args:
      key: PRNG key.
      counts: [H] int observation counts this iteration.
      valid_mask: [H] bool, False on padding haplotypes.
      sparsity: scalar in (0, 1) — the spike probability (|initial cover| / H,
        clamped; HaplotypeFrequencyDistribution.cpp:85).
    Returns:
      frequencies: [H] float32 on the simplex; zero-frequency = inactive.
    """
    h = counts.shape[-1]
    k_size, k_sel, k_gam = jax.random.split(key, 3)

    counts = jnp.where(valid_mask, counts, 0)
    plus_mask = counts > 0
    n_plus = jnp.sum(plus_mask)
    n_total = jnp.sum(counts)
    n_valid = jnp.sum(valid_mask)

    logp = _simplex_size_log_probs(n_plus, n_total, n_valid, h, sparsity, alpha)
    t = log_categorical(k_size, logp)
    n_expand = t  # number of zero-count haplotypes to activate

    # Uniform-without-replacement expansion via Gumbel top-k over eligible set
    # (zero-count, valid). Rank eligible haplotypes by random key; take n_expand.
    elig = valid_mask & ~plus_mask
    g = jax.random.uniform(k_sel, (h,))
    g = jnp.where(elig, g, -1.0)
    # rank[i] = number of eligible entries with strictly larger key
    rank = jnp.sum(g[None, :] > g[:, None], axis=-1)
    expand_mask = elig & (rank < n_expand)

    active = plus_mask | expand_mask
    a = jnp.where(active, counts.astype(jnp.float32) + alpha, 1.0)
    gam = fixed_round_gamma(k_gam, a) * active
    total = jnp.sum(gam)
    return gam / jnp.maximum(total, 1e-30)


def sample_frequencies(key, counts, valid_mask, sparsity, use_sparse, alpha=DIRICHLET_PARAMETER):
    """Dispatch between sparse and dense frequency resampling.

    The reference uses SparseFrequencyDistribution when the initial minimum
    haplotype cover is non-empty and the plain (dense) distribution otherwise
    (HaplotypeFrequencyDistribution.cpp:76-88). If no haplotype was observed
    this iteration the frequencies are left unchanged by the caller
    (HaplotypeFrequencyDistribution.cpp:130-134) — callers guard on that.

    The two branches share one gamma draw (the dense case is the sparse case
    with every valid haplotype active) — this runs inside the per-iteration
    Gibbs scan, so one gamma instead of two matters.
    """
    h = counts.shape[-1]
    k_size, k_sel, k_gam = jax.random.split(key, 3)

    counts = jnp.where(valid_mask, counts, 0)
    plus_mask = counts > 0
    n_plus = jnp.sum(plus_mask)
    n_total = jnp.sum(counts)
    n_valid = jnp.sum(valid_mask)

    logp = _simplex_size_log_probs(n_plus, n_total, n_valid, h, sparsity, alpha)
    n_expand = log_categorical(k_size, logp)

    elig = valid_mask & ~plus_mask
    g = jax.random.uniform(k_sel, (h,))
    g = jnp.where(elig, g, -1.0)
    rank = jnp.sum(g[None, :] > g[:, None], axis=-1)
    expand_mask = elig & (rank < n_expand)

    active = jnp.where(use_sparse, plus_mask | expand_mask, valid_mask)
    a = jnp.where(active, counts.astype(jnp.float32) + alpha, 1.0)
    gam = fixed_round_gamma(k_gam, a) * active
    total = jnp.sum(gam)
    return gam / jnp.maximum(total, 1e-30)


def sample_gamma(key, shape, scale):
    """Gamma(shape, scale) draw (CountDistribution.cpp:202-213)."""
    return fixed_round_gamma(key, shape) * scale
