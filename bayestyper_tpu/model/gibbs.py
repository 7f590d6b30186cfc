"""The vectorized Gibbs engine — the hot kernel of the framework.

TPU-first reformulation of the reference's per-cluster Gibbs sampler
(VariantClusterGenotyper.cpp:597-785, InferenceEngine.cpp:278-333):

  * The reference scores each diplotype by summing scalar table lookups over
    the subsampled k-mers, memoised per (diplotype, chain)
    (calcDiplotypeLogProb, VariantClusterGenotyper.cpp:619-641). Here the full
    [samples, outcomes] log-likelihood matrix is precomputed ONCE per chain as
    a sequence of MXU matmuls over multiplicity classes, so Gibbs iterations
    reduce to a categorical draw + a Dirichlet/spike-slab frequency resample —
    O(S*O + H) per iteration instead of O(H^2 * K).

  * The outcome space unifies the reference's three ploidy branches
    (sampleDiplotype, VariantClusterGenotyper.cpp:707-755):
      outcomes = all ordered pairs (i<=j) of H haplotypes   (diploid block)
              ++ all single haplotypes                      (haploid block)
              ++ one null outcome                           (null-ploidy)
    using a sentinel haplotype H with zero multiplicities for the missing
    slot. Invalid outcomes are masked to -inf per sample ploidy.

  * Noise-rate Gibbs coupling exploits the Poisson exponential family: the
    noise contribution to every outcome's log-likelihood is
        A*log(rate) - B*rate - C0
    with per-outcome constants A (sum of zero-multiplicity k-mer counts),
    B (their number) and C0 (their lgamma terms). A and B gathered at the
    sampled outcome are exactly the noise sufficient statistics the reference
    accumulates in CountAllocation (getNoiseCounts,
    VariantClusterGenotyper.cpp:757-779), so the joint noise update is a psum
    + gamma draw with no per-iteration k-mer work.

  * Chains are batched with vmap (the reference runs them sequentially per
    thread, InferenceEngine.cpp:292-306); counter-based PRNG keys folded from
    (cluster_id, chain) make results independent of bucketing and device
    count, replacing the reference's seed arithmetic (InferenceEngine.cpp:294).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import (
    GIBBS_BURN_IN,
    GIBBS_SAMPLES,
    KMER_SUBSAMPLING_RATE,
    NUM_GIBBS_CHAINS,
    PLOIDY_DIPLOID,
    PLOIDY_HAPLOID,
    PLOIDY_NULL,
)
from ..ops.sampling import NEG_INF, sample_frequencies
from .buckets import ClusterBucket

# Unroll factor for the Gibbs iteration scans. Results are bit-identical for
# any unroll factor: the iteration body is keyed on the absolute iteration
# index t (fold_in), not on the trip count. Measured on the v5e (profile of
# the bulk H2/K256/C4096 wave): the 350-step scan body is NOT trip-bound —
# device busy time is 0.26 s/wave and unroll=5 made execution 2.7x SLOWER
# (worse fusion, 5x executable) — so the default stays 1; the knob remains
# for experiments on other hardware.
import os as _os

SCAN_UNROLL = int(_os.environ.get("BT_SCAN_UNROLL", "1"))


@dataclasses.dataclass(frozen=True, eq=False)
class OutcomeSpace:
    """Static outcome enumeration for a bucket's haplotype capacity H.

    oa/ob index into H+1 where index H is the missing-haplotype sentinel.
    Layout: [diploid pairs (i<=j) | haploid singles | null].
    """

    num_haplotypes: int
    oa: np.ndarray        # [O] int32
    ob: np.ndarray        # [O] int32
    het_bonus: np.ndarray  # [O] f32: log(2) on heterozygous pairs
    ploidy_mask: np.ndarray  # [3, O] bool: valid outcomes per ploidy level

    @property
    def num_outcomes(self):
        return self.oa.shape[0]

    @property
    def num_pairs(self):
        h = self.num_haplotypes
        return h * (h + 1) // 2


@functools.lru_cache(maxsize=None)
def make_outcome_space(num_haplotypes: int) -> OutcomeSpace:
    h = num_haplotypes
    ii, jj = np.triu_indices(h)
    oa = np.concatenate([ii, np.arange(h), [h]]).astype(np.int32)
    ob = np.concatenate([jj, np.full(h, h), [h]]).astype(np.int32)
    num_pairs = ii.shape[0]
    o = oa.shape[0]

    het = np.zeros(o, dtype=np.float32)
    het[:num_pairs] = np.where(ii != jj, np.log(2.0), 0.0)

    mask = np.zeros((3, o), dtype=bool)
    mask[PLOIDY_DIPLOID, :num_pairs] = True
    mask[PLOIDY_HAPLOID, num_pairs : num_pairs + h] = True
    mask[PLOIDY_NULL, o - 1] = True
    return OutcomeSpace(h, oa, ob, het, mask)


# Salts separating the per-slot uniform streams (subsample vs cap visit
# order); arbitrary odd constants.
_SUBSAMPLE_SALT = 0x9E3779B9
_CAP_SALT = 0x85EBCA77


def _slot_uniform(key, k, salt):
    """[k] uniforms where element i depends ONLY on (key, i, salt).

    jax.random.uniform(key, (k,)) pairs counter i with counter i + k/2
    inside threefry, so its output at slot i changes with the padded K —
    bucketing a cluster into a different K size class would redraw its
    subsample subset. Hashing (slot, salt) pairs explicitly makes the
    stream padding-invariant: growing K appends draws without changing
    existing ones."""
    from jax.extend.random import threefry_2x32

    kd = jax.random.key_data(key)
    cnt = jnp.arange(k, dtype=jnp.uint32)
    bits = threefry_2x32(
        kd, jnp.concatenate([cnt, jnp.full((k,), salt, jnp.uint32)])
    )[:k]
    # 24-bit mantissa conversion; exact uniform on [0, 1)
    return (bits >> jnp.uint32(8)).astype(jnp.float32) * jnp.float32(2.0**-24)


def subsample_masks(key, kmer_valid, num_chains, rate=KMER_SUBSAMPLING_RATE,
                    cluster_ids=None):
    """Per-chain Bernoulli k-mer subsets: [C, chains, K] bool.

    Mirrors the Bernoulli part of sampleKmerSubset
    (VariantClusterHaplotypes.cpp:110-157). When the per-(haplotype, variant)
    cap can bind (pool > max_haplotype_variant_kmers for some pair) the
    caller additionally applies `apply_kmer_cap`.

    Draws are keyed per (cluster, chain, k-mer slot): fold_in(key,
    cluster_id) then fold_in(chain), then a per-slot stable uniform
    (_slot_uniform) — so the subset of every cluster is independent of
    bucket shape, K size class, chunk packing, and co-scheduled classes.
    """
    c, k = kmer_valid.shape
    if cluster_ids is None:
        cluster_ids = jnp.arange(c, dtype=jnp.uint32)
    chain_idx = jnp.arange(num_chains, dtype=jnp.uint32)

    def per_cluster(cid):
        kc = jax.random.fold_in(key, cid.astype(jnp.uint32))
        return jax.vmap(
            lambda ch: _slot_uniform(
                jax.random.fold_in(kc, ch), k, _SUBSAMPLE_SALT
            )
        )(chain_idx)

    u = jax.vmap(per_cluster)(cluster_ids)
    return (u < rate) & kmer_valid[:, None, :]


def apply_kmer_cap(key, w, member_packed, num_haplotypes, cap,
                   cluster_ids=None):
    """Exact per-chain shuffled-order kmer cap per (haplotype, variant).

    Reference semantics (isMaxHaplotypeVariantKmer,
    VariantClusterHaplotypes.cpp:159-178): kmers are visited in random order;
    a Bernoulli-kept kmer survives iff at least one of its
    (haplotype, variant) memberships is still under the cap, and exactly the
    under-cap memberships are incremented. Implemented as a lax.scan over the
    kmer axis with a [C, chains, V, H] counter state; the per-(cluster,
    chain) visit order comes from counter-based permutation keys so results
    stay chip-count invariant. Callers gate this on a STATIC host-side check
    (any pool > cap) because the scan costs O(K) sequential steps.

    Args:
      w: [C, chains, K] bool Bernoulli masks.
      member_packed: [C, K, V, W] uint32 haplotype bitmasks.
    Returns the capped [C, chains, K] mask.
    """
    from .buckets import unpack_member_bits

    c, num_chains, k = w.shape
    v = member_packed.shape[2]
    h = num_haplotypes

    if cluster_ids is None:
        cluster_ids = jnp.arange(c, dtype=jnp.uint32)
    chain_idx = jnp.arange(num_chains, dtype=jnp.uint32)
    keys = jax.vmap(
        lambda cid: jax.vmap(
            lambda ch: jax.random.fold_in(
                jax.random.fold_in(key, cid.astype(jnp.uint32)), ch
            )
        )(chain_idx)
    )(cluster_ids)  # [C, chains, 2]
    # visit order = argsort of per-slot stable uniforms: growing the padded K
    # appends slots without reordering existing ones (padded slots are inert:
    # w is False there, so their position in the visit order is irrelevant)
    perm = jax.vmap(jax.vmap(
        lambda kk: jnp.argsort(_slot_uniform(kk, k, _CAP_SALT))
    ))(keys)

    def step(counts, t):
        idx = perm[:, :, t]  # [C, ch]
        rows = jax.vmap(lambda mp, ii: mp[ii])(member_packed, idx)  # [C,ch,V,W]
        m = unpack_member_bits(rows, h)  # [C, ch, V, H] bool
        sel = jnp.take_along_axis(w, idx[:, :, None], axis=2)[..., 0]
        m_eff = m & sel[:, :, None, None]
        under = m_eff & (counts < cap)
        keep = under.any(axis=(2, 3))  # [C, ch]
        return counts + under.astype(counts.dtype), keep

    _, keep_perm = jax.lax.scan(
        step,
        jnp.zeros((c, num_chains, v, h), jnp.int32),
        jnp.arange(k, dtype=jnp.int32),
    )
    keep_perm = jnp.transpose(keep_perm, (1, 2, 0))  # [C, ch, K] in visit order
    return jax.vmap(jax.vmap(lambda wv, pp, kp: wv.at[pp].set(kp)))(
        w, perm, keep_perm
    )


def _diplotype_multiplicities(bucket: ClusterBucket, outcomes: OutcomeSpace):
    """[C, K, O] uint8: per-outcome diplotype multiplicity (no intercluster).

    getDiplotypeKmerMultiplicity (VariantClusterHaplotypes.cpp:45-60) with the
    sentinel column H fixed at zero.
    """
    c, k, h = bucket.mult.shape
    me = jnp.concatenate(
        [bucket.mult, jnp.zeros((c, k, 1), dtype=bucket.mult.dtype)], axis=2
    )
    oa = jnp.asarray(outcomes.oa)
    ob = jnp.asarray(outcomes.ob)
    return me[:, :, oa] + me[:, :, ob]


# HBM budget for the gathered [C, K, S, O] table of the small-outcome LL
# strategy; above it the per-multiplicity-class matmul loop is used instead
_LL_GATHER_BYTES = 1 << 30


def compute_log_likelihoods(
    bucket: ClusterBucket,
    outcomes: OutcomeSpace,
    tables,
    w,
    max_total_mult: int,
    include_noise_row: bool = True,
    has_inter: bool = True,
):
    """Precompute LL[C, chains, S, O]: summed per-kmer count log-probs.

    LL[c,ch,s,o] = sum_k w[c,ch,k] * T_s[min(dip_mult[c,k,o] + inter[c,k,s], Mmax),
                                        counts[c,k,s]]

    Two strategies (both MXU contractions; the TPU analogue of the
    reference's table-lookup loop, calcDiplotypeLogProb):

      * small outcome spaces (the bulk SNV/indel classes): gather the
        per-kmer log-prob at each outcome's multiplicity ONCE into
        Q~[C,K,S,O], then a single [ch,K] x [K,S*O] matmul per cluster. One
        gather + one dot instead of max_total_mult materialised
        [C,ch*S,K] operands (matmul inputs cannot be producer-fused on TPU,
        so the per-class loop pays that materialisation every step).
      * large outcome spaces: loop over multiplicity classes m', each step a
        batched [chains*S, K] x [K, O] matmul against the indicator of
        dip_mult == m' (Q~ would not fit).

    Args:
      tables: [S, M+1, 256] combined log-pmf tables (row 0 = noise).
      w: [C, chains, K] float/bool subsample masks.
      max_total_mult: static clamp for multiplicity rows (>= bucket max of
        dip_mult + inter); larger multiplicities clamp to this row.
      include_noise_row: if False kmers with total multiplicity 0 contribute
        0 (their noise part is added analytically per iteration in
        joint-noise mode); kmers with dip_mult == 0 but inter_mult > 0 keep
        their genomic NB(count | inter) term (the reference scores total
        multiplicity dip + inter, getUniqueKmerMultiplicity,
        VariantClusterHaplotypes.cpp:45-74).
      has_inter: static hint that some inter_mult is nonzero; when False the
        intercluster shift (a [C,S,M,K] gather) is skipped entirely.
    Returns LL with the null-outcome column zeroed (the reference scores the
    null outcome as log-prob 0, VariantClusterGenotyper.cpp:745).
    """
    c, k, _ = bucket.mult.shape
    s = bucket.counts.shape[2]
    o = outcomes.num_outcomes
    num_chains = w.shape[1]
    mmax = min(max_total_mult, tables.shape[1] - 1)

    dip_mult = _diplotype_multiplicities(bucket, outcomes).astype(jnp.int32)
    wf = w.astype(jnp.float32)

    if c * k * s * o * 4 <= _LL_GATHER_BYTES:
        # ---- small-outcome strategy ----
        # All table selections are ONE-HOT MXU CONTRACTIONS, not gathers:
        # take_along_axis lowers to a serialized per-element gather on TPU
        # (measured 18x slower than the equivalent one-hot matmul at bulk
        # SNV-class shapes). A dot with a single nonzero one-hot term is
        # bit-exact: HIGHEST precision splits f32 into bf16 triples whose
        # sum reconstructs the operand exactly.
        # P[c,k,s,m] = tables[s, m, counts[c,k,s]] — computed per SAMPLE so
        # the [C,K,256] one-hot transient stays ~S times smaller than the
        # full [C,K,S,256] operand (3.5 GB at bulk-class shapes — the peak
        # that crashed the worker when two stacked groups overlapped).
        # Same one-hot dot per element, so the result is bit-identical.
        t = tables[:, : mmax + 1, :].astype(jnp.float32)  # [S, M, 256]

        def _p_of_sample(args):
            cnt_s, t_s = args  # [C, K], [M, 256]
            return jnp.einsum(
                "ckq,mq->ckm",
                jax.nn.one_hot(cnt_s, 256, dtype=jnp.bfloat16), t_s,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

        p = jnp.moveaxis(
            jax.lax.map(
                _p_of_sample, (jnp.moveaxis(bucket.counts, 2, 0), t)
            ),
            0, 2,
        )  # [C, K, S, M]
        if has_inter:
            inter_ks = bucket.inter_mult.astype(jnp.int32)  # [C, K, S]
            idx = jnp.minimum(
                dip_mult[:, :, None, :] + inter_ks[:, :, :, None], mmax
            )  # [C, K, S, O]
            # qt[c,k,s,o] = p[c,k,s,idx] — masked accumulate over the M
            # multiplicity rows instead of a one-hot contraction: the
            # [C,K,S,O,M] one-hot operand was the single largest transient
            # of the bulk classes (7+ GB at C=4096) and capped the chunk
            # size. Exactly one m matches per element and adding exact
            # zeros preserves f32 bits, so the result is bit-identical.
            def _gather_m(m, acc):
                pm = jax.lax.dynamic_index_in_dim(
                    p, m, axis=3, keepdims=False
                )  # [C, K, S]
                return acc + jnp.where(idx == m, pm[:, :, :, None], 0.0)

            qt = jax.lax.fori_loop(
                0, mmax + 1, _gather_m, jnp.zeros(idx.shape, jnp.float32)
            )
        else:
            idx = jnp.minimum(dip_mult, mmax)  # [C, K, O]
            qt = jnp.einsum(
                "cksm,ckom->ckso",
                p,
                jax.nn.one_hot(idx, mmax + 1, dtype=jnp.bfloat16),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        if not include_noise_row:
            if has_inter:
                keep = (dip_mult[:, :, None, :] > 0) | (
                    inter_ks[:, :, :, None] > 0
                )
            else:
                keep = (dip_mult > 0)[:, :, None, :]
            qt = jnp.where(keep, qt, 0.0)
        ll = jnp.einsum(
            "cxk,cky->cxy",
            wf,
            qt.reshape(c, k, s * o),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).reshape(c, num_chains, s, o)
        return ll.at[..., -1].set(0.0)

    # ---- multiplicity-class loop strategy ----
    # P[c,s,m,k] = tables[s, m, counts[c,k,s]] — a one-hot MXU contraction
    # (see the small-outcome strategy note: gathers serialize on TPU),
    # computed per sample to bound the one-hot transient (bit-identical)
    t = tables[:, : mmax + 1, :].astype(jnp.float32)  # [S, M, 256]

    def _p_of_sample(args):
        cnt_s, t_s = args  # [C, K], [M, 256]
        return jnp.einsum(
            "ckq,mq->cmk",
            jax.nn.one_hot(cnt_s, 256, dtype=jnp.bfloat16), t_s,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    p = jnp.moveaxis(
        jax.lax.map(
            _p_of_sample, (jnp.moveaxis(bucket.counts, 2, 0), t)
        ),
        0, 1,
    )  # [C, S, M, K]

    inter = jnp.transpose(bucket.inter_mult, (0, 2, 1)).astype(jnp.int32)  # [C,S,K]
    if has_inter:
        # Q[c,s,m',k] = P[c,s,min(m' + inter[c,k,s], mmax), k] via one-hot
        mprime = jnp.arange(mmax + 1, dtype=jnp.int32)
        q_idx = jnp.minimum(
            mprime[None, None, :, None] + inter[:, :, None, :], mmax
        )  # [C, S, M', K]
        q = jnp.einsum(
            "csmk,csnkm->csnk",
            p,
            jax.nn.one_hot(q_idx, mmax + 1, dtype=jnp.bfloat16),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    else:
        q = p

    m_start = 0 if include_noise_row else 1

    def body(m, ll):
        # bf16 indicator: exact 0/1 operand at half the HBM traffic of f32
        e = (dip_mult == m).astype(jnp.bfloat16)  # [C, K, O]
        r = wf[:, :, None, :] * q[:, None, :, m, :]  # [C, ch, S, K]
        contrib = jnp.einsum(
            "cxk,cko->cxo",
            r.reshape(c, num_chains * s, k),
            e,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return ll + contrib.reshape(c, num_chains, s, o)

    ll = jax.lax.fori_loop(
        m_start, mmax + 1, body, jnp.zeros((c, num_chains, s, o), jnp.float32)
    )
    if not include_noise_row and has_inter:
        # dip_mult == 0 but inter_mult > 0: genomic NB(count | inter) term
        # (see docstring); q[:, :, 0, :] is already P at multiplicity
        # min(0 + inter, mmax); mask it to inter > 0.
        e0 = (dip_mult == 0).astype(jnp.bfloat16)
        inter_pos = (inter > 0).astype(jnp.float32)  # [C, S, K]
        r0 = wf[:, :, None, :] * (q[:, :, 0, :] * inter_pos)[:, None, :, :]
        contrib0 = jnp.einsum(
            "cxk,cko->cxo",
            r0.reshape(c, num_chains * s, k),
            e0,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        ll = ll + contrib0.reshape(c, num_chains, s, o)
    # Clamped multiplicity classes > mmax all share row mmax: fold them in.
    e_over = (dip_mult > mmax).astype(jnp.bfloat16)
    r = wf[:, :, None, :] * q[:, None, :, mmax, :]
    over = jnp.einsum(
        "cxk,cko->cxo", r.reshape(c, num_chains * s, k), e_over,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(c, num_chains, s, o)
    ll = ll + over

    return ll.at[..., -1].set(0.0)


def compute_noise_terms(bucket: ClusterBucket, outcomes: OutcomeSpace, w,
                        has_inter: bool = True):
    """Per-outcome noise sufficient-statistic constants A, B, C0: [C, ch, S, O].

    A = sum_k w * [total mult == 0] * count      (count_sum)
    B = sum_k w * [total mult == 0]              (num_observations)
    C0 = sum_k w * [total mult == 0] * lgamma(count + 1)

    A and B at the sampled outcome are exactly the reference's noise
    sufficient statistics (getNoiseCounts, VariantClusterGenotyper.cpp:757-779
    + calcCountSuffStats, CountDistribution.cpp:188-200). The noise part of
    the log-likelihood is A*log(rate) - B*rate - C0 (poissonLogProb,
    CountDistribution.cpp:349-352). Note the null outcome's A/B are real (the
    reference collects noise counts for null-ploidy samples too) while its
    likelihood contribution is masked by the caller.

    All three statistics come out of ONE [C, ch*3*S, K] x [C, K, O] einsum:
    they share the dip_mult==0 indicator operand, so fusing them saves two
    materialisations of the broadcast left operand (HBM-bound at bulk-class
    sizes). `has_inter=False` (static) skips the inter_mult==0 mask.
    """
    c, k, _ = bucket.mult.shape
    s = bucket.counts.shape[2]
    o = outcomes.num_outcomes
    num_chains = w.shape[1]

    dip_zero = _diplotype_multiplicities(bucket, outcomes) == 0  # [C, K, O]
    wf = w.astype(jnp.float32)

    counts_f = bucket.counts.astype(jnp.float32)
    lg = jax.lax.lgamma(counts_f + 1.0)

    # vals: [C, 3, S, K] = (count, 1, lgamma(count+1)) masked to inter == 0
    vals = jnp.stack(
        [counts_f, jnp.ones_like(counts_f), lg], axis=1
    ).transpose(0, 1, 3, 2)  # [C, 3, S, K]
    if has_inter:
        inter_zero = (bucket.inter_mult == 0).astype(jnp.float32)  # [C,K,S]
        vals = vals * inter_zero.transpose(0, 2, 1)[:, None, :, :]

    r = wf[:, :, None, None, :] * vals[:, None]  # [C, ch, 3, S, K]
    out = jnp.einsum(
        "cxk,cko->cxo",
        r.reshape(c, num_chains * 3 * s, k),
        dip_zero.astype(jnp.bfloat16),  # exact 0/1, half the HBM traffic
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(c, num_chains, 3, s, o)
    return out[:, :, 0], out[:, :, 1], out[:, :, 2]


# one-level inverse-CDF threshold: XLA lowers a large-axis cumsum as an
# O(n^2) reduce_window on TPU — at O = 2145 (H = 64) the cumsum alone was
# 10.3 s of an 10.4 s 350-step scan (ablation: argmax-instead-of-cumsum ran
# 0.35 s). Above this, a two-level blocked inverse CDF cuts the quadratic
# term from O^2 to (O/B)^2 + B^2. Kept at/below it so the bulk SNV/indel
# classes (O <= 153) stay bit-exact with the pinned goldens.
_SAMPLE_ONELEVEL_MAX_O = 128
_SAMPLE_BLOCK = 64


def _sample_outcomes(key, logits):
    """Categorical outcome per sample via max-shifted inverse CDF
    (LogDiscreteSampler::sample, DiscreteSampler.cpp:106-126): ONE uniform
    per sample instead of one Gumbel per outcome — the per-outcome threefry
    bits dominated the Gibbs step for large outcome spaces (O = 2145 at
    H = 64).

    Large outcome spaces use a two-level search with the SAME single
    uniform: block partial sums pick the block, a within-block cumsum picks
    the element (identical in exact arithmetic; block-boundary rounding can
    shift a draw by one index, which is distribution-neutral)."""
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    o = p.shape[-1]
    if o <= _SAMPLE_ONELEVEL_MAX_O:
        csum = jnp.cumsum(p, axis=-1)
        u = jax.random.uniform(
            key, logits.shape[:-1] + (1,), dtype=logits.dtype
        ) * csum[..., -1:]
        return jnp.sum((csum <= u).astype(jnp.int32), axis=-1)

    b = _SAMPLE_BLOCK
    g = -(-o // b)
    pp = jnp.pad(p, [(0, 0)] * (p.ndim - 1) + [(0, g * b - o)])
    pp = pp.reshape(p.shape[:-1] + (g, b))
    bsum = jnp.sum(pp, axis=-1)                      # [..., G]
    bcs = jnp.cumsum(bsum, axis=-1)                  # O(G^2), small
    u = jax.random.uniform(
        key, logits.shape[:-1] + (1,), dtype=logits.dtype
    ) * bcs[..., -1:]
    gi = jnp.minimum(
        jnp.sum((bcs <= u).astype(jnp.int32), axis=-1), g - 1
    )                                                # [...]
    g_oh = (
        jnp.arange(g, dtype=jnp.int32) == gi[..., None]
    )                                                # [..., G]
    prev = jnp.sum(
        jnp.where(g_oh, bcs - bsum, 0.0), axis=-1, keepdims=True
    )                                                # csum before block
    blk = jnp.sum(
        jnp.where(g_oh[..., None], pp, 0.0), axis=-2
    )                                                # [..., B]
    # within-block inclusive cumsum as ONE [B, B] upper-triangular matmul:
    # XLA lowers jnp.cumsum on a 64-wide minor axis as an O(B^2)
    # reduce-window on the VPU, which profiled at ~10% of the H64-class
    # scan step (round 5); the MXU dot is ~free. Dot-product summation
    # order differs from the sequential cumsum by f32 ulps, which can
    # shift a draw across a threshold — distribution-neutral, exactly
    # like the block-boundary rounding note above.
    tri_b = jnp.asarray(np.tril(np.ones((b, b), np.float32)).T)
    lcs = jnp.einsum(
        "...b,bc->...c", blk, tri_b,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    t = u - prev
    j = jnp.minimum(
        jnp.sum((lcs <= t).astype(jnp.int32), axis=-1), b - 1
    )
    return jnp.minimum(gi * b + j, o - 1)


# outcome-selection strategy threshold: a masked one-hot reduction costs O
# elements per output and vectorizes on the VPU; a gather costs ~15ns per
# OUTPUT element on TPU (serialized) regardless of O — so one-hot wins for
# small outcome spaces (the per-iteration noise-stat selection runs 350x)
_SELECT_ONEHOT_MAX_O = 256


def _select_outcome(vals, o_sel):
    """vals[..., O] at o_sel[...]: bit-exact TPU-friendly selection."""
    o = vals.shape[-1]
    if o <= _SELECT_ONEHOT_MAX_O:
        oh = jnp.arange(o, dtype=jnp.int32) == o_sel[..., None]
        return jnp.sum(jnp.where(oh, vals, 0), axis=-1)
    return jnp.take_along_axis(vals, o_sel[..., None], axis=-1)[..., 0]


def _gibbs_iteration(key, freqs, ll, ploidy, hap_valid, sparsity, use_sparse, osp):
    """Cleaner single-(cluster,chain) iteration used by the scans below."""
    h = freqs.shape[0]
    oa, ob, het_bonus, ploidy_mask = osp

    k_cat, k_freq = jax.random.split(key)

    logf = jnp.where(freqs > 0, jnp.log(jnp.maximum(freqs, 1e-30)), NEG_INF)
    logf_ext = jnp.concatenate([logf, jnp.zeros((1,), logf.dtype)])
    prior = logf_ext[oa] + logf_ext[ob] + het_bonus

    valid = ploidy_mask[ploidy]
    logits = jnp.where(valid, prior[None, :] + ll, NEG_INF)
    o_sel = _sample_outcomes(k_cat, logits)

    # haplotype observation counts via a one-hot CONTRACTION: indexing
    # oa[o_sel]/ob[o_sel] lowers to a serialized per-element gather that
    # dominated the stacked scan (~65 ms/step at [8,4096,20,13] index
    # volume); hap_inc is a compile-time-constant [O, H] matrix, so this is
    # one vectorised matmul. Integer-valued f32 sums are exact, so the
    # counts are bit-identical to the gather formulation.
    o = oa.shape[0]
    hr = jnp.arange(h, dtype=oa.dtype)
    hap_inc = (
        (oa[:, None] == hr).astype(jnp.float32)
        + (ob[:, None] == hr).astype(jnp.float32)
    )                                                        # [O, H] const
    onehot_sel = (
        jnp.arange(o, dtype=jnp.int32) == o_sel[:, None]
    ).astype(jnp.float32)                                    # [S, O]
    hap_counts = jnp.einsum(
        "so,oh->h", onehot_sel, hap_inc,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).astype(jnp.int32)                                      # [H]
    n_total = jnp.sum(hap_counts)

    new_freqs = sample_frequencies(k_freq, hap_counts, hap_valid, sparsity, use_sparse)
    freqs = jnp.where(n_total > 0, new_freqs, freqs)
    return freqs, o_sel


@dataclasses.dataclass(frozen=True)
class GibbsConfig:
    num_chains: int = NUM_GIBBS_CHAINS
    burn_in: int = GIBBS_BURN_IN
    num_samples: int = GIBBS_SAMPLES
    kmer_subsampling_rate: float = KMER_SUBSAMPLING_RATE
    max_total_mult: int = 32
    # exact shuffled-order per-(haplotype, variant) kmer cap; apply_cap is set
    # by the host only when some pool exceeds the cap (static gate: the cap
    # scan costs O(K) sequential steps)
    max_haplotype_variant_kmers: int = 500
    apply_cap: bool = False
    # static hint set by the host when some kmer in the bucket has a nonzero
    # intercluster multiplicity; False skips the inter-shift gathers in the
    # LL precompute (most buckets have no reference-copy kmers)
    has_inter: bool = True


def _subsample_with_cap(key, bucket, num_chains, cfg):
    # split the key ONLY when the cap applies so the no-cap RNG stream (the
    # common case) is unchanged
    if not cfg.apply_cap:
        return subsample_masks(
            key, bucket.kmer_valid, num_chains, cfg.kmer_subsampling_rate,
            cluster_ids=bucket.cluster_id,
        )
    k_sub, k_cap = jax.random.split(key)
    w = subsample_masks(
        k_sub, bucket.kmer_valid, num_chains, cfg.kmer_subsampling_rate,
        cluster_ids=bucket.cluster_id,
    )
    return apply_kmer_cap(
        k_cap, w, bucket.member, bucket.num_haplotypes,
        cfg.max_haplotype_variant_kmers, cluster_ids=bucket.cluster_id,
    )


def _chain_keys(base_key, cluster_ids, num_chains):
    """Counter-based per-(cluster, chain) keys: fold_in(cluster_id) then chain.

    Replaces `prng_seed + (group_idx+1)*(chain_idx+1)` (InferenceEngine.cpp:294)
    with collision-free fold_in chains; independent of bucketing/devices.
    """
    def per_cluster(cid):
        ck = jax.random.fold_in(base_key, cid.astype(jnp.uint32))
        return jax.vmap(lambda i: jax.random.fold_in(ck, i))(
            jnp.arange(num_chains, dtype=jnp.uint32)
        )

    return jax.vmap(per_cluster)(cluster_ids)  # [C, chains, 2]


@functools.partial(jax.jit, static_argnames=("outcomes", "cfg"))
def genotype_bucket(base_key, bucket: ClusterBucket, tables, outcomes: OutcomeSpace,
                    cfg: GibbsConfig):
    """Frozen-noise genotyping of one bucket (estimateGenotypes mode,
    InferenceEngine.cpp:278-333): all chains in parallel, noise rates frozen
    inside `tables`.

    Returns:
      tally: [C, chains, S, O] int32 post-burn-in outcome tallies
      w: [C, chains, K] bool per-chain kmer subsets (for the stats pass)
    """
    c = bucket.num_clusters
    h = bucket.num_haplotypes
    s = bucket.num_samples
    o = outcomes.num_outcomes
    num_iters = cfg.burn_in + cfg.num_samples

    k_sub, k_chain = jax.random.split(base_key)
    w = _subsample_with_cap(k_sub, bucket, cfg.num_chains, cfg)

    ll = compute_log_likelihoods(
        bucket, outcomes, tables, w, cfg.max_total_mult,
        include_noise_row=True, has_inter=cfg.has_inter,
    )

    osp = (
        jnp.asarray(outcomes.oa),
        jnp.asarray(outcomes.ob),
        jnp.asarray(outcomes.het_bonus),
        jnp.asarray(outcomes.ploidy_mask),
    )

    chain_keys = _chain_keys(k_chain, bucket.cluster_id, cfg.num_chains)

    # Per-chain initial frequencies: uniform over all real haplotypes — the
    # reference resets (not initialises) per chain (VariantClusterGroup.cpp:184,
    # FrequencyDistribution.cpp:47-52).
    hv = bucket.hap_valid
    nh = jnp.sum(hv, axis=1, keepdims=True).astype(jnp.float32)
    freqs0 = jnp.where(hv, 1.0 / jnp.maximum(nh, 1.0), 0.0)  # [C, H]
    freqs0 = jnp.broadcast_to(freqs0[:, None, :], (c, cfg.num_chains, h))

    def step(carry, t):
        freqs, tally = carry

        def per_cc(ck, f, llcc, ploidy, hvc, sp, usp):
            key = jax.random.fold_in(ck, t.astype(jnp.uint32))
            return _gibbs_iteration(key, f, llcc, ploidy, hvc, sp, usp, osp)

        new_freqs, o_sel = jax.vmap(  # over clusters
            jax.vmap(per_cc, in_axes=(0, 0, 0, None, None, None, None)),
            in_axes=(0, 0, 0, 0, 0, 0, 0),
        )(chain_keys, freqs, ll, bucket.ploidy, hv, bucket.sparsity,
          bucket.use_sparse)

        collect = (t >= cfg.burn_in).astype(jnp.int32)
        onehot = (
            jnp.arange(o, dtype=jnp.int32)[None, None, None, :] == o_sel[..., None]
        ).astype(jnp.int32)
        tally = tally + collect * onehot
        return (new_freqs, tally), None

    tally0 = jnp.zeros((c, cfg.num_chains, s, o), jnp.int32)
    (_, tally), _ = jax.lax.scan(
        step, (freqs0, tally0), jnp.arange(num_iters, dtype=jnp.int32),
        unroll=SCAN_UNROLL,
    )
    return tally, w


@functools.partial(jax.jit, static_argnames=("outcomes_list", "cfgs"))
def genotype_buckets_multi(base_key, buckets, tables, outcomes_list, cfgs):
    """Frozen-noise genotyping of SEVERAL buckets in ONE compiled program.

    The per-class scans are latency-bound (350 sequential steps whose
    per-step work is tiny for all but the largest class); stepping every
    bucket inside one lax.scan amortises the per-step overhead and the
    dispatch/fetch round-trips across classes. Because the subsample and
    Gibbs streams are keyed per (cluster_id, chain), each cluster's result
    is bit-identical to a per-class `genotype_bucket` call — co-scheduling
    is purely a scheduling decision (tested in test_gibbs_multi.py).

    Returns (tallies, ws): tuples matching `buckets` with the same contents
    as genotype_bucket's (tally [C, ch, S, O], w [C, ch, K]).
    """
    num_iters = cfgs[0].burn_in + cfgs[0].num_samples
    assert all(
        cfg.burn_in + cfg.num_samples == num_iters for cfg in cfgs
    ), "co-scheduled buckets must share the iteration count"

    setups = []
    for bucket, outcomes, cfg in zip(buckets, outcomes_list, cfgs):
        k_sub, k_chain = jax.random.split(base_key)
        w = _subsample_with_cap(k_sub, bucket, cfg.num_chains, cfg)
        ll = compute_log_likelihoods(
            bucket, outcomes, tables, w, cfg.max_total_mult,
            include_noise_row=True, has_inter=cfg.has_inter,
        )
        osp = (
            jnp.asarray(outcomes.oa),
            jnp.asarray(outcomes.ob),
            jnp.asarray(outcomes.het_bonus),
            jnp.asarray(outcomes.ploidy_mask),
        )
        chain_keys = _chain_keys(k_chain, bucket.cluster_id, cfg.num_chains)
        hv = bucket.hap_valid
        nh = jnp.sum(hv, axis=1, keepdims=True).astype(jnp.float32)
        freqs0 = jnp.where(hv, 1.0 / jnp.maximum(nh, 1.0), 0.0)
        freqs0 = jnp.broadcast_to(
            freqs0[:, None, :],
            (bucket.num_clusters, cfg.num_chains, bucket.num_haplotypes),
        )
        setups.append(dict(
            bucket=bucket, cfg=cfg, w=w, ll=ll, osp=osp,
            chain_keys=chain_keys, freqs0=freqs0,
            o=outcomes.num_outcomes,
        ))

    def step(carry, t):
        freqs_list, tally_list = carry
        new_freqs_list, new_tally_list = [], []
        for su, freqs, tally in zip(setups, freqs_list, tally_list):
            def per_cc(ck, f, llcc, ploidy, hvc, sp, usp, osp=su["osp"]):
                key = jax.random.fold_in(ck, t.astype(jnp.uint32))
                return _gibbs_iteration(key, f, llcc, ploidy, hvc, sp, usp,
                                        osp)

            bucket = su["bucket"]
            new_freqs, o_sel = jax.vmap(  # over clusters
                jax.vmap(per_cc, in_axes=(0, 0, 0, None, None, None, None)),
                in_axes=(0, 0, 0, 0, 0, 0, 0),
            )(su["chain_keys"], freqs, su["ll"], bucket.ploidy,
              bucket.hap_valid, bucket.sparsity, bucket.use_sparse)
            collect = (t >= su["cfg"].burn_in).astype(jnp.int32)
            onehot = (
                jnp.arange(su["o"], dtype=jnp.int32)[None, None, None, :]
                == o_sel[..., None]
            ).astype(jnp.int32)
            new_freqs_list.append(new_freqs)
            new_tally_list.append(tally + collect * onehot)
        return (tuple(new_freqs_list), tuple(new_tally_list)), None

    freqs0_list = tuple(su["freqs0"] for su in setups)
    tally0_list = tuple(
        jnp.zeros(
            (su["bucket"].num_clusters, su["cfg"].num_chains,
             su["bucket"].num_samples, su["o"]),
            jnp.int32,
        )
        for su in setups
    )
    (_, tallies), _ = jax.lax.scan(
        step, (freqs0_list, tally0_list),
        jnp.arange(num_iters, dtype=jnp.int32),
        unroll=SCAN_UNROLL,
    )
    return tallies, tuple(su["w"] for su in setups)


@functools.partial(
    jax.jit, static_argnames=("outcomes", "cfg", "axis_name")
)
def noise_chain(base_key, bucket: ClusterBucket, tables, init_rates,
                noise_prior, outcomes: OutcomeSpace, cfg: GibbsConfig,
                chain_idx, axis_name: str | None = None):
    """One sequential noise-estimation chain over a bucket of single-cluster
    groups (estimateNoise, InferenceEngine.cpp:135-276).

    Every iteration all clusters draw diplotypes under the current global
    noise rates, the zero-multiplicity sufficient statistics are reduced
    (psum over `axis_name` when running under shard_map — replacing the
    mutex-merged CountAllocation, InferenceEngine.cpp:96-98), and the rates
    are resampled from the conjugate gamma posterior. The noise part of
    every outcome's log-likelihood is the analytic A*log(r) - B*r - C0, so
    no table rebuild happens inside the loop.

    Args:
      tables: [S, M+1, 256] genomic tables (row 0 unused here).
      init_rates: [S] starting rates (drawn from the prior by the caller,
        resetNoiseRates CountDistribution.cpp:163-171).
      noise_prior: (shape, scale).
    Returns:
      rate_sum: [S] sum of post-burn-in rates (caller divides by
        num_samples*num_chains across chains), and the full [iters+1, S]
        rate trace for the `_noise_parameters.txt` dump.
    """
    c = bucket.num_clusters
    h = bucket.num_haplotypes
    s = bucket.num_samples
    num_iters = cfg.burn_in + cfg.num_samples
    prior_shape, prior_scale = noise_prior

    k_sub, k_chain, k_noise = jax.random.split(
        jax.random.fold_in(base_key, jnp.uint32(chain_idx)), 3
    )
    w = _subsample_with_cap(k_sub, bucket, 1, cfg)

    llg = compute_log_likelihoods(
        bucket, outcomes, tables, w, cfg.max_total_mult,
        include_noise_row=False, has_inter=cfg.has_inter,
    )[:, 0]  # [C, S, O]
    a, b, c0 = compute_noise_terms(bucket, outcomes, w, cfg.has_inter)
    a, b, c0 = a[:, 0], b[:, 0], c0[:, 0]  # [C, S, O]
    # the null outcome contributes no likelihood (but its A/B still feed the
    # noise statistics — getNoiseCounts runs for null-ploidy samples too)
    ll_mask = jnp.ones_like(llg).at[..., -1].set(0.0)
    # c0 is a per-outcome CONSTANT of the noise log-likelihood — fold it
    # into llg once (25% less scan-resident state; the per-iteration part
    # is only a*log(r) - b*r). b is a k-mer count <= K, stored u16.
    llg = llg - c0 * ll_mask
    b = b.astype(jnp.uint16)

    osp = (
        jnp.asarray(outcomes.oa),
        jnp.asarray(outcomes.ob),
        jnp.asarray(outcomes.het_bonus),
        jnp.asarray(outcomes.ploidy_mask),
    )

    cluster_keys = jax.vmap(
        lambda cid: jax.random.fold_in(
            jax.random.fold_in(k_chain, cid.astype(jnp.uint32)), 0
        )
    )(bucket.cluster_id)

    hv = bucket.hap_valid
    nh = jnp.sum(hv, axis=1, keepdims=True).astype(jnp.float32)
    freqs0 = jnp.where(hv, 1.0 / jnp.maximum(nh, 1.0), 0.0)

    cv = bucket.cluster_valid.astype(jnp.float32)

    def step(carry, t):
        freqs, rates = carry
        log_r = jnp.log(jnp.maximum(rates, 1e-30))
        ll = llg + (
            a * log_r[None, :, None]
            - b.astype(jnp.float32) * rates[None, :, None]
        ) * ll_mask

        def per_cluster(ck, f, llc, ploidy, hvc, sp, usp):
            key = jax.random.fold_in(ck, t.astype(jnp.uint32))
            return _gibbs_iteration(key, f, llc, ploidy, hvc, sp, usp, osp)

        new_freqs, o_sel = jax.vmap(per_cluster)(
            cluster_keys, freqs, ll, bucket.ploidy, hv,
            bucket.sparsity, bucket.use_sparse,
        )

        a_sel = _select_outcome(a, o_sel)  # [C, S]
        b_sel = _select_outcome(b, o_sel)
        # A/B are integer-valued (0/1-weighted uint8 count sums), so an int32
        # reduction is exact and independent of summation/sharding order —
        # this is what makes noise rates bit-identical for any chip count
        count_sum = jnp.sum((a_sel * cv[:, None]).astype(jnp.int32), axis=0)
        num_obs = jnp.sum((b_sel * cv[:, None]).astype(jnp.int32), axis=0)
        if axis_name is not None:
            count_sum = jax.lax.psum(count_sum, axis_name)
            num_obs = jax.lax.psum(num_obs, axis_name)

        k_it = jax.random.fold_in(k_noise, t.astype(jnp.uint32))
        # conjugate gamma update (sampleNoiseParameters, CountDistribution.cpp:173-186)
        from ..ops.sampling import fixed_round_gamma
        shape = prior_shape + count_sum
        scale = prior_scale / (num_obs * prior_scale + 1.0)
        new_rates = fixed_round_gamma(k_it, shape) * scale

        collect = (t >= cfg.burn_in).astype(jnp.float32)
        return (new_freqs, new_rates), (new_rates, collect)

    (_, _), (trace, collected) = jax.lax.scan(
        step, (freqs0, init_rates), jnp.arange(num_iters, dtype=jnp.int32),
        unroll=SCAN_UNROLL,
    )
    rate_sum = jnp.sum(trace * collected[:, None], axis=0)
    return rate_sum, trace


@functools.partial(
    jax.jit, static_argnames=("outcomes_list", "cfgs", "num_pool", "acaps")
)
def genotype_nested(base_key, buckets, parent_levels, parent_rows,
                    retain_tables, shared_infos, tables, outcomes_list, cfgs,
                    num_pool=0, acaps=None):
    """Frozen-noise genotyping of COUPLED cluster groups: nested containment
    families and/or groups sharing multicluster k-mers.

    TPU reformulation of the reference's per-iteration group recursion
    (VariantClusterGroup::runGibbsSample, VariantClusterGroup.cpp:236-250):
    clusters are laid out in LEVELS — rank within their group ordered by
    (containment depth, id) — and each Gibbs iteration runs the levels
    sequentially, so every cluster samples conditioned on the CURRENT
    outcomes of lower-ranked group members:

      * ploidy demotion: a cluster with a containment parent draws its
        per-(cluster, chain, sample) ploidy from the parent's just-sampled
        outcome via its retain table (updateNestedVariantClusterInfo,
        VariantClusterGenotyper.cpp:183-206).
      * shared multicluster k-mers: a k-mer occurring in several clusters
        of one group is scored at own diplotype multiplicity + the summed
        CURRENT contributions of every sibling (pool minus own), matching
        getMulticlusterKmerMultiplicity
        (VariantClusterHaplotypes.cpp:76-93) including its count==0 branch
        (zero-count k-mers ignore the pool). The pool state is updated with
        each cluster's (new - old) contribution after it samples
        (updateMulticlusterKmerMultiplicities, :197-233). The reference
        shuffles sibling order per iteration (shuffleBranchOrdering,
        VariantClusterGroup.cpp:208-218); the fixed rank order used here is
        an equally valid systematic-scan Gibbs sampler over the same joint
        posterior (tested against the coupled oracle,
        tests/test_coupling_adversarial.py).

    Args:
      buckets: tuple of ClusterBucket, one per level (level 0 first).
      parent_levels / parent_rows: tuples; [C_l] int32 (level, row) of each
        cluster's containment parent, level -1 = none (chromosome ploidy).
      retain_tables: tuple; [C_l, O_pad] int8 = demoted ploidy of cluster c
        when its parent sampled outcome o (padded to the max outcome count
        across levels; unused for parentless clusters).
      shared_infos: tuple; None for levels without shared k-mers, else a
        dict of numpy arrays: sh_idx [C_l, Q] int32 (k-mer slot, 0-padded),
        sh_slot [C_l, Q] int32 (pool slot, 0-padded), sh_valid [C_l, Q]
        bool, sh_mask [C_l, K] bool (True at shared k-mer slots).
      num_pool: static total shared-pool slots (0 = no coupling anywhere).
      tables: [S, M+1, 256] frozen-noise log-pmf tables.
      acaps: tuple of per-level allele capacities for the MAC correction
        accumulators (None disables them).
    Returns:
      (tallies, ws, mac_extras): tuples per level — tally [C, chains, S,
      O_l] int32, w [C, chains, K_l] bool, and mac_extras [C, S, V_l, A_l]
      f32 (chain-summed shared-k-mer MAC numerator corrections; None for
      levels without shared k-mers or when acaps is None).

    MAC sibling fold: the reference's per-iteration stats cache scores a
    shared k-mer's count/multiplicity with the SIBLINGS' current sampled
    contributions in the denominator (updateKmerStatsCache,
    VariantClusterHaplotypes.cpp:302-333). The static top-T MAC path uses
    own+intercluster multiplicity only, so for shared k-mers this scan
    accumulates the exact per-iteration correction
        (count / (own + inter + siblings)) - (count / (own + inter))
    tally-weighted per (sample, variant, allele) — added to the static MAC
    numerator by collect_bucket_stats (which runs with an exact T = O
    enumeration for these levels so the weights line up).
    """
    num_levels = len(buckets)
    cfg0 = cfgs[0]
    num_iters = cfg0.burn_in + cfg0.num_samples
    num_chains = cfg0.num_chains
    s = buckets[0].num_samples
    c_max = max(b.num_clusters for b in buckets)
    o_pad = max(o.num_outcomes for o in outcomes_list)

    precomp = []
    for l in range(num_levels):
        bucket, outcomes, cfg = buckets[l], outcomes_list[l], cfgs[l]
        kb = jax.random.fold_in(base_key, jnp.uint32(l))
        k_sub, k_chain = jax.random.split(kb)
        w = _subsample_with_cap(k_sub, bucket, num_chains, cfg)
        sh = shared_infos[l]
        if sh is None:
            w_base = w
        else:
            # shared k-mers leave the static LL (their multiplicity depends
            # on sibling state) and are scored per iteration below
            w_base = w & ~jnp.asarray(sh["sh_mask"])[:, None, :]
        ll = compute_log_likelihoods(
            bucket, outcomes, tables, w_base, cfg.max_total_mult,
            include_noise_row=True, has_inter=cfg.has_inter,
        )
        pre = dict(
            w=w, ll=ll, osp=_osp_arrays(outcomes),
            chain_keys=_chain_keys(k_chain, bucket.cluster_id, num_chains),
            freqs0=_freqs0(bucket, num_chains),
        )
        if sh is not None:
            mmax = min(cfg.max_total_mult, tables.shape[1] - 1)
            sh_idx = jnp.asarray(sh["sh_idx"])            # [C, Q]
            counts_sh = jnp.take_along_axis(
                bucket.counts, sh_idx[:, :, None], axis=1
            ).astype(jnp.int32)                           # [C, Q, S]
            inter_sh = jnp.take_along_axis(
                bucket.inter_mult, sh_idx[:, :, None], axis=1
            ).astype(jnp.int32)
            mult_sh = jnp.take_along_axis(
                bucket.mult, sh_idx[:, :, None], axis=1
            ).astype(jnp.int32)                           # [C, Q, H]
            me = jnp.concatenate(
                [mult_sh, jnp.zeros_like(mult_sh[:, :, :1])], axis=2
            )
            oa = jnp.asarray(outcomes.oa)
            ob = jnp.asarray(outcomes.ob)
            dip_sh = me[:, :, oa] + me[:, :, ob]          # [C, Q, O]
            w_sh = jnp.take_along_axis(
                w, sh_idx[:, None, :], axis=2
            ) & jnp.asarray(sh["sh_valid"])[:, None, :]   # [C, ch, Q]
            # Tcut[c,q,s,m] = tables[s, m, counts_sh[c,q,s]]
            tcut = jnp.einsum(
                "cqsx,smx->cqsm",
                jax.nn.one_hot(counts_sh, 256, dtype=jnp.bfloat16),
                tables[:, : mmax + 1, :].astype(jnp.float32),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )                                             # [C, Q, S, M]
            pre["sh"] = dict(
                slot=jnp.asarray(sh["sh_slot"]),
                valid=jnp.asarray(sh["sh_valid"]),
                counts=counts_sh, inter=inter_sh, dip=dip_sh,
                w_sh=w_sh, tcut=tcut, mmax=mmax,
            )
            if acaps is not None:
                # MAC sibling-fold precompute (see docstring): member bits
                # of the shared k-mer rows, per-(chain, variant, hap) w-
                # weighted k-mer counts (the same n the stats pass uses),
                # haplotype->allele map with the sentinel slot, and the
                # outcome->haplotype one-hot tables.
                from .buckets import unpack_member_bits

                h = bucket.num_haplotypes
                mem_rows = jnp.take_along_axis(
                    bucket.member, sh_idx[:, :, None, None], axis=1
                )                                          # [C, Q, V, W]
                mem_sh = unpack_member_bits(mem_rows, h)   # [C, Q, V, H]
                mem_ext = jnp.concatenate(
                    [mem_sh, jnp.zeros_like(mem_sh[..., :1])], axis=-1
                ).astype(jnp.bfloat16)                     # [C, Q, V, H+1]
                member_all = unpack_member_bits(bucket.member, h)
                n_hv = jnp.einsum(
                    "cxk,ckm->cxm", w.astype(jnp.float32),
                    member_all.reshape(
                        bucket.num_clusters, bucket.num_kmers, -1
                    ).astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                ).reshape(bucket.num_clusters, num_chains,
                          bucket.num_variants, h)          # [C, ch, V, H]
                n_hv_ext = jnp.concatenate(
                    [n_hv, jnp.zeros_like(n_hv[..., :1])], axis=-1
                )
                sentinel = (bucket.num_alleles - 1).astype(jnp.float32)
                ha_ext = jnp.concatenate(
                    [bucket.hap_allele.astype(jnp.float32),
                     sentinel[:, None, :]], axis=1
                )                                          # [C, H+1, V]
                oa_np = outcomes.oa
                ob_np = outcomes.ob
                hr = np.arange(bucket.num_haplotypes + 1)
                pre["mac"] = dict(
                    mem=mem_ext, n_hv=n_hv_ext, ha=ha_ext,
                    oa_oh=jnp.asarray(
                        (oa_np[:, None] == hr).astype(np.float32)
                    ),                                     # [O, H+1]
                    ob_oh=jnp.asarray(
                        (ob_np[:, None] == hr).astype(np.float32)
                    ),
                    real_oa=jnp.asarray(
                        (oa_np < bucket.num_haplotypes).astype(np.float32)
                    ),                                     # [O]
                    real_ob=jnp.asarray(
                        (ob_np < bucket.num_haplotypes).astype(np.float32)
                    ),
                    a_cap=acaps[l],
                )
        precomp.append(pre)

    def step(carry, t):
        freqs_list, tally_list, o_stack, pool, mac_list = carry
        # o_stack: [L, c_max, ch, S] current outcome per level (levels not
        # yet sampled this iteration still hold the previous iteration's);
        # pool: [P, ch, S] total shared-kmer contributions at those outcomes
        new_freqs_list, new_tally_list, new_mac_list = [], [], []
        for l in range(num_levels):
            bucket = buckets[l]
            pre = precomp[l]
            c = bucket.num_clusters
            o = outcomes_list[l].num_outcomes

            pl_lvl = parent_levels[l]
            chrom_pl = jnp.broadcast_to(
                bucket.ploidy[:, None, :], (c, num_chains, s)
            ).astype(jnp.int32)
            po = o_stack[
                jnp.maximum(pl_lvl, 0), parent_rows[l]
            ]                                              # [C_l, ch, S]
            demoted = jax.vmap(lambda r, p: r[p])(
                retain_tables[l], po
            ).astype(jnp.int32)
            ploidy = jnp.where(
                (pl_lvl >= 0)[:, None, None], demoted, chrom_pl
            )

            ll = pre["ll"]
            sh = pre.get("sh")
            if sh is not None:
                o_old = o_stack[l, :c]                     # [C, ch, S]
                oh_old = jax.nn.one_hot(o_old, o, dtype=jnp.bfloat16)
                own_old = jnp.einsum(
                    "cqo,cxso->cqxs", sh["dip"].astype(jnp.bfloat16),
                    oh_old, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                ).astype(jnp.int32)                        # [C, Q, ch, S]
                pool_g = pool[sh["slot"]]                  # [C, Q, ch, S]
                m_ext = jnp.where(
                    (sh["counts"] > 0)[:, :, None, :],
                    pool_g - own_old, 0,
                )
                m_cand = jnp.minimum(
                    sh["dip"][:, :, None, None, :]
                    + sh["inter"][:, :, None, :, None]
                    + m_ext[..., None],
                    sh["mmax"],
                )                                          # [C, Q, ch, S, O]

                def _sh_gather(m, acc):
                    tm = jax.lax.dynamic_index_in_dim(
                        sh["tcut"], m, axis=3, keepdims=False
                    )                                      # [C, Q, S]
                    return acc + jnp.where(
                        m_cand == m, tm[:, :, None, :, None], 0.0
                    )

                vals = jax.lax.fori_loop(
                    0, sh["mmax"] + 1, _sh_gather,
                    jnp.zeros(m_cand.shape, jnp.float32),
                )                                          # [C, Q, ch, S, O]
                ll_sh = jnp.einsum(
                    "cxq,cqxso->cxso",
                    sh["w_sh"].astype(jnp.float32), vals,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                # the null outcome keeps log-prob 0 (scored by the caller)
                ll = ll + ll_sh.at[..., -1].set(0.0)

            def per_cc(ck, f, llcc, pl, hvc, sp, usp, osp=pre["osp"]):
                key = jax.random.fold_in(ck, t.astype(jnp.uint32))
                return _gibbs_iteration(key, f, llcc, pl, hvc, sp, usp, osp)

            new_freqs, o_sel = jax.vmap(  # over clusters
                jax.vmap(per_cc, in_axes=(0, 0, 0, 0, None, None, None)),
                in_axes=(0, 0, 0, 0, 0, 0, 0),
            )(pre["chain_keys"], freqs_list[l], ll, ploidy,
              bucket.hap_valid, bucket.sparsity, bucket.use_sparse)

            if sh is not None:
                oh_new = jax.nn.one_hot(o_sel, o, dtype=jnp.bfloat16)
                own_new = jnp.einsum(
                    "cqo,cxso->cqxs", sh["dip"].astype(jnp.bfloat16),
                    oh_new, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                ).astype(jnp.int32)
                delta = jnp.where(
                    sh["valid"][:, :, None, None], own_new - own_old, 0
                )
                upd = jnp.einsum(
                    "cqxs,cqp->pxs", delta.astype(jnp.float32),
                    jax.nn.one_hot(sh["slot"], pool.shape[0],
                                   dtype=jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                ).astype(jnp.int32)
                pool = pool + upd

                mac_pre = pre.get("mac")
                if mac_pre is not None:
                    # exact shared-k-mer MAC correction at the sampled
                    # outcome (see docstring): sibling contributions are
                    # the pool state right after this cluster's update —
                    # the same state the reference's stats cache sees
                    # (updateKmerStatsCache, VariantClusterHaplotypes.cpp:
                    # 302-333).
                    ext_new = jnp.where(
                        sh["valid"][:, :, None, None],
                        pool[sh["slot"]] - own_new, 0,
                    )                                      # [C, Q, ch, S]
                    mult_stat = (
                        own_new + sh["inter"][:, :, None, :]
                    ).astype(jnp.float32)
                    counts_f = sh["counts"].astype(
                        jnp.float32
                    )[:, :, None, :]                       # [C, Q, 1, S]
                    val_stat = counts_f / jnp.maximum(mult_stat, 1.0)
                    val_dyn = counts_f / jnp.maximum(
                        mult_stat + ext_new.astype(jnp.float32), 1.0
                    )
                    dval = (val_dyn - val_stat) * jnp.transpose(
                        sh["w_sh"].astype(jnp.float32), (0, 2, 1)
                    )[:, :, :, None]                       # [C, Q, ch, S]

                    def _slot_extra(h_oh, real_o):
                        hsel = jnp.einsum(
                            "cxso,oh->cxsh", oh_new,
                            h_oh.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST,
                        )                                  # [C, ch, S, H+1]
                        msel = jnp.einsum(
                            "cqvh,cxsh->cqxsv", mac_pre["mem"],
                            hsel.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST,
                        )                                  # [C, Q, ch, S, V]
                        dmn = jnp.einsum(
                            "cqxs,cqxsv->cxsv", dval, msel
                        )
                        n_at = jnp.einsum(
                            "cxvh,cxsh->cxsv", mac_pre["n_hv"], hsel
                        )
                        al_at = jnp.einsum(
                            "chv,cxsh->cxsv", mac_pre["ha"], hsel
                        )
                        real = jnp.einsum(
                            "cxso,o->cxs", oh_new.astype(jnp.float32),
                            real_o,
                        )
                        gate = (n_at > 0).astype(jnp.float32) * real[
                            ..., None
                        ]
                        contrib = dmn / jnp.maximum(n_at, 1.0) * gate
                        a_oh = (
                            al_at[..., None]
                            == jnp.arange(
                                mac_pre["a_cap"], dtype=jnp.float32
                            )
                        ).astype(jnp.float32)              # [C,ch,S,V,A]
                        return contrib[..., None] * a_oh

                    d_extra = _slot_extra(
                        mac_pre["oa_oh"], mac_pre["real_oa"]
                    ) + _slot_extra(mac_pre["ob_oh"], mac_pre["real_ob"])
                    collect_f = (t >= cfg0.burn_in).astype(jnp.float32)
                    new_mac_list.append(
                        mac_list[l] + collect_f * d_extra
                    )
                else:
                    new_mac_list.append(mac_list[l])
            else:
                new_mac_list.append(mac_list[l])

            pad_c = c_max - c
            o_row = o_sel if pad_c == 0 else jnp.pad(
                o_sel, ((0, pad_c), (0, 0), (0, 0))
            )
            o_stack = o_stack.at[l].set(o_row)

            collect = (t >= cfg0.burn_in).astype(jnp.int32)
            onehot = (
                jnp.arange(o, dtype=jnp.int32)[None, None, None, :]
                == o_sel[..., None]
            ).astype(jnp.int32)
            new_tally_list.append(tally_list[l] + collect * onehot)
            new_freqs_list.append(new_freqs)
        return (
            tuple(new_freqs_list), tuple(new_tally_list), o_stack, pool,
            tuple(new_mac_list),
        ), None

    tally0 = tuple(
        jnp.zeros(
            (b.num_clusters, num_chains, b.num_samples,
             outcomes_list[l].num_outcomes),
            jnp.int32,
        )
        for l, b in enumerate(buckets)
    )
    freqs0 = tuple(pre["freqs0"] for pre in precomp)
    # Initial outcomes: UNIFORM over each cluster's chromosome-ploidy-valid
    # outcomes, per (cluster, chain, sample). The reference randomises the
    # sibling update ORDER each iteration (shuffleBranchOrdering,
    # VariantClusterGroup.cpp:208-218); with one compiled level order that
    # shuffle is not expressible, and a deterministic null start would let
    # the first-ranked sibling of a symmetric shared-kmer family absorb all
    # the evidence in EVERY chain (systematic mode collapse). Random inits
    # split the chains across the posterior modes instead — a valid
    # initialisation of the same sampler, and the across-chain tally then
    # reflects the multimodal posterior like the reference's shuffled scan
    # does (tests/test_coupling_adversarial.py pins both the exactness and
    # the symmetric-family behaviour).
    o_inits = []
    for l in range(num_levels):
        bucket = buckets[l]
        o_l = outcomes_list[l].num_outcomes
        pm = jnp.asarray(outcomes_list[l].ploidy_mask)      # [3, O]
        valid = pm[bucket.ploidy.astype(jnp.int32)]         # [C, S, O]
        logits = jnp.where(valid, 0.0, NEG_INF)
        k_init = jax.random.fold_in(
            jax.random.fold_in(base_key, jnp.uint32(l)),
            jnp.uint32(0x696E6974),  # "init"
        )

        def per_cluster(cid, lg):
            kc = jax.random.fold_in(k_init, cid.astype(jnp.uint32))
            return jax.vmap(
                lambda ch: _sample_outcomes(
                    jax.random.fold_in(kc, ch), lg
                )
            )(jnp.arange(num_chains, dtype=jnp.uint32))     # [ch, S]

        o_init = jax.vmap(per_cluster)(
            bucket.cluster_id, logits
        )                                                    # [C, ch, S]
        o_init = jnp.where(
            bucket.cluster_valid[:, None, None], o_init, o_l - 1
        )
        o_inits.append(o_init)
    o_stack0 = jnp.stack([
        o_inits[l] if buckets[l].num_clusters == c_max else jnp.pad(
            o_inits[l],
            ((0, c_max - buckets[l].num_clusters), (0, 0), (0, 0)),
            constant_values=outcomes_list[l].num_outcomes - 1,
        )
        for l in range(num_levels)
    ])
    # pool seeded with every cluster's initial-outcome contributions
    pool0 = jnp.zeros((max(num_pool, 1), num_chains, s), jnp.float32)
    for l in range(num_levels):
        sh = precomp[l].get("sh")
        if sh is None:
            continue
        o_l = outcomes_list[l].num_outcomes
        oh0 = jax.nn.one_hot(o_inits[l], o_l, dtype=jnp.bfloat16)
        own0 = jnp.einsum(
            "cqo,cxso->cqxs", sh["dip"].astype(jnp.bfloat16), oh0,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        own0 = jnp.where(sh["valid"][:, :, None, None], own0, 0.0)
        pool0 = pool0 + jnp.einsum(
            "cqxs,cqp->pxs", own0,
            jax.nn.one_hot(sh["slot"], pool0.shape[0], dtype=jnp.bfloat16),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    pool0 = pool0.astype(jnp.int32)
    mac0 = tuple(
        jnp.zeros(
            (buckets[l].num_clusters, num_chains, buckets[l].num_samples,
             buckets[l].num_variants, precomp[l]["mac"]["a_cap"]),
            jnp.float32,
        )
        if "mac" in precomp[l]
        else jnp.zeros((), jnp.float32)
        for l in range(num_levels)
    )
    (_, tallies, _, _, mac_acc), _ = jax.lax.scan(
        step, (freqs0, tally0, o_stack0, pool0, mac0),
        jnp.arange(num_iters, dtype=jnp.int32),
        unroll=SCAN_UNROLL,
    )
    mac_extras = tuple(
        mac_acc[l].sum(axis=1) if "mac" in precomp[l] else None
        for l in range(num_levels)
    )
    return tallies, tuple(pre["w"] for pre in precomp), mac_extras


@functools.partial(
    jax.jit,
    static_argnames=("outcomes_list", "cfgs", "num_chains", "axis_name"),
)
def noise_chains_multi(base_key, buckets, tables, init_rates, noise_prior,
                       outcomes_list, cfgs, num_chains, chain0=0,
                       axis_name: str | None = None):
    """ALL noise-estimation chains over MULTIPLE size-class buckets in ONE
    compiled program.

    The reference estimates noise from every single-cluster group regardless
    of size (InferenceEngine.cpp:141-151) and runs its chains sequentially.
    Padding all size classes into one superset bucket would cost
    O(C_total * K_max * H_max); instead each class keeps its own dense bucket
    and the per-iteration gamma update pools the zero-multiplicity sufficient
    statistics across classes (and across the mesh via psum), so the coupling
    is exact while the compute stays per-class-sized. Chains are batched on a
    leading axis of every per-chain tensor: the expensive count-table gathers
    in compute_log_likelihoods are chain-independent and amortise across all
    chains, and the 350-step scan runs once at chain width instead of
    `num_chains` times at width 1 (the scan is latency-bound, so this is a
    near-num_chains-x wall-clock win). Each chain's RNG stream is derived
    exactly as the sequential implementation derived it
    (fold_in(base_key, chain_idx) and onward), so per-chain draws are
    unchanged.

    Args:
      buckets: tuple of ClusterBucket (one per size class).
      init_rates: [num_chains, S] per-chain starting rates.
      outcomes_list: tuple of OutcomeSpace matching buckets.
      cfgs: tuple of GibbsConfig matching buckets (burn_in/num_samples are
        taken from cfgs[0]; max_total_mult/apply_cap are per bucket).
      num_chains: static chain count; chain indices are chain0..chain0+n-1.
    Returns (rate_sum [num_chains, S], trace [num_chains, iters, S]).
    """
    num_iters = cfgs[0].burn_in + cfgs[0].num_samples
    prior_shape, prior_scale = noise_prior
    chain_ids = chain0 + jnp.arange(num_chains, dtype=jnp.uint32)
    k_master = jax.vmap(lambda ci: jax.random.fold_in(base_key, ci))(
        chain_ids
    )  # [ch, 2]
    k_noise = jax.vmap(
        lambda km: jax.random.fold_in(km, jnp.uint32(0x6E6F6973))  # "nois"
    )(k_master)

    setups = []
    for bi, (bucket, outcomes, cfg) in enumerate(
        zip(buckets, outcomes_list, cfgs)
    ):
        def per_chain_w(km, bucket=bucket, cfg=cfg):
            # draws are keyed per cluster inside _subsample_with_cap, so no
            # bucket-index fold: a cluster's subset is independent of which
            # chunk/class bucket it landed in
            k_sub, k_chain = jax.random.split(km)
            return _subsample_with_cap(k_sub, bucket, 1, cfg)[:, 0], k_chain

        w_ch, k_chain_ch = jax.vmap(per_chain_w)(k_master)  # [ch,C,K], [ch,2]
        w = jnp.transpose(w_ch, (1, 0, 2))  # [C, ch, K]
        # chain-independent gathers inside are computed once; only the final
        # contraction carries the chain axis
        llg = compute_log_likelihoods(
            bucket, outcomes, tables, w, cfg.max_total_mult,
            include_noise_row=False, has_inter=cfg.has_inter,
        )  # [C, ch, S, O]
        a, b, c0 = compute_noise_terms(bucket, outcomes, w, cfg.has_inter)
        ll_mask = jnp.ones_like(llg).at[..., -1].set(0.0)
        # fold the constant c0 into llg; keep b as u16 (see noise_chain)
        llg = llg - c0 * ll_mask
        b = b.astype(jnp.uint16)
        osp = (
            jnp.asarray(outcomes.oa),
            jnp.asarray(outcomes.ob),
            jnp.asarray(outcomes.het_bonus),
            jnp.asarray(outcomes.ploidy_mask),
        )
        cluster_keys = jax.vmap(
            lambda kc: jax.vmap(
                lambda cid: jax.random.fold_in(
                    jax.random.fold_in(kc, cid.astype(jnp.uint32)), 0
                )
            )(bucket.cluster_id)
        )(k_chain_ch)  # [ch, C, 2]
        cluster_keys = jnp.transpose(cluster_keys, (1, 0, 2))  # [C, ch, 2]
        hv = bucket.hap_valid
        nh = jnp.sum(hv, axis=1, keepdims=True).astype(jnp.float32)
        freqs0 = jnp.where(hv, 1.0 / jnp.maximum(nh, 1.0), 0.0)  # [C, H]
        freqs0 = jnp.broadcast_to(
            freqs0[:, None, :],
            (bucket.num_clusters, num_chains, bucket.num_haplotypes),
        )
        cv = bucket.cluster_valid.astype(jnp.float32)
        setups.append(
            dict(bucket=bucket, llg=llg, a=a, b=b, ll_mask=ll_mask,
                 osp=osp, cluster_keys=cluster_keys, freqs0=freqs0, cv=cv)
        )

    def step(carry, t):
        freqs_list, rates = carry  # rates: [ch, S]
        log_r = jnp.log(jnp.maximum(rates, 1e-30))
        count_sum = jnp.zeros(rates.shape, jnp.int32)
        num_obs = jnp.zeros(rates.shape, jnp.int32)
        new_freqs_list = []
        for su, freqs in zip(setups, freqs_list):
            ll = su["llg"] + (
                su["a"] * log_r[None, :, :, None]
                - su["b"].astype(jnp.float32) * rates[None, :, :, None]
            ) * su["ll_mask"]

            def per_cc(ck, f, llcc, ploidy, hvc, sp, usp, osp=su["osp"]):
                key = jax.random.fold_in(ck, t.astype(jnp.uint32))
                return _gibbs_iteration(key, f, llcc, ploidy, hvc, sp, usp, osp)

            bucket = su["bucket"]
            new_freqs, o_sel = jax.vmap(  # over clusters
                jax.vmap(per_cc, in_axes=(0, 0, 0, None, None, None, None)),
                in_axes=(0, 0, 0, 0, 0, 0, 0),
            )(su["cluster_keys"], freqs, ll, bucket.ploidy,
              bucket.hap_valid, bucket.sparsity, bucket.use_sparse)
            # o_sel: [C, ch, S]
            a_sel = _select_outcome(su["a"], o_sel)
            b_sel = _select_outcome(su["b"], o_sel)
            # int32: exact, order-independent (see noise_chain)
            count_sum = count_sum + jnp.sum(
                (a_sel * su["cv"][:, None, None]).astype(jnp.int32), axis=0
            )
            num_obs = num_obs + jnp.sum(
                (b_sel * su["cv"][:, None, None]).astype(jnp.int32), axis=0
            )
            new_freqs_list.append(new_freqs)

        if axis_name is not None:
            count_sum = jax.lax.psum(count_sum, axis_name)
            num_obs = jax.lax.psum(num_obs, axis_name)

        from ..ops.sampling import fixed_round_gamma
        shape = prior_shape + count_sum        # [ch, S]
        scale = prior_scale / (num_obs * prior_scale + 1.0)

        def per_chain_rates(kn, sh):
            k_it = jax.random.fold_in(kn, t.astype(jnp.uint32))
            return fixed_round_gamma(k_it, sh)

        new_rates = jax.vmap(per_chain_rates)(k_noise, shape) * scale

        collect = (t >= cfgs[0].burn_in).astype(jnp.float32)
        return (tuple(new_freqs_list), new_rates), (new_rates, collect)

    freqs0_list = tuple(su["freqs0"] for su in setups)
    (_, _), (trace, collected) = jax.lax.scan(
        step, (freqs0_list, init_rates), jnp.arange(num_iters, dtype=jnp.int32),
        unroll=SCAN_UNROLL,
    )
    # trace: [iters, ch, S] -> [ch, iters, S]
    trace = jnp.transpose(trace, (1, 0, 2))
    rate_sum = jnp.sum(trace * collected[None, :, None], axis=1)
    return rate_sum, trace


def noise_chain_multi(base_key, buckets, tables, init_rates, noise_prior,
                      outcomes_list, cfgs, chain_idx,
                      axis_name: str | None = None):
    """One noise chain over multiple size-class buckets — the single-chain
    view of noise_chains_multi (identical RNG stream and results)."""
    rate_sum, trace = noise_chains_multi(
        base_key, buckets, tables, init_rates[None], noise_prior,
        outcomes_list, cfgs, num_chains=1, chain0=chain_idx,
        axis_name=axis_name,
    )
    return rate_sum[0], trace[0]


@functools.partial(
    jax.jit,
    static_argnames=("outcomes_list", "cfgs", "num_chains", "axis_name"),
)
def joint_chains_multi(base_key, buckets, tables, init_rates, noise_prior,
                       outcomes_list, cfgs, num_chains, chain0=0,
                       axis_name: str | None = None):
    """ALL joint noise+genotyping chains over MULTIPLE size-class buckets in
    ONE compiled program (--noise-genotyping, estimateNoiseAndGenotypes
    InferenceEngine.cpp:384-472).

    Like noise_chains_multi — every iteration all clusters of every size
    class draw diplotypes under the current per-chain noise rates and the
    gamma update pools the zero-multiplicity sufficient statistics across
    classes — but additionally collects post-burn-in outcome tallies per
    bucket for genotype estimation. Per-class buckets keep the memory at
    sum_class(C*K*H) instead of C_total*K_max*H_max while the per-iteration
    noise coupling stays exact inside one compiled scan; chains batch on a
    leading axis so the count-table gathers amortise and the scan runs once
    at chain width. Per-chain RNG streams match the sequential formulation
    (fold_in(base_key, chain_idx) and onward) exactly.

    Args:
      init_rates: [num_chains, S] per-chain starting rates.
    Returns (tallies, ws, rate_trace): tuples per bucket — tally
    [C, num_chains, S, O_b] int32, w [C, num_chains, K_b] bool — plus the
    [num_chains, iters, S] rate trace.
    """
    num_iters = cfgs[0].burn_in + cfgs[0].num_samples
    prior_shape, prior_scale = noise_prior
    chain_ids = chain0 + jnp.arange(num_chains, dtype=jnp.uint32)
    k_master = jax.vmap(lambda ci: jax.random.fold_in(base_key, ci))(
        chain_ids
    )  # [ch, 2]
    k_noise = jax.vmap(
        lambda km: jax.random.fold_in(km, jnp.uint32(0x6E6F6973))  # "nois"
    )(k_master)

    setups = []
    for bi, (bucket, outcomes, cfg) in enumerate(
        zip(buckets, outcomes_list, cfgs)
    ):
        def per_chain_w(km, bucket=bucket, cfg=cfg):
            # draws are keyed per cluster inside _subsample_with_cap, so no
            # bucket-index fold: a cluster's subset is independent of which
            # chunk/class bucket it landed in
            k_sub, k_chain = jax.random.split(km)
            return _subsample_with_cap(k_sub, bucket, 1, cfg)[:, 0], k_chain

        w_ch, k_chain_ch = jax.vmap(per_chain_w)(k_master)
        w = jnp.transpose(w_ch, (1, 0, 2))  # [C, ch, K]
        llg = compute_log_likelihoods(
            bucket, outcomes, tables, w, cfg.max_total_mult,
            include_noise_row=False, has_inter=cfg.has_inter,
        )  # [C, ch, S, O]
        a, b, c0 = compute_noise_terms(bucket, outcomes, w, cfg.has_inter)
        ll_mask = jnp.ones_like(llg).at[..., -1].set(0.0)
        # fold the constant c0 into llg; keep b as u16 (see noise_chain)
        llg = llg - c0 * ll_mask
        b = b.astype(jnp.uint16)
        osp = (
            jnp.asarray(outcomes.oa),
            jnp.asarray(outcomes.ob),
            jnp.asarray(outcomes.het_bonus),
            jnp.asarray(outcomes.ploidy_mask),
        )
        cluster_keys = jax.vmap(
            lambda kc: jax.vmap(
                lambda cid: jax.random.fold_in(
                    jax.random.fold_in(kc, cid.astype(jnp.uint32)), 0
                )
            )(bucket.cluster_id)
        )(k_chain_ch)
        cluster_keys = jnp.transpose(cluster_keys, (1, 0, 2))  # [C, ch, 2]
        hv = bucket.hap_valid
        nh = jnp.sum(hv, axis=1, keepdims=True).astype(jnp.float32)
        freqs0 = jnp.where(hv, 1.0 / jnp.maximum(nh, 1.0), 0.0)
        freqs0 = jnp.broadcast_to(
            freqs0[:, None, :],
            (bucket.num_clusters, num_chains, bucket.num_haplotypes),
        )
        cv = bucket.cluster_valid.astype(jnp.float32)
        setups.append(
            dict(bucket=bucket, w=w, llg=llg, a=a, b=b,
                 ll_mask=ll_mask, osp=osp, cluster_keys=cluster_keys,
                 freqs0=freqs0, cv=cv,
                 num_outcomes=outcomes.num_outcomes)
        )

    def step(carry, t):
        freqs_list, rates, tally_list = carry  # rates: [ch, S]
        log_r = jnp.log(jnp.maximum(rates, 1e-30))
        count_sum = jnp.zeros(rates.shape, jnp.int32)
        num_obs = jnp.zeros(rates.shape, jnp.int32)
        new_freqs_list, new_tally_list = [], []
        collect = (t >= cfgs[0].burn_in).astype(jnp.int32)
        for su, freqs, tally in zip(setups, freqs_list, tally_list):
            ll = su["llg"] + (
                su["a"] * log_r[None, :, :, None]
                - su["b"].astype(jnp.float32) * rates[None, :, :, None]
            ) * su["ll_mask"]

            def per_cc(ck, f, llcc, ploidy, hvc, sp, usp, osp=su["osp"]):
                key = jax.random.fold_in(ck, t.astype(jnp.uint32))
                return _gibbs_iteration(key, f, llcc, ploidy, hvc, sp, usp, osp)

            bucket = su["bucket"]
            new_freqs, o_sel = jax.vmap(  # over clusters
                jax.vmap(per_cc, in_axes=(0, 0, 0, None, None, None, None)),
                in_axes=(0, 0, 0, 0, 0, 0, 0),
            )(su["cluster_keys"], freqs, ll, bucket.ploidy,
              bucket.hap_valid, bucket.sparsity, bucket.use_sparse)
            # o_sel: [C, ch, S]
            a_sel = _select_outcome(su["a"], o_sel)
            b_sel = _select_outcome(su["b"], o_sel)
            # int32: exact, order-independent (see noise_chain)
            count_sum = count_sum + jnp.sum(
                (a_sel * su["cv"][:, None, None]).astype(jnp.int32), axis=0
            )
            num_obs = num_obs + jnp.sum(
                (b_sel * su["cv"][:, None, None]).astype(jnp.int32), axis=0
            )
            onehot = (
                jnp.arange(su["num_outcomes"], dtype=jnp.int32)[
                    None, None, None, :
                ]
                == o_sel[..., None]
            ).astype(jnp.int32)
            new_tally_list.append(tally + collect * onehot)
            new_freqs_list.append(new_freqs)

        if axis_name is not None:
            count_sum = jax.lax.psum(count_sum, axis_name)
            num_obs = jax.lax.psum(num_obs, axis_name)

        from ..ops.sampling import fixed_round_gamma
        shape = prior_shape + count_sum
        scale = prior_scale / (num_obs * prior_scale + 1.0)

        def per_chain_rates(kn, sh):
            k_it = jax.random.fold_in(kn, t.astype(jnp.uint32))
            return fixed_round_gamma(k_it, sh)

        new_rates = jax.vmap(per_chain_rates)(k_noise, shape) * scale

        return (
            tuple(new_freqs_list), new_rates, tuple(new_tally_list)
        ), new_rates

    tally0 = tuple(
        jnp.zeros(
            (su["bucket"].num_clusters, num_chains,
             su["bucket"].num_samples, su["num_outcomes"]),
            jnp.int32,
        )
        for su in setups
    )
    freqs0_list = tuple(su["freqs0"] for su in setups)
    (_, _, tallies), trace = jax.lax.scan(
        step, (freqs0_list, init_rates, tally0),
        jnp.arange(num_iters, dtype=jnp.int32),
        unroll=SCAN_UNROLL,
    )
    # trace: [iters, ch, S] -> [ch, iters, S]
    return tallies, tuple(su["w"] for su in setups), jnp.transpose(
        trace, (1, 0, 2)
    )


# ---------------------------------------------------------------------------
# chunk-stacked programs: B same-class cluster chunks through ONE scan body
# ---------------------------------------------------------------------------
#
# Round-3 measurement: each tuple element of the *_multi programs compiles
# its own sub-body, so B same-shape chunks cost a B-times-larger executable
# and a fresh minutes-long remote compile per distinct composition (the
# 72 MB-executable tunnel wedge, STATUS r3).  Chunks of one size class are
# SHAPE-IDENTICAL, and every per-cluster stream is keyed on cluster_id —
# so they can ride a new leading [B] axis with the iteration body vmapped
# over it: one compiled body for any B, bit-identical per-cluster results
# (tests/test_gibbs_stacked.py).  The expensive precompute
# (compute_log_likelihoods materialises multi-GB one-hot temps per chunk)
# runs through lax.map, i.e. sequentially over B, so peak HBM stays at one
# chunk's working set while the latency-bound 350-step scan runs at full
# stacked width.


def _osp_arrays(outcomes: OutcomeSpace):
    return (
        jnp.asarray(outcomes.oa),
        jnp.asarray(outcomes.ob),
        jnp.asarray(outcomes.het_bonus),
        jnp.asarray(outcomes.ploidy_mask),
    )


def _freqs0(bucket, num_chains):
    """Per-chain uniform initial frequencies over real haplotypes."""
    hv = bucket.hap_valid
    nh = jnp.sum(hv, axis=1, keepdims=True).astype(jnp.float32)
    f0 = jnp.where(hv, 1.0 / jnp.maximum(nh, 1.0), 0.0)
    return jnp.broadcast_to(
        f0[:, None, :],
        (bucket.num_clusters, num_chains, bucket.num_haplotypes),
    )


# (S, O) flattening threshold for the scan-resident arrays: SMALL outcome
# spaces flatten (a minor dim of ~78-200 pads ~1.6-10x under the TPU's
# (8, 128) tiling — the round-4 HBM ceiling), but for LARGE O the minor dim
# is already tile-sized and the flat layout forced a physical relayout of
# every [.., S, O] view INSIDE the scan step (profiled round 5: the
# reshape/copy pair was ~25% of the H64-class step). Keep O >= this
# threshold in natural [.., S, O] layout.
_FLAT_SO_MAX_O = 512


@functools.partial(jax.jit, static_argnames=("outcomes", "cfg"))
def genotype_stacked(base_key, sbucket, tables, outcomes: OutcomeSpace,
                     cfg: GibbsConfig):
    """Frozen-noise genotyping of a [B]-stacked bucket of same-class chunks.

    Per-cluster results are bit-identical to per-chunk genotype_bucket calls
    (streams are cluster-keyed; stacking is purely a scheduling decision).

    Returns (tally [B, C, ch, S, O] int32, w [B, C, ch, K] bool).
    """
    num_iters = cfg.burn_in + cfg.num_samples
    o = outcomes.num_outcomes
    osp = _osp_arrays(outcomes)
    b, c = sbucket.mult.shape[:2]
    s = sbucket.counts.shape[3]
    flat_so = o < _FLAT_SO_MAX_O

    def pre(bucket_b):
        k_sub, k_chain = jax.random.split(base_key)
        w = _subsample_with_cap(k_sub, bucket_b, cfg.num_chains, cfg)
        ll = compute_log_likelihoods(
            bucket_b, outcomes, tables, w, cfg.max_total_mult,
            include_noise_row=True, has_inter=cfg.has_inter,
        )
        # the scan-resident LL of SMALL outcome spaces is stored with
        # (S, O) FLATTENED: tiny minor dims pad up to ~20x under the TPU's
        # (8, 128) tiling, and the padded ll+tally carries were the stacked
        # program's HBM ceiling (B=16 bulk groups OOMed). S*O ~ 78-128
        # keeps padding ~1x; the per-step reshape back to [S, O] is a fused
        # index remap there. LARGE O stays in natural layout — see
        # _FLAT_SO_MAX_O.
        if flat_so:
            ll = ll.reshape(ll.shape[0], cfg.num_chains, s * o)
        chain_keys = _chain_keys(k_chain, bucket_b.cluster_id, cfg.num_chains)
        return w, ll, chain_keys, _freqs0(bucket_b, cfg.num_chains)

    w, ll, chain_keys, freqs0 = jax.lax.map(pre, sbucket)

    def iteration(freqs, t):
        def per_cc(ck, f, ll_v, ploidy, hvc, sp, usp):
            key = jax.random.fold_in(ck, t.astype(jnp.uint32))
            return _gibbs_iteration(
                key, f, ll_v.reshape(s, o) if flat_so else ll_v,
                ploidy, hvc, sp, usp, osp
            )

        per_cluster = jax.vmap(  # over chains
            per_cc, in_axes=(0, 0, 0, None, None, None, None)
        )
        return jax.vmap(jax.vmap(  # over chunks, clusters
            per_cluster, in_axes=(0, 0, 0, 0, 0, 0, 0)
        ))(chain_keys, freqs, ll, sbucket.ploidy, sbucket.hap_valid,
           sbucket.sparsity, sbucket.use_sparse)

    if flat_so:
        # u16 accumulation: tallies max out at num_samples iterations
        # (<= 250), and the tally carry is the second-largest scan-
        # resident array — u16 halves its per-step read+write traffic.
        # Values are exact; the result is cast to int32 after the scan.
        def step(carry, t):
            freqs, tally = carry
            new_freqs, o_sel = iteration(freqs, t)
            collect = (t >= cfg.burn_in).astype(jnp.uint16)
            onehot = (
                jnp.arange(o, dtype=jnp.int32) == o_sel[..., None]
            ).astype(jnp.uint16).reshape(b, c, cfg.num_chains, s * o)
            return (new_freqs, tally + collect * onehot), None

        tally0 = jnp.zeros((b, c, cfg.num_chains, s * o), jnp.uint16)
        (_, tally), _ = jax.lax.scan(
            step, (freqs0, tally0), jnp.arange(num_iters, dtype=jnp.int32),
            unroll=SCAN_UNROLL,
        )
        tally = tally.reshape(b, c, cfg.num_chains, s, o).astype(jnp.int32)
        return tally, w

    # large outcome spaces: the per-step [.., O] tally one-hot write was
    # ~20% of the H64-class step; emit the sampled outcome indices instead
    # (i16, tiny) and build the tally POST-scan with one scatter-add over
    # the collected iterations. Identical integer tallies.
    def step_o(freqs, t):
        new_freqs, o_sel = iteration(freqs, t)
        return new_freqs, o_sel.astype(jnp.int16)

    _, o_hist = jax.lax.scan(
        step_o, freqs0, jnp.arange(num_iters, dtype=jnp.int32),
        unroll=SCAN_UNROLL,
    )                                         # [T, B, C, ch, S] i16
    sel = o_hist[cfg.burn_in :].astype(jnp.int32)
    npts = b * c * cfg.num_chains * s
    base = jnp.arange(npts, dtype=jnp.int32) * o
    idx = (sel.reshape(sel.shape[0], npts) + base[None]).reshape(-1)
    tally = jnp.zeros((npts * o,), jnp.int32).at[idx].add(1)
    return tally.reshape(b, c, cfg.num_chains, s, o), w


def _noise_setup_stacked(base_key, k_master, sbucket, tables, outcomes, cfg,
                         num_chains):
    """Per-class stacked precompute for the noise/joint chain programs.

    lax.map over the chunk axis: one chunk's one-hot temps at a time."""
    def pre(bucket_b):
        def per_chain_w(km):
            # draws are keyed per cluster inside _subsample_with_cap, so no
            # bucket/chunk-index fold: a cluster's subset is independent of
            # which chunk it landed in
            k_sub, k_chain = jax.random.split(km)
            return _subsample_with_cap(k_sub, bucket_b, 1, cfg)[:, 0], k_chain

        w_ch, k_chain_ch = jax.vmap(per_chain_w)(k_master)  # [ch,C,K],[ch,2]
        w = jnp.transpose(w_ch, (1, 0, 2))  # [C, ch, K]
        llg = compute_log_likelihoods(
            bucket_b, outcomes, tables, w, cfg.max_total_mult,
            include_noise_row=False, has_inter=cfg.has_inter,
        )
        a, b_, c0 = compute_noise_terms(bucket_b, outcomes, w, cfg.has_inter)
        cluster_keys = jax.vmap(
            lambda kc: jax.vmap(
                lambda cid: jax.random.fold_in(
                    jax.random.fold_in(kc, cid.astype(jnp.uint32)), 0
                )
            )(bucket_b.cluster_id)
        )(k_chain_ch)  # [ch, C, 2]
        cluster_keys = jnp.transpose(cluster_keys, (1, 0, 2))  # [C, ch, 2]
        return w, llg, a, b_, c0, cluster_keys, _freqs0(bucket_b, num_chains)

    w, llg, a, b_, c0, cluster_keys, freqs0 = jax.lax.map(pre, sbucket)
    # (S, O) flattened for SMALL outcome spaces — see genotype_stacked:
    # padded tiny minor dims were the stacked programs' HBM ceiling; large
    # O stays natural (_FLAT_SO_MAX_O)
    bb, cc = llg.shape[:2]
    s = sbucket.counts.shape[3]  # stacked layout [B, C, K, S]
    o = outcomes.num_outcomes
    flat_so = o < _FLAT_SO_MAX_O
    if flat_so:
        flat = lambda x: x.reshape(bb, cc, num_chains, s * o)
        null_mask = jnp.arange(s * o) % o == o - 1
    else:
        flat = lambda x: x
        null_mask = jnp.arange(o) == o - 1
    # fold the constant c0 into llg (identical bits to the *_multi fold:
    # c0*mask == where(null, 0, c0)); b as u16 — together the scan-resident
    # per-chain state drops from 16 to 10 bytes/element, which is what lets
    # all 20 noise chains fit ONE program at the 100k-variant batch
    llg_f = flat(llg) - jnp.where(null_mask, 0.0, flat(c0))
    return dict(
        sbucket=sbucket, w=w, llg=llg_f, a=flat(a),
        b=flat(b_).astype(jnp.uint16), cluster_keys=cluster_keys,
        freqs0=freqs0, osp=_osp_arrays(outcomes), num_outcomes=o,
        num_samples=s, null_mask=null_mask, flat_so=flat_so,
    )


def _noise_ll_stacked(su, log_r, rates):
    """Per-iteration noise log-likelihood for one stacked class: llg (c0
    pre-folded) + a*log(r) - b*r with the null outcome zeroed — in the
    class's flat or natural (S, O) layout."""
    s, o = su["num_samples"], su["num_outcomes"]
    ch = rates.shape[0]
    if su["flat_so"]:
        log_r_f = jnp.broadcast_to(
            log_r[:, :, None], (ch, s, o)
        ).reshape(ch, s * o)[None, None]
        rates_f = jnp.broadcast_to(
            rates[:, :, None], (ch, s, o)
        ).reshape(ch, s * o)[None, None]
    else:
        log_r_f = log_r[None, None, :, :, None]
        rates_f = rates[None, None, :, :, None]
    noise_part = (
        su["a"] * log_r_f - su["b"].astype(jnp.float32) * rates_f
    )
    # null-outcome entries zeroed via the mask — matches the *_multi
    # ll_mask multiply exactly (masked entries exactly 0.0)
    noise_part = jnp.where(su["null_mask"], 0.0, noise_part)
    return su["llg"] + noise_part


def _ab_so(su, rates):
    """a/b viewed as [B, C, ch, S, O] for the sufficient-statistic select."""
    s, o = su["num_samples"], su["num_outcomes"]
    ch = rates.shape[0]
    if su["flat_so"]:
        bb, cc = su["a"].shape[:2]
        return (
            su["a"].reshape(bb, cc, ch, s, o),
            su["b"].reshape(bb, cc, ch, s, o),
        )
    return su["a"], su["b"]


def _stacked_class_step(su, freqs, t, ll_flat):
    """One Gibbs iteration for every (chunk, cluster, chain) of one class.
    ll_flat is [B, C, ch, S*O] for small-O classes (the [S, O] view is a
    fused index remap) or natural [B, C, ch, S, O] for large-O classes."""
    s, o = su["num_samples"], su["num_outcomes"]
    flat_so = su["flat_so"]

    def per_cc(ck, f, llcc, ploidy, hvc, sp, usp, osp=su["osp"]):
        key = jax.random.fold_in(ck, t.astype(jnp.uint32))
        return _gibbs_iteration(
            key, f, llcc.reshape(s, o) if flat_so else llcc,
            ploidy, hvc, sp, usp, osp
        )

    sbucket = su["sbucket"]
    per_cluster = jax.vmap(per_cc, in_axes=(0, 0, 0, None, None, None, None))
    return jax.vmap(jax.vmap(  # over chunks, clusters
        per_cluster, in_axes=(0, 0, 0, 0, 0, 0, 0)
    ))(su["cluster_keys"], freqs, ll_flat, sbucket.ploidy, sbucket.hap_valid,
       sbucket.sparsity, sbucket.use_sparse)


@functools.partial(
    jax.jit,
    static_argnames=("outcomes_list", "cfgs", "num_chains", "axis_name"),
)
def noise_chains_stacked(base_key, sbuckets, noise_valids, tables, init_rates,
                         noise_prior, outcomes_list, cfgs, num_chains,
                         chain0=0, axis_name: str | None = None):
    """ALL noise chains over MULTIPLE size classes, each class a [B]-stacked
    bucket, in ONE compiled program with one scan body per class.

    Identical semantics to noise_chains_multi (per-chain RNG streams, the
    exact int32 pooled gamma update, chain batching) with the chunk axis
    vmapped instead of unrolled into B sub-bodies.

    Args:
      sbuckets: tuple of stacked ClusterBucket, one per size class.
      noise_valids: tuple of [B, C] bool — clusters contributing noise
        sufficient statistics. The noise pool is single-cluster groups only
        (InferenceEngine.cpp:141-151); chunks are SHARED with the genotype
        wave plan, so multi-cluster-group members ride along masked here
        (their draws touch nothing: contributions are gated by this mask
        and clusters are otherwise independent under frozen tables).
    Returns (rate_sum [num_chains, S], trace [num_chains, iters, S]).
    """
    num_iters = cfgs[0].burn_in + cfgs[0].num_samples
    prior_shape, prior_scale = noise_prior
    chain_ids = chain0 + jnp.arange(num_chains, dtype=jnp.uint32)
    k_master = jax.vmap(lambda ci: jax.random.fold_in(base_key, ci))(
        chain_ids
    )  # [ch, 2]
    k_noise = jax.vmap(
        lambda km: jax.random.fold_in(km, jnp.uint32(0x6E6F6973))  # "nois"
    )(k_master)

    setups = []
    for sbucket, nv, outcomes, cfg in zip(
        sbuckets, noise_valids, outcomes_list, cfgs
    ):
        su = _noise_setup_stacked(
            base_key, k_master, sbucket, tables, outcomes, cfg, num_chains
        )
        su["cv"] = nv.astype(jnp.float32)  # [B, C]
        setups.append(su)

    def step(carry, t):
        freqs_list, rates = carry  # rates: [ch, S]
        log_r = jnp.log(jnp.maximum(rates, 1e-30))
        count_sum = jnp.zeros(rates.shape, jnp.int32)
        num_obs = jnp.zeros(rates.shape, jnp.int32)
        new_freqs_list = []
        for su, freqs in zip(setups, freqs_list):
            ll = _noise_ll_stacked(su, log_r, rates)
            new_freqs, o_sel = _stacked_class_step(su, freqs, t, ll)
            # o_sel: [B, C, ch, S]
            a_so, b_so = _ab_so(su, rates)
            a_sel = _select_outcome(a_so, o_sel)
            b_sel = _select_outcome(b_so, o_sel)
            # int32: exact, order-independent (see noise_chain)
            count_sum = count_sum + jnp.sum(
                (a_sel * su["cv"][:, :, None, None]).astype(jnp.int32),
                axis=(0, 1),
            )
            num_obs = num_obs + jnp.sum(
                (b_sel * su["cv"][:, :, None, None]).astype(jnp.int32),
                axis=(0, 1),
            )
            new_freqs_list.append(new_freqs)

        if axis_name is not None:
            count_sum = jax.lax.psum(count_sum, axis_name)
            num_obs = jax.lax.psum(num_obs, axis_name)

        from ..ops.sampling import fixed_round_gamma
        shape = prior_shape + count_sum        # [ch, S]
        scale = prior_scale / (num_obs * prior_scale + 1.0)

        def per_chain_rates(kn, sh):
            k_it = jax.random.fold_in(kn, t.astype(jnp.uint32))
            return fixed_round_gamma(k_it, sh)

        new_rates = jax.vmap(per_chain_rates)(k_noise, shape) * scale

        collect = (t >= cfgs[0].burn_in).astype(jnp.float32)
        return (tuple(new_freqs_list), new_rates), (new_rates, collect)

    freqs0_list = tuple(su["freqs0"] for su in setups)
    (_, _), (trace, collected) = jax.lax.scan(
        step, (freqs0_list, init_rates), jnp.arange(num_iters, dtype=jnp.int32),
        unroll=SCAN_UNROLL,
    )
    trace = jnp.transpose(trace, (1, 0, 2))  # [ch, iters, S]
    rate_sum = jnp.sum(trace * collected[None, :, None], axis=1)
    return rate_sum, trace


@functools.partial(
    jax.jit,
    static_argnames=("outcomes_list", "cfgs", "num_chains", "axis_name"),
)
def joint_chains_stacked(base_key, sbuckets, tables, init_rates, noise_prior,
                         outcomes_list, cfgs, num_chains, chain0=0,
                         axis_name: str | None = None):
    """ALL joint noise+genotyping chains over stacked size classes in ONE
    program (--noise-genotyping, estimateNoiseAndGenotypes
    InferenceEngine.cpp:384-472) — joint_chains_multi with the chunk axis
    vmapped. Every cluster participates in the per-iteration noise pooling
    (the joint pool is all groups, not just single-cluster ones).

    Returns (tallies, ws, rate_trace): per class tally [B, C, ch, S, O]
    int32 and w [B, C, ch, K] bool, plus the [ch, iters, S] rate trace.
    """
    num_iters = cfgs[0].burn_in + cfgs[0].num_samples
    prior_shape, prior_scale = noise_prior
    chain_ids = chain0 + jnp.arange(num_chains, dtype=jnp.uint32)
    k_master = jax.vmap(lambda ci: jax.random.fold_in(base_key, ci))(
        chain_ids
    )
    k_noise = jax.vmap(
        lambda km: jax.random.fold_in(km, jnp.uint32(0x6E6F6973))  # "nois"
    )(k_master)

    setups = []
    for sbucket, outcomes, cfg in zip(sbuckets, outcomes_list, cfgs):
        su = _noise_setup_stacked(
            base_key, k_master, sbucket, tables, outcomes, cfg, num_chains
        )
        su["cv"] = sbucket.cluster_valid.astype(jnp.float32)  # [B, C]
        setups.append(su)

    def step(carry, t):
        freqs_list, rates, tally_list = carry
        log_r = jnp.log(jnp.maximum(rates, 1e-30))
        count_sum = jnp.zeros(rates.shape, jnp.int32)
        num_obs = jnp.zeros(rates.shape, jnp.int32)
        new_freqs_list, new_tally_list = [], []
        collect_u = (t >= cfgs[0].burn_in).astype(jnp.uint16)
        for su, freqs, tally in zip(setups, freqs_list, tally_list):
            s, o = su["num_samples"], su["num_outcomes"]
            ch = rates.shape[0]
            ll = _noise_ll_stacked(su, log_r, rates)
            new_freqs, o_sel = _stacked_class_step(su, freqs, t, ll)
            a_so, b_so = _ab_so(su, rates)
            a_sel = _select_outcome(a_so, o_sel)
            b_sel = _select_outcome(b_so, o_sel)
            count_sum = count_sum + jnp.sum(
                (a_sel * su["cv"][:, :, None, None]).astype(jnp.int32),
                axis=(0, 1),
            )
            num_obs = num_obs + jnp.sum(
                (b_sel * su["cv"][:, :, None, None]).astype(jnp.int32),
                axis=(0, 1),
            )
            # u16 tally accumulation (see genotype_stacked): exact, halves
            # the carry traffic; cast back to int32 after the scan
            bb, cc = su["llg"].shape[:2]
            onehot = (
                jnp.arange(o, dtype=jnp.int32) == o_sel[..., None]
            ).astype(jnp.uint16)
            if su["flat_so"]:
                onehot = onehot.reshape(bb, cc, ch, s * o)
            new_tally_list.append(tally + collect_u * onehot)
            new_freqs_list.append(new_freqs)

        if axis_name is not None:
            count_sum = jax.lax.psum(count_sum, axis_name)
            num_obs = jax.lax.psum(num_obs, axis_name)

        from ..ops.sampling import fixed_round_gamma
        shape = prior_shape + count_sum
        scale = prior_scale / (num_obs * prior_scale + 1.0)

        def per_chain_rates(kn, sh):
            k_it = jax.random.fold_in(kn, t.astype(jnp.uint32))
            return fixed_round_gamma(k_it, sh)

        new_rates = jax.vmap(per_chain_rates)(k_noise, shape) * scale
        return (
            tuple(new_freqs_list), new_rates, tuple(new_tally_list)
        ), new_rates

    tally0 = tuple(
        jnp.zeros(
            su["sbucket"].mult.shape[:2]
            + (
                (num_chains, su["num_samples"] * su["num_outcomes"])
                if su["flat_so"]
                else (num_chains, su["num_samples"], su["num_outcomes"])
            ),
            jnp.uint16,
        )
        for su in setups
    )
    freqs0_list = tuple(su["freqs0"] for su in setups)
    (_, _, tallies), trace = jax.lax.scan(
        step, (freqs0_list, init_rates, tally0),
        jnp.arange(num_iters, dtype=jnp.int32),
        unroll=SCAN_UNROLL,
    )
    tallies = tuple(
        t.reshape(t.shape[0], t.shape[1], num_chains,
                  su["num_samples"], su["num_outcomes"]).astype(jnp.int32)
        for t, su in zip(tallies, setups)
    )
    return tallies, tuple(su["w"] for su in setups), jnp.transpose(
        trace, (1, 0, 2)
    )


def joint_chain_multi(base_key, buckets, tables, init_rates, noise_prior,
                      outcomes_list, cfgs, chain_idx,
                      axis_name: str | None = None):
    """One joint chain over multiple size-class buckets — the single-chain
    view of joint_chains_multi (identical RNG stream and results)."""
    tallies, ws, trace = joint_chains_multi(
        base_key, buckets, tables, init_rates[None], noise_prior,
        outcomes_list, cfgs, num_chains=1, chain0=chain_idx,
        axis_name=axis_name,
    )
    return (
        tuple(t[:, 0] for t in tallies),
        tuple(w[:, 0] for w in ws),
        trace[0],
    )
