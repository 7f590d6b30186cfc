"""Posterior statistics: Gibbs outcome tallies -> per-sample genotype calls
and k-mer evidence stats (GT/GQ/GPP/APP/NAK/FAK/MAC/SAF).

Vectorised reformulation of getGenotypeSampleStats / updateAlleleKmerStats
(VariantClusterGenotyper.cpp:249-468, VariantClusterHaplotypes.cpp:235-373).
The reference walks the diplotype tally map per variant per sample; here the
tallies are dense [clusters, chains, samples, outcomes] arrays and every stat
is an einsum against static outcome->allele maps:

  * genotype/allele posteriors: one-hot contractions over outcomes
    (tallies are integers, so the reference's floatCompare tie detection
    reduces to exact integer tie counting).
  * NAK (mean number of kmers) and FAK (mean fraction observed): the per-
    (variant, haplotype) kmer stats N = sum_k w*member and
    FR = sum_k w*member*[count>0] are outcome-independent, so the posterior
    averages are exact contractions of tallies against gathered N/FR.
  * MAC (mean allele count = mean of count/multiplicity): the value depends on
    the sampled outcome through the diplotype multiplicity, so it is computed
    over the top-T outcomes by tally (the posterior concentrates on a handful
    of diplotypes; T=8 captures essentially all mass). GT/GQ/GPP/APP/NAK/FAK
    are exact.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import MISSING, PLOIDY_DIPLOID, PLOIDY_HAPLOID, PLOIDY_NULL
from .buckets import ClusterBucket, unpack_member_bits
from .gibbs import OutcomeSpace

# float tolerance semantics of Utils::floatCompare / floatLess (Utils.hpp:81-103)
_FLOAT_EPS100 = np.float32(np.finfo(np.float32).eps * 100)

# outcome-space size above which the per-allele NAK/FAK reductions use the
# fused [ch*S, O] x [O, A] matmul formulation (see collect_bucket_stats)
_STATS_FUSE_MIN_O = 64


def float_compare(a, b):
    m = jnp.abs(jnp.minimum(a, b))
    return (a == b) | (jnp.abs(a - b) < m * _FLOAT_EPS100)


def float_less(a, b):
    return (a < b) & ~float_compare(a, b)


@functools.lru_cache(maxsize=None)
def _triangular_decode(max_alleles: int):
    """Static decode tables for the triangular genotype index
    g = hi*(hi+1)/2 + lo (VariantClusterGenotyper.cpp:303)."""
    g = max_alleles * (max_alleles + 1) // 2
    lo = np.zeros(g, dtype=np.int32)
    hi = np.zeros(g, dtype=np.int32)
    idx = 0
    for b in range(max_alleles):
        for a in range(b + 1):
            lo[idx] = a
            hi[idx] = b
            idx += 1
    return lo, hi


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BucketStats:
    """Per-(cluster, sample, variant) outputs; padded entries are garbage and
    masked by bucket.variant_valid / cluster_valid on the host side."""

    gpp: jnp.ndarray        # [C, S, V, G] genotype posteriors
    app: jnp.ndarray        # [C, S, V, A] allele posteriors
    gq: jnp.ndarray         # [C, S, V] genotype quality
    gt: jnp.ndarray         # [C, S, V, 2] called allele pair, MISSING = no call
    saf: jnp.ndarray        # [C, S, V, A] allele filter code 0..3
    nak: jnp.ndarray        # [C, S, V, A] mean number of kmers
    fak: jnp.ndarray        # [C, S, V, A] mean fraction observed kmers (-1 if n/a)
    mac: jnp.ndarray        # [C, S, V, A] mean allele kmer count (-1 if n/a)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PackedBucketStats:
    """Transfer-compact form of BucketStats for the device->host fetch.

    The axon down-tunnel runs ~12 MB/s, so the per-group stats fetch was the
    genotype wave wall (BENCH_PROFILE_r04: 78-93 s). This packs the exact
    integer tallies (u16 — the posteriors gpp/app and GQ are DERIVED on the
    host with the identical f32 arithmetic, so GT/GPP/GQ stay bit-exact) and
    the three diagnostic k-mer stats in f16 (NAK/FAK/MAC are print-only —
    SAF filtering already happened on device in f32; the f16 rounding is a
    documented <5e-4 relative deviation on printed diagnostics, PARITY.md).
    ~2.4x fewer bytes than the f32 BucketStats fetch."""

    gt_tally: jnp.ndarray   # [C, S, V, G] uint16 summed genotype tallies
    al_tally: jnp.ndarray   # [C, S, V, A] uint16 summed allele tallies
    denom: jnp.ndarray      # [C, S] uint16 total tally (chains x samples)
    gt: jnp.ndarray         # [C, S, V, 2] int8 called pair, MISSING = no call
    saf: jnp.ndarray        # [C, S, V, A] uint8 filter code 0..3
    nak: jnp.ndarray        # [C, S, V, A] float16
    fak: jnp.ndarray        # [C, S, V, A] float16
    mac: jnp.ndarray        # [C, S, V, A] float16


def unpack_stats_host(p) -> BucketStats:
    """PackedBucketStats (numpy, any leading axes) -> BucketStats.

    gpp/app/gq are re-derived from the exact u16 tallies with the same f32
    arithmetic the device used (tally/denom division and the phred formula,
    getGenotypeSampleStats VariantClusterGenotyper.cpp:409-423), so the
    bit-compatibility surface (GT/GPP/GQ) is unchanged by packing."""
    denom = p.denom.astype(np.int32)                       # [..., S]
    denom_f = np.maximum(denom.astype(np.float32), np.float32(1.0))
    dvg = denom_f[..., None, None]
    gpp = p.gt_tally.astype(np.float32) / dvg
    app = p.al_tally.astype(np.float32) / dvg
    max_tally = p.gt_tally.astype(np.int32).max(axis=-1)   # [..., S, V]
    max_gpp = max_tally.astype(np.float32) / denom_f[..., None]
    with np.errstate(divide="ignore"):
        phred = np.float32(-10.0) * np.log10(
            np.maximum(np.float32(1.0) - max_gpp, np.float32(1e-12))
        )
    gq = np.where(
        max_tally == denom[..., None],
        np.float32(99.0),
        np.where(max_tally == 0, np.float32(0.0), phred),
    ).astype(np.float32)
    return BucketStats(
        gpp=gpp,
        app=app,
        gq=gq,
        gt=p.gt.astype(np.int32),
        saf=p.saf,
        nak=p.nak.astype(np.float32),
        fak=p.fak.astype(np.float32),
        mac=p.mac.astype(np.float32),
    )


@dataclasses.dataclass(frozen=True)
class FilterConfig:
    min_genotype_posterior: float
    min_number_of_kmers: float
    # per-sample FAK thresholds 1 - exp(-0.275 * nb_mean) (Filters.cpp:33-53);
    # tuple so the config stays hashable for jit.
    min_fraction_observed_kmers: tuple

    @classmethod
    def from_model(cls, nb_means, min_gpp, min_nak, disable_observed_kmers=False):
        from ..constants import OBSERVED_KMER_BETA

        if disable_observed_kmers:
            thresholds = tuple(0.0 for _ in nb_means)
        else:
            thresholds = tuple(
                float(1.0 - np.exp(-OBSERVED_KMER_BETA * m)) for m in nb_means
            )
        return cls(min_gpp, min_nak, thresholds)


@functools.partial(
    jax.jit, static_argnames=("outcomes", "filters", "allele_capacity", "mac_top_t")
)
def collect_bucket_stats_stacked(
    sbucket,
    outcomes: OutcomeSpace,
    tallies,
    ws,
    filters: FilterConfig,
    allele_capacity: int = 8,
    mac_top_t: int = 8,
) -> BucketStats:
    """collect_bucket_stats vmapped over a [B]-stacked group: one compiled
    program and ONE device->host stats fetch per stacked group instead of
    per chunk (the per-chunk fetch round-trips dominated the genotype
    phase's tail once the scans were fixed). Returns BucketStats with a
    leading chunk axis."""
    return jax.vmap(
        lambda b, t, w: _collect_bucket_stats_impl(
            b, outcomes, t, w, filters, allele_capacity, mac_top_t, None
        )
    )(sbucket, tallies, ws)


@functools.partial(
    jax.jit, static_argnames=("outcomes", "filters", "allele_capacity", "mac_top_t")
)
def collect_bucket_stats_packed_stacked(
    sbucket,
    outcomes: OutcomeSpace,
    tallies,
    ws,
    filters: FilterConfig,
    allele_capacity: int = 8,
    mac_top_t: int = 8,
) -> PackedBucketStats:
    """collect_bucket_stats_stacked with transfer-compact outputs (see
    PackedBucketStats): identical device computation, but the posteriors are
    returned as exact u16 tallies (host re-derives gpp/app/gq bit-exactly)
    and NAK/FAK/MAC as f16. One fetch per stacked group at ~2.4x fewer
    bytes."""
    return jax.vmap(
        lambda b, t, w: _collect_bucket_stats_impl(
            b, outcomes, t, w, filters, allele_capacity, mac_top_t, None,
            packed=True,
        )
    )(sbucket, tallies, ws)


@functools.partial(
    jax.jit, static_argnames=("outcomes", "filters", "allele_capacity", "mac_top_t")
)
def collect_bucket_stats(
    bucket: ClusterBucket,
    outcomes: OutcomeSpace,
    tally,
    w,
    filters: FilterConfig,
    allele_capacity: int = 8,
    mac_top_t: int = 8,
    missing_stats=None,
    mac_extra=None,
) -> BucketStats:
    return _collect_bucket_stats_impl(
        bucket, outcomes, tally, w, filters, allele_capacity, mac_top_t,
        missing_stats, mac_extra=mac_extra,
    )


def _collect_bucket_stats_impl(
    bucket: ClusterBucket,
    outcomes: OutcomeSpace,
    tally,
    w,
    filters: FilterConfig,
    allele_capacity: int = 8,
    mac_top_t: int = 8,
    missing_stats=None,
    packed: bool = False,
    mac_extra=None,
) -> BucketStats:
    """Reduce Gibbs tallies to the full per-variant output statistics.

    missing_stats: optional (nak_m, fak_m, mac_m) [C, S] arrays — the parent
    cluster's demoting-allele kmer stats, substituted for the missing (`*`)
    allele of nested child variants whose own sentinel slot carries no kmers
    (addNestedHaplotypeKmerStats, VariantClusterHaplotypes.cpp:295-300:
    demoted copies contribute the PARENT haplotype's stats to the nested
    missing allele).

    mac_extra: optional [C, S, V, A] f32 — the coupled scan's accumulated
    shared-k-mer MAC numerator corrections (sibling pool contributions in
    the denominator; gibbs.genotype_nested). Requires mac_top_t == O so the
    per-iteration correction weights match the exact tally sum
    (updateKmerStatsCache, VariantClusterHaplotypes.cpp:302-333)."""
    c, k, h = bucket.mult.shape
    s = bucket.counts.shape[2]
    o = outcomes.num_outcomes
    v = bucket.num_variants
    num_chains = tally.shape[1]
    a_cap = allele_capacity
    g_cap = a_cap * (a_cap + 1) // 2
    mac_top_t = min(mac_top_t, outcomes.num_outcomes)

    oa = jnp.asarray(outcomes.oa)
    ob = jnp.asarray(outcomes.ob)
    num_pairs = outcomes.num_pairs
    b_slot_valid = jnp.arange(o) < num_pairs      # slot b exists (diploid block)

    # Per-sample chromosome ploidy decides genotype coding — NOT the outcome
    # block: a chrom-diploid sample demoted by a nested parent samples
    # haploid/null outcomes whose genotypes are (allele, *) / (*, *)
    # (getGenotypeSampleStats, VariantClusterGenotyper.cpp:258-330, with
    # haplotypeToAlleleIndex mapping the overflow slot to the missing allele).
    # Chrom-null samples tally nothing (sample_stats(0,0)).
    is_dip_s = bucket.ploidy == PLOIDY_DIPLOID    # [C, S]
    valid_s = bucket.ploidy != PLOIDY_NULL

    tall = tally.sum(axis=1)                      # [C, S, O]
    tall_f = tall.astype(jnp.float32)
    tally_f = tally.astype(jnp.float32)
    denom = tall.sum(axis=2)                      # [C, S] = chains * samples
    denom_f = jnp.maximum(denom.astype(jnp.float32), 1.0)

    # haplotype -> allele with sentinel row = last allele (dependency/missing
    # slot, haplotypeToAlleleIndex, VariantClusterGenotyper.cpp:208-219)
    sentinel = (bucket.num_alleles - 1).astype(bucket.hap_allele.dtype)  # [C,V]
    hap_allele_ext = jnp.concatenate(
        [bucket.hap_allele, sentinel[:, None, :]], axis=1
    )  # [C, H+1, V]

    glo_np, ghi_np = _triangular_decode(a_cap)
    glo, ghi = jnp.asarray(glo_np), jnp.asarray(ghi_np)

    # Per-chain kmer-evidence bases (outcome-independent):
    wf = w.astype(jnp.float32)                    # [C, ch, K]
    counts_pos = (bucket.counts > 0)              # [C, K, S]

    # Selected outcomes for MAC (top-T by total tally per cluster-sample).
    _, sel_o = jax.lax.top_k(tall, mac_top_t)     # [C, S, T]

    # Precompute per-kmer diplotype multiplicities at selected outcomes:
    me = jnp.concatenate(
        [bucket.mult, jnp.zeros((c, k, 1), bucket.mult.dtype)], axis=2
    ).astype(jnp.int32)                           # [C, K, H+1]
    sel_a_h = oa[sel_o]                           # [C, S, T]
    sel_b_h = ob[sel_o]
    # dynamic-index gathers with K-sized outputs serialize on TPU
    # (~15ns/element); select via one-hot contractions instead — me <= 255
    # and one-hot 0/1 are exact in bf16, so the result is bit-identical
    oh_ab = (
        jax.nn.one_hot(sel_a_h, h + 1, dtype=jnp.bfloat16)
        + jax.nn.one_hot(sel_b_h, h + 1, dtype=jnp.bfloat16)
    )                                             # [C, S, T, H+1]
    dip_sel = jnp.einsum(
        "ckh,csth->ckst", me.astype(jnp.bfloat16), oh_ab,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).astype(jnp.int32)                           # [C, K, S, T]
    inter_i = bucket.inter_mult.astype(jnp.int32)  # [C, K, S]
    mult_tot_sel = dip_sel + inter_i[:, :, :, None]
    val_sel = bucket.counts.astype(jnp.float32)[:, :, :, None] / jnp.maximum(
        mult_tot_sel.astype(jnp.float32), 1.0
    )                                             # [C, K, S, T]

    member_all = unpack_member_bits(bucket.member, h)  # [C, K, V, H] bool

    def per_variant(v_idx):
        al_ext = jax.lax.dynamic_index_in_dim(
            hap_allele_ext, v_idx, axis=2, keepdims=False
        ).astype(jnp.int32)                       # [C, H+1]
        al_a = jnp.take_along_axis(al_ext, oa[None, :], axis=1)  # [C, O]
        al_b = jnp.take_along_axis(al_ext, ob[None, :], axis=1)

        # ---- genotype tallies (ploidy-aware per sample) ----
        lo = jnp.minimum(al_a, al_b)
        hi = jnp.maximum(al_a, al_b)
        g_pair = (hi * (hi + 1)) // 2 + lo                        # [C, O]
        g1_dip = (
            g_pair[:, :, None] == jnp.arange(g_cap)[None, None, :]
        ).astype(jnp.float32)                                     # [C, O, G]
        g1_hap = (
            al_a[:, :, None] == jnp.arange(g_cap)[None, None, :]
        ).astype(jnp.float32)
        gt_dip = jnp.einsum("cso,cog->csg", tall_f, g1_dip)
        gt_hap = jnp.einsum("cso,cog->csg", tall_f, g1_hap)
        gt_tally = jnp.where(
            is_dip_s[:, :, None], gt_dip, gt_hap
        ) * valid_s[:, :, None]                                   # [C, S, G]

        # ---- allele posterior tallies (hom counts once) ----
        arange_a = jnp.arange(a_cap)
        match_a = (al_a[:, :, None] == arange_a[None, None, :])   # [C, O, A]
        match_b = (al_b[:, :, None] == arange_a[None, None, :])
        inc_dip = match_a.astype(jnp.float32) + jnp.where(
            (al_a != al_b)[:, :, None], match_b.astype(jnp.float32), 0.0
        )
        inc_hap = match_a.astype(jnp.float32)
        al_dip = jnp.einsum("cso,coa->csa", tall_f, inc_dip)
        al_hap = jnp.einsum("cso,coa->csa", tall_f, inc_hap)
        al_tally = jnp.where(
            is_dip_s[:, :, None], al_dip, al_hap
        ) * valid_s[:, :, None]                                   # [C, S, A]

        # ---- GT / GQ from integer tallies (tallies < 2^24 so f32 sums are exact) ----
        gt_int = jnp.round(gt_tally).astype(jnp.int32)
        max_tally = gt_int.max(axis=2)                            # [C, S]
        n_max = jnp.sum(gt_int == max_tally[:, :, None], axis=2)
        arg_g = jnp.argmax(gt_int, axis=2)                        # [C, S]
        max_gpp = max_tally.astype(jnp.float32) / denom_f
        gq = jnp.where(
            max_tally == denom,
            99.0,
            jnp.where(
                max_tally == 0,
                0.0,
                -10.0 * jnp.log10(jnp.maximum(1.0 - max_gpp, 1e-12)),
            ),
        )

        # ---- kmer evidence stats for this variant ----
        memb = jax.lax.dynamic_index_in_dim(
            member_all, v_idx, axis=2, keepdims=False
        )                                                         # [C, K, H]
        memb_f = memb.astype(jnp.float32)
        n_hv = jnp.einsum("cxk,ckh->cxh", wf, memb_f)             # [C, ch, H]
        fr_sum = jnp.einsum(
            "cxk,ckh->cxh",
            (wf[:, :, None, :] * counts_pos.transpose(0, 2, 1)[:, None, :, :]
             ).reshape(c, num_chains * s, k),
            memb_f,
        ).reshape(c, num_chains, s, h)                            # [C, ch, S, H]

        n_ext = jnp.concatenate(
            [n_hv, jnp.zeros((c, num_chains, 1))], axis=2
        )                                                         # [C, ch, H+1]
        fr_ext = jnp.concatenate(
            [fr_sum, jnp.zeros((c, num_chains, s, 1))], axis=3
        )

        # broadcast to outcomes via constant one-hot matmuls — these gathers
        # at O x chains x S output sizes serialized on TPU and were ~16 of
        # the 17 seconds of the H64-class stats pass
        oh_oa = jax.nn.one_hot(oa, h + 1, dtype=jnp.bfloat16)     # [O, H+1]
        oh_ob = jax.nn.one_hot(ob, h + 1, dtype=jnp.bfloat16)
        n_at_a = jnp.einsum(
            "cxh,oh->cxo", n_ext, oh_oa,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )                                                         # [C, ch, O]
        n_at_b = jnp.einsum(
            "cxh,oh->cxo", n_ext, oh_ob,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        fr_at_a = jnp.einsum(
            "cxsh,oh->cxso", fr_ext, oh_oa,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )                                                         # [C, ch, S, O]
        fr_at_b = jnp.einsum(
            "cxsh,oh->cxso", fr_ext, oh_ob,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

        # slot validity per sample: slot a on every outcome (null-chrom
        # samples are zeroed), slot b wherever the sample is chrom-diploid
        # (the sentinel/missing slot of demoted outcomes counts as the
        # missing allele, VariantClusterGenotyper.cpp:289-311)
        a_valid = valid_s[:, :, None]                             # [C, S, 1]
        b_valid = (is_dip_s & valid_s)[:, :, None]

        n_pos_a = (n_at_a > 0).astype(jnp.float32)
        n_pos_b = (n_at_b > 0).astype(jnp.float32)
        fr_frac_a = fr_at_a / jnp.maximum(n_at_a, 1.0)[:, :, None, :]
        fr_frac_b = fr_at_b / jnp.maximum(n_at_b, 1.0)[:, :, None, :]

        if o > _STATS_FUSE_MIN_O:
            # large outcome spaces: ONE batched [ch*S, O] x [O, A] matmul
            # per statistic instead of A separate [C,ch,S,O] reductions —
            # the A-fold redundancy made the H16/H64 stats pass the
            # dominant device cost of a 150k-variant unit. Small-O classes
            # keep the original loop so their summation order (and the
            # byte-pinned goldens) are untouched; these large classes'
            # sums differ only in f32 reduction order.
            ar = jnp.arange(a_cap)
            ma_oh = (al_a[:, :, None] == ar).astype(jnp.float32)  # [C, O, A]
            mb_oh = (al_b[:, :, None] == ar).astype(jnp.float32)

            def _contract(wa, wb):
                ra = jnp.einsum(
                    "chso,coa->csa", wa, ma_oh,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                rb = jnp.einsum(
                    "chso,coa->csa", wb, mb_oh,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                return (
                    ra * valid_s.astype(jnp.float32)[:, :, None]
                    + rb * (is_dip_s & valid_s).astype(jnp.float32)[:, :, None]
                )

            calls = _contract(tally_f, tally_f)
            nak_num = _contract(
                tally_f * n_at_a[:, :, None, :],
                tally_f * n_at_b[:, :, None, :],
            )
            fak_den = _contract(
                tally_f * n_pos_a[:, :, None, :],
                tally_f * n_pos_b[:, :, None, :],
            )
            fak_num = _contract(
                tally_f * n_pos_a[:, :, None, :] * fr_frac_a,
                tally_f * n_pos_b[:, :, None, :] * fr_frac_b,
            )
        else:
            def allele_sums(a_idx):
                ma = (al_a == a_idx)[:, None, :] & a_valid        # [C, S, O]
                mb = (al_b == a_idx)[:, None, :] & b_valid
                maf = ma.astype(jnp.float32)
                mbf = mb.astype(jnp.float32)
                ones = jnp.ones_like(n_at_a)
                calls = jnp.einsum("chso,cso,cho->cs", tally_f, maf, ones) + \
                    jnp.einsum("chso,cso,cho->cs", tally_f, mbf, ones)
                nak_num = jnp.einsum(
                    "chso,cso,cho->cs", tally_f, maf, n_at_a
                ) + jnp.einsum("chso,cso,cho->cs", tally_f, mbf, n_at_b)
                fak_den = jnp.einsum(
                    "chso,cso,cho->cs", tally_f, maf, n_pos_a
                ) + jnp.einsum("chso,cso,cho->cs", tally_f, mbf, n_pos_b)
                fak_num = jnp.einsum(
                    "chso,cso,cho,chso->cs", tally_f, maf, n_pos_a, fr_frac_a
                ) + jnp.einsum(
                    "chso,cso,cho,chso->cs", tally_f, mbf, n_pos_b, fr_frac_b
                )
                return calls, nak_num, fak_den, fak_num

            calls, nak_num, fak_den, fak_num = jax.vmap(
                allele_sums, out_axes=1
            )(jnp.arange(a_cap))  # each [C, A, S] -> transpose
            calls = calls.transpose(0, 2, 1)      # [C, S, A]
            nak_num = nak_num.transpose(0, 2, 1)
            fak_den = fak_den.transpose(0, 2, 1)
            fak_num = fak_num.transpose(0, 2, 1)

        nak = nak_num / jnp.maximum(calls, 1.0)
        fak = jnp.where(fak_den > 0, fak_num / jnp.maximum(fak_den, 1.0), -1.0)

        if missing_stats is not None:
            nak_m, fak_m, mac_m = missing_stats           # each [C, S]
            na_v = jax.lax.dynamic_index_in_dim(
                bucket.num_alleles, v_idx, axis=1, keepdims=False
            ).astype(jnp.int32)                           # [C]
            is_missing = (
                jnp.arange(a_cap)[None, None, :] == (na_v[:, None, None] - 1)
            )
            sub = is_missing & float_compare(nak, jnp.zeros_like(nak))
            nak = jnp.where(sub, nak_m[:, :, None], nak)
            fak = jnp.where(sub, fak_m[:, :, None], fak)

        # ---- MAC over top-T outcomes ----
        # one-hot selection (see dip_sel note); jax.nn.one_hot emits an
        # all-zero row for out-of-range indices, which covers the sentinel
        # haplotype (sel >= h) for free
        memb_sel_a = jnp.einsum(
            "ckh,csth->ckst", memb.astype(jnp.bfloat16),
            jax.nn.one_hot(sel_a_h, h, dtype=jnp.bfloat16),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )                                                         # [C,K,S,T]
        memb_sel_b = jnp.einsum(
            "ckh,csth->ckst", memb.astype(jnp.bfloat16),
            jax.nn.one_hot(sel_b_h, h, dtype=jnp.bfloat16),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

        mn_a = jnp.einsum(
            "chk,ckst->chst", wf, val_sel * memb_sel_a
        )                                                         # [C, ch, S, T]
        mn_b = jnp.einsum("chk,ckst->chst", wf, val_sel * memb_sel_b)

        # weights: per-chain tally at the selected outcome
        t_sel = jnp.take_along_axis(
            tally_f, sel_o[:, None, :, :] * jnp.ones((c, num_chains, 1, 1), jnp.int32),
            axis=3,
        )                                                         # [C, ch, S, T]
        n_sel_a = jnp.take_along_axis(
            n_ext, sel_a_h.reshape(c, 1, s * mac_top_t) *
            jnp.ones((c, num_chains, 1), jnp.int32), axis=2,
        ).reshape(c, num_chains, s, mac_top_t)
        n_sel_b = jnp.take_along_axis(
            n_ext, sel_b_h.reshape(c, 1, s * mac_top_t) *
            jnp.ones((c, num_chains, 1), jnp.int32), axis=2,
        ).reshape(c, num_chains, s, mac_top_t)

        al_sel_a = jnp.take_along_axis(al_ext, sel_a_h.reshape(c, s * mac_top_t), axis=1
                                       ).reshape(c, s, mac_top_t)
        al_sel_b = jnp.take_along_axis(al_ext, sel_b_h.reshape(c, s * mac_top_t), axis=1
                                       ).reshape(c, s, mac_top_t)
        sel_b_real = (sel_b_h < h)                                 # [C, S, T]
        sel_a_real = (sel_a_h < h)

        def mac_sums(a_idx):
            wa = t_sel * (al_sel_a == a_idx)[:, None] * sel_a_real[:, None] * (n_sel_a > 0)
            wb = t_sel * (al_sel_b == a_idx)[:, None] * sel_b_real[:, None] * (n_sel_b > 0)
            num = jnp.sum(
                wa * mn_a / jnp.maximum(n_sel_a, 1.0)
                + wb * mn_b / jnp.maximum(n_sel_b, 1.0),
                axis=(1, 3),
            )
            den = jnp.sum(wa + wb, axis=(1, 3))
            return num, den

        mac_num, mac_den = jax.vmap(mac_sums, out_axes=1)(jnp.arange(a_cap))
        mac_num = mac_num.transpose(0, 2, 1)
        mac_den = mac_den.transpose(0, 2, 1)
        if mac_extra is not None:
            mac_num = mac_num + jax.lax.dynamic_index_in_dim(
                mac_extra, v_idx, axis=2, keepdims=False
            )                                             # [C, S, A]
        mac = jnp.where(mac_den > 0, mac_num / jnp.maximum(mac_den, 1.0), -1.0)
        if missing_stats is not None:
            mac = jnp.where(sub & (mac < 0), mac_m[:, :, None], mac)

        # ---- filters + GT decode ----
        app = al_tally / denom_f[:, :, None]
        gpp = gt_tally / denom_f[:, :, None]

        has_post = al_tally > 0
        filt = jnp.zeros_like(calls, dtype=jnp.int32)
        filt = filt + jnp.where(
            has_post & float_less(nak, filters.min_number_of_kmers), 1, 0
        )
        fak_thresh = jnp.asarray(filters.min_fraction_observed_kmers,
                                 jnp.float32)[None, :, None]
        nak_nonzero = ~float_compare(nak, jnp.zeros_like(nak))
        filt = filt + jnp.where(
            has_post & nak_nonzero & float_less(fak, fak_thresh), 2, 0
        )

        ploidy = bucket.ploidy                                    # [C, S]
        is_dip = ploidy == PLOIDY_DIPLOID
        is_hap = ploidy == PLOIDY_HAPLOID
        gt_lo = jnp.where(is_dip, glo[arg_g], jnp.where(is_hap, arg_g, MISSING))
        gt_hi = jnp.where(is_dip, ghi[arg_g], MISSING)

        thresh_ok = ~float_less(max_gpp, filters.min_genotype_posterior)
        filt_lo = jnp.take_along_axis(
            filt, jnp.maximum(gt_lo, 0)[:, :, None], axis=2
        )[:, :, 0]
        filt_hi = jnp.where(
            is_dip,
            jnp.take_along_axis(filt, jnp.maximum(gt_hi, 0)[:, :, None], axis=2)[:, :, 0],
            0,
        )
        called = (
            (n_max == 1)
            & thresh_ok
            & (filt_lo == 0)
            & (filt_hi == 0)
            & (max_tally > 0)
            & (is_dip | is_hap)
        )
        gt_lo = jnp.where(called, gt_lo, MISSING)
        gt_hi = jnp.where(called & is_dip, gt_hi, MISSING)
        gt = jnp.stack([gt_lo, gt_hi], axis=-1)                   # [C, S, 2]

        if packed:
            # exact integer tallies (< 2^16: chains x samples <= 5000 at the
            # production defaults; engine guards the packed path on this)
            return (
                gt_int.astype(jnp.uint16),
                jnp.round(al_tally).astype(jnp.uint16),
                gt.astype(jnp.int8),
                filt.astype(jnp.uint8),
                nak.astype(jnp.float16),
                fak.astype(jnp.float16),
                mac.astype(jnp.float16),
            )
        return gpp, app, gq, gt, filt.astype(jnp.uint8), nak, fak, mac

    results = jax.lax.map(per_variant, jnp.arange(v))
    if packed:
        gt_tally, al_tally_u, gt, saf, nak, fak, mac = results
        # lax.map stacks on axis 0 = variant; move to axis 2
        return PackedBucketStats(
            gt_tally=jnp.moveaxis(gt_tally, 0, 2),
            al_tally=jnp.moveaxis(al_tally_u, 0, 2),
            denom=denom.astype(jnp.uint16),
            gt=jnp.moveaxis(gt, 0, 2),
            saf=jnp.moveaxis(saf, 0, 2),
            nak=jnp.moveaxis(nak, 0, 2),
            fak=jnp.moveaxis(fak, 0, 2),
            mac=jnp.moveaxis(mac, 0, 2),
        )
    gpp, app, gq, gt, saf, nak, fak, mac = results
    # lax.map stacks on axis 0 = variant; move to axis 2
    return BucketStats(
        gpp=jnp.moveaxis(gpp, 0, 2),
        app=jnp.moveaxis(app, 0, 2),
        gq=jnp.moveaxis(gq, 0, 2),
        gt=jnp.moveaxis(gt, 0, 2),
        saf=jnp.moveaxis(saf, 0, 2),
        nak=jnp.moveaxis(nak, 0, 2),
        fak=jnp.moveaxis(fak, 0, 2),
        mac=jnp.moveaxis(mac, 0, 2),
    )
