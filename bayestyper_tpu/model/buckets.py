"""Padded dense cluster buckets — the device-side representation of variant
clusters.

The reference materialises one `VariantClusterHaplotypes` object per cluster
(Eigen uchar kmer-x-haplotype matrix + index lists,
VariantClusterHaplotypes.hpp:46-131) and walks clusters one thread at a time.
Here clusters are *bucketed by size class* (H haplotypes, K kmers, V variants,
A alleles — all padded to the bucket's class) and stacked into dense arrays so
one pjit'd Gibbs program processes the whole bucket: vmap over clusters x
chains, static shapes for XLA, MXU-sized contractions.

A bucket carries everything `getHaplotypeCandidates` produces
(VariantClusterGraph.cpp:941-1135), re-laid-out as tensors:

  mult        uint8 [C, K, H]   per-kmer per-haplotype path multiplicity
  inter_mult  uint8 [C, K, S]   intercluster (reference-copy) multiplicity
                                resolved per sample gender
                                (KmerCounts::getInterclusterMultiplicity)
  counts      uint8 [C, K, S]   observed per-sample kmer counts
  kmer_valid  bool  [C, K]
  hap_valid   bool  [C, H]
  ploidy      int8  [C, S]      0=null, 1=haploid, 2=diploid per sample
  hap_allele  int16 [C, H, V]   haplotype -> allele index per variant
  num_alleles int16 [C, V]
  variant_valid bool [C, V]
  member      uint32 [C, K, V, W]  bitmask over haplotypes: kmer k crosses
                                variant v on haplotype h (variant_haplotype_indices,
                                VariantClusterGraph.cpp:1137-1184); W = ceil(H/32)
  use_sparse  bool  [C]         sparse vs dense haplotype frequency prior
  sparsity    f32   [C]         |minimum cover| / H (HaplotypeFrequencyDistribution.cpp:85)
  cluster_id  int64 [C]         global cluster id (drives counter-based PRNG)
  cluster_valid bool [C]
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ClusterBucket:
    mult: Any
    inter_mult: Any
    counts: Any
    kmer_valid: Any
    hap_valid: Any
    ploidy: Any
    hap_allele: Any
    num_alleles: Any
    variant_valid: Any
    member: Any
    use_sparse: Any
    sparsity: Any
    cluster_id: Any
    cluster_valid: Any

    @property
    def num_clusters(self):
        return self.mult.shape[0]

    @property
    def num_kmers(self):
        return self.mult.shape[1]

    @property
    def num_haplotypes(self):
        return self.mult.shape[2]

    @property
    def num_samples(self):
        return self.counts.shape[2]

    @property
    def num_variants(self):
        return self.hap_allele.shape[2]

    def device_arrays(self):
        """Return the bucket with all fields as jnp arrays."""
        return ClusterBucket(
            **{f.name: jnp.asarray(getattr(self, f.name))
               for f in dataclasses.fields(self)}
        )


def _pack_member_bits(member_bool):
    """[C,K,V,H] bool -> [C,K,V,ceil(H/32)] uint32 bitmask (via packbits)."""
    c, k, v, h = member_bool.shape
    w = (h + 31) // 32
    pb = np.packbits(member_bool, axis=-1, bitorder="little")
    padded = np.zeros((c, k, v, w * 4), dtype=np.uint8)
    padded[..., : pb.shape[-1]] = pb
    return padded.view(np.uint32).reshape(c, k, v, w)


def unpack_member_bits(member_packed, num_haplotypes):
    """jnp inverse of _pack_member_bits: [...,W] uint32 -> [...,H] bool."""
    w = member_packed.shape[-1]
    lanes = (member_packed[..., :, None] >> jnp.arange(32, dtype=jnp.uint32)) & 1
    flat = lanes.reshape(member_packed.shape[:-1] + (w * 32,))
    return flat[..., :num_haplotypes].astype(bool)


def build_bucket(clusters, size_class, num_samples):
    """Pack a list of per-cluster dicts into one padded ClusterBucket.

    Each cluster dict provides (unpadded):
      mult [k, h] uint8, inter_mult [k, S] uint8, counts [k, S] uint8,
      ploidy [S] int8, hap_allele [h, v] int16, num_alleles [v] int16,
      member [k, v, h] bool, cover (list of hap indices), cluster_id int.

    size_class: (C, K, H, V) padded dims — clusters beyond C are rejected.
    """
    cap_c, cap_k, cap_h, cap_v = size_class
    assert len(clusters) <= cap_c

    c = cap_c
    mult = np.zeros((c, cap_k, cap_h), dtype=np.uint8)
    inter = np.zeros((c, cap_k, num_samples), dtype=np.uint8)
    counts = np.zeros((c, cap_k, num_samples), dtype=np.uint8)
    kmer_valid = np.zeros((c, cap_k), dtype=bool)
    hap_valid = np.zeros((c, cap_h), dtype=bool)
    ploidy = np.zeros((c, num_samples), dtype=np.int8)
    hap_allele = np.zeros((c, cap_h, cap_v), dtype=np.int16)
    num_alleles = np.zeros((c, cap_v), dtype=np.int16)
    variant_valid = np.zeros((c, cap_v), dtype=bool)
    member_bool = np.zeros((c, cap_k, cap_v, cap_h), dtype=bool)
    use_sparse = np.zeros((c,), dtype=bool)
    sparsity = np.full((c,), 0.5, dtype=np.float32)
    cluster_id = np.zeros((c,), dtype=np.int64)
    cluster_valid = np.zeros((c,), dtype=bool)

    for i, cl in enumerate(clusters):
        k, h = cl["mult"].shape
        v = cl["hap_allele"].shape[1]
        assert k <= cap_k and h <= cap_h and v <= cap_v, (k, h, v, size_class)
        mult[i, :k, :h] = cl["mult"]
        inter[i, :k] = cl["inter_mult"]
        counts[i, :k] = cl["counts"]
        kmer_valid[i, :k] = True
        hap_valid[i, :h] = True
        ploidy[i] = cl["ploidy"]
        hap_allele[i, :h, :v] = cl["hap_allele"]
        num_alleles[i, :v] = cl["num_alleles"]
        variant_valid[i, :v] = True
        member_bool[i, :k, :v, :h] = cl["member"]
        cover = np.asarray(cl["cover"], dtype=np.int64)
        if cover.size > 0:
            use_sparse[i] = True
            sparsity[i] = min(
                cover.size / float(h), 1.0 - np.finfo(np.float64).eps * 100
            )
        # NOTE: the minimum cover seeds only the prior CHOICE and sparsity.
        # It does NOT seed frequencies: SparseFrequencyDistribution::initialize
        # is dead code in the reference (no call site), and every chain starts
        # with reset() -> uniform over ALL haplotypes
        # (VariantClusterGenotyper.cpp:128, FrequencyDistribution.cpp:49-54),
        # which is exactly what the Gibbs kernel does.
        cluster_id[i] = cl["cluster_id"]
        cluster_valid[i] = True

    return ClusterBucket(
        mult=mult,
        inter_mult=inter,
        counts=counts,
        kmer_valid=kmer_valid,
        hap_valid=hap_valid,
        ploidy=ploidy,
        hap_allele=hap_allele,
        num_alleles=num_alleles,
        variant_valid=variant_valid,
        member=_pack_member_bits(member_bool),
        use_sparse=use_sparse,
        sparsity=sparsity,
        cluster_id=cluster_id,
        cluster_valid=cluster_valid,
    )


def stack_buckets(buckets):
    """Stack same-shape ClusterBuckets on a NEW leading chunk axis [B, ...].

    The chunk-stacked Gibbs programs (gibbs.genotype_stacked,
    noise_chains_stacked) run B same-class cluster chunks through ONE
    compiled scan body vmapped over this axis — replacing B identical
    sub-bodies per program (the round-3 executable-size/compile-time
    bottleneck; InferenceEngine.cpp:62-74 is the one-thread-pool-program
    analogue being matched). Works on host (numpy) or device (jnp) arrays.
    """
    first = buckets[0]
    if len(buckets) == 1:
        return ClusterBucket(
            **{f.name: jnp.asarray(getattr(first, f.name))[None]
               for f in dataclasses.fields(ClusterBucket)}
        )
    return ClusterBucket(
        **{f.name: jnp.stack([jnp.asarray(getattr(b, f.name))
                              for b in buckets])
           for f in dataclasses.fields(ClusterBucket)}
    )


def slice_bucket(sbucket, b: int):
    """Chunk b of a stacked bucket (inverse of stack_buckets)."""
    return ClusterBucket(
        **{f.name: getattr(sbucket, f.name)[b]
           for f in dataclasses.fields(ClusterBucket)}
    )


def zero_bucket_like(bucket):
    """All-zero dummy chunk for padding the stack axis to a power of two.

    Zero ploidy = null for every sample, so each padded cluster
    deterministically samples the null outcome; cluster_valid is all False
    so nothing it produces is consumed."""
    return ClusterBucket(
        **{f.name: jnp.zeros_like(jnp.asarray(getattr(bucket, f.name)))
           for f in dataclasses.fields(ClusterBucket)}
    )


_GOLDEN64 = np.uint64(0x9E3779B97F4A7C15)


def cover_tiebreak_key(seed, cluster_id):
    """Initial splitmix64 state of the cover tie-break stream for one
    cluster: keyed on (seed, cluster_id) so the cover is deterministic and
    independent of cluster/bucket ordering (must match bt_build_bucket)."""
    from ..ops.kmers import mix64

    mask = 0xFFFFFFFFFFFFFFFF
    return int(mix64((int(seed) ^ ((int(cluster_id) * int(_GOLDEN64)) & mask))
                     & mask))


def greedy_minimum_cover(mult, nonzero_rows, key):
    """Greedy minimum column cover of the kmer x haplotype matrix.

    Mirrors SparsityEstimator::estimateMinimumColumnCover
    (SparsityEstimator.cpp:41-87), unweighted mode: repeatedly pick uniformly
    among columns covering the most uncovered nonzero-count rows. Ties are
    broken by a counter-based splitmix64 stream (see cover_tiebreak_key) —
    bit-identical to the native bt_build_bucket path.

    Args:
      mult: [K, H] uint8 numpy matrix.
      nonzero_rows: [K] bool — kmers with observed counts.
      key: uint64 stream state from cover_tiebreak_key.
    Returns: list of haplotype (column) indices.
    """
    from ..ops.kmers import mix64

    uncovered = nonzero_rows.astype(np.int64).copy()
    m = mult.astype(np.int64)
    cover = []
    state = int(key)
    while uncovered.sum() > 0:
        row_cover = uncovered @ m  # [H]
        best = row_cover.max()
        assert best > 0
        candidates = np.flatnonzero(row_cover == best)
        state = (state + int(_GOLDEN64)) & 0xFFFFFFFFFFFFFFFF
        pick = int(candidates[int(mix64(state)) % len(candidates)])
        cover.append(pick)
        uncovered = uncovered * (m[:, pick] == 0)
    return cover
