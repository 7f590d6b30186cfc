"""Batch compiler == per-cluster compiler, field for field."""

import numpy as np

from bayestyper_tpu.graph.batch_compiler import compile_clusters_batch
from bayestyper_tpu.graph.clustering import cluster_variants
from bayestyper_tpu.graph.compiler import compile_cluster
from bayestyper_tpu.graph.variants import NormalizedVariant

from .util_sim import random_genome

K = 31


def _nv(chrom, pos, ref, alts):
    return NormalizedVariant(
        chrom=chrom, pos=pos, ids=[], ref=ref, alts=list(alts),
        has_dependency=False, origins=["."] * len(alts),
    )


def test_batch_matches_per_cluster():
    rng = np.random.default_rng(11)
    genome = random_genome(rng, 40000)
    chrom = genome.names[0]
    seq = genome[chrom].decode()

    variants = []
    pos = 500
    # isolated SNVs (fast path), multiallelic SNV, indels, dense pair,
    # a deletion, an insertion — a mix of shapes
    for i in range(10):
        rb = seq[pos]
        alts = [c for c in "ACGT" if c != rb]
        variants.append(_nv(chrom, pos, rb, alts[: 1 + (i % 3)]))
        pos += 400
    variants.append(_nv(chrom, pos, seq[pos : pos + 6], seq[pos]))  # del
    pos += 400
    variants.append(_nv(chrom, pos, seq[pos], seq[pos] + "ACGTAC"))  # ins
    pos += 400
    # dense pair within one k-window (multi-variant cluster)
    rb1, rb2 = seq[pos], seq[pos + 9]
    variants.append(_nv(chrom, pos, rb1, [c for c in "ACGT" if c != rb1][:1]))
    variants.append(
        _nv(chrom, pos + 9, rb2, [c for c in "ACGT" if c != rb2][:1])
    )
    # variant at the chromosome start (clamped flank)
    rb0 = seq[3]
    variants.insert(0, _nv(chrom, 3, rb0, [c for c in "ACGT" if c != rb0][:1]))

    clusters = cluster_variants(sorted(variants, key=lambda v: v.pos), K)
    for i, cl in enumerate(clusters):
        cl.cluster_id = i

    batch = compile_clusters_batch(clusters, genome, K)
    for cl, got in zip(clusters, batch):
        want = compile_cluster(cl, genome[chrom], K)
        assert got.cluster_id == want.cluster_id
        np.testing.assert_array_equal(got.kmer_hi, want.kmer_hi)
        np.testing.assert_array_equal(got.kmer_lo, want.kmer_lo)
        np.testing.assert_array_equal(got.mult, want.mult)
        np.testing.assert_array_equal(got.member, want.member)
        np.testing.assert_array_equal(got.hap_allele, want.hap_allele)
        assert got.non_covered_alleles == want.non_covered_alleles
        np.testing.assert_array_equal(got.retains, want.retains)


def test_batch_chunk_boundaries(monkeypatch):
    """Tiny chunk limits force multi-chunk processing; results unchanged."""
    import bayestyper_tpu.graph.batch_compiler as bc

    rng = np.random.default_rng(12)
    genome = random_genome(rng, 20000)
    chrom = genome.names[0]
    seq = genome[chrom].decode()
    variants = []
    pos = 300
    for _ in range(12):
        rb = seq[pos]
        variants.append(_nv(chrom, pos, rb, [c for c in "ACGT" if c != rb][:1]))
        pos += 300
    clusters = cluster_variants(variants, K)
    for i, cl in enumerate(clusters):
        cl.cluster_id = i

    ref = compile_clusters_batch(clusters, genome, K)
    monkeypatch.setattr(bc, "_CHUNK_BYTES", 256)
    monkeypatch.setattr(bc, "_CHUNK_CLUSTERS", 3)
    got = compile_clusters_batch(clusters, genome, K)
    for a, b in zip(got, ref):
        np.testing.assert_array_equal(a.kmer_hi, b.kmer_hi)
        np.testing.assert_array_equal(a.mult, b.mult)
        np.testing.assert_array_equal(a.member, b.member)
