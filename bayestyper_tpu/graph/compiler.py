"""Cluster compiler: variant clusters -> haplotype paths -> dense k-mer
tensors ready for bucketing.

This is the reference's VariantClusterGraph re-targeted to emit tensors
instead of serialized C++ object graphs:

  * path enumeration with per-sample bloom-scored beam search replaces the
    boost-graph DP (findSamplePaths/mergePaths/filterPaths,
    VariantClusterGraph.cpp:389-724): paths are built variant-by-variant over
    the cluster's reference span with k-1 flanks; when the combinatorial
    space exceeds the beam, candidates are ranked per sample by the fraction
    of their k-mers present in that sample's read bloom (the same score as
    VariantClusterGraphPath.cpp:89-130) and the top max_sample_haplotypes
    kept; the union over samples is deduplicated (addPathIndices,
    VariantClusterGraph.cpp:726-798).
  * k-mer accounting (countPathKmers/getHaplotypeCandidates,
    VariantClusterGraph.cpp:800-846, 941-1135) becomes: canonical lane pairs
    per path via the vectorised extractor, a union table, a [K, H] uint8
    multiplicity matrix (capped at 127, :911-925), and a [K, V, H] member
    tensor marking k-mers that cross a variant's span on a haplotype
    (updateVariantPathIndices, :1137-1184).

Variants overlapping a consumed span on a path get the cluster's missing
allele when they carry one (`*`), else the path is constrained to their
reference allele. Nested containment proper (parent/child clusters with
retain tables and conditional ploidy demotion) is handled by the
`child_spans` argument here plus `gibbs.genotype_nested` downstream.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..constants import (
    KMER_SIZE,
    MAX_HAPLOID_MULTIPLICITY,
    MAX_SAMPLE_HAPLOTYPES,
)
from ..ops.kmers import encode_bases, kmer_lanes
from .clustering import VariantCluster


@dataclass
class HaplotypePath:
    allele_indices: list          # per variant: allele index (missing -> num_alleles-1)
    seq: str                      # full path sequence incl. k-1 flanks; 'N'
                                  # separators mark nested-cluster skips (the
                                  # reference's disconnected placeholder
                                  # vertices, VariantClusterGraph.cpp:173-225 —
                                  # no k-mer crosses the break)
    variant_spans: list           # per variant: (start, end) in path coords, or None
    retained_children: frozenset = frozenset()  # child indices this path
                                  # keeps (reference route across the nested
                                  # region -> no ploidy demotion)


@dataclass
class CompiledCluster:
    """Host-side compiled cluster (counts attached at genotype time)."""

    cluster_id: int
    chrom: str
    variants: list                # NormalizedVariant
    hap_allele: np.ndarray        # [H, V] int16
    kmer_hi: np.ndarray           # [K] uint64 canonical lanes
    kmer_lo: np.ndarray
    mult: np.ndarray              # [K, H] uint8
    member: np.ndarray            # [K, V, H] bool
    non_covered_alleles: list = field(default_factory=list)  # per variant
    # group / containment structure (VariantClusterGroup)
    group_id: int = -1
    group_size: int = 1
    group_region: str = ""
    parent_id: int = -1           # cluster_id of the containing cluster
    children_ids: list = field(default_factory=list)
    depth: int = 0
    retains: np.ndarray | None = None  # [H, n_children] bool: haplotype keeps
                                  # the nested child region (no demotion)
    # arena-level precomputes (views into the batch compiler's chunk arrays;
    # None when compiled one-at-a-time) — finalise consumes them so it never
    # reduces per-cluster tensors in a Python loop
    member_any: np.ndarray | None = None  # [K] bool: member.any(axis=(1,2))
    mult_max: np.ndarray | None = None    # [K] uint8: mult.max(axis=1)


def mark_dependencies(variants):
    """Set has_dependency on variants that can be overlapped by another
    variant's reference span inside the cluster — those need the trailing
    `*` missing allele on paths where the overlapping allele was taken
    (the reference's nested-variant dependency, VariantFileParser.cpp:342-377
    + VariantInfo.hpp:79-82)."""
    for i, v in enumerate(variants):
        if v.has_dependency:
            continue
        for u in variants:
            if u is not v and u.pos < v.pos and u.end > v.pos:
                v.has_dependency = True
                break
    return variants


def _fill_reference(chrom_seq, cursor, target, child_spans, retained):
    """Reference-route gap fill [cursor, target): nested child regions are
    skipped with an 'N' break (no k-mer crosses; the reference's disconnected
    vertex semantics, VariantClusterGraph.cpp:173-225) and recorded as
    retained (the route keeps the child region intact)."""
    parts = []
    cur = cursor
    for idx, (cs, ce) in enumerate(child_spans):
        if cs >= target or ce < cur or cs < cur:
            continue
        parts.append(chrom_seq[cur:cs].decode())
        parts.append("N")
        retained.add(idx)
        cur = ce + 1
    parts.append(chrom_seq[cur:target].decode())
    return parts, max(cur, min(target, cur))


def enumerate_paths(cluster: VariantCluster, chrom_seq: bytes,
                    kmer_size: int = KMER_SIZE,
                    sample_blooms=None,
                    max_sample_haplotypes: int = MAX_SAMPLE_HAPLOTYPES,
                    beam_limit: int | None = None,
                    child_spans=()):
    """Build candidate haplotype paths for one cluster.

    sample_blooms: list of KmerBloomFilter (one per sample) used for beam
    scoring when the allele product exceeds the beam; None = enumerate all up
    to beam_limit and truncate deterministically.
    child_spans: 0-based INCLUSIVE (start, end) spans of nested child
    clusters; reference routes across them are segmented and flagged.
    """
    variants = sorted(cluster.variants, key=lambda v: (v.pos, -len(v.ref)))
    flank = kmer_size - 1
    left = max(cluster.start - flank, 0)
    right = min(cluster.end + flank, len(chrom_seq))

    if beam_limit is None:
        n_samples = len(sample_blooms) if sample_blooms else 1
        beam_limit = max_sample_haplotypes * max(n_samples, 1) * 4

    # partial paths: (allele_indices, seq_parts, cursor, spans, retained)
    # cursor = next reference position to consume
    initial = ([], [chrom_seq[left:variants[0].pos].decode()],
               variants[0].pos, [], frozenset())
    beams = [initial]

    for vi, v in enumerate(variants):
        new_beams = []
        for alleles, parts, cursor, spans, retained in beams:
            if v.pos < cursor:
                # overlapped by an upstream allele already consumed past here:
                # missing allele if the variant carries one, else ref-as-consumed
                idx = v.num_alleles - 1 if v.has_dependency else 0
                new_beams.append(
                    (alleles + [idx], parts, cursor, spans + [None], retained)
                )
                continue
            ret = set(retained)
            gap_parts, _ = _fill_reference(
                chrom_seq, cursor, v.pos, child_spans, ret
            )
            ret = frozenset(ret)
            gap_len = sum(len(p) for p in gap_parts)
            for a_idx in range(1 + len(v.alts)):
                pos_in_path = sum(len(p) for p in parts) + gap_len
                if a_idx == 0:
                    # reference allele consumes nothing: downstream gap fill
                    # provides the reference bases, so variants interior to
                    # this one's span can still vary on ref paths (the
                    # reference splits its graph vertices the same way,
                    # VariantClusterGraph.cpp:62-282)
                    new_beams.append(
                        (
                            alleles + [0],
                            parts + gap_parts,
                            v.pos,
                            spans + [(pos_in_path, pos_in_path + len(v.ref))],
                            ret,
                        )
                    )
                    continue
                seq = v.alts[a_idx - 1]
                new_beams.append(
                    (
                        alleles + [a_idx],
                        parts + gap_parts + [seq],
                        v.end,
                        spans + [(pos_in_path, pos_in_path + len(seq))],
                        ret,
                    )
                )
        beams = new_beams
        if len(beams) > beam_limit:
            beams = _prune_beams(
                beams, sample_blooms, kmer_size, max_sample_haplotypes, beam_limit
            )

    paths = []
    seen = set()
    for alleles, parts, cursor, spans, retained in beams:
        ret = set(retained)
        tail_parts, _ = _fill_reference(
            chrom_seq, cursor, right, child_spans, ret
        )
        key = tuple(alleles)
        if key in seen:
            continue
        seen.add(key)
        paths.append(
            HaplotypePath(
                allele_indices=list(alleles),
                seq="".join(parts) + "".join(tail_parts),
                variant_spans=list(spans),
                retained_children=frozenset(ret),
            )
        )
    return paths


def _bloom_score(seq: str, bloom, kmer_size: int) -> float:
    """Fraction of the sequence's k-mers present in the bloom
    (VariantClusterGraphPath.cpp:36-87 kmer_score)."""
    codes, valid = encode_bases(seq.encode())
    hi, lo, ok = kmer_lanes(codes, valid, kmer_size)
    if not ok.any():
        return 0.0
    hits = bloom.contains(hi[ok], lo[ok])
    return float(hits.mean())


def _prune_beams(beams, sample_blooms, kmer_size, max_sample_haplotypes, beam_limit):
    """Per-sample top-k by bloom score of the partial sequence, unioned
    (two-phase filterPaths analogue, VariantClusterGraph.cpp:631-724)."""
    if not sample_blooms:
        return beams[:beam_limit]
    seqs = ["".join(parts) for _, parts, _, _, _ in beams]
    keep = set()
    for bloom in sample_blooms:
        scores = np.array([_bloom_score(s, bloom, kmer_size) for s in seqs])
        top = np.argsort(-scores, kind="stable")[:max_sample_haplotypes]
        keep.update(top.tolist())
    kept = sorted(keep)
    return [beams[i] for i in kept[:beam_limit]]


def compile_cluster(cluster: VariantCluster, chrom_seq: bytes,
                    kmer_size: int = KMER_SIZE,
                    sample_blooms=None,
                    max_sample_haplotypes: int = MAX_SAMPLE_HAPLOTYPES,
                    child_spans=()) -> CompiledCluster:
    """Paths -> k-mer multiplicity matrix + member tensor.

    child_spans: inclusive (start, end) spans of nested child clusters (one
    per entry of cluster.children_ids, same order)."""
    variants = mark_dependencies(
        sorted(cluster.variants, key=lambda v: (v.pos, -len(v.ref)))
    )
    paths = enumerate_paths(
        cluster, chrom_seq, kmer_size, sample_blooms, max_sample_haplotypes,
        child_spans=child_spans,
    )
    h = len(paths)
    v = len(variants)
    assert h > 0
    n_children = len(child_spans)
    retains = np.zeros((h, n_children), dtype=bool)
    for pi, p in enumerate(paths):
        for idx in p.retained_children:
            retains[pi, idx] = True

    hap_allele = np.zeros((h, v), dtype=np.int16)
    per_path = []
    for pi, p in enumerate(paths):
        hap_allele[pi] = p.allele_indices
        codes, valid = encode_bases(p.seq.encode())
        hi, lo, ok = kmer_lanes(codes, valid, kmer_size)
        per_path.append((hi, lo, ok, p.variant_spans))

    # union of canonical kmers across paths
    all_hi = np.concatenate([x[0][x[2]] for x in per_path]) if per_path else np.zeros(0, np.uint64)
    all_lo = np.concatenate([x[1][x[2]] for x in per_path]) if per_path else np.zeros(0, np.uint64)
    order = np.lexsort((all_lo, all_hi))
    uh, ul = all_hi[order], all_lo[order]
    if len(uh):
        first = np.ones(len(uh), bool)
        first[1:] = (uh[1:] != uh[:-1]) | (ul[1:] != ul[:-1])
        uh, ul = uh[first], ul[first]
    k = len(uh)

    mult = np.zeros((k, h), dtype=np.uint8)
    member = np.zeros((k, v, h), dtype=bool)
    for pi, (hi, lo, ok, spans) in enumerate(per_path):
        pos_ok = np.flatnonzero(ok)
        if not len(pos_ok):
            continue
        khi, klo = hi[pos_ok], lo[pos_ok]
        idx = _lookup(uh, ul, khi, klo)
        occ = np.bincount(idx, minlength=k)
        mult[:, pi] = np.clip(occ, 0, MAX_HAPLOID_MULTIPLICITY)
        for vi, span in enumerate(spans):
            if span is None:
                continue
            a, b = span
            if a == b:  # pure deletion: the junction point
                a, b = a - 1, b + 1
            overlap = (pos_ok < b) & (pos_ok + kmer_size > a)
            member[idx[overlap], vi, pi] = True

    # Missing-allele stats inheritance (addHaplotypeKmerStats,
    # VariantClusterHaplotypes.cpp:330-350): when a haplotype's allele at a
    # variant is the `*` missing allele, its NAK/FAK/MAC stats come from the
    # haplotype's last non-missing upstream variant — implemented as a
    # member-tensor redirect so the device stats code needs no special case.
    for pi in range(h):
        last_non_missing = -1
        for vi, var in enumerate(variants):
            a = hap_allele[pi, vi]
            if var.has_dependency and a == var.num_alleles - 1:
                if last_non_missing >= 0:
                    member[:, vi, pi] = member[:, last_non_missing, pi]
            else:
                last_non_missing = vi

    non_covered = []
    for vi, var in enumerate(variants):
        covered = set(hap_allele[:, vi].tolist())
        if var.has_dependency:
            covered.add(var.num_alleles - 1)
        non_covered.append(
            [a for a in range(var.num_alleles) if a not in covered]
        )

    return CompiledCluster(
        cluster_id=cluster.cluster_id,
        chrom=cluster.chrom,
        variants=variants,
        hap_allele=hap_allele,
        kmer_hi=uh,
        kmer_lo=ul,
        mult=mult,
        member=member,
        non_covered_alleles=non_covered,
        group_id=cluster.group_id,
        group_size=cluster.group_size,
        group_region=cluster.group_region,
        parent_id=cluster.parent_id,
        children_ids=list(cluster.children_ids),
        depth=cluster.depth,
        retains=retains,
    )


def _lookup(sorted_hi, sorted_lo, hi, lo):
    """Indices of (hi, lo) in the sorted lane table (all must be present)."""
    from ..ops.kmers import lane_search

    out = lane_search(sorted_hi, sorted_lo, hi, lo)
    assert (out >= 0).all()
    return out
