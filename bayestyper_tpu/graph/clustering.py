"""Variant clustering + intercluster region bookkeeping.

Equivalent of the clustering half of VariantFileParser
(clusterVariants/mergeVariantClusters, VariantFileParser.cpp:735-1042 and
addSequenceToInterclusterRegions:173-183): variants whose k-1 influence
flanks touch are merged into one VariantCluster; the reference sequence
between clusters (plus decoys) forms the intercluster regions that supply
parameter k-mers and intercluster multiplicities.

Round-1 scope note: nested clusters (a variant contained inside another's
reference span spawning a cluster-group DAG, getVariantClusterGroupDependencies
VariantFileParser.cpp:1108-1160) are flattened — contained variants join the
same cluster. TODO(nested): split oversized containments into nested groups.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..constants import KMER_SIZE


@dataclass
class VariantCluster:
    chrom: str
    variants: list = field(default_factory=list)   # NormalizedVariant, pos-sorted
    cluster_id: int = -1

    @property
    def start(self):
        return self.variants[0].pos

    @property
    def end(self):
        return max(v.end for v in self.variants)

    @property
    def region(self):
        return f"{self.chrom}:{self.start + 1}-{self.end}"


def cluster_variants(variants, kmer_size: int = KMER_SIZE):
    """Group position-sorted variants of one chromosome into clusters.

    Two variants share a cluster when their k-mer influence regions overlap:
    gap between reference spans < kmer_size (the reference merges via a
    flank map keyed on pos +- k, VariantFileParser.cpp:735-978).
    """
    clusters = []
    current = None
    current_end = -(10 * kmer_size)
    for v in sorted(variants, key=lambda x: x.pos):
        if current is not None and v.pos < current_end + kmer_size:
            current.variants.append(v)
            current_end = max(current_end, v.influence_end)
        else:
            current = VariantCluster(chrom=v.chrom, variants=[v])
            clusters.append(current)
            current_end = v.influence_end
    return clusters


def intercluster_regions(genome, clusters_by_chrom, kmer_size: int = KMER_SIZE):
    """Reference regions between clusters, trimmed so no k-mer crosses into a
    cluster's influence zone (addSequenceToInterclusterRegions,
    VariantFileParser.cpp:173-183). Decoy chromosomes are whole regions.

    Returns [(chrom, start, end)] with 0-based half-open coordinates.
    """
    regions = []
    for chrom in genome.names:
        length = len(genome[chrom])
        if genome.is_decoy(chrom):
            regions.append((chrom, 0, length))
            continue
        clusters = clusters_by_chrom.get(chrom, [])
        prev_end = 0
        for cl in sorted(clusters, key=lambda c: c.start):
            start = max(prev_end, 0)
            # stop k-1 short of the cluster so no region k-mer overlaps it
            end = max(cl.start - (kmer_size - 1), start)
            if end - start >= kmer_size:
                regions.append((chrom, start, end))
            prev_end = max(prev_end, cl.end + (kmer_size - 1))
        if length - prev_end >= kmer_size:
            regions.append((chrom, prev_end, length))
    return regions
