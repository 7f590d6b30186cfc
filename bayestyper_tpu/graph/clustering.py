"""Variant clustering: groups, flank-map clusters, containment forest,
intercluster regions.

Equivalent of the clustering half of VariantFileParser:

  * GROUPS: variants whose k-1 influence regions (incl. CNV tail extensions)
    chain together form one variant cluster group — the unit the reference
    closes when `cur_position - cur_group_end_position >= k`
    (VariantFileParser.cpp:466-470).
  * CLUSTERS within a group: the flank-map adjacency (clusterVariants,
    VariantFileParser.cpp:735-978 + mergeVariantClusters:1003-1042) — a
    variant joins a cluster when its position or one of its per-alt ref end
    positions is within k of one of that cluster's flank points, or when it
    spans a flank point. Variants deep inside a long allele (>= k from every
    flank) form SEPARATE clusters of the same group.
  * CONTAINMENT forest: a cluster strictly inside another cluster's
    [start, end] span depends on its smallest container
    (getVariantClusterGroupDependencies, VariantFileParser.cpp:1108-1160);
    the Gibbs engine samples children conditionally on the parent's outcome
    with ploidy demotion (VariantClusterGroup.cpp:236-250).
  * INTERCLUSTER regions: reference sequence between groups, trimmed so no
    region k-mer reaches a cluster's influence zone
    (addSequenceToInterclusterRegions, VariantFileParser.cpp:173-183).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..constants import KMER_SIZE


@dataclass
class VariantCluster:
    chrom: str
    variants: list = field(default_factory=list)   # NormalizedVariant, pos-sorted
    cluster_id: int = -1
    # group/containment structure
    group_id: int = -1
    group_size: int = 1
    parent_id: int = -1        # cluster_id of the smallest container, -1 = root
    children_ids: list = field(default_factory=list)
    depth: int = 0
    group_start: int = 0       # group region bounds (over all clusters)
    group_end: int = 0

    @property
    def start(self):
        return self.variants[0].pos

    @property
    def end(self):
        return max(v.end for v in self.variants)

    @property
    def influence_end(self):
        """End of the cluster's k-mer influence incl. copy-number tail
        extensions (VariantFileParser.cpp:173-183 tracks the CNV-extended
        region so parameter k-mers avoid duplication-influenced sequence)."""
        return max(v.influence_end for v in self.variants)

    @property
    def region(self):
        return f"{self.chrom}:{self.start + 1}-{self.end}"

    @property
    def group_region(self):
        return f"{self.chrom}:{self.group_start + 1}-{self.group_end}"


def _split_into_groups(variants, kmer_size):
    """Gap >= k between influence regions closes a group
    (VariantFileParser.cpp:466-470).

    Vectorised: the loop's running `current_end` is exactly the cumulative
    max of influence ends, so group boundaries are one `maximum.accumulate`
    + compare instead of a Python pass over every variant."""
    n = len(variants)
    if n == 0:
        return []
    pos = np.fromiter((v.pos for v in variants), np.int64, n)
    if np.any(pos[1:] < pos[:-1]):
        order = np.argsort(pos, kind="stable")
        variants = [variants[i] for i in order]
        pos = pos[order]
    infl = np.fromiter((v.influence_end for v in variants), np.int64, n)
    run_end = np.maximum.accumulate(infl)
    starts = np.flatnonzero(
        np.concatenate(([True], pos[1:] - run_end[:-1] >= kmer_size))
    )
    bounds = np.append(starts, n)
    return [
        variants[bounds[i] : bounds[i + 1]] for i in range(len(starts))
    ]


class _Cluster:
    __slots__ = ("variants", "left", "right", "root")

    def __init__(self, v):
        self.variants = [v]
        self.left = v.pos
        self.right = max(v.end_positions)
        self.root = self

    def find(self):
        r = self
        while r.root is not r:
            r = r.root
        # path compression
        c = self
        while c.root is not r:
            c.root, c = r, c.root
        return r


def _flank_clusters(group_variants, kmer_size):
    """Reference flank-map clustering within one group (clusterVariants).

    Returns the list of merged _Cluster roots in position order."""
    k = kmer_size
    flanks = {}        # flank position -> _Cluster
    clusters = []

    for v in group_variants:
        pos = v.pos
        ends = v.end_positions

        # drop flanks passed by >= k (VariantFileParser.cpp:742-752)
        for f in [f for f in flanks if pos - f >= k]:
            del flanks[f]

        overlaps = []
        for f, cl in flanks.items():
            hit = abs(pos - f) + 1 <= k
            if not hit:
                for e in ends:
                    if abs(e - f) + 1 <= k or (pos < f and e > f):
                        hit = True
                        break
            if hit:
                overlaps.append(cl.find())

        if not overlaps:
            cl = _Cluster(v)
            clusters.append(cl)
        else:
            # dedupe while keeping first-overlap ordering
            seen = []
            for c in overlaps:
                if c not in seen:
                    seen.append(c)
            cl = seen[0]
            cl.variants.append(v)
            cl.right = max(cl.right, max(ends))
            for other in seen[1:]:
                # union-merge (merge sets, mergeVariantClusters)
                other.find().root = cl.find()

        for e in ends:
            flanks[e] = cl
        if max(ends) - pos >= k:
            flanks[pos] = cl

    # resolve union-find: merge variant lists into roots
    final = []
    for cl in clusters:
        r = cl.find()
        if r is cl:
            final.append(cl)
        else:
            r.variants.extend(cl.variants)
            r.left = min(r.left, cl.left)
            r.right = max(r.right, cl.right)
    for cl in final:
        cl.variants.sort(key=lambda v: (v.pos, -len(v.ref)))
        cl.left = cl.variants[0].pos
        cl.right = max(max(v.end_positions) for v in cl.variants)
    final.sort(key=lambda c: c.left)
    return final


def cluster_variants(variants, kmer_size: int = KMER_SIZE):
    """Group position-sorted variants of one chromosome into clusters with
    group + containment structure. Returns VariantClusters in position order;
    cluster_id is assigned by the caller (ids here are group-local until
    then, so parent/children links use list indices fixed up afterwards)."""
    out = []
    for gid, gvars in enumerate(_split_into_groups(variants, kmer_size)):
        if len(gvars) == 1:
            # singleton group (the dominant case): one cluster, no flank
            # machinery, no containment
            v = gvars[0]
            vc = VariantCluster(chrom=v.chrom, variants=list(gvars))
            vc.group_id = gid
            vc.group_size = 1
            vc.group_start = v.pos
            vc.group_end = v.end
            out.append([vc])
            continue
        raw = _flank_clusters(gvars, kmer_size)
        vcs = [
            VariantCluster(chrom=gvars[0].chrom, variants=c.variants)
            for c in raw
        ]
        group_start = min(c.left for c in raw)
        group_end = max(max(v.end for v in vc.variants) for vc in vcs)
        for vc, c in zip(vcs, raw):
            vc.group_id = gid
            vc.group_size = len(vcs)
            vc.group_start = group_start
            vc.group_end = group_end

        # containment forest: smallest strictly-containing cluster
        # (getVariantClusterGroupDependencies, VariantFileParser.cpp:1108-1160)
        spans = [(c.left, c.right) for c in raw]
        for i, (li, ri) in enumerate(spans):
            parent = -1
            for j, (lj, rj) in enumerate(spans):
                if i != j and lj < li and ri < rj:
                    if parent == -1 or (
                        spans[parent][0] < lj and rj < spans[parent][1]
                    ):
                        parent = j
            vcs[i].parent_id = parent  # group-local index for now
        for i, vc in enumerate(vcs):
            if vc.parent_id >= 0:
                vcs[vc.parent_id].children_ids.append(i)
        # depths
        def _depth(i):
            d = 0
            p = vcs[i].parent_id
            while p >= 0:
                d += 1
                p = vcs[p].parent_id
            return d

        for i, vc in enumerate(vcs):
            vc.depth = _depth(i)
        out.append(vcs)

    # flatten; remap group-local parent/children indices to positions in the
    # flat list (caller overwrites cluster_id with global ids and calls
    # finalize_cluster_links)
    flat = []
    for vcs in out:
        base = len(flat)
        for vc in vcs:
            if vc.parent_id >= 0:
                vc.parent_id += base
            vc.children_ids = [c + base for c in vc.children_ids]
        flat.extend(vcs)
    return flat


def finalize_cluster_links(all_clusters):
    """After the caller assigns global cluster_ids (list order), rewrite
    parent/children links from list indices to cluster_ids."""
    for cl in all_clusters:
        if cl.parent_id >= 0:
            cl.parent_id = all_clusters[cl.parent_id].cluster_id
        cl.children_ids = [all_clusters[c].cluster_id for c in cl.children_ids]
    return all_clusters


def mark_group_dependencies(all_clusters):
    """Set has_dependency on variants of nested (child) clusters: the parent
    spans them, so they carry the trailing `*` missing allele
    (VariantInfo.hpp:79-82; demoted copies map to it,
    haplotypeToAlleleIndex VariantClusterGenotyper.cpp:208-219)."""
    for cl in all_clusters:
        if cl.parent_id >= 0:
            for v in cl.variants:
                v.has_dependency = True
    return all_clusters


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
            prev_end = max(prev_end, cl.influence_end + (kmer_size - 1))
        if length - prev_end >= kmer_size:
            regions.append((chrom, prev_end, length))
    return regions
