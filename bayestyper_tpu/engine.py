"""Pipeline engine: the `cluster` and `genotype` phases.

Orchestrates the full reference pipeline (main.cpp:80-661 call stacks, SURVEY
§3.1-3.2) with the TPU-era split: irregular host work (VCF parse, clustering,
path enumeration, k-mer table assembly) in vectorised numpy; the Gibbs
sampler and posterior statistics as jit'd bucket programs on device.

Cluster phase (bayesTyper cluster, main.cpp:196-353):
  parse + normalise + cluster variants -> compile clusters (bloom-scored
  paths, k-mer matrices) -> multigroup/decoy exclusion -> intercluster
  multiplicities -> parameter k-mer sampling -> unit artifact on disk.

Genotype phase (bayesTyper genotype, main.cpp:360-647):
  load unit -> per-sample KMC counts for member k-mers (sorted-lane binary
  search replacing the mutex-striped HybridHash) -> NB fit from parameter
  k-mers -> noise estimation chains -> bucketed Gibbs genotyping -> VCF.
"""

from __future__ import annotations

import dataclasses
import functools
import os
import pickle
import time
from collections import defaultdict

import numpy as np

from .constants import (
    GIBBS_BURN_IN,
    GIBBS_SAMPLES,
    KMER_SIZE,
    KMER_SUBSAMPLING_RATE,
    MAX_HAPLOID_MULTIPLICITY,
    MAX_SAMPLE_HAPLOTYPES,
    MIN_GENOTYPE_POSTERIOR,
    MIN_NUMBER_OF_KMERS,
    NOISE_ESTIMATION_VARIANTS,
    NOISE_RATE_PRIOR_SCALE,
    NOISE_RATE_PRIOR_SHAPE,
    NUM_GIBBS_CHAINS,
    GENDER_FEMALE,
    MISSING,
)
from .graph.clustering import (
    cluster_variants,
    finalize_cluster_links,
    intercluster_regions,
    mark_group_dependencies,
)
from .graph.compiler import CompiledCluster, compile_cluster
from .graph.variants import normalize_variant
from .io.fasta import Genome
from .io.kmc import KmcReader
from .io.samples import ChromosomePloidy
from .io.vcf import VcfReader
from .model.count_model import fit_genomic_nb
from .ops.kmers import encode_bases, kmer_lanes
from .writer import GenotypeVcfWriter, VariantGenotypeRecord


_LOG_TIMING = os.environ.get("BT_TIMING") == "1"
_log_prev = [None]


def _log(msg):
    if _LOG_TIMING:
        now = time.perf_counter()
        dt = 0.0 if _log_prev[0] is None else now - _log_prev[0]
        _log_prev[0] = now
        print(f"[{time.strftime('%d/%m/%Y %H:%M:%S')}] (+{dt:6.2f}s) {msg}",
              flush=True)
        return
    print(f"[{time.strftime('%d/%m/%Y %H:%M:%S')}] {msg}", flush=True)


def _log_rss(phase: str):
    """Peak + current RSS after each major phase (the reference logs max
    resident set size the same way, Utils.hpp:126-135 getMaxMemoryUsage;
    current RSS separates the phase's own footprint from earlier peaks,
    e.g. an in-process simulation)."""
    import resource

    rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    cur = ""
    try:
        with open("/proc/self/statm") as fh:
            pages = int(fh.read().split()[1])
        cur = f", now {pages * 4096 / 1e9:.2f} GB"
    except OSError:
        pass
    _log(f"[{phase}] peak RSS {rss:.2f} GB{cur}")


class _Profiler:
    """Optional JAX profiler trace around the genotype phase: set
    BT_PROFILE_DIR=<dir> to capture a TensorBoard-readable trace (SURVEY §5
    TPU observability plan)."""

    def __enter__(self):
        import os

        self.dir = os.environ.get("BT_PROFILE_DIR")
        if self.dir:
            import jax

            jax.profiler.start_trace(self.dir)
            _log(f"JAX profiler trace -> {self.dir}")
        return self

    def __exit__(self, *exc):
        if self.dir:
            import jax

            jax.profiler.stop_trace()
            _log(f"JAX profiler trace written to {self.dir}")


# ---------------------------------------------------------------------------
# sorted lane-pair tables (host analogue of the reference's HybridHash:
# sorted leaves + binary search, HybridHash.hpp/LinearMap.tpp)
# ---------------------------------------------------------------------------

class LaneTable:
    """Sorted (hi, lo) lane pairs with vectorised lookup."""

    def __init__(self, hi, lo):
        order = np.lexsort((lo, hi))
        self.hi = np.ascontiguousarray(hi[order])
        self.lo = np.ascontiguousarray(lo[order])

    def __len__(self):
        return len(self.hi)

    @classmethod
    def from_unsorted_unique(cls, hi, lo):
        from . import native

        if native.available() and len(hi):
            # MSB-bucketed sort+unique (bt_pair_unique) — the 2-key lexsort
            # was ~1.3s of every genotype phase at unit scale
            _, rep = native.pair_unique(hi, lo)
            t = cls.__new__(cls)
            t.hi = np.ascontiguousarray(hi[rep])
            t.lo = np.ascontiguousarray(lo[rep])
            return t
        t = cls(hi, lo)
        if len(t.hi):
            keep = np.ones(len(t.hi), bool)
            keep[1:] = (t.hi[1:] != t.hi[:-1]) | (t.lo[1:] != t.lo[:-1])
            t.hi, t.lo = t.hi[keep], t.lo[keep]
        return t

    def lookup(self, hi, lo):
        """Index of each query in the table, -1 if absent."""
        if len(self.hi) == 0 or len(hi) == 0:
            return np.full(len(hi), -1, dtype=np.int64)
        from . import native

        if native.available():
            roots = getattr(self, "_roots", None)
            if roots is None:
                roots = native.build_lane_roots(self.hi)
                self._roots = roots
            return native.lane_lookup_rooted(
                self.hi, self.lo, roots[0], roots[1], hi, lo
            )
        from .ops.kmers import lane_search

        return lane_search(self.hi, self.lo, hi, lo)

    def contains(self, hi, lo):
        return self.lookup(hi, lo) >= 0

    def lookup_sparse(self, hi, lo):
        """Lookup tuned for MISS-HEAVY query streams (the intercluster
        genome scan: most region k-mers are not path k-mers). A 2^22-slot
        byte map over the hi-prefix (fits L2) rejects most misses with one
        cached load each; only survivors pay the DRAM binary search. When
        the table is dense enough to SATURATE the map (high-variant-density
        units: >50% of slots set rejects too little to pay for the
        mask/compact/scatter passes), the prefilter is skipped and queries
        go straight to the rooted search. Same results as lookup()."""
        if len(self.hi) == 0 or len(hi) == 0:
            return np.full(len(hi), -1, dtype=np.int64)
        pf = getattr(self, "_prefilter", None)
        if pf is None:
            bits = 22
            shift = np.uint64(54 - bits)  # hi holds the top 54-bit half
            pf_map = np.zeros(1 << bits, np.bool_)
            pf_map[(self.hi >> shift).astype(np.int64)] = True
            if pf_map.mean() > 0.5:
                pf = "dense"
            else:
                pf = (pf_map, shift)
            self._prefilter = pf
        if pf == "dense":
            return self.lookup(hi, lo)
        pf_map, shift = pf
        maybe = pf_map[(hi >> shift).astype(np.int64)]
        idx = np.full(len(hi), -1, dtype=np.int64)
        mi = np.flatnonzero(maybe)
        if len(mi):
            idx[mi] = self.lookup(hi[mi], lo[mi])
        return idx


# ---------------------------------------------------------------------------
# cluster phase
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class InferenceUnitData:
    """Serializable output of the cluster phase (the reference's
    variant_clusters.bin + _cluster_data analogue, main.cpp:266-294)."""

    kmer_size: int
    compiled: list                    # CompiledCluster (member-kmer filtered)
    regions: list                     # intercluster regions
    param_hi: np.ndarray              # parameter kmers
    param_lo: np.ndarray
    param_mult_female: np.ndarray     # intercluster multiplicity per gender
    param_mult_male: np.ndarray
    exclusion_stats: dict
    multigroup_hi: np.ndarray | None = None   # multigroup kmer lanes (for the
    multigroup_lo: np.ndarray | None = None   # reference artifact dump)

    def save(self, path: str):
        with open(path, "wb") as fh:
            pickle.dump(self, fh, protocol=5)

    @classmethod
    def load(cls, path: str):
        with open(path, "rb") as fh:
            return pickle.load(fh)


def _prefetch_iter(gen, depth=2):
    """Run a generator on a worker thread, `depth` items ahead: the genome
    k-mer extraction (native, GIL-released) overlaps the lookup+scatter
    consumption of the previous chunk on this 2-core host."""
    import queue
    import threading

    q = queue.Queue(maxsize=depth)
    _END = object()

    def worker():
        try:
            for item in gen:
                q.put(item)
            q.put(_END)
        except BaseException as e:  # surface in the consumer
            q.put(e)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            break
        if isinstance(item, BaseException):
            raise item
        yield item
    t.join()


def _scan_genome_kmers(genome, regions, kmer_size, chunk=4_000_000):
    """Yield (chrom, hi, lo) canonical lanes for region k-mers, chunked.

    Regions of one chromosome are concatenated with 'N' separators into
    chunk-sized buffers so one native extraction pass serves thousands of
    short intercluster regions (the separator invalidates cross-region
    k-mers, so the union of per-region k-mer multisets is preserved)."""
    from collections import defaultdict as _dd

    by_chrom = _dd(list)
    for chrom, start, end in regions:
        by_chrom[chrom].append((start, end))

    for chrom, spans in by_chrom.items():
        seq = genome[chrom]
        parts = []
        size = 0
        for start, end in spans:
            while start < end:
                stop = min(start + chunk, end)
                if stop - start < kmer_size:
                    break
                parts.append(seq[start:stop])
                size += stop - start + 1
                if size >= chunk:
                    codes, valid = encode_bases(b"N".join(parts))
                    hi, lo, ok = kmer_lanes(codes, valid, kmer_size)
                    yield chrom, hi[ok], lo[ok]
                    parts, size = [], 0
                start = stop - (kmer_size - 1) if stop < end else end
        if parts:
            codes, valid = encode_bases(b"N".join(parts))
            hi, lo, ok = kmer_lanes(codes, valid, kmer_size)
            yield chrom, hi[ok], lo[ok]


def run_cluster_phase(
    genome: Genome,
    samples,
    vcf_path: str,
    ploidy: ChromosomePloidy,
    sample_blooms=None,
    kmer_size: int = KMER_SIZE,
    max_sample_haplotypes: int = MAX_SAMPLE_HAPLOTYPES,
    max_parameter_kmers: int = 1_000_000,
    rng_seed: int = 1,
    max_allele_length: int | None = None,
    cnv_threshold: float | None = None,
    num_threads: int = 1,
) -> InferenceUnitData:
    from .constants import COPY_NUMBER_VARIANT_THRESHOLD, MAX_ALLELE_LENGTH

    import gc

    if max_allele_length is None:
        max_allele_length = MAX_ALLELE_LENGTH
    if cnv_threshold is None:
        cnv_threshold = COPY_NUMBER_VARIANT_THRESHOLD
    rng = np.random.default_rng(rng_seed)

    # the cluster phase allocates millions of small acyclic objects
    # (variants, clusters, compiled tensors); generational GC rescans cost
    # ~1/3 of its wall time at 1M variants — collect once at the end
    gc_was_enabled = gc.isenabled()
    gc.disable()
    try:
        return _run_cluster_phase_impl(
            genome, samples, vcf_path, ploidy, sample_blooms, kmer_size,
            max_sample_haplotypes, max_parameter_kmers, rng,
            max_allele_length, cnv_threshold, num_threads,
        )
    finally:
        if gc_was_enabled:
            gc.enable()


def _run_cluster_phase_impl(
    genome, samples, vcf_path, ploidy, sample_blooms, kmer_size,
    max_sample_haplotypes, max_parameter_kmers, rng, max_allele_length,
    cnv_threshold, num_threads,
):

    # 1. parse + normalise + cluster (VariantFileParser.cpp:185-1042)
    _log(f"Parsing variants from {vcf_path}")
    per_chrom = defaultdict(list)
    stats = defaultdict(int)
    reader = VcfReader(vcf_path, parse_samples=False)
    for vv in reader:
        nv, reasons = normalize_variant(
            vv, genome, max_allele_length=max_allele_length
        )
        for r in reasons.values():
            stats[r.value] += 1
        if nv is not None:
            # copy-number tail extension for long alleles (duplications pull
            # downstream reference copies into the cluster influence region,
            # VariantFileParser.cpp:485-494)
            if max(len(nv.ref), max(len(a) for a in nv.alts)) >= kmer_size:
                from .graph.variants import copy_number_variant_length

                chrom_seq = genome[nv.chrom]
                nv.cnv_extension = max(
                    copy_number_variant_length(
                        seq, chrom_seq, nv.end, kmer_size,
                        threshold=cnv_threshold,
                    )
                    for seq in [nv.ref] + nv.alts
                )
            per_chrom[nv.chrom].append(nv)
            stats["parsed"] += 1

    clusters_by_chrom = {}
    all_clusters = []
    for chrom, variants in per_chrom.items():
        cls = cluster_variants(variants, kmer_size)
        clusters_by_chrom[chrom] = cls
        all_clusters.extend(cls)
    for i, cl in enumerate(all_clusters):
        cl.cluster_id = i
    for cls in clusters_by_chrom.values():
        # parent/children links are per-chromosome list indices until here
        finalize_cluster_links(cls)
        mark_group_dependencies(cls)
    num_groups = len({(cl.chrom, cl.group_id) for cl in all_clusters})
    num_nested = sum(1 for cl in all_clusters if cl.parent_id >= 0)
    _log(
        f"Parsed {stats['parsed']} variants into {len(all_clusters)} clusters "
        f"in {num_groups} groups ({num_nested} nested) "
        f"(excluded: { {k: v for k, v in stats.items() if k != 'parsed'} })"
    )

    # 2. compile clusters: paths + kmer matrices, batched across clusters
    # (graph/batch_compiler.py — replaces the reference's strided `-p` thread
    # pool, KmerCounter.cpp:61-67, with global vectorised passes)
    from .graph.batch_compiler import compile_clusters_batch

    by_id = {cl.cluster_id: cl for cl in all_clusters}
    child_spans_by_id = {
        cl.cluster_id: [
            (by_id[cid].start, by_id[cid].end - 1) for cid in cl.children_ids
        ]
        for cl in all_clusters
        if cl.children_ids
    }
    compiled = compile_clusters_batch(
        all_clusters, genome, kmer_size, sample_blooms,
        max_sample_haplotypes, child_spans_by_id=child_spans_by_id, log=_log,
    )
    _log(f"Compiled {len(compiled)} cluster graphs")

    # 3. multigroup exclusion: kmers whose paths span >1 cluster group
    # (countPathMultigroupKmers, KmerCounter.cpp:105-169) — exact here.
    # One concatenation + one lexsort serves multigroup detection, the
    # all-path union table AND the per-cluster exclusion indices below.
    if compiled:
        cat_hi = np.concatenate([c.kmer_hi for c in compiled])
        cat_lo = np.concatenate([c.kmer_lo for c in compiled])
        lens = np.fromiter((len(c.kmer_hi) for c in compiled), np.int64,
                           len(compiled))
        offs = np.zeros(len(compiled) + 1, np.int64)
        np.cumsum(lens, out=offs[1:])
        member_any_all = np.concatenate([
            c.member_any if c.member_any is not None
            else c.member.any(axis=(1, 2))
            for c in compiled
        ])
        _log(f"Union pass over {len(cat_hi)} path kmer entries")

        from . import native

        if native.available() and len(cat_hi):
            # one fused sorted walk emits the union table, per-entry union
            # rows, multigroup flags and member flags (bt_multigroup_pass)
            midx_all, u_hi, u_lo, member_flags, ex_multi_all = \
                native.multigroup_pass(cat_hi, cat_lo, member_any_all)
        else:
            order = np.lexsort((cat_lo, cat_hi))
            sh, sl = cat_hi[order], cat_lo[order]
            first = np.ones(len(sh), bool)
            if len(sh):
                first[1:] = (sh[1:] != sh[:-1]) | (sl[1:] != sl[:-1])
            # union row index per concatenated entry, in original order
            urow_sorted = np.cumsum(first) - 1
            midx_all = np.empty(len(sh), np.int64)
            midx_all[order] = urow_sorted
            u_hi, u_lo = sh[first], sl[first]
            occ = np.bincount(midx_all, minlength=len(u_hi))
            ex_multi_all = (occ > 1)[midx_all]
            member_flags = np.zeros(len(u_hi), dtype=bool)
            member_flags[midx_all[member_any_all]] = True
        # split multi-occurrence rows by GROUP: rows spanning >1 cluster
        # group are multigroup (excluded, countPathMultigroupKmers
        # KmerCounter.cpp:105-169); rows shared between clusters of ONE
        # group are the reference's multicluster kmers — KEPT and coupled
        # through shared multiplicity state in the Gibbs program
        # (KmerCounts.cpp:178-223, VariantClusterHaplotypes.cpp:197-233)
        grp_keys = {}
        grp_of_cluster = np.empty(len(compiled), np.int64)
        for i, c in enumerate(compiled):
            gk = (c.chrom, c.group_id)
            grp_of_cluster[i] = grp_keys.setdefault(gk, len(grp_keys))
        grp_of_entry = np.repeat(grp_of_cluster, lens)
        n_rows = len(u_hi)
        # only multi-occurrence rows can span groups — restrict the
        # unbuffered min/max scatters to those entries (ufunc.at runs
        # ~50 M/s; the full 20M-entry pass cost seconds at unit scale)
        row_multi_group = np.zeros(n_rows, bool)
        mi_entries = np.flatnonzero(ex_multi_all)
        if len(mi_entries):
            sub_rows = midx_all[mi_entries]
            sub_grp = grp_of_entry[mi_entries]
            row_gmin = np.full(n_rows, np.iinfo(np.int64).max)
            row_gmax = np.full(n_rows, -1, np.int64)
            np.minimum.at(row_gmin, sub_rows, sub_grp)
            np.maximum.at(row_gmax, sub_rows, sub_grp)
            row_multi_group[sub_rows] = (
                row_gmin[sub_rows] != row_gmax[sub_rows]
            )
        ex_across_all = ex_multi_all & row_multi_group[midx_all]
        shared_entry = ex_multi_all & ~row_multi_group[midx_all]

        multi_rows = np.unique(midx_all[ex_multi_all])
        across_rows = multi_rows[row_multi_group[multi_rows]]
        # the reference's multigroup artifact holds only ACROSS-group kmers
        multigroup = LaneTable.from_unsorted_unique(
            u_hi[across_rows], u_lo[across_rows]
        )
        # within-group shared rows get dense shared-pool slot ids
        pool_rows = multi_rows[~row_multi_group[multi_rows]]
        shared_slot_all = np.full(len(midx_all), -1, np.int32)
        if len(pool_rows):
            shared_slot_all[shared_entry] = np.searchsorted(
                pool_rows, midx_all[shared_entry]
            ).astype(np.int32)
        # has_max_multiplicity is a GLOBAL per-kmer flag in the reference
        # (KmerCounts.cpp:153-171 accumulates the max haploid multiplicity
        # across every cluster occurrence + intercluster copies): for rows
        # occurring in several clusters, sum the per-entry path maxima so a
        # shared kmer is excluded everywhere or nowhere (computed here
        # while the union row count is still in scope)
        mult_max_all = np.concatenate([
            c.mult_max if c.mult_max is not None
            else c.mult.max(axis=1, initial=0)
            for c in compiled
        ])
        row_mult_sum = np.bincount(
            midx_all, weights=mult_max_all.astype(np.float64),
            minlength=n_rows,
        ).astype(np.int64)
        # all-path union rows are exactly (u_hi, u_lo), already sorted —
        # build the table without re-sorting
        all_path_union = LaneTable.__new__(LaneTable)
        all_path_union.hi = np.ascontiguousarray(u_hi)
        all_path_union.lo = np.ascontiguousarray(u_lo)
    else:
        multigroup = LaneTable(np.zeros(0, np.uint64), np.zeros(0, np.uint64))
        all_path_union = LaneTable(
            np.zeros(0, np.uint64), np.zeros(0, np.uint64)
        )
        member_flags = np.zeros(0, dtype=bool)
        midx_all = np.zeros(0, np.int64)
        ex_multi_all = np.zeros(0, bool)
        offs = np.zeros(1, np.int64)
    _log(f"Found {len(multigroup)} multigroup kmers")

    # 4. intercluster regions + multiplicities + decoy occurrences + parameter
    # kmer sampling (KmerCounter.cpp:171-386)
    regions = intercluster_regions(genome, clusters_by_chrom, kmer_size)

    inter_f = np.zeros(len(all_path_union), dtype=np.int32)
    inter_m = np.zeros(len(all_path_union), dtype=np.int32)
    decoy_hit = np.zeros(len(all_path_union), dtype=bool)
    # raw genome-occurrence count feeding the has_max_multiplicity exclusion
    # (KmerCounts.cpp:100-104: +1 haploid multiplicity per intercluster
    # occurrence, decoys included; >127 total excludes the kmer)
    occ_count = np.zeros(len(all_path_union), dtype=np.int64)

    # parameter kmers: region kmers not in any cluster path; reservoir-free
    # Bernoulli subsample with post-hoc multiplicity counting
    param_chunks = []
    total_region_len = sum(e - s for _, s, e in regions)
    sample_rate = min(1.0, (3.0 * max_parameter_kmers) / max(total_region_len, 1))

    for chrom, hi, lo in _prefetch_iter(
        _scan_genome_kmers(genome, regions, kmer_size)
    ):
        pf = ploidy.ploidy(chrom, GENDER_FEMALE)
        pm = ploidy.ploidy(chrom, 1 - GENDER_FEMALE)
        idx = all_path_union.lookup_sparse(hi, lo)
        hit = idx >= 0
        if len(member_flags):
            mhit = idx[hit & np.where(hit, member_flags[np.maximum(idx, 0)], False)]
        else:
            mhit = idx[:0]
        # occurrence tallies via bincount (vectorised ~1 ns/element) instead
        # of unbuffered np.add.at (~20 ns/element); pf/pm are chunk
        # constants, so weighted adds reduce to scaled occurrence counts
        occ = np.bincount(mhit, minlength=len(occ_count)) if len(mhit) \
            else None
        if genome.is_decoy(chrom):
            decoy_hit[mhit] = True
            if occ is not None:
                occ_count += occ
            # parameter candidates never come from decoys here; decoy kmers
            # are kept unconditionally by the reference (KmerCounter.cpp:171-250)
            continue
        if occ is not None:
            inter_f += (pf * occ).astype(np.int32)
            inter_m += (pm * occ).astype(np.int32)
            occ_count += occ
        cand = ~hit
        if sample_rate < 1.0:
            cand &= rng.random(len(hi)) < sample_rate
        param_chunks.append((hi[cand], lo[cand], pf, pm))

    # parameter kmer multiplicities: occurrences within the sampled set are
    # rare duplicates; count via sort-unique with ploidy weights
    if param_chunks:
        p_hi = np.concatenate([c[0] for c in param_chunks])
        p_lo = np.concatenate([c[1] for c in param_chunks])
        p_f = np.concatenate(
            [np.full(len(c[0]), c[2], np.int32) for c in param_chunks]
        )
        p_m = np.concatenate(
            [np.full(len(c[0]), c[3], np.int32) for c in param_chunks]
        )
        from . import native

        if native.available() and len(p_hi):
            # MSB-bucketed rank+unique (bt_pair_unique) + bincount sums
            # replace the 2-key lexsort + np.add.at (~1s at unit scale)
            gid, rep = native.pair_unique(p_hi, p_lo)
            n_unique = len(rep)
            mult_f = np.bincount(
                gid, weights=p_f, minlength=n_unique
            ).astype(np.int32)
            mult_m = np.bincount(
                gid, weights=p_m, minlength=n_unique
            ).astype(np.int32)
            u_hi, u_lo = p_hi[rep], p_lo[rep]
        else:
            order = np.lexsort((p_lo, p_hi))
            p_hi, p_lo, p_f, p_m = (
                p_hi[order], p_lo[order], p_f[order], p_m[order]
            )
            first = np.ones(len(p_hi), bool)
            if len(p_hi):
                first[1:] = (p_hi[1:] != p_hi[:-1]) | (p_lo[1:] != p_lo[:-1])
            gid = np.cumsum(first) - 1
            n_unique = int(first.sum())
            mult_f = np.zeros(n_unique, np.int32)
            mult_m = np.zeros(n_unique, np.int32)
            np.add.at(mult_f, gid, p_f)
            np.add.at(mult_m, gid, p_m)
            u_hi, u_lo = p_hi[first], p_lo[first]
        if n_unique > max_parameter_kmers:
            sel = rng.choice(n_unique, max_parameter_kmers, replace=False)
            sel.sort()
            u_hi, u_lo = u_hi[sel], u_lo[sel]
            mult_f, mult_m = mult_f[sel], mult_m[sel]
    else:
        u_hi = u_lo = np.zeros(0, np.uint64)
        mult_f = mult_m = np.zeros(0, np.int32)
    _log(f"Sampled {len(u_hi)} parameter kmers from {total_region_len} bp of "
         f"intercluster sequence")
    _log("Finalising clusters")

    # 5. finalise clusters: keep member kmers that are not excluded
    # (isExcluded = decoy | max-mult | multigroup, KmerCounts.cpp:93-96).
    # Everything is vectorised into global passes — keep flags
    # (has_max_multiplicity, KmerCounts.cpp:153-158: genome occurrences plus
    # the cluster's max path multiplicity overflowing 127), per-cluster kept
    # counts and the gender multiplicity gathers; the Python loop only
    # slices views and packs dataclasses.
    if compiled:
        total_mult_all = occ_count[midx_all] + row_mult_sum[midx_all]
        keep_all = (
            member_any_all
            & ~ex_across_all
            & ~decoy_hit[midx_all]
            & (total_mult_all <= MAX_HAPLOID_MULTIPLICITY)
        )
        inter_f_u8 = np.minimum(inter_f[midx_all], 255).astype(np.uint8)
        inter_m_u8 = np.minimum(inter_m[midx_all], 255).astype(np.uint8)
        cs = np.zeros(len(keep_all) + 1, np.int64)
        np.cumsum(keep_all, out=cs[1:])
        kept_per = cs[offs[1:]] - cs[offs[:-1]]
    final = []
    for i, c in enumerate(compiled):
        sl = slice(offs[i], offs[i + 1])
        n_k = offs[i + 1] - offs[i]
        keep = keep_all[sl]
        if n_k > _KMER_POOL_CAP:
            # giant-cluster pool cap (consumes rng only when it can bind)
            keep = _cap_haplotype_variant_kmers(c, keep, rng)
            all_kept = bool(keep.all())
        else:
            all_kept = kept_per[i] == n_k
        if all_kept:
            # common case: nothing excluded — reuse the compiled arrays
            kmer_hi, kmer_lo = c.kmer_hi, c.kmer_lo
            mult, member = c.mult, c.member
            inter_f_c = inter_f_u8[sl]
            inter_m_c = inter_m_u8[sl]
            shared_c = shared_slot_all[sl]
            num_excluded = 0
        else:
            kmer_hi, kmer_lo = c.kmer_hi[keep], c.kmer_lo[keep]
            mult, member = c.mult[keep], c.member[keep]
            inter_f_c = inter_f_u8[sl][keep]
            inter_m_c = inter_m_u8[sl][keep]
            shared_c = shared_slot_all[sl][keep]
            num_excluded = int((member_any_all[sl] & ~keep).sum())
        final.append(
            FinalizedCluster(
                cluster_id=c.cluster_id,
                chrom=c.chrom,
                variants=c.variants,
                hap_allele=c.hap_allele,
                kmer_hi=kmer_hi,
                kmer_lo=kmer_lo,
                mult=mult,
                member=member,
                inter_mult_female=inter_f_c,
                inter_mult_male=inter_m_c,
                shared_slot=shared_c if (shared_c >= 0).any() else None,
                non_covered_alleles=c.non_covered_alleles,
                num_excluded=num_excluded,
                group_id=c.group_id,
                group_size=c.group_size,
                group_region=c.group_region,
                parent_id=c.parent_id,
                children_ids=c.children_ids,
                depth=c.depth,
                retains=c.retains,
            )
        )

    return InferenceUnitData(
        kmer_size=kmer_size,
        compiled=final,
        regions=regions,
        param_hi=u_hi,
        param_lo=u_lo,
        param_mult_female=mult_f,
        param_mult_male=mult_m,
        exclusion_stats=dict(stats),
        multigroup_hi=multigroup.hi,
        multigroup_lo=multigroup.lo,
    )


@dataclasses.dataclass
class FinalizedCluster:
    cluster_id: int
    chrom: str
    variants: list
    hap_allele: np.ndarray
    kmer_hi: np.ndarray
    kmer_lo: np.ndarray
    mult: np.ndarray
    member: np.ndarray
    inter_mult_female: np.ndarray
    inter_mult_male: np.ndarray
    non_covered_alleles: list
    num_excluded: int
    # within-group shared (multicluster) kmers: [K] int32 global pool slot,
    # -1 for private kmers; None when the cluster has none. Clusters with
    # shared kmers are genotyped in the coupled program where each shared
    # kmer's multiplicity includes every sibling cluster's current sampled
    # contribution (KmerCounts.cpp:178-223 semantics).
    shared_slot: np.ndarray | None = None
    # group / containment structure (VariantClusterGroup)
    group_id: int = -1
    group_size: int = 1
    group_region: str = ""
    parent_id: int = -1
    children_ids: list = dataclasses.field(default_factory=list)
    depth: int = 0
    retains: np.ndarray | None = None


# ---------------------------------------------------------------------------
# genotype phase
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class GenotypeOptions:
    num_chains: int = NUM_GIBBS_CHAINS
    burn_in: int = GIBBS_BURN_IN
    num_samples: int = GIBBS_SAMPLES
    kmer_subsampling_rate: float = KMER_SUBSAMPLING_RATE
    min_genotype_posterior: float = MIN_GENOTYPE_POSTERIOR
    min_number_of_kmers: float = MIN_NUMBER_OF_KMERS
    max_haplotype_variant_kmers: int = 500
    disable_observed_kmers: bool = False
    noise_rate_prior: tuple = (NOISE_RATE_PRIOR_SHAPE, NOISE_RATE_PRIOR_SCALE)
    noise_genotyping: bool = False
    random_seed: int = 1
    max_bucket_clusters: int = 4096
    num_host_threads: int = 1
    # None = use every visible device (cluster-data-parallel over the mesh);
    # results are bit-identical for any device count (counter-based per-
    # cluster PRNG + exact-integer noise sufficient statistics)
    num_devices: int | None = None


def _get_mesh(opts: "GenotypeOptions"):
    """Device mesh for cluster-data-parallel execution, or None when a single
    device is in use. The TPU-native replacement for the reference's
    `--threads` compute parallelism (InferenceEngine.cpp:62-74): buckets are
    sharded on the cluster axis, XLA partitions the Gibbs programs, and the
    noise chain's cross-cluster reductions become all-reduces over ICI."""
    import jax

    n = opts.num_devices
    if n is None:
        n = len(jax.devices())
    if n <= 1:
        return None
    from .parallel.mesh import make_mesh

    return make_mesh(n)


def _shard_for_mesh(bucket, tables, mesh):
    """Shard a bucket on the cluster axis and replicate the PMF tables."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from .parallel.mesh import shard_bucket

    bucket = shard_bucket(bucket, mesh)
    tables = jax.device_put(tables, NamedSharding(mesh, P()))
    return bucket, tables


def _replicate_for_mesh(arr, mesh):
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    return jax.device_put(arr, NamedSharding(mesh, P()))


def _shard_stacked_for_mesh(sbucket, mesh):
    """Shard a [B]-stacked bucket on its CLUSTER axis (axis 1): the chunk
    axis stays replicated-sequential while XLA partitions every per-cluster
    computation across the mesh (cluster-data parallelism, SURVEY §2.5)."""
    import dataclasses as _dc

    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from .model.buckets import ClusterBucket

    spec = NamedSharding(mesh, P(None, "data"))
    return ClusterBucket(
        **{f.name: jax.device_put(getattr(sbucket, f.name), spec)
           for f in _dc.fields(ClusterBucket)}
    )


def _shard_stacked_mask(arr, mesh):
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    return jax.device_put(arr, NamedSharding(mesh, P(None, "data")))


def _needs_cap(fcs, cap: int) -> bool:
    """Static gate for the exact per-chain kmer cap: the cap can only bind
    when some (haplotype, variant) pool exceeds it."""
    return any(
        fc.member.shape[0] > cap and int(fc.member.sum(axis=0).max(initial=0)) > cap
        for fc in fcs
    )


def _any_inter(fcs) -> bool:
    """Static gate for the intercluster-multiplicity shift in the LL
    precompute (a [C,S,M,K]-sized gather skipped when no kmer in the bucket
    has a reference copy outside its cluster)."""
    return any(
        fc.inter_mult_female.any() or fc.inter_mult_male.any() for fc in fcs
    )


def gather_sample_counts(unit: InferenceUnitData, samples, num_threads: int = 1):
    """Stream each sample's KMC table and collect counts for member +
    parameter k-mers (parseSampleKmers, KmerCounter.cpp:388-524; the `-p`
    thread pipeline becomes a thread pool over samples — each worker fills a
    disjoint counts column).

    Set BT_DEVICE_LOOKUP=1 to run the per-batch membership lookups on the
    device mesh instead of the host (parallel/sharded_table.py: table
    hash-sharded across chips, vectorised binary search per shard, psum
    combine) — the scale-out path when the table outgrows host caches and
    chips are locally attached (over the axon tunnel the transfer latency
    usually cancels the win)."""
    import os

    table = LaneTable.from_unsorted_unique(
        np.concatenate([c.kmer_hi for c in unit.compiled] + [unit.param_hi]),
        np.concatenate([c.kmer_lo for c in unit.compiled] + [unit.param_lo]),
    )
    counts = np.zeros((len(table), len(samples)), dtype=np.uint8)

    dev_table = None
    if os.environ.get("BT_DEVICE_LOOKUP") == "1" and len(table):
        import jax

        from .parallel.mesh import make_mesh
        from .parallel.sharded_table import ShardedLaneTable

        mesh = make_mesh(len(jax.devices()))
        row_idx = np.arange(len(table), dtype=np.int64)
        dev_table = ShardedLaneTable.build(
            mesh, table.hi, table.lo,
            # payload = row index split into two uint8-padded... store the
            # row index as the payload so hits map back to `counts` rows
            row_idx[:, None].astype(np.uint32).view(np.uint8).reshape(
                len(table), 4
            ),
        )
        _log(f"Device lookup enabled: table sharded over {mesh.size} chips")

    from . import native

    use_merge = native.available() and dev_table is None

    def _one(si_sample):
        si, sample = si_sample
        reader = KmcReader(sample.kmc_prefix)
        n_hit = 0
        # KMC tables are sorted by canonical kmer, which coincides with
        # ascending (hi, lo) lane order — the FUSED native ingestion
        # (bt_kmc_ingest) decodes each raw record batch, advances a
        # two-pointer merge against the sorted lane table and writes the
        # matched counts column in one C pass (the separate decode/merge/
        # scatter steps moved ~21 GB of numpy intermediates per unit). A
        # non-monotonic stream (foreign producer) falls back to the
        # decode + binary-search path from the point of disorder.
        if use_merge and dev_table is None and len(table):
            info = reader.info
            lutb = reader.lut_bounds()
            state = np.zeros(7, np.int64)
            cursor = 0
            disorder = False
            for raw, nrec, rec0 in reader.raw_batches():
                if not disorder:
                    cursor = native.kmc_ingest(
                        raw, nrec, reader._rec_size, reader._sufix_size,
                        info.counter_size, lutb, rec0, reader._prefix_mask,
                        info.lut_prefix_length, info.kmer_length,
                        table.hi, table.lo, cursor, counts, si, state,
                    )
                    if not state[2]:
                        continue
                    disorder = True
                    consumed = int(state[3])
                    raw = raw[consumed * reader._rec_size :]
                    rec0 += consumed
                    nrec -= consumed
                if nrec <= 0:
                    continue
                pref = reader._prefix_values(rec0, rec0 + nrec)
                hi, lo, cnt = native.kmc_decode(
                    raw, reader._rec_size, reader._sufix_size,
                    info.counter_size, pref, info.lut_prefix_length,
                    info.kmer_length,
                )
                idx = table.lookup(hi, lo)
                hit = idx >= 0
                counts[idx[hit], si] = np.minimum(cnt[hit], 255).astype(
                    np.uint8
                )
                state[1] += int(hit.sum())
            reader.close()
            _log(f"Sample {sample.name}: matched {int(state[1])} kmers "
                 f"({reader.info.total_kmers} in table)")
            return
        cursor = 0
        prev_hi = prev_lo = None
        for hi, lo, cnt in reader.batches():
            if dev_table is not None:
                payload = dev_table.lookup_counts(hi, lo)
                idx = payload.view(np.uint32).reshape(len(hi)).astype(np.int64)
                hit = idx > 0
                # row 0's payload is 0, indistinguishable from a miss; check
                # it on the host (one lookup of the few idx==0 entries)
                maybe_zero = np.flatnonzero(idx == 0)
                if len(maybe_zero):
                    hz = table.lookup(hi[maybe_zero], lo[maybe_zero]) == 0
                    hit[maybe_zero[hz]] = True
            elif use_merge and len(hi) and native.lanes_ascending(
                hi, lo, prev_hi, prev_lo
            ):
                idx, cursor = native.lane_merge_lookup(
                    table.hi, table.lo, hi, lo, cursor
                )
                hit = idx >= 0
                prev_hi, prev_lo = hi[-1], lo[-1]
            else:
                idx = table.lookup(hi, lo)
                hit = idx >= 0
            counts[idx[hit], si] = np.minimum(cnt[hit], 255).astype(np.uint8)
            n_hit += int(hit.sum())
        reader.close()
        _log(f"Sample {sample.name}: matched {n_hit} kmers "
             f"({reader.info.total_kmers} in table)")

    if num_threads > 1 and len(samples) > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=num_threads) as pool:
            list(pool.map(_one, enumerate(samples)))
    else:
        for item in enumerate(samples):
            _one(item)
    return table, counts


def parameter_kmer_stats(unit, samples, table, counts):
    """Per-sample parameter-kmer count stats binned by intercluster
    multiplicity (calculateKmerStats, KmerHash.cpp:257-340)."""
    idx = table.lookup(unit.param_hi, unit.param_lo)
    assert (idx >= 0).all()
    n_bins = 256
    out = {
        "count": np.zeros((len(samples), n_bins), np.int64),
        "mean": np.zeros((len(samples), n_bins)),
        "var": np.zeros((len(samples), n_bins)),
    }
    for si, sample in enumerate(samples):
        mult = (
            unit.param_mult_female
            if sample.gender == GENDER_FEMALE
            else unit.param_mult_male
        )
        mult = np.minimum(mult, n_bins - 1)
        c = counts[idx, si].astype(np.float64)
        cnt = np.bincount(mult, minlength=n_bins).astype(np.int64)
        s1 = np.bincount(mult, weights=c, minlength=n_bins)
        s2 = np.bincount(mult, weights=c * c, minlength=n_bins)
        nz = cnt > 0
        out["count"][si] = cnt
        out["mean"][si, nz] = s1[nz] / cnt[nz]
        multi = cnt > 1
        out["var"][si, multi] = np.maximum(
            (s2[multi] - s1[multi] ** 2 / cnt[multi]) / (cnt[multi] - 1), 0.0
        )
    return out


def _bucket_limit(opts, k, h, s, max_tot, num_chains,
                  budget_bytes=4 << 30) -> int:
    """Per-class cluster chunk size: big chunks amortise the per-iteration
    scan overhead on device, but the LL precompute materialises multi-GB
    one-hot temps per chunk — bound the chunk by the measured-dominant
    transients (the [C,K,S,256] bf16 count one-hot, the [C,K,S,M] f32 P
    table, the [C,K,S,O] f32 gathered Q) so chunk precompute peaks stay
    under `budget_bytes`. Floored to a power of two so every chunk of a
    class shares one padded shape (zero tail waste in the stacked
    programs)."""
    o = h * (h + 1) // 2 + h + 1
    m = max_tot + 1
    per_cluster = (
        k * s * 256 * 2          # one-hot(counts) bf16
        + k * s * m * 4          # P[c,k,s,m] f32
        + k * s * o * 4          # Q[c,k,s,o] f32 (+ inter idx, same size)
        + k * s * o * 4
        + num_chains * s * o * 8  # resident ll + tally
        + num_chains * k         # subsample masks
    )
    limit = max(64, min(opts.max_bucket_clusters,
                        budget_bytes // max(per_cluster, 1)))
    p = 64
    while p * 2 <= limit:
        p *= 2
    return p


@dataclasses.dataclass
class _PlanClass:
    """One size class of the shared chunk plan (see _plan_unit)."""

    chunks: list            # list[list[FinalizedCluster]], each <= c_pad
    c_pad: int              # padded cluster capacity shared by every chunk
    k: int
    h: int
    v: int
    a: int
    cfg: object             # GibbsConfig (genotype chain count)
    per_chunk_bytes: int    # resident scan-state estimate per chunk


def _plan_unit(singles, class_map, opts, samples, mesh):
    """Shared per-class chunk plan for the noise phase and the genotype
    waves: identical chunk boundaries mean each chunk's device bucket is
    built and uploaded ONCE per unit (bucket_cache) and the class-level
    apply_cap / has_inter gates agree between phases.

    Chunks are fixed at the class's padded capacity c_pad, so all chunks of
    a class are shape-identical and stack on a leading [B] axis
    (gibbs.genotype_stacked / noise_chains_stacked)."""
    from .model.gibbs import GibbsConfig

    by_class = defaultdict(list)
    for fc in singles:
        by_class[class_map[fc.cluster_id]].append(fc)
    plan = {}
    s = len(samples)
    for (h, k, v, a), fcs in sorted(by_class.items()):
        fcs.sort(key=lambda fc: fc.cluster_id)
        max_tot = _step_at_least(
            min(
                255,
                2 * max(int(fc.mult.max(initial=1)) for fc in fcs)
                + max(int(fc.inter_mult_female.max(initial=0)) for fc in fcs)
                + max(int(fc.inter_mult_male.max(initial=0)) for fc in fcs),
            ),
            8, 4,
        )
        c_limit = _bucket_limit(opts, k, h, s, max_tot, opts.num_chains)
        c_pad = _pad_clusters(min(c_limit, len(fcs)), mesh)
        chunks = [fcs[i : i + c_pad] for i in range(0, len(fcs), c_pad)]
        cfg = GibbsConfig(
            num_chains=opts.num_chains, burn_in=opts.burn_in,
            num_samples=opts.num_samples,
            kmer_subsampling_rate=opts.kmer_subsampling_rate,
            max_total_mult=max_tot,
            max_haplotype_variant_kmers=opts.max_haplotype_variant_kmers,
            apply_cap=_needs_cap(fcs, opts.max_haplotype_variant_kmers),
            has_inter=_any_inter(fcs),
        )
        o = h * (h + 1) // 2 + h + 1
        per_chunk = c_pad * (
            opts.num_chains * s * o * 8       # ll + tally
            + opts.num_chains * k             # w
            + k * (2 * s + h + 4 * v)         # bucket tensors
        )
        plan[(h, k, v, a)] = _PlanClass(
            chunks=chunks, c_pad=c_pad, k=k, h=h, v=v, a=a, cfg=cfg,
            per_chunk_bytes=per_chunk,
        )
    return plan


# resident HBM budget for one stacked genotype group (scan state + stacked
# bucket tensors); the precompute transients on top are bounded per chunk
# by _bucket_limit's own budget
# two stacked groups are in flight at once (deliberate pipelining), so
# the per-group budget is half the intended HBM share
_STACK_BUDGET_BYTES = int(os.environ.get("BT_STACK_BUDGET", 3 << 29))


def _stack_groups(chunks, per_chunk_bytes):
    """Split a class's chunk list into stacked groups under the HBM budget,
    each group's B padded to a power of two (bounding distinct compiled
    (class, B) shapes to log2 many). B is additionally capped at a
    measured-safe stack depth: a B=16 x 4096-cluster x 20-chain bulk
    program crashed the axon remote worker while B=8 ran — the same
    1.3M-cluster-chain scale that motivates the noise phase's chain-group
    split."""
    b_cap = max(1, _STACK_BUDGET_BYTES // max(per_chunk_bytes, 1))
    b_cap = min(b_cap, int(os.environ.get("BT_STACK_MAX_B", 8)))
    p = 1
    while p * 2 <= b_cap:
        p *= 2
    b_cap = p
    groups = []
    for i in range(0, len(chunks), b_cap):
        group = chunks[i : i + b_cap]
        # UNIFORM stack depth per class: when the class fills at least one
        # group, the tail group pads to the same B instead of its own
        # power of two — one executable per class, and it dodges measured
        # small-B compile pathologies (an H16 B=4 tail group ran ~10x
        # slower than the B=8 executable doing double the work; zero-pad
        # chunks are inert and cheap by comparison).
        b_pad = b_cap if len(chunks) > b_cap else _pow2_at_least(
            len(group), 1
        )
        groups.append((group, b_pad))
    return groups


def _mac_top_t(outcomes) -> int:
    """MAC outcome truncation: EXACT (T = O) for small outcome spaces — all
    H <= 10 classes, i.e. the overwhelming bulk of real callsets — and
    top-8 for large ones, where the [C, K, S, T] selection tensors would
    not fit. The truncation error of top-8 on dense posteriors is bounded
    by tests/test_mac_bound.py (VariantClusterHaplotypes.cpp:235-300 is the
    exact per-iteration accumulation being matched)."""
    o = outcomes.num_outcomes
    return o if o <= 64 else 8


def _pad_clusters(n: int, mesh) -> int:
    """Cluster-axis padding: next power of two, rounded up to a multiple of
    the mesh size so the bucket shards evenly. Padding clusters are
    cluster_valid=0 and never influence real clusters' results."""
    c = _pow2_at_least(n, 1)
    if mesh is not None:
        d = mesh.size
        c = max(c, d)
        c = ((c + d - 1) // d) * d
    return c


def _pow2_at_least(x, lo):
    v = lo
    while v < x:
        v *= 2
    return v


def _step_at_least(x, lo, step):
    v = lo
    while v < x:
        v *= step
    return v


def _coalesce_size_classes(by_class, min_count=128):
    """Merge small (h, k, v, a) classes into a same-h class with k' >= k,
    v' >= v, a' >= a when one exists: every distinct class costs one XLA
    compile and one sub-body in the merged scan programs, and rare classes
    (a handful of clusters) pay that compile for negligible work.

    STREAM-PRESERVING by construction: subsample/cap draws are keyed per
    (cluster, chain, k-mer slot) and prefix-stable in K (_slot_uniform);
    Gibbs draws are keyed per (cluster, chain) and shaped by H only — which
    never changes here; V/A shape membership/stats tensors whose padding is
    masked. max_total_mult is a non-binding clamp (>= every real total) in
    either class, so LL rows are identical too. The only result-relevant
    flag is apply_cap, which re-keys the subsample split — callers must
    derive it from the MERGED class (both phases use the same merged map,
    so draws agree between the noise and genotype phases)."""
    keys = sorted(by_class)
    for key in keys:
        fcs = by_class.get(key)
        if fcs is None or len(fcs) >= min_count:
            continue
        h, k, v, a = key
        best = None
        for key2 in by_class:
            if key2 == key:
                continue
            h2, k2, v2, a2 = key2
            if h2 != h or k2 < k or v2 < v or a2 < a:
                continue
            cost = k2 * v2 * a2
            if best is None or cost < best[0]:
                best = (cost, key2)
        if best is not None:
            by_class[best[1]].extend(fcs)
            del by_class[key]
    for fcs in by_class.values():
        fcs.sort(key=lambda fc: fc.cluster_id)
    return by_class


def _size_class(fc: FinalizedCluster):
    """Coarse size classes: every distinct class costs one XLA compile
    (~50s on the tunnel), so A uses x4 steps — over-padding is cheap
    (LL compute is linear in K) while compiles are not. K uses x2 steps
    from 128: the bulk SNV/indel classes carry ~110 real k-mers, so a
    256-floor class padded them to fill ~43% — the k-mer-proportional
    costs (bucket upload over the ~30 MB/s tunnel, LL precompute, count
    tensors) all halve at a 128 floor for one extra compile per H class.
    V uses x2 steps too (round 5): the stats pass loops per PADDED variant
    slot and the packed fetch ships per-slot rows, so a 6-variant dense
    cluster in a V16 class paid 10 dead slots — V8 halves its stats and
    fetch for one extra compile per affected class. Padding never changes
    results (slots are masked; draws are keyed per cluster/k-mer slot)."""
    h = _pow2_at_least(fc.hap_allele.shape[0], 2)
    k = _step_at_least(max(len(fc.kmer_hi), 1), 128, 2)
    v = _step_at_least(len(fc.variants), 1, 2)
    a = _step_at_least(max(x.num_alleles for x in fc.variants), 2, 2)
    return (h, k, v, a)


def _class_map(compiled, min_count=128):
    """cluster_id -> merged size class, computed ONCE from the full set so
    the noise phase (which draws a subset) and the genotype waves group the
    same cluster identically — device buckets built for one phase then serve
    the other (bucket_cache), and the class-derived apply_cap gate agrees."""
    by_class = defaultdict(list)
    for fc in compiled:
        by_class[_size_class(fc)].append(fc)
    by_class = _coalesce_size_classes(by_class, min_count)
    return {
        fc.cluster_id: key for key, fcs in by_class.items() for fc in fcs
    }


class _UnitCounts:
    """Per-cluster observed-count rows, resolved with ONE global lookup
    (one lane lookup per cluster previously dominated the genotype phase's
    host side)."""

    def __init__(self, unit, table, counts):
        compiled = unit.compiled
        lens = np.fromiter(
            (len(fc.kmer_hi) for fc in compiled), np.int64, len(compiled)
        )
        self.offs = np.zeros(len(lens) + 1, np.int64)
        np.cumsum(lens, out=self.offs[1:])
        if compiled:
            cat_hi = np.concatenate([fc.kmer_hi for fc in compiled])
            cat_lo = np.concatenate([fc.kmer_lo for fc in compiled])
            idx = table.lookup(cat_hi, cat_lo)
            self.rows = np.where(
                idx[:, None] >= 0, counts[np.maximum(idx, 0)], 0
            ).astype(np.uint8)
        else:
            self.rows = np.zeros((0, counts.shape[1]), np.uint8)
        self._index = {fc.cluster_id: i for i, fc in enumerate(compiled)}

    def rows_for(self, fc):
        i = self._index[fc.cluster_id]
        return self.rows[self.offs[i] : self.offs[i + 1]]


def _build_bucket_batch(fcs, size_class, samples, ploidy_model, ucounts,
                        seed):
    """FinalizedClusters + counts -> padded ClusterBucket.

    The [C,K,*] tensors (counts gather, gender-resolved intercluster
    multiplicities, multiplicity matrix, packed member bits) and the greedy
    minimum covers are assembled by one fused native pass
    (bt_build_bucket); small [C,H,V] fields stay numpy. The numpy fallback
    produces bit-identical arrays (shared cover tie-break stream keyed on
    (seed, cluster_id) — see model.buckets.cover_tiebreak_key)."""
    from . import native
    from .model.buckets import (
        ClusterBucket, _pack_member_bits, cover_tiebreak_key,
        greedy_minimum_cover,
    )

    cap_c, cap_k, cap_h, cap_v = size_class
    n = len(fcs)
    assert n <= cap_c
    s = len(samples)

    lens = np.fromiter((len(fc.kmer_hi) for fc in fcs), np.int64, n)
    gf = np.fromiter(
        (smp.gender == GENDER_FEMALE for smp in samples), bool, s
    )
    src_start = np.fromiter(
        (ucounts.offs[ucounts._index[fc.cluster_id]] for fc in fcs),
        np.int64, n,
    )

    if native.available() and n:
        (counts, inter, kmer_valid, mult, member, use_sparse,
         sparsity) = native.build_bucket_arrays(
            fcs, ucounts.rows, src_start, gf, seed,
            (cap_c, cap_k, cap_h, cap_v), s,
        )
    else:
        total = int(lens.sum())
        offs = np.zeros(n + 1, np.int64)
        np.cumsum(lens, out=offs[1:])
        dest_c = np.repeat(np.arange(n, dtype=np.int64), lens)
        dest_k = np.arange(total, dtype=np.int64) - np.repeat(offs[:-1], lens)

        src = np.concatenate([
            np.arange(s0, s0 + l, dtype=np.int64)
            for s0, l in zip(src_start, lens)
        ]) if n else np.zeros(0, np.int64)
        counts = np.zeros((cap_c, cap_k, s), np.uint8)
        counts[dest_c, dest_k] = ucounts.rows[src]

        cat_f = np.concatenate([fc.inter_mult_female for fc in fcs]) if n \
            else np.zeros(0, np.uint8)
        cat_m = np.concatenate([fc.inter_mult_male for fc in fcs]) if n \
            else np.zeros(0, np.uint8)
        inter = np.zeros((cap_c, cap_k, s), np.uint8)
        inter[dest_c, dest_k] = np.where(gf[None, :], cat_f[:, None],
                                         cat_m[:, None])

        kmer_valid = np.zeros((cap_c, cap_k), bool)
        kmer_valid[dest_c, dest_k] = True

        mult = np.zeros((cap_c, cap_k, cap_h), np.uint8)
        member_bool = np.zeros((cap_c, cap_k, cap_v, cap_h), bool)
        groups = defaultdict(list)
        for i, fc in enumerate(fcs):
            groups[(fc.hap_allele.shape[0], len(fc.variants))].append(i)
        for (h, v), idxs in groups.items():
            ia = np.asarray(idxs, np.int64)
            sel = np.isin(dest_c, ia)
            dc, dk = dest_c[sel], dest_k[sel]
            mult[dc[:, None], dk[:, None], np.arange(h)[None, :]] = \
                np.concatenate([fcs[i].mult for i in idxs])
            member_bool[
                dc[:, None, None], dk[:, None, None],
                np.arange(v)[None, :, None], np.arange(h)[None, None, :]
            ] = np.concatenate([fcs[i].member for i in idxs])
        member = _pack_member_bits(member_bool)

        nonzero_all = (counts > 0).any(axis=2) | (inter > 0).any(axis=2)
        use_sparse = np.zeros((cap_c,), bool)
        sparsity = np.full((cap_c,), 0.5, np.float32)
        for i, fc in enumerate(fcs):
            cover = greedy_minimum_cover(
                fc.mult, nonzero_all[i, : lens[i]],
                cover_tiebreak_key(seed, fc.cluster_id),
            )
            if len(cover) > 0:
                use_sparse[i] = True
                h = fc.hap_allele.shape[0]
                sparsity[i] = min(
                    len(cover) / float(h),
                    1.0 - np.finfo(np.float64).eps * 100,
                )

    # small ragged-H fields: grouped by true (h, v), one scatter per group
    hap_valid = np.zeros((cap_c, cap_h), bool)
    hap_allele = np.zeros((cap_c, cap_h, cap_v), np.int16)
    num_alleles = np.zeros((cap_c, cap_v), np.int16)
    variant_valid = np.zeros((cap_c, cap_v), bool)
    groups = defaultdict(list)
    for i, fc in enumerate(fcs):
        groups[(fc.hap_allele.shape[0], len(fc.variants))].append(i)
    for (h, v), idxs in groups.items():
        ia = np.asarray(idxs, np.int64)
        hap_valid[ia[:, None], np.arange(h)[None, :]] = True
        hap_allele[ia[:, None, None], np.arange(h)[None, :, None],
                   np.arange(v)[None, None, :]] = np.stack(
            [fcs[i].hap_allele for i in idxs]
        ).astype(np.int16)
        num_alleles[ia[:, None], np.arange(v)[None, :]] = np.stack([
            np.fromiter((x.num_alleles for x in fcs[i].variants), np.int64, v)
            for i in idxs
        ]).astype(np.int16)
        variant_valid[ia[:, None], np.arange(v)[None, :]] = True

    # ploidies: one lookup per chromosome, not per cluster
    ploidy = np.zeros((cap_c, s), np.int8)
    chrom_cache = {}
    for i, fc in enumerate(fcs):
        p = chrom_cache.get(fc.chrom)
        if p is None:
            p = ploidy_model.sample_ploidies(fc.chrom, samples)
            chrom_cache[fc.chrom] = p
        ploidy[i] = p

    cluster_id = np.zeros((cap_c,), np.int64)
    cluster_id[:n] = np.fromiter((fc.cluster_id for fc in fcs), np.int64, n)
    cluster_valid = np.zeros((cap_c,), bool)
    cluster_valid[:n] = True

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
        member=member,
        use_sparse=use_sparse,
        sparsity=sparsity,
        cluster_id=cluster_id,
        cluster_valid=cluster_valid,
    )


@functools.lru_cache(maxsize=None)
def _unpack_bucket_jit():
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("k",))
    def unpack(flat_counts, flat_inter_fm, flat_mult, flat_member, lens,
               gcol, k):
        """Reconstruct the dense padded [C, K, *] bucket tensors from the
        ragged per-kmer rows: the host->device tunnel pays only for REAL
        kmers (fill rates run 25-50%) and for 2 intercluster columns
        (female/male) instead of S gender-resolved copies. Reconstruction
        is bit-exact vs the host-side dense build (padding rows are
        zeros, kmer slots are cluster-contiguous)."""
        csum = jnp.cumsum(lens)
        offs = csum - lens
        j = jnp.arange(k, dtype=lens.dtype)
        src = offs[:, None] + j[None, :]                  # [C, K]
        valid = j[None, :] < lens[:, None]
        n_pad = flat_counts.shape[0]
        src = jnp.where(valid, src, n_pad)                # OOB -> zero row

        def ex(flat):
            ext = jnp.concatenate(
                [flat, jnp.zeros((1,) + flat.shape[1:], flat.dtype)], axis=0
            )
            return ext[src]

        counts = ex(flat_counts)                          # [C, K, S]
        fm = ex(flat_inter_fm)                            # [C, K, 2]
        inter = jnp.take(fm, gcol, axis=2)                # [C, K, S]
        mult = ex(flat_mult)                              # [C, K, H]
        member = ex(flat_member)                          # [C, K, V, W]
        return counts, inter, mult, member, valid

    return unpack


# packed upload pays an extra unpack program launch; below this dense size
# the plain transfer wins
_PACKED_UPLOAD_MIN_BYTES = 4 << 20


def _device_bucket(bucket, fcs, samples):
    """Move a host bucket to the device, ragged-packed when large enough."""
    import jax.numpy as jnp

    dense_bytes = bucket.counts.nbytes + bucket.inter_mult.nbytes \
        + bucket.mult.nbytes + bucket.member.nbytes
    if dense_bytes < _PACKED_UPLOAD_MIN_BYTES or not fcs:
        return bucket.device_arrays()

    kv = bucket.kmer_valid
    lens = kv.sum(axis=1).astype(np.int32)
    flat_counts = bucket.counts[kv]
    flat_mult = bucket.mult[kv]
    flat_member = bucket.member[kv]
    # intercluster multiplicity as (female, male) columns — the per-sample
    # gender resolve happens on device (2 columns cross the tunnel, not S)
    flat_inter_fm = np.stack(
        [
            np.concatenate([fc.inter_mult_female for fc in fcs]),
            np.concatenate([fc.inter_mult_male for fc in fcs]),
        ],
        axis=1,
    ).astype(np.uint8)
    assert len(flat_inter_fm) == len(flat_counts)

    n = len(flat_counts)
    n_pad = _pow2_at_least(max(n, 1), 4096)
    pad = n_pad - n

    def fp(a):
        return np.concatenate(
            [a, np.zeros((pad,) + a.shape[1:], a.dtype)], axis=0
        )

    gcol = np.fromiter(
        (0 if smp.gender == GENDER_FEMALE else 1 for smp in samples),
        np.int32, len(samples),
    )
    counts, inter, mult, member, kmer_valid = _unpack_bucket_jit()(
        fp(flat_counts), fp(flat_inter_fm), fp(flat_mult), fp(flat_member),
        lens, gcol, k=bucket.counts.shape[1],
    )
    from .model.buckets import ClusterBucket

    return ClusterBucket(
        mult=mult,
        inter_mult=inter,
        counts=counts,
        kmer_valid=kmer_valid,
        hap_valid=jnp.asarray(bucket.hap_valid),
        ploidy=jnp.asarray(bucket.ploidy),
        hap_allele=jnp.asarray(bucket.hap_allele),
        num_alleles=jnp.asarray(bucket.num_alleles),
        variant_valid=jnp.asarray(bucket.variant_valid),
        member=member,
        use_sparse=jnp.asarray(bucket.use_sparse),
        sparsity=jnp.asarray(bucket.sparsity),
        cluster_id=jnp.asarray(bucket.cluster_id),
        cluster_valid=jnp.asarray(bucket.cluster_valid),
    )


def _bucket_cached(cache, fcs, caps, samples, ploidy_model, ucounts, seed,
                   store=True):
    """Build (or fetch) the device ClusterBucket for one cluster chunk.

    The cache is shared between the background pre-builder, the noise phase
    and the genotype wave loop: identical (cluster ids, padded caps) chunks
    produce identical device arrays (streams are cluster-keyed), so each is
    built and transferred once per unit. Only the FINAL consumer (the wave
    loop, store=False) pops its entry — non-consuming readers (the noise
    phase) peek, so a prebuilt bucket survives until the waves use it."""
    key = (tuple(fc.cluster_id for fc in fcs), caps)
    if cache is not None:
        hit = cache.get(key) if store else cache.pop(key, None)
        if hit is not None:
            return hit
    bucket = _device_bucket(
        _build_bucket_batch(fcs, caps, samples, ploidy_model, ucounts, seed),
        fcs, samples,
    )
    if cache is not None and store:
        cache[key] = bucket
    return bucket


def estimate_noise(unit, samples, table, counts, ploidy_model, nb_params,
                   opts: GenotypeOptions, ucounts=None, genomic_tables=None,
                   bucket_cache=None, class_map=None, plan=None):
    """Noise rate estimation over single-cluster groups of EVERY size class
    (estimateNoise, InferenceEngine.cpp:135-276; group selection :141-151
    has no size restriction).

    The reference draws ~100k variants from a shuffled single-cluster pool;
    here the draw is CHUNK-granular over the shared per-class chunk plan
    (_plan_unit): whole shuffled chunks are taken until the variant target
    is met, so the noise batch's device buckets are exactly a subset of the
    genotype wave chunks (built + uploaded once, bucket_cache). Below the
    target size (every test/golden workload) the selected set — and thus
    every result — is identical to the per-cluster draw. Multi-cluster-
    group members riding along in a chunk are masked out of the pooled
    statistics (noise_valids), preserving the reference's single-cluster-
    group pool exactly. All classes and chains run inside ONE compiled
    stacked program (noise_chains_stacked)."""
    import jax
    import jax.numpy as jnp
    from .model.gibbs import make_outcome_space, noise_chains_stacked
    from .model.buckets import stack_buckets
    from .ops.distributions import np_build_count_log_prob_tables

    rng = np.random.default_rng(opts.random_seed)
    seed = opts.random_seed
    if not unit.compiled:
        raise ValueError("no clusters to estimate noise from")
    if ucounts is None:
        ucounts = _UnitCounts(unit, table, counts)
    singles = [
        fc for fc in unit.compiled if not _is_coupled(fc)
    ] or list(unit.compiled)[:1]
    if class_map is None:
        class_map = _class_map(singles)
    mesh = _get_mesh(opts)
    if plan is None:
        plan = _plan_unit(singles, class_map, opts, samples, mesh)

    # chunk-granular batch draw; a chunk's weight is its single-cluster-
    # group variant count (only those clusters feed the pooled statistics)
    entries = []
    for key_cls in sorted(plan):
        pc = plan[key_cls]
        for ci, chunk in enumerate(pc.chunks):
            nv = sum(
                len(fc.variants) for fc in chunk
                if _is_single_cluster_group(fc)
            )
            entries.append((key_cls, ci, nv))
    order = rng.permutation(len(entries))
    selected = defaultdict(list)
    num_vars = 0
    for ei in order:
        key_cls, ci, nv = entries[ei]
        if nv == 0:
            continue
        if num_vars >= NOISE_ESTIMATION_VARIANTS:
            break
        selected[key_cls].append(ci)
        num_vars += nv
    fallback_first_chunk = not selected
    if fallback_first_chunk:
        # no single-cluster groups at all: fall back to one chunk with
        # every real cluster contributing (the prior behaviour for units of
        # only multi-cluster groups)
        if not plan:
            plan = _plan_unit(
                list(unit.compiled)[:1], _class_map(list(unit.compiled)[:1]),
                opts, samples, mesh,
            )
        key_cls = sorted(plan)[0]
        selected[key_cls] = [0]

    tables = jnp.asarray(
        np_build_count_log_prob_tables(
            nb_params.p, nb_params.size, np.full(len(samples), 1e-3), 255,
            genomic=genomic_tables,
        )
    )
    if mesh is not None:
        tables = _replicate_for_mesh(tables, mesh)

    # bucket builds for the noise batch run on a 2-worker pool (the native
    # bt_build_bucket pass releases the GIL; serial builds were ~10-20 s of
    # the noise phase wall on this 2-core host)
    from concurrent.futures import ThreadPoolExecutor

    build_pool = ThreadPoolExecutor(2)
    build_futures = {}
    for key_cls in sorted(selected):
        pc = plan[key_cls]
        for ci in sorted(selected[key_cls]):
            build_futures[(key_cls, ci)] = build_pool.submit(
                _bucket_cached, bucket_cache, pc.chunks[ci],
                (pc.c_pad, pc.k, pc.h, pc.v), samples, ploidy_model,
                ucounts, seed,
            )

    sbuckets, valids, outcomes_list, cfgs = [], [], [], []
    per_chain_bytes = 0
    for key_cls in sorted(selected):
        pc = plan[key_cls]
        sel = sorted(selected[key_cls])
        bs, nvs = [], []
        for ci in sel:
            chunk = pc.chunks[ci]
            bs.append(build_futures[(key_cls, ci)].result())
            mask = np.zeros(pc.c_pad, bool)
            if fallback_first_chunk:
                mask[: len(chunk)] = True
            else:
                mask[: len(chunk)] = [
                    _is_single_cluster_group(fc) for fc in chunk
                ]
            nvs.append(mask)
        sb = stack_buckets(bs)
        nv_arr = jnp.asarray(np.stack(nvs))
        if mesh is not None:
            sb = _shard_stacked_for_mesh(sb, mesh)
            nv_arr = _shard_stacked_mask(nv_arr, mesh)
        sbuckets.append(sb)
        valids.append(nv_arr)
        outcomes = make_outcome_space(pc.h)
        outcomes_list.append(outcomes)
        cfgs.append(pc.cfg)
        # scan-resident per-chain state: llg f32 + a f32 + b u16 (c0 is
        # folded into llg, gibbs._noise_setup_stacked) = 10 bytes/element
        per_chain_bytes += (
            len(sel) * pc.c_pad * len(samples) * outcomes.num_outcomes * 10
        )
    build_pool.shutdown()
    _log(f"Estimating noise from {num_vars} variants in {len(sbuckets)} "
         f"size classes ({sum(len(v) for v in selected.values())} chunks)")

    shape, scale = opts.noise_rate_prior
    key = jax.random.PRNGKey(opts.random_seed)
    k77 = jax.random.fold_in(key, 77)
    init_rates = jax.vmap(
        lambda ci: jax.random.gamma(
            jax.random.fold_in(k77, ci), shape, (len(samples),)
        )
    )(jnp.arange(opts.num_chains, dtype=jnp.uint32)) * scale  # [ch, S]
    # HBM guard: the resident llg/a/b tensors scale with chains; chains
    # are INDEPENDENT (each carries its own rate trajectory; pooling is
    # across clusters within a chain), so split them into groups that keep
    # the resident precompute under the budget. Per-chain keys are
    # chain0-based, so the grouping is bit-exact for ANY grouping.
    # At 10 bytes/element (c0 folded, b u16) the default budget admits all
    # 20 chains in ONE program at the 100k-variant noise batch, halving the
    # chunk precompute the 2x10 split paid twice.
    budget = int(os.environ.get("BT_NOISE_BUDGET", 10 << 30))
    chain_step = max(1, min(opts.num_chains,
                            budget // max(per_chain_bytes, 1)))
    # pick a divisor of num_chains so every group shares one compiled shape
    while opts.num_chains % chain_step:
        chain_step -= 1
    if chain_step < opts.num_chains:
        _log(f"Noise chains split into groups of {chain_step} "
             f"({per_chain_bytes >> 20} MB resident per chain)")
    # graceful degradation at the crash envelope (matching the reference's
    # restartable-unit posture, main.cpp:258-262): a dead worker / OOM on a
    # group dispatch triggers an automatic retry with a halved chain group
    # instead of killing the run. Results are bit-identical under any
    # grouping. BT_NOISE_FAIL_ABOVE=<n> injects a failure for groups wider
    # than n chains (the failure-injection test hook).
    fail_above = int(os.environ.get("BT_NOISE_FAIL_ABOVE", "0"))
    rs_parts, tr_parts = [], []
    c0 = 0
    while c0 < opts.num_chains:
        step_i = min(chain_step, opts.num_chains - c0)
        try:
            if fail_above and step_i > fail_above:
                raise RuntimeError(
                    f"injected noise-group failure at {step_i} chains"
                )
            rs, tr = noise_chains_stacked(
                key, tuple(sbuckets), tuple(valids), tables,
                init_rates[c0 : c0 + step_i], (shape, scale),
                tuple(outcomes_list), tuple(cfgs),
                num_chains=step_i, chain0=jnp.uint32(c0),
            )
            # fetch per group: dispatching the next group while this one
            # runs would hold BOTH groups' resident precompute in HBM at
            # once (the whole point of the split is bounding residency)
            rs_parts.append(jax.device_get(rs))
            tr_parts.append(jax.device_get(tr))
        except Exception as e:
            if chain_step <= 1:
                raise
            chain_step = max(1, chain_step // 2)
            _log(f"Noise group of {step_i} chains failed ({e}); "
                 f"degrading to {chain_step}-chain groups and retrying")
            continue
        c0 += step_i
    rate_sums = np.concatenate(rs_parts, axis=0)
    chain_traces = np.concatenate(tr_parts, axis=0)
    inits = jax.device_get(init_rates)
    rate_sum = rate_sums.sum(axis=0)
    # traces include the initial rates as iteration 0 (noise dump format,
    # InferenceEngine.cpp:205)
    traces = np.concatenate([inits[:, None, :], chain_traces], axis=1)
    mean_rates = rate_sum / (opts.num_samples * opts.num_chains)
    _log(f"Estimated noise rates: {mean_rates}")
    return mean_rates, traces


def _is_coupled(fc) -> bool:
    """Clusters needing the coupled Gibbs program: containment parents/
    children (conditional ploidy demotion) or holders of within-group
    shared multicluster k-mers (pool-coupled multiplicities)."""
    return (
        getattr(fc, "parent_id", -1) >= 0
        or bool(getattr(fc, "children_ids", []))
        or getattr(fc, "shared_slot", None) is not None
    )


def _is_single_cluster_group(fc) -> bool:
    """True when the cluster forms a single-cluster group (the only kind the
    noise phase uses, InferenceEngine.cpp:141-151)."""
    return getattr(fc, "group_size", 1) == 1


def _output_prefix(out_path: str) -> str:
    for suffix in (".vcf.gz", ".vcf"):
        if out_path.endswith(suffix):
            return out_path[: -len(suffix)]
    return out_path


def write_genomic_parameters(prefix: str, samples, nb_params):
    """<prefix>_genomic_parameters.txt — Sample/Mean/Variance of the fitted
    NB per sample (CountDistribution.cpp:70-133); consumed downstream by
    `filter --kmer-coverage-file` (Filter.cpp:70-103)."""
    from .writer import fmt_g

    path = prefix + "_genomic_parameters.txt"
    with open(path, "w") as fh:
        fh.write("Sample\tMean\tVariance\n")
        for si, sample in enumerate(samples):
            fh.write(
                f"{sample.name}\t{fmt_g(nb_params.mean[si])}\t"
                f"{fmt_g(nb_params.var[si])}\n"
            )
    _log(f"Wrote genomic parameters to {path}")
    return path


def write_noise_parameters(prefix: str, samples, traces, mean_rates):
    """<prefix>_noise_parameters.txt — per chain x iteration noise-rate
    traces plus the final averaged row `0 0 <rates>`
    (InferenceEngine.cpp:157-266).

    traces: [chains, iters+1, S] including the initial rates as iteration 0.
    """
    from .writer import fmt_g

    path = prefix + "_noise_parameters.txt"
    with open(path, "w") as fh:
        fh.write("Chain\tIteration")
        for sample in samples:
            fh.write(f"\t{sample.name}")
        fh.write("\n")
        for ci in range(traces.shape[0]):
            for it in range(traces.shape[1]):
                row = "\t".join(fmt_g(x) for x in traces[ci, it])
                fh.write(f"{ci + 1}\t{it}\t{row}\n")
        row = "\t".join(fmt_g(x) for x in mean_rates)
        fh.write(f"0\t0\t{row}\n")
    _log(f"Wrote noise parameters to {path}")
    return path


def genotype_unit(unit: InferenceUnitData, samples, genome, ploidy_model,
                  out_path: str, opts: GenotypeOptions | None = None,
                  command_lines=()):
    """Full genotype phase -> final VCF. Returns summary stats."""
    import jax
    import jax.numpy as jnp
    from .model.count_model import fit_genomic_nb
    from .model.gibbs import (
        make_outcome_space,
    )
    from .model.stats import (
        FilterConfig, collect_bucket_stats, collect_bucket_stats_stacked,
    )
    from .ops.distributions import np_build_count_log_prob_tables

    opts = opts or GenotypeOptions()
    rng = np.random.default_rng(opts.random_seed)
    seed = opts.random_seed

    table, counts = gather_sample_counts(unit, samples, opts.num_host_threads)
    _log_rss("sample counts")

    pstats = parameter_kmer_stats(unit, samples, table, counts)
    nb_params = fit_genomic_nb(pstats)
    _log(f"NB fit: mean={nb_params.mean} var={nb_params.var} "
         f"(modal multiplicity {nb_params.modal_multiplicity})")
    prefix = _output_prefix(out_path)
    write_genomic_parameters(prefix, samples, nb_params)
    ucounts = _UnitCounts(unit, table, counts)

    from .ops.distributions import np_build_genomic_tables

    genomic64 = np_build_genomic_tables(nb_params.p, nb_params.size, 255)
    bucket_cache = {}
    mesh = _get_mesh(opts)

    # COUPLED clusters (containment families and groups sharing
    # multicluster k-mers) need per-iteration conditioning on their group
    # siblings and run through the coupled program; group members with
    # neither containment nor shared k-mers are independent and stay on the
    # fast stacked path.
    nested = [fc for fc in unit.compiled if _is_coupled(fc)]
    singles = [fc for fc in unit.compiled if not _is_coupled(fc)]

    # merged size-class map + shared chunk plan: the noise phase and the
    # genotype waves group clusters identically, so each chunk's device
    # bucket is built and uploaded once (bucket_cache)
    class_map = _class_map(singles)
    plan = _plan_unit(singles, class_map, opts, samples, mesh)

    # background pre-build of EVERY chunk's device bucket: the noise scan
    # leaves host + up-tunnel idle for ~40 s, while the wave loop's first
    # groups previously paid builds/uploads inline. Builders and consumers
    # dedupe through bucket_cache (a rebuilt-after-pop duplicate is
    # harmless); best-effort by design.
    import threading

    def _prebuild_buckets():
        try:
            for key_cls in sorted(plan):
                pc = plan[key_cls]
                for chunk in pc.chunks:
                    _bucket_cached(
                        bucket_cache, chunk, (pc.c_pad, pc.k, pc.h, pc.v),
                        samples, ploidy_model, ucounts, seed,
                    )
        except Exception:
            pass  # consumers rebuild on miss

    threading.Thread(target=_prebuild_buckets, daemon=True).start()

    profiler = _Profiler()
    profiler.__enter__()   # spans noise + waves + nested (BT_PROFILE_DIR)
    noise_rates, noise_traces = estimate_noise(
        unit, samples, table, counts, ploidy_model, nb_params, opts,
        ucounts=ucounts, genomic_tables=genomic64,
        bucket_cache=bucket_cache, class_map=class_map, plan=plan,
    )
    _log_rss("noise estimation")
    write_noise_parameters(prefix, samples, noise_traces, noise_rates)

    tables = jnp.asarray(
        np_build_count_log_prob_tables(
            nb_params.p, nb_params.size, noise_rates, 255, genomic=genomic64,
        )
    )
    # nested families run on the default device; keep an unsharded handle
    tables_local = tables
    if mesh is not None:
        tables = _replicate_for_mesh(tables, mesh)

    filters = FilterConfig.from_model(
        nb_params.mean, opts.min_genotype_posterior, opts.min_number_of_kmers,
        opts.disable_observed_kmers,
    )

    writer = GenotypeVcfWriter(
        out_path, genome, [s.name for s in samples], command_lines
    )

    # bucket-occupancy census: real vs padded cells per size class (SURVEY
    # §5 observability plan — shows where padding burns device FLOPs)
    census = []
    for (h, k, v, a) in sorted(plan):
        pc = plan[(h, k, v, a)]
        fcs = [fc for chunk in pc.chunks for fc in chunk]
        real = sum(len(fc.kmer_hi) * fc.hap_allele.shape[0] for fc in fcs)
        padded = len(fcs) * k * h
        census.append(
            f"H{h}/K{k}/V{v}: {len(fcs)} clusters, "
            f"{len(pc.chunks)} chunks of {pc.c_pad}, "
            f"fill {real / max(padded, 1):.0%}"
        )
    _log("Size classes: " + "; ".join(census))
    _log_rss("bucketing")

    key = jax.random.PRNGKey(opts.random_seed)
    num_genotyped = 0
    emitter = _AsyncEmitter(writer, samples, ploidy_model)

    from .model.gibbs import genotype_stacked
    from .model.buckets import stack_buckets, zero_bucket_like
    from .model.stats import collect_bucket_stats_packed_stacked

    # packed fetch needs the summed tallies to fit u16 (they do at the
    # production 20 chains x 250 samples = 5000; a custom config beyond
    # 2^15 total falls back to the f32 fetch)
    use_packed = opts.num_chains * opts.num_samples * 2 < 65536

    # per-class stacked groups: each group is ONE dispatch of one compiled
    # scan body (genotype_stacked), chunks stacked on the leading axis and
    # padded with inert zero chunks to a power-of-two B. Dispatch is async:
    # the host builds group N+1's buckets and renders group N-1's rows
    # (emitter worker) while the device runs group N.
    t_build = t_stack = t_disp = t_stats = t_throttle = 0.0
    for key_cls in sorted(plan):
        pc = plan[key_cls]
        outcomes = make_outcome_space(pc.h)
        for group, b_pad in _stack_groups(pc.chunks, pc.per_chunk_bytes):
            t0 = time.perf_counter()
            bs = [
                _bucket_cached(
                    bucket_cache, chunk, (pc.c_pad, pc.k, pc.h, pc.v),
                    samples, ploidy_model, ucounts, seed, store=False,
                )
                for chunk in group
            ]
            while len(bs) < b_pad:
                bs.append(zero_bucket_like(bs[0]))
            t1 = time.perf_counter()
            sb = stack_buckets(bs)
            del bs
            if mesh is not None:
                sb = _shard_stacked_for_mesh(sb, mesh)
            t2 = time.perf_counter()
            tallies, ws = genotype_stacked(key, sb, tables, outcomes, pc.cfg)
            t3 = time.perf_counter()
            if use_packed:
                stats = collect_bucket_stats_packed_stacked(
                    sb, outcomes, tallies, ws, filters,
                    allele_capacity=pc.a, mac_top_t=_mac_top_t(outcomes),
                )
                emitter.emit_group_packed(group, stats, meta=key_cls)
            else:
                stats = collect_bucket_stats_stacked(
                    sb, outcomes, tallies, ws, filters,
                    allele_capacity=pc.a, mac_top_t=_mac_top_t(outcomes),
                )
                emitter.emit_group(group, stats)
            num_genotyped += sum(
                len(fc.variants) for chunk in group for fc in chunk
            )
            t4 = time.perf_counter()
            # 3 in-flight groups: the packed stats buffers are small enough
            # (u16/f16, ~1-12 MB each) that a deeper pipeline no longer
            # risks the HBM ceiling, and it hides the scan of group N+2
            # behind the fetch of group N
            emitter.throttle(3)
            t5 = time.perf_counter()
            t_build += t1 - t0
            t_stack += t2 - t1
            t_disp += t3 - t2
            t_stats += t4 - t3
            t_throttle += t5 - t4
            _log(f"Genotyped {num_genotyped} variants")
    _log(f"[wave loop] build {t_build:.1f}s stack+upload {t_stack:.1f}s "
         f"dispatch {t_disp:.1f}s stats-dispatch {t_stats:.1f}s "
         f"throttle-wait {t_throttle:.1f}s; emitter dev-wait "
         f"{emitter.t_devwait:.1f}s fetch {emitter.t_fetch:.1f}s "
         f"render {emitter.t_render:.1f}s")

    failed = emitter.take_failures()
    if failed:
        _retry_failed_groups(
            failed, plan, bucket_cache, samples, ploidy_model, ucounts,
            seed, tables, filters, key, emitter, mesh,
        )
    emitter.close()
    bucket_cache.clear()
    if nested:
        num_genotyped += _genotype_nested_set(
            nested, samples, ploidy_model, ucounts, tables_local,
            filters, writer, opts, rng, key,
        )
        _log(f"Genotyped {num_genotyped} variants")
    profiler.__exit__()

    n = writer.finalise()
    _log_rss("genotyping")
    _log(f"Wrote {n} variants to {out_path}")
    return {
        "num_variants": n,
        "noise_rates": noise_rates,
        "nb_mean": nb_params.mean,
        "nb_var": nb_params.var,
    }


def _retry_failed_groups(failed, plan, bucket_cache, samples, ploidy_model,
                         ucounts, seed, tables, filters, key, emitter, mesh):
    """Re-run stacked genotype groups whose emit failed (dead worker / OOM)
    at HALVED stack depth, recursively down to single chunks — the graceful
    degradation path for the crash envelope (BENCH_PROFILE_r04; the
    reference's analogue is its restartable-unit posture, main.cpp:258-262).
    Per-cluster streams are cluster-keyed, so results are bit-identical for
    any B split. Groups are processed synchronously (the failure already
    stalled the pipeline; correctness over overlap here)."""
    from .model.buckets import stack_buckets, zero_bucket_like
    from .model.gibbs import genotype_stacked, make_outcome_space
    from .model.stats import collect_bucket_stats_packed_stacked

    queue = list(failed)
    while queue:
        key_cls, group, exc = queue.pop(0)
        if len(group) <= 1:
            raise RuntimeError(
                f"stacked group irrecoverable at B=1: {exc}"
            ) from exc
        mid = (len(group) + 1) // 2
        _log(f"Retrying failed stacked group (B={len(group)}, {exc}) as "
             f"two B<={mid} halves")
        pc = plan[key_cls]
        outcomes = make_outcome_space(pc.h)
        for half in (group[:mid], group[mid:]):
            bs = [
                _bucket_cached(
                    bucket_cache, chunk, (pc.c_pad, pc.k, pc.h, pc.v),
                    samples, ploidy_model, ucounts, seed, store=False,
                )
                for chunk in half
            ]
            b_pad = _pow2_at_least(len(bs), 1)
            while len(bs) < b_pad:
                bs.append(zero_bucket_like(bs[0]))
            sb = stack_buckets(bs)
            del bs
            if mesh is not None:
                sb = _shard_stacked_for_mesh(sb, mesh)
            tallies, ws = genotype_stacked(key, sb, tables, outcomes, pc.cfg)
            stats = collect_bucket_stats_packed_stacked(
                sb, outcomes, tallies, ws, filters,
                allele_capacity=pc.a, mac_top_t=_mac_top_t(outcomes),
            )
            try:
                emitter._group_packed_job(half, stats)
            except Exception as e:  # noqa: BLE001 — halve again
                queue.append((key_cls, half, e))


def _genotype_nested_set(nested, samples, ploidy_model, ucounts,
                         tables, filters, writer, opts, rng, key):
    """Genotype COUPLED cluster groups: containment families (children
    sampled conditionally on their parent's outcome with ploidy demotion)
    and groups sharing multicluster k-mers (scored against every sibling's
    current contribution through the shared pool). Clusters are laid out by
    RANK within their group — (containment depth, id) order — so each level
    samples conditioned on all lower-ranked group members
    (gibbs.genotype_nested; the reference's
    VariantClusterGroup::runGibbsSample recursion + the KmerCounts.cpp
    shared-multiplicity propagation)."""
    seed = opts.random_seed
    import jax.numpy as jnp
    from .model.gibbs import (
        GibbsConfig, genotype_nested, make_outcome_space,
    )
    from .model.stats import collect_bucket_stats

    by_group = defaultdict(list)
    for fc in nested:
        by_group[(fc.chrom, fc.group_id)].append(fc)
    rank_of = {}
    for grp in by_group.values():
        grp.sort(key=lambda fc: (fc.depth, fc.cluster_id))
        for r, fc in enumerate(grp):
            rank_of[fc.cluster_id] = r
    max_rank = max(rank_of.values())
    levels = [
        sorted(
            (fc for fc in nested if rank_of[fc.cluster_id] == l),
            key=lambda fc: fc.cluster_id,
        )
        for l in range(max_rank + 1)
    ]
    assert all(levels), "coupled set missing a rank level"
    by_id = {fc.cluster_id: fc for fc in nested}
    row_of = {
        fc.cluster_id: (l, i)
        for l, fcs in enumerate(levels)
        for i, fc in enumerate(fcs)
    }

    # shared-pool slot remap: global slot ids -> dense [0, P)
    used_slots = sorted({
        int(x)
        for fc in nested
        if getattr(fc, "shared_slot", None) is not None
        for x in fc.shared_slot[fc.shared_slot >= 0]
    })
    slot_remap = {g: i for i, g in enumerate(used_slots)}
    num_pool = len(used_slots)

    buckets, outcomes_list, cfgs, caps_a, h_pads = [], [], [], [], []
    for fcs in levels:
        h = max(_pow2_at_least(fc.hap_allele.shape[0], 2) for fc in fcs)
        k = max(_step_at_least(max(len(fc.kmer_hi), 1), 128, 2) for fc in fcs)
        v = max(_step_at_least(len(fc.variants), 1, 2) for fc in fcs)
        a = max(
            _step_at_least(max(x.num_alleles for x in fc.variants), 2, 2)
            for fc in fcs
        )
        c_pad = _pow2_at_least(len(fcs), 1)
        buckets.append(
            _build_bucket_batch(
                fcs, (c_pad, k, h, v), samples, ploidy_model, ucounts, seed
            ).device_arrays()
        )
        outcomes_list.append(make_outcome_space(h))
        max_tot = _step_at_least(
            min(
                255,
                2 * max(int(fc.mult.max(initial=1)) for fc in fcs)
                + max(int(fc.inter_mult_female.max(initial=0)) for fc in fcs)
                + max(int(fc.inter_mult_male.max(initial=0)) for fc in fcs),
            ),
            8, 4,
        )
        cfgs.append(GibbsConfig(
            num_chains=opts.num_chains, burn_in=opts.burn_in,
            num_samples=opts.num_samples,
            kmer_subsampling_rate=opts.kmer_subsampling_rate,
            max_total_mult=max_tot,
            max_haplotype_variant_kmers=opts.max_haplotype_variant_kmers,
            apply_cap=_needs_cap(fcs, opts.max_haplotype_variant_kmers),
            has_inter=_any_inter(fcs),
        ))
        caps_a.append(a)
        h_pads.append(h)

    o_pad = max(o.num_outcomes for o in outcomes_list)
    parent_levels, parent_rows, retain_tables, shared_infos = [], [], [], []
    for l, fcs in enumerate(levels):
        c_pad = buckets[l].num_clusters
        k_pad = buckets[l].num_kmers
        plv = np.full(c_pad, -1, np.int32)
        prw = np.zeros(c_pad, np.int32)
        rt = np.zeros((c_pad, o_pad), np.int8)
        for i, fc in enumerate(fcs):
            if fc.parent_id < 0:
                continue
            parent = by_id[fc.parent_id]
            pl, prow = row_of[fc.parent_id]
            plv[i] = pl
            prw[i] = prow
            col = parent.children_ids.index(fc.cluster_id)
            o_prev = outcomes_list[pl]
            r_ext = np.zeros(h_pads[pl] + 1, bool)  # sentinel stays False
            r_ext[: parent.retains.shape[0]] = parent.retains[:, col]
            rt[i, : o_prev.num_outcomes] = (
                r_ext[o_prev.oa].astype(np.int8)
                + r_ext[o_prev.ob].astype(np.int8)
            )
        parent_levels.append(jnp.asarray(plv))
        parent_rows.append(jnp.asarray(prw))
        retain_tables.append(jnp.asarray(rt))

        qs = [
            np.flatnonzero(fc.shared_slot >= 0)
            if getattr(fc, "shared_slot", None) is not None
            else np.zeros(0, np.int64)
            for fc in fcs
        ]
        q_max = max((len(q) for q in qs), default=0)
        if q_max == 0:
            shared_infos.append(None)
            continue
        q_cap = _pow2_at_least(q_max, 1)
        sh_idx = np.zeros((c_pad, q_cap), np.int32)
        sh_slot = np.zeros((c_pad, q_cap), np.int32)
        sh_valid = np.zeros((c_pad, q_cap), bool)
        sh_mask = np.zeros((c_pad, k_pad), bool)
        for i, (fc, q) in enumerate(zip(fcs, qs)):
            if not len(q):
                continue
            sh_idx[i, : len(q)] = q
            sh_slot[i, : len(q)] = [
                slot_remap[int(fc.shared_slot[j])] for j in q
            ]
            sh_valid[i, : len(q)] = True
            sh_mask[i, q] = True
        shared_infos.append(dict(
            sh_idx=jnp.asarray(sh_idx), sh_slot=jnp.asarray(sh_slot),
            sh_valid=jnp.asarray(sh_valid), sh_mask=jnp.asarray(sh_mask),
        ))

    tallies, ws, mac_extras = genotype_nested(
        key, tuple(buckets), tuple(parent_levels), tuple(parent_rows),
        tuple(retain_tables), tuple(shared_infos), tables,
        tuple(outcomes_list), tuple(cfgs), num_pool=num_pool,
        acaps=tuple(caps_a),
    )

    num = 0
    stats_by_level = []
    for l, fcs in enumerate(levels):
        missing_stats = _nested_missing_stats(
            fcs, stats_by_level, row_of, by_id, buckets[l].num_clusters,
            len(samples),
        )
        # shared-k-mer levels carry the in-scan MAC sibling correction and
        # need the exact (T = O) outcome enumeration so the correction's
        # tally weights line up with the static MAC sum
        mac_t = (
            outcomes_list[l].num_outcomes
            if mac_extras[l] is not None
            else _mac_top_t(outcomes_list[l])
        )
        stats = collect_bucket_stats(
            buckets[l], outcomes_list[l], tallies[l], ws[l], filters,
            allele_capacity=caps_a[l], mac_top_t=mac_t,
            missing_stats=missing_stats, mac_extra=mac_extras[l],
        )
        stats = _fetch_stats(stats)
        stats_by_level.append(stats)
        _emit_records(writer, fcs, stats, samples, ploidy_model)
        num += sum(len(fc.variants) for fc in fcs)
    return num


def _nested_missing_stats(fcs, stats_by_level, row_of, by_id, c_pad,
                          num_samples):
    """Per-(child cluster, sample) NAK/FAK/MAC handed down from the parent's
    demoting allele (the allele on non-retaining haplotypes at the parent
    variant spanning the child; addNestedKmerStats,
    VariantClusterGenotyper.cpp:154-180). The allele is chosen per sample as
    the non-retaining allele with the highest parent APP. Returns None when
    no cluster at this level has a containment parent."""
    import jax.numpy as jnp

    if not any(fc.parent_id >= 0 for fc in fcs):
        return None
    nak_m = np.zeros((c_pad, num_samples), np.float32)
    fak_m = np.full((c_pad, num_samples), -1.0, np.float32)
    mac_m = np.full((c_pad, num_samples), -1.0, np.float32)

    for i, fc in enumerate(fcs):
        if fc.parent_id < 0:
            continue
        parent = by_id[fc.parent_id]
        plevel, prow = row_of[fc.parent_id]
        parent_stats = stats_by_level[plevel]
        p_nak = np.asarray(parent_stats.nak)   # [Cp, S, Vp, A]
        p_fak = np.asarray(parent_stats.fak)
        p_mac = np.asarray(parent_stats.mac)
        p_app = np.asarray(parent_stats.app)
        col = parent.children_ids.index(fc.cluster_id)
        child_start = min(v.pos for v in fc.variants)
        child_end = max(v.end for v in fc.variants)
        v_star = 0
        for vi, pv in enumerate(parent.variants):
            if pv.pos <= child_start and pv.end >= child_end:
                v_star = vi
                break
        h_real = parent.retains.shape[0]
        nonret = sorted({
            int(parent.hap_allele[h, v_star])
            for h in range(h_real)
            if not parent.retains[h, col]
        })
        if not nonret:
            continue
        for s in range(num_samples):
            a_star = max(nonret, key=lambda a: p_app[prow, s, v_star, a])
            nak_m[i, s] = p_nak[prow, s, v_star, a_star]
            fak_m[i, s] = p_fak[prow, s, v_star, a_star]
            mac_m[i, s] = p_mac[prow, s, v_star, a_star]
    return (jnp.asarray(nak_m), jnp.asarray(fak_m), jnp.asarray(mac_m))


def _fetch_packed_stats(packed, n_real: int):
    """ONE device->host transfer of a PackedBucketStats group.

    Slices the stacked leading axis to the real (non-padding) chunks,
    bitcasts every leaf to uint8 and concatenates into a single byte buffer
    (one tunnel round trip at the packed byte count — the ~12 MB/s axon
    down-tunnel made the f32 stats fetch the genotype-wave wall,
    BENCH_PROFILE_r04), then splits it host-side. XLA bitcast-convert to a
    narrower type appends a least-significant-first minor dimension, which
    matches numpy's little-endian view on the host."""
    import jax
    import jax.numpy as jnp

    leaves, treedef = jax.tree_util.tree_flatten(packed)
    sliced = [l[:n_real] for l in leaves]
    flat = jnp.concatenate([
        jax.lax.bitcast_convert_type(l, jnp.uint8).reshape(-1)
        for l in sliced
    ])
    host = np.asarray(flat)
    out = []
    off = 0
    for l in sliced:
        dt = np.dtype(l.dtype)
        n = int(np.prod(l.shape)) * dt.itemsize
        out.append(host[off : off + n].view(dt).reshape(l.shape))
        off += n
    return jax.tree_util.tree_unflatten(treedef, out)


def _fetch_stats(stats):
    """One device->host transfer for all stats leaves.

    jax.device_get fetches each pytree leaf with its own round trip; the
    axon tunnel charges ~30-60 ms fixed latency per transfer, so the 8
    BucketStats leaves cost ~0.5 s per bucket. Pack all leaves into one
    float32 vector on device (every field is a small int or float32 — exact
    in f32), transfer once, split on host."""
    import jax
    import jax.numpy as jnp

    leaves, treedef = jax.tree_util.tree_flatten(stats)
    if not all(hasattr(l, "shape") for l in leaves):
        return stats  # already host-side
    flat = jnp.concatenate(
        [jnp.ravel(l).astype(jnp.float32) for l in leaves]
    )
    host = np.asarray(flat)
    out = []
    off = 0
    for l in leaves:
        n = int(np.prod(l.shape)) if l.shape else 1
        out.append(
            host[off : off + n].reshape(l.shape).astype(l.dtype)
        )
        off += n
    return jax.tree_util.tree_unflatten(treedef, out)


class _AsyncEmitter:
    """Fetch+render+write rows on a dedicated worker thread (the reference's
    writer thread, GenotypeWriter.cpp:80-82): the device->host stats fetch —
    the tunnel-latency-bound part — AND the Python-heavy row rendering both
    overlap the next group's dispatch/build on the main thread. Emit order
    doesn't matter — finalise sorts rows by (chrom, pos)."""

    def __init__(self, writer, samples, ploidy_model):
        from concurrent.futures import ThreadPoolExecutor

        self.writer = writer
        self.samples = samples
        self.ploidy_model = ploidy_model
        self.pool = ThreadPoolExecutor(1)
        self.futures = []
        self.failed = []    # (meta, group, exception) — see emit_group_packed
        self.t_fetch = 0.0
        self.t_devwait = 0.0
        self.t_render = 0.0

    def take_failures(self):
        """Drain pending work and return recorded group failures."""
        for f in self.futures:
            f.result()
        self.futures.clear()
        failed, self.failed = self.failed, []
        return failed

    def emit(self, chunk, stats):
        self.futures.append(self.pool.submit(
            self._job, chunk, stats,
        ))

    def emit_group(self, group, stats_stacked):
        """Stacked-group emit: ONE stats fetch for the whole group, then
        per-chunk host-side slicing + rendering on the worker."""
        self.futures.append(self.pool.submit(
            self._group_job, group, stats_stacked,
        ))

    def emit_group_packed(self, group, packed_stats, meta=None):
        """Stacked-group emit from PackedBucketStats: device-wait, one
        compact-byte fetch, host unpack (exact u16 tallies -> f32
        posteriors), then per-chunk rendering. Failures (a dead worker /
        OOM surfaces at the blocking fetch) are RECORDED, not raised: the
        wave loop re-runs failed groups at halved stack depth afterwards
        (graceful degradation at the crash envelope)."""
        self.futures.append(self.pool.submit(
            self._safe_group_packed, group, packed_stats, meta,
        ))

    def _safe_group_packed(self, group, packed, meta):
        try:
            self._group_packed_job(group, packed, meta)
        except Exception as e:  # noqa: BLE001 — recovery point
            self.failed.append((meta, group, e))

    def _group_packed_job(self, group, packed, meta=None):
        import dataclasses as _dc

        import jax

        from .model.stats import unpack_stats_host

        fail_above = int(os.environ.get("BT_WAVE_FAIL_ABOVE_B", "0"))
        if fail_above and len(group) > fail_above:
            raise RuntimeError(
                f"injected wave-group failure at B={len(group)}"
            )
        t0 = time.perf_counter()
        jax.block_until_ready(packed)   # device completion, split from xfer
        t1 = time.perf_counter()
        host_packed = _fetch_packed_stats(packed, len(group))
        t2 = time.perf_counter()
        host = unpack_stats_host(host_packed)
        for b, chunk in enumerate(group):
            stats_b = type(host)(**{
                f.name: getattr(host, f.name)[b]
                for f in _dc.fields(host)
            })
            _emit_records_host(self.writer, chunk, stats_b, self.samples,
                               self.ploidy_model)
        self.t_devwait += t1 - t0
        self.t_fetch += t2 - t1
        self.t_render += time.perf_counter() - t2
        if _LOG_TIMING and meta is not None:
            mb = sum(
                int(np.prod(l.shape)) * np.dtype(l.dtype).itemsize
                for l in jax.tree_util.tree_leaves(host_packed)
            ) / 1e6
            _log(f"[group {meta} B={len(group)}] dev-wait {t1 - t0:.2f}s "
                 f"fetch {t2 - t1:.2f}s ({mb:.0f} MB) "
                 f"render {time.perf_counter() - t2:.2f}s")

    def _group_job(self, group, stats_stacked):
        import dataclasses as _dc

        t0 = time.perf_counter()
        host = _fetch_stats(stats_stacked)
        t1 = time.perf_counter()
        for b, chunk in enumerate(group):
            stats_b = type(host)(**{
                f.name: getattr(host, f.name)[b]
                for f in _dc.fields(host)
            })
            _emit_records_host(self.writer, chunk, stats_b, self.samples,
                               self.ploidy_model)
        self.t_fetch += t1 - t0
        self.t_render += time.perf_counter() - t1

    def _job(self, chunk, stats):
        t0 = time.perf_counter()
        stats = _fetch_stats(stats)
        t1 = time.perf_counter()
        _emit_records_host(self.writer, chunk, stats, self.samples,
                           self.ploidy_model)
        self.t_fetch += t1 - t0
        self.t_render += time.perf_counter() - t1

    def throttle(self, max_pending: int = 16):
        """Bound in-flight stats so device tallies/stats buffers don't pile
        up in HBM ahead of the single fetch worker."""
        while len(self.futures) > max_pending:
            self.futures.pop(0).result()

    def close(self):
        for f in self.futures:
            f.result()  # re-raise worker exceptions
        self.pool.shutdown()


def _emit_records(writer, chunk, stats, samples, ploidy_model):
    stats = _fetch_stats(stats)
    _emit_records_host(writer, chunk, stats, samples, ploidy_model)


def _emit_records_host(writer, chunk, stats, samples, ploidy_model):
    from . import native

    if native.available() and chunk:
        return _emit_records_batch(writer, chunk, stats, samples,
                                   ploidy_model)
    return _emit_records_pyloop(writer, chunk, stats, samples, ploidy_model)


def _emit_records_batch(writer, chunk, stats, samples, ploidy_model):
    """Render a whole stats chunk in batch: numpy site statistics
    (getGenotypeVariantStats, VariantClusterGenotyper.cpp:470-526) + the
    native per-sample FORMAT renderer — byte-identical to the per-record
    path, ~20x faster (the Python f"{x:.6g}" per cell dominated the writer
    thread)."""
    from . import native
    from .writer import fmt_g, phred_cap99

    rows = [
        (ci, vi)
        for ci, fc in enumerate(chunk)
        for vi in range(len(fc.variants))
    ]
    n = len(rows)
    ci_r = np.fromiter((r[0] for r in rows), np.int64, n)
    vi_r = np.fromiter((r[1] for r in rows), np.int64, n)
    gt = np.asarray(stats.gt)[ci_r, :, vi_r]        # [N, S, 2]
    gq = np.asarray(stats.gq)[ci_r, :, vi_r]        # [N, S]
    gpp = np.asarray(stats.gpp)[ci_r, :, vi_r]      # [N, S, G]
    app = np.asarray(stats.app)[ci_r, :, vi_r]      # [N, S, A]
    nak = np.asarray(stats.nak)[ci_r, :, vi_r]
    fak = np.asarray(stats.fak)[ci_r, :, vi_r]
    mac = np.asarray(stats.mac)[ci_r, :, vi_r]
    saf = np.asarray(stats.saf)[ci_r, :, vi_r]
    s_count = gt.shape[1]
    a_max = app.shape[2]

    variants = [chunk[ci].variants[vi] for ci, vi in rows]
    na = np.fromiter((v.num_alleles for v in variants), np.int32, n)
    has_dep = np.fromiter((v.has_dependency for v in variants), bool, n)

    chrom_cache = {}
    ploidy = np.empty((n, s_count), np.int8)
    for i, (ci, vi) in enumerate(rows):
        chrom = chunk[ci].chrom
        p = chrom_cache.get(chrom)
        if p is None:
            p = np.asarray(
                ploidy_model.sample_ploidies(chrom, samples), np.int8
            )
            chrom_cache[chrom] = p
        ploidy[i] = p

    tails = native.render_samples(
        ploidy, gt, gq, gpp, app, nak, fak, mac, saf, na
    )

    # vectorised variant stats over called genotypes
    an = (gt != MISSING).sum(axis=(1, 2))                       # [N]
    vals = gt.reshape(n, -1)
    ac = np.zeros((n, a_max), np.int64)
    r_i, c_i = np.nonzero(vals > 0)
    np.add.at(ac, (r_i, vals[r_i, c_i]), 1)
    acp = np.where((saf == 0) & (app > 0), app, 0).max(axis=1)  # [N, A]
    n_alts = na - 1 - has_dep
    a_idx = np.arange(a_max)
    alt_sel = (a_idx[None, :] >= 1) & (a_idx[None, :] <= n_alts[:, None])
    max_alt_acp = np.where(alt_sel, acp, 0).max(axis=1)

    genome = writer.genome
    prev_chrom = None
    seq = None
    for i, (ci, vi) in enumerate(rows):
        fc = chunk[ci]
        var = variants[i]
        na_i = int(na[i])
        pos1 = var.pos + 1
        if fc.chrom != prev_chrom:
            prev_chrom = fc.chrom
            try:
                seq = genome[fc.chrom]
            except KeyError:
                seq = None
        # REF reconstituted from the genome (GenotypeWriter.cpp:477)
        if seq is not None:
            ref = seq[var.pos : var.pos + len(var.ref)]
            ref = ref.decode() if isinstance(ref, bytes) else str(ref)
        else:
            ref = var.ref
        total = int(an[i])
        qual = phred_cap99(float(max_alt_acp[i]))
        filt = "AN0" if total == 0 else "PASS"
        alt_counts = ac[i, 1:na_i]
        af = alt_counts / total if total > 0 else np.zeros(na_i - 1)
        alts = list(var.alts)
        if var.has_dependency:
            alts.append("*")
        if var.origins:
            aco = ",".join(
                o if o not in ("", None) else "." for o in var.origins
            )
        else:
            aco = ",".join(["."] * len(var.alts))
        if var.has_dependency:
            aco += ",."
        region = _cluster_region_cache(fc)
        info = (
            f"AC={','.join(map(str, alt_counts))}"
            f";AF={','.join(fmt_g(x) for x in af)}"
            f";AN={total}"
            f";ACP={','.join(fmt_g(x) for x in acp[i, :na_i])}"
            f";VCS={len(fc.variants)};VCR={region}"
            f";VCGS={getattr(fc, 'group_size', 1)}"
            f";VCGR={getattr(fc, 'group_region', '') or region}"
            f";HC={fc.hap_allele.shape[0]}"
        )
        if fc.non_covered_alleles[vi]:
            info += (
                ";ANC="
                + ",".join(map(str, sorted(fc.non_covered_alleles[vi])))
            )
        info += f";ACO={aco}"
        site = (
            f"{fc.chrom}\t{pos1}\t"
            f"{';'.join(var.ids) if var.ids else '.'}\t{ref}\t"
            f"{','.join(alts)}\t{qual}\t{filt}\t{info}\t"
            "GT:GQ:GPP:APP:NAK:FAK:MAC:SAF"
        )
        writer.add_line(fc.chrom, pos1, site.encode() + tails[i] + b"\n")


def _cluster_region_cache(fc):
    region = getattr(fc, "_region_str", None)
    if region is None:
        start = min(x.pos for x in fc.variants)
        end = max(x.end for x in fc.variants)
        region = f"{fc.chrom}:{start + 1}-{end}"
        fc._region_str = region
    return region


def _emit_records_pyloop(writer, chunk, stats, samples, ploidy_model):
    gpp, app, gq, gt = stats.gpp, stats.app, stats.gq, stats.gt
    saf, nak, fak, mac = stats.saf, stats.nak, stats.fak, stats.mac

    for ci, fc in enumerate(chunk):
        start = min(x.pos for x in fc.variants)
        end = max(x.end for x in fc.variants)
        region = f"{fc.chrom}:{start + 1}-{end}"
        ploidies = ploidy_model.sample_ploidies(fc.chrom, samples)
        for vi, var in enumerate(fc.variants):
            writer.add(
                VariantGenotypeRecord(
                    chrom=fc.chrom,
                    pos=var.pos + 1,
                    ids=var.ids,
                    ref=var.ref,
                    alts=var.alts,
                    origins=var.origins,
                    has_dependency=var.has_dependency,
                    cluster_size=len(fc.variants),
                    cluster_region=region,
                    group_size=getattr(fc, "group_size", 1),
                    group_region=getattr(fc, "group_region", "") or region,
                    num_candidates=fc.hap_allele.shape[0],
                    non_covered_alleles=fc.non_covered_alleles[vi],
                    ploidies=ploidies,
                    gt=gt[ci, :, vi],
                    gq=gq[ci, :, vi],
                    gpp=gpp[ci, :, vi],
                    app=app[ci, :, vi],
                    nak=nak[ci, :, vi],
                    fak=fak[ci, :, vi],
                    mac=mac[ci, :, vi],
                    saf=saf[ci, :, vi],
                )
            )


def genotype_unit_joint(unit, samples, genome, ploidy_model, out_path,
                        opts: GenotypeOptions, command_lines=(),
                        table=None, counts=None, nb_params=None):
    """Joint noise+genotype estimation (--noise-genotyping,
    estimateNoiseAndGenotypes InferenceEngine.cpp:384-472): every Gibbs
    iteration couples all clusters through the noise rate; tallies collected
    post-burn-in. Clusters are bucketed per size class — one compiled scan
    steps every class each iteration and pools the noise sufficient
    statistics across classes (joint_chain_multi), so one giant cluster no
    longer inflates every cluster's padding."""
    import jax
    import jax.numpy as jnp
    from .model.buckets import slice_bucket, stack_buckets, zero_bucket_like
    from .model.gibbs import (
        joint_chains_stacked, make_outcome_space,
    )
    from .model.stats import FilterConfig, collect_bucket_stats
    from .ops.distributions import np_build_count_log_prob_tables

    rng = np.random.default_rng(opts.random_seed)
    seed = opts.random_seed
    if table is None:
        table, counts = gather_sample_counts(unit, samples, opts.num_host_threads)
    if nb_params is None:
        pstats = parameter_kmer_stats(unit, samples, table, counts)
        nb_params = fit_genomic_nb(pstats)
        _log(f"NB fit: mean={nb_params.mean} var={nb_params.var}")
    ucounts = _UnitCounts(unit, table, counts)

    # nested groups need conditional parent->child sampling; they are
    # genotyped after the joint phase with the joint-estimated noise frozen
    # (the per-iteration noise feedback of rare nested groups is negligible;
    # PARITY.md "Nested clusters")
    fcs = [fc for fc in unit.compiled if not _is_coupled(fc)]
    nested = [fc for fc in unit.compiled if _is_coupled(fc)]
    if not fcs:
        fcs = list(unit.compiled)
        nested = []
    mesh = _get_mesh(opts)

    from .ops.distributions import np_build_genomic_tables

    genomic64 = np_build_genomic_tables(nb_params.p, nb_params.size, 255)
    tables = jnp.asarray(
        np_build_count_log_prob_tables(
            nb_params.p, nb_params.size, np.full(len(samples), 1e-3), 255,
            genomic=genomic64,
        )
    )
    if mesh is not None:
        tables = _replicate_for_mesh(tables, mesh)

    cmap = _class_map(fcs)
    plan = _plan_unit(fcs, cmap, opts, samples, mesh)

    class_chunks, sbuckets, outcomes_list, cfgs, caps_a = [], [], [], [], []
    for key_cls in sorted(plan):
        pc = plan[key_cls]
        bs = [
            _build_bucket_batch(
                chunk, (pc.c_pad, pc.k, pc.h, pc.v), samples, ploidy_model,
                ucounts, seed,
            ).device_arrays()
            for chunk in pc.chunks
        ]
        b_pad = _pow2_at_least(len(bs), 1)
        while len(bs) < b_pad:
            bs.append(zero_bucket_like(bs[0]))
        sb = stack_buckets(bs)
        if mesh is not None:
            sb = _shard_stacked_for_mesh(sb, mesh)
        class_chunks.append(pc.chunks)
        sbuckets.append(sb)
        outcomes_list.append(make_outcome_space(pc.h))
        cfgs.append(pc.cfg)
        caps_a.append(pc.a)
    _log(f"Joint mode: {len(fcs)} clusters in {len(sbuckets)} size classes")

    shape, scale = opts.noise_rate_prior
    key = jax.random.PRNGKey(opts.random_seed)
    # all chains + all classes + all chunks in ONE compiled program; per-
    # chain RNG streams are identical to sequential dispatch
    k77 = jax.random.fold_in(key, 77)
    init_rates = jax.vmap(
        lambda ci: jax.random.gamma(
            jax.random.fold_in(k77, ci), shape, (len(samples),)
        )
    )(jnp.arange(opts.num_chains, dtype=jnp.uint32)) * scale  # [ch, S]
    tallies, ws, trace = joint_chains_stacked(
        key, tuple(sbuckets), tables, init_rates, (shape, scale),
        tuple(outcomes_list), tuple(cfgs), num_chains=opts.num_chains,
    )
    traces = np.concatenate(
        [np.asarray(init_rates)[:, None, :], np.asarray(trace)], axis=1
    )
    _log(f"Finished {opts.num_chains} gibbs sampling chains")

    filters = FilterConfig.from_model(
        nb_params.mean, opts.min_genotype_posterior, opts.min_number_of_kmers,
        opts.disable_observed_kmers,
    )
    prefix = _output_prefix(out_path)
    write_genomic_parameters(prefix, samples, nb_params)
    trace_arr = traces
    mean_rates = trace_arr[:, 1 + opts.burn_in :, :].mean(axis=(0, 1))
    write_noise_parameters(prefix, samples, trace_arr, mean_rates)

    writer = GenotypeVcfWriter(
        out_path, genome, [s.name for s in samples], command_lines
    )
    from .model.stats import collect_bucket_stats_packed_stacked
    from .model.stats import unpack_stats_host
    import dataclasses as _dc

    use_packed = opts.num_chains * opts.num_samples * 2 < 65536
    for bi, chunks in enumerate(class_chunks):
        if use_packed:
            # one packed-byte fetch per stacked class (same transfer-compact
            # path as the frozen-noise waves)
            packed = collect_bucket_stats_packed_stacked(
                sbuckets[bi], outcomes_list[bi], tallies[bi], ws[bi],
                filters, allele_capacity=caps_a[bi],
                mac_top_t=_mac_top_t(outcomes_list[bi]),
            )
            host = unpack_stats_host(
                _fetch_packed_stats(packed, len(chunks))
            )
            for b, chunk in enumerate(chunks):
                stats_b = type(host)(**{
                    f.name: getattr(host, f.name)[b]
                    for f in _dc.fields(host)
                })
                _emit_records_host(writer, chunk, stats_b, samples,
                                   ploidy_model)
            continue
        for b, chunk in enumerate(chunks):
            stats = collect_bucket_stats(
                slice_bucket(sbuckets[bi], b), outcomes_list[bi],
                tallies[bi][b], ws[bi][b], filters,
                allele_capacity=caps_a[bi],
                mac_top_t=_mac_top_t(outcomes_list[bi]),
            )
            _emit_records(writer, chunk, stats, samples, ploidy_model)
    if nested:
        frozen_tables = jnp.asarray(
            np_build_count_log_prob_tables(
                nb_params.p, nb_params.size, mean_rates, 255,
                genomic=genomic64,
            )
        )
        _genotype_nested_set(
            nested, samples, ploidy_model, ucounts, frozen_tables,
            filters, writer, opts, rng, key,
        )
    n = writer.finalise()
    _log(f"Wrote {n} variants to {out_path}")
    return {
        "num_variants": n,
        "noise_traces": traces,
        "nb_mean": nb_params.mean,
        "nb_var": nb_params.var,
    }


def write_cluster_data_artifacts(output_prefix: str, unit: InferenceUnitData,
                                 genome):
    """Emit the reference's shared `<prefix>_cluster_data/` artifact set
    (main.cpp:306-353): intercluster_regions.txt.gz
    (chrom/is_decoy/start/end inclusive, VariantFileParser.cpp:1190-1211),
    parameter_kmers.fa.gz (">k<size>" header + one kmer per line,
    KmerHash.cpp:138-170), and multigroup_kmers.bloomMeta/.bloomData
    (reference ntHash bloom, fpr 0.0001)."""
    import gzip
    import os

    from .ops.kmers import _DECODE
    from .ops.nthash import ReferenceKmerBloom, lanes_to_codes

    d = output_prefix + "_cluster_data"
    os.makedirs(d, exist_ok=True)
    k = unit.kmer_size

    with gzip.open(os.path.join(d, "intercluster_regions.txt.gz"), "wt") as fh:
        for chrom, start, end in unit.regions:
            fh.write(
                f"{chrom}\t{int(genome.is_decoy(chrom))}\t{start}\t{end - 1}\n"
            )

    with gzip.open(os.path.join(d, "parameter_kmers.fa.gz"), "wt") as fh:
        fh.write(f">k{k}\n")
        if len(unit.param_hi):
            codes = lanes_to_codes(unit.param_hi, unit.param_lo, k)
            for row in _DECODE[codes]:
                fh.write(row.tobytes().decode() + "\n")

    mhi = getattr(unit, "multigroup_hi", None)
    mlo = getattr(unit, "multigroup_lo", None)
    if mhi is None:
        mhi = np.zeros(0, np.uint64)
        mlo = np.zeros(0, np.uint64)
    bloom = ReferenceKmerBloom.with_optimal_parameters(
        max(len(mhi), 1), 0.0001, k
    )
    if len(mhi):
        bloom.add(mhi, mlo)
    bloom.save(os.path.join(d, "multigroup_kmers"))
    _log(f"Wrote cluster data artifacts to {d}/")
    return d


def split_units(unit: InferenceUnitData, min_unit_variants: int):
    """Split a compiled unit into independent inference units of at least
    min_unit_variants variants each (file-level multi-node data parallelism,
    main.cpp:217-294 + README "Computational requirements": units are
    genotyped as independent jobs and concatenated).

    Parameter k-mers and regions are shared by every unit (the reference's
    shared bayestyper_cluster_data/, main.cpp:317-353)."""
    total = sum(len(fc.variants) for fc in unit.compiled)
    num_units = max(1, total // max(min_unit_variants, 1))
    if num_units == 1:
        return [unit]
    per_unit = -(-total // num_units)

    units = []
    chunk = []
    count = 0
    compiled = list(unit.compiled)
    for idx, fc in enumerate(compiled):
        chunk.append(fc)
        count += len(fc.variants)
        # never split a nested group across units (its clusters are sampled
        # jointly); cut only at group boundaries
        nxt = compiled[idx + 1] if idx + 1 < len(compiled) else None
        same_group = (
            nxt is not None
            and nxt.chrom == fc.chrom
            and nxt.group_id == fc.group_id
        )
        if count >= per_unit and len(units) < num_units - 1 and not same_group:
            units.append(chunk)
            chunk = []
            count = 0
    if chunk:
        units.append(chunk)

    return [
        InferenceUnitData(
            kmer_size=unit.kmer_size,
            compiled=chunk,
            regions=unit.regions,
            param_hi=unit.param_hi,
            param_lo=unit.param_lo,
            param_mult_female=unit.param_mult_female,
            param_mult_male=unit.param_mult_male,
            exclusion_stats=unit.exclusion_stats,
        )
        for chunk in units
    ]


def concat_vcfs(paths, out_path):
    """Merge per-unit genotype VCFs (bcftools concat equivalent for the
    multi-unit protocol): identical headers, rows re-sorted per contig."""
    import gzip as _gzip
    from collections import defaultdict as _dd

    header = None
    contig_order = []
    rows = _dd(list)
    for path in paths:
        opener = _gzip.open if path.endswith(".gz") else open
        with opener(path, "rt") as fh:
            this_header = []
            for line in fh:
                if line.startswith("#"):
                    this_header.append(line)
                    if line.startswith("##contig=<ID="):
                        name = line.split("ID=")[1].split(",")[0].split(">")[0]
                        if name not in contig_order:
                            contig_order.append(name)
                    continue
                chrom, pos, rest = line.split("\t", 2)
                rows[chrom].append((int(pos), line))
            if header is None:
                header = this_header
    opener = _gzip.open if out_path.endswith(".gz") else open
    n = 0
    with opener(out_path, "wt") as fh:
        fh.writelines(header or [])
        for chrom in contig_order or sorted(rows):
            for _, line in sorted(rows.get(chrom, []), key=lambda x: x[0]):
                fh.write(line)
                n += 1
    return n


# compile-time kmer pool cap: 10x max-haplotype-variant-kmers (the Bernoulli
# subsampling rate is 0.1, so the expected per-chain subset matches the
# reference's 500 cap); clusters at or below it can never trigger the cap
_KMER_POOL_CAP = 10 * 500


def _cap_haplotype_variant_kmers(compiled_cluster, keep, rng,
                                 cap: int = _KMER_POOL_CAP):
    # (pool cap; the exact per-chain 500-cap is applied on device by
    # gibbs.apply_kmer_cap in shuffled order after the Bernoulli draw)
    """Bound the k-mer pool per (haplotype, variant) for giant clusters.

    The reference caps the per-chain subset at max-haplotype-variant-kmers
    (500) applied in shuffled order after the Bernoulli draw
    (isMaxHaplotypeVariantKmer, VariantClusterHaplotypes.cpp:159-178). Here
    the pool is capped once at compile time at 10x that (the Bernoulli rate
    is 0.1, so the expected per-chain subset matches the reference's cap);
    rows are visited in shuffled order and kept while ANY of their
    (haplotype, variant) memberships is still under the cap.
    """
    member = compiled_cluster.member  # [K, V, H] bool
    k, v, h = member.shape
    if k <= cap:  # the pool cannot exceed the cap
        return keep
    totals = member[keep].sum(axis=0)  # [V, H]
    if not (totals > cap).any():
        return keep
    order = rng.permutation(np.flatnonzero(keep))
    counts = np.zeros((v, h), dtype=np.int64)
    new_keep = np.zeros_like(keep)
    for row in order:
        m = member[row]
        under = m & (counts < cap)
        if under.any():
            counts += m
            new_keep[row] = True
    return new_keep
