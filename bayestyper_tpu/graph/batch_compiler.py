"""Batched cluster compiler: the human-scale cluster phase.

`compile_cluster` (compiler.py) walks one cluster at a time — hundreds of
small numpy calls per cluster (~0.65 ms) cap the cluster phase at ~1.5k
clusters/s. This module compiles clusters in BATCHES: path sequences of
thousands of clusters are concatenated into one buffer, k-mers extracted in
ONE native pass, and the per-cluster union/multiplicity/membership tensors
derived from a single global lexsort + vectorised segmented reductions.
This is the throughput role of the reference's threaded 2-pass parse +
graph-construction pipeline (VariantFileParser.cpp:88-215 producer/consumer
batches; KmerCounter.cpp:388-524) re-expressed as array passes instead of
thread pools.

Path enumeration stays per cluster (irregular host work) but gets a fast
path for the dominant shape — a single variant with no containment — that
skips the beam machinery entirely.
"""

from __future__ import annotations

import numpy as np

from ..constants import (
    KMER_SIZE,
    MAX_HAPLOID_MULTIPLICITY,
    MAX_SAMPLE_HAPLOTYPES,
)
from ..ops.kmers import encode_bases, kmer_lanes
from .compiler import (
    CompiledCluster,
    enumerate_paths,
    mark_dependencies,
)

# chunk bounds: total path bytes and cluster count per batch (keeps the flat
# member array [n_unique, Vmax, Hmax] and the lexsort working set bounded)
_CHUNK_BYTES = 48 * 1024 * 1024
_CHUNK_CLUSTERS = 200_000


def _fast_span(cluster, chrom_len: int, kmer_size: int):
    """Single-variant, no-containment fast path: haplotypes = alleles.

    Equivalent to enumerate_paths for this shape (every allele is one path;
    flanks are k-1 clamped to the chromosome) without materialising any
    sequence: the chunk buffer is assembled from (left, right) genome spans
    + the alt literals by bt_assemble_paths. Every path k-mer crosses the
    single variant, so no spans are needed either.
    """
    v = cluster.variants[0]
    flank = kmer_size - 1
    left = max(v.pos - flank, 0)
    right = min(v.end + flank, chrom_len)
    return left, right


def _fast_product_paths(variants, chrom_seq: bytes, kmer_size: int,
                        beam_limit: int):
    """Direct allele-product path enumeration for clusters of strictly
    non-overlapping variants with no containment and no `*` dependencies.

    Produces exactly what enumerate_paths produces for this shape (combos in
    lexicographic order, last variant fastest; reference alleles consume
    nothing so downstream gap fill provides their bases) without the beam
    machinery. Returns None when the shape doesn't qualify.
    """
    total = 1
    prev_pos = -1
    prev_end = -1
    for v in variants:
        if v.has_dependency or v.pos <= prev_pos or v.pos < prev_end:
            return None
        total *= 1 + len(v.alts)
        if total > beam_limit:
            return None
        prev_pos, prev_end = v.pos, v.end
    flank = kmer_size - 1
    left = max(variants[0].pos - flank, 0)
    right = min(max(v.end for v in variants) + flank, len(chrom_seq))

    import itertools

    paths = []
    for combo in itertools.product(
        *[range(1 + len(v.alts)) for v in variants]
    ):
        parts = []
        spans = []
        cursor = left
        pos_len = 0
        for v, a in zip(variants, combo):
            gap = chrom_seq[cursor : v.pos]
            parts.append(gap)
            pos_len += len(gap)
            if a == 0:
                spans.append((pos_len, pos_len + len(v.ref)))
                cursor = v.pos
            else:
                alt = v.alts[a - 1]
                parts.append(alt.encode())
                spans.append((pos_len, pos_len + len(alt)))
                pos_len += len(alt)
                cursor = v.end
        parts.append(chrom_seq[cursor:right])
        paths.append((list(combo), b"".join(parts), spans))
    return paths


def compile_clusters_batch(
    clusters,
    genome,
    kmer_size: int = KMER_SIZE,
    sample_blooms=None,
    max_sample_haplotypes: int = MAX_SAMPLE_HAPLOTYPES,
    child_spans_by_id=None,
    log=None,
):
    """Compile many clusters into CompiledClusters with batched k-mer work.

    Args:
      clusters: list of VariantCluster (any chromosomes).
      genome: Genome (chrom -> bytes).
      child_spans_by_id: optional {cluster_id: [(start, end_incl), ...]} for
        nested containment (same contract as compile_cluster's child_spans).
    Returns list of CompiledCluster in input order.
    """
    import gc

    child_spans_by_id = child_spans_by_id or {}
    out = [None] * len(clusters)

    # bulk object churn (millions of path tuples + per-cluster dataclasses,
    # none cyclic) makes Python's generational GC rescan the heap over and
    # over — ~1/3 of compile wall time at 1M clusters; collect once at the end
    gc_was_enabled = gc.isenabled()
    gc.disable()
    try:
        return _compile_all(
            clusters, genome, kmer_size, sample_blooms,
            max_sample_haplotypes, child_spans_by_id, log, out,
        )
    finally:
        if gc_was_enabled:
            gc.enable()


def _compile_all(clusters, genome, kmer_size, sample_blooms,
                 max_sample_haplotypes, child_spans_by_id, log, out):

    # ---- phase 1: per-cluster path enumeration (irregular host work) ----
    # pathsets rows: (cluster_idx, n_paths, payload, fast) where payload is
    # a (left, right) genome span for fast single-variant clusters (the
    # dominant shape: no sequence is materialised) or
    # (allele_lists, seq_bytes_list, spans_list, retained_list) otherwise
    pathsets = []
    chrom_len_cache = {}
    for ci, cl in enumerate(clusters):
        spans = child_spans_by_id.get(cl.cluster_id, ())
        if (
            len(cl.variants) == 1
            and not spans
            and not cl.variants[0].has_dependency
        ):
            cl_len = chrom_len_cache.get(cl.chrom)
            if cl_len is None:
                cl_len = len(genome[cl.chrom])
                chrom_len_cache[cl.chrom] = cl_len
            pathsets.append((
                ci, 1 + len(cl.variants[0].alts),
                _fast_span(cl, cl_len, kmer_size), True,
            ))
        else:
            variants = sorted(cl.variants, key=lambda v: (v.pos, -len(v.ref)))
            rows = None
            if not spans:
                n_samples = len(sample_blooms) if sample_blooms else 1
                beam_limit = max_sample_haplotypes * max(n_samples, 1) * 4
                rows = _fast_product_paths(
                    variants, genome[cl.chrom], kmer_size, beam_limit
                )
            if rows is not None:
                cl.variants = variants
                pathsets.append((
                    ci, len(rows),
                    ([r[0] for r in rows], [r[1] for r in rows],
                     [r[2] for r in rows], [frozenset()] * len(rows)),
                    False,
                ))
                continue
            variants = mark_dependencies(variants)
            cl.variants = variants
            paths = enumerate_paths(
                cl, genome[cl.chrom], kmer_size, sample_blooms,
                max_sample_haplotypes, child_spans=spans,
            )
            pathsets.append((
                ci, len(paths),
                ([p.allele_indices for p in paths],
                 [p.seq.encode() for p in paths],
                 [p.variant_spans for p in paths],
                 [p.retained_children for p in paths]),
                False,
            ))

    # ---- phase 2: group by (V, H) size class so the flat member array
    # [n_unique, Vmax, Hmax] of each chunk stays tight (mixing one dense
    # cluster into an SNV chunk would inflate every SNV's padding) ----
    def _cls(x):
        p = 1
        while p < x:
            p *= 2
        return p

    order = sorted(
        range(len(pathsets)),
        key=lambda i: (
            _cls(len(clusters[pathsets[i][0]].variants)),
            _cls(pathsets[i][1]),
        ),
    )

    # chunks are independent (disjoint `out` slots) and their heavy passes
    # (native kernels via ctypes, large numpy ops) release the GIL — two
    # workers overlap the host cores
    from concurrent.futures import ThreadPoolExecutor

    chunks = []
    chunk = []
    chunk_bytes = 0
    chunk_cls = None
    for oi in order:
        ps = pathsets[oi]
        ci, n_paths, payload, fast = ps
        if fast:
            left, right = payload
            v = clusters[ci].variants[0]
            nbytes = (right - left) + sum(
                (v.pos - left) + len(a) + (right - v.end) for a in v.alts
            )
        else:
            nbytes = sum(len(s) for s in payload[1])
        cls = (_cls(len(clusters[ci].variants)), _cls(n_paths))
        if chunk and (
            cls != chunk_cls
            or chunk_bytes + nbytes > _CHUNK_BYTES
            or len(chunk) >= _CHUNK_CLUSTERS
        ):
            chunks.append(chunk)
            chunk = []
            chunk_bytes = 0
        chunk.append(ps)
        chunk_bytes += nbytes
        chunk_cls = cls
    if chunk:
        chunks.append(chunk)
    if len(chunks) > 1:
        with ThreadPoolExecutor(max_workers=2) as pool:
            list(pool.map(
                lambda ch: _compile_chunk(ch, clusters, genome, kmer_size,
                                          out),
                chunks,
            ))
    else:
        for ch in chunks:
            _compile_chunk(ch, clusters, genome, kmer_size, out)
    return out


def _assemble_chunk_buffer(pathsets, clusters, genome):
    """Flatten a chunk's paths into the 'N'-joined buffer via genome-span +
    literal segments (bt_assemble_paths): fast clusters never materialise
    their sequences; other clusters route their pre-built bytes through the
    literal pool. Returns (buf uint8, offsets [n+1], path_cluster, path_hap).
    """
    from .. import native

    n_paths = sum(ps[1] for ps in pathsets)
    g0 = np.zeros(n_paths, np.int64)
    g1 = np.zeros(n_paths, np.int64)
    l_len = np.zeros(n_paths, np.int64)
    g2 = np.zeros(n_paths, np.int64)
    g3 = np.zeros(n_paths, np.int64)
    gsrc = np.zeros(n_paths, np.int64)
    path_cluster = np.empty(n_paths, np.int64)
    path_hap = np.empty(n_paths, np.int64)
    lit_parts = []
    genome_bufs = []
    buf_idx = {}
    p = 0
    for li, (ci, np_i, payload, fast) in enumerate(pathsets):
        path_cluster[p : p + np_i] = li
        path_hap[p : p + np_i] = np.arange(np_i)
        if fast:
            cl = clusters[ci]
            bi = buf_idx.get(cl.chrom)
            if bi is None:
                bi = len(genome_bufs)
                seq = genome[cl.chrom]
                genome_bufs.append(
                    np.ascontiguousarray(np.frombuffer(seq, np.uint8))
                )
                buf_idx[cl.chrom] = bi
            left, right = payload
            v = cl.variants[0]
            gsrc[p : p + np_i] = bi
            # ref path: one genome span
            g0[p], g1[p] = left, right
            # alt paths: left flank + alt literal + right flank
            for ai, alt in enumerate(v.alts):
                j = p + 1 + ai
                g0[j], g1[j] = left, v.pos
                lit_parts.append(alt.encode())
                l_len[j] = len(alt)
                g2[j], g3[j] = v.end, right
        else:
            for pi, s in enumerate(payload[1]):
                lit_parts.append(s)
                l_len[p + pi] = len(s)
        p += np_i

    l1 = np.cumsum(l_len)
    l0 = l1 - l_len
    lit = np.frombuffer(b"".join(lit_parts), np.uint8) if lit_parts else \
        np.zeros(0, np.uint8)
    if native.available():
        buf, offsets = native.assemble_paths(
            genome_bufs, gsrc, lit, g0, g1, l0, l1, g2, g3
        )
    else:
        parts = []
        offsets = np.zeros(n_paths + 1, np.int64)
        pos = 0
        for i in range(n_paths):
            offsets[i] = pos
            seg = []
            if g1[i] > g0[i]:
                seg.append(genome_bufs[gsrc[i]][g0[i]:g1[i]])
            if l1[i] > l0[i]:
                seg.append(lit[l0[i]:l1[i]])
            if g3[i] > g2[i]:
                seg.append(genome_bufs[gsrc[i]][g2[i]:g3[i]])
            seg.append(np.frombuffer(b"N", np.uint8))
            row = np.concatenate(seg)
            parts.append(row)
            pos += len(row)
        offsets[n_paths] = pos
        buf = np.concatenate(parts) if parts else np.zeros(0, np.uint8)
    return buf, offsets, path_cluster, path_hap


def _compile_chunk(pathsets, clusters, genome, kmer_size, out):
    """Batched k-mer work for one chunk of clusters."""
    k = kmer_size

    buf, offsets, path_cluster, path_hap = _assemble_chunk_buffer(
        pathsets, clusters, genome
    )

    from .. import native

    have_native = native.available()

    codes, valid = encode_bases(buf)
    hi, lo, ok = kmer_lanes(codes, valid, k)
    g = np.flatnonzero(ok)          # global start positions of valid kmers
    hi, lo = hi[g], lo[g]
    # path of each kmer: separator-crossing kmers are already invalid, so a
    # valid kmer lies fully inside one path
    if have_native:
        pid = native.entry_paths(g, offsets)
    else:
        pid = np.searchsorted(offsets, g, side="right") - 1
    ecl = path_cluster[pid]          # chunk-local cluster per entry
    ehap = path_hap[pid]

    # ---- per-cluster canonical dedupe + multiplicity ----
    # entries are already cluster-contiguous: one fused native pass sorts
    # each segment by (hi, lo), emits the unique tables, per-entry unique
    # rows and the [unique, Hmax] multiplicity matrix (bt_cluster_tables);
    # the numpy fallback does the same in ~10 vectorised passes
    h_max = max((ps[1] for ps in pathsets), default=1)
    v_max = max((len(clusters[ps[0]].variants) for ps in pathsets), default=1)
    n = len(hi)
    if have_native:
        seg_off = np.searchsorted(
            ecl, np.arange(len(pathsets) + 1, dtype=np.int64)
        )
        urow, u_hi, u_lo, k_per_cluster, mult_flat = native.cluster_tables(
            hi, lo, ehap, seg_off, h_max, MAX_HAPLOID_MULTIPLICITY
        )
        n_unique = len(u_hi)
    else:
        perm = np.lexsort((lo, hi, ecl))
        s_hi, s_lo, s_cl = hi[perm], lo[perm], ecl[perm]
        first = np.ones(n, bool)
        if n:
            first[1:] = (
                (s_cl[1:] != s_cl[:-1]) | (s_hi[1:] != s_hi[:-1])
                | (s_lo[1:] != s_lo[:-1])
            )
        urow_sorted = np.cumsum(first) - 1 if n else np.zeros(0, np.int64)
        n_unique = int(first.sum()) if n else 0
        u_hi = s_hi[first] if n else np.zeros(0, np.uint64)
        u_lo = s_lo[first] if n else np.zeros(0, np.uint64)
        u_cl = s_cl[first] if n else np.zeros(0, np.int64)
        k_per_cluster = np.bincount(
            u_cl, minlength=len(pathsets)
        ).astype(np.int64)
        # urow per entry in ORIGINAL order (for positional member ranges)
        urow = np.empty(n, np.int64)
        urow[perm] = urow_sorted
        mult_flat = np.bincount(
            urow * h_max + ehap, minlength=n_unique * h_max
        ).reshape(n_unique, h_max)
        mult_flat = np.minimum(
            mult_flat, MAX_HAPLOID_MULTIPLICITY
        ).astype(np.uint8)
    k_off = np.zeros(len(pathsets) + 1, np.int64)
    np.cumsum(k_per_cluster, out=k_off[1:])

    # ---- membership: [n_unique, Vmax, Hmax] ----
    # fast single-variant clusters: every path kmer crosses the variant, so
    # membership is exactly (multiplicity > 0) — a contiguous slice compare
    # per cluster instead of the ~n_entries random fancy-index scatter that
    # dominated this pass (urow is random within the chunk)
    member_flat = np.zeros((max(n_unique, 1), v_max, h_max), bool)
    fast_mask = np.fromiter((ps[3] for ps in pathsets), bool, len(pathsets))
    if n_unique and fast_mask.all():
        np.greater(mult_flat, 0, out=member_flat[:, 0, :])
    elif fast_mask.any():
        for li in np.flatnonzero(fast_mask):
            a0, a1 = k_off[li], k_off[li + 1]
            np.greater(
                mult_flat[a0:a1], 0, out=member_flat[a0:a1, 0, :]
            )

    # general clusters: span ranges -> contiguous slices of the (path, pos)-
    # ordered entry array via two vectorised searchsorteds on global positions
    sp_q0, sp_q1, sp_vi, sp_hap = [], [], [], []
    gpid = 0
    for li, (ci, np_i, payload, fast) in enumerate(pathsets):
        if fast:
            gpid += np_i
            continue
        spans_lists = payload[2]
        for pi, spans in enumerate(spans_lists):
            off = offsets[gpid]
            plen = offsets[gpid + 1] - offsets[gpid] - 1  # minus separator
            for vi, span in enumerate(spans):
                if span is None:
                    continue
                a, b = span
                if a == b:  # pure deletion: the junction point
                    a, b = a - 1, b + 1
                sp_q0.append(off + max(a - k + 1, 0))
                sp_q1.append(off + min(b, plen))
                sp_vi.append(vi)
                sp_hap.append(pi)
            gpid += 1
    if sp_q0:
        q0 = np.asarray(sp_q0, np.int64)
        q1 = np.asarray(sp_q1, np.int64)
        vi_arr = np.asarray(sp_vi, np.int64)
        hap_arr = np.asarray(sp_hap, np.int64)
        if have_native:
            native.member_spans(g, urow, q0, q1, vi_arr, hap_arr, member_flat)
        else:
            s0 = np.searchsorted(g, q0, side="left")
            s1 = np.searchsorted(g, q1, side="left")
            span_len = s1 - s0
            total = int(span_len.sum())
            if total:
                rep = np.repeat(np.arange(len(q0)), span_len)
                base = np.repeat(s0, span_len)
                incr = np.arange(total) - np.repeat(
                    np.cumsum(span_len) - span_len, span_len
                )
                eidx = base + incr
                member_flat[urow[eidx], vi_arr[rep], hap_arr[rep]] = True

    # ---- chunk-level reductions consumed by finalise (single vectorised
    # passes instead of one small numpy reduction per cluster) ----
    # The missing-allele redirect below only ever copies Trues from another
    # column of the same row, so member_any is already final here.
    chunk_member_any = member_flat.any(axis=(1, 2))
    chunk_mult_max = mult_flat.max(axis=1)

    # ---- per-cluster assembly (views into the chunk arrays; the finalise
    # step copies only when exclusions bind) ----
    hap_cache = {}   # h -> shared [h, 1] identity hap_allele (fast clusters)
    retain_cache = {}  # h -> shared [h, 0] retains
    for li, (ci, np_i, payload, fast) in enumerate(pathsets):
        cl = clusters[ci]
        variants = cl.variants
        h = np_i
        v = len(variants)
        a0, a1 = k_off[li], k_off[li + 1]
        kmer_hi = u_hi[a0:a1]
        kmer_lo = u_lo[a0:a1]
        mult = mult_flat[a0:a1, :h]
        member = member_flat[a0:a1, :v, :h]

        if fast:
            hap_allele = hap_cache.get(h)
            if hap_allele is None:
                hap_allele = np.arange(h, dtype=np.int16)[:, None]
                hap_cache[h] = hap_allele
            retains = retain_cache.get(h)
            if retains is None:
                retains = np.zeros((h, 0), bool)
                retain_cache[h] = retains
        else:
            hap_allele = np.zeros((h, v), np.int16)
            for pi, ai in enumerate(payload[0]):
                hap_allele[pi] = ai
            n_children = len(cl.children_ids)
            retains = np.zeros((h, n_children), bool)
            for pi, r in enumerate(payload[3]):
                for idx in r:
                    retains[pi, idx] = True

        # missing-allele member redirect (addHaplotypeKmerStats,
        # VariantClusterHaplotypes.cpp:330-350) — only when a dependency
        # allele exists on this cluster
        if any(var.has_dependency for var in variants):
            for pi in range(h):
                last_non_missing = -1
                for vi, var in enumerate(variants):
                    a = hap_allele[pi, vi]
                    if var.has_dependency and a == var.num_alleles - 1:
                        if last_non_missing >= 0:
                            member[:, vi, pi] = member[:, last_non_missing, pi]
                    else:
                        last_non_missing = vi

        if fast:
            non_covered = [[]]
        else:
            non_covered = []
            for vi, var in enumerate(variants):
                covered = set(hap_allele[:, vi].tolist())
                if var.has_dependency:
                    covered.add(var.num_alleles - 1)
                non_covered.append(
                    [x for x in range(var.num_alleles) if x not in covered]
                )

        out[ci] = CompiledCluster(
            cluster_id=cl.cluster_id,
            chrom=cl.chrom,
            variants=variants,
            hap_allele=hap_allele,
            kmer_hi=kmer_hi,
            kmer_lo=kmer_lo,
            mult=mult,
            member=member,
            non_covered_alleles=non_covered,
            group_id=cl.group_id,
            group_size=cl.group_size,
            group_region=cl.group_region,
            parent_id=cl.parent_id,
            children_ids=list(cl.children_ids),
            depth=cl.depth,
            retains=retains,
            member_any=chunk_member_any[a0:a1],
            mult_max=chunk_mult_max[a0:a1],
        )
