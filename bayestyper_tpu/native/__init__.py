"""ctypes bindings to the btnative C++ host kernels, with transparent
auto-build (the repository's `native/btnative.cpp`) and graceful fallback
to the numpy implementations when no compiler is available.

The reference's host hot paths are C++ (Kmer.tpp rolling updates,
kmc_file.cpp record decode, HybridHash lookups); this module is their
counterpart. API surface mirrors ops.kmers / engine.LaneTable / ops.bloom.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False


def _repo_root():
    return os.path.dirname(os.path.dirname(os.path.dirname(__file__)))


def _lib_path():
    return os.path.join(os.path.dirname(__file__), "libbtnative.so")


def _build():
    src = os.path.join(_repo_root(), "native", "btnative.cpp")
    if not os.path.exists(src):
        return False
    out = _lib_path()
    try:
        subprocess.run(
            ["c++", "-O3", "-march=native", "-pthread", "-shared", "-fPIC",
             "-o", out, src],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    path = _lib_path()
    src = os.path.join(_repo_root(), "native", "btnative.cpp")
    needs_build = not os.path.exists(path) or (
        os.path.exists(src) and os.path.getmtime(src) > os.path.getmtime(path)
    )
    if needs_build and not _build():
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None

    u64p = np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    i64 = ctypes.c_int64
    i32 = ctypes.c_int32
    u64 = ctypes.c_uint64

    lib.bt_segment_sort.argtypes = [u64p, u64p, i64p, i64, i64p]
    lib.bt_pair_unique.argtypes = [u64p, u64p, i64, i64p, i64p, i64p]
    lib.bt_pair_unique.restype = i64
    lib.bt_cluster_tables.argtypes = [u64p, u64p, i64p, i64p, i64, i32, i32,
                                      i64p, u64p, u64p, i64p, u8p]
    lib.bt_cluster_tables.restype = i64
    lib.bt_multigroup_pass.argtypes = [u64p, u64p, u8p, i64, i64p, u64p,
                                       u64p, u8p, u8p, i64p]
    lib.bt_multigroup_pass.restype = i64
    lib.bt_assemble_paths.argtypes = [u64p, i64p, u8p, i64p, i64p, i64p,
                                      i64p, i64p, i64p, i64, u8p, i64p]
    lib.bt_entry_paths.argtypes = [i64p, i64, i64p, i64, i64p]
    lib.bt_member_spans.argtypes = [i64p, i64, i64p, i64p, i64p, i64p, i64p,
                                    i64, i64, i64, u8p]
    lib.bt_kmer_lanes.argtypes = [u8p, u8p, i64, i32, u64p, u64p, u8p]
    lib.bt_lane_lookup.argtypes = [u64p, u64p, i64, u64p, u64p, i64, i64p]
    lib.bt_lane_merge_lookup.argtypes = [u64p, u64p, i64, u64p, u64p, i64,
                                         i64, i64p]
    lib.bt_lane_merge_lookup.restype = i64
    lib.bt_lanes_ascending.argtypes = [u64p, u64p, i64, u64, u64, i32]
    lib.bt_lanes_ascending.restype = i32
    lib.bt_kmc_ingest.argtypes = [u8p, i64, i32, i32, i32, i64p, i64, i64,
                                  u64, i32, i32, u64p, u64p, i64, i64, u8p,
                                  i64, i64, i64p]
    lib.bt_kmc_ingest.restype = i64
    lib.bt_lane_lookup_rooted.argtypes = [u64p, u64p, i64p, i32,
                                          u64p, u64p, i64, i64p]
    lib.bt_kmc_decode.argtypes = [u8p, i64, i32, i32, i32, u64p, i32, i32,
                                  u64p, u64p, u64p]
    lib.bt_bloom_insert.argtypes = [u64p, u64, i32, u64p, u64p, i64]
    lib.bt_bloom_query.argtypes = [u64p, u64, i32, u64p, u64p, i64, u8p]
    i8p = np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.bt_render_samples.argtypes = [
        i8p, i32p, f32p, f32p, f32p, f32p, f32p, f32p, u8p, i32p,
        i64, i32, i32, i32, ctypes.c_char_p, i64, i64p,
    ]
    lib.bt_render_samples.restype = i64
    u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
    lib.bt_build_bucket.argtypes = [
        i64, i64p, i64p, i64p, u64p, u64p, u64p, u64p,
        u8p, i64p, i32, u8p, i64p, u64,
        i64, i64, i64, i64,
        u8p, u8p, u8p, u8p, u32p, u8p, f32p,
    ]
    lib.bt_myers_ed.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_char_p, ctypes.c_int64,
        ctypes.c_int64,
    ]
    lib.bt_myers_ed.restype = ctypes.c_int64
    _LIB = lib
    return _LIB


def available() -> bool:
    return get_lib() is not None


def cluster_tables(hi, lo, ehap, seg_off, h_max, mult_cap):
    """Fused per-segment sort + dedupe + multiplicity (see btnative.cpp).

    Returns (urow [n] int64, u_hi, u_lo [n_unique], k_per_seg [n_segs],
    mult_flat [n_unique, h_max] uint8)."""
    lib = get_lib()
    n = len(hi)
    n_segs = len(seg_off) - 1
    urow = np.empty(n, np.int64)
    u_hi = np.empty(n, np.uint64)
    u_lo = np.empty(n, np.uint64)
    k_per_seg = np.empty(n_segs, np.int64)
    mult_flat = np.zeros((max(n, 1), h_max), np.uint8)
    nu = lib.bt_cluster_tables(
        np.ascontiguousarray(hi, np.uint64),
        np.ascontiguousarray(lo, np.uint64),
        np.ascontiguousarray(ehap, np.int64),
        np.ascontiguousarray(seg_off, np.int64),
        n_segs, h_max, mult_cap, urow, u_hi, u_lo, k_per_seg, mult_flat,
    )
    return urow, u_hi[:nu], u_lo[:nu], k_per_seg, mult_flat[:nu]


def entry_paths(g, offsets):
    """Path index of each sorted global position (two-pointer walk)."""
    lib = get_lib()
    pid = np.empty(len(g), np.int64)
    lib.bt_entry_paths(
        np.ascontiguousarray(g, np.int64), len(g),
        np.ascontiguousarray(offsets, np.int64), len(offsets), pid,
    )
    return pid


def member_spans(g, urow, q0, q1, vi, hap, member_flat):
    """Scatter span-covered entries into the [n_unique, V, H] member tensor."""
    lib = get_lib()
    n_u, v_max, h_max = member_flat.shape
    lib.bt_member_spans(
        np.ascontiguousarray(g, np.int64), len(g),
        np.ascontiguousarray(urow, np.int64),
        np.ascontiguousarray(q0, np.int64),
        np.ascontiguousarray(q1, np.int64),
        np.ascontiguousarray(vi, np.int64),
        np.ascontiguousarray(hap, np.int64),
        len(q0), v_max, h_max, member_flat.view(np.uint8).reshape(-1),
    )


def pair_unique(hi, lo):
    """Global (hi, lo) unique ranking: returns (midx, rep) where midx[i] is
    the sorted-unique rank of entry i and rep[u] is a representative input
    index for unique value u (ranks follow (hi, lo) sorted order)."""
    lib = get_lib()
    n = len(hi)
    midx = np.empty(n, dtype=np.int64)
    rep = np.empty(n, dtype=np.int64)
    bits = 1
    while (1 << bits) < n // 8 and bits < 24:
        bits += 1
    scratch = np.empty((1 << bits) + 1 + n, dtype=np.int64)
    nu = lib.bt_pair_unique(
        np.ascontiguousarray(hi, np.uint64),
        np.ascontiguousarray(lo, np.uint64), n, midx, rep, scratch,
    )
    return midx, rep[:nu]


def assemble_paths(genome_bufs, gsrc, lit, g0, g1, l0, l1, g2, g3):
    """Assemble the 'N'-joined path buffer from genome spans + a literal
    pool. genome_bufs: list of contiguous uint8 arrays (indexed by gsrc).
    Returns (buffer bytes-like uint8 array, path_off [n+1])."""
    lib = get_lib()
    n = len(gsrc)
    ptrs = np.fromiter(
        (b.ctypes.data for b in genome_bufs), np.uint64, len(genome_bufs)
    ) if genome_bufs else np.zeros(1, np.uint64)
    total = int((g1 - g0).sum() + (l1 - l0).sum() + (g3 - g2).sum()) + n
    out = np.empty(total, np.uint8)
    path_off = np.empty(n + 1, np.int64)
    lib.bt_assemble_paths(
        ptrs, np.ascontiguousarray(gsrc, np.int64),
        np.ascontiguousarray(lit, np.uint8),
        np.ascontiguousarray(g0, np.int64), np.ascontiguousarray(g1, np.int64),
        np.ascontiguousarray(l0, np.int64), np.ascontiguousarray(l1, np.int64),
        np.ascontiguousarray(g2, np.int64), np.ascontiguousarray(g3, np.int64),
        n, out, path_off,
    )
    return out, path_off


def multigroup_pass(hi, lo, member_any):
    """Fused global union pass: returns (midx, u_hi, u_lo, u_member,
    ex_multi) — per-entry union row, sorted-unique union table, per-union
    member flag (OR of member_any), per-entry occurs-in->1-cluster flag."""
    lib = get_lib()
    n = len(hi)
    midx = np.empty(n, np.int64)
    u_hi = np.empty(max(n, 1), np.uint64)
    u_lo = np.empty(max(n, 1), np.uint64)
    u_member = np.zeros(max(n, 1), np.uint8)
    ex_multi = np.zeros(n, np.uint8)
    bits = 1
    while (1 << bits) < n // 8 and bits < 24:
        bits += 1
    scratch = np.empty((1 << bits) + 1 + n, dtype=np.int64)
    nu = lib.bt_multigroup_pass(
        np.ascontiguousarray(hi, np.uint64),
        np.ascontiguousarray(lo, np.uint64),
        np.ascontiguousarray(member_any, np.uint8), n,
        midx, u_hi, u_lo, u_member, ex_multi, scratch,
    )
    return (midx, u_hi[:nu], u_lo[:nu], u_member[:nu].astype(bool),
            ex_multi.astype(bool))


def segment_sort(hi, lo, seg_off):
    """Per-segment (hi, lo) argsort; returns the global permutation."""
    lib = get_lib()
    perm = np.empty(len(hi), dtype=np.int64)
    lib.bt_segment_sort(
        np.ascontiguousarray(hi, np.uint64),
        np.ascontiguousarray(lo, np.uint64),
        np.ascontiguousarray(seg_off, np.int64),
        len(seg_off) - 1, perm,
    )
    return perm


def kmer_lanes(codes, valid, k):
    """Native canonical lane extraction (same contract as ops.kmers.kmer_lanes)."""
    lib = get_lib()
    n = len(codes)
    num = max(n - k + 1, 0)
    hi = np.zeros(num, dtype=np.uint64)
    lo = np.zeros(num, dtype=np.uint64)
    ok = np.zeros(num, dtype=np.uint8)
    if num:
        lib.bt_kmer_lanes(
            np.ascontiguousarray(codes, np.uint8),
            np.ascontiguousarray(valid.astype(np.uint8)),
            n, k, hi, lo, ok,
        )
    return hi, lo, ok.astype(bool)


def lane_lookup(table_hi, table_lo, qhi, qlo):
    lib = get_lib()
    out = np.empty(len(qhi), dtype=np.int64)
    lib.bt_lane_lookup(
        np.ascontiguousarray(table_hi), np.ascontiguousarray(table_lo),
        len(table_hi),
        np.ascontiguousarray(qhi, np.uint64),
        np.ascontiguousarray(qlo, np.uint64), len(qhi), out,
    )
    return out


def lane_lookup_rooted(table_hi, table_lo, roots, shift, qhi, qlo):
    """Root-indexed lookup: roots is the [2^bits + 1] offset array over
    (hi >> shift); see build_lane_roots. Large query batches split across
    2 worker threads (the C call releases the GIL and the search is
    DRAM-latency-bound, so a second core nearly doubles throughput)."""
    lib = get_lib()
    qhi = np.ascontiguousarray(qhi, np.uint64)
    qlo = np.ascontiguousarray(qlo, np.uint64)
    thi = np.ascontiguousarray(table_hi)
    tlo = np.ascontiguousarray(table_lo)
    out = np.empty(len(qhi), dtype=np.int64)
    n = len(qhi)
    if n >= 1_000_000:
        from concurrent.futures import ThreadPoolExecutor

        mid = n // 2

        def _half(lo_i, hi_i):
            lib.bt_lane_lookup_rooted(
                thi, tlo, roots, shift, qhi[lo_i:hi_i], qlo[lo_i:hi_i],
                hi_i - lo_i, out[lo_i:hi_i],
            )

        with ThreadPoolExecutor(2) as pool:
            f = pool.submit(_half, 0, mid)
            _half(mid, n)
            f.result()
        return out
    lib.bt_lane_lookup_rooted(thi, tlo, roots, shift, qhi, qlo, n, out)
    return out


def build_lane_roots(table_hi, target_leaf=32):
    """Root offset array over the top bits of hi: (roots, shift). Sized so
    leaves average ~target_leaf rows (2 cache lines per query)."""
    n = len(table_hi)
    bits = 1
    while (1 << bits) < max(n // target_leaf, 2) and bits < 22:
        bits += 1
    shift = 54 - bits
    bounds = np.arange(1, (1 << bits), dtype=np.uint64) << np.uint64(shift)
    roots = np.empty((1 << bits) + 1, np.int64)
    roots[0] = 0
    roots[-1] = n
    roots[1:-1] = np.searchsorted(table_hi, bounds, side="left")
    return roots, shift


def kmc_ingest(raw, n, rec_size, sufix_bytes, counter_bytes, lut_bounds,
               rec0, prefix_mask, lut_len, k, table_hi, table_lo, t0,
               counts, col, state):
    """Fused KMC batch ingestion: decode + sorted-merge against the lane
    table + write the matched counts column, one C pass (see bt_kmc_ingest).
    `counts` is the [T, S] uint8 matrix; `state` is the int64[7] cursor
    block carried across batches. Returns the new table cursor."""
    lib = get_lib()
    buf = np.frombuffer(raw, np.uint8)
    assert counts.flags.c_contiguous
    return int(lib.bt_kmc_ingest(
        buf, n, rec_size, sufix_bytes, counter_bytes,
        np.ascontiguousarray(lut_bounds, np.int64), len(lut_bounds),
        rec0, prefix_mask, lut_len, k,
        np.ascontiguousarray(table_hi), np.ascontiguousarray(table_lo),
        len(table_hi), t0, counts.reshape(-1), counts.shape[1], col, state,
    ))


def lanes_ascending(hi, lo, prev_hi=None, prev_lo=None):
    """True when the (hi, lo) batch is sorted ascending and follows
    (prev_hi, prev_lo). One fused C pass (the numpy version allocated three
    batch-sized temporaries per KMC batch)."""
    lib = get_lib()
    has_prev = prev_hi is not None
    return bool(lib.bt_lanes_ascending(
        np.ascontiguousarray(hi, np.uint64),
        np.ascontiguousarray(lo, np.uint64), len(hi),
        int(prev_hi) if has_prev else 0,
        int(prev_lo) if has_prev else 0, int(has_prev),
    ))


def lane_merge_lookup(table_hi, table_lo, qhi, qlo, t0=0):
    """Merge lookup for ASCENDING query streams: returns (idx, new_cursor).
    idx[i] = table row of query i or -1; new_cursor resumes the next batch
    of the same stream."""
    lib = get_lib()
    out = np.empty(len(qhi), dtype=np.int64)
    t = lib.bt_lane_merge_lookup(
        np.ascontiguousarray(table_hi), np.ascontiguousarray(table_lo),
        len(table_hi),
        np.ascontiguousarray(qhi, np.uint64),
        np.ascontiguousarray(qlo, np.uint64), len(qhi), t0, out,
    )
    return out, t


def kmc_decode(records, rec_size, sufix_bytes, counter_bytes, prefixes,
               lut_len, k):
    lib = get_lib()
    n = len(records) // rec_size
    hi = np.empty(n, dtype=np.uint64)
    lo = np.empty(n, dtype=np.uint64)
    counts = np.empty(n, dtype=np.uint64)
    lib.bt_kmc_decode(
        np.ascontiguousarray(np.frombuffer(records, np.uint8)), n, rec_size,
        sufix_bytes, counter_bytes,
        np.ascontiguousarray(prefixes, np.uint64), lut_len, k, hi, lo, counts,
    )
    return hi, lo, counts


def build_bucket_arrays(fcs, rows, src_start, gf, seed, caps, s):
    """Fused bucket assembly: fills the [C,K,*] tensors + greedy covers.

    fcs: FinalizedClusters (mult/member/inter arrays must be C-contiguous);
    rows: [R, S] uint8 observed counts; src_start: per-cluster row offset;
    gf: [S] bool female flags; caps: (C, K, H, V) padded dims.
    Returns (counts, inter, kmer_valid, mult, member, use_sparse, sparsity).
    """
    lib = get_lib()
    cap_c, cap_k, cap_h, cap_v = caps
    n = len(fcs)
    w = (cap_h + 31) // 32
    k_i = np.fromiter((len(fc.kmer_hi) for fc in fcs), np.int64, n)
    h_i = np.fromiter((fc.hap_allele.shape[0] for fc in fcs), np.int64, n)
    v_i = np.fromiter((len(fc.variants) for fc in fcs), np.int64, n)
    keep = []  # keep contiguous copies alive across the call

    def ptrs(arrays, dtype):
        out = np.empty(n, np.uint64)
        for i, a in enumerate(arrays):
            a = np.ascontiguousarray(a, dtype)
            keep.append(a)
            out[i] = a.ctypes.data
        return out

    mult_p = ptrs((fc.mult for fc in fcs), np.uint8)
    member_p = ptrs((fc.member for fc in fcs), np.uint8)
    interf_p = ptrs((fc.inter_mult_female for fc in fcs), np.uint8)
    interm_p = ptrs((fc.inter_mult_male for fc in fcs), np.uint8)

    counts = np.zeros((cap_c, cap_k, s), np.uint8)
    inter = np.zeros((cap_c, cap_k, s), np.uint8)
    kmer_valid = np.zeros((cap_c, cap_k), np.uint8)
    mult = np.zeros((cap_c, cap_k, cap_h), np.uint8)
    member = np.zeros((cap_c, cap_k, cap_v, w), np.uint32)
    use_sparse = np.zeros(cap_c, np.uint8)
    sparsity = np.full(cap_c, 0.5, np.float32)
    lib.bt_build_bucket(
        n, k_i, h_i, v_i, mult_p, member_p, interf_p, interm_p,
        np.ascontiguousarray(rows, np.uint8),
        np.ascontiguousarray(src_start, np.int64), s,
        np.ascontiguousarray(gf, np.uint8),
        np.fromiter((fc.cluster_id for fc in fcs), np.int64, n),
        np.uint64(seed), cap_k, cap_h, cap_v, w,
        counts, inter, kmer_valid, mult,
        member.reshape(-1), use_sparse, sparsity,
    )
    del keep
    return (counts, inter, kmer_valid.astype(bool), mult, member,
            use_sparse.astype(bool), sparsity)


def render_samples(ploidy, gt, gq, gpp, app, nak, fak, mac, saf, na):
    """Batch-render the per-sample FORMAT columns for n variant rows.

    Returns a list of n bytes objects, each the row's sample-column tail
    beginning with b"\\t" (byte-identical to writer.render_row's per-sample
    portion)."""
    lib = get_lib()
    n, s = gq.shape
    g_cap = gpp.shape[2]
    a_cap = app.shape[2]
    na = np.ascontiguousarray(na, np.int32)
    # exact-enough upper bound: per cell 32 bytes fixed + 14 per float field
    g_n = (na.astype(np.int64) * (na + 1)) // 2
    cap = int((s * (32 + 14 * (g_n + 4 * na.astype(np.int64)) + 8 * na)).sum()) + 64
    out = ctypes.create_string_buffer(cap)
    row_off = np.empty(n + 1, np.int64)
    total = lib.bt_render_samples(
        np.ascontiguousarray(ploidy, np.int8),
        np.ascontiguousarray(gt, np.int32),
        np.ascontiguousarray(gq, np.float32),
        np.ascontiguousarray(gpp, np.float32),
        np.ascontiguousarray(app, np.float32),
        np.ascontiguousarray(nak, np.float32),
        np.ascontiguousarray(fak, np.float32),
        np.ascontiguousarray(mac, np.float32),
        np.ascontiguousarray(saf, np.uint8),
        na, n, s, g_cap, a_cap, out, cap, row_off,
    )
    assert total >= 0, "render buffer overflow"
    raw = out.raw
    return [raw[row_off[i] : row_off[i + 1]] for i in range(n)]


def bloom_insert(bits, num_bits, num_hashes, hi, lo):
    get_lib().bt_bloom_insert(
        bits, np.uint64(num_bits), num_hashes,
        np.ascontiguousarray(hi, np.uint64),
        np.ascontiguousarray(lo, np.uint64), len(hi),
    )


def bloom_query(bits, num_bits, num_hashes, hi, lo):
    out = np.empty(len(hi), dtype=np.uint8)
    get_lib().bt_bloom_query(
        bits, np.uint64(num_bits), num_hashes,
        np.ascontiguousarray(hi, np.uint64),
        np.ascontiguousarray(lo, np.uint64), len(hi), out,
    )
    return out.astype(bool)


def myers_edit_distance(a: bytes, b: bytes, max_dist: int = -1) -> int:
    """Exact Levenshtein distance via block-based Myers bit-parallel DP
    (bt_myers_ed) — the same core algorithm as the reference's vendored
    edlib (Annotate.cpp:57-92 usage). O(len(a) * len(b) / 64) word ops:
    ~0.2 s for a 100 kb x 100 kb comparison. With max_dist >= 0, returns
    max_dist + 1 immediately when the |len(a) - len(b)| lower bound already
    exceeds it."""
    return int(get_lib().bt_myers_ed(a, len(a), b, len(b), int(max_dist)))
