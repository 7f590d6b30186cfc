// btnative — native host kernels for bayestyper_tpu.
//
// The reference implements its host hot loops in C++ (rolling KmerPair
// updates Kmer.tpp, KMC record decode kmc_api/kmc_file.cpp, HybridHash
// lookups). This library provides the TPU-era equivalents behind a plain C
// ABI consumed via ctypes: canonical k-mer lane extraction, sorted lane-pair
// table lookup, KMC suffix-record decoding, and bloom filter batch ops.
// numpy fallbacks exist for every entry point; this library is the fast
// path for genome-scale inputs.
//
// Build: c++ -O3 -march=native -shared -fPIC -o libbtnative.so btnative.cpp

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <numeric>
#include <thread>
#include <vector>

extern "C" {

// --- per-segment (hi, lo) argsort ----------------------------------------
//
// Entries are grouped into contiguous segments (one per cluster); each
// segment is argsorted by (hi, lo) independently. Replaces a global 3-key
// lexsort for the batch cluster compiler: small cache-resident sorts beat a
// 64-bit radix pass over the whole array ~5x (the reference's analogue is
// the per-leaf LinearMap sort, LinearMap.tpp:123-212).
// seg_off: n_segs+1 offsets into the entry arrays; perm: out, global indices.
void bt_segment_sort(const uint64_t* hi, const uint64_t* lo,
                     const int64_t* seg_off, int64_t n_segs, int64_t* perm) {
    for (int64_t s = 0; s < n_segs; ++s) {
        const int64_t a = seg_off[s], b = seg_off[s + 1];
        std::iota(perm + a, perm + b, a);
        std::sort(perm + a, perm + b, [&](int64_t x, int64_t y) {
            return hi[x] < hi[y] || (hi[x] == hi[y] && lo[x] < lo[y]);
        });
    }
}

// --- canonical k-mer lane extraction -----------------------------------
//
// codes: 2-bit base codes (0..3), valid: 1 where the base was ACGT.
// Emits, for every window of k bases, the canonical (min of forward and
// reverse complement) value split into two uint64 lanes:
//   hi = bases[0:min(27,k)] big-endian, lo = remaining bases.
// Rolling update: forward lanes shift left, rc lanes shift right — one pass.
void bt_kmer_lanes(const uint8_t* codes, const uint8_t* valid, int64_t n,
                   int32_t k, uint64_t* hi, uint64_t* lo, uint8_t* ok) {
    if (n < k) return;
    const int32_t n_hi = k < 27 ? k : 27;
    const int32_t n_lo = k - n_hi;
    const uint64_t hi_mask = (n_hi == 32) ? ~0ULL : ((1ULL << (2 * n_hi)) - 1);
    const uint64_t lo_mask = (n_lo == 0) ? 0 : ((1ULL << (2 * n_lo)) - 1);

    // forward value as one 128-bit quantity split at bit 2*n_lo:
    //   f_hi = value of first n_hi bases, f_lo = value of last n_lo bases
    // rolling append of base b:
    //   carry = top base of f_lo (or b if n_lo == 0)
    //   f_hi = ((f_hi << 2) | carry) & hi_mask
    //   f_lo = ((f_lo << 2) | b) & lo_mask
    // reverse complement lanes roll in the opposite direction:
    //   rc value = sum_j (3-b[i+j]) * 4^j  split as
    //   r_hi = rc bases [n_lo, k) little-endian -> occupies rc_hi lane
    // Maintain rc as two lanes shifted right on append:
    //   r_lo' = (r_lo >> 2) | (bottom of r_hi) << (2*(n_lo-1))
    //   r_hi' = (r_hi >> 2) | (3-b) << (2*(n_hi-1))
    uint64_t f_hi = 0, f_lo = 0, r_hi = 0, r_lo = 0;
    int32_t run = 0;  // number of consecutive valid bases ending here

    for (int64_t i = 0; i < n; ++i) {
        const uint64_t b = codes[i];
        if (valid[i]) {
            ++run;
        } else {
            run = 0;
        }
        // forward roll
        uint64_t carry;
        if (n_lo > 0) {
            carry = (f_lo >> (2 * (n_lo - 1))) & 3ULL;
            f_lo = ((f_lo << 2) | b) & lo_mask;
        } else {
            carry = b;
        }
        f_hi = ((f_hi << 2) | carry) & hi_mask;
        // reverse-complement roll
        const uint64_t cb = 3ULL - b;
        if (n_lo > 0) {
            const uint64_t rc_carry = r_hi & 3ULL;
            r_lo = (r_lo >> 2) | (rc_carry << (2 * (n_lo - 1)));
        }
        r_hi = (r_hi >> 2) | (cb << (2 * (n_hi - 1)));

        const int64_t w = i - k + 1;  // window start index
        if (w >= 0) {
            const bool is_ok = run >= k;
            ok[w] = is_ok;
            if (is_ok) {
                const bool fwd = (f_hi < r_hi) || (f_hi == r_hi && f_lo <= r_lo);
                hi[w] = fwd ? f_hi : r_hi;
                lo[w] = fwd ? f_lo : r_lo;
            } else {
                hi[w] = 0;
                lo[w] = 0;
            }
        }
    }
}

// --- fused per-cluster kmer tables ----------------------------------------
//
// One pass over the batch compiler's (hi, lo, hap) entry stream, segmented
// by cluster: per segment, sort by (hi, lo), emit the unique kmer table,
// per-entry unique-row ids, per-cluster unique counts, and the
// [unique, h_max] multiplicity matrix (saturating at mult_cap). Replaces
// ~10 full numpy passes over hundreds of millions of entries with one
// cache-resident walk (the vectorised python fallback stays in
// graph/batch_compiler.py).
// Returns n_unique. mult_flat must be zeroed by the caller.
int64_t bt_cluster_tables(const uint64_t* hi, const uint64_t* lo,
                          const int64_t* ehap, const int64_t* seg_off,
                          int64_t n_segs, int32_t h_max, int32_t mult_cap,
                          int64_t* urow, uint64_t* u_hi, uint64_t* u_lo,
                          int64_t* k_per_seg, uint8_t* mult_flat) {
    struct E { uint64_t h, l; int64_t i; };
    std::vector<E> buf;
    int64_t u = -1;
    for (int64_t s = 0; s < n_segs; ++s) {
        const int64_t a = seg_off[s], b = seg_off[s + 1];
        buf.resize(b - a);
        for (int64_t j = a; j < b; ++j) {
            buf[j - a] = E{hi[j], lo[j], j};
        }
        std::sort(buf.begin(), buf.end(), [](const E& x, const E& y) {
            return x.h < y.h || (x.h == y.h && x.l < y.l);
        });
        const int64_t u_start = u + 1;
        uint64_t ph = 0, pl = 0;
        bool any = false;
        for (const E& e : buf) {
            if (!any || e.h != ph || e.l != pl) {
                ++u;
                u_hi[u] = e.h;
                u_lo[u] = e.l;
                ph = e.h;
                pl = e.l;
                any = true;
            }
            urow[e.i] = u;
            uint8_t* m = mult_flat + u * h_max + ehap[e.i];
            if (*m < mult_cap) ++(*m);
        }
        k_per_seg[s] = u + 1 - u_start;
    }
    return u + 1;
}

// --- entry -> path mapping -------------------------------------------------
//
// g: sorted global kmer start positions; offsets: path start offsets
// (ascending, n_paths+1). Two-pointer walk replaces a vectorised
// searchsorted over every entry.
void bt_entry_paths(const int64_t* g, int64_t n, const int64_t* offsets,
                    int64_t n_paths, int64_t* pid) {
    int64_t p = 0;
    for (int64_t i = 0; i < n; ++i) {
        while (p + 1 < n_paths && offsets[p + 1] <= g[i]) ++p;
        pid[i] = p;
    }
}

// --- member-span scatter ---------------------------------------------------
//
// For each span (one (path, variant) pair with global query range
// [q0, q1)): find the covered entries in the sorted position array g by
// binary search and set member[urow[e]*v_max*h_max + vi*h_max + hap] for
// each. Replaces the numpy ragged-range expansion (np.repeat + 3-array
// fancy scatter over tens of millions of elements).
void bt_member_spans(const int64_t* g, int64_t n, const int64_t* urow,
                     const int64_t* q0, const int64_t* q1,
                     const int64_t* vi, const int64_t* hap, int64_t n_spans,
                     int64_t v_max, int64_t h_max, uint8_t* member) {
    for (int64_t s = 0; s < n_spans; ++s) {
        // lower_bound(g, q0[s])
        int64_t lo = 0, hi = n;
        while (lo < hi) {
            const int64_t mid = (lo + hi) >> 1;
            if (g[mid] < q0[s]) lo = mid + 1; else hi = mid;
        }
        int64_t e = lo;
        const int64_t stop = q1[s];
        const int64_t col = vi[s] * h_max + hap[s];
        while (e < n && g[e] < stop) {
            member[urow[e] * v_max * h_max + col] = 1;
            ++e;
        }
    }
}

// --- global (hi, lo) pair sort + unique ranking ---------------------------
//
// Replaces numpy's 2-key lexsort (~750 ns/entry) for the multigroup /
// union-table pass: one MSB-bucket histogram pass on the top bits of hi,
// a scatter pass, then cache-resident per-bucket sorts (~80 ns/entry).
// Outputs, for each input entry, the rank of its unique (hi, lo) value in
// sorted order (midx), plus for each unique value the index of one
// representative input entry (rep, length = return value = n_unique).
int64_t bt_pair_unique(const uint64_t* hi, const uint64_t* lo, int64_t n,
                       int64_t* midx, int64_t* rep, int64_t* scratch) {
    if (n == 0) return 0;
    // bucket count: ~8 entries/bucket target, power of two, capped at 2^24
    int32_t bits = 1;
    while ((1LL << bits) < n / 8 && bits < 24) ++bits;
    const int64_t nb = 1LL << bits;
    const int32_t shift = 54 - bits;  // hi uses 54 bits (27 bases)
    // scratch: nb+1 int64 offsets + n int64 perm. The scatter writes only
    // 8B indices; per-bucket sorts gather each bucket's keys into a small
    // local buffer once, so comparisons never touch DRAM. Buckets are
    // independent: two worker threads sort disjoint halves, each emitting
    // LOCAL unique ranks + counts; a fixup pass offsets the second half.
    struct E { uint64_t h, l; int64_t i; };
    int64_t* off = scratch;            // nb + 1
    int64_t* perm = scratch + nb + 1;  // n
    std::fill(off, off + nb + 1, 0);
    for (int64_t i = 0; i < n; ++i) ++off[(hi[i] >> shift) + 1];
    for (int64_t b = 0; b < nb; ++b) off[b + 1] += off[b];
    for (int64_t i = 0; i < n; ++i) {
        const int64_t b = hi[i] >> shift;
        perm[off[b]++] = i;
    }
    // off[b] now holds the END of bucket b; bucket b spans
    // [b ? off[b-1] : 0, off[b])
    auto run = [&](int64_t b_begin, int64_t b_end, int64_t rep_base,
                   int64_t* n_unique_out) {
        std::vector<E> local;
        int64_t u = rep_base - 1;
        uint64_t ph = 0, pl = 0;
        bool any = false;
        int64_t start = b_begin ? off[b_begin - 1] : 0;
        for (int64_t b = b_begin; b < b_end; ++b) {
            const int64_t end = off[b];
            const int64_t m = end - start;
            if (m > 1) {
                local.resize(m);
                for (int64_t j = 0; j < m; ++j) {
                    const int64_t i = perm[start + j];
                    local[j] = E{hi[i], lo[i], i};
                }
                std::sort(local.begin(), local.end(),
                          [](const E& x, const E& y) {
                              return x.h < y.h ||
                                     (x.h == y.h && x.l < y.l);
                          });
                for (int64_t j = 0; j < m; ++j) {
                    const E& e = local[j];
                    perm[start + j] = e.i;
                    if (!any || e.h != ph || e.l != pl) {
                        ++u; rep[u] = e.i; ph = e.h; pl = e.l; any = true;
                    }
                    midx[e.i] = u;
                }
            } else if (m == 1) {
                const int64_t i = perm[start];
                if (!any || hi[i] != ph || lo[i] != pl) {
                    ++u; rep[u] = i; ph = hi[i]; pl = lo[i]; any = true;
                }
                midx[i] = u;
            }
            start = end;
        }
        *n_unique_out = u + 1 - rep_base;
    };

    const int64_t b_mid = nb / 2;
    const int64_t mid_off = b_mid ? off[b_mid - 1] : 0;
    int64_t u1 = 0, u2 = 0;
    // second half's local ids start at mid_off (an upper bound on the first
    // half's unique count); the fixup below compacts them
    std::thread t1(run, 0, b_mid, 0, &u1);
    std::thread t2(run, b_mid, nb, mid_off, &u2);
    t1.join();
    t2.join();
    if (u1 != mid_off) {
        const int64_t delta = mid_off - u1;
        // entries of the second half are exactly perm[mid_off..n)
        for (int64_t j = mid_off; j < n; ++j) midx[perm[j]] -= delta;
        std::memmove(rep + u1, rep + mid_off, sizeof(int64_t) * u2);
    }
    return u1 + u2;
}

// --- path buffer assembly ---------------------------------------------
//
// Writes the batch compiler's chunk buffer (path sequences joined by 'N')
// directly from genome spans and a literal (alt-sequence) pool, replacing
// per-path Python bytes slicing + join. Each path is three segments:
// genome[g0:g1) + literal[l0:l1) + genome[g2:g3) + 'N'. Offsets of each
// path start are returned in path_off (n_paths + 1, includes the final
// end = total buffer length).
void bt_assemble_paths(const uint64_t* genome_ptrs, const int64_t* gsrc,
                       const uint8_t* lit,
                       const int64_t* g0, const int64_t* g1,
                       const int64_t* l0, const int64_t* l1,
                       const int64_t* g2, const int64_t* g3,
                       int64_t n_paths, uint8_t* out, int64_t* path_off) {
    int64_t p = 0;
    for (int64_t i = 0; i < n_paths; ++i) {
        path_off[i] = p;
        const uint8_t* genome = (const uint8_t*)genome_ptrs[gsrc[i]];
        int64_t m = g1[i] - g0[i];
        if (m > 0) { std::memcpy(out + p, genome + g0[i], m); p += m; }
        m = l1[i] - l0[i];
        if (m > 0) { std::memcpy(out + p, lit + l0[i], m); p += m; }
        m = g3[i] - g2[i];
        if (m > 0) { std::memcpy(out + p, genome + g2[i], m); p += m; }
        out[p++] = 'N';
    }
    path_off[n_paths] = p;
}

// --- fused multigroup pass ---------------------------------------------
//
// bt_pair_unique plus everything the cluster phase derives from it, fused
// into the same per-bucket sorted walk (all copies of a (hi, lo) value are
// adjacent after the global sort): emits the union table (u_hi/u_lo), the
// per-entry union row (midx), the per-entry "occurs in >1 cluster" flag
// (ex_multi — clusters own contiguous entry segments, so >1 distinct
// segment == occ > 1 here since per-cluster tables are already deduped),
// and the per-union member flag (OR of member_any). Replaces ~6 numpy
// passes with 30M-element random gathers/scatters.
int64_t bt_multigroup_pass(const uint64_t* hi, const uint64_t* lo,
                           const uint8_t* member_any, int64_t n,
                           int64_t* midx, uint64_t* u_hi, uint64_t* u_lo,
                           uint8_t* u_member, uint8_t* ex_multi,
                           int64_t* scratch) {
    if (n == 0) return 0;
    int32_t bits = 1;
    while ((1LL << bits) < n / 8 && bits < 24) ++bits;
    const int64_t nb = 1LL << bits;
    const int32_t shift = 54 - bits;
    struct E { uint64_t h, l; int64_t i; };
    int64_t* off = scratch;
    int64_t* perm = scratch + nb + 1;
    std::fill(off, off + nb + 1, 0);
    for (int64_t i = 0; i < n; ++i) ++off[(hi[i] >> shift) + 1];
    for (int64_t b = 0; b < nb; ++b) off[b + 1] += off[b];
    for (int64_t i = 0; i < n; ++i) {
        const int64_t b = hi[i] >> shift;
        perm[off[b]++] = i;
    }
    auto run = [&](int64_t b_begin, int64_t b_end, int64_t u_base,
                   int64_t* n_unique_out) {
        std::vector<E> local;
        int64_t u = u_base - 1;
        int64_t run_start = 0;  // perm index where the current unique began
        uint64_t ph = 0, pl = 0;
        bool any = false;
        uint8_t mem = 0;
        int64_t start = b_begin ? off[b_begin - 1] : 0;
        auto close_run = [&](int64_t run_end) {
            if (!any) return;
            u_member[u] = mem;
            if (run_end - run_start > 1) {
                for (int64_t j = run_start; j < run_end; ++j) {
                    ex_multi[perm[j]] = 1;
                }
            }
        };
        for (int64_t b = b_begin; b < b_end; ++b) {
            const int64_t end = off[b];
            const int64_t m = end - start;
            if (m > 1) {
                local.resize(m);
                for (int64_t j = 0; j < m; ++j) {
                    const int64_t i = perm[start + j];
                    local[j] = E{hi[i], lo[i], i};
                }
                std::sort(local.begin(), local.end(),
                          [](const E& x, const E& y) {
                              return x.h < y.h ||
                                     (x.h == y.h && x.l < y.l);
                          });
                for (int64_t j = 0; j < m; ++j) {
                    const E& e = local[j];
                    perm[start + j] = e.i;
                    if (!any || e.h != ph || e.l != pl) {
                        close_run(start + j);
                        ++u;
                        run_start = start + j;
                        u_hi[u] = e.h;
                        u_lo[u] = e.l;
                        ph = e.h; pl = e.l; any = true;
                        mem = 0;
                    }
                    mem |= member_any[e.i];
                    midx[e.i] = u;
                }
            } else if (m == 1) {
                const int64_t i = perm[start];
                if (!any || hi[i] != ph || lo[i] != pl) {
                    close_run(start);
                    ++u;
                    run_start = start;
                    u_hi[u] = hi[i];
                    u_lo[u] = lo[i];
                    ph = hi[i]; pl = lo[i]; any = true;
                    mem = 0;
                }
                mem |= member_any[i];
                midx[i] = u;
            }
            start = end;
        }
        close_run(start);
        *n_unique_out = u + 1 - u_base;
    };
    const int64_t b_mid = nb / 2;
    const int64_t mid_off = b_mid ? off[b_mid - 1] : 0;
    int64_t u1 = 0, u2 = 0;
    std::thread t1(run, 0, b_mid, 0, &u1);
    std::thread t2(run, b_mid, nb, mid_off, &u2);
    t1.join();
    t2.join();
    if (u1 != mid_off) {
        const int64_t delta = mid_off - u1;
        for (int64_t j = mid_off; j < n; ++j) midx[perm[j]] -= delta;
        std::memmove(u_hi + u1, u_hi + mid_off, sizeof(uint64_t) * u2);
        std::memmove(u_lo + u1, u_lo + mid_off, sizeof(uint64_t) * u2);
        std::memmove(u_member + u1, u_member + mid_off, u2);
    }
    return u1 + u2;
}

// --- sorted lane-pair table lookup --------------------------------------
//
// Table sorted by (hi, lo). out[i] = index of query i, or -1.
void bt_lane_lookup(const uint64_t* thi, const uint64_t* tlo, int64_t tn,
                    const uint64_t* qhi, const uint64_t* qlo, int64_t qn,
                    int64_t* out) {
    for (int64_t i = 0; i < qn; ++i) {
        const uint64_t h = qhi[i], l = qlo[i];
        int64_t lo_i = 0, hi_i = tn;
        while (lo_i < hi_i) {
            const int64_t mid = (lo_i + hi_i) >> 1;
            if (thi[mid] < h || (thi[mid] == h && tlo[mid] < l)) {
                lo_i = mid + 1;
            } else {
                hi_i = mid;
            }
        }
        out[i] = (lo_i < tn && thi[lo_i] == h && tlo[lo_i] == l) ? lo_i : -1;
    }
}

// --- root-indexed lane lookup ----------------------------------------------
//
// The plain binary search over multi-million-row tables is DRAM-latency
// bound (~20 dependent cache misses per query). A root offset array over
// the top bits of hi (the TPU-era counterpart of the reference's 4^12-root
// HybridHash, KmerHash.cpp:51) narrows each query to a handful of rows:
// roots[b]..roots[b+1] bound the rows whose (hi >> shift) == b.
void bt_lane_lookup_rooted(const uint64_t* thi, const uint64_t* tlo,
                           const int64_t* roots, int32_t shift,
                           const uint64_t* qhi, const uint64_t* qlo,
                           int64_t qn, int64_t* out) {
    // W-way software-pipelined search: W independent queries advance one
    // probe per round with the NEXT probe prefetched, so the ~100 ns DRAM
    // latency of each level overlaps across the batch instead of
    // serializing per query (the scalar loop ran ~110 ns/query on the
    // 50M-query intercluster genome scan; this runs ~3-4x faster).
    constexpr int W = 16;
    int64_t i = 0;
    for (; i + W <= qn; i += W) {
        int64_t lo_a[W], hi_a[W];
        for (int w = 0; w < W; ++w) {
            const uint64_t b = qhi[i + w] >> shift;
            lo_a[w] = roots[b];
            hi_a[w] = roots[b + 1];
            if (lo_a[w] < hi_a[w]) {
                const int64_t mid = (lo_a[w] + hi_a[w]) >> 1;
                __builtin_prefetch(&thi[mid]);
                __builtin_prefetch(&tlo[mid]);
            }
        }
        bool active = true;
        while (active) {
            active = false;
            for (int w = 0; w < W; ++w) {
                if (lo_a[w] >= hi_a[w]) continue;
                const int64_t mid = (lo_a[w] + hi_a[w]) >> 1;
                const uint64_t h = qhi[i + w], l = qlo[i + w];
                if (thi[mid] < h || (thi[mid] == h && tlo[mid] < l)) {
                    lo_a[w] = mid + 1;
                } else {
                    hi_a[w] = mid;
                }
                if (lo_a[w] < hi_a[w]) {
                    const int64_t nm = (lo_a[w] + hi_a[w]) >> 1;
                    __builtin_prefetch(&thi[nm]);
                    __builtin_prefetch(&tlo[nm]);
                    active = true;
                }
            }
        }
        for (int w = 0; w < W; ++w) {
            const uint64_t h = qhi[i + w], l = qlo[i + w];
            const uint64_t b = h >> shift;
            const int64_t p = lo_a[w];
            out[i + w] =
                (p < roots[b + 1] && thi[p] == h && tlo[p] == l) ? p : -1;
        }
    }
    for (; i < qn; ++i) {
        const uint64_t h = qhi[i], l = qlo[i];
        const uint64_t b = h >> shift;
        int64_t lo_i = roots[b], hi_i = roots[b + 1];
        while (lo_i < hi_i) {
            const int64_t mid = (lo_i + hi_i) >> 1;
            if (thi[mid] < h || (thi[mid] == h && tlo[mid] < l)) {
                lo_i = mid + 1;
            } else {
                hi_i = mid;
            }
        }
        out[i] = (lo_i < roots[b + 1] && thi[lo_i] == h && tlo[lo_i] == l)
                     ? lo_i : -1;
    }
}

// ascending-order check for a (hi, lo) lane batch continuing from
// (prev_hi, prev_lo); returns 1 if sorted ascending, else 0. Replaces a
// 3-temporary numpy pass that cost ~20% of KMC ingestion.
int32_t bt_lanes_ascending(const uint64_t* hi, const uint64_t* lo, int64_t n,
                           uint64_t prev_hi, uint64_t prev_lo,
                           int32_t has_prev) {
    if (n == 0) return 1;
    if (has_prev &&
        (hi[0] < prev_hi || (hi[0] == prev_hi && lo[0] < prev_lo))) {
        return 0;
    }
    for (int64_t i = 1; i < n; ++i) {
        if (hi[i] < hi[i - 1] ||
            (hi[i] == hi[i - 1] && lo[i] < lo[i - 1])) {
            return 0;
        }
    }
    return 1;
}

// --- sorted-stream merge lookup -------------------------------------------
//
// Queries arrive in ascending (hi, lo) order (KMC tables are sorted), so a
// two-pointer merge against the sorted lane table replaces per-query binary
// search (~60ns/query -> ~3ns/query). t0 is the table cursor carried across
// batches of one stream; returns the cursor after the last query.
int64_t bt_lane_merge_lookup(const uint64_t* thi, const uint64_t* tlo,
                             int64_t tn, const uint64_t* qhi,
                             const uint64_t* qlo, int64_t qn, int64_t t0,
                             int64_t* out) {
    int64_t t = t0;
    for (int64_t i = 0; i < qn; ++i) {
        const uint64_t h = qhi[i], l = qlo[i];
        while (t < tn && (thi[t] < h || (thi[t] == h && tlo[t] < l))) ++t;
        out[i] = (t < tn && thi[t] == h && tlo[t] == l) ? t : -1;
    }
    return t;
}

// --- fused KMC ingestion ---------------------------------------------------
//
// Decode a raw .kmc_suf record batch AND merge it against the sorted lane
// table AND write the matched counts column — one pass, no materialised
// hi/lo/count arrays (the numpy glue around the separate decode+merge
// steps moved ~21 GB of intermediates per 13-sample unit). Records are
// sorted, so the LUT walk and the table merge are monotone cursors.
// state in/out (int64[7]): [0]=lut index cursor, [1]=hit count,
// [2]=disorder flag (set + early return if the stream is not ascending —
// caller falls back for the unconsumed tail), [3]=records consumed,
// [4]/[5]=previous key lanes, [6]=have-previous flag (carried across
// batches so a non-monotone batch boundary is also caught).
// Returns the new table cursor.
int64_t bt_kmc_ingest(const uint8_t* records, int64_t n, int32_t rec_size,
                      int32_t sufix_bytes, int32_t counter_bytes,
                      const int64_t* lut_bounds, int64_t lut_entries,
                      int64_t rec0, uint64_t prefix_mask, int32_t lut_len,
                      int32_t k, const uint64_t* thi, const uint64_t* tlo,
                      int64_t tn, int64_t t0, uint8_t* counts,
                      int64_t stride, int64_t col, int64_t* state) {
    const int32_t n_hi = k < 27 ? k : 27;
    const int32_t hi_suf_bases = n_hi - lut_len;
    const bool fast = hi_suf_bases >= 0 && hi_suf_bases % 4 == 0 &&
                      lut_len + 4 * sufix_bytes == k;
    const int32_t hb = fast ? hi_suf_bases / 4 : 0;
    const int32_t lb = fast ? sufix_bytes - hb : 0;
    int64_t li = state[0];
    int64_t hits = state[1];
    int64_t t = t0;
    uint64_t prev_h = (uint64_t)state[4], prev_l = (uint64_t)state[5];
    bool have_prev = state[6] != 0;
    for (int64_t r = 0; r < n; ++r) {
        const int64_t rec_no = rec0 + r;
        while (li + 1 < lut_entries && lut_bounds[li + 1] <= rec_no) ++li;
        const uint64_t pref = (uint64_t)li & prefix_mask;
        const uint8_t* rec = records + r * rec_size;
        uint64_t h, l;
        if (fast) {
            h = pref;
            for (int32_t j = 0; j < hb; ++j) h = (h << 8) | rec[j];
            l = 0;
            for (int32_t j = 0; j < lb; ++j) l = (l << 8) | rec[hb + j];
        } else {
            h = 0; l = 0;
            int32_t base_idx = 0;
            for (int32_t j = 0; j < lut_len; ++j) {
                const uint64_t b = (pref >> (2 * (lut_len - 1 - j))) & 3ULL;
                if (base_idx < n_hi) h = (h << 2) | b; else l = (l << 2) | b;
                ++base_idx;
            }
            for (int32_t sb = 0; sb < sufix_bytes; ++sb) {
                const uint8_t byte = rec[sb];
                for (int32_t q = 3; q >= 0; --q) {
                    if (base_idx >= k) break;
                    const uint64_t b = (byte >> (2 * q)) & 3ULL;
                    if (base_idx < n_hi) h = (h << 2) | b;
                    else l = (l << 2) | b;
                    ++base_idx;
                }
            }
        }
        if (have_prev && (h < prev_h || (h == prev_h && l < prev_l))) {
            state[0] = li;
            state[1] = hits;
            state[2] = 1;   // disorder: caller falls back for the rest
            state[3] = r;
            state[4] = (int64_t)prev_h;
            state[5] = (int64_t)prev_l;
            state[6] = 1;
            return t;
        }
        prev_h = h; prev_l = l; have_prev = true;
        while (t < tn && (thi[t] < h || (thi[t] == h && tlo[t] < l))) ++t;
        if (t < tn && thi[t] == h && tlo[t] == l) {
            uint64_t c = 0;
            for (int32_t cb = 0; cb < counter_bytes; ++cb) {
                c |= (uint64_t)rec[sufix_bytes + cb] << (8 * cb);
            }
            counts[t * stride + col] = c > 255 ? 255 : (uint8_t)c;
            ++hits;
        }
    }
    state[0] = li;
    state[1] = hits;
    state[2] = 0;
    state[3] = n;
    state[4] = (int64_t)prev_h;
    state[5] = (int64_t)prev_l;
    state[6] = have_prev ? 1 : 0;
    return t;
}

// --- KMC suffix-record decode -------------------------------------------
//
// records: n contiguous records of (sufix_bytes + counter_bytes); prefixes:
// per-record prefix values (lut_len bases). Emits big-endian lane pairs and
// counters. Layout per ReadNextKmer (kmc_api/kmc_file.cpp): suffix bytes
// hold 4 bases each, first base in the 2 MSBs; counter little-endian.
void bt_kmc_decode(const uint8_t* records, int64_t n, int32_t rec_size,
                   int32_t sufix_bytes, int32_t counter_bytes,
                   const uint64_t* prefixes, int32_t lut_len, int32_t k,
                   uint64_t* hi, uint64_t* lo, uint64_t* counts) {
    const int32_t n_hi = k < 27 ? k : 27;
    // byte-aligned fast path: when the hi/lo lane boundary falls on a
    // suffix-byte boundary, each suffix byte is 4 big-endian 2-bit bases
    // and lanes assemble by byte concatenation (~4x fewer shift/or ops)
    const int32_t hi_suf_bases = n_hi - lut_len;
    if (hi_suf_bases >= 0 && hi_suf_bases % 4 == 0 &&
        lut_len + 4 * sufix_bytes == k) {
        const int32_t hb = hi_suf_bases / 4;       // suffix bytes in hi
        const int32_t lb = sufix_bytes - hb;       // suffix bytes in lo
        for (int64_t r = 0; r < n; ++r) {
            const uint8_t* rec = records + r * rec_size;
            uint64_t h = prefixes[r];
            for (int32_t j = 0; j < hb; ++j) h = (h << 8) | rec[j];
            uint64_t l = 0;
            for (int32_t j = 0; j < lb; ++j) l = (l << 8) | rec[hb + j];
            uint64_t c = 0;
            for (int32_t cb = 0; cb < counter_bytes; ++cb) {
                c |= (uint64_t)rec[sufix_bytes + cb] << (8 * cb);
            }
            hi[r] = h;
            lo[r] = l;
            counts[r] = c;
        }
        return;
    }
    for (int64_t r = 0; r < n; ++r) {
        const uint8_t* rec = records + r * rec_size;
        uint64_t h = 0, l = 0;
        int32_t base_idx = 0;
        // prefix bases (big-endian within the prefix value)
        for (int32_t j = 0; j < lut_len; ++j) {
            const uint64_t b = (prefixes[r] >> (2 * (lut_len - 1 - j))) & 3ULL;
            if (base_idx < n_hi) h = (h << 2) | b; else l = (l << 2) | b;
            ++base_idx;
        }
        for (int32_t sb = 0; sb < sufix_bytes; ++sb) {
            const uint8_t byte = rec[sb];
            for (int32_t q = 3; q >= 0; --q) {
                if (base_idx >= k) break;
                const uint64_t b = (byte >> (2 * q)) & 3ULL;
                if (base_idx < n_hi) h = (h << 2) | b; else l = (l << 2) | b;
                ++base_idx;
            }
        }
        uint64_t c = 0;
        for (int32_t cb = 0; cb < counter_bytes; ++cb) {
            c |= static_cast<uint64_t>(rec[sufix_bytes + cb]) << (8 * cb);
        }
        hi[r] = h;
        lo[r] = l;
        counts[r] = c;
    }
}

// --- fused padded-bucket assembly ------------------------------------------
//
// Fills the [C,K,*] tensors of one ClusterBucket size class in a single
// cache-friendly pass over the real (unpadded) per-cluster arrays, and runs
// the greedy minimum-cover sparsity estimator (SparsityEstimator.cpp:41-87)
// per cluster with a counter-based splitmix64 tie-break keyed on
// (seed, cluster_id) — deterministic and independent of cluster order, the
// same stream as the Python fallback in model/buckets.py.
//
// Pointer tables carry the addresses of each cluster's contiguous arrays
// (mult [k,h] u8, member [k,v,h] bool, inter_f/inter_m [k] u8); counts come
// from one global rows matrix ([R,S] u8) at src_start[c].
static inline uint64_t mix64s(uint64_t x) {
    x ^= x >> 30; x *= 0xFF51AFD7ED558CCDULL;
    x ^= x >> 27; x *= 0xC4CEB9FE1A85EC53ULL;
    x ^= x >> 31;
    return x;
}

void bt_build_bucket(
    int64_t n, const int64_t* k_i, const int64_t* h_i, const int64_t* v_i,
    const uint64_t* mult_ptr, const uint64_t* member_ptr,
    const uint64_t* interf_ptr, const uint64_t* interm_ptr,
    const uint8_t* rows, const int64_t* src_start, int32_t S,
    const uint8_t* gf, const int64_t* cluster_id, uint64_t seed,
    int64_t K, int64_t H, int64_t V, int64_t W,
    uint8_t* counts, uint8_t* inter, uint8_t* kmer_valid, uint8_t* mult_out,
    uint32_t* member_out, uint8_t* use_sparse, float* sparsity) {
    std::vector<uint8_t> uncovered;
    std::vector<int64_t> row_cover, cand;
    for (int64_t c = 0; c < n; ++c) {
        const int64_t k_n = k_i[c], h_n = h_i[c], v_n = v_i[c];
        const uint8_t* m_src = (const uint8_t*)mult_ptr[c];
        const uint8_t* mem_src = (const uint8_t*)member_ptr[c];
        const uint8_t* if_src = (const uint8_t*)interf_ptr[c];
        const uint8_t* im_src = (const uint8_t*)interm_ptr[c];
        const uint8_t* row_src = rows + src_start[c] * S;
        uncovered.assign(k_n, 0);
        for (int64_t k = 0; k < k_n; ++k) {
            uint8_t* cnt = counts + (c * K + k) * S;
            uint8_t* itr = inter + (c * K + k) * S;
            const uint8_t* r = row_src + k * S;
            const uint8_t f = if_src[k], m = im_src[k];
            uint8_t nz = 0;
            for (int32_t s = 0; s < S; ++s) {
                cnt[s] = r[s];
                itr[s] = gf[s] ? f : m;
                nz |= cnt[s] | itr[s];
            }
            uncovered[k] = nz ? 1 : 0;
            kmer_valid[c * K + k] = 1;
            std::memcpy(mult_out + (c * K + k) * H, m_src + k * h_n, h_n);
            uint32_t* mo = member_out + ((c * K + k) * V) * W;
            const uint8_t* ms = mem_src + k * v_n * h_n;
            for (int64_t v = 0; v < v_n; ++v) {
                for (int64_t h = 0; h < h_n; ++h) {
                    if (ms[v * h_n + h]) {
                        mo[v * W + (h >> 5)] |= 1u << (h & 31);
                    }
                }
            }
        }
        // greedy minimum cover (multiplicity-weighted, ties broken by the
        // per-cluster splitmix64 stream)
        uint64_t state = mix64s(seed ^ ((uint64_t)cluster_id[c] *
                                        0x9E3779B97F4A7C15ULL));
        int64_t n_uncov = 0;
        for (int64_t k = 0; k < k_n; ++k) n_uncov += uncovered[k];
        int64_t csize = 0;
        while (n_uncov > 0) {
            row_cover.assign(h_n, 0);
            for (int64_t k = 0; k < k_n; ++k) {
                if (!uncovered[k]) continue;
                const uint8_t* mr = m_src + k * h_n;
                for (int64_t h = 0; h < h_n; ++h) row_cover[h] += mr[h];
            }
            int64_t best = 0;
            for (int64_t h = 0; h < h_n; ++h) {
                if (row_cover[h] > best) best = row_cover[h];
            }
            if (best == 0) break;  // uncoverable row (Python path asserts)
            cand.clear();
            for (int64_t h = 0; h < h_n; ++h) {
                if (row_cover[h] == best) cand.push_back(h);
            }
            state += 0x9E3779B97F4A7C15ULL;
            const int64_t pick = cand[mix64s(state) % cand.size()];
            ++csize;
            n_uncov = 0;
            for (int64_t k = 0; k < k_n; ++k) {
                uncovered[k] = uncovered[k] && m_src[k * h_n + pick] == 0;
                n_uncov += uncovered[k];
            }
        }
        if (csize > 0) {
            use_sparse[c] = 1;
            double sp = (double)csize / (double)h_n;
            sparsity[c] = (float)(sp < 1.0 ? sp : 1.0);
        }
    }
}

// --- VCF sample-column renderer -------------------------------------------
//
// Renders the per-sample FORMAT columns (GT:GQ:GPP:APP:NAK:FAK:MAC:SAF,
// GenotypeWriter.cpp:57) for a batch of variant rows in one pass. Python's
// per-cell f"{x:.6g}" formatting dominated the genotype phase's writer
// thread (~1.6M snprintf-equivalent calls per 8.7k variants x 13 samples);
// this emits byte-identical output (C snprintf %.6g == Python :.6g on
// glibc, verified across the value range) at C speed.
//
// Layout: ploidy [n,S], gt [n,S,2], gq [n,S], gpp [n,S,Gcap],
// app/nak/fak/mac [n,S,Acap], saf [n,S,Acap], na [n].
// Output: for each row, "\t<cell>\t<cell>..." written to out; row_off[n+1]
// holds byte offsets. Returns total bytes, or -1 if out_cap would overflow.
static inline char* fmt_g6(char* p, double x) {
    return p + snprintf(p, 24, "%.6g", x);
}

int64_t bt_render_samples(const int8_t* ploidy, const int32_t* gt,
                          const float* gq, const float* gpp, const float* app,
                          const float* nak, const float* fak, const float* mac,
                          const uint8_t* saf, const int32_t* na, int64_t n,
                          int32_t S, int32_t Gcap, int32_t Acap,
                          char* out, int64_t out_cap, int64_t* row_off) {
    static const char kNullSample[] = "\t:.:.:.:.:.:.";
    char* p = out;
    char* const end = out + out_cap - 32;  // slack for one field
    for (int64_t r = 0; r < n; ++r) {
        row_off[r] = p - out;
        const int32_t a_n = na[r];
        const int32_t g_n = a_n * (a_n + 1) / 2;
        for (int32_t s = 0; s < S; ++s) {
            // worst case per cell: 2 GT ints + gq + (g_n + 4*a_n) floats
            // at <=13 chars + separators
            if (p + 32 + 14 * (g_n + 4 * a_n) > end) return -1;
            const int8_t pl = ploidy[r * S + s];
            if (pl == 0) {  // null ploidy (GenotypeWriter.cpp:58,319)
                std::memcpy(p, kNullSample, sizeof(kNullSample) - 1);
                p += sizeof(kNullSample) - 1;
                continue;
            }
            *p++ = '\t';
            const int32_t* g2 = gt + (r * S + s) * 2;
            int32_t ng;
            if (pl == 2) {  // diploid: a/b
                if (g2[0] < 0) { *p++ = '.'; }
                else p += snprintf(p, 12, "%d", g2[0]);
                *p++ = '/';
                if (g2[1] < 0) { *p++ = '.'; }
                else p += snprintf(p, 12, "%d", g2[1]);
                ng = g_n;
            } else {  // haploid: single allele, gpp over na entries
                if (g2[0] < 0) { *p++ = '.'; }
                else p += snprintf(p, 12, "%d", g2[0]);
                ng = a_n;
            }
            *p++ = ':';
            p = fmt_g6(p, (double)gq[r * S + s]);
            *p++ = ':';
            const float* v = gpp + ((int64_t)r * S + s) * Gcap;
            for (int32_t j = 0; j < ng; ++j) {
                if (j) *p++ = ',';
                p = fmt_g6(p, (double)v[j]);
            }
            const float* fields[4] = {
                app + ((int64_t)r * S + s) * Acap,
                nak + ((int64_t)r * S + s) * Acap,
                fak + ((int64_t)r * S + s) * Acap,
                mac + ((int64_t)r * S + s) * Acap,
            };
            for (int32_t f = 0; f < 4; ++f) {
                *p++ = ':';
                for (int32_t j = 0; j < a_n; ++j) {
                    if (j) *p++ = ',';
                    p = fmt_g6(p, (double)fields[f][j]);
                }
            }
            *p++ = ':';
            const uint8_t* sv = saf + ((int64_t)r * S + s) * Acap;
            for (int32_t j = 0; j < a_n; ++j) {
                if (j) *p++ = ',';
                p += snprintf(p, 8, "%u", (unsigned)sv[j]);
            }
        }
    }
    row_off[n] = p - out;
    return p - out;
}

// --- bloom filter batch ops ---------------------------------------------
//
// splitmix64 finaliser; must match ops/kmers.py mix64 exactly.
static inline uint64_t mix64(uint64_t x) {
    x ^= x >> 30; x *= 0xFF51AFD7ED558CCDULL;
    x ^= x >> 27; x *= 0xC4CEB9FE1A85EC53ULL;
    x ^= x >> 31;
    return x;
}

void bt_bloom_insert(uint64_t* bits, uint64_t num_bits, int32_t num_hashes,
                     const uint64_t* hi, const uint64_t* lo, int64_t n) {
    for (int64_t i = 0; i < n; ++i) {
        uint64_t h1 = mix64(hi[i] ^ mix64(lo[i] + 0x9E3779B97F4A7C15ULL));
        uint64_t h2 = mix64(h1 ^ 0xC4CEB9FE1A85EC53ULL) | 1ULL;
        uint64_t h = h1;
        for (int32_t j = 0; j < num_hashes; ++j) {
            const uint64_t idx = h % num_bits;
            bits[idx >> 6] |= 1ULL << (idx & 63);
            h += h2;
        }
    }
}

void bt_bloom_query(const uint64_t* bits, uint64_t num_bits,
                    int32_t num_hashes, const uint64_t* hi,
                    const uint64_t* lo, int64_t n, uint8_t* out) {
    for (int64_t i = 0; i < n; ++i) {
        uint64_t h1 = mix64(hi[i] ^ mix64(lo[i] + 0x9E3779B97F4A7C15ULL));
        uint64_t h2 = mix64(h1 ^ 0xC4CEB9FE1A85EC53ULL) | 1ULL;
        uint64_t h = h1;
        uint8_t present = 1;
        for (int32_t j = 0; j < num_hashes && present; ++j) {
            const uint64_t idx = h % num_bits;
            present = (bits[idx >> 6] >> (idx & 63)) & 1ULL;
            h += h2;
        }
        out[i] = present;
    }
}

// --- Myers bit-parallel edit distance ------------------------------------
//
// Block-based Myers/Hyyro Levenshtein: O(n * m / 64) word operations, the
// same core algorithm as the reference's vendored edlib (external/edlib,
// used by bayesTyperTools annotate, Annotate.cpp:57-92). Pattern b runs
// vertically in ceil(m/64) blocks; per text character one add-with-carry
// pass updates the vertical delta vectors, and the score is tracked at the
// pattern's true last row. Returns the exact distance, or any value
// > max_dist once the lower bound |n - m| exceeds it (caller-side guard).

static inline int bt_advance_block(uint64_t& VP, uint64_t& VN, uint64_t Eq,
                                   int hin) {
    const uint64_t Xv = Eq | VN;
    if (hin < 0) Eq |= 1ULL;
    const uint64_t Xh = (((Eq & VP) + VP) ^ VP) | Eq;
    uint64_t Ph = VN | ~(Xh | VP);
    uint64_t Mh = VP & Xh;
    int hout = 0;
    if (Ph & (1ULL << 63)) hout = 1;
    else if (Mh & (1ULL << 63)) hout = -1;
    Ph <<= 1;
    Mh <<= 1;
    if (hin < 0) Mh |= 1ULL;
    else if (hin > 0) Ph |= 1ULL;
    VP = Mh | ~(Xv | Ph);
    VN = Ph & Xv;
    return hout;
}

int64_t bt_myers_ed(const uint8_t* a, int64_t n, const uint8_t* b, int64_t m,
                    int64_t max_dist) {
    if (m == 0) return n;
    if (n == 0) return m;
    const int64_t nm = (n > m) ? (n - m) : (m - n);
    if (max_dist >= 0 && nm > max_dist) return max_dist + 1;

    const int64_t W = (m + 63) / 64;
    std::vector<uint64_t> Peq(256 * W, 0);
    for (int64_t i = 0; i < m; ++i)
        Peq[(size_t)b[i] * W + (i >> 6)] |= 1ULL << (i & 63);

    std::vector<uint64_t> VP(W, ~0ULL), VN(W, 0);
    const int64_t last = W - 1;
    const int r = (int)((m - 1) & 63);
    int64_t score = m;

    for (int64_t j = 0; j < n; ++j) {
        const uint64_t* pc = &Peq[(size_t)a[j] * W];
        int hin = 1;  // row 0 of the virtual top border increases by 1/col
        for (int64_t blk = 0; blk < last; ++blk)
            hin = bt_advance_block(VP[blk], VN[blk], pc[blk], hin);
        // last block: score delta read at the pattern's true last row r
        {
            uint64_t Eq = pc[last];
            const uint64_t Xv = Eq | VN[last];
            if (hin < 0) Eq |= 1ULL;
            const uint64_t Xh = (((Eq & VP[last]) + VP[last]) ^ VP[last]) | Eq;
            uint64_t Ph = VN[last] | ~(Xh | VP[last]);
            uint64_t Mh = VP[last] & Xh;
            if ((Ph >> r) & 1ULL) ++score;
            else if ((Mh >> r) & 1ULL) --score;
            Ph <<= 1;
            Mh <<= 1;
            if (hin < 0) Mh |= 1ULL;
            else if (hin > 0) Ph |= 1ULL;
            VP[last] = Mh | ~(Xv | Ph);
            VN[last] = Ph & Xv;
        }
    }
    return score;
}

}  // extern "C"
