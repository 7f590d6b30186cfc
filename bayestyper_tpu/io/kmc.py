"""KMC k-mer count database reader/writer (.kmc_pre/.kmc_suf).

The reference mandates KMC3 tables as input and ingests them record-at-a-time
through CKMCFile::ReadNextKmer (external/kmc_api/kmc_file.cpp) behind a
reader-thread + consumer-pool pipeline (KmerCounter.cpp:388-524). Here the
format is decoded *vectorised*: whole record batches are reshaped with numpy
and turned straight into canonical (hi, lo) uint64 lane pairs — no per-kmer
loop, no thread pool.

Format (reverse-engineered from kmc_file.cpp:ReadParamsFrom_prefix_file_buf /
ReadNextKmer — reimplemented, not copied):

  .kmc_pre: "KMCP" | prefix LUT (uint64 cumulative record starts per
            lut_prefix value) | [kmc2: signature map] | header fields |
            version u32 | header_offset u32 (low byte used) | "KMCP"
  .kmc_suf: "KMCS" | total_kmers records | "KMCS"
            record = (k - lut_prefix_len)/4 suffix bytes (4 bases/byte,
            first base in the 2 MSBs) + counter (little-endian)

KMC stores canonical k-mers (min of forward/revcomp with A<C<G<T) in sorted
order — the same canonical convention as ops.kmers, so lane pairs from both
sources are directly comparable.

The writer emits the simpler KMC1 layout (kmc_version == 0) which every KMC
API build can list; it is used by the test-suite round-trips and by the
built-in k-mer counter so the pipeline is self-contained without KMC3.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np


@dataclass
class KmcInfo:
    kmer_length: int
    mode: int
    counter_size: int
    lut_prefix_length: int
    signature_len: int
    min_count: int
    max_count: int
    total_kmers: int
    both_strands: bool
    version: int


class KmcReader:
    """Streaming reader over a KMC database, yielding lane-pair batches."""

    def __init__(self, prefix_path: str):
        self.prefix_path = prefix_path
        self._parse_pre(prefix_path + ".kmc_pre")
        self._suf = open(prefix_path + ".kmc_suf", "rb")
        magic = self._suf.read(4)
        if magic != b"KMCS":
            raise ValueError(f"{prefix_path}.kmc_suf: bad marker {magic!r}")
        self._rec_size = self.info.counter_size + self._sufix_size
        self._next_record = 0

    def _parse_pre(self, path: str):
        with open(path, "rb") as fh:
            data = fh.read()
        if data[:4] != b"KMCP" or data[-4:] != b"KMCP":
            raise ValueError(f"{path}: bad markers")
        filesize = len(data)
        version = struct.unpack_from("<I", data, filesize - 12)[0]
        header_offset = data[filesize - 8]
        size = filesize - 4

        if version == 0x200:
            hdr = filesize - (header_offset + 8)
            (klen, mode, csize, lut_len, sig_len, min_c, max_c) = struct.unpack_from(
                "<7I", data, hdr
            )
            total = struct.unpack_from("<Q", data, hdr + 28)[0]
            both = data[hdr + 36] == 0  # negated flag (kmc_file.cpp)
            sig_map_size = (1 << (2 * sig_len)) + 1
            lut_bytes = size - (sig_map_size * 4 + header_offset + 8)
            lut = np.frombuffer(data, dtype="<u8", count=lut_bytes // 8, offset=4).copy()
            # the last LUT slot on disk is unspecified padding; every KMC
            # reader overwrites it with the record sentinel before walking
            # (kmc_file.cpp:221 `prefix_file_buf[last_data_index] =
            # total_kmers + 1`) — without this, stray disk bytes smaller
            # than `total` corrupt the prefix intervals near the end
            lut[-1] = total
        elif version == 0:
            # the reference subtracts the header_offset word's 4 bytes from
            # `size` before locating the header (kmc_file.cpp KMC1 branch:
            # `size = size - 4; header_index = (size - header_offset)/8`
            # with its size = filesize - 8) — i.e. header_index =
            # (filesize - 12 - header_offset) / 8; our `size` is
            # filesize - 4, hence the extra -8
            header_index = (size - 8 - header_offset) // 8
            buf = np.frombuffer(
                data, dtype="<u8", count=(size - 4) // 8, offset=4
            )
            d0 = int(buf[header_index])
            klen = d0 & 0xFFFFFFFF
            mode = d0 >> 32
            d1 = int(buf[header_index + 1])
            csize = d1 & 0xFFFFFFFF
            lut_len = d1 >> 32
            d2 = int(buf[header_index + 2])
            min_c = d2 & 0xFFFFFFFF
            max_c = d2 >> 32
            total = int(buf[header_index + 3])
            d4 = int(buf[header_index + 4])
            both = (d4 & 0xF) != 1
            max_c += d4 & 0xFFFFFFFF00000000
            sig_len = 0
            lut = buf[:header_index].copy()
        else:
            raise ValueError(f"{path}: unsupported KMC version {version:#x}")

        self.info = KmcInfo(
            kmer_length=klen, mode=mode, counter_size=csize,
            lut_prefix_length=lut_len, signature_len=sig_len,
            min_count=min_c, max_count=max_c, total_kmers=total,
            both_strands=both, version=version,
        )
        self._sufix_size = (klen - lut_len) // 4
        assert (klen - lut_len) % 4 == 0

        # Per-record prefix values: LUT entries are cumulative starts; entry i
        # (mod 4^lut_len for kmc2's concatenated LUTs) owns records
        # [lut[i], lut[i+1]). Build the record->prefix map boundaries.
        lut = np.append(lut, np.uint64(total))
        lut = np.minimum(lut, total)
        self._lut = lut
        self._prefix_mask = (1 << (2 * lut_len)) - 1

    def _prefix_values(self, start: int, stop: int) -> np.ndarray:
        """Prefix value for records [start, stop): LUT entry i owns records
        [lut[i], lut[i+1]), so the per-record map is a run-length expansion
        of the overlapping LUT intervals (a per-record searchsorted cost
        ~2.5s per 4M-kmer sample; this is O(lut + n))."""
        lut = self._lut
        i0 = int(np.searchsorted(lut, start, side="right")) - 1
        i1 = int(np.searchsorted(lut, stop, side="left"))
        bounds = np.clip(lut[i0 : i1 + 1].astype(np.int64), start, stop)
        reps = np.diff(bounds)
        idx = np.arange(i0, i1, dtype=np.int64)
        return (np.repeat(idx, reps) & self._prefix_mask).astype(np.uint64)

    def lut_bounds(self):
        """Record-start boundary per LUT entry as int64 (bt_kmc_ingest)."""
        lb = getattr(self, "_lut_i64", None)
        if lb is None:
            import numpy as _np

            lb = _np.ascontiguousarray(self._lut.astype(_np.int64))
            self._lut_i64 = lb
        return lb

    def raw_batches(self, batch_size: int = 1 << 20):
        """Yield (raw_records, n, first_record_number) without decoding —
        the fused native ingestion path (bt_kmc_ingest) consumes these."""
        info = self.info
        while self._next_record < info.total_kmers:
            n = min(batch_size, info.total_kmers - self._next_record)
            raw = self._suf.read(n * self._rec_size)
            if len(raw) < n * self._rec_size:
                raise IOError("truncated .kmc_suf")
            rec0 = self._next_record
            self._next_record += n
            yield raw, n, rec0

    def batches(self, batch_size: int = 1 << 20):
        """Yield (hi, lo, counts) canonical lane batches in file order."""
        info = self.info
        k = info.kmer_length
        n_hi = min(27, k)
        lut_len = info.lut_prefix_length

        from .. import native

        while self._next_record < info.total_kmers:
            n = min(batch_size, info.total_kmers - self._next_record)
            raw = self._suf.read(n * self._rec_size)
            if len(raw) < n * self._rec_size:
                raise IOError("truncated .kmc_suf")

            if native.available():
                pref = self._prefix_values(
                    self._next_record, self._next_record + n
                )
                hi, lo, counts = native.kmc_decode(
                    raw, self._rec_size, self._sufix_size,
                    info.counter_size, pref, lut_len, k,
                )
                self._next_record += n
                yield hi, lo, counts
                continue

            rec = np.frombuffer(raw, dtype=np.uint8).reshape(n, self._rec_size)
            suffix_bytes = rec[:, : self._sufix_size]
            counter_bytes = rec[:, self._sufix_size :]

            counts = np.zeros(n, dtype=np.uint64)
            for b in range(info.counter_size):
                counts |= counter_bytes[:, b].astype(np.uint64) << np.uint64(8 * b)

            # base codes: prefix bases (big-endian) then suffix bytes, 4
            # bases/byte, first base in the MSBs (ReadNextKmer bit layout)
            codes = np.empty((n, k), dtype=np.uint8)
            pref = self._prefix_values(self._next_record, self._next_record + n)
            for j in range(lut_len):
                shift = np.uint64(2 * (lut_len - 1 - j))
                codes[:, j] = (pref >> shift) & np.uint64(3)
            for bidx in range(self._sufix_size):
                byte = suffix_bytes[:, bidx]
                base0 = lut_len + bidx * 4
                codes[:, base0] = (byte >> 6) & 3
                codes[:, base0 + 1] = (byte >> 4) & 3
                codes[:, base0 + 2] = (byte >> 2) & 3
                codes[:, base0 + 3] = byte & 3

            hi = np.zeros(n, dtype=np.uint64)
            for j in range(n_hi):
                hi = (hi << np.uint64(2)) | codes[:, j].astype(np.uint64)
            lo = np.zeros(n, dtype=np.uint64)
            for j in range(n_hi, k):
                lo = (lo << np.uint64(2)) | codes[:, j].astype(np.uint64)

            self._next_record += n
            yield hi, lo, counts

    def close(self):
        self._suf.close()


def write_kmc1(prefix_path: str, hi, lo, counts, kmer_length: int,
               lut_prefix_length: int | None = None, counter_size: int = 4,
               min_count: int = 1):
    """Write a KMC1-format database from canonical lane pairs.

    k-mers are sorted by canonical value; (k - lut_prefix) must be divisible
    by 4 (lut auto-chosen otherwise).
    """
    k = kmer_length
    if lut_prefix_length is None:
        lut_prefix_length = next(p for p in (7, 5, 3, 6, 4, 2, 1) if (k - p) % 4 == 0)
    assert (k - lut_prefix_length) % 4 == 0
    sufix_size = (k - lut_prefix_length) // 4

    hi = np.asarray(hi, np.uint64)
    lo = np.asarray(lo, np.uint64)
    counts = np.asarray(counts, np.uint64)
    # callers usually pass (hi, lo) already in canonical order (the output
    # of count_kmers_from_sequences is sorted); skip the 2-key lexsort then
    already = len(hi) < 2 or bool(np.all(
        (hi[1:] > hi[:-1]) | ((hi[1:] == hi[:-1]) & (lo[1:] >= lo[:-1]))
    ))
    if not already:
        order = np.lexsort((lo, hi))
        hi, lo, counts = hi[order], lo[order], counts[order]
    n = len(hi)

    n_hi = min(27, k)

    def base_at(j):
        """2-bit code of base j straight from the lanes (no [n, k] matrix)."""
        if j < n_hi:
            return (hi >> np.uint64(2 * (n_hi - 1 - j))) & np.uint64(3)
        return (lo >> np.uint64(2 * (k - 1 - j))) & np.uint64(3)

    # prefix values + LUT (lut_prefix_length <= 13 < n_hi: all in the hi lane)
    assert lut_prefix_length <= n_hi
    pref = hi >> np.uint64(2 * (n_hi - lut_prefix_length))
    num_pref = 1 << (2 * lut_prefix_length)
    lut = np.zeros(num_pref, dtype="<u8")
    starts = np.searchsorted(pref, np.arange(num_pref, dtype=np.uint64), side="left")
    lut[:] = starts

    # suffix bytes: 4 bases per byte, combined by lane shifts
    suf = np.zeros((n, sufix_size), dtype=np.uint8)
    for bidx in range(sufix_size):
        base0 = lut_prefix_length + bidx * 4
        byte = np.zeros(n, dtype=np.uint64)
        for t in range(4):
            byte = (byte << np.uint64(2)) | base_at(base0 + t)
        suf[:, bidx] = byte.astype(np.uint8)

    ctr = np.zeros((n, counter_size), dtype=np.uint8)
    for b in range(counter_size):
        ctr[:, b] = (counts >> np.uint64(8 * b)).astype(np.uint64) & np.uint64(0xFF)

    # .kmc_pre (KMC1): marker | LUT | 5 header words | version | offset | marker
    d0 = (0 << 32) | k                       # mode=0, kmer_length
    d1 = (lut_prefix_length << 32) | counter_size
    d2 = (0xFFFFFFFF << 32) | min_count      # max_count hi, min_count lo
    d3 = n
    d4 = 0                                   # both_strands flag (0 -> canonical)
    header = np.array([d0, d1, d2, d3, d4], dtype="<u8")
    # Tail layout constrained by the REFERENCE reader (kmc_file.cpp KMC1
    # branch): it freads (size - 4) bytes into a (size - 4)/8 u64 buffer
    # with size = filesize - 8, so filesize must be ≡ 4 (mod 8) — hence the
    # 4 pad bytes before the version word. It then locates the header at
    # (filesize - 12 - header_offset)/8 u64s past the front marker, so
    # header_offset = 40 (pad + version + offset words counted via the -12)
    # + 8 = 48 lands on d0. Proven against the compiled kmc_api by
    # tests/test_interop_cpp.py.
    header_offset = 8 * 5 + 8
    with open(prefix_path + ".kmc_pre", "wb") as fh:
        fh.write(b"KMCP")
        fh.write(lut.tobytes())
        fh.write(header.tobytes())
        fh.write(struct.pack("<I", 0))               # pad to filesize % 8 == 4
        fh.write(struct.pack("<I", 0))               # kmc_version = 0 (KMC1)
        fh.write(struct.pack("<I", header_offset))
        fh.write(b"KMCP")

    with open(prefix_path + ".kmc_suf", "wb") as fh:
        fh.write(b"KMCS")
        rec = np.concatenate([suf, ctr], axis=1)
        fh.write(rec.tobytes())
        fh.write(b"KMCS")


def write_kmc2(prefix_path: str, hi, lo, counts, kmer_length: int,
               lut_prefix_length: int | None = None, counter_size: int = 4,
               signature_len: int = 5, num_bins: int = 8, min_count: int = 1):
    """Write a KMC2-format (kmc_version 0x200) database from canonical lanes.

    Layout per kmc_file.cpp:ReadParamsFrom_prefix_file_buf (kmc2 branch):
      "KMCP" | concatenated per-bin LUTs (num_bins * 4^lut_len cumulative
      u64 record starts) | sentinel u64 (overwritten by readers,
      kmc_file.cpp:221) | signature map ((4^sig_len + 1) u32: signature ->
      bin) | header (7 u32 + total u64 + both u8) | version 0x200 u32 |
      header_offset u32 | "KMCP"

    k-mers are assigned to bins by their leading `signature_len` bases —
    a simplified signature function (real KMC3 uses canonical minimizers,
    mmer.cpp) that still produces a structurally exact KMC2 file: listing
    via ReadNextKmer walks the concatenated LUTs with `prefix_index &
    prefix_mask` regardless of how signatures map to bins.
    """
    k = kmer_length
    if lut_prefix_length is None:
        lut_prefix_length = next(p for p in (7, 5, 3, 6, 4, 2, 1) if (k - p) % 4 == 0)
    assert (k - lut_prefix_length) % 4 == 0
    sufix_size = (k - lut_prefix_length) // 4
    n_hi = min(27, k)
    assert signature_len <= n_hi and lut_prefix_length <= n_hi

    hi = np.asarray(hi, np.uint64)
    lo = np.asarray(lo, np.uint64)
    counts = np.asarray(counts, np.uint64)
    n = len(hi)

    sig = (hi >> np.uint64(2 * (n_hi - signature_len))).astype(np.int64)
    num_sigs = 1 << (2 * signature_len)
    sig_to_bin = (np.arange(num_sigs, dtype=np.int64) % num_bins).astype("<u4")
    bins = sig_to_bin[sig].astype(np.uint64)

    # records sorted by (bin, kmer) — KMC2 stores bins contiguously, each
    # bin's records sorted by kmer value
    order = np.lexsort((lo, hi, bins))
    hi, lo, counts, bins = hi[order], lo[order], counts[order], bins[order]

    pref = hi >> np.uint64(2 * (n_hi - lut_prefix_length))
    single_lut = 1 << (2 * lut_prefix_length)
    # global LUT index = bin * 4^lut_len + prefix; cumulative record starts
    gidx = bins * np.uint64(single_lut) + pref
    lut = np.zeros(num_bins * single_lut + 1, dtype="<u8")
    lut[: num_bins * single_lut] = np.searchsorted(
        gidx, np.arange(num_bins * single_lut, dtype=np.uint64), side="left"
    )
    lut[-1] = n  # sentinel slot (readers overwrite it)

    def base_at(j):
        if j < n_hi:
            return (hi >> np.uint64(2 * (n_hi - 1 - j))) & np.uint64(3)
        return (lo >> np.uint64(2 * (k - 1 - j))) & np.uint64(3)

    suf = np.zeros((n, sufix_size), dtype=np.uint8)
    for bidx in range(sufix_size):
        base0 = lut_prefix_length + bidx * 4
        byte = np.zeros(n, dtype=np.uint64)
        for t in range(4):
            byte = (byte << np.uint64(2)) | base_at(base0 + t)
        suf[:, bidx] = byte.astype(np.uint8)

    ctr = np.zeros((n, counter_size), dtype=np.uint8)
    for b in range(counter_size):
        ctr[:, b] = (counts >> np.uint64(8 * b)).astype(np.uint64) & np.uint64(0xFF)

    header = struct.pack(
        "<7IQB", k, 0, counter_size, lut_prefix_length, signature_len,
        min_count, 0xFFFFFFFF, n, 0,
    )  # 37 bytes; both_strands byte 0 -> True after the reader's negation
    header_offset = len(header) + 4  # header starts at EOF - header_offset - 8

    with open(prefix_path + ".kmc_pre", "wb") as fh:
        fh.write(b"KMCP")
        fh.write(lut.tobytes())
        fh.write(sig_to_bin.tobytes())
        fh.write(struct.pack("<I", 0))  # sig map has 4^sig_len + 1 entries
        fh.write(header)
        fh.write(struct.pack("<I", 0x200))
        fh.write(struct.pack("<I", header_offset))
        fh.write(b"KMCP")

    with open(prefix_path + ".kmc_suf", "wb") as fh:
        fh.write(b"KMCS")
        fh.write(np.concatenate([suf, ctr], axis=1).tobytes())
        fh.write(b"KMCS")


def count_kmers_from_sequences(seqs, k: int, min_count: int = 1):
    """Built-in exact k-mer counter: sequences -> sorted (hi, lo, counts).

    Replaces the external KMC3 dependency for self-contained runs (the
    reference's pipeline requires KMC3 + makeBloom, README "Usage" 1.2).
    """
    from ..ops.kmers import encode_bases, kmer_lanes

    all_hi, all_lo = [], []
    for seq in seqs:
        codes, valid = encode_bases(seq)
        hi, lo, ok = kmer_lanes(codes, valid, k)
        all_hi.append(hi[ok])
        all_lo.append(lo[ok])
    if not all_hi:
        z = np.zeros(0, np.uint64)
        return z, z, z
    hi = np.concatenate(all_hi)
    lo = np.concatenate(all_lo)

    from .. import native

    if native.available() and len(hi):
        # MSB-bucketed sort+unique (~8x the 2-key lexsort at read scale)
        midx, rep = native.pair_unique(hi, lo)
        counts = np.bincount(midx, minlength=len(rep)).astype(np.uint64)
        uh, ul = hi[rep], lo[rep]
    else:
        order = np.lexsort((lo, hi))
        hi, lo = hi[order], lo[order]
        boundary = np.ones(len(hi), dtype=bool)
        boundary[1:] = (hi[1:] != hi[:-1]) | (lo[1:] != lo[:-1])
        starts = np.flatnonzero(boundary)
        counts = np.diff(np.append(starts, len(hi))).astype(np.uint64)
        uh, ul = hi[starts], lo[starts]
    keep = counts >= min_count
    return uh[keep], ul[keep], counts[keep]
