"""Variant normalisation + allele classification + exclusion rules.

Equivalent of the per-variant half of VariantFileParser
(VariantFileParser.cpp:342-733): uppercase, right-trim shared suffixes,
`*` dependency alleles, exclusion rules (decoy / not-in-genome /
ref-mismatch / chromosome-end / over-long alleles / ambiguous nucleotides),
and allele type classification (SNV/Insertion/Deletion/Complex/Mixture).
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field

import numpy as np

from ..constants import MAX_ALLELE_LENGTH


class AlleleType(enum.Enum):
    REFERENCE = "Reference"
    SNV = "SNV"
    INSERTION = "Insertion"
    DELETION = "Deletion"
    INVERSION = "Inversion"
    COMPLEX = "Complex"
    MISSING = "Missing"


class ExclusionReason(enum.Enum):
    DECOY = "decoy"
    NOT_IN_GENOME = "chromosome absent from genome"
    REF_MISMATCH = "reference allele mismatch"
    CHROM_END = "exceeds chromosome end"
    TOO_LONG = "allele longer than max-allele-length"
    AMBIGUOUS = "ambiguous nucleotide in allele"


@dataclass
class NormalizedVariant:
    """One candidate variant after normalisation.

    pos is 0-based; ref/alts uppercase with the common suffix right-trimmed
    (VariantFileParser.cpp:563-580). has_dependency marks variants carrying a
    `*` allele (overlap with an upstream deletion: the trailing missing
    allele, VariantInfo.hpp:79-82).
    """

    chrom: str
    pos: int
    ids: list
    ref: str
    alts: list                   # alt sequences, '*' removed
    has_dependency: bool
    alt_types: list = field(default_factory=list)
    origins: list = field(default_factory=list)   # ACO origin tags per alt
    line_index: int = -1
    cnv_extension: int = 0       # copy-number tail (copyNumberVariantLength)

    @property
    def num_alleles(self):
        # ref + alts + optional missing (VariantInfo.hpp:79-82)
        return 1 + len(self.alts) + int(self.has_dependency)

    @property
    def end(self):
        """0-based exclusive reference end."""
        return self.pos + len(self.ref)

    @property
    def influence_end(self):
        """End of the cluster-merging influence region: the reference span
        plus any copy-number tail (VariantFileParser.cpp:493)."""
        return self.end + self.cnv_extension

    @property
    def end_positions(self):
        """Per-alt 0-based INCLUSIVE reference end positions after the
        reference's pairwise right-trim (cur_end_positions,
        VariantFileParser.cpp:480-494). The joint right-trim stored here is
        the max of the per-alt trims; each alt's own trimmed ref length is
        recovered by re-trimming the (ref, alt) pair with the >=1 floor."""
        ends = set()
        for alt in self.alts:
            n = 0
            while (
                n < len(self.ref) - 1
                and n < len(alt) - 1
                and self.ref[len(self.ref) - 1 - n] == alt[len(alt) - 1 - n]
            ):
                n += 1
            ends.add(self.pos + (len(self.ref) - n) - 1)
        if not ends:
            ends.add(self.pos + len(self.ref) - 1)
        return ends

    def allele_seq(self, allele_idx: int) -> str | None:
        """Sequence of allele_idx (0=ref), None for the missing allele."""
        if allele_idx == 0:
            return self.ref
        if allele_idx <= len(self.alts):
            return self.alts[allele_idx - 1]
        return None

    def is_missing(self, allele_idx: int) -> bool:
        return self.has_dependency and allele_idx == self.num_alleles - 1


_RC = str.maketrans("ACGTN", "TGCAN")


def is_inversion(alt: str, ref: str, min_match_fraction: float = 0.95,
                 min_size: int = 10) -> bool:
    """Equal-length alleles where the alt is (approximately) the reverse
    complement of the reference (Auxiliaries::isInversion,
    Auxiliaries.cpp:206-257): >= min_match_fraction matching non-N bases."""
    if len(alt) != len(ref) or len(alt) < min_size:
        return False
    rc = alt.translate(_RC)[::-1]
    correct = sum(
        1 for a, b in zip(rc, ref) if a == b and a != "N"
    )
    return correct / len(rc) >= min_match_fraction


def classify_allele(ref: str, alt: str) -> AlleleType:
    """SNV/Ins/Del/Inversion/Complex typing after full trim
    (VariantFileParser.cpp:624-647 + Auxiliaries::alleleAttributes,
    Auxiliaries.cpp:142-203 — equal-length non-SNV alleles check the
    inversion test before falling back to Complex)."""
    r, a = _full_trim(ref, alt)
    if len(r) == 0 and len(a) == 0:
        return AlleleType.REFERENCE
    if len(r) == 1 and len(a) == 1:
        return AlleleType.SNV
    if len(r) == 0:
        return AlleleType.INSERTION
    if len(a) == 0:
        return AlleleType.DELETION
    if len(r) == len(a) and is_inversion(a, r):
        return AlleleType.INVERSION
    return AlleleType.COMPLEX


def _full_trim(ref: str, alt: str):
    """Trim shared suffix then shared prefix (Auxiliaries.cpp:41-100)."""
    i = 0
    while i < min(len(ref), len(alt)) and ref[len(ref) - 1 - i] == alt[len(alt) - 1 - i]:
        i += 1
    r, a = ref[: len(ref) - i], alt[: len(alt) - i]
    j = 0
    while j < min(len(r), len(a)) and r[j] == a[j]:
        j += 1
    return r[j:], a[j:]


def right_trim(ref: str, alts: list):
    """Remove the shared suffix across ref + all alts, keeping length >= 1
    (VariantFileParser.cpp:563-580)."""
    if not alts:
        return ref, alts
    n = 0
    min_len = min([len(ref)] + [len(a) for a in alts])
    while n < min_len - 1:
        ch = ref[len(ref) - 1 - n]
        if all(a[len(a) - 1 - n] == ch for a in alts):
            n += 1
        else:
            break
    if n == 0:
        return ref, alts
    return ref[: len(ref) - n], [a[: len(a) - n] for a in alts]


_VALID_NT = frozenset("ACGT")


def normalize_variant(vcf_variant, genome, max_allele_length=MAX_ALLELE_LENGTH):
    """VcfVariant -> (NormalizedVariant | None, {alt_index: ExclusionReason}).

    Applies the reference's allele exclusion rules
    (VariantFileParser.cpp:382-463). Returns (None, reasons) if the whole
    variant is excluded (decoy / absent chromosome / ref problems), else the
    normalised variant with surviving alts (symbolic alleles must have been
    converted by tools.convert_allele first — remaining `<...>` alleles are
    dropped as ambiguous).
    """
    reasons = {}
    chrom = vcf_variant.chrom
    if chrom not in genome:
        return None, {-1: ExclusionReason.NOT_IN_GENOME}
    if genome.is_decoy(chrom):
        return None, {-1: ExclusionReason.DECOY}

    chrom_seq = genome[chrom]
    pos = vcf_variant.pos - 1
    ref = vcf_variant.ref.upper()

    if pos + len(ref) > len(chrom_seq):
        return None, {-1: ExclusionReason.CHROM_END}
    genome_ref = chrom_seq[pos : pos + len(ref)].decode()
    if genome_ref != ref:
        return None, {-1: ExclusionReason.REF_MISMATCH}
    if len(ref) > max_allele_length:
        return None, {-1: ExclusionReason.TOO_LONG}

    has_dependency = False
    alts = []
    origins = []
    raw_origins = (vcf_variant.info_get("ACO") or "").split(":")
    for i, alt in enumerate(vcf_variant.alts):
        alt = alt.upper()
        origin = raw_origins[i] if i < len(raw_origins) else "."
        if alt in ("*", "."):
            # overlap-deletion dependency allele (VariantFileParser.cpp:342-377)
            has_dependency = True
            continue
        if alt.startswith("<") or not set(alt) <= _VALID_NT:
            reasons[i] = ExclusionReason.AMBIGUOUS
            continue
        if len(alt) > max_allele_length:
            reasons[i] = ExclusionReason.TOO_LONG
            continue
        alts.append(alt)
        origins.append(origin)

    if not set(ref) <= _VALID_NT:
        return None, {-1: ExclusionReason.AMBIGUOUS}
    if not alts:
        return None, reasons

    ref, alts = right_trim(ref, alts)
    nv = NormalizedVariant(
        chrom=chrom,
        pos=pos,
        ids=list(vcf_variant.ids),
        ref=ref,
        alts=alts,
        has_dependency=has_dependency,
        alt_types=[classify_allele(ref, a) for a in alts],
        origins=origins,
    )
    return nv, reasons


def copy_number_variant_length(allele_seq: str, chrom_seq: bytes,
                               start: int, kmer_size: int,
                               threshold: float = 0.5) -> int:
    """Copy-number tail extension (copyNumberVariantLength,
    VariantFileParser.cpp:649-733): extend downstream of the variant while a
    sliding reference window shares >= `threshold` identical canonical
    k-mers with the allele sequence — duplications/CNVs then pull the
    repeated reference copies into the variant's cluster influence region.
    """
    from ..ops.kmers import encode_bases, kmer_lanes, lane_search

    if len(allele_seq) < kmer_size:
        return 0
    codes, valid = encode_bases(allele_seq.encode())
    hi, lo, ok = kmer_lanes(codes, valid, kmer_size)
    if not ok.any():
        return 0
    a_hi, a_lo = hi[ok], lo[ok]
    order = np.lexsort((a_lo, a_hi))
    a_hi = np.ascontiguousarray(a_hi[order])
    a_lo = np.ascontiguousarray(a_lo[order])

    length = 0
    chrom_len = len(chrom_seq)
    while True:
        window_start = start + length
        window_end = min(window_start + len(allele_seq), chrom_len)
        if window_end - window_start < kmer_size:
            break
        wcodes, wvalid = encode_bases(chrom_seq[window_start:window_end])
        whi, wlo, wok = kmer_lanes(wcodes, wvalid, kmer_size)
        whi, wlo = whi[wok], wlo[wok]
        if len(whi) == 0:
            break
        hits = lane_search(a_hi, a_lo, whi, wlo) >= 0
        # best-scoring prefix window (identical-kmer fraction over windows
        # ending at each position, ties -> longest). Vectorised form of the
        # scalar scan: an index i is "selected" when cum>0 and its fraction
        # is within eps of the running max over earlier selected indices
        # (whose fractions are 0 on the cum==0 prefix, matching the scalar
        # loop's best_frac=0 init); the answer is the LAST selected index.
        cum = np.cumsum(hits.astype(np.int64))
        frac = cum / np.arange(1, len(hits) + 1, dtype=np.float64)
        rm_prev = np.empty_like(frac)
        rm_prev[0] = 0.0
        if len(frac) > 1:
            np.maximum.accumulate(frac[:-1], out=rm_prev[1:])
        sel = (cum > 0) & (frac >= rm_prev - 1e-12)
        if not sel.any():
            break
        best_len = int(np.flatnonzero(sel)[-1]) + kmer_size
        best_frac = float(frac.max())
        if best_frac < threshold or best_len == 0:
            break
        length += best_len
        if window_end == chrom_len:
            break
    return length
