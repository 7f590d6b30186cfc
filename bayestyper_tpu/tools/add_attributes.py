"""addAttributes: annotate a genotyped VCF with HPL / RMA / IBC / CONC.

Equivalent of bayesTyperTools addAttributes (AddAttributes.cpp:150-350):
  HPL  homopolymer length at the variant start in the reference
       (<Length>:<Nucleotide>; Auxiliaries::getHomopolymerInfo,
       Auxiliaries.cpp:807-835)
  RMA  RepeatMasker family cover per alt allele (<family#cover>:...)
  IBC  absolute inbreeding coefficient over regex-selected diploid,
       fully-called samples: 1 - observed/expected heterozygotes
       (Stats::calcInbreedingStats, Stats.cpp:100-158); "NA" when fixed
  CONC per-sample trio concordance flag (Trio.cpp:48-86): child alleles
       must be assignable one-from-father one-from-mother
"""

from __future__ import annotations

import re
from collections import defaultdict

from ..io.vcf import VcfReader, VcfWriter


def homopolymer_info(pos0: int, seq: bytes):
    """(length, base) of the homopolymer run through pos0 (0-based)."""
    nt = seq[pos0]
    start = pos0
    while start >= 0 and seq[start] == nt:
        start -= 1
    start += 1
    end = pos0
    while end < len(seq) and seq[end] == nt:
        end += 1
    return end - start, chr(nt)


def _parse_gt(s):
    """Complete genotype estimate or None (vcf++ Sample call-status
    semantics via io.attributes.SampleCall: partial calls count as
    uncalled, CallStatus::Complete required)."""
    from ..io.attributes import CallStatus, SampleCall

    call = SampleCall.from_gt(s.get("GT", "."))
    if call.call_status != CallStatus.COMPLETE:
        return None
    return call.genotype_estimate


def inbreeding_stats(variant, sample_regex=".*"):
    """(coef | None-if-fixed, num_samples)."""
    pattern = re.compile(sample_regex)
    num_alleles = 1 + len(variant.alts)
    allele_counts = [0] * num_alleles
    n = 0
    het = 0
    for name, s in zip(_sample_names(variant), variant.samples):
        if not pattern.fullmatch(name):
            continue
        gt = _parse_gt(s)
        if gt is None or len(gt) != 2:
            continue
        n += 1
        allele_counts[gt[0]] += 1
        allele_counts[gt[1]] += 1
        if gt[0] != gt[1]:
            het += 1
    if n == 0 or het == 0:
        return None, n
    hom_prob = sum((c / (2 * n)) ** 2 for c in allele_counts)
    expected_het = n * (1 - hom_prob)
    return 1 - het / expected_het, n


def trio_concordant(child_gt, father_gt, mother_gt):
    """Mendelian concordance for a diploid trio (Trio.cpp:48-86)."""
    if any(g is None or len(g) != 2 for g in (child_gt, father_gt, mother_gt)):
        return None
    c1, c2 = child_gt
    return (c1 in father_gt and c2 in mother_gt) or \
           (c2 in father_gt and c1 in mother_gt)


def _sample_names(variant):
    return getattr(variant, "_sample_names", [])


def read_repeatmasker(path):
    """RepeatMasker .out -> chrom -> [(start0, end, family)] sorted."""
    regions = defaultdict(list)
    with open(path) as fh:
        for line in fh:
            parts = line.split()
            if len(parts) < 11 or not parts[0].isdigit():
                continue
            chrom, start, end = parts[4], int(parts[5]) - 1, int(parts[6])
            family = parts[10]
            regions[chrom].append((start, end, family))
    for chrom in regions:
        regions[chrom].sort()
    return regions


def add_attributes(vcf_path, out_path, genome=None, repeatmasker_file=None,
                   independent_samples_regex=None, trios=None):
    """trios: [(child, father, mother)] sample-name triples."""
    reader = VcfReader(vcf_path, parse_samples=True)
    meta = reader.meta
    if genome is not None:
        meta.add_info("HPL", "1", "String",
                      "Homopolymer length (<Length>:<Nucleotide>)")
    rm_regions = None
    if repeatmasker_file:
        rm_regions = read_repeatmasker(repeatmasker_file)
        meta.add_info("RMA", "A", "String",
                      "RepeatMasker annotations (<family#nucleotide_cover>:...)")
    if independent_samples_regex is not None:
        meta.add_info("IBC", "1", "String",
                      "Absolute inbreeding coefficient "
                      "(<Coefficient>:<Number of independent samples used>)")
    if trios:
        meta.add_format("CONC", "1", "String", "Is sample in corcordant trio")
        name_to_idx = {n: i for i, n in enumerate(meta.samples)}

    writer = VcfWriter(out_path, meta)
    for v in reader:
        v._sample_names = meta.samples
        if genome is not None and v.chrom in genome:
            length, base = homopolymer_info(v.pos - 1, genome[v.chrom])
            v.info["HPL"] = f"{length}:{base}"
        if rm_regions is not None:
            v.info["RMA"] = ",".join(
                _rm_cover(rm_regions.get(v.chrom, []), v.pos - 1,
                          v.pos - 1 + len(v.ref))
                for _ in v.alts
            )
        if independent_samples_regex is not None:
            coef, n = inbreeding_stats(v, independent_samples_regex)
            v.info["IBC"] = (f"{abs(coef):.6g}:{n}" if coef is not None
                             else f"NA:{n}")
        if trios:
            for s in v.samples:
                s.setdefault("CONC", ".")
            if "CONC" not in v.format_keys:
                v.format_keys = v.format_keys + ["CONC"]
            for child, father, mother in trios:
                idx = [name_to_idx.get(x) for x in (child, father, mother)]
                if any(i is None for i in idx):
                    continue
                gts = [_parse_gt(v.samples[i]) for i in idx]
                conc = trio_concordant(*gts)
                status = "." if conc is None else ("1" if conc else "0")
                for i in idx:
                    v.samples[i]["CONC"] = status
        writer.write(v)
    writer.close()


def _rm_cover(regions, start, end):
    """<family#cover> labels for repeats overlapping [start, end)."""
    covers = defaultdict(int)
    for rs, re_, fam in regions:
        if rs >= end:
            break
        if re_ > start:
            covers[fam] += min(re_, end) - max(rs, start)
    if not covers:
        return "."
    return ":".join(f"{fam}#{c}" for fam, c in sorted(covers.items()))


def trio_denovo(child_gt, father_gt, mother_gt):
    """De-novo candidate (Trio.cpp:142): diploid trio, NOT concordant, the
    child exclusively heterozygous for an allele absent in both parents, no
    missing calls. Returns None when not assessable."""
    if any(g is None or len(g) != 2 for g in (child_gt, father_gt, mother_gt)):
        return None
    if trio_concordant(child_gt, father_gt, mother_gt):
        return False
    if child_gt[0] == child_gt[1]:
        return False
    parent_alleles = set(father_gt) | set(mother_gt)
    return any(a not in parent_alleles for a in child_gt)
