"""convertAllele: symbolic SV alleles -> explicit sequence.

Equivalent of bayesTyperTools convertAllele (ConvertAllele.cpp:50-525):
  <DEL>, <DEL:*>          ref = genome[pos..END], alt = anchor base
  <DUP>, <DUP:TANDEM>     alt = anchor + segment duplicated
  <INV>                   alt = anchor + reverse complement of segment
  <CNV>                   expanded from the GSCNDIST copy-number distribution
                          (ConvertAllele.cpp:210-268): one alt per copy number
                          i with mass > 0, skipping i == 1 (the reference
                          copy); CN0 -> anchor, CN i -> anchor + segment * i
  <CN#>                   alt = anchor + segment * n; n == 1 is excluded
                          (equals the reference allele, ConvertAllele.cpp:300-304)
  <INS>                   alt from INFO SEQ / SVINSSEQ; partial insertions
                          from LEFT/RIGHT_SVINSSEQ joined by 10 N's (dropped
                          unless keep_partial — N's never pass the parser)
  <INS:ME:NAME>           sequence from the MEI fasta, orientation from
                          MEINFO (reverse complement when '-')
  <NAME>                  sequence from the custom --alt-file fasta
Translocation breakends are excluded; IMPRECISE records skipped unless
keep_imprecise (ConvertAllele.cpp imprecise handling). Exclusion is
per-allele (removeAlts semantics): a variant survives as long as at least
one alt converts. A per-type conversion-stats table is returned and printed
(ConvertAllele.cpp:499-524).
"""

from __future__ import annotations

from collections import Counter

from ..io.fasta import read_fasta
from ..io.vcf import VcfReader, VcfWriter

_COMP = str.maketrans("ACGTacgt", "TGCAtgca")


def _revcomp(s: str) -> str:
    return s.translate(_COMP)[::-1]


def _load_fasta_dict(path):
    return {name: seq.decode() for name, seq in read_fasta(path)} if path else {}


def _allele_type(alt: str) -> str:
    if alt.startswith("<"):
        return alt
    return "sequence"


def convert_allele(vcf_path, genome, out_path, alt_file=None, mei_file=None,
                   keep_imprecise=False, keep_partial=False, verbose=True):
    alts_db = _load_fasta_dict(alt_file)
    mei_db = {k.upper(): v for k, v in _load_fasta_dict(mei_file).items()}

    reader = VcfReader(vcf_path, parse_samples=False)
    meta = reader.meta
    meta.samples = []
    writer = VcfWriter(out_path, meta)

    stats = {
        "converted": 0, "kept": 0, "skipped": 0,
        "included_by_type": Counter(), "skipped_by_type": Counter(),
        "skipped_imprecise": 0,
    }
    for v in reader:
        if v.chrom not in genome:
            stats["skipped"] += 1
            for alt in v.alts:
                stats["skipped_by_type"][_allele_type(alt)] += 1
            continue
        chrom_seq = genome[v.chrom]
        if not keep_imprecise and v.info_get("IMPRECISE") is True:
            stats["skipped"] += 1
            stats["skipped_imprecise"] += 1
            for alt in v.alts:
                stats["skipped_by_type"][_allele_type(alt)] += 1
            continue

        end = v.info_get("END")
        end = int(end) if end else v.pos + len(v.ref) - 1
        pos0 = v.pos - 1
        anchor = chrom_seq[pos0 : pos0 + 1].decode()
        segment = chrom_seq[v.pos : end].decode()  # bases after the anchor

        new_alts = []
        any_symbolic = False
        for alt in v.alts:
            atype = _allele_type(alt)
            if alt == "<CNV>":
                # GSCNDIST expansion replaces the single <CNV> alt with one
                # alt per supported copy number (ConvertAllele.cpp:210-268)
                expanded = _expand_cnv(v, anchor, segment)
                if expanded is None:
                    stats["skipped_by_type"][atype] += 1
                    continue
                new_alts.extend(expanded)
                stats["included_by_type"][atype] += 1
                any_symbolic = True
                continue
            conv = _convert_one(
                alt, v, anchor, segment, mei_db, alts_db, keep_partial
            )
            if conv is None:
                stats["skipped_by_type"][atype] += 1
                continue
            new_alts.append(conv)
            stats["included_by_type"][atype] += 1
            any_symbolic |= alt.startswith("<")
        if not new_alts:
            stats["skipped"] += 1
            continue

        if any_symbolic:
            v.ref = anchor + segment
            stats["converted"] += 1
        else:
            stats["kept"] += 1
        v.alts = new_alts
        v.info.pop("END", None)
        v.info.pop("SVTYPE", None)
        v.info.pop("SVLEN", None)
        writer.write(v)

    writer.close()
    if verbose:
        _print_stats(stats)
    return stats


def _print_stats(stats):
    total_in = sum(stats["included_by_type"].values())
    total_sk = sum(stats["skipped_by_type"].values())
    print(f"Parsed {total_in + total_sk} alternative allele(s)")
    for atype, n in sorted(stats["included_by_type"].items()):
        print(f"\t- Included {n} {atype} alternative allele(s)")
    if total_sk:
        print(f"\t- Skipped {total_sk} unsupported allele(s):")
        for atype, n in sorted(stats["skipped_by_type"].items()):
            print(f"\t\t- {n} {atype} alternative allele(s)")


def _expand_cnv(v, anchor, segment):
    """<CNV> via the GSCNDIST copy-number distribution: entries are counts
    per copy number (index = CN); every CN with mass > 0 except CN1 becomes
    an alt (ConvertAllele.cpp:210-268). Requires a single-alt record and a
    non-empty reference segment."""
    if len(v.alts) != 1 or not segment:
        return None
    dist = v.info_get("GSCNDIST")
    if not dist:
        return None
    parts = str(dist).split(",")
    if len(parts) < 2:
        return None
    mults = []
    for i, raw in enumerate(parts):
        if i == 1:
            continue
        try:
            mass = int(raw)
        except ValueError:
            return None
        if mass > 0:
            mults.append(i)
    if not mults:
        return None
    return [anchor if m == 0 else anchor + segment * m for m in mults]


def _convert_one(alt, v, anchor, segment, mei_db, alts_db, keep_partial):
    if not alt.startswith("<"):
        if alt.startswith("[") or alt.startswith("]") or "[" in alt or "]" in alt:
            return None  # translocation breakend
        # plain sequence allele: extend to the symbolic ref span
        return alt + segment if len(v.ref) == 1 else alt
    tag = alt[1:-1].upper()
    if tag == "TRA":
        return None  # translocation
    if tag in ("DEL",) or tag.startswith("DEL:"):
        return anchor if segment else None
    if tag in ("DUP", "DUP:TANDEM"):
        return anchor + segment + segment if segment else None
    if tag == "INV":
        return anchor + _revcomp(segment) if segment else None
    if tag.startswith("CN") and tag != "CNV":
        try:
            n = int(tag[2:])
        except ValueError:
            return None
        if n < 0 or n == 1 or not segment:
            # CN1 equals the reference allele -> excluded
            # (ConvertAllele.cpp:300-304)
            return None
        return anchor + segment * n
    if tag.startswith("INS:ME:"):
        name = tag[len("INS:ME:"):]
        seq = mei_db.get(name)
        if seq is None:
            return None
        meinfo = v.info_get("MEINFO", "")
        if isinstance(meinfo, str) and meinfo.endswith("-"):
            seq = _revcomp(seq)
        return anchor + seq + segment
    if tag == "INS":
        seq = v.info_get("SEQ") or v.info_get("SVINSSEQ")
        if seq:
            return anchor + seq.upper() + segment
        left = v.info_get("LEFT_SVINSSEQ")
        right = v.info_get("RIGHT_SVINSSEQ")
        if left and right and keep_partial:
            return anchor + left.upper() + "N" * 10 + right.upper() + segment
        return None
    if tag in alts_db or alt[1:-1] in alts_db:
        return anchor + alts_db.get(alt[1:-1], alts_db.get(tag)) + segment
    return None
