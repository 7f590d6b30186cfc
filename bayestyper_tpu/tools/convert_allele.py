"""convertAllele: symbolic SV alleles -> explicit sequence.

Equivalent of bayesTyperTools convertAllele (ConvertAllele.cpp:50-525):
  <DEL>, <DEL:*>          ref = genome[pos..END], alt = anchor base
  <DUP>, <DUP:TANDEM>     alt = anchor + segment duplicated
  <INV>                   alt = anchor + reverse complement of segment
  <CNV>, <CN#>            alt = anchor + segment * n (n from the tag)
  <INS>                   alt from INFO SEQ / SVINSSEQ; partial insertions
                          from LEFT/RIGHT_SVINSSEQ joined by 10 N's (dropped
                          unless keep_partial — N's never pass the parser)
  <INS:ME:NAME>           sequence from the MEI fasta, orientation from
                          MEINFO (reverse complement when '-')
  <NAME>                  sequence from the custom --alt-file fasta
Translocation breakends are excluded; IMPRECISE records skipped unless
keep_imprecise (ConvertAllele.cpp imprecise handling).
"""

from __future__ import annotations

from ..io.fasta import read_fasta
from ..io.vcf import VcfReader, VcfWriter

_COMP = str.maketrans("ACGTacgt", "TGCAtgca")


def _revcomp(s: str) -> str:
    return s.translate(_COMP)[::-1]


def _load_fasta_dict(path):
    return {name: seq.decode() for name, seq in read_fasta(path)} if path else {}


def convert_allele(vcf_path, genome, out_path, alt_file=None, mei_file=None,
                   keep_imprecise=False, keep_partial=False):
    alts_db = _load_fasta_dict(alt_file)
    mei_db = {k.upper(): v for k, v in _load_fasta_dict(mei_file).items()}

    reader = VcfReader(vcf_path, parse_samples=False)
    meta = reader.meta
    meta.samples = []
    writer = VcfWriter(out_path, meta)

    stats = {"converted": 0, "kept": 0, "skipped": 0}
    for v in reader:
        if v.chrom not in genome:
            stats["skipped"] += 1
            continue
        chrom_seq = genome[v.chrom]
        if not keep_imprecise and v.info_get("IMPRECISE") is True:
            stats["skipped"] += 1
            continue

        end = v.info_get("END")
        end = int(end) if end else v.pos + len(v.ref) - 1
        pos0 = v.pos - 1
        anchor = chrom_seq[pos0 : pos0 + 1].decode()
        segment = chrom_seq[v.pos : end].decode()  # bases after the anchor

        new_alts = []
        ok = True
        for alt in v.alts:
            conv = _convert_one(
                alt, v, anchor, segment, mei_db, alts_db, keep_partial
            )
            if conv is None:
                ok = False
                break
            new_alts.append(conv)
        if not ok or not new_alts:
            stats["skipped"] += 1
            continue

        if any(a.startswith("<") for a in v.alts):
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
    return stats


def _convert_one(alt, v, anchor, segment, mei_db, alts_db, keep_partial):
    if not alt.startswith("<"):
        if alt.startswith("[") or alt.startswith("]") or "[" in alt or "]" in alt:
            return None  # translocation breakend
        # plain sequence allele: extend to the symbolic ref span
        return alt + segment if len(v.ref) == 1 else alt

    tag = alt[1:-1].upper()
    if tag in ("DEL",) or tag.startswith("DEL:"):
        return anchor
    if tag in ("DUP", "DUP:TANDEM"):
        return anchor + segment + segment
    if tag == "INV":
        return anchor + _revcomp(segment)
    if tag.startswith("CN"):
        try:
            n = int(tag[2:])
        except ValueError:
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
