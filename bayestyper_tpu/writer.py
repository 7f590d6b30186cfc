"""Genotype VCF writer — assembles the final genotyped VCF.

Byte-level mirror of GenotypeWriter (GenotypeWriter.cpp:57-556):
FORMAT = GT:GQ:GPP:APP:NAK:FAK:MAC:SAF; INFO carries
AC/AF/AN/ACP/VCS/VCR/VCGS/VCGR/HC/[ANC]/ACO; QUAL is the phred-scaled max
alt-allele call probability; FILTER is AN0 when no genotype was called.
Rows are collected per chromosome and sorted by position at finalise
(GenotypeWriter.cpp:352-492). Where the reference streams a temp file and
re-reads it, this writer keeps rows in memory per inference unit (units are
bounded) and writes once.
"""

from __future__ import annotations

import gzip
from dataclasses import dataclass

import numpy as np

from .constants import MISSING, PLOIDY_DIPLOID, PLOIDY_HAPLOID

_EMPTY_SAMPLE = ":.:.:.:.:.:."  # null-ploidy sample (GenotypeWriter.cpp:58,319)


def fmt_g(x) -> str:
    """C++ ostream default float formatting (6 significant digits)."""
    if x is None:
        return "."
    s = f"{float(x):.6g}"
    return s


def phred_cap99(p: float) -> str:
    """-10*log10(1-p) with the exact float-compare caps
    (writeQualityAndFilter, GenotypeWriter.cpp:177-204)."""
    eps = np.finfo(np.float32).eps * 100
    if p >= 1.0 or abs(p - 1.0) < eps:
        return "99"
    if p <= 0.0 or abs(p) < eps:
        return "0"
    return fmt_g(-10.0 * np.log10(1.0 - p))


@dataclass
class VariantGenotypeRecord:
    """Everything needed to render one VCF row for one variant."""

    chrom: str
    pos: int                      # 1-based
    ids: list
    ref: str
    alts: list
    origins: list
    has_dependency: bool
    cluster_size: int
    cluster_region: str
    group_size: int
    group_region: str
    num_candidates: int
    non_covered_alleles: list
    ploidies: np.ndarray          # [S]
    gt: np.ndarray                # [S, 2]
    gq: np.ndarray                # [S]
    gpp: np.ndarray               # [S, G] (first num_genotypes meaningful)
    app: np.ndarray               # [S, A]
    nak: np.ndarray               # [S, A]
    fak: np.ndarray               # [S, A]
    mac: np.ndarray               # [S, A]
    saf: np.ndarray               # [S, A]

    @property
    def num_alleles(self):
        return 1 + len(self.alts) + int(self.has_dependency)


def _join(vals):
    return ",".join(vals)


def render_row(r: VariantGenotypeRecord) -> str:
    na = r.num_alleles
    s_count = len(r.ploidies)

    # variant stats from called genotypes (getGenotypeVariantStats,
    # VariantClusterGenotyper.cpp:470-526)
    alt_counts = np.zeros(na - 1, dtype=int)
    total = 0
    acp = np.zeros(na, dtype=float)
    for si in range(s_count):
        for a in r.gt[si]:
            if a != MISSING:
                total += 1
                if a > 0:
                    alt_counts[a - 1] += 1
        for a in range(na):
            if r.saf[si, a] == 0 and r.app[si, a] > 0:
                acp[a] = max(acp[a], float(r.app[si, a]))

    max_alt_acp = float(acp[1 : 1 + len(r.alts)].max()) if r.alts else 0.0
    qual = phred_cap99(max_alt_acp)
    filt = "AN0" if total == 0 else "PASS"

    af = alt_counts / total if total > 0 else np.zeros_like(alt_counts, float)

    alts = list(r.alts)
    if r.has_dependency:
        alts.append("*")
    aco = _join([o if o not in ("", None) else "." for o in r.origins]) if r.origins \
        else _join(["."] * len(r.alts))
    if r.has_dependency:
        aco += ",."

    info = (
        f"AC={_join(map(str, alt_counts))}"
        f";AF={_join(fmt_g(x) for x in af)}"
        f";AN={total}"
        f";ACP={_join(fmt_g(x) for x in acp)}"
        f";VCS={r.cluster_size};VCR={r.cluster_region}"
        f";VCGS={r.group_size};VCGR={r.group_region}"
        f";HC={r.num_candidates}"
    )
    if r.non_covered_alleles:
        info += f";ANC={_join(map(str, sorted(r.non_covered_alleles)))}"
    info += f";ACO={aco}"

    cols = [
        r.chrom, str(r.pos), ";".join(r.ids) if r.ids else ".",
        r.ref, _join(alts), qual, filt, info,
        "GT:GQ:GPP:APP:NAK:FAK:MAC:SAF",
    ]

    num_genotypes = na * (na + 1) // 2
    for si in range(s_count):
        pl = r.ploidies[si]
        if pl == PLOIDY_DIPLOID:
            gt_str = "/".join(
                "." if a == MISSING else str(int(a)) for a in r.gt[si]
            )
            gpp = r.gpp[si, :num_genotypes]
        elif pl == PLOIDY_HAPLOID:
            a = r.gt[si, 0]
            gt_str = "." if a == MISSING else str(int(a))
            gpp = r.gpp[si, :na]
        else:
            cols.append(_EMPTY_SAMPLE)
            continue
        cols.append(
            ":".join([
                gt_str,
                fmt_g(r.gq[si]),
                _join(fmt_g(x) for x in gpp),
                _join(fmt_g(x) for x in r.app[si, :na]),
                _join(fmt_g(x) for x in r.nak[si, :na]),
                _join(fmt_g(x) for x in r.fak[si, :na]),
                _join(fmt_g(x) for x in r.mac[si, :na]),
                _join(str(int(x)) for x in r.saf[si, :na]),
            ])
        )
    return "\t".join(cols)


def generate_header(genome, sample_names, command_lines=()) -> str:
    """The reference's generateHeader (GenotypeWriter.cpp:494-551) verbatim
    in structure."""
    lines = ["##fileformat=VCFv4.2"]
    for name in genome.names:
        if not genome.is_decoy(name):
            lines.append(f"##contig=<ID={name},length={len(genome[name])}>")
    for cl in command_lines:
        lines.append(f"##commandline={cl}")
    lines.append('##FILTER=<ID=AN0,Description="No called genotypes (AN = 0)">')
    lines += [
        '##INFO=<ID=AC,Number=A,Type=Integer,Description="Alternative allele counts in called genotypes">',
        '##INFO=<ID=AF,Number=A,Type=Float,Description="Alternative allele frequencies in called genotypes">',
        '##INFO=<ID=AN,Number=1,Type=Integer,Description="Total number of alleles in called genotypes">',
        '##INFO=<ID=ACP,Number=R,Type=Float,Description="Allele call probabilites (maximum APP across samples)">',
        '##INFO=<ID=VCS,Number=1,Type=Integer,Description="Variant cluster size">',
        '##INFO=<ID=VCR,Number=1,Type=String,Description="Variant cluster region (<chromosome>:<start>-<end>)">',
        '##INFO=<ID=VCGS,Number=1,Type=Integer,Description="Variant cluster group size (number of variant clusters)">',
        '##INFO=<ID=VCGR,Number=1,Type=String,Description="Variant cluster group region (<chromosome>:<start>-<end>)">',
        '##INFO=<ID=HC,Number=1,Type=Integer,Description="Number of haplotype candidates used for inference in variant cluster">',
        "##INFO=<ID=ANC,Number=.,Type=String,Description=\"Allele(s) not covered by a haplotype candidate ('0': Reference allele)\">",
        '##INFO=<ID=ACO,Number=A,Type=String,Description="Alternative allele call-set origin(s) (<call-set>:...)">',
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">',
        '##FORMAT=<ID=GQ,Number=1,Type=Integer,Description="Genotype quality (phred-scaled 1 - max(GPP))">',
        '##FORMAT=<ID=GPP,Number=G,Type=Float,Description="Genotype posterior probabilities">',
        '##FORMAT=<ID=APP,Number=R,Type=Float,Description="Allele posterior probabilities">',
        "##FORMAT=<ID=NAK,Number=R,Type=Float,Description=\"Mean number of allele kmers across gibbs samples ('-1': Not sampled)\">",
        "##FORMAT=<ID=FAK,Number=R,Type=Float,Description=\"Mean fraction of observed allele kmers across gibbs samples ('-1': Not sampled or NAK = 0)\">",
        "##FORMAT=<ID=MAC,Number=R,Type=Float,Description=\"Mean allele kmer coverage (mean value) across gibbs samples ('-1': Not sampled or NAK = 0)\">",
        "##FORMAT=<ID=SAF,Number=R,Type=Integer,Description=\"Sample specific allele filter ('0': PASS, '1': NAK, '2': FAK, '3': NAK and FAK)\">",
    ]
    lines.append(
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
        + "\t".join(sample_names)
    )
    return "\n".join(lines) + "\n"


class GenotypeVcfWriter:
    """Stream rendered rows to a temp file, sort per chromosome by position
    at finalise.

    The reference streams rows to a gzip temp from a writer thread and
    re-reads them at finalise (GenotypeWriter.cpp:84-127, 352-492). Here
    rows stream to an uncompressed temp next to the output and only a
    compact (chrom, pos, offset, length) index stays in memory — finalise
    sorts the index (stable, so equal positions keep arrival order exactly
    like the previous in-memory sort) and copies rows by offset; the page
    cache makes the reads cheap."""

    def __init__(self, path: str, genome, sample_names, command_lines=()):
        import os

        self.path = path
        self.genome = genome
        self.sample_names = sample_names
        self.command_lines = command_lines
        self._chrom_idx = {name: i for i, name in enumerate(genome.names)}
        self._tmp_path = path + ".rows.tmp"
        d = os.path.dirname(path)
        if d:
            os.makedirs(d, exist_ok=True)
        self._tmp = open(self._tmp_path, "w+b")
        self._index = []  # (chrom_i, pos, offset, length)
        self.num_written = 0

    def add(self, record: VariantGenotypeRecord):
        # Reconstitute REF from the genome at write time
        # (GenotypeWriter.cpp:477: chrom.substr(position-1, max_ref_length)).
        # With the joint right-trim, len(record.ref) equals the reference's
        # maxReferenceLength, so the substring is the identical byte span.
        try:
            seq = self.genome[record.chrom]
            ref = seq[record.pos - 1 : record.pos - 1 + len(record.ref)]
            record.ref = ref.decode() if isinstance(ref, bytes) else str(ref)
        except KeyError:
            pass
        self.add_line(record.chrom, record.pos,
                      (render_row(record) + "\n").encode())

    def add_line(self, chrom: str, pos: int, line: bytes):
        """Append one fully rendered row (newline included)."""
        ci = self._chrom_idx.get(chrom, len(self._chrom_idx))
        self._index.append((ci, pos, self._tmp.tell(), len(line)))
        self._tmp.write(line)
        self.num_written += 1

    def finalise(self):
        import os

        self._tmp.flush()
        opener = gzip.open if self.path.endswith(".gz") else open
        with opener(self.path, "wb") as fh:
            fh.write(
                generate_header(
                    self.genome, self.sample_names, self.command_lines
                ).encode()
            )
            if self._index:
                idx = np.asarray(self._index, dtype=np.int64)
                order = np.lexsort((idx[:, 1], idx[:, 0]))
                src = self._tmp
                for i in order:
                    src.seek(idx[i, 2])
                    fh.write(src.read(idx[i, 3]))
        self._tmp.close()
        os.unlink(self._tmp_path)
        return self.num_written
