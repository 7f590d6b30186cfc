"""Analysis scripts suite — the bayesTyperTools/scripts equivalents.

The reference ships 12 evaluation-side binaries (src/bayesTyperTools/scripts,
SURVEY §2.4). This module provides the pipeline-relevant ones as functions +
CLI subcommands:

  get_summary            per-variant/per-allele summary count tables keyed by
                         attribute tuples (getSummary.cpp:46-467)
  write_indels           extract insertion/deletion allele sequences to fasta
                         (writeIndels.cpp)
  filter_structural_variants
                         drop alleles above/below an SV length threshold
                         (filterStructuralVariants.cpp)
  filter_allele_callset_origin
                         drop alleles whose ACO does not match the given
                         callsets (filterAlleleCallsetOrigin.cpp)
  get_genomic_intervals  BED-like intervals covering variants +- flank
                         (getGenomicIntervals.cpp)
  collapse_summary_table collapse a summary table over selected columns
                         (collapseSummaryTable.cpp)
"""

from __future__ import annotations

from collections import Counter, defaultdict

from ..graph.variants import classify_allele, AlleleType
from ..io.vcf import VcfReader, VcfWriter


def _allele_type_and_length(ref: str, alt: str):
    t = classify_allele(ref, alt)
    if t == AlleleType.SNV:
        length = 1
    elif t == AlleleType.INSERTION:
        length = len(alt) - len(ref)
    elif t == AlleleType.DELETION:
        length = len(ref) - len(alt)
    else:
        length = max(len(ref), len(alt))
    return t.value, length


def get_summary(vcf_path: str, output_prefix: str):
    """Write <prefix>_variant.txt / <prefix>_allele.txt count tables."""
    variant_stats = Counter()
    allele_stats = Counter()

    reader = VcfReader(vcf_path, parse_samples=True)
    n_var = n_all = 0
    for v in reader:
        n_var += 1
        filt = ";".join(v.filters) if v.filters else "."
        types = []
        for alt in v.alts:
            n_all += 1
            if alt.startswith("<") or alt in ("*", "."):
                t, length = "Symbolic", 0
            else:
                t, length = _allele_type_and_length(v.ref, alt)
            types.append(t)
            aco = v.info_get("ACO", ".")
            allele_stats[(filt, t, _bin_length(length), str(1 + len(v.alts)),
                          aco if isinstance(aco, str) else ".")] += 1
        vtype = types[0] if len(set(types)) == 1 else "Mixture"
        variant_stats[(filt, vtype, str(1 + len(v.alts)),
                       str(v.info_get("AN", ".")))] += 1

    with open(output_prefix + "_variant.txt", "w") as fh:
        fh.write("Count\tFilter\tVariantType\tNumAlleles\tAN\n")
        for key, count in sorted(variant_stats.items()):
            fh.write(f"{count}\t" + "\t".join(key) + "\n")
    with open(output_prefix + "_allele.txt", "w") as fh:
        fh.write("Count\tFilter\tAlleleType\tAlleleLengthBin\tNumAlleles\tACO\n")
        for key, count in sorted(allele_stats.items()):
            fh.write(f"{count}\t" + "\t".join(key) + "\n")
    return n_var, n_all


def _bin_length(length: int) -> str:
    for edge in (1, 2, 5, 10, 50, 100, 500, 1000, 10000):
        if length <= edge:
            return f"<={edge}"
    return ">10000"


def write_indels(vcf_path: str, output_prefix: str, min_length: int = 1):
    """Insertion/deletion sequences to fasta (writeIndels.cpp)."""
    n = 0
    with open(output_prefix + ".fa", "w") as fh:
        reader = VcfReader(vcf_path)
        for v in reader:
            for ai, alt in enumerate(v.alts):
                if alt.startswith("<"):
                    continue
                t, length = _allele_type_and_length(v.ref, alt)
                if t not in ("Insertion", "Deletion") or length < min_length:
                    continue
                seq = alt if t == "Insertion" else v.ref
                fh.write(f">{v.chrom}_{v.pos}_{ai}_{t}\n{seq}\n")
                n += 1
    return n


def filter_structural_variants(vcf_path: str, out_path: str,
                               min_sv_length: int = 50,
                               max_sv_length: int = 10**9):
    """Keep variants with at least one allele in the SV length range
    (filterStructuralVariants.cpp)."""
    reader = VcfReader(vcf_path, parse_samples=True)
    writer = VcfWriter(out_path, reader.meta)
    kept = 0
    for v in reader:
        keep = False
        for alt in v.alts:
            if alt.startswith("<"):
                keep = True
                continue
            _, length = _allele_type_and_length(v.ref, alt)
            if min_sv_length <= length <= max_sv_length:
                keep = True
        if keep:
            writer.write(v)
            kept += 1
    writer.close()
    return kept


def filter_allele_callset_origin(vcf_path: str, out_path: str,
                                 callsets: list, keep_matching=True):
    """Remove alts whose ACO origin does not intersect `callsets`
    (filterAlleleCallsetOrigin.cpp)."""
    reader = VcfReader(vcf_path, parse_samples=True)
    writer = VcfWriter(out_path, reader.meta)
    target = set(callsets)
    kept = 0
    for v in reader:
        aco = (v.info_get("ACO") or "").split(",")
        keep_idx = []
        for i, alt in enumerate(v.alts):
            origins = set((aco[i] if i < len(aco) else ".").split(":"))
            match = bool(origins & target)
            if match == keep_matching:
                keep_idx.append(i)
        if not keep_idx:
            continue
        if len(keep_idx) != len(v.alts):
            v.alts = [v.alts[i] for i in keep_idx]
            if aco != [""]:
                v.info["ACO"] = ",".join(
                    aco[i] if i < len(aco) else "." for i in keep_idx
                )
        writer.write(v)
        kept += 1
    writer.close()
    return kept


def get_genomic_intervals(vcf_path: str, out_path: str, flank: int = 0):
    """Merged BED intervals covering variants +- flank
    (getGenomicIntervals.cpp)."""
    by_chrom = defaultdict(list)
    reader = VcfReader(vcf_path)
    for v in reader:
        start = max(v.pos - 1 - flank, 0)
        end = v.pos - 1 + len(v.ref) + flank
        by_chrom[v.chrom].append((start, end))
    n = 0
    with open(out_path, "w") as fh:
        for chrom in by_chrom:
            merged = []
            for s, e in sorted(by_chrom[chrom]):
                if merged and s <= merged[-1][1]:
                    merged[-1] = (merged[-1][0], max(merged[-1][1], e))
                else:
                    merged.append((s, e))
            for s, e in merged:
                fh.write(f"{chrom}\t{s}\t{e}\n")
                n += 1
    return n


def collapse_summary_table(table_path: str, out_path: str, columns: list):
    """Sum the Count column over the selected columns
    (collapseSummaryTable.cpp)."""
    with open(table_path) as fh:
        header = fh.readline().rstrip("\n").split("\t")
        keep = [header.index(c) for c in columns]
        counts = Counter()
        for line in fh:
            parts = line.rstrip("\n").split("\t")
            key = tuple(parts[i] for i in keep)
            counts[key] += int(parts[0])
    with open(out_path, "w") as fh:
        fh.write("Count\t" + "\t".join(columns) + "\n")
        for key, count in sorted(counts.items()):
            fh.write(f"{count}\t" + "\t".join(key) + "\n")
    return len(counts)
