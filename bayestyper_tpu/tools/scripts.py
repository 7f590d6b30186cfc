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


def get_kmer_stats(vcf_path: str, kmc_prefix: str, out_path: str,
                   kmer_size: int | None = None):
    """Per-allele k-mer support against a KMC table (getKmerStats.cpp):
    for each alt allele, the fraction of its (flank-free) k-mers present in
    the sample's count table and their mean count."""
    import numpy as np

    from ..io.kmc import KmcReader
    from ..ops.kmers import encode_bases, kmer_lanes
    from ..engine import LaneTable

    reader_kmc = KmcReader(kmc_prefix)
    k = kmer_size or reader_kmc.kmer_size if hasattr(reader_kmc, "kmer_size") \
        else reader_kmc.info.kmer_length
    k = reader_kmc.info.kmer_length
    all_hi, all_lo, all_counts = [], [], []
    for hi, lo, cnt in reader_kmc.batches():
        all_hi.append(hi)
        all_lo.append(lo)
        all_counts.append(cnt)
    table = LaneTable(np.concatenate(all_hi), np.concatenate(all_lo))
    counts = np.concatenate(all_counts)[
        np.lexsort((np.concatenate(all_lo), np.concatenate(all_hi)))
    ]

    n = 0
    with open(out_path, "w") as out:
        out.write("Chrom\tPos\tAllele\tNumKmers\tFracPresent\tMeanCount\n")
        vreader = VcfReader(vcf_path)
        for v in vreader:
            for ai, alt in enumerate(v.alts):
                if alt.startswith("<"):
                    continue
                codes, valid = encode_bases(alt.encode())
                hi, lo, ok = kmer_lanes(codes, valid, k)
                hi, lo = hi[ok], lo[ok]
                if not len(hi):
                    out.write(f"{v.chrom}\t{v.pos}\t{ai + 1}\t0\t-1\t-1\n")
                    continue
                idx = table.lookup(hi, lo)
                present = idx >= 0
                mean_count = (
                    counts[idx[present]].mean() if present.any() else -1
                )
                out.write(
                    f"{v.chrom}\t{v.pos}\t{ai + 1}\t{len(hi)}\t"
                    f"{present.mean():.4g}\t{mean_count:.4g}\n"
                )
                n += 1
    return n


def convert_seq_to_allele_id(vcf_path: str, out_prefix: str,
                             min_length: int = 10):
    """Replace long allele sequences with symbolic IDs + a sidecar fasta
    (convertSeqToAlleleId.cpp)."""
    reader = VcfReader(vcf_path, parse_samples=True)
    writer = VcfWriter(out_prefix + ".vcf", reader.meta)
    n = 0
    with open(out_prefix + "_alleles.fa", "w") as fa:
        for v in reader:
            new_alts = []
            for ai, alt in enumerate(v.alts):
                if not alt.startswith("<") and len(alt) >= min_length:
                    name = f"{v.chrom}_{v.pos}_{ai}"
                    fa.write(f">{name}\n{alt}\n")
                    new_alts.append(f"<{name}>")
                    n += 1
                else:
                    new_alts.append(alt)
            v.alts = new_alts
            writer.write(v)
    writer.close()
    return n


def generate_diplotypes(vcf_path: str, genome, out_prefix: str,
                        sample_names=None):
    """Reconstruct per-sample haplotype sequences from called genotypes
    (generateDiplotypes.cpp): applies each sample's phased-or-unphased GT
    alleles to the reference, writing <prefix>_<sample>_h{1,2}.fa."""
    reader = VcfReader(vcf_path, parse_samples=True)
    names = sample_names or reader.meta.samples
    events = {name: ([], []) for name in names}
    contigs = [c for c, _ in reader.meta.contigs] or list(genome.names)

    for v in reader:
        for si, name in enumerate(reader.meta.samples):
            if name not in events or si >= len(v.samples):
                continue
            gt = v.samples[si].get("GT", ".")
            if "." in gt or gt == "":
                continue
            alleles = [int(x) for x in gt.replace("|", "/").split("/")]
            seqs = [v.ref] + v.alts
            for hap_idx, a in enumerate(alleles[:2]):
                if a > 0 and not seqs[a].startswith("<"):
                    events[name][hap_idx].append(
                        (v.chrom, v.pos - 1, v.ref, seqs[a])
                    )

    written = 0
    for name in names:
        for hap_idx in (0, 1):
            path = f"{out_prefix}_{name}_h{hap_idx + 1}.fa"
            with open(path, "w") as fh:
                for chrom in contigs:
                    if chrom not in genome:
                        continue
                    seq = genome[chrom].decode()
                    out = []
                    cursor = 0
                    for c, pos, ref, alt in sorted(
                        [e for e in events[name][hap_idx] if e[0] == chrom],
                        key=lambda e: e[1],
                    ):
                        if pos < cursor:
                            continue  # overlapping call: keep the first
                        out.append(seq[cursor:pos])
                        out.append(alt)
                        cursor = pos + len(ref)
                    out.append(seq[cursor:])
                    full = "".join(out)
                    fh.write(f">{chrom}\n")
                    for i in range(0, len(full), 80):
                        fh.write(full[i : i + 80] + "\n")
            written += 1
    return written


def convert_nested_genotypes(vcf_path: str, out_path: str):
    """Re-express genotypes that reference the `*` missing allele as missing
    calls (convertNestedGenotypes.cpp simplification): downstream tools that
    cannot handle `*` get './.' style calls instead."""
    reader = VcfReader(vcf_path, parse_samples=True)
    writer = VcfWriter(out_path, reader.meta)
    n = 0
    for v in reader:
        star = None
        for ai, alt in enumerate(v.alts):
            if alt == "*":
                star = ai + 1
        if star is not None:
            for s in v.samples:
                gt = s.get("GT", ".")
                sep = "|" if "|" in gt else "/"
                parts = gt.split(sep)
                if str(star) in parts:
                    s["GT"] = sep.join("." for _ in parts)
                    n += 1
        writer.write(v)
    writer.close()
    return n


def add_edit_distance_and_concordance(vcf_path: str, truth_path: str,
                                      out_path: str, window: int = 50):
    """Evaluation: annotate each call with the edit distance to the nearest
    truth allele (WED) and genotype concordance when positions match (GTCO)
    — the core of addEditDistanceAndCondordance.cpp."""
    from ..ops.edit_distance import edit_distance
    from collections import defaultdict as _dd
    import bisect

    truth = _dd(list)
    truth_reader = VcfReader(truth_path, parse_samples=True)
    for v in truth_reader:
        truth[v.chrom].append((v.pos, v.ref, v.alts,
                               [s.get("GT", ".") for s in v.samples]))
    for chrom in truth:
        truth[chrom].sort()
    keys = {chrom: [t[0] for t in truth[chrom]] for chrom in truth}

    reader = VcfReader(vcf_path, parse_samples=True)
    meta = reader.meta
    meta.add_info("WED", "A", "Integer",
                  "Minimum edit distance to a nearby truth allele")
    meta.add_info("GTCO", "1", "String",
                  "Genotype concordance with position-matched truth (T/F/.)")
    writer = VcfWriter(out_path, meta)
    n = 0
    for v in reader:
        tl = truth.get(v.chrom, [])
        ks = keys.get(v.chrom, [])
        lo = bisect.bisect_left(ks, v.pos - window)
        hi = bisect.bisect_right(ks, v.pos + window)
        weds = []
        gtco = "."
        for alt in v.alts:
            best = -1
            for (tpos, tref, talts, tgts) in tl[lo:hi]:
                for talt in talts:
                    if talt.startswith("<"):
                        continue
                    d = edit_distance(alt, talt) + abs(tpos - v.pos)
                    best = d if best < 0 else min(best, d)
                if tpos == v.pos and tref == v.ref:
                    call_gts = [s.get("GT", ".") for s in v.samples]
                    norm = lambda g: tuple(sorted(g.replace("|", "/").split("/")))
                    gtco = "T" if [norm(a) for a in call_gts] == \
                        [norm(b) for b in tgts] else "F"
            weds.append(best)
        v.info["WED"] = ",".join(str(x) for x in weds) if weds else "."
        v.info["GTCO"] = gtco
        writer.write(v)
        n += 1
    writer.close()
    return n


def assess_haplotype_transmission_support(vcf_path: str, out_path: str,
                                          trios=None):
    """Trio transmission support (assessHaplotypeTransmissionSupport.cpp
    essence): per trio, the fraction of fully-called variants whose child
    genotype is Mendelian-consistent with the parents; writes a TSV."""
    from .add_attributes import _parse_gt, trio_concordant

    reader = VcfReader(vcf_path, parse_samples=True)
    name_to_idx = {n: i for i, n in enumerate(reader.meta.samples)}
    trios = trios or []
    stats = {t: [0, 0] for t in trios}  # concordant, total
    for v in reader:
        for t in trios:
            child, father, mother = t
            idx = [name_to_idx.get(x) for x in (child, father, mother)]
            if any(i is None for i in idx):
                continue
            gts = [_parse_gt(v.samples[i]) for i in idx]
            conc = trio_concordant(*gts)
            if conc is None:
                continue
            stats[t][1] += 1
            stats[t][0] += int(conc)
    with open(out_path, "w") as fh:
        fh.write("Child\tFather\tMother\tConcordant\tTotal\tFraction\n")
        for (c, f, m), (conc, total) in stats.items():
            frac = conc / total if total else -1
            fh.write(f"{c}\t{f}\t{m}\t{conc}\t{total}\t{frac:.4g}\n")
    return stats
