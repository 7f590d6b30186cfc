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


_VARIANT_ATTRS = ("Count\tChromType\tFilter\tVariantType\tHasMissing\t"
                  "HasRedundant\tNumAlleles\tEffectiveNumAlleles\tMaxAltACP\t"
                  "MaxAltAC\tAN\tACO\tHPL\tHasHomopolymer\tHTV\t"
                  "NumCompleteSamples\tNumCONCTrue\tNumCONCFalse\tBASE\tCALL\t"
                  "GTCO\tMED")
_ALLELE_ATTRS = ("Count\tChromType\tFilter\tAlleleType\tAlleleLength\t"
                 "AlleleSVLength\tIsRedundant\tNumAlleles\t"
                 "EffectiveNumAlleles\tACP\tAC\tAN\tACO\tHPL\tIsHomopolymer\t"
                 "HTV\tNumCompleteSamples\tNumCONCTrue\tNumCONCFalse\tBASE\t"
                 "CALL\tGTCO\tMED\tMinNAK\tMinFAK")


def _contig_type(chrom: str) -> str:
    """Contig::type() by name (Contig.cpp:60-102)."""
    c = chrom.lower()
    if c.startswith("chr"):
        c = c[3:]
    if c.isdigit():
        return "Autosomal"
    if c == "x":
        return "ChrX"
    if c == "y":
        return "ChrY"
    if c in ("m", "mt"):
        return "Mitochondrial"
    return "Unknown"


def _allele_attributes(ref: str, alt: str):
    """(typeStr, length, sv_length) per Auxiliaries::alleleAttributes
    (Auxiliaries.cpp:142-203)."""
    from ..graph.variants import _full_trim

    if alt in ("*", "."):
        return "Missing", 0, 0
    if alt == ref:
        return "Reference", len(alt), 0
    r, a = _full_trim(ref, alt)
    t = classify_allele(ref, alt)
    name = {
        AlleleType.SNV: "SNP", AlleleType.INSERTION: "Insertion",
        AlleleType.DELETION: "Deletion", AlleleType.INVERSION: "Inversion",
        AlleleType.COMPLEX: "Complex", AlleleType.REFERENCE: "Reference",
    }[t]
    sv_len = 0 if len(a) == len(r) else len(a) - len(r)
    return name, len(a), sv_len


def _fmt_f(x, precision):
    return f"{x:.{precision}f}"


def _sample_floats(sample, key, n):
    """Comma list FORMAT value -> list of floats or None (absent/'.')."""
    raw = sample.get(key)
    if raw in (None, ".", ""):
        return None
    out = []
    for part in str(raw).split(","):
        try:
            out.append(float(part))
        except ValueError:
            out.append(None)
    out += [None] * (n - len(out))
    return out[:n]


def get_summary(vcf_path: str, output_prefix: str):
    """Write <prefix>_variant.txt / <prefix>_allele.txt attribute count
    tables with the reference's full column sets
    (getSummary.cpp:44-467: variant_attributes/allele_attributes)."""
    variant_stats = Counter()
    allele_stats = Counter()

    reader = VcfReader(vcf_path, parse_samples=True)
    sample_ids = reader.meta.samples if reader.meta else []
    n_var = n_all = 0
    for v in reader:
        n_var += 1
        alleles = [v.ref] + list(v.alts)
        na = len(alleles)
        n_all += na
        chrom_type = _contig_type(v.chrom)
        filt = ";".join(v.filters) if v.filters else "."

        # allele stats over called genotypes (Stats::calcAlleleStats) and
        # call probs (max unfiltered APP across samples,
        # Stats::calcCallProbs:162-186)
        ac = [0] * na
        acp = [0.0] * na
        min_nak = [None] * na
        min_fak = [None] * na
        num_complete = conc_true = conc_false = 0
        gtco = med = None
        for s in v.samples:
            gt = str(s.get("GT", ".")).replace("|", "/")
            calls = [x for x in gt.split("/") if x not in (".", "")]
            if gt not in (".", "") and "." not in gt.split("/"):
                if calls:
                    num_complete += 1
            for x in calls:
                ai = int(x)
                if ai < na:
                    ac[ai] += 1
            saf = _sample_floats(s, "SAF", na)
            app = _sample_floats(s, "APP", na)
            nak = _sample_floats(s, "NAK", na)
            fak = _sample_floats(s, "FAK", na)
            for ai in range(na):
                filtered = saf is not None and saf[ai] is not None \
                    and saf[ai] > 0
                if not filtered and app is not None and app[ai] is not None:
                    acp[ai] = max(acp[ai], app[ai])
                # -1 = not sampled (parseSampleAlleleValue,
                # getSummary.cpp:50-66)
                for vals, accum in ((nak, min_nak), (fak, min_fak)):
                    if vals is not None and vals[ai] is not None \
                            and vals[ai] != -1:
                        accum[ai] = vals[ai] if accum[ai] is None else min(
                            accum[ai], vals[ai]
                        )
            conc = s.get("CONC")
            if conc in ("1", "TRUE", 1):
                conc_true += 1
            elif conc in ("0", "FALSE", 0):
                conc_false += 1
            gtco = s.get("GTCO", gtco)
            med = s.get("MED", med)
        if len(sample_ids) != 1 and len(v.samples) != 1:
            gtco = med = None

        an = sum(ac)
        effective = sum(1 for c in ac if c > 0)
        max_alt_acp = max(acp[1:], default=0.0)
        max_alt_ac = max(ac[1:], default=0)

        # redundant = duplicated allele sequences (getSummary.cpp:312-330)
        redundant = [False] * na
        for i in range(na):
            for j in range(i + 1, na):
                if alleles[i] == alleles[j]:
                    redundant[i] = redundant[j] = True

        has_missing = any(a in ("*", ".") for a in v.alts)

        # ACO per alt + aggregated variant origins
        # (Auxiliaries::variantOrigins)
        aco_raw = v.info_get("ACO")
        alt_acos = (str(aco_raw).split(",") if aco_raw not in (None, ".")
                    else ["."] * len(v.alts))
        alt_acos += ["."] * (len(v.alts) - len(alt_acos))
        origins = []
        for a_aco in alt_acos:
            if a_aco != ".":
                for o in a_aco.split(":"):
                    if o and o != "." and o not in origins:
                        origins.append(o)
        var_aco = ":".join(origins) if origins else "NA"

        # HPL = "length:base"; homopolymer alleles
        # (Auxiliaries::getHomopolymerAlleles, max length diff 1)
        hpl_raw = v.info_get("HPL")
        hpl_len = "NA"
        hpl_alleles = [False] * na
        has_hpl_info = False
        if hpl_raw not in (None, ".", "NA"):
            parts = str(hpl_raw).split(":")
            if len(parts) == 2:
                hpl_len, hpl_base = parts
                has_hpl_info = True
                from ..graph.variants import _full_trim

                for i in range(1, na):
                    if v.alts[i - 1] in ("*", "."):
                        continue
                    for j in range(na):
                        if i == j or alleles[i] == alleles[j]:
                            continue
                        if alleles[j] in ("*", "."):
                            continue
                        r1, a1 = _full_trim(v.ref, alleles[i])
                        r2, a2 = _full_trim(v.ref, alleles[j])
                        if all(
                            set(x) <= {hpl_base} for x in (r1, a1, r2, a2)
                        ):
                            if (abs(len(r1) - len(r2))
                                    + abs(len(a1) - len(a2))) <= 1:
                                hpl_alleles[i] = True
        has_homopolymer = "1" if any(hpl_alleles) else "0"
        if not has_hpl_info:
            has_homopolymer = "NA"

        def info_str(key):
            x = v.info_get(key)
            if x in (None, "."):
                return "NA"
            if x == "TRUE":
                return "1"
            if x == "FALSE":
                return "0"
            return str(x)

        def opt(x, precision=None):
            if x in (None, ".", ""):
                return "NA"
            if precision is not None:
                return _fmt_f(float(x), precision)
            return str(x)

        common_tail = (
            info_str("HTV"), str(num_complete), str(conc_true),
            str(conc_false), info_str("BASE"), info_str("CALL"),
            opt(gtco), opt(med, 2) if med not in (None, ".", "") else "NA",
        )

        for ai in range(na):
            t, length, sv_len = _allele_attributes(v.ref, alleles[ai])
            allele_stats[(
                chrom_type, filt, t, str(length), str(sv_len),
                "1" if redundant[ai] else "0", str(na), str(effective),
                _fmt_f(acp[ai], 2), str(ac[ai]), str(an),
                (alt_acos[ai - 1] if ai > 0 and alt_acos[ai - 1] != "."
                 else "NA"),
                str(hpl_len) if has_hpl_info else "NA",
                ("1" if hpl_alleles[ai] else "0") if has_hpl_info else "NA",
                *common_tail,
                "NA" if min_nak[ai] is None else _fmt_f(min_nak[ai], 1),
                "NA" if min_fak[ai] is None else _fmt_f(min_fak[ai], 2),
            )] += 1

        # variant type (Auxiliaries::variantType)
        n_real_alts = len(v.alts) - int(has_missing)
        if n_real_alts > 1:
            vtype = "Multi"
        else:
            real_alt = next(
                (a for a in v.alts if a not in ("*", ".")), v.alts[0]
            )
            vtype = _allele_attributes(v.ref, real_alt)[0]
        variant_stats[(
            chrom_type, filt, vtype, "1" if has_missing else "0",
            "1" if any(redundant) else "0", str(na), str(effective),
            _fmt_f(max_alt_acp, 2), str(max_alt_ac), str(an), var_aco,
            str(hpl_len) if has_hpl_info else "NA", has_homopolymer,
            *common_tail,
        )] += 1

    with open(output_prefix + "_variant.txt", "w") as fh:
        fh.write(_VARIANT_ATTRS + "\n")
        for key, count in sorted(variant_stats.items()):
            fh.write(f"{count}\t" + "\t".join(key) + "\n")
    with open(output_prefix + "_allele.txt", "w") as fh:
        fh.write(_ALLELE_ATTRS + "\n")
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
    k = reader_kmc.info.kmer_length  # the table defines k
    assert kmer_size in (None, k), \
        f"kmer size {kmer_size} does not match the KMC table's k={k}"
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


def _gt_estimate(sample):
    """Called allele indices, [] when the genotype is (partially) missing
    (vcf++ Sample::genotypeEstimate semantics for uncalled samples)."""
    gt = sample.get("GT", ".")
    if gt in (".", ""):
        return []
    parts = gt.replace("|", "/").split("/")
    if any(p == "." for p in parts):
        return []
    return [int(p) for p in parts]


def _allele_pair(v, idx):
    """Right-trimmed (ref, allele) sequence pair for allele index idx
    (getAllelePair + rightTrimAllelePair, Auxiliaries.cpp:88-118: trim the
    shared suffix while both sequences keep >= 1 base; missing alleles are
    never trimmed)."""
    ref = v.ref
    allele = v.ref if idx == 0 else v.alts[idx - 1]
    if allele in ("*", "."):
        return (ref, "*")
    r, a = ref, allele
    n = 0
    ml = min(len(r), len(a))
    while n < ml - 1 and r[len(r) - 1 - n] == a[len(a) - 1 - n]:
        n += 1
    if n:
        r, a = r[: len(r) - n], a[: len(a) - n]
    return (r, a)


def _pair_concordance(gt_v, gt_s, cs_v, cs_s):
    """Position-matched concordance (addGenotypeConcordance,
    addEditDistanceAndCondordance.cpp:216-297): compare right-trimmed allele
    pairs of the two genotype estimates. T = same diplotype (either phase),
    P = one of two alleles matches, F = mismatch or ploidy mismatch,
    I = both uncalled."""
    ge = _gt_estimate(gt_s)
    ce = _gt_estimate(cs_s)
    if len(ge) != len(ce):
        return "F"
    if len(ge) == 2:
        g1, g2 = _allele_pair(gt_v, ge[0]), _allele_pair(gt_v, ge[1])
        c1, c2 = _allele_pair(cs_v, ce[0]), _allele_pair(cs_v, ce[1])
        if (g1 == c1 and g2 == c2) or (g1 == c2 and g2 == c1):
            return "T"
        if g1 == c1 or g2 == c2 or g1 == c2 or g2 == c1:
            return "P"
        return "F"
    if len(ge) == 1:
        return "T" if _allele_pair(gt_v, ge[0]) == _allele_pair(cs_v, ce[0]) \
            else "F"
    return "I"


def _unmatched_concordance(sample):
    """Concordance for a variant present in only one file
    (addEditDistanceAndCondordance.cpp:300-336): a hom-ref call over the
    absent record counts as concordant."""
    e = _gt_estimate(sample)
    if not e:
        return "I"
    if max(e) == 0:
        return "T"
    if min(e) == 0:
        return "P"
    return "F"


def _upgrade_gtco(old, new):
    """GTCO upgrade across multiple callset rows at one truth position
    (addEditDistanceAndCondordance.cpp:276-293): T wins; P overwrites F/I;
    anything overwrites I."""
    if old is None or old == "I":
        return new
    if new == "T":
        return "T"
    if new == "P" and old in ("F", "I"):
        return "P"
    return old


def add_edit_distance_and_concordance(truth_path: str, callset_path: str,
                                      truth_out: str, callset_out: str,
                                      read_length: int = 100):
    """Per-sample genotype concordance between a truth VCF and a callset
    (scripts/addEditDistanceAndCondordance.cpp): BOTH files are annotated
    with a GTCO FORMAT field (T/P/F/I) per sample. Truth rows must have
    unique positions; multiple callset rows may match one truth position
    (GTCO upgrades T > P > F > I). Rows present in only one file score their
    genotype against the implicit hom-ref. Like the reference, the edit
    distance (MED) computation is disabled (main.cpp prints the same
    warning), so `read_length` only shapes the header description.
    """
    from ..io.vcf import merge_contigs

    t_reader = VcfReader(truth_path, parse_samples=True)
    c_reader = VcfReader(callset_path, parse_samples=True)
    assert t_reader.meta.samples == c_reader.meta.samples, \
        "truth and callset must carry the same samples"
    samples = t_reader.meta.samples
    t_rows = defaultdict(list)
    for v in t_reader:
        t_rows[v.chrom].append(v)
    c_rows = defaultdict(list)
    for v in c_reader:
        c_rows[v.chrom].append(v)

    contigs = merge_contigs(t_reader.meta.contigs, c_reader.meta.contigs)
    chroms = [name for name, _ in contigs] or sorted(
        set(t_rows) | set(c_rows)
    )

    for meta in (t_reader.meta, c_reader.meta):
        meta.contigs = contigs
        meta.add_format("GTCO", "1", "String", "Genotype concordance")

    n_t = n_c = 0
    with VcfWriter(truth_out, t_reader.meta) as tw, \
            VcfWriter(callset_out, c_reader.meta) as cw:
        for chrom in chroms:
            t_by_pos = {}
            for v in t_rows.get(chrom, []):
                assert v.pos not in t_by_pos, \
                    f"duplicate truth position {chrom}:{v.pos}"
                t_by_pos[v.pos] = v
                v.gtco = [None] * len(samples)
            for v in c_rows.get(chrom, []):
                tv = t_by_pos.get(v.pos)
                gtco = []
                for si in range(len(samples)):
                    if tv is not None:
                        g = _pair_concordance(
                            tv, tv.samples[si], v, v.samples[si]
                        )
                        tv.gtco[si] = _upgrade_gtco(tv.gtco[si], g)
                    else:
                        g = _unmatched_concordance(v.samples[si])
                    gtco.append(g)
                _set_gtco(v, gtco)
                cw.write(v)
                n_c += 1
            for v in t_rows.get(chrom, []):
                gtco = [
                    g if g is not None
                    else _unmatched_concordance(v.samples[si])
                    for si, g in enumerate(v.gtco)
                ]
                _set_gtco(v, gtco)
                tw.write(v)
                n_t += 1
    return n_t, n_c


def _set_gtco(v, gtco):
    if "GTCO" not in v.format_keys:
        v.format_keys.append("GTCO")
    for s, g in zip(v.samples, gtco):
        s["GTCO"] = g


_HAP_IDX = {"A": 0, "B": 1, "C": 2, "D": 3}


def _parse_transmissions(path: str, sample_ids):
    """Parse the haplotype-transmissions file: a `#chrom start end s1 s2...`
    header, then per-interval rows with 1-2 founder-haplotype letters
    (A-D) per sample (assessHaplotypeTransmissionSupport.cpp:129-172)."""
    idx = {}
    sample_to_col = None
    with open(path) as fh:
        for line in fh:
            parts = line.rstrip("\n").split("\t")
            if line.startswith("#"):
                sample_to_col = {s: i for i, s in enumerate(parts[3:])}
                continue
            assert sample_to_col is not None, "missing header row"
            conf = []
            for s in sample_ids:
                letters = parts[3 + sample_to_col[s]]
                assert 1 <= len(letters) <= 2
                conf.append(tuple(_HAP_IDX[c] for c in letters))
            idx.setdefault(parts[0], []).append(
                (int(parts[1]), int(parts[2]), conf)
            )
    for intervals in idx.values():
        intervals.sort()
    return idx


def assess_haplotype_transmission_support(vcf_path: str,
                                          transmissions_path: str,
                                          out_prefix: str):
    """Annotate variants with HTV: whether the called genotypes are
    consistent with SOME assignment of alleles to the four founder
    haplotypes given the per-interval inheritance vectors
    (assessHaplotypeTransmissionSupport.cpp:95-341).

    Per variant inside a haplotype block: enumerate every allele
    assignment (numAlls^4 combinations over founders A-D); a combination
    validates when every completely-called sample's sorted GT equals the
    alleles at its inherited founder haplotypes. HTV = TRUE (exactly one
    validating assignment), MULTI-TRUE (>1), FALSE (none), NA (outside a
    block). Writes <prefix>.vcf and returns the counts dict."""
    import itertools
    from bisect import bisect_left

    reader = VcfReader(vcf_path, parse_samples=True)
    sample_ids = reader.meta.samples
    blocks = _parse_transmissions(transmissions_path, sample_ids)
    meta = reader.meta
    if "HTV" not in meta.info:
        meta.add_info(
            "HTV", 1, "String",
            "Variant validated by haplotype transmission "
            "(TRUE, MULTI-TRUE, FALSE, NA).",
        )
    counts = {"TRUE": 0, "MULTI-TRUE": 0, "FALSE": 0, "NA": 0}
    with VcfWriter(out_prefix + ".vcf", meta) as w:
        for v in reader:
            intervals = blocks.get(v.chrom, [])
            ends = [iv[1] for iv in intervals]
            bi = bisect_left(ends, v.pos)
            htv = "NA"
            if bi < len(intervals):
                start, end, conf = intervals[bi]
                if start <= v.pos and v.pos + len(v.ref) - 1 <= end:
                    na = 1 + len(v.alts)
                    # observed sorted GTs for complete samples
                    obs = []
                    for si, s in enumerate(v.samples):
                        gt = str(s.get("GT", ".")).replace("|", "/")
                        parts = gt.split("/")
                        if "." in parts or gt in (".", ""):
                            obs.append(None)  # filtered/incomplete
                        else:
                            obs.append(sorted(int(x) for x in parts))
                    n_valid = 0
                    for comb in itertools.product(range(na), repeat=4):
                        ok = True
                        for si in range(len(sample_ids)):
                            if obs[si] is None:
                                continue
                            expected = sorted(comb[h] for h in conf[si])
                            if expected != obs[si]:
                                ok = False
                                break
                        if ok:
                            n_valid += 1
                    htv = ("TRUE" if n_valid == 1 else
                           "MULTI-TRUE" if n_valid > 1 else "FALSE")
            v.info["HTV"] = htv
            counts[htv] += 1
            w.write(v)
    return counts
