"""filter: post-hoc refiltering of a genotyped VCF.

Equivalent of bayesTyperTools filter (Filter.cpp:46-328): recompute the
per-sample allele filters (SAF) from NAK/FAK — the FAK threshold is
1 - exp(-0.275 * coverage) with coverage from the `_genomic_parameters.txt`
dump (Filter.cpp:70-103) — clear genotypes whose max GPP falls below the
threshold or whose alleles fail the filters, optionally require a minimum
number of homozygote carriers per alt allele, then recompute AC/AF/AN/ACP
and set FILTER=AN0 when no genotypes remain
(updateAlleleStatsAndCallProb, Auxiliaries.cpp:649+).
"""

from __future__ import annotations

import math

from ..constants import OBSERVED_KMER_BETA
from ..io.vcf import VcfReader, VcfWriter


def read_genomic_parameters(path):
    """Parse the <prefix>_genomic_parameters.txt dump (Sample\tMean\tVariance)."""
    means = {}
    with open(path) as fh:
        header = fh.readline()
        for line in fh:
            parts = line.strip().split("\t")
            if len(parts) >= 2:
                means[parts[0]] = float(parts[1])
    return means


def filter_vcf(vcf_path, out_path, min_homozygote_genotypes=0,
               min_genotype_posterior=0.99, min_number_of_kmers=1.0,
               kmer_coverage_file=None):
    reader = VcfReader(vcf_path, parse_samples=True)
    sample_names = reader.meta.samples

    fak_thresholds = [0.0] * len(sample_names)
    if kmer_coverage_file:
        means = read_genomic_parameters(kmer_coverage_file)
        for i, name in enumerate(sample_names):
            if name in means:
                fak_thresholds[i] = 1.0 - math.exp(
                    -OBSERVED_KMER_BETA * means[name]
                )

    writer = VcfWriter(out_path, reader.meta)
    stats = {"variants": 0, "cleared_genotypes": 0, "an0": 0}

    for v in reader:
        stats["variants"] += 1
        num_alleles = 1 + len(v.alts)
        hom_counts = [0] * num_alleles
        parsed = []
        for si, s in enumerate(v.samples):
            gt = s.get("GT", ".")
            alleles = None
            if gt not in (".", "./.", ""):
                alleles = [int(x) for x in gt.replace("|", "/").split("/")
                           if x != "."]
            parsed.append(alleles)
            if alleles and len(set(alleles)) == 1 and len(alleles) == 2:
                hom_counts[alleles[0]] += 1

        for si, s in enumerate(v.samples):
            alleles = parsed[si]
            if not alleles:
                continue
            nak = _floats(s.get("NAK"))
            fak = _floats(s.get("FAK"))
            gpp = _floats(s.get("GPP"))
            clear = False
            if gpp:
                if max(gpp) < min_genotype_posterior:
                    clear = True
            saf = []
            for a in range(num_alleles):
                f = 0
                if nak and a < len(nak) and 0 <= nak[a] < min_number_of_kmers:
                    f += 1
                if (fak and a < len(fak) and nak and a < len(nak)
                        and nak[a] > 0 and 0 <= fak[a] < fak_thresholds[si]):
                    f += 2
                saf.append(f)
            for a in alleles:
                if a < len(saf) and saf[a] != 0:
                    clear = True
                if min_homozygote_genotypes > 0 and a > 0 \
                        and hom_counts[a] < min_homozygote_genotypes:
                    clear = True
            s["SAF"] = ",".join(str(x) for x in saf)
            if clear:
                sep = "/" if "/" in s["GT"] or len(alleles) == 2 else ""
                s["GT"] = sep.join(["."] * max(len(alleles), 1)) if sep else "."
                stats["cleared_genotypes"] += 1
                parsed[si] = None

        # recompute AC/AF/AN
        ac = [0] * len(v.alts)
        an = 0
        for alleles in parsed:
            if not alleles:
                continue
            for a in alleles:
                an += 1
                if a > 0:
                    ac[a - 1] += 1
        v.info["AC"] = ",".join(str(x) for x in ac)
        v.info["AN"] = str(an)
        v.info["AF"] = ",".join(
            f"{(c / an if an else 0):.6g}" for c in ac
        )
        if an == 0:
            v.filters = ["AN0"]
            stats["an0"] += 1

        writer.write(v)

    writer.close()
    return stats


def _floats(s):
    if not s or s == ".":
        return None
    out = []
    for part in s.split(","):
        try:
            out.append(float(part))
        except ValueError:
            out.append(-1.0)
    return out
