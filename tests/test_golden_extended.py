"""Extended golden harness (VERDICT r2 item 7): byte-pinned output VCFs on
the paths most likely to drift silently, beyond tests/test_golden.py's small
k=31 SNV/indel fixture:

  * k=55 with structural variants AND a nested containment family (a
    deletion spanning phased SNVs routes through genotype_nested)
  * chrX haploid male + explicit ploidy FILE (null/haploid sample paths,
    ChromosomePloidy.cpp:94-196 file semantics)
  * joint noise-genotyping mode (estimateNoiseAndGenotypes,
    InferenceEngine.cpp:384-472 -> genotype_unit_joint)

Regenerate consciously with:  GOLDEN_REGEN=1 pytest tests/test_golden_extended.py
"""

import os

import numpy as np
import pytest

from bayestyper_tpu.constants import GENDER_FEMALE, GENDER_MALE
from bayestyper_tpu.engine import (
    GenotypeOptions, genotype_unit, genotype_unit_joint, run_cluster_phase,
)
from bayestyper_tpu.io.fasta import Genome, write_fasta
from bayestyper_tpu.io.kmc import write_kmc1
from bayestyper_tpu.io.samples import ChromosomePloidy, Sample

from .util_sim import apply_haplotype, simulate_counts

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def _check_golden(name, out_path):
    golden = os.path.join(GOLDEN_DIR, name)
    produced = open(out_path, "rb").read()
    if os.environ.get("GOLDEN_REGEN"):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        with open(golden, "wb") as fh:
            fh.write(produced)
        pytest.skip(f"regenerated {name}")
    assert os.path.exists(golden), (
        f"{name} missing; run GOLDEN_REGEN=1 pytest {__file__}"
    )
    expected = open(golden, "rb").read()
    if produced != expected:
        for i, (a, b) in enumerate(
            zip(produced.splitlines(), expected.splitlines())
        ):
            if a != b:
                raise AssertionError(
                    f"{name} mismatch at line {i + 1}:\n"
                    f"  produced: {a[:200]!r}\n  expected: {b[:200]!r}"
                )
        raise AssertionError(
            f"{name} length mismatch: {len(produced)} vs {len(expected)}"
        )


def _sim(tmp_path, chrom, seq, variants, genders, rng, k, coverage=15.0,
         gt_fn=None):
    genome = Genome()
    genome.names = [chrom]
    genome.sequences[chrom] = seq.encode()
    genome_path = str(tmp_path / "genome.fa")
    write_fasta(genome_path, [(chrom, seq.encode())])

    vcf_path = str(tmp_path / "candidates.vcf")
    with open(vcf_path, "w") as fh:
        fh.write("##fileformat=VCFv4.2\n")
        fh.write(f"##contig=<ID={chrom},length={len(seq)}>\n")
        fh.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
        for pos, ref, alt in variants:
            fh.write(f"{chrom}\t{pos + 1}\t.\t{ref}\t{alt}\t.\t.\t.\n")

    samples = []
    for si, gender in enumerate(genders):
        if gt_fn is not None:
            gts = gt_fn(si, gender)
        else:
            gts = [tuple(sorted(rng.integers(0, 2, 2))) for _ in variants]
        h1 = apply_haplotype(seq, variants, [g[0] for g in gts])
        haps = [h1]
        if gender == GENDER_FEMALE:
            haps.append(apply_haplotype(seq, variants, [g[1] for g in gts]))
        hi, lo, counts = simulate_counts(rng, haps, k, mean=coverage)
        prefix = str(tmp_path / f"s{si}")
        write_kmc1(prefix, hi, lo, counts, kmer_length=k)
        samples.append(Sample(f"s{si}", gender, prefix))
    return genome, vcf_path, samples


def test_golden_k55_sv_nested(tmp_path):
    """k=55, SV alleles, and a deletion spanning two phased SNVs (a
    containment family exercising the nested conditional program)."""
    rng = np.random.default_rng(55)
    seq = "".join(rng.choice(list("ACGT"), 30000))
    k = 55
    variants = []
    # isolated SNVs
    pos = 600
    for _ in range(6):
        rb = seq[pos]
        alt = str(rng.choice([b for b in "ACGT" if b != rb]))
        variants.append((pos, rb, alt))
        pos += 800
    # a 300 bp deletion whose span contains two SNVs < k apart (nested)
    dpos = pos + 500
    variants.append((dpos, seq[dpos : dpos + 301], seq[dpos]))
    s1 = dpos + 80
    variants.append((s1, seq[s1], "T" if seq[s1] != "T" else "G"))
    s2 = s1 + 20
    variants.append((s2, seq[s2], "A" if seq[s2] != "A" else "C"))
    # a 150 bp insertion (SV)
    ipos = dpos + 1200
    ins = "".join(rng.choice(list("ACGT"), 150))
    variants.append((ipos, seq[ipos], seq[ipos] + ins))
    variants.sort(key=lambda v: v[0])

    genome, vcf_path, samples = _sim(
        tmp_path, "chr1", seq, variants, [GENDER_FEMALE, GENDER_FEMALE],
        rng, k,
    )
    ploidy = ChromosomePloidy.human_default()
    unit = run_cluster_phase(genome, samples, vcf_path, ploidy, kmer_size=k,
                             max_parameter_kmers=100000)
    assert any(getattr(fc, "parent_id", -1) >= 0 for fc in unit.compiled), (
        "expected a nested containment family in this fixture"
    )
    out = str(tmp_path / "out.vcf")
    opts = GenotypeOptions(num_chains=3, burn_in=20, num_samples=40,
                           random_seed=9)
    genotype_unit(unit, samples, genome, ploidy, out, opts)
    _check_golden("pipeline_k55_sv_nested.vcf", out)


def test_golden_chrx_ploidy_file(tmp_path):
    """chrX with a male (haploid) + a custom ploidy file forcing a null
    chromosome for females — exercising haploid outcomes and null-ploidy
    no-calls through the writer."""
    rng = np.random.default_rng(77)
    seq = "".join(rng.choice(list("ACGT"), 16000))
    k = 31
    variants = []
    pos = 500
    for _ in range(10):
        rb = seq[pos]
        alt = str(rng.choice([b for b in "ACGT" if b != rb]))
        variants.append((pos, rb, alt))
        pos += 700

    def gt_fn(si, gender):
        if gender == GENDER_MALE:
            return [(a, a) for a in rng.integers(0, 2, len(variants))]
        return [tuple(sorted(rng.integers(0, 2, 2))) for _ in variants]

    genome, vcf_path, samples = _sim(
        tmp_path, "chrX", seq, variants, [GENDER_FEMALE, GENDER_MALE],
        rng, k, gt_fn=gt_fn,
    )
    # ploidy FILE: female diploid, male haploid on chrX (explicit rather
    # than name-default, exercising ChromosomePloidy.from_file)
    ploidy_path = str(tmp_path / "ploidy.tsv")
    with open(ploidy_path, "w") as fh:
        fh.write("chrX\t2\t1\n")
    ploidy = ChromosomePloidy.from_file(ploidy_path)
    unit = run_cluster_phase(genome, samples, vcf_path, ploidy, kmer_size=k,
                             max_parameter_kmers=100000)
    out = str(tmp_path / "out.vcf")
    opts = GenotypeOptions(num_chains=3, burn_in=20, num_samples=40,
                           random_seed=11)
    genotype_unit(unit, samples, genome, ploidy, out, opts)
    _check_golden("pipeline_chrx_ploidy.vcf", out)

    # the male sample's calls must be haploid (single-allele GT)
    from bayestyper_tpu.io.vcf import VcfReader

    male_calls = [
        r.samples[1]["GT"] for r in VcfReader(out, parse_samples=True)
    ]
    assert male_calls and all("/" not in gt and "|" not in gt
                              for gt in male_calls)


def test_golden_joint_mode(tmp_path):
    """--noise-genotyping: joint noise + genotype estimation."""
    rng = np.random.default_rng(99)
    seq = "".join(rng.choice(list("ACGT"), 14000))
    k = 31
    variants = []
    pos = 400
    for _ in range(12):
        rb = seq[pos]
        alt = str(rng.choice([b for b in "ACGT" if b != rb]))
        variants.append((pos, rb, alt))
        pos += 600

    genome, vcf_path, samples = _sim(
        tmp_path, "chr1", seq, variants, [GENDER_FEMALE, GENDER_FEMALE],
        rng, k,
    )
    ploidy = ChromosomePloidy.human_default()
    unit = run_cluster_phase(genome, samples, vcf_path, ploidy, kmer_size=k,
                             max_parameter_kmers=100000)
    out = str(tmp_path / "out.vcf")
    opts = GenotypeOptions(num_chains=3, burn_in=20, num_samples=40,
                           random_seed=13)
    genotype_unit_joint(unit, samples, genome, ploidy, out, opts)
    _check_golden("pipeline_joint_mode.vcf", out)
