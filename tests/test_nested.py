"""Overlapping/contained variants: a deletion spanning an interior SNV.

The reference models this with nested cluster groups + ploidy demotion
(VariantClusterGroup.cpp:236-250); here the containment is flattened into one
joint cluster where deletion-carrying paths give interior variants their `*`
missing allele (PARITY.md "Nested clusters"). This exercises has_dependency,
missing-allele genotypes, and the sentinel haplotype machinery end-to-end.
"""

import numpy as np
import pytest

from bayestyper_tpu.engine import (
    GenotypeOptions, genotype_unit, run_cluster_phase,
)
from bayestyper_tpu.io.fasta import Genome, write_fasta
from bayestyper_tpu.io.kmc import write_kmc1, count_kmers_from_sequences
from bayestyper_tpu.io.samples import ChromosomePloidy, Sample
from bayestyper_tpu.io.vcf import VcfReader
from bayestyper_tpu.constants import GENDER_FEMALE

K = 21


def test_deletion_spanning_snv(tmp_path):
    rng = np.random.default_rng(5)
    seq = "".join(rng.choice(list("ACGT"), 4000))
    genome = Genome()
    genome.names = ["chr1"]
    genome.sequences["chr1"] = seq.encode()

    # deletion at pos 2000 removing 60 bases; SNV at pos 2030 (inside)
    del_pos, del_len, snv_pos = 2000, 60, 2030
    del_ref = seq[del_pos : del_pos + del_len + 1]
    del_alt = seq[del_pos]
    snv_ref = seq[snv_pos]
    snv_alt = next(b for b in "ACGT" if b != snv_ref)

    genome_path = str(tmp_path / "genome.fa")
    write_fasta(genome_path, [("chr1", genome["chr1"])])
    vcf_path = str(tmp_path / "vars.vcf")
    with open(vcf_path, "w") as fh:
        fh.write("##fileformat=VCFv4.2\n##contig=<ID=chr1,length=4000>\n")
        fh.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
        fh.write(f"chr1\t{del_pos + 1}\t.\t{del_ref}\t{del_alt}\t.\t.\t.\n")
        fh.write(f"chr1\t{snv_pos + 1}\t.\t{snv_ref}\t{snv_alt}\t.\t.\t.\n")

    # sample: heterozygous deletion / SNV-alt on the non-deleted haplotype
    h1 = seq[: del_pos + 1] + seq[del_pos + del_len + 1 :]  # deletion hap
    h2 = seq[:snv_pos] + snv_alt + seq[snv_pos + 1 :]       # SNV hap
    counts = {}
    mean = 15.0
    hi, lo, mult = count_kmers_from_sequences(
        [h1.encode(), h2.encode()], K
    )
    m = mult.astype(np.float64)
    mm, vv = mean * m, 2 * mean * m
    cnt = rng.negative_binomial(mm * mm / (vv - mm), mm / vv)
    keep = cnt > 0
    prefix = str(tmp_path / "s0")
    write_kmc1(prefix, hi[keep], lo[keep], cnt[keep], kmer_length=K)
    samples = [Sample("s0", GENDER_FEMALE, prefix)]

    ploidy = ChromosomePloidy.human_default()
    unit = run_cluster_phase(genome, samples, vcf_path, ploidy, kmer_size=K)

    # both variants flattened into one cluster; SNV carries the * dependency
    assert len(unit.compiled) == 1
    fc = unit.compiled[0]
    assert len(fc.variants) == 2
    snv = fc.variants[1]
    assert snv.has_dependency
    assert snv.num_alleles == 3  # ref, alt, missing(*)
    # the deletion path assigns the SNV its missing allele
    assert (fc.hap_allele[:, 1] == 2).any()

    out = str(tmp_path / "out.vcf")
    opts = GenotypeOptions(num_chains=6, burn_in=40, num_samples=100,
                           random_seed=3)
    genotype_unit(unit, samples, genome, ploidy, out, opts)

    reader = VcfReader(out, parse_samples=True)
    rows = {r.pos: r for r in reader}
    del_row = rows[del_pos + 1]
    snv_row = rows[snv_pos + 1]

    # deletion: heterozygous
    assert del_row.samples[0]["GT"] == "0/1", del_row.samples[0]
    # SNV row carries the * allele and the call pairs the alt with missing
    assert snv_row.alts[-1] == "*"
    gt = snv_row.samples[0]["GT"]
    assert set(gt.split("/")) == {"1", "2"}, gt  # alt + missing(*)


def test_large_sv_genotyping(tmp_path):
    """A 300 bp deletion and a 150 bp insertion (small-SV scale,
    BASELINE configs[1]) genotyped end-to-end."""
    rng = np.random.default_rng(17)
    seq = "".join(rng.choice(list("ACGT"), 8000))
    genome = Genome()
    genome.names = ["chr1"]
    genome.sequences["chr1"] = seq.encode()

    del_pos, del_len = 2000, 300
    ins_pos = 5000
    ins_seq = "".join(rng.choice(list("ACGT"), 150))
    del_ref = seq[del_pos : del_pos + del_len + 1]
    variants = [
        (del_pos, del_ref, seq[del_pos]),
        (ins_pos, seq[ins_pos], seq[ins_pos] + ins_seq),
    ]

    write_fasta(str(tmp_path / "g.fa"), [("chr1", genome["chr1"])])
    vcf_path = str(tmp_path / "v.vcf")
    with open(vcf_path, "w") as fh:
        fh.write("##fileformat=VCFv4.2\n##contig=<ID=chr1,length=8000>\n")
        fh.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
        for p, r, a in variants:
            fh.write(f"chr1\t{p + 1}\t.\t{r}\t{a}\t.\t.\t.\n")

    # het deletion, hom insertion
    # apply insertion to both haps (hom); deletion only to h1 (het)
    def apply(s, dele, ins):
        out = s
        if ins:
            # insertion applies at ins_pos of the ORIGINAL coordinates; for
            # h1 the deletion upstream shifts it by -del_len
            shift = -del_len if dele else 0
            p = ins_pos + shift
            out = out[: p + 1] + ins_seq + out[p + 1 :]
        return out

    h1 = apply(seq[: del_pos + 1] + seq[del_pos + del_len + 1 :], True, True)
    h2 = apply(seq, False, True)
    mean = 15.0
    hi, lo, mult = count_kmers_from_sequences([h1.encode(), h2.encode()], K)
    m = mult.astype(np.float64)
    mm, vv = mean * m, 2 * mean * m
    cnt = rng.negative_binomial(mm * mm / (vv - mm), mm / vv)
    keep = cnt > 0
    prefix = str(tmp_path / "s0")
    write_kmc1(prefix, hi[keep], lo[keep], cnt[keep], kmer_length=K)
    samples = [Sample("s0", GENDER_FEMALE, prefix)]

    ploidy = ChromosomePloidy.human_default()
    unit = run_cluster_phase(genome, samples, vcf_path, ploidy, kmer_size=K)
    out = str(tmp_path / "out.vcf")
    opts = GenotypeOptions(num_chains=6, burn_in=40, num_samples=100,
                           random_seed=7)
    genotype_unit(unit, samples, genome, ploidy, out, opts)

    reader = VcfReader(out, parse_samples=True)
    rows = {r.pos: r for r in reader}
    assert rows[del_pos + 1].samples[0]["GT"] == "0/1"
    assert rows[ins_pos + 1].samples[0]["GT"] == "1/1"
