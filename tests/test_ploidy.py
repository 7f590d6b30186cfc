"""Gender ploidy end-to-end: male chrX calls are haploid, female diploid,
male chrY haploid, female chrY uncalled (ChromosomePloidy.cpp:40-92)."""

import numpy as np

from bayestyper_tpu.engine import (
    GenotypeOptions, genotype_unit, run_cluster_phase,
)
from bayestyper_tpu.io.fasta import Genome, write_fasta
from bayestyper_tpu.io.kmc import count_kmers_from_sequences, write_kmc1
from bayestyper_tpu.io.samples import ChromosomePloidy, Sample
from bayestyper_tpu.io.vcf import VcfReader
from bayestyper_tpu.constants import GENDER_FEMALE, GENDER_MALE

K = 21


def test_chrx_male_haploid(tmp_path):
    rng = np.random.default_rng(11)
    seq = "".join(rng.choice(list("ACGT"), 3000))
    genome = Genome()
    genome.names = ["chrX"]
    genome.sequences["chrX"] = seq.encode()

    positions = [500, 1200, 2000]
    variants = []
    for p in positions:
        ref = seq[p]
        alt = next(b for b in "ACGT" if b != ref)
        variants.append((p, ref, alt))

    write_fasta(str(tmp_path / "g.fa"), [("chrX", genome["chrX"])])
    vcf_path = str(tmp_path / "v.vcf")
    with open(vcf_path, "w") as fh:
        fh.write("##fileformat=VCFv4.2\n##contig=<ID=chrX,length=3000>\n")
        fh.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
        for p, r, a in variants:
            fh.write(f"chrX\t{p + 1}\t.\t{r}\t{a}\t.\t.\t.\n")

    # male: ONE haplotype carrying alt at positions 0 and 2
    male_gt = [1, 0, 1]
    hap = list(seq)
    for (p, r, a), g in zip(variants, male_gt):
        if g:
            hap[p] = a
    hap = "".join(hap)
    mean = 15.0
    hi, lo, mult = count_kmers_from_sequences([hap.encode()], K)
    m = mult.astype(np.float64)
    mm, vv = mean * m, 2 * mean * m
    cnt = rng.negative_binomial(mm * mm / (vv - mm), mm / vv)
    keep = cnt > 0
    prefix = str(tmp_path / "male")
    write_kmc1(prefix, hi[keep], lo[keep], cnt[keep], kmer_length=K)
    samples = [Sample("male1", GENDER_MALE, prefix)]

    ploidy = ChromosomePloidy.human_default()
    assert ploidy.sample_ploidies("chrX", samples)[0] == 1  # haploid

    unit = run_cluster_phase(genome, samples, vcf_path, ploidy, kmer_size=K)
    out = str(tmp_path / "out.vcf")
    opts = GenotypeOptions(num_chains=6, burn_in=40, num_samples=100,
                           random_seed=4)
    genotype_unit(unit, samples, genome, ploidy, out, opts)

    reader = VcfReader(out, parse_samples=True)
    rows = sorted(reader, key=lambda r: r.pos)
    assert len(rows) == 3
    for row, expected in zip(rows, male_gt):
        gt = row.samples[0]["GT"]
        assert "/" not in gt, f"male chrX call should be haploid: {gt}"
        assert gt == str(expected), (row.pos, gt, expected)
        # haploid GPP vector has num_alleles entries
        assert len(row.samples[0]["GPP"].split(",")) == 2
