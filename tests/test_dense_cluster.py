"""Dense cluster stress: 8 SNVs within 150 bp form one joint cluster with a
combinatorial path space (256 full enumeration), exercising the larger
haplotype classes, bloom-scored beam pruning, and multi-variant stats."""

import numpy as np

from bayestyper_tpu.engine import (
    GenotypeOptions, genotype_unit, run_cluster_phase,
)
from bayestyper_tpu.io.fasta import Genome, write_fasta
from bayestyper_tpu.io.kmc import count_kmers_from_sequences, write_kmc1
from bayestyper_tpu.io.samples import ChromosomePloidy, Sample
from bayestyper_tpu.io.vcf import VcfReader
from bayestyper_tpu.constants import GENDER_FEMALE
from bayestyper_tpu.ops.bloom import KmerBloomFilter

K = 21


def test_dense_snv_cluster(tmp_path):
    rng = np.random.default_rng(23)
    seq = "".join(rng.choice(list("ACGT"), 5000))
    genome = Genome()
    genome.names = ["chr1"]
    genome.sequences["chr1"] = seq.encode()

    positions = [2000 + i * 18 for i in range(8)]  # all within k of neighbors
    variants = []
    for p in positions:
        ref = seq[p]
        alt = next(b for b in "ACGT" if b != ref)
        variants.append((p, ref, alt))

    write_fasta(str(tmp_path / "g.fa"), [("chr1", genome["chr1"])])
    vcf_path = str(tmp_path / "v.vcf")
    with open(vcf_path, "w") as fh:
        fh.write("##fileformat=VCFv4.2\n##contig=<ID=chr1,length=5000>\n")
        fh.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
        for p, r, a in variants:
            fh.write(f"chr1\t{p + 1}\t.\t{r}\t{a}\t.\t.\t.\n")

    # two haplotypes with distinct phased SNV patterns
    pat1 = [1, 0, 1, 1, 0, 0, 1, 0]
    pat2 = [0, 1, 0, 0, 1, 0, 0, 1]

    def apply(pattern):
        out = list(seq)
        for (p, r, a), g in zip(variants, pattern):
            if g:
                out[p] = a
        return "".join(out)

    h1, h2 = apply(pat1), apply(pat2)
    mean = 15.0
    hi, lo, mult = count_kmers_from_sequences([h1.encode(), h2.encode()], K)
    m = mult.astype(np.float64)
    mm, vv = mean * m, 2 * mean * m
    cnt = rng.negative_binomial(mm * mm / (vv - mm), mm / vv)
    keep = cnt > 0
    prefix = str(tmp_path / "s0")
    write_kmc1(prefix, hi[keep], lo[keep], cnt[keep], kmer_length=K)
    samples = [Sample("s0", GENDER_FEMALE, prefix)]

    # real bloom so the beam prunes with sample evidence
    bloom = KmerBloomFilter.with_optimal_parameters(len(hi), 0.001, K)
    bloom.add(hi[keep], lo[keep])

    ploidy = ChromosomePloidy.human_default()
    unit = run_cluster_phase(
        genome, samples, vcf_path, ploidy, sample_blooms=[bloom],
        kmer_size=K, max_sample_haplotypes=16,
    )
    assert len(unit.compiled) == 1
    fc = unit.compiled[0]
    assert len(fc.variants) == 8
    h = fc.hap_allele.shape[0]
    assert 2 <= h <= 128
    # the two true haplotypes survive the beam
    hap_rows = {tuple(row) for row in fc.hap_allele.tolist()}
    assert tuple(pat1) in hap_rows, (len(hap_rows), sorted(hap_rows)[:4])
    assert tuple(pat2) in hap_rows

    out = str(tmp_path / "out.vcf")
    opts = GenotypeOptions(num_chains=12, burn_in=60, num_samples=200,
                           random_seed=9)
    genotype_unit(unit, samples, genome, ploidy, out, opts)

    reader = VcfReader(out, parse_samples=True)
    rows = sorted(reader, key=lambda r: r.pos)
    assert len(rows) == 8
    called = correct = 0
    for row, g1, g2 in zip(rows, pat1, pat2):
        gt = row.samples[0]["GT"]
        if "." in gt:
            continue
        called += 1
        got = tuple(sorted(int(x) for x in gt.split("/")))
        correct += got == tuple(sorted((g1, g2)))
    # k=21 gives each SNV only ~40 discriminating k-mers (vs ~110 at the
    # production k=55), so a few GPPs land just under the 0.99 call
    # threshold — no-calls are correct behavior; every made call must be right
    assert called >= 5, called
    assert correct == called, (called, correct)
