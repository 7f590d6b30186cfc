"""Simulation helpers: synthetic genome + variants + per-sample k-mer counts
(the E. coli-style end-to-end config, BASELINE.json configs[0])."""

from __future__ import annotations

import numpy as np

from bayestyper_tpu.io.fasta import Genome, write_fasta
from bayestyper_tpu.io.kmc import count_kmers_from_sequences, write_kmc1
from bayestyper_tpu.io.samples import Sample
from bayestyper_tpu.constants import GENDER_FEMALE


def random_genome(rng, length=60000, name="chr1"):
    seq = "".join(rng.choice(list("ACGT"), length))
    g = Genome()
    g.names = [name]
    g.sequences[name] = seq.encode()
    return g


def make_variants(rng, genome, num_snv=30, num_ins=5, num_del=5, spacing=400):
    """Place well-separated variants; returns [(pos0, ref, alt)] sorted."""
    chrom = genome.names[0]
    seq = genome[chrom].decode()
    variants = []
    pos = 300
    kinds = ["snv"] * num_snv + ["ins"] * num_ins + ["del"] * num_del
    rng.shuffle(kinds)
    for kind in kinds:
        pos += int(spacing + rng.integers(0, spacing))
        if pos + 60 >= len(seq):
            break
        ref_base = seq[pos]
        if kind == "snv":
            alt = rng.choice([b for b in "ACGT" if b != ref_base])
            variants.append((pos, ref_base, alt))
        elif kind == "ins":
            ins = "".join(rng.choice(list("ACGT"), int(rng.integers(2, 9))))
            variants.append((pos, ref_base, ref_base + ins))
        else:
            dlen = int(rng.integers(2, 9))
            variants.append((pos, seq[pos : pos + dlen + 1], ref_base))
    return variants


def apply_haplotype(seq: str, variants, alleles):
    """Apply chosen alleles (0=ref, 1=alt) to the reference sequence."""
    out = []
    cursor = 0
    for (pos, ref, alt), a in zip(variants, alleles):
        out.append(seq[cursor:pos])
        out.append(ref if a == 0 else alt)
        cursor = pos + len(ref)
    out.append(seq[cursor:])
    return "".join(out)


def simulate_counts(rng, hap_seqs, k, mean=15.0, var=30.0):
    """Per-sample k-mer counts: NB around mean*multiplicity over the union of
    haplotype k-mers."""
    hi, lo, mult = count_kmers_from_sequences(
        [s.encode() for s in hap_seqs], k
    )
    m = mult.astype(np.float64)
    mm, vv = mean * m, var * m
    r = mm * mm / (vv - mm)
    p = mm / vv
    counts = rng.negative_binomial(r, p)
    keep = counts > 0
    return hi[keep], lo[keep], np.minimum(counts[keep], 2**31 - 1)


def write_sim_data(tmp_path, rng, truth_genotypes, k=31, num_snv=30,
                   num_ins=5, num_del=5, genome_len=60000, coverage=15.0):
    """Create genome.fa, variants.vcf, per-sample KMC dbs; return paths +
    truth. truth_genotypes: [S][V] of (a1, a2)."""
    genome = random_genome(rng, genome_len)
    chrom = genome.names[0]
    seq = genome[chrom].decode()
    variants = make_variants(rng, genome, num_snv, num_ins, num_del)
    num_s = len(truth_genotypes)

    genome_path = str(tmp_path / "genome.fa")
    write_fasta(genome_path, [(chrom, genome[chrom])])

    vcf_path = str(tmp_path / "candidates.vcf")
    with open(vcf_path, "w") as fh:
        fh.write("##fileformat=VCFv4.2\n")
        fh.write(f"##contig=<ID={chrom},length={len(seq)}>\n")
        fh.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
        for pos, ref, alt in variants:
            fh.write(f"{chrom}\t{pos + 1}\t.\t{ref}\t{alt}\t.\t.\t.\n")

    samples = []
    for si in range(num_s):
        gts = truth_genotypes[si]
        h1 = apply_haplotype(seq, variants, [g[0] for g in gts[: len(variants)]])
        h2 = apply_haplotype(seq, variants, [g[1] for g in gts[: len(variants)]])
        hi, lo, counts = simulate_counts(rng, [h1, h2], k, mean=coverage)
        prefix = str(tmp_path / f"sample{si}")
        write_kmc1(prefix, hi, lo, counts, kmer_length=k)
        samples.append(Sample(f"sample{si}", GENDER_FEMALE, prefix))

    return genome, genome_path, vcf_path, variants, samples
