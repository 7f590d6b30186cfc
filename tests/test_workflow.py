"""Workflow orchestration test: full pipeline from reads (no external KMC),
multiple inference units, concat — the workflows/ Snakemake DAG equivalent."""

import numpy as np

from bayestyper_tpu.cli import main
from bayestyper_tpu.io.vcf import VcfReader

from .util_sim import apply_haplotype, make_variants, random_genome

K = 31


def _write_reads(path, seqs, rng, read_len=150, coverage=12):
    """Simulate error-free reads from haplotype sequences."""
    with open(path, "w") as fh:
        n = 0
        for seq in seqs:
            num_reads = len(seq) * coverage // (read_len * len(seqs))
            for _ in range(num_reads):
                start = int(rng.integers(0, max(len(seq) - read_len, 1)))
                fh.write(f"@r{n}\n{seq[start:start+read_len]}\n+\n"
                         f"{'I'*read_len}\n")
                n += 1


def test_workflow_from_reads(tmp_path):
    rng = np.random.default_rng(77)
    genome = random_genome(rng, 15000)
    chrom = genome.names[0]
    seq = genome[chrom].decode()
    variants = make_variants(rng, genome, num_snv=8, num_ins=1, num_del=1,
                             spacing=400)

    genome_path = str(tmp_path / "genome.fa")
    from bayestyper_tpu.io.fasta import write_fasta

    write_fasta(genome_path, [(chrom, genome[chrom])])

    vcf_path = str(tmp_path / "candidates.vcf")
    with open(vcf_path, "w") as fh:
        fh.write("##fileformat=VCFv4.2\n")
        fh.write(f"##contig=<ID={chrom},length={len(seq)}>\n")
        fh.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
        for pos, ref, alt in variants:
            fh.write(f"{chrom}\t{pos+1}\t.\t{ref}\t{alt}\t.\t.\t.\n")

    truth = [tuple(sorted(rng.integers(0, 2, 2))) for _ in variants]
    h1 = apply_haplotype(seq, variants, [g[0] for g in truth])
    h2 = apply_haplotype(seq, variants, [g[1] for g in truth])
    reads_path = str(tmp_path / "reads.fq")
    _write_reads(reads_path, [h1, h2], rng, coverage=40)

    samples_tsv = str(tmp_path / "samples.tsv")
    with open(samples_tsv, "w") as fh:
        fh.write(f"s0\tF\t{tmp_path}/s0\n")

    out_prefix = str(tmp_path / "wf")
    rc = main([
        "workflow",
        "-g", genome_path, "-v", vcf_path, "-s", samples_tsv,
        "-o", out_prefix, "-k", str(K), "-r", "3",
        "--reads", reads_path,
        "--min-kmer-count", "2",
        "-u", "4",  # force multiple units
        "--number-of-gibbs-chains", "4",
        "--gibbs-burn-in", "20", "--gibbs-samples", "50",
    ])
    assert rc == 0

    import os
    assert os.path.isdir(out_prefix + "_unit_1")
    assert os.path.isdir(out_prefix + "_unit_2")

    reader = VcfReader(out_prefix + ".vcf", parse_samples=True)
    rows = list(reader)
    assert len(rows) == len(variants)
    # positions sorted after concat
    assert [r.pos for r in rows] == sorted(r.pos for r in rows)
    pos_to_vi = {pos + 1: vi for vi, (pos, _, _) in enumerate(variants)}
    called = correct = 0
    for r in rows:
        s = r.samples[0]
        if "." in s["GT"]:
            continue
        called += 1
        a = tuple(sorted(int(x) for x in s["GT"].split("/")))
        correct += a == truth[pos_to_vi[r.pos]]
    assert called >= len(rows) * 0.5
    assert correct / called > 0.85, (called, correct)
