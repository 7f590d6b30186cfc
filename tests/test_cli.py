"""CLI end-to-end: drive `bayestyper-tpu makeBloom / cluster / genotype`
through the console entry point on simulated data."""

import numpy as np
import pytest

from bayestyper_tpu.cli import main
from bayestyper_tpu.io.vcf import VcfReader

from .util_sim import write_sim_data

K = 31


def test_cli_pipeline(tmp_path):
    rng = np.random.default_rng(9)
    truth = [[tuple(sorted(rng.integers(0, 2, 2))) for _ in range(30)]
             for _ in range(2)]
    genome, genome_path, vcf_path, variants, samples = write_sim_data(
        tmp_path, rng, truth, k=K, num_snv=8, num_ins=1, num_del=1,
        genome_len=15000, coverage=15.0,
    )
    samples_tsv = str(tmp_path / "samples.tsv")
    with open(samples_tsv, "w") as fh:
        for s in samples:
            fh.write(f"{s.name}\tF\t{s.kmc_prefix}\n")

    rc = main([
        "makeBloom", "-k", samples[0].kmc_prefix, "--run-test",
    ])
    assert rc == 0

    out_prefix = str(tmp_path / "bt")
    rc = main([
        "cluster",
        "-g", genome_path, "-v", vcf_path, "-s", samples_tsv,
        "-o", out_prefix, "-k", str(K), "-r", "7",
    ])
    assert rc == 0

    rc = main([
        "genotype",
        "-g", genome_path, "-s", samples_tsv,
        "-c", f"{out_prefix}_unit_1/variant_clusters.pkl",
        "-o", out_prefix, "-k", str(K), "-r", "7",
        "--number-of-gibbs-chains", "4",
        "--gibbs-burn-in", "20", "--gibbs-samples", "50",
    ])
    assert rc == 0

    reader = VcfReader(out_prefix + ".vcf", parse_samples=True)
    rows = list(reader)
    assert len(rows) == len(variants)
    # commandline provenance header present (OptionsContainer::getHeader)
    assert any("commandline" in line for line in reader.meta.other)
    # calls are mostly correct
    pos_to_vi = {pos + 1: vi for vi, (pos, _, _) in enumerate(variants)}
    correct = called = 0
    for r in rows:
        for si, s in enumerate(r.samples):
            if "." in s["GT"]:
                continue
            called += 1
            a = tuple(sorted(int(x) for x in s["GT"].split("/")))
            correct += a == truth[si][pos_to_vi[r.pos]]
    assert called >= len(rows)  # at least half the genotype slots called
    assert correct / called > 0.9
