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
