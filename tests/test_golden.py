"""Golden-file harness: the full output VCF of a fixed-seed pipeline run is
pinned byte-for-byte (VERDICT round-1 item 4). Any refactor that changes the
sampler, statistics, filters, or writer formatting fails here and must either
be fixed or consciously regenerate the fixture:

    GOLDEN_REGEN=1 python -m pytest tests/test_golden.py

The fixture is generated on the CPU backend (tests/conftest.py forces cpu),
so it is independent of TPU availability. This complements the determinism
oracle (test_pipeline.test_determinism_same_seed): that one catches
nondeterminism within a version, this one catches silent behavior drift
across versions.
"""

import os

import numpy as np
import pytest

from bayestyper_tpu.engine import (
    GenotypeOptions,
    genotype_unit,
    run_cluster_phase,
)
from bayestyper_tpu.io.samples import ChromosomePloidy

from .util_sim import write_sim_data

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "pipeline_small.vcf")
K = 31


def _run_pipeline(tmp_path):
    rng = np.random.default_rng(2026)
    truth = [
        [tuple(sorted(rng.integers(0, 2, 2))) for _ in range(22)]
        for _ in range(2)
    ]
    genome, genome_path, vcf_path, variants, samples = write_sim_data(
        tmp_path, rng, truth, k=K, num_snv=8, num_ins=2, num_del=2,
        genome_len=20000, coverage=15.0,
    )
    ploidy = ChromosomePloidy.human_default()
    unit = run_cluster_phase(
        genome, samples, vcf_path, ploidy, kmer_size=K,
        max_parameter_kmers=100000,
    )
    out_path = str(tmp_path / "golden_run.vcf")
    opts = GenotypeOptions(num_chains=3, burn_in=20, num_samples=40,
                           random_seed=7)
    genotype_unit(unit, samples, genome, ploidy, out_path, opts)
    return out_path


def test_golden_vcf_byte_identical(tmp_path):
    out_path = _run_pipeline(tmp_path)
    produced = open(out_path, "rb").read()
    if os.environ.get("GOLDEN_REGEN"):
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        with open(GOLDEN, "wb") as fh:
            fh.write(produced)
        pytest.skip("regenerated golden fixture")
    assert os.path.exists(GOLDEN), (
        "golden fixture missing; run GOLDEN_REGEN=1 pytest tests/test_golden.py"
    )
    expected = open(GOLDEN, "rb").read()
    if produced != expected:
        # show the first diverging line for debuggability
        for i, (a, b) in enumerate(
            zip(produced.splitlines(), expected.splitlines())
        ):
            if a != b:
                raise AssertionError(
                    f"golden mismatch at line {i + 1}:\n"
                    f"  produced: {a[:200]!r}\n  expected: {b[:200]!r}"
                )
        raise AssertionError(
            f"golden length mismatch: {len(produced)} vs {len(expected)} bytes"
        )
