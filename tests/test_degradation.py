"""Graceful degradation at the crash envelope: an injected failure on a
noise chain group or a stacked genotype wave group must trigger automatic
retry at halved width and produce BYTE-IDENTICAL output (grouping is
bit-exact because every per-cluster stream is cluster-keyed and every
per-chain stream is chain0-keyed). Matches the reference's restartable-unit
recovery posture (main.cpp:258-262) re-expressed in-process."""

import numpy as np
import pytest

from bayestyper_tpu.engine import (
    GenotypeOptions,
    genotype_unit,
    run_cluster_phase,
)
from bayestyper_tpu.io.samples import ChromosomePloidy

from .util_sim import write_sim_data

K = 21
NUM_VARIANTS = 150  # > 64-cluster chunk floor -> multi-chunk stacked groups


@pytest.fixture(scope="module")
def sim(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("degrade")
    rng = np.random.default_rng(77)
    truth = [
        [tuple(sorted(rng.integers(0, 2, 2))) for _ in range(NUM_VARIANTS + 10)]
        for _ in range(2)
    ]
    genome, genome_path, vcf_path, variants, samples = write_sim_data(
        tmp_path, rng, truth, k=K, num_snv=150, num_ins=0, num_del=0,
        genome_len=120000, coverage=15.0,
    )
    ploidy = ChromosomePloidy.human_default()
    unit = run_cluster_phase(
        genome, samples, vcf_path, ploidy, kmer_size=K,
        max_parameter_kmers=100000,
    )
    return tmp_path, genome, samples, ploidy, unit


def _run(sim, name, monkeypatch, env=()):
    tmp_path, genome, samples, ploidy, unit = sim
    for k, v in env:
        monkeypatch.setenv(k, v)
    out = str(tmp_path / f"{name}.vcf")
    # max_bucket_clusters=64 forces the 150-SNV class into 3 chunks so the
    # stacked wave group has B > 1 and the injected failure can fire
    opts = GenotypeOptions(num_chains=4, burn_in=20, num_samples=40,
                           random_seed=5, max_bucket_clusters=64)
    genotype_unit(unit, samples, genome, ploidy, out, opts)
    with open(out, "rb") as fh:
        return fh.read()


def test_degraded_runs_match_clean_run(sim, monkeypatch, capfd):
    clean = _run(sim, "clean", monkeypatch)
    capfd.readouterr()

    degraded = _run(
        sim, "degraded", monkeypatch,
        env=[
            ("BT_NOISE_FAIL_ABOVE", "2"),    # 4-chain group fails -> 2+2
            ("BT_WAVE_FAIL_ABOVE_B", "1"),   # any stacked B>1 fails -> halve
        ],
    )
    logs = capfd.readouterr().out
    # both degradation paths must actually have fired and recovered
    assert "degrading to 2-chain groups" in logs, logs[-2000:]
    assert "Retrying failed stacked group" in logs, logs[-2000:]

    # the writer emits no timestamps, so full output bytes must match
    assert degraded == clean

    num_rows = sum(
        1 for line in clean.split(b"\n") if line and not line.startswith(b"#")
    )
    assert num_rows == NUM_VARIANTS
