"""Full pipeline test: simulate genome/variants/counts -> cluster phase ->
genotype phase -> check output VCF genotype concordance (the end-to-end
oracle the reference lacks; SURVEY §4)."""

import numpy as np
import pytest

from bayestyper_tpu.engine import (
    GenotypeOptions,
    InferenceUnitData,
    genotype_unit,
    run_cluster_phase,
)
from bayestyper_tpu.io.samples import ChromosomePloidy
from bayestyper_tpu.io.vcf import VcfReader

from .util_sim import write_sim_data

K = 31
NUM_VARIANTS = 24


@pytest.fixture(scope="module")
def pipeline_result(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("sim")
    rng = np.random.default_rng(123)

    # 3 diploid samples, random genotypes per variant
    truth = [
        [tuple(sorted(rng.integers(0, 2, 2))) for _ in range(NUM_VARIANTS + 10)]
        for _ in range(3)
    ]
    genome, genome_path, vcf_path, variants, samples = write_sim_data(
        tmp_path, rng, truth, k=K, num_snv=16, num_ins=4, num_del=4,
        genome_len=40000, coverage=15.0,
    )

    ploidy = ChromosomePloidy.human_default()
    unit = run_cluster_phase(
        genome, samples, vcf_path, ploidy, kmer_size=K,
        max_parameter_kmers=200000,
    )

    # artifact round-trip (checkpoint/resume boundary, SURVEY §5)
    unit_path = str(tmp_path / "unit.pkl")
    unit.save(unit_path)
    unit = InferenceUnitData.load(unit_path)

    out_path = str(tmp_path / "genotypes.vcf")
    opts = GenotypeOptions(num_chains=6, burn_in=40, num_samples=100,
                           random_seed=5)
    summary = genotype_unit(unit, samples, genome, ploidy, out_path, opts)
    return genome, variants, samples, truth, out_path, summary, unit


def test_cluster_phase_counts(pipeline_result):
    genome, variants, samples, truth, out_path, summary, unit = pipeline_result
    assert len(unit.compiled) > 0
    total_vars = sum(len(fc.variants) for fc in unit.compiled)
    assert total_vars == len(variants)
    assert len(unit.param_hi) > 1000


def test_nb_fit_recovers_coverage(pipeline_result):
    _, _, _, _, _, summary, _ = pipeline_result
    # haploid mean 15 simulated; NB fit at multiplicity 2, size scaled back
    assert 12.0 < summary["nb_mean"][0] < 18.0, summary["nb_mean"]


def test_noise_rates_small(pipeline_result):
    _, _, _, _, _, summary, _ = pipeline_result
    assert (summary["noise_rates"] < 1.0).all(), summary["noise_rates"]


def test_output_vcf_well_formed(pipeline_result):
    genome, variants, samples, truth, out_path, summary, _ = pipeline_result
    reader = VcfReader(out_path, parse_samples=True)
    rows = list(reader)
    assert len(rows) == len(variants)
    assert reader.meta.samples == [s.name for s in samples]
    for r in rows:
        assert r.info_get("VCS") is not None
        assert r.info_get("HC") is not None
        for s in r.samples:
            assert set(s.keys()) == {
                "GT", "GQ", "GPP", "APP", "NAK", "FAK", "MAC", "SAF"
            }


def test_genotype_concordance(pipeline_result):
    genome, variants, samples, truth, out_path, summary, _ = pipeline_result
    reader = VcfReader(out_path, parse_samples=True)
    pos_to_vi = {pos + 1: vi for vi, (pos, _, _) in enumerate(variants)}

    called = 0
    correct = 0
    total = 0
    for r in reader:
        vi = pos_to_vi[r.pos]
        for si, s in enumerate(r.samples):
            total += 1
            gt = s["GT"]
            if "." in gt:
                continue
            called += 1
            a = tuple(sorted(int(x) for x in gt.split("/")))
            if a == truth[si][vi]:
                correct += 1

    call_rate = called / total
    concordance = correct / max(called, 1)
    print(f"call rate {call_rate:.3f}, concordance {concordance:.3f}")
    # with 15x coverage and ~60 informative kmers per allele these should be
    # high; subsampling no-calls keep the call rate below 1
    assert call_rate > 0.7, (call_rate, concordance)
    assert concordance > 0.95, (call_rate, concordance)


def test_determinism_same_seed(tmp_path, pipeline_result):
    """Fixed seed => byte-identical output VCF (the reference's determinism
    oracle, README v1.5 'Seeding and threading'; ours extends to any chip
    count via counter-based PRNG)."""
    genome, variants, samples, truth, out_path, summary, unit = pipeline_result
    from bayestyper_tpu.io.samples import ChromosomePloidy

    ploidy = ChromosomePloidy.human_default()
    opts = GenotypeOptions(num_chains=3, burn_in=20, num_samples=40,
                           random_seed=99)
    p1 = str(tmp_path / "d1.vcf")
    p2 = str(tmp_path / "d2.vcf")
    genotype_unit(unit, samples, genome, ploidy, p1, opts)
    genotype_unit(unit, samples, genome, ploidy, p2, opts)
    assert open(p1).read() == open(p2).read()


def test_parameter_dumps_written_and_consumable(pipeline_result):
    """genotype must write <prefix>_genomic_parameters.txt
    (CountDistribution.cpp:70-133) and <prefix>_noise_parameters.txt
    (InferenceEngine.cpp:157-266), and `filter --kmer-coverage-file` must be
    able to consume the genomic dump end-to-end."""
    import os

    genome, variants, samples, truth, out_path, summary, _ = pipeline_result
    prefix = out_path[: -len(".vcf")]
    gp = prefix + "_genomic_parameters.txt"
    np_file = prefix + "_noise_parameters.txt"
    assert os.path.exists(gp) and os.path.exists(np_file)

    lines = open(gp).read().splitlines()
    assert lines[0] == "Sample\tMean\tVariance"
    assert len(lines) == 1 + len(samples)
    for line, s in zip(lines[1:], samples):
        name, mean, var = line.split("\t")
        assert name == s.name
        assert 5.0 < float(mean) < 40.0

    nlines = open(np_file).read().splitlines()
    assert nlines[0].split("\t") == ["Chain", "Iteration"] + [
        s.name for s in samples
    ]
    # 6 chains x (1 init + 140 iterations) + final mean row
    assert len(nlines) == 1 + 6 * 141 + 1
    assert nlines[-1].startswith("0\t0\t")

    # filter consumes the genomic parameters file
    from bayestyper_tpu.tools.filter_tool import filter_vcf

    filtered = out_path + ".filtered.vcf"
    filter_vcf(out_path, filtered, kmer_coverage_file=gp)
    assert os.path.exists(filtered)
    rows = open(filtered).read().count("\n")
    assert rows > len(variants)  # header + variant rows


def test_ref_reconstituted_from_genome(pipeline_result):
    """Written REF columns must be the literal genome substring at the
    variant position (GenotypeWriter.cpp:477)."""
    genome, variants, samples, truth, out_path, summary, _ = pipeline_result
    for vv in VcfReader(out_path, parse_samples=False):
        seq = genome[vv.chrom]
        want = seq[vv.pos - 1 : vv.pos - 1 + len(vv.ref)].decode()
        assert vv.ref == want, (vv.chrom, vv.pos, vv.ref, want)
