"""Edge cases: chromosome-boundary variants, duplicate positions, empty and
all-excluded inputs, N-containing regions."""

import numpy as np
import pytest

from bayestyper_tpu.engine import (
    GenotypeOptions, genotype_unit, run_cluster_phase,
)
from bayestyper_tpu.io.fasta import Genome, write_fasta
from bayestyper_tpu.io.kmc import count_kmers_from_sequences, write_kmc1
from bayestyper_tpu.io.samples import ChromosomePloidy, Sample
from bayestyper_tpu.io.vcf import VcfReader
from bayestyper_tpu.constants import GENDER_FEMALE

K = 21


def _setup(tmp_path, seq, rows, hap_patterns=None):
    genome = Genome()
    genome.names = ["chr1"]
    genome.sequences["chr1"] = seq.encode()
    write_fasta(str(tmp_path / "g.fa"), [("chr1", genome["chr1"])])
    vcf_path = str(tmp_path / "v.vcf")
    with open(vcf_path, "w") as fh:
        fh.write(f"##fileformat=VCFv4.2\n##contig=<ID=chr1,length={len(seq)}>\n")
        fh.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
        for pos1, ref, alt in rows:
            fh.write(f"chr1\t{pos1}\t.\t{ref}\t{alt}\t.\t.\t.\n")

    rng = np.random.default_rng(1)
    haps = hap_patterns or [seq, seq]
    hi, lo, mult = count_kmers_from_sequences([h.encode() for h in haps], K)
    m = mult.astype(np.float64)
    mm, vv = 15.0 * m, 30.0 * m
    cnt = rng.negative_binomial(mm * mm / (vv - mm), mm / vv)
    keep = cnt > 0
    prefix = str(tmp_path / "s0")
    write_kmc1(prefix, hi[keep], lo[keep], np.maximum(cnt[keep], 1),
               kmer_length=K)
    return genome, vcf_path, [Sample("s0", GENDER_FEMALE, prefix)]


def test_variant_near_chromosome_edges(tmp_path):
    rng = np.random.default_rng(2)
    seq = "".join(rng.choice(list("ACGT"), 600))
    # SNV at position 2 (1-based) and at the last base
    rows = [
        (2, seq[1], next(b for b in "ACGT" if b != seq[1])),
        (600, seq[599], next(b for b in "ACGT" if b != seq[599])),
    ]
    hap = list(seq)
    hap[1] = rows[0][2]
    hap[599] = rows[1][2]
    genome, vcf_path, samples = _setup(
        tmp_path, seq, rows, ["".join(hap), "".join(hap)]
    )
    ploidy = ChromosomePloidy.human_default()
    unit = run_cluster_phase(genome, samples, vcf_path, ploidy, kmer_size=K)
    assert len(unit.compiled) == 2
    out = str(tmp_path / "o.vcf")
    genotype_unit(unit, samples, genome, ploidy, out,
                  GenotypeOptions(num_chains=4, burn_in=20, num_samples=60))
    rows_out = list(VcfReader(out, parse_samples=True))
    assert len(rows_out) == 2
    # hom-alt at both edges
    for r in rows_out:
        assert r.samples[0]["GT"] in ("1/1", "./."), r.samples[0]["GT"]


def test_duplicate_position_variants(tmp_path):
    rng = np.random.default_rng(3)
    seq = "".join(rng.choice(list("ACGT"), 500))
    p = 250
    ref = seq[p - 1]
    alts = [b for b in "ACGT" if b != ref][:2]
    rows = [(p, ref, alts[0]), (p, ref, alts[1])]
    genome, vcf_path, samples = _setup(tmp_path, seq, rows)
    ploidy = ChromosomePloidy.human_default()
    unit = run_cluster_phase(genome, samples, vcf_path, ploidy, kmer_size=K)
    # both variants land in one cluster; paths cover ref + both alts
    assert len(unit.compiled) == 1
    fc = unit.compiled[0]
    assert len(fc.variants) == 2
    out = str(tmp_path / "o.vcf")
    genotype_unit(unit, samples, genome, ploidy, out,
                  GenotypeOptions(num_chains=4, burn_in=20, num_samples=60))
    rows_out = list(VcfReader(out, parse_samples=True))
    assert len(rows_out) == 2


def test_all_excluded_variants(tmp_path):
    rng = np.random.default_rng(4)
    seq = "".join(rng.choice(list("ACGT"), 500))
    # ref mismatch + unknown chromosome: everything excluded
    genome = Genome()
    genome.names = ["chr1"]
    genome.sequences["chr1"] = seq.encode()
    vcf_path = str(tmp_path / "v.vcf")
    with open(vcf_path, "w") as fh:
        fh.write("##fileformat=VCFv4.2\n##contig=<ID=chr1,length=500>\n")
        fh.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
        wrong = "A" if seq[99] != "A" else "C"
        fh.write(f"chr1\t100\t.\t{wrong}\tG\t.\t.\t.\n")
        fh.write("chrUnknown\t10\t.\tA\tC\t.\t.\t.\n")
    prefix = str(tmp_path / "s0")
    hi, lo, cnt = count_kmers_from_sequences([seq.encode()], K)
    write_kmc1(prefix, hi, lo, cnt, kmer_length=K)
    samples = [Sample("s0", GENDER_FEMALE, prefix)]
    ploidy = ChromosomePloidy.human_default()
    unit = run_cluster_phase(genome, samples, vcf_path, ploidy, kmer_size=K)
    assert len(unit.compiled) == 0
    assert unit.exclusion_stats.get("reference allele mismatch") == 1
    assert unit.exclusion_stats.get("chromosome absent from genome") == 1


def test_n_region_variant(tmp_path):
    rng = np.random.default_rng(5)
    seq = "".join(rng.choice(list("ACGT"), 500))
    seq = seq[:240] + "N" * 10 + seq[250:]
    p = 300
    ref = seq[p - 1]
    alt = next(b for b in "ACGT" if b != ref)
    hap = seq[: p - 1] + alt + seq[p:]
    genome, vcf_path, samples = _setup(
        tmp_path, seq, [(p, ref, alt)], [hap, hap]
    )
    ploidy = ChromosomePloidy.human_default()
    unit = run_cluster_phase(genome, samples, vcf_path, ploidy, kmer_size=K)
    assert len(unit.compiled) == 1
    # kmers overlapping the N run were excluded from the path
    out = str(tmp_path / "o.vcf")
    genotype_unit(unit, samples, genome, ploidy, out,
                  GenotypeOptions(num_chains=4, burn_in=20, num_samples=60))
    r = list(VcfReader(out, parse_samples=True))[0]
    assert r.samples[0]["GT"] in ("1/1", "./.")


@pytest.mark.parametrize("copies,expect_excluded", [(200, True), (30, False)])
def test_max_multiplicity_exclusion(tmp_path, copies, expect_excluded):
    """Kmers whose genome occurrence count plus path multiplicity overflows
    127 must be excluded (has_max_multiplicity, KmerCounts.cpp:153-158) —
    an SNV inside a unit repeated 200x keeps only its alt-allele kmers."""
    rng = np.random.default_rng(31)
    unit_seq = "".join(rng.choice(list("ACGT"), 60))
    u1 = "".join(rng.choice(list("ACGT"), 300))
    u2 = "".join(rng.choice(list("ACGT"), 300))
    seq = u1 + unit_seq * copies + u2
    pos0 = 300 + (copies // 2) * 60 + 10  # 0-based SNV inside one copy
    ref = seq[pos0]
    alt = next(b for b in "ACGT" if b != ref)
    rows = [(pos0 + 1, ref, alt)]
    genome, vcf_path, samples = _setup(tmp_path, seq, rows)
    ploidy = ChromosomePloidy.human_default()
    unit = run_cluster_phase(genome, samples, vcf_path, ploidy, kmer_size=K)
    assert len(unit.compiled) == 1
    fc = unit.compiled[0]
    if expect_excluded:
        # the ref-path kmers recur ~200x in intercluster regions -> dropped
        assert fc.num_excluded > 0
        # alt-crossing kmers are unique and must survive
        assert len(fc.kmer_hi) > 0
    else:
        assert fc.num_excluded == 0


def test_intercluster_regions_respect_cnv_extension():
    """Intercluster (parameter-kmer) regions must start past a cluster's
    CNV-extended influence end, not its reference end — the reference tracks
    the extended region (VariantFileParser.cpp:173-183,493)."""
    from bayestyper_tpu.graph.clustering import (
        VariantCluster, intercluster_regions,
    )
    from bayestyper_tpu.graph.variants import NormalizedVariant

    genome = Genome()
    genome.names = ["chr1"]
    genome.sequences["chr1"] = b"A" * 5000

    v = NormalizedVariant(
        chrom="chr1", pos=1000, ids=["."], ref="A" * 50,
        alts=["A" * 120], has_dependency=False, cnv_extension=300,
    )
    cl = VariantCluster(chrom="chr1", variants=[v])
    regions = intercluster_regions(genome, {"chr1": [cl]}, kmer_size=K)
    for chrom, start, end in regions:
        # no region may overlap [cluster end, influence end + k - 1)
        assert end <= cl.start - (K - 1) or start >= cl.influence_end + (K - 1)
    assert any(start >= cl.influence_end + (K - 1) for _, start, _ in regions)
