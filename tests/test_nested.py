"""Overlapping/contained variants: deletions spanning interior SNVs.

Two regimes, both matching the reference:
  * a contained variant within k of the outer cluster's flanks is merged
    into the SAME cluster (flank-map adjacency) — deletion paths give it the
    `*` missing allele directly;
  * a contained variant >= k from every flank forms a NESTED cluster of the
    same group (getVariantClusterGroupDependencies) genotyped conditionally
    on the parent's sampled outcome with ploidy demotion
    (VariantClusterGroup.cpp:236-250): a deletion copy spanning the child
    demotes one child copy, and the demoted slot maps to the `*` allele.
"""

import numpy as np
import pytest

from bayestyper_tpu.engine import (
    GenotypeOptions, genotype_unit, run_cluster_phase,
)
from bayestyper_tpu.io.fasta import Genome, write_fasta
from bayestyper_tpu.io.kmc import write_kmc1, count_kmers_from_sequences
from bayestyper_tpu.io.samples import ChromosomePloidy, Sample
from bayestyper_tpu.io.vcf import VcfReader
from bayestyper_tpu.constants import GENDER_FEMALE

K = 21


def test_deletion_spanning_snv(tmp_path):
    rng = np.random.default_rng(5)
    seq = "".join(rng.choice(list("ACGT"), 4000))
    genome = Genome()
    genome.names = ["chr1"]
    genome.sequences["chr1"] = seq.encode()

    # deletion at pos 2000 removing 60 bases; SNV at pos 2030 (inside)
    del_pos, del_len, snv_pos = 2000, 60, 2030
    del_ref = seq[del_pos : del_pos + del_len + 1]
    del_alt = seq[del_pos]
    snv_ref = seq[snv_pos]
    snv_alt = next(b for b in "ACGT" if b != snv_ref)

    genome_path = str(tmp_path / "genome.fa")
    write_fasta(genome_path, [("chr1", genome["chr1"])])
    vcf_path = str(tmp_path / "vars.vcf")
    with open(vcf_path, "w") as fh:
        fh.write("##fileformat=VCFv4.2\n##contig=<ID=chr1,length=4000>\n")
        fh.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
        fh.write(f"chr1\t{del_pos + 1}\t.\t{del_ref}\t{del_alt}\t.\t.\t.\n")
        fh.write(f"chr1\t{snv_pos + 1}\t.\t{snv_ref}\t{snv_alt}\t.\t.\t.\n")

    # sample: heterozygous deletion / SNV-alt on the non-deleted haplotype
    h1 = seq[: del_pos + 1] + seq[del_pos + del_len + 1 :]  # deletion hap
    h2 = seq[:snv_pos] + snv_alt + seq[snv_pos + 1 :]       # SNV hap
    counts = {}
    mean = 15.0
    hi, lo, mult = count_kmers_from_sequences(
        [h1.encode(), h2.encode()], K
    )
    m = mult.astype(np.float64)
    mm, vv = mean * m, 2 * mean * m
    cnt = rng.negative_binomial(mm * mm / (vv - mm), mm / vv)
    keep = cnt > 0
    prefix = str(tmp_path / "s0")
    write_kmc1(prefix, hi[keep], lo[keep], cnt[keep], kmer_length=K)
    samples = [Sample("s0", GENDER_FEMALE, prefix)]

    ploidy = ChromosomePloidy.human_default()
    unit = run_cluster_phase(genome, samples, vcf_path, ploidy, kmer_size=K)

    # the SNV sits >= k inside the deletion span: a NESTED cluster of the
    # same group, conditionally genotyped with ploidy demotion
    assert len(unit.compiled) == 2
    parent = next(fc for fc in unit.compiled if fc.parent_id < 0)
    child = next(fc for fc in unit.compiled if fc.parent_id >= 0)
    assert child.parent_id == parent.cluster_id
    assert parent.group_size == 2 and child.group_size == 2
    assert child.depth == 1
    snv = child.variants[0]
    assert snv.has_dependency
    assert snv.num_alleles == 3  # ref, alt, missing(*)
    # parent haplotypes: the ref route retains the child, the deletion does not
    assert parent.retains.shape[1] == 1
    assert parent.retains.any() and not parent.retains.all()

    out = str(tmp_path / "out.vcf")
    opts = GenotypeOptions(num_chains=6, burn_in=40, num_samples=100,
                           random_seed=3)
    genotype_unit(unit, samples, genome, ploidy, out, opts)

    reader = VcfReader(out, parse_samples=True)
    rows = {r.pos: r for r in reader}
    del_row = rows[del_pos + 1]
    snv_row = rows[snv_pos + 1]

    # group INFO fields reflect the real 2-cluster group
    assert del_row.info.get("VCGS") == "2"
    assert snv_row.info.get("VCGS") == "2"

    # deletion: heterozygous
    assert del_row.samples[0]["GT"] == "0/1", del_row.samples[0]
    # SNV row carries the * allele and the call pairs the alt with missing
    assert snv_row.alts[-1] == "*"
    gt = snv_row.samples[0]["GT"]
    assert set(gt.split("/")) == {"1", "2"}, gt  # alt + missing(*)


def test_large_sv_genotyping(tmp_path):
    """A 300 bp deletion and a 150 bp insertion (small-SV scale,
    BASELINE configs[1]) genotyped end-to-end."""
    rng = np.random.default_rng(17)
    seq = "".join(rng.choice(list("ACGT"), 8000))
    genome = Genome()
    genome.names = ["chr1"]
    genome.sequences["chr1"] = seq.encode()

    del_pos, del_len = 2000, 300
    ins_pos = 5000
    ins_seq = "".join(rng.choice(list("ACGT"), 150))
    del_ref = seq[del_pos : del_pos + del_len + 1]
    variants = [
        (del_pos, del_ref, seq[del_pos]),
        (ins_pos, seq[ins_pos], seq[ins_pos] + ins_seq),
    ]

    write_fasta(str(tmp_path / "g.fa"), [("chr1", genome["chr1"])])
    vcf_path = str(tmp_path / "v.vcf")
    with open(vcf_path, "w") as fh:
        fh.write("##fileformat=VCFv4.2\n##contig=<ID=chr1,length=8000>\n")
        fh.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
        for p, r, a in variants:
            fh.write(f"chr1\t{p + 1}\t.\t{r}\t{a}\t.\t.\t.\n")

    # het deletion, hom insertion
    # apply insertion to both haps (hom); deletion only to h1 (het)
    def apply(s, dele, ins):
        out = s
        if ins:
            # insertion applies at ins_pos of the ORIGINAL coordinates; for
            # h1 the deletion upstream shifts it by -del_len
            shift = -del_len if dele else 0
            p = ins_pos + shift
            out = out[: p + 1] + ins_seq + out[p + 1 :]
        return out

    h1 = apply(seq[: del_pos + 1] + seq[del_pos + del_len + 1 :], True, True)
    h2 = apply(seq, False, True)
    mean = 15.0
    hi, lo, mult = count_kmers_from_sequences([h1.encode(), h2.encode()], K)
    m = mult.astype(np.float64)
    mm, vv = mean * m, 2 * mean * m
    cnt = rng.negative_binomial(mm * mm / (vv - mm), mm / vv)
    keep = cnt > 0
    prefix = str(tmp_path / "s0")
    write_kmc1(prefix, hi[keep], lo[keep], cnt[keep], kmer_length=K)
    samples = [Sample("s0", GENDER_FEMALE, prefix)]

    ploidy = ChromosomePloidy.human_default()
    unit = run_cluster_phase(genome, samples, vcf_path, ploidy, kmer_size=K)
    out = str(tmp_path / "out.vcf")
    opts = GenotypeOptions(num_chains=6, burn_in=40, num_samples=100,
                           random_seed=7)
    genotype_unit(unit, samples, genome, ploidy, out, opts)

    reader = VcfReader(out, parse_samples=True)
    rows = {r.pos: r for r in reader}
    assert rows[del_pos + 1].samples[0]["GT"] == "0/1"
    assert rows[ins_pos + 1].samples[0]["GT"] == "1/1"


def test_dense_containment_64_snvs(tmp_path):
    """A ~2.8 kb deletion spanning 64 phased SNVs (each >= k from every
    flank): flattening would need 2^64 joint paths and a beam would drop true
    haplotypes; the nested-group path enumerates 64 independent child
    clusters sampled conditionally on the deletion outcome — every call must
    be exact (VERDICT round-1 item 1 acceptance criterion)."""
    rng = np.random.default_rng(77)
    seq = "".join(rng.choice(list("ACGT"), 8000))
    genome = Genome()
    genome.names = ["chr1"]
    genome.sequences["chr1"] = seq.encode()

    n_snv, spacing = 64, 42
    del_pos = 2000
    first_snv = 2100
    snv_pos = [first_snv + i * spacing for i in range(n_snv)]
    del_end = snv_pos[-1] + 150            # deletion covers all SNVs
    del_ref = seq[del_pos : del_end + 1]
    del_alt = seq[del_pos]

    snv_alts = {}
    for p in snv_pos:
        snv_alts[p] = next(b for b in "ACGT" if b != seq[p])

    write_fasta(str(tmp_path / "g.fa"), [("chr1", genome["chr1"])])
    vcf_path = str(tmp_path / "v.vcf")
    with open(vcf_path, "w") as fh:
        fh.write("##fileformat=VCFv4.2\n##contig=<ID=chr1,length=8000>\n")
        fh.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
        fh.write(f"chr1\t{del_pos + 1}\t.\t{del_ref}\t{del_alt}\t.\t.\t.\n")
        for p in snv_pos:
            fh.write(f"chr1\t{p + 1}\t.\t{seq[p]}\t{snv_alts[p]}\t.\t.\t.\n")

    h_del = seq[: del_pos + 1] + seq[del_end + 1 :]
    hs = list(seq)
    for p in snv_pos:
        hs[p] = snv_alts[p]
    h_snv = "".join(hs)

    # sample0: het deletion + all-alt SNVs on the retained copy
    # sample1: het SNV haplotype vs reference (no deletion)
    sample_haps = [
        [h_del.encode(), h_snv.encode()],
        [h_snv.encode(), seq.encode()],
    ]
    samples = []
    for si, haps in enumerate(sample_haps):
        hi, lo, mult = count_kmers_from_sequences(haps, K)
        m = mult.astype(np.float64)
        mm, vv = 15.0 * m, 30.0 * m
        cnt = rng.negative_binomial(mm * mm / (vv - mm), mm / vv)
        keep = cnt > 0
        prefix = str(tmp_path / f"s{si}")
        write_kmc1(prefix, hi[keep], lo[keep], cnt[keep], kmer_length=K)
        samples.append(Sample(f"s{si}", GENDER_FEMALE, prefix))

    ploidy = ChromosomePloidy.human_default()
    unit = run_cluster_phase(genome, samples, vcf_path, ploidy, kmer_size=K)

    # structure: 1 parent + 64 children in one group
    assert len(unit.compiled) == n_snv + 1
    parents = [fc for fc in unit.compiled if fc.parent_id < 0]
    children = [fc for fc in unit.compiled if fc.parent_id >= 0]
    assert len(parents) == 1 and len(children) == n_snv
    assert all(fc.group_size == n_snv + 1 for fc in unit.compiled)

    out = str(tmp_path / "out.vcf")
    opts = GenotypeOptions(num_chains=6, burn_in=40, num_samples=100,
                           kmer_subsampling_rate=1.0, random_seed=9)
    genotype_unit(unit, samples, genome, ploidy, out, opts)

    rows = {r.pos: r for r in VcfReader(out, parse_samples=True)}
    del_row = rows[del_pos + 1]
    assert del_row.samples[0]["GT"] == "0/1", del_row.samples[0]
    assert del_row.samples[1]["GT"] == "0/0", del_row.samples[1]

    bad = []
    for p in snv_pos:
        r = rows[p + 1]
        gt0 = set(r.samples[0]["GT"].split("/"))
        gt1 = set(r.samples[1]["GT"].split("/"))
        if gt0 != {"1", "2"}:     # alt + missing(*) on the demoted copy
            bad.append((p, 0, r.samples[0]["GT"]))
        if gt1 != {"0", "1"}:     # plain het, no demotion
            bad.append((p, 1, r.samples[1]["GT"]))
    assert not bad, bad[:10]
