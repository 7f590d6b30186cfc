"""MAC sibling fold: for within-group shared (multicluster) k-mers the MAC
denominator must include the SIBLING clusters' current sampled contributions
(updateKmerStatsCache, VariantClusterHaplotypes.cpp:302-333) — the last
stats deviation from the reference (PARITY r4).

Construction: two H=2 sibling clusters, one sample, overwhelming evidence
for (alt, alt) in both. One shared alt-crossing k-mer with count ~ 4x the
haploid coverage (2 copies from each cluster). With the fold the k-mer's
MAC value is count/(own 2 + sibling 2) = count/4; without it count/2 —
a 2x difference the test pins on both sides."""

import numpy as np

import jax
import jax.numpy as jnp

from bayestyper_tpu.model.buckets import build_bucket
from bayestyper_tpu.model.gibbs import (
    GibbsConfig,
    genotype_nested,
    make_outcome_space,
)
from bayestyper_tpu.model.stats import FilterConfig, collect_bucket_stats
from bayestyper_tpu.ops.distributions import np_build_count_log_prob_tables

S = 1
COV = 25.0  # per-haplotype coverage
K_PAD = 4


def _setup():
    # per cluster: k0 private alt-crossing, k1 shared alt-crossing
    mult = np.zeros((2, 2), np.uint8)
    mult[0, 1] = 1
    mult[1, 1] = 1
    counts = np.array([[50], [100]], np.uint8)  # shared k-mer sees 4 copies

    buckets, shared_infos = [], []
    for ci in range(2):
        bucket = build_bucket([dict(
            mult=mult,
            inter_mult=np.zeros((2, S), np.uint8),
            counts=counts,
            ploidy=np.full(S, 2, np.int8),
            hap_allele=np.arange(2, dtype=np.int16)[:, None],
            num_alleles=np.array([2], np.int16),
            member=np.ones((2, 1, 2), bool) * (mult > 0)[:, None, :],
            cover=[1],
            cluster_id=40 + ci,
        )], (1, K_PAD, 2, 1), S).device_arrays()
        buckets.append(bucket)
        sh_idx = np.array([[1]], np.int32)
        sh_slot = np.array([[0]], np.int32)
        sh_valid = np.array([[True]])
        sh_mask = np.zeros((1, K_PAD), bool)
        sh_mask[0, 1] = True
        shared_infos.append(dict(
            sh_idx=jnp.asarray(sh_idx), sh_slot=jnp.asarray(sh_slot),
            sh_valid=jnp.asarray(sh_valid), sh_mask=jnp.asarray(sh_mask),
        ))

    p = COV / 60.0
    size = COV * COV / (60.0 - COV)
    tables = jnp.asarray(np_build_count_log_prob_tables(
        np.full(S, p), np.full(S, size), np.full(S, 1e-3),
        max_multiplicity=16,
    ).astype(np.float32))

    outcomes = make_outcome_space(2)
    cfg = GibbsConfig(num_chains=8, burn_in=50, num_samples=150,
                      kmer_subsampling_rate=1.0, max_total_mult=16)
    parent_levels = [jnp.full(1, -1, jnp.int32)] * 2
    parent_rows = [jnp.zeros(1, jnp.int32)] * 2
    retain_tables = [jnp.zeros((1, outcomes.num_outcomes), jnp.int8)] * 2
    return (buckets, parent_levels, parent_rows, retain_tables,
            shared_infos, tables, outcomes, cfg)


def test_mac_includes_sibling_pool():
    (buckets, pl, pr, rt, sh, tables, outcomes, cfg) = _setup()
    tallies, ws, mac_extras = genotype_nested(
        jax.random.PRNGKey(4), tuple(buckets), tuple(pl), tuple(pr),
        tuple(rt), tuple(sh), tables, (outcomes, outcomes), (cfg, cfg),
        num_pool=1, acaps=(2, 2),
    )
    assert mac_extras[0] is not None and mac_extras[1] is not None

    filters = FilterConfig.from_model(np.full(S, 2 * COV), 0.99, 1.0)
    for ci in range(2):
        # exact (T = O) enumeration, correction folded in
        stats = collect_bucket_stats(
            buckets[ci], outcomes, tallies[ci], ws[ci], filters,
            allele_capacity=2, mac_top_t=outcomes.num_outcomes,
            mac_extra=mac_extras[ci],
        )
        gt = np.asarray(stats.gt)[0, 0, 0]
        assert tuple(gt) == (1, 1), gt
        mac_alt = float(np.asarray(stats.mac)[0, 0, 0, 1])
        # with the sibling fold: (50/2 + 100/4)/2 = 25
        assert abs(mac_alt - 25.0) < 2.0, mac_alt

        # without the fold the shared k-mer scores at own multiplicity:
        # (50/2 + 100/2)/2 = 37.5 — the deviation being closed
        stats_nf = collect_bucket_stats(
            buckets[ci], outcomes, tallies[ci], ws[ci], filters,
            allele_capacity=2, mac_top_t=outcomes.num_outcomes,
        )
        mac_nf = float(np.asarray(stats_nf.mac)[0, 0, 0, 1])
        assert abs(mac_nf - 37.5) < 2.0, mac_nf
