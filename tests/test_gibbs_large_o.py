"""Large-outcome-space scan paths: classes with O >= _FLAT_SO_MAX_O use the
natural [.., S, O] layout, the matmul-cumsum blocked sampler, and the
post-scan scatter tally — all of which must produce tallies IDENTICAL in
integer content to the per-bucket reference program on the same draws."""

import numpy as np

import jax
import jax.numpy as jnp

from bayestyper_tpu.model.buckets import build_bucket, stack_buckets
from bayestyper_tpu.model.gibbs import (
    _FLAT_SO_MAX_O,
    GibbsConfig,
    genotype_bucket,
    genotype_stacked,
    make_outcome_space,
)
from bayestyper_tpu.ops.distributions import np_build_count_log_prob_tables

S = 3
H = 32  # O = 32*33/2 + 32 + 1 = 561 >= _FLAT_SO_MAX_O -> large-O path


def _cluster(rng, cid):
    """H=32 multi-haplotype cluster: one variant with 32 alleles, each
    haplotype carrying a private k-mer block."""
    nk = 4
    k = H * nk
    mult = np.zeros((k, H), np.uint8)
    for h in range(H):
        mult[h * nk : (h + 1) * nk, h] = 1
    truth = [tuple(sorted(rng.integers(0, 4, 2))) for _ in range(S)]
    counts = np.zeros((k, S), np.uint8)
    for si, (a1, a2) in enumerate(truth):
        for h in (a1, a2):
            counts[h * nk : (h + 1) * nk, si] += rng.poisson(
                12.0, nk
            ).astype(np.uint8)
    member = np.zeros((k, 1, H), bool)
    member[:, 0, :] = mult > 0
    return dict(
        mult=mult,
        inter_mult=np.zeros((k, S), np.uint8),
        counts=counts,
        ploidy=np.full(S, 2, np.int8),
        hap_allele=np.arange(H, dtype=np.int16)[:, None],
        num_alleles=np.array([H], np.int16),
        member=member,
        cover=[0, 1],
        cluster_id=cid,
    )


def test_large_o_stacked_matches_bucket():
    outcomes = make_outcome_space(H)
    assert outcomes.num_outcomes >= _FLAT_SO_MAX_O

    rng = np.random.default_rng(5)
    cls = [_cluster(rng, 30 + i) for i in range(4)]
    buckets = [
        build_bucket(cls[:2], (2, 128, H, 1), S).device_arrays(),
        build_bucket(cls[2:], (2, 128, H, 1), S).device_arrays(),
    ]
    sb = stack_buckets(buckets)
    p = np.full(S, 12.0 / 30.0)
    size = np.full(S, 12.0 * 12.0 / (30.0 - 12.0))
    tables = jnp.asarray(np_build_count_log_prob_tables(
        p, size, np.full(S, 1e-3), 64
    ).astype(np.float32))
    cfg = GibbsConfig(num_chains=2, burn_in=8, num_samples=16,
                      kmer_subsampling_rate=1.0, max_total_mult=8)
    key = jax.random.PRNGKey(11)

    t_stacked, w_stacked = genotype_stacked(key, sb, tables, outcomes, cfg)
    for bi, bucket in enumerate(buckets):
        t_ref, w_ref = genotype_bucket(key, bucket, tables, outcomes, cfg)
        np.testing.assert_array_equal(
            np.asarray(t_stacked)[bi], np.asarray(t_ref)
        )
        np.testing.assert_array_equal(
            np.asarray(w_stacked)[bi], np.asarray(w_ref)
        )
        # every collected iteration lands in the tally
        assert int(np.asarray(t_ref)[bucket.cluster_valid].sum()) == (
            int(np.asarray(bucket.cluster_valid).sum())
            * cfg.num_chains * S * cfg.num_samples
        )
