"""Packed stats fetch: the transfer-compact PackedBucketStats path must
reproduce the f32 BucketStats path exactly on the bit-compatibility surface
(GT / GPP / GQ / APP / SAF — getGenotypeSampleStats,
VariantClusterGenotyper.cpp:249-468) and within f16 rounding on the
print-only diagnostics (NAK/FAK/MAC)."""

import numpy as np

from bayestyper_tpu.model.buckets import build_bucket, stack_buckets
from bayestyper_tpu.model.gibbs import (
    GibbsConfig,
    genotype_stacked,
    make_outcome_space,
)
from bayestyper_tpu.model.stats import (
    FilterConfig,
    collect_bucket_stats_packed_stacked,
    collect_bucket_stats_stacked,
    unpack_stats_host,
)
from bayestyper_tpu.engine import _fetch_packed_stats, _fetch_stats
from bayestyper_tpu.ops.distributions import np_build_count_log_prob_tables
from tests.test_gibbs import make_snv_cluster

import jax
import jax.numpy as jnp

S = 3


def _setup(rng):
    gts = [[tuple(sorted(rng.integers(0, 2, 2))) for _ in range(S)]
           for _ in range(6)]
    cls = [
        make_snv_cluster(rng, g, num_kmers_per_allele=12, cluster_id=7 + i)
        for i, g in enumerate(gts)
    ]
    buckets = [
        build_bucket(cls[:3], (4, 32, 2, 1), S).device_arrays(),
        build_bucket(cls[3:], (4, 32, 2, 1), S).device_arrays(),
    ]
    sb = stack_buckets(buckets)
    p = np.full(S, 0.4)
    size = np.full(S, 40.0)
    tables = jnp.asarray(
        np_build_count_log_prob_tables(p, size, np.full(S, 1e-3), 255)
    )
    cfg = GibbsConfig(num_chains=3, burn_in=10, num_samples=20,
                      kmer_subsampling_rate=0.8, max_total_mult=8)
    outcomes = make_outcome_space(2)
    filters = FilterConfig.from_model(np.full(S, 20.0), 0.99, 1.0)
    key = jax.random.PRNGKey(3)
    tallies, ws = genotype_stacked(key, sb, tables, outcomes, cfg)
    return sb, outcomes, tallies, ws, filters


def test_packed_matches_unpacked():
    rng = np.random.default_rng(11)
    sb, outcomes, tallies, ws, filters = _setup(rng)

    ref = _fetch_stats(collect_bucket_stats_stacked(
        sb, outcomes, tallies, ws, filters, allele_capacity=2, mac_top_t=6
    ))
    packed = collect_bucket_stats_packed_stacked(
        sb, outcomes, tallies, ws, filters, allele_capacity=2, mac_top_t=6
    )
    host = unpack_stats_host(_fetch_packed_stats(packed, n_real=2))

    # exact surface: integer tallies divided in f32 reproduce the device
    # posteriors bit-for-bit; GT/SAF are integers
    np.testing.assert_array_equal(np.asarray(ref.gt), host.gt)
    np.testing.assert_array_equal(np.asarray(ref.saf), host.saf)
    np.testing.assert_array_equal(np.asarray(ref.gpp), host.gpp)
    np.testing.assert_array_equal(np.asarray(ref.app), host.app)
    # GQ: np.log10 vs XLA log10 may differ in the last ulp
    np.testing.assert_allclose(np.asarray(ref.gq), host.gq, rtol=1e-6)

    # f16 surface: print-only diagnostics within half-precision rounding
    for name in ("nak", "fak", "mac"):
        a = np.asarray(getattr(ref, name))
        b = getattr(host, name)
        np.testing.assert_allclose(a, b, rtol=1.5e-3, atol=1e-3)


def test_fetch_slices_padding_chunks():
    """The packed fetch drops zero-padding chunks from the transfer."""
    rng = np.random.default_rng(12)
    sb, outcomes, tallies, ws, filters = _setup(rng)
    packed = collect_bucket_stats_packed_stacked(
        sb, outcomes, tallies, ws, filters, allele_capacity=2, mac_top_t=6
    )
    one = _fetch_packed_stats(packed, n_real=1)
    both = _fetch_packed_stats(packed, n_real=2)
    assert one.gt_tally.shape[0] == 1
    np.testing.assert_array_equal(one.gt_tally[0], both.gt_tally[0])
    np.testing.assert_array_equal(one.nak[0], both.nak[0])
