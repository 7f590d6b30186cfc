"""Unit tests for the count-model numerics against scipy ground truth."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy import stats as sps

from bayestyper_tpu.ops.distributions import (
    build_count_log_prob_table,
    build_genomic_log_pmf_table,
    build_noise_log_pmf_table,
    nb_log_pmf,
    nb_mean,
    nb_moments_to_parameters,
    nb_var,
    poisson_log_pmf,
)


def test_nb_moments_roundtrip():
    p, size = nb_moments_to_parameters(20.0, 30.0)
    assert np.isclose(nb_mean(p, size), 20.0, rtol=1e-5)
    assert np.isclose(nb_var(p, size), 30.0, rtol=1e-5)


def test_nb_variance_floor():
    # var < mean/0.99 triggers the floor (NegativeBinomialDistribution.cpp:66-72)
    p, size = nb_moments_to_parameters(20.0, 19.0)
    assert np.isclose(p, 0.99, rtol=1e-6)


def test_nb_log_pmf_matches_scipy():
    # device f32 path: lgamma in f32 -> ~1e-3 relative tolerance
    p, size = 0.4, 7.5
    obs = np.arange(0, 100)
    ours = np.asarray(nb_log_pmf(obs, p, size))
    ref = sps.nbinom.logpmf(obs, size, p)
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-2)


def test_nb_log_pmf_multiplicity_scaling():
    # size scaled by multiplicity (NegativeBinomialDistribution.cpp:143-147)
    p, size = 0.3, 5.0
    obs = np.arange(0, 50)
    ours = np.asarray(nb_log_pmf(obs, p, size, 3))
    ref = sps.nbinom.logpmf(obs, size * 3, p)
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-2)


def test_poisson_log_pmf_matches_scipy():
    rate = 0.37
    obs = np.arange(0, 30)
    ours = np.asarray(poisson_log_pmf(obs, rate))
    ref = sps.poisson.logpmf(obs, rate)
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=1e-4)


def test_np_tables_match_scipy_f64():
    # host f64 builder — tight tolerance (this is what production uses)
    from bayestyper_tpu.ops.distributions import np_build_count_log_prob_tables

    p, size, rate = 0.4, 7.5, 0.05
    t = np_build_count_log_prob_tables([p], [size], [rate], 32)[0]
    obs = np.arange(0, 255)
    for m in (1, 2, 5):
        ref = sps.nbinom.logpmf(obs, size * m, p)
        np.testing.assert_allclose(t[m, :255], ref, rtol=2e-6, atol=1e-6)
    np.testing.assert_allclose(
        t[0, :255], sps.poisson.logpmf(obs, rate), rtol=2e-6, atol=1e-6
    )
    # tail folds normalise each row
    for m in (0, 1, 3):
        assert np.isclose(np.exp(t[m].astype(np.float64)).sum(), 1.0, atol=1e-4)


def test_genomic_table_shape_and_tail():
    p, size = nb_moments_to_parameters(18.0, 40.0)
    table = np.asarray(build_genomic_log_pmf_table(p, size, 32))
    assert table.shape == (33, 256)
    # row 0: degenerate
    assert table[0, 0] == 0.0
    assert np.isinf(table[0, 1]) and table[0, 1] < 0
    # rows sum to 1 including the folded tail
    for m in (1, 2, 5):
        total = np.exp(table[m]).sum()
        assert np.isclose(total, 1.0, atol=1e-4), (m, total)
    # tail fold: last column >= raw pmf value
    raw = sps.nbinom.logpmf(255, size * 3, p)
    assert table[3, -1] >= raw - 1e-6


def test_noise_table_normalises():
    table = np.asarray(build_noise_log_pmf_table(0.05))
    assert table.shape == (256,)
    assert np.isclose(np.exp(table).sum(), 1.0, atol=1e-5)


def test_combined_table_dispatch():
    p, size = nb_moments_to_parameters(18.0, 40.0)
    table = np.asarray(build_count_log_prob_table(p, size, 0.05, 32))
    noise = np.asarray(build_noise_log_pmf_table(0.05))
    np.testing.assert_allclose(table[0], noise, rtol=1e-6)
    genomic = np.asarray(build_genomic_log_pmf_table(p, size, 32))
    np.testing.assert_allclose(table[1:], genomic[1:], rtol=1e-6)
