"""Statistical tests for the device-side samplers."""

import numpy as np
import jax
import jax.numpy as jnp

from bayestyper_tpu.ops.sampling import (
    NEG_INF,
    dirichlet_from_counts,
    log_categorical,
    sample_sparse_frequencies,
)


def test_log_categorical_distribution():
    logp = jnp.log(jnp.array([0.1, 0.2, 0.3, 0.4]))
    keys = jax.random.split(jax.random.PRNGKey(0), 20000)
    draws = jax.vmap(lambda k: log_categorical(k, logp))(keys)
    freqs = np.bincount(np.asarray(draws), minlength=4) / 20000
    np.testing.assert_allclose(freqs, [0.1, 0.2, 0.3, 0.4], atol=0.02)


def test_log_categorical_masking():
    logp = jnp.array([0.0, NEG_INF, 0.0, NEG_INF])
    keys = jax.random.split(jax.random.PRNGKey(1), 500)
    draws = np.asarray(jax.vmap(lambda k: log_categorical(k, logp))(keys))
    assert set(draws.tolist()) <= {0, 2}


def test_dirichlet_from_counts_moments():
    counts = jnp.array([5, 0, 10, 3])
    valid = jnp.array([True, True, True, True])
    keys = jax.random.split(jax.random.PRNGKey(2), 5000)
    draws = jax.vmap(lambda k: dirichlet_from_counts(k, counts, valid))(keys)
    mean = np.asarray(draws).mean(axis=0)
    expected = (np.array([5, 0, 10, 3]) + 1) / (18 + 4)
    np.testing.assert_allclose(mean, expected, atol=0.02)


def test_dirichlet_respects_validity():
    counts = jnp.array([5, 0, 10, 3])
    valid = jnp.array([True, True, True, False])
    f = dirichlet_from_counts(jax.random.PRNGKey(3), counts, valid)
    assert f[3] == 0.0
    assert np.isclose(np.asarray(f).sum(), 1.0, atol=1e-5)


def test_sparse_frequencies_keeps_observed_active():
    counts = jnp.array([3, 0, 2, 0, 0, 0, 0, 0])
    valid = jnp.ones(8, bool)
    keys = jax.random.split(jax.random.PRNGKey(4), 2000)
    draws = jax.vmap(
        lambda k: sample_sparse_frequencies(k, counts, valid, 0.25)
    )(keys)
    d = np.asarray(draws)
    # observed haplotypes always active
    assert (d[:, 0] > 0).all() and (d[:, 2] > 0).all()
    # simplex
    np.testing.assert_allclose(d.sum(axis=1), 1.0, atol=1e-5)
    # with low sparsity, zero-count haplotypes rarely activated
    activation = (d[:, [1, 3, 4, 5, 6, 7]] > 0).mean()
    assert activation < 0.5


def test_sparse_frequencies_respects_padding():
    counts = jnp.array([3, 0, 2, 0, 0, 0, 0, 0])
    valid = jnp.array([True, True, True, True, False, False, False, False])
    keys = jax.random.split(jax.random.PRNGKey(5), 500)
    draws = np.asarray(
        jax.vmap(lambda k: sample_sparse_frequencies(k, counts, valid, 0.9))(keys)
    )
    assert (draws[:, 4:] == 0).all()


def test_sparse_size_distribution_sanity():
    # With sparsity near 1 almost all valid haplotypes should activate.
    counts = jnp.array([1, 0, 0, 0, 0, 0, 0, 0])
    valid = jnp.ones(8, bool)
    keys = jax.random.split(jax.random.PRNGKey(6), 1000)
    draws = np.asarray(
        jax.vmap(
            lambda k: sample_sparse_frequencies(k, counts, valid, 0.999)
        )(keys)
    )
    mean_active = (draws > 0).sum(axis=1).mean()
    assert mean_active > 6.5, mean_active


def test_fixed_round_gamma_moments():
    from bayestyper_tpu.ops.sampling import fixed_round_gamma

    for alpha in (0.5, 1.0, 3.0, 17.5):
        keys = jax.random.split(jax.random.PRNGKey(int(alpha * 10)), 4000)
        draws = np.asarray(
            jax.vmap(lambda k: fixed_round_gamma(k, jnp.full((4,), alpha)))(keys)
        ).ravel()
        assert np.all(draws > 0)
        np.testing.assert_allclose(draws.mean(), alpha, rtol=0.05)
        np.testing.assert_allclose(draws.var(), alpha, rtol=0.12)
