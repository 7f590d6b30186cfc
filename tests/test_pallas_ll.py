"""Pallas likelihood kernel vs the XLA reference path (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bayestyper_tpu.ops.pallas_ll import expand_tables, pallas_log_likelihoods


def _reference_ll(counts, inter, mult_ext, w, tables, oa, ob):
    """Direct numpy evaluation of the LL definition."""
    c, k, s = counts.shape
    ch = w.shape[1]
    o = len(oa)
    t = np.asarray(tables)
    rows = t.shape[1]
    out = np.zeros((c, ch, s, o), np.float64)
    for ci in range(c):
        dm = mult_ext[ci][:, oa] + mult_ext[ci][:, ob]  # [K, O]
        for si in range(s):
            m_tot = np.minimum(dm + inter[ci, :, si][:, None], rows - 1)
            vals = t[si][m_tot, counts[ci, :, si][:, None]]  # [K, O]
            for chi in range(ch):
                out[ci, chi, si] = (w[ci, chi][:, None] * vals).sum(axis=0)
    return out


def test_pallas_ll_matches_reference():
    rng = np.random.default_rng(0)
    c, k, s, ch, h = 3, 64, 2, 2, 4
    counts = rng.integers(0, 40, (c, k, s)).astype(np.int32)
    inter = rng.integers(0, 2, (c, k, s)).astype(np.int32)
    mult = rng.integers(0, 3, (c, k, h)).astype(np.int32)
    mult_ext = np.concatenate([mult, np.zeros((c, k, 1), np.int32)], axis=2)
    w = (rng.random((c, ch, k)) < 0.5).astype(np.float32)

    num_mult = 8
    tables = rng.normal(size=(s, 16, 256)).astype(np.float32)

    # outcome space over h=4 + sentinel, padded to 128
    ii, jj = np.triu_indices(h)
    oa = np.concatenate([ii, np.arange(h), [h]]).astype(np.int32)
    ob = np.concatenate([jj, np.full(h, h), [h]]).astype(np.int32)
    o_real = len(oa)
    pad = 128 - o_real
    oa_p = np.concatenate([oa, np.full(pad, h, np.int32)])
    ob_p = np.concatenate([ob, np.full(pad, h, np.int32)])

    inter_span = 2
    texp = expand_tables(tables, num_mult, inter_span)

    ll = pallas_log_likelihoods(
        jnp.asarray(counts), jnp.asarray(inter), jnp.asarray(mult_ext),
        jnp.asarray(w), jnp.asarray(texp), jnp.asarray(oa_p),
        jnp.asarray(ob_p), num_mult, interpret=True,
    )
    ll = np.asarray(ll)[:, :, :, :o_real]

    # reference restricted to dip_mult < num_mult (the kernel covers classes
    # 0..num_mult-1; engine picks num_mult >= max dip_mult + 1)
    ref = _reference_ll(counts, inter, mult_ext, w, tables, oa, ob)
    np.testing.assert_allclose(ll, ref, rtol=1e-5, atol=1e-4)
