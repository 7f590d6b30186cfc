"""Pallas TPU kernel: fused diplotype log-likelihood precompute.

Computes, for every (cluster, chain, sample, outcome),

    LL[c,ch,s,o] = sum_k w[c,ch,k] * T_s[dip_mult[c,k,o] + inter[c,k,s],
                                         counts[c,k,s]]

— the memoised unique-kmer diplotype log-probabilities of the reference
(calcDiplotypeLogProb, VariantClusterGenotyper.cpp:619-641) for ALL
diplotypes at once.

The XLA path (model.gibbs.compute_log_likelihoods) materialises [C, K, O]
multiplicity-class indicators in HBM once per class. This kernel keeps
everything in VMEM per (cluster, outcome-tile) grid cell:

  1. dip_mult = mult @ (onehot(oa) + onehot(ob))                  (MXU)
  2. joint (intercluster, count) one-hot OH[k, i*256+cnt] on the VPU,
     contracted with the host-expanded table
     Texp[s, i*256+cnt, m] = T_s[m+i, cnt]  ->  Q_s[k, m]         (MXU)
  3. per multiplicity class m: acc += (w * Q_s[:,m]) @ (dip_mult == m)  (MXU)

so HBM traffic is one read of the packed inputs and one write of LL.
See pallas_guide.md for the programming model.

STATUS — measured on TPU v5e (C=256, K=512, H=32, CH=20, S=3, O=561): this
kernel runs at ~3.1s/bucket while the XLA masked-matmul path
(model.gibbs.compute_log_likelihoods) runs the identical contraction in
0.2ms: the per-cluster matrices are far below MXU-efficient sizes, and XLA's
batched [C, X, K] x [C, K, O] dot_general amortises across the whole bucket
where this kernel's sequential per-cluster grid cannot. The XLA path is the
production implementation; this kernel is kept (with bit-accuracy tests vs
the definition) as the starting point for a future multi-cluster-tile
redesign, and as the template for other fused gather+contract ops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def _ll_kernel(oa_ref, ob_ref, counts_ref, inter_ref, mult_ref, w_ref,
               texp_ref, out_ref, *, num_mult, inter_span, num_chains,
               num_samples, tile_o, h_ext):
    k_dim = counts_ref.shape[1]
    o_pad = oa_ref.shape[1]
    num_tiles = o_pad // tile_o

    # diplotype multiplicities for ALL outcomes at once:
    # dm = mult @ (onehot(oa) + onehot(ob))   [K, O]
    rows = jax.lax.broadcasted_iota(jnp.int32, (h_ext, o_pad), 0)
    oh_ab = (
        (rows == oa_ref[0][None, :]).astype(jnp.float32)
        + (rows == ob_ref[0][None, :]).astype(jnp.float32)
    )
    mult = mult_ref[0].astype(jnp.float32)               # [K, H+1]
    dm = jnp.dot(mult, oh_ab, preferred_element_type=jnp.float32)  # [K, O]

    w = w_ref[0].astype(jnp.float32)                     # [CH, K]

    for s in range(num_samples):
        # per-kmer table row values for every multiplicity class:
        # Q_s[k, m] = T_s[m + inter[k,s], counts[k,s]] via one-hot matmul
        joint = inter_ref[0, :, s] * 256 + counts_ref[0, :, s]
        oh = (
            joint[:, None]
            == jax.lax.broadcasted_iota(
                jnp.int32, (k_dim, inter_span * 256), 1
            )
        ).astype(jnp.float32)
        q_s = jnp.dot(oh, texp_ref[s], preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)

        # V[k, o] = Q_s[k, clamp(dm[k,o])] — per-element select on the VPU
        v = jnp.broadcast_to(
            q_s[:, num_mult - 1][:, None], (k_dim, o_pad)
        )  # over-class clamp (same fold as the XLA path's over-mmax pass)
        for m in range(num_mult - 2, -1, -1):
            v = jnp.where(dm == float(m), q_s[:, m][:, None], v)
        v = jnp.where(dm == float(num_mult - 1),
                      q_s[:, num_mult - 1][:, None], v)

        # LL rows for this sample: one [CH, K] @ [K, O] matmul
        acc = jnp.dot(w, v, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
        out_ref[0, :, s, :] = acc


def pallas_log_likelihoods(counts, inter, mult_ext, w, texp, oa, ob,
                           num_mult, interpret=False):
    """LL [C, CH, S, O] via the fused kernel.

    Args:
      counts, inter: [C, K, S] int32 (inter clipped below texp's span)
      mult_ext: [C, K, H+1] int32 (sentinel column of zeros at H)
      w: [C, CH, K] float32
      texp: [S, inter_span*256, M] float32 (expand_tables)
      oa, ob: [O] int32, O a multiple of the 128 tile (pad with the null
        outcome; callers slice the result)
      num_mult: static number of multiplicity classes M
    """
    c, k, s = counts.shape
    ch = w.shape[1]
    o = oa.shape[0]
    h_ext = mult_ext.shape[2]
    inter_span = texp.shape[1] // 256
    tile_o = min(o, 128)
    assert o % tile_o == 0

    kernel = functools.partial(
        _ll_kernel, num_mult=num_mult, inter_span=inter_span,
        num_chains=ch, num_samples=s, tile_o=tile_o, h_ext=h_ext,
    )

    grid_spec = pl.GridSpec(
        grid=(c,),
        in_specs=[
            pl.BlockSpec((1, o), lambda i: (0, 0)),
            pl.BlockSpec((1, o), lambda i: (0, 0)),
            pl.BlockSpec((1, k, s), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, k, s), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, k, h_ext), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, ch, k), lambda i: (i, 0, 0)),
            pl.BlockSpec(
                (s, inter_span * 256, texp.shape[2]), lambda i: (0, 0, 0)
            ),
        ],
        out_specs=pl.BlockSpec((1, ch, s, o), lambda i: (i, 0, 0, 0)),
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((c, ch, s, o), jnp.float32),
        interpret=interpret,
    )(oa.reshape(1, -1), ob.reshape(1, -1), counts, inter, mult_ext, w, texp)
    return out


def expand_tables(tables, num_mult, inter_span):
    """[S, Mmax+1, 256] -> [S, inter_span*256, num_mult] expanded tables:
    Texp[s, i*256 + cnt, m] = tables[s, min(m + i, Mmax), cnt]."""
    t = np.asarray(tables)
    s, rows, _ = t.shape
    out = np.empty((s, inter_span * 256, num_mult), dtype=np.float32)
    for i in range(inter_span):
        for m in range(num_mult):
            out[:, i * 256 : (i + 1) * 256, m] = t[:, min(m + i, rows - 1), :]
    return out
