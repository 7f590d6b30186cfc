"""Device-mesh sharding of cluster buckets.

The reference scales by threads within a node and inference-unit files
across nodes (SURVEY §2.5). The TPU-native equivalents:

  * data-parallel clusters over chips: buckets are sharded on the cluster
    axis with jax.sharding; the Gibbs kernel is embarrassingly parallel per
    cluster so XLA inserts no collectives, and counter-based per-cluster-id
    PRNG keys make results identical for any chip count (replacing the
    reference's thread-count-independent seed arithmetic,
    InferenceEngine.cpp:70,294).
  * noise estimation couples all clusters each iteration through the noise
    rate; the sufficient statistics are merged with psum over the mesh
    (replacing the mutex-merged CountAllocation, InferenceEngine.cpp:96-98)
    inside a shard_map so the chain stays one compiled program.
  * units over hosts stay the file-level protocol (bcftools-concat style
    merge), as in the reference (README "Computational requirements").
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..model.buckets import ClusterBucket


def make_mesh(num_devices: int | None = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.array(devices), (axis,))


def shard_bucket(bucket: ClusterBucket, mesh: Mesh, axis: str = "data"):
    """Place every bucket array sharded on the cluster axis. The bucket's
    cluster count must divide evenly (callers pad buckets to the mesh size)."""
    spec = NamedSharding(mesh, P(axis))
    return ClusterBucket(
        **{
            f.name: jax.device_put(getattr(bucket, f.name), spec)
            for f in dataclasses.fields(ClusterBucket)
        }
    )


def genotype_bucket_sharded(key, bucket, tables, outcomes, cfg, mesh,
                            axis: str = "data"):
    """Cluster-data-parallel genotyping: same program as genotype_bucket,
    partitioned by XLA over the sharded cluster axis (no collectives)."""
    from ..model.gibbs import genotype_bucket

    sharded = shard_bucket(bucket, mesh, axis)
    rep = NamedSharding(mesh, P())
    tables = jax.device_put(tables, rep)
    return genotype_bucket(key, sharded, tables, outcomes, cfg)


def noise_chain_sharded(key, bucket, tables, init_rates, noise_prior,
                        outcomes, cfg, chain_idx, mesh, axis: str = "data"):
    """Noise-estimation chain with psum-merged sufficient statistics.

    Runs the full chain as one shard_map program over the mesh: each device
    owns a cluster shard, every Gibbs iteration ends in a psum of
    (num_observations, count_sum) and a replicated gamma rate draw (same key
    on all devices -> identical rates without broadcast).
    """
    from ..model.gibbs import noise_chain

    def shard_fn(bucket_shard, tables_r, init_rates_r):
        return noise_chain(
            key, bucket_shard, tables_r, init_rates_r, noise_prior,
            outcomes, cfg, chain_idx, axis_name=axis,
        )

    fn = jax.jit(
        jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P(axis), P(), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
    )
    return fn(bucket, tables, init_rates)
