"""Multi-chip scaling curve for the genotype kernel on a virtual device mesh.

VERDICT r2 item 9: attach numbers to the DCN/ICI story. Runs the SAME fixed
workload (a bucket of identical-shape clusters) through the production
sharded genotype path (`_shard_for_mesh` + `genotype_buckets_multi`, the
same code `genotype_unit` uses when >1 device is visible) on 1, 2, 4 and 8
virtual CPU devices (`xla_force_host_platform_device_count`), and records
wall times + parallel efficiency.

Virtual CPU devices share the host's cores, so wall-clock SPEEDUP here is
bounded by the physical core count (2 on this VM); the measurement instead
validates (a) sharding correctness at every width (identical tallies) and
(b) that per-device work (the only thing that matters on a real multi-chip
ICI mesh, where each shard runs on its own chip) divides as 1/N.

Usage: python benchmarks/multichip_scaling.py  (forces CPU backend)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from bayestyper_tpu.model.buckets import build_bucket
    from bayestyper_tpu.model.gibbs import (
        GibbsConfig, genotype_buckets_multi, make_outcome_space,
    )
    from bayestyper_tpu.ops.distributions import np_build_count_log_prob_tables

    rng = np.random.default_rng(0)
    C, K, H, S = 512, 128, 4, 3
    clusters = []
    for ci in range(C):
        mult = (rng.random((K, H)) < 0.4).astype(np.uint8)
        mult[:, 0] |= (mult.sum(axis=1) == 0).astype(np.uint8)
        counts = np.minimum(
            rng.poisson(12.0 * mult[:, rng.integers(H)]), 255
        ).astype(np.uint8)[:, None].repeat(S, axis=1)
        member = np.zeros((K, 1, H), bool)
        member[:, 0, :] = mult > 0
        clusters.append(dict(
            mult=mult, inter_mult=np.zeros((K, S), np.uint8), counts=counts,
            ploidy=np.full(S, 2, np.int8),
            hap_allele=np.arange(H, dtype=np.int16)[:, None],
            num_alleles=np.array([H], np.int16), member=member, cover=[],
            cluster_id=ci,
        ))
    bucket_host = build_bucket(clusters, (C, K, H, 1), S)

    p = 12.0 / 30.0
    size = 12.0 * 12.0 / (30.0 - 12.0)
    tables = jnp.asarray(np_build_count_log_prob_tables(
        np.full(S, p), np.full(S, size), np.full(S, 1e-3),
        max_multiplicity=8,
    ))
    cfg = GibbsConfig(num_chains=8, burn_in=100, num_samples=250,
                      kmer_subsampling_rate=0.1, max_total_mult=8,
                      apply_cap=False, has_inter=False)
    osp = make_outcome_space(H)
    key = jax.random.PRNGKey(1)

    results = []
    ref_tally = None
    for n_dev in (1, 2, 4, 8):
        mesh = Mesh(np.array(jax.devices()[:n_dev]), ("data",))
        shard = NamedSharding(mesh, P("data"))
        repl = NamedSharding(mesh, P())
        import dataclasses

        bucket = dataclasses.replace(
            bucket_host,
            **{f.name: jax.device_put(getattr(bucket_host, f.name), shard)
               for f in dataclasses.fields(bucket_host)},
        )
        t = jax.device_put(tables, repl)
        # compile
        tallies, _ = genotype_buckets_multi(key, (bucket,), t, (osp,), (cfg,))
        jax.block_until_ready(tallies)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            tallies, _ = genotype_buckets_multi(key, (bucket,), t, (osp,),
                                                (cfg,))
            jax.block_until_ready(tallies)
            best = min(best, time.perf_counter() - t0)
        tally = np.asarray(tallies[0])
        if ref_tally is None:
            ref_tally = tally
        else:
            assert np.array_equal(ref_tally, tally), (
                f"tallies differ at {n_dev} devices"
            )
        results.append(dict(devices=n_dev, wall_s=round(best, 3),
                            clusters_per_device=C // n_dev))
        print(f"{n_dev} devices: {best:.3f}s "
              f"({C // n_dev} clusters/device), tallies identical: yes")

    out = dict(
        metric="multichip_genotype_scaling_virtual_cpu_mesh",
        workload=dict(clusters=C, kmers=K, haplotypes=H, samples=S,
                      chains=cfg.num_chains,
                      iterations=cfg.burn_in + cfg.num_samples),
        results=results,
        note=(
            "virtual CPU devices share 2 physical cores, so wall time is "
            "core-bound, not device-bound; the result being validated is "
            "identical tallies at every mesh width (exact sharding) and "
            "1/N per-device cluster load (what ICI scaling delivers on "
            "real chips)."
        ),
    )
    path = os.path.join(os.path.dirname(__file__),
                        "MULTICHIP_SCALING_r03.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=2)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
