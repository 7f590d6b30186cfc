"""Device-sharded k-mer table vs host LaneTable: measured lookup numbers.

VERDICT r2 item 5: decide the production default with data, not an env var.
Times the two lookup paths `gather_sample_counts` can take for KMC batch
membership (engine.py `_one`):

  * host:   native two-pointer sorted-merge lookup (bt_lane_merge_lookup)
            against the sorted lane table (the production default), plus the
            rooted binary search (bt_lane_lookup_rooted) used for
            non-monotonic batches.
  * device: ShardedLaneTable over the visible mesh (hash-prefix sharding,
            per-shard vectorised binary search, psum combine) — the TPU
            analogue of the reference's mutex-striped HybridHash
            (HybridHash.tpp:160-172).

On this rig the device is ONE chip behind the axon tunnel (~30 MB/s up,
~12 MB/s down measured), so the device path pays
(16 B/query up + 4 B/hit down) of tunnel traffic per batch; the host path
streams at memory bandwidth. The numbers quantify the crossover story
recorded in PARITY.md: host wins whenever the table fits host memory and
the chips are remote; the sharded path exists for locally-attached
multi-chip meshes where the table outgrows one host.

Usage: python benchmarks/sharded_table_bench.py   (uses the real device;
set JAX_PLATFORMS=cpu + xla_force_host_platform_device_count for a virtual
mesh run)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from bayestyper_tpu.utils import jaxenv

    jaxenv.setup()
    import jax

    from bayestyper_tpu.engine import LaneTable
    from bayestyper_tpu.parallel.mesh import make_mesh
    from bayestyper_tpu.parallel.sharded_table import ShardedLaneTable
    from bayestyper_tpu import native

    rng = np.random.default_rng(7)
    n_table = int(os.environ.get("BT_TABLE_SIZE", 4_000_000))
    n_query = int(os.environ.get("BT_QUERY_SIZE", 1_000_000))

    t_hi = rng.integers(0, 1 << 50, n_table, dtype=np.uint64)
    t_lo = rng.integers(0, 1 << 60, n_table, dtype=np.uint64)
    table = LaneTable.from_unsorted_unique(t_hi, t_lo)

    # queries: half hits (drawn from the table), half misses — the KMC
    # ingestion shape (most sample kmers are genome-wide, not member kmers)
    hit_idx = rng.integers(0, len(table), n_query // 2)
    q_hi = np.concatenate([
        table.hi[hit_idx], rng.integers(0, 1 << 50, n_query - n_query // 2,
                                        dtype=np.uint64)
    ])
    q_lo = np.concatenate([
        table.lo[hit_idx], rng.integers(0, 1 << 60, n_query - n_query // 2,
                                        dtype=np.uint64)
    ])
    # sorted ascending like a KMC stream (tables are sorted by canonical kmer)
    order = np.lexsort((q_lo, q_hi))
    q_hi, q_lo = q_hi[order], q_lo[order]

    results = {}

    # ---- host: sorted-merge lookup (production default) ----
    assert native.available()
    native.lane_merge_lookup(table.hi, table.lo, q_hi[:1000], q_lo[:1000], 0)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        idx, _ = native.lane_merge_lookup(table.hi, table.lo, q_hi, q_lo, 0)
        best = min(best, time.perf_counter() - t0)
    n_hits = int((idx >= 0).sum())
    results["host_merge"] = dict(
        wall_s=round(best, 4),
        mq_per_s=round(n_query / best / 1e6, 1),
    )

    # ---- host: rooted binary search (non-monotonic batch fallback) ----
    table.lookup(q_hi[:1000], q_lo[:1000])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        idx2 = table.lookup(q_hi, q_lo)
        best = min(best, time.perf_counter() - t0)
    assert (idx2 >= 0).sum() == n_hits
    results["host_rooted"] = dict(
        wall_s=round(best, 4),
        mq_per_s=round(n_query / best / 1e6, 1),
    )

    # ---- device: sharded table over the visible mesh ----
    mesh = make_mesh(len(jax.devices()))
    payload = np.arange(len(table), dtype=np.int64)[:, None].astype(
        np.uint32
    ).view(np.uint8).reshape(len(table), 4)
    t0 = time.perf_counter()
    dev = ShardedLaneTable.build(mesh, table.hi, table.lo, payload)
    build_s = time.perf_counter() - t0
    dev.lookup_counts(q_hi[:1024], q_lo[:1024])  # compile
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        pl = dev.lookup_counts(q_hi, q_lo)
        best = min(best, time.perf_counter() - t0)
    idx3 = np.ascontiguousarray(pl).view(np.uint32).reshape(n_query).astype(np.int64)
    # payload 0 is ambiguous (row 0 vs miss) — resolve tiny remainder on host
    dev_hits = int((idx3 > 0).sum())
    maybe0 = np.flatnonzero(idx3 == 0)
    dev_hits += int((table.lookup(q_hi[maybe0], q_lo[maybe0]) == 0).sum())
    assert dev_hits == n_hits, (dev_hits, n_hits)
    results["device_sharded"] = dict(
        wall_s=round(best, 4),
        mq_per_s=round(n_query / best / 1e6, 1),
        build_s=round(build_s, 2),
        devices=int(mesh.size),
        backend=jax.devices()[0].platform,
    )

    out = dict(
        metric="kmer_table_lookup_paths",
        table_kmers=n_table,
        queries=n_query,
        hit_fraction=0.5,
        results=results,
    )
    path = os.path.join(os.path.dirname(__file__), "SHARDED_TABLE_r03.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
