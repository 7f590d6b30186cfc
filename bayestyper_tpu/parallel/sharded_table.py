"""Hash-prefix-sharded k-mer count table over a device mesh.

The reference shares ONE k-mer hash across threads with 4^12-way mutex
striping (HybridHash.tpp:160-172) and stripes its blooms 65536 ways by
ntHash prefix (KmerBloom.cpp:204-215). The TPU-native equivalent: shard the
sorted lane-pair table by a 64-bit mix of the k-mer across chips, replicate
each query batch, binary-search every local shard in parallel, and combine
with one psum (each key lives on exactly one shard, so the sum IS the
single shard's answer). Lookups ride HBM bandwidth instead of host caches —
the scale-out path for WGS-size count tables (a 30-sample human table is
~60 GB of counts: more than one chip's HBM, comfortably sharded over a
pod slice).

Device arithmetic is x32-safe: uint64 lanes split into (hi32, lo32) pairs
and compared lexicographically, so the same program runs on TPU (no native
64-bit ints) and on the virtual CPU mesh used in tests.
"""

from __future__ import annotations

import numpy as np

from ..ops.kmers import hash_lanes


def _split32(x):
    x = np.asarray(x, np.uint64)
    return (x >> np.uint64(32)).astype(np.uint32), (
        x & np.uint64(0xFFFFFFFF)
    ).astype(np.uint32)


class ShardedLaneTable:
    """Device-resident sorted lane-pair table with per-sample counts,
    sharded by hash prefix across a mesh."""

    def __init__(self, mesh, shard_keys, shard_counts, shard_valid, depth):
        self.mesh = mesh
        self.keys = shard_keys        # [D, M, 4] uint32 (hi_hi, hi_lo, lo_hi, lo_lo)
        self.counts = shard_counts    # [D, M, S] uint8
        self.valid = shard_valid      # [D, M] bool
        self.depth = depth            # static binary-search depth

    @classmethod
    def build(cls, mesh, hi, lo, counts):
        """Shard (hi, lo, counts[N, S]) by mix64 hash across mesh devices.

        Rows within a shard are (hi, lo)-sorted; shards pad to the largest
        shard with +inf keys so the search depth is uniform."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        d = mesh.size
        shard = (hash_lanes(hi, lo) % np.uint64(d)).astype(np.int64)
        order = np.lexsort((lo, hi, shard))
        s_hi, s_lo, s_counts = hi[order], lo[order], counts[order]
        s_shard = shard[order]
        sizes = np.bincount(s_shard, minlength=d)
        m = max(int(sizes.max(initial=1)), 1)
        offs = np.zeros(d + 1, np.int64)
        np.cumsum(sizes, out=offs[1:])

        keys = np.full((d, m, 4), 0xFFFFFFFF, np.uint32)
        cnts = np.zeros((d, m, counts.shape[1]), np.uint8)
        valid = np.zeros((d, m), bool)
        for di in range(d):
            a, b = offs[di], offs[di + 1]
            n = b - a
            hh, hl = _split32(s_hi[a:b])
            lh, ll = _split32(s_lo[a:b])
            keys[di, :n, 0], keys[di, :n, 1] = hh, hl
            keys[di, :n, 2], keys[di, :n, 3] = lh, ll
            cnts[di, :n] = s_counts[a:b]
            valid[di, :n] = True

        spec = NamedSharding(mesh, P("data"))
        depth = max(int(np.ceil(np.log2(max(m, 2)))), 1)
        return cls(
            mesh,
            jax.device_put(keys, spec),
            jax.device_put(cnts, spec),
            jax.device_put(valid, spec),
            depth,
        )

    def lookup_counts(self, q_hi, q_lo):
        """Counts for each query lane pair, 0 where absent: [N, S] uint8.

        Queries are replicated to every shard; each shard binary-searches
        its sorted slice; a psum over shards combines (exact: one shard owns
        each key)."""
        import jax
        import jax.numpy as jnp
        from jax import shard_map
        from jax.sharding import NamedSharding, PartitionSpec as P

        qh_h, qh_l = _split32(q_hi)
        ql_h, ql_l = _split32(q_lo)
        q = np.stack([qh_h, qh_l, ql_h, ql_l], axis=1)  # [N, 4] uint32
        q_dev = jax.device_put(q, NamedSharding(self.mesh, P()))
        depth = self.depth

        def _less(a, b):
            # lexicographic a < b over 4 uint32 lanes
            lt = a[..., 0] < b[..., 0]
            eq = a[..., 0] == b[..., 0]
            for i in (1, 2, 3):
                lt = lt | (eq & (a[..., i] < b[..., i]))
                eq = eq & (a[..., i] == b[..., i])
            return lt

        def _eq(a, b):
            return (
                (a[..., 0] == b[..., 0]) & (a[..., 1] == b[..., 1])
                & (a[..., 2] == b[..., 2]) & (a[..., 3] == b[..., 3])
            )

        def local(keys, counts, valid, q):
            keys = keys[0]      # [M, 4]
            counts = counts[0]  # [M, S]
            valid = valid[0]    # [M]
            m = keys.shape[0]

            # vectorised binary search: lo/hi per query (pvary: the carry
            # varies per shard inside shard_map, so the init must too)
            lo_i = jax.lax.pcast(
                jnp.zeros(q.shape[0], jnp.int32), "data", to="varying"
            )
            hi_i = jax.lax.pcast(
                jnp.full(q.shape[0], m, jnp.int32), "data", to="varying"
            )

            def body(_, carry):
                lo_i, hi_i = carry
                mid = (lo_i + hi_i) >> 1
                km = keys[jnp.minimum(mid, m - 1)]
                go_right = _less(km, q)
                lo_i = jnp.where(go_right, mid + 1, lo_i)
                hi_i = jnp.where(go_right, hi_i, mid)
                return (lo_i, hi_i)

            lo_i, _ = jax.lax.fori_loop(0, depth + 1, body, (lo_i, hi_i))
            at = jnp.minimum(lo_i, m - 1)
            hit = _eq(keys[at], q) & valid[at]
            out = jnp.where(
                hit[:, None], counts[at].astype(jnp.int32), 0
            )
            return jax.lax.psum(out, "data")

        fn = shard_map(
            local,
            mesh=self.mesh,
            in_specs=(P("data"), P("data"), P("data"), P()),
            out_specs=P(),
        )
        return np.asarray(
            jax.jit(fn)(self.keys, self.counts, self.valid, q_dev)
        ).astype(np.uint8)
