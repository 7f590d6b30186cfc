"""Hash-prefix-sharded device k-mer count table == host LaneTable."""

import numpy as np

from bayestyper_tpu.engine import LaneTable
from bayestyper_tpu.parallel.mesh import make_mesh
from bayestyper_tpu.parallel.sharded_table import ShardedLaneTable


def _random_table(rng, n, s):
    hi = rng.integers(0, 2**54, n, dtype=np.uint64)
    lo = rng.integers(0, 2**56, n, dtype=np.uint64)
    # dedupe
    order = np.lexsort((lo, hi))
    hi, lo = hi[order], lo[order]
    keep = np.ones(n, bool)
    keep[1:] = (hi[1:] != hi[:-1]) | (lo[1:] != lo[:-1])
    hi, lo = hi[keep], lo[keep]
    counts = rng.integers(0, 255, (len(hi), s)).astype(np.uint8)
    return hi, lo, counts


def test_sharded_lookup_matches_host():
    rng = np.random.default_rng(3)
    hi, lo, counts = _random_table(rng, 5000, 3)
    mesh = make_mesh(8)
    tab = ShardedLaneTable.build(mesh, hi, lo, counts)

    # present keys (every shard exercised) + absent keys
    sel = rng.choice(len(hi), 1200, replace=False)
    q_hi = np.concatenate([hi[sel], rng.integers(0, 2**54, 300, dtype=np.uint64)])
    q_lo = np.concatenate([lo[sel], rng.integers(0, 2**56, 300, dtype=np.uint64)])

    got = tab.lookup_counts(q_hi, q_lo)

    host = LaneTable(hi, lo)
    idx = host.lookup(q_hi, q_lo)
    want = np.where(idx[:, None] >= 0, counts[np.maximum(idx, 0)], 0)
    np.testing.assert_array_equal(got, want.astype(np.uint8))


def test_device_lookup_gather_counts(tmp_path, monkeypatch):
    """BT_DEVICE_LOOKUP=1 produces byte-identical sample counts."""
    import numpy as np

    from bayestyper_tpu.engine import gather_sample_counts, run_cluster_phase
    from bayestyper_tpu.io.samples import ChromosomePloidy

    from .util_sim import write_sim_data

    rng = np.random.default_rng(9)
    truth = [[tuple(sorted(rng.integers(0, 2, 2))) for _ in range(20)]
             for _ in range(2)]
    genome, _, vcf_path, variants, samples = write_sim_data(
        tmp_path, rng, truth, k=31, num_snv=8, num_ins=1, num_del=1,
        genome_len=12000, coverage=15.0,
    )
    ploidy = ChromosomePloidy.human_default()
    unit = run_cluster_phase(genome, samples, vcf_path, ploidy, kmer_size=31)

    _, host_counts = gather_sample_counts(unit, samples)
    monkeypatch.setenv("BT_DEVICE_LOOKUP", "1")
    _, dev_counts = gather_sample_counts(unit, samples)
    np.testing.assert_array_equal(host_counts, dev_counts)


def test_sharded_lookup_single_device():
    rng = np.random.default_rng(4)
    hi, lo, counts = _random_table(rng, 257, 2)
    mesh = make_mesh(1)
    tab = ShardedLaneTable.build(mesh, hi, lo, counts)
    got = tab.lookup_counts(hi, lo)
    np.testing.assert_array_equal(got, counts)
