"""Quantify the nested missing-allele stat handoff approximation.

Reference semantics (addNestedKmerStats, VariantClusterGenotyper.cpp:154-180):
on EVERY post-burn-in iteration where a sample's parent diplotype demotes a
child cluster, the kmer stats of the allele carried by the demoting parent
haplotype accumulate into the child's missing (`*`) allele — so the child's
reported NAK/FAK/MAC for `*` is the parent-posterior-WEIGHTED average over
demoting alleles.

Production (engine._nested_missing_stats) substitutes the posterior-mean
stats of the single non-retaining allele with the highest parent APP
(PARITY "Nested clusters" documented approximation #2). This test computes
the exact posterior-weighted value for constructed parent posteriors and
bounds the deviation of the argmax substitution:

    |argmax - weighted| <= (1 - app_max/app_tot) * spread(stat)

i.e. exact whenever the parent posterior is concentrated on one demoting
allele (the overwhelmingly common case: a genotyped deletion either
clearly carries or clearly doesn't), and bounded by the stat spread times
the posterior mass off the argmax allele otherwise.
"""

import numpy as np

from bayestyper_tpu.engine import _nested_missing_stats
from bayestyper_tpu.model.stats import BucketStats


class _FC:
    def __init__(self, cluster_id, parent_id, variants):
        self.cluster_id = cluster_id
        self.parent_id = parent_id
        self.variants = variants


class _Var:
    def __init__(self, pos, end):
        self.pos = pos
        self.end = end


class _Parent:
    def __init__(self, hap_allele, retains, variants, children_ids):
        self.hap_allele = hap_allele
        self.retains = retains
        self.variants = variants
        self.children_ids = children_ids


def _build(app_row, nak_row):
    """One parent cluster (V=1, A=3: ref + two deletion alleles), one child.

    Haplotypes: 0 -> ref (retains the child), 1 -> del allele 1,
    2 -> del allele 2 (both demote)."""
    hap_allele = np.array([[0], [1], [2]], np.int16)
    retains = np.array([[True], [False], [False]])
    parent = _Parent(hap_allele, retains, [_Var(100, 400)], [7])
    child = _FC(7, parent_id=5, variants=[_Var(200, 210)])
    parent_fc = _FC(5, parent_id=-1, variants=parent.variants)

    s = 1
    a = 3
    app = np.zeros((1, s, 1, a), np.float32)
    app[0, 0, 0] = app_row
    nak = np.zeros((1, s, 1, a), np.float32)
    nak[0, 0, 0] = nak_row
    stats = BucketStats(
        gpp=np.zeros((1, s, 1, 6), np.float32), app=app,
        gq=np.zeros((1, s, 1), np.float32),
        gt=np.zeros((1, s, 1, 2), np.int32),
        saf=np.zeros((1, s, 1, a), np.int32),
        nak=nak, fak=nak.copy(), mac=nak.copy(),
    )
    by_id = {5: parent}
    # new signature: parent stats addressed by (level, row) via row_of
    got = _nested_missing_stats(
        [child], [stats], {5: (0, 0)}, by_id, c_pad=1, num_samples=s
    )
    return float(np.asarray(got[0])[0, 0])


def _exact_weighted(app_row, nak_row, demoting=(1, 2)):
    w = np.array([app_row[a] for a in demoting], np.float64)
    v = np.array([nak_row[a] for a in demoting], np.float64)
    return float((w * v).sum() / max(w.sum(), 1e-30))


def test_concentrated_posterior_is_exact():
    # parent posterior ~all on deletion allele 1 (the common case)
    app = np.array([0.005, 0.99, 0.005])
    nak = np.array([50.0, 30.0, 4.0])
    prod = _build(app, nak)
    exact = _exact_weighted(app, nak)
    # bound: off-argmax demoting mass * stat spread among demoting alleles
    mass_off = 1.0 - app[1] / (app[1] + app[2])
    spread = abs(nak[1] - nak[2])
    assert prod == 30.0
    assert abs(prod - exact) <= mass_off * spread + 1e-9
    assert abs(prod - exact) < 0.15  # concentrated => deviation ~0.13 NAK


def test_split_posterior_bound_holds():
    # pathological 50/50 split between two demoting alleles with very
    # different NAK — the worst case for the argmax substitution
    app = np.array([0.0, 0.5, 0.5])
    nak = np.array([50.0, 30.0, 4.0])
    prod = _build(app, nak)
    exact = _exact_weighted(app, nak)
    mass_off = 1.0 - app[1] / (app[1] + app[2])
    spread = abs(nak[1] - nak[2])
    # argmax picks allele 1 (ties break to the higher APP index order)
    assert prod in (30.0, 4.0)
    assert abs(prod - exact) <= mass_off * spread + 1e-9  # == spread/2


def test_single_demoting_allele_always_exact():
    # only one demoting allele => substitution is the exact weighted value
    app = np.array([0.6, 0.4, 0.0])
    nak = np.array([50.0, 30.0, 4.0])
    prod = _build(app, nak)
    exact = _exact_weighted(app, nak, demoting=(1,))
    # allele 2 has zero posterior; argmax over non-retaining = allele 1
    assert prod == exact == 30.0
