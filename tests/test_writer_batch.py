"""The native batch row renderer must be byte-identical to the per-record
Python path (render_row) across ploidies, missing calls, dependency alleles
and the full float range of the stats fields."""

import numpy as np
import pytest

from bayestyper_tpu import native
from bayestyper_tpu.constants import MISSING
from bayestyper_tpu.engine import (
    _emit_records_batch, _emit_records_pyloop, FinalizedCluster,
)
from bayestyper_tpu.graph.variants import NormalizedVariant
from bayestyper_tpu.io.fasta import Genome
from bayestyper_tpu.io.samples import ChromosomePloidy, Sample
from bayestyper_tpu.model.stats import BucketStats
from bayestyper_tpu.writer import GenotypeVcfWriter


class _FakePloidy:
    def __init__(self, table):
        self.table = table

    def sample_ploidies(self, chrom, samples):
        return np.asarray(self.table[chrom], np.int8)


def _mk_variant(pos, ref, alts, has_dep=False, origins=None):
    return NormalizedVariant(
        chrom="chr1", pos=pos, ids=[], ref=ref, alts=list(alts),
        has_dependency=has_dep, origins=origins or [],
    )


def _mk_chunk_and_stats(rng, s_count):
    fcs = []
    c, v_cap, a_cap = 5, 2, 4
    g_cap = a_cap * (a_cap + 1) // 2
    for ci in range(c):
        n_var = 1 + (ci % v_cap)
        variants = []
        p = 10 + 100 * ci
        for vi in range(n_var):
            n_alts = 1 + ((ci + vi) % 2)
            has_dep = ci == 3 and vi == 0
            if has_dep:
                n_alts = min(n_alts, a_cap - 2)
            variants.append(
                _mk_variant(p + 7 * vi, "AC"[: 1 + vi % 2] or "A",
                            ["G", "T"][:n_alts], has_dep=has_dep,
                            origins=["cs1:x", ""][: n_alts] if ci == 2 else None)
            )
        fc = FinalizedCluster(
            cluster_id=ci, chrom="chr1" if ci < 4 else "chrX",
            variants=variants,
            hap_allele=np.zeros((3, n_var), np.int16),
            kmer_hi=np.zeros(4, np.uint64), kmer_lo=np.zeros(4, np.uint64),
            mult=np.zeros((4, 3), np.uint8),
            member=np.zeros((4, n_var, 3), bool),
            inter_mult_female=np.zeros(4, np.uint8),
            inter_mult_male=np.zeros(4, np.uint8),
            non_covered_alleles=[[1] if ci == 1 else [] for _ in variants],
            num_excluded=0,
        )
        fcs.append(fc)

    stats = BucketStats(
        gpp=rng.random((c, s_count, v_cap, g_cap), np.float32),
        app=rng.random((c, s_count, v_cap, a_cap), np.float32),
        gq=(rng.random((c, s_count, v_cap), np.float32) * 99),
        gt=rng.integers(-1, 2, (c, s_count, v_cap, 2)).astype(np.int32),
        saf=rng.integers(0, 4, (c, s_count, v_cap, a_cap)).astype(np.uint8),
        nak=np.where(rng.random((c, s_count, v_cap, a_cap)) < 0.2, -1,
                     rng.random((c, s_count, v_cap, a_cap)) * 50
                     ).astype(np.float32),
        fak=np.where(rng.random((c, s_count, v_cap, a_cap)) < 0.2, -1,
                     rng.random((c, s_count, v_cap, a_cap))).astype(np.float32),
        mac=(rng.random((c, s_count, v_cap, a_cap)) * 60).astype(np.float32),
    )
    # haploid samples: second GT slot missing (matches the stats pass coding)
    return fcs, stats


@pytest.mark.skipif(not native.available(), reason="no native library")
def test_batch_render_matches_pyloop(tmp_path):
    rng = np.random.default_rng(7)
    s_count = 4
    samples = [Sample(f"s{i}", 0, "") for i in range(s_count)]
    genome = Genome()
    genome.names = ["chr1", "chrX"]
    genome.sequences["chr1"] = (b"ACGT" * 200)
    genome.sequences["chrX"] = (b"TTGA" * 200)
    # mixed ploidies incl. null (chrY-like behaviour on chrX row here)
    ploidy = _FakePloidy({
        "chr1": [2, 2, 2, 2],
        "chrX": [2, 1, 0, 1],
    })
    fcs, stats = _mk_chunk_and_stats(rng, s_count)
    # force some fully-missing calls
    stats.gt[0, 0, 0] = MISSING

    out = []
    for emit in (_emit_records_batch, _emit_records_pyloop):
        w = GenotypeVcfWriter(
            str(tmp_path / f"{emit.__name__}.vcf"), genome,
            [s.name for s in samples],
        )
        emit(w, fcs, stats, samples, ploidy)
        w.finalise()
        out.append((tmp_path / f"{emit.__name__}.vcf").read_bytes())
    assert out[0] == out[1]
