"""Benchmark: end-to-end genotype-phase throughput (variant clusters/sec/chip).

Simulates an inference unit of biallelic SNV clusters with per-sample k-mer
counts (3 samples, 15x haploid coverage), then times the complete `genotype`
phase — bucket assembly, the 20-chain x 350-iteration Gibbs sampler with 10%
k-mer subsampling, the full posterior-statistics pass
(GT/GQ/GPP/APP/NAK/FAK/MAC/SAF), and VCF row rendering — on the real TPU.
Unit preparation (cluster compile + count gathering) happens outside the
timer, mirroring how the reference reports `cluster` + `genotype` phases
separately.

Baseline: reference README "Computational requirements" row 3 (11.7M alleles,
31-32h, 28 threads) ~= 103 variant clusters/sec/node (BASELINE.md).
"""

import json
import time

import numpy as np

BASELINE_CLUSTERS_PER_SEC = 103.0  # 11.7M / (31.5h * 3600)

NUM_CLUSTERS = 4096
NUM_SAMPLES = 3
MEAN, VAR, NOISE = 15.0, 30.0, 0.05


def _simulate_clusters(rng):
    from bayestyper_tpu.graph.variants import NormalizedVariant

    def nb(mult, n):
        if mult == 0:
            return rng.poisson(NOISE, n)
        m, v = MEAN * mult, VAR * mult
        return rng.negative_binomial(m * m / (v - m), m / v, n)

    clusters = []
    truth = []
    for cid in range(NUM_CLUSTERS):
        nk = 54  # kmers crossing a SNV at k=55
        mult = np.zeros((2 * nk, 2), np.uint8)
        mult[:nk, 0] = 1
        mult[nk:, 1] = 1
        counts = np.zeros((2 * nk, NUM_SAMPLES), np.uint8)
        gts = []
        for si in range(NUM_SAMPLES):
            a1, a2 = sorted(rng.integers(0, 2, 2))
            gts.append((a1, a2))
            counts[:nk, si] = np.clip(nb((a1 == 0) + (a2 == 0), nk), 0, 255)
            counts[nk:, si] = np.clip(nb((a1 == 1) + (a2 == 1), nk), 0, 255)
        member = np.zeros((2 * nk, 1, 2), bool)
        member[:, 0, :] = mult > 0
        var = NormalizedVariant(
            chrom="chr1", pos=1000 + cid * 500, ids=[], ref="A", alts=["C"],
            has_dependency=False, origins=["."],
        )
        clusters.append({
            "cid": cid, "mult": mult, "counts": counts, "member": member,
            "variant": var, "gts": gts,
        })
        truth.append(gts)
    return clusters, truth


def main():
    from bayestyper_tpu.utils import jaxenv

    jaxenv.setup()
    import jax
    import jax.numpy as jnp

    from bayestyper_tpu.io.fasta import Genome
    from bayestyper_tpu.io.samples import ChromosomePloidy, Sample
    from bayestyper_tpu.model.buckets import build_bucket, greedy_minimum_cover
    from bayestyper_tpu.model.gibbs import (
        GibbsConfig, genotype_bucket, make_outcome_space,
    )
    from bayestyper_tpu.model.stats import FilterConfig, collect_bucket_stats
    from bayestyper_tpu.ops.distributions import np_build_count_log_prob_tables
    from bayestyper_tpu.writer import GenotypeVcfWriter, VariantGenotypeRecord
    from bayestyper_tpu.constants import GENDER_FEMALE, MISSING

    rng = np.random.default_rng(0)
    clusters, truth = _simulate_clusters(rng)

    tables = jnp.asarray(np_build_count_log_prob_tables(
        np.full(NUM_SAMPLES, MEAN / VAR),
        np.full(NUM_SAMPLES, MEAN * MEAN / (VAR - MEAN)),
        np.full(NUM_SAMPLES, NOISE), 255,
    ))
    outcomes = make_outcome_space(2)
    cfg = GibbsConfig(max_total_mult=8)  # production defaults otherwise
    filters = FilterConfig(0.99, 1.0, tuple([0.9] * NUM_SAMPLES))
    ploidies = np.full(NUM_SAMPLES, 2, np.int8)
    genome = Genome()
    genome.names = ["chr1"]
    genome.sequences["chr1"] = b"N"
    key = jax.random.PRNGKey(0)

    def genotype_all(out_path):
        writer = GenotypeVcfWriter(out_path, genome, ["s0", "s1", "s2"])
        bucket_size = 4096
        n_done = 0
        for start in range(0, len(clusters), bucket_size):
            chunk = clusters[start : start + bucket_size]
            dicts = []
            for cl in chunk:
                nonzero = (cl["counts"] > 0).any(axis=1)
                dicts.append({
                    "mult": cl["mult"],
                    "inter_mult": np.zeros_like(cl["counts"]),
                    "counts": cl["counts"],
                    "ploidy": ploidies,
                    "hap_allele": np.array([[0], [1]], np.int16),
                    "num_alleles": np.array([2], np.int16),
                    "member": cl["member"],
                    "cover": greedy_minimum_cover(cl["mult"], nonzero, rng),
                    "cluster_id": cl["cid"],
                })
            bucket = build_bucket(
                dicts, (bucket_size, 128, 2, 1), NUM_SAMPLES
            ).device_arrays()
            tally, w = genotype_bucket(key, bucket, tables, outcomes, cfg)
            stats = collect_bucket_stats(
                bucket, outcomes, tally, w, filters,
                allele_capacity=2, mac_top_t=4,
            )
            stats = jax.device_get(stats)  # one batched transfer
            gt, gq, gpp, app = stats.gt, stats.gq, stats.gpp, stats.app
            nak, fak, mac, saf = stats.nak, stats.fak, stats.mac, stats.saf
            for ci, cl in enumerate(chunk):
                v = cl["variant"]
                writer.add(VariantGenotypeRecord(
                    chrom=v.chrom, pos=v.pos + 1, ids=v.ids, ref=v.ref,
                    alts=v.alts, origins=v.origins, has_dependency=False,
                    cluster_size=1, cluster_region=f"chr1:{v.pos+1}-{v.pos+1}",
                    group_size=1, group_region=f"chr1:{v.pos+1}-{v.pos+1}",
                    num_candidates=2, non_covered_alleles=[],
                    ploidies=ploidies,
                    gt=gt[ci, :, 0], gq=gq[ci, :, 0], gpp=gpp[ci, :, 0],
                    app=app[ci, :, 0], nak=nak[ci, :, 0], fak=fak[ci, :, 0],
                    mac=mac[ci, :, 0], saf=saf[ci, :, 0],
                ))
            n_done += len(chunk)
        writer.finalise()
        return gt

    # warm-up (compile)
    genotype_all("/tmp/bench_warmup.vcf")

    t0 = time.perf_counter()
    gt = genotype_all("/tmp/bench_out.vcf")
    dt = time.perf_counter() - t0

    # sanity: genotype concordance on the last bucket must be high, else the
    # throughput number is meaningless
    correct = total = 0
    chunk = clusters[-len(gt):]
    for ci, cl in enumerate(chunk):
        for si, expected in enumerate(cl["gts"]):
            called = [int(x) for x in gt[ci, si, 0] if x != MISSING]
            if not called:
                continue
            total += 1
            correct += tuple(sorted(called)) == tuple(expected)
    concordance = correct / max(total, 1)
    assert concordance > 0.95, f"concordance {concordance:.3f} too low"

    cps = NUM_CLUSTERS / dt
    print(json.dumps({
        "metric": "variant_clusters_genotyped_per_sec_per_chip",
        "value": round(cps, 1),
        "unit": "clusters/s",
        "vs_baseline": round(cps / BASELINE_CLUSTERS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
