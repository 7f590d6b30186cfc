"""Benchmark: the REAL pipeline on a mixed, representative workload.

Simulates a README-row-3-shaped unit — 13 samples at 50x, k=55, a genome
with a duplicated 50 kb block (so intercluster multiplicities > 0) carrying
a mixture of size classes:

  * isolated biallelic SNVs (the bulk, as in real callsets)
  * 2-8 bp indels
  * dense clusters of 2, 4 and 6 phased SNVs within one k-mer window
    (multi-variant clusters, haplotype classes up to H=32)
  * 150-400 bp deletions and 100-200 bp insertions (small SVs)

then runs the production `cluster` phase (VCF parse -> clustering -> path
enumeration -> k-mer classification) and the production `genotype` phase
(count gathering, NB fit, all-size-class noise estimation, 20-chain x
350-iteration Gibbs, posterior stats, VCF write) and reports end-to-end
variants/sec per chip, with per-phase breakdowns in `detail`.

Baseline: reference README "Computational requirements" row 3 — 13 samples,
50x, 11.7M variant alleles in 31-32 h on a 28-thread Xeon node
(BASELINE.md) ~= 103 variants/sec/node, counting cluster+genotype together
exactly like the README does.

The default workload is ~152k variants — past the min(N, 100k) noise-draw
knee (InferenceEngine.cpp:135-151), so the noise phase is amortised to
~2/3 coverage like a production unit instead of dominating a toy workload.
The one-time simulation (a ~65 Mbp genome, 13 samples' k-mer tables) is
cached in a manifest under /tmp; its cost is reported as `sim_s` in the
detail block and is NOT part of the timed metric.

Env knobs for smoke-testing (defaults = full benchmark):
  BENCH_SCALE   float fraction of the workload (default 17.5 ~= 152k variants)
  BENCH_CHAINS / BENCH_BURN / BENCH_SAMPLES   Gibbs overrides
"""

import json
import os
import shutil
import time

import numpy as np

BASELINE_VARIANTS_PER_SEC = 103.0  # 11.7M alleles / (31.5 h * 3600 s)

K = 55
NUM_SAMPLES = 13
COVERAGE = 50.0
SCALE = float(os.environ.get("BENCH_SCALE", "17.5"))

# workload mix: (kind, count) — counts are clusters, not variants
MIX = [
    ("snv", int(5200 * SCALE)),
    ("indel", int(800 * SCALE)),
    ("dense2", int(600 * SCALE)),   # 2 phased SNVs < k apart
    ("dense4", int(250 * SCALE)),   # 4 phased SNVs (H up to 16)
    ("dense6", int(60 * SCALE)),    # 6 phased SNVs (H up to 32, capped)
    ("sv_del", int(70 * SCALE)),    # 150-400 bp deletions
    ("sv_ins", int(50 * SCALE)),    # 100-200 bp insertions
]
DUP_BLOCK = 50_000  # duplicated tail block -> inter-multiplicities > 0


def _make_genome_and_variants(rng):
    """Genome with duplicated block + mixed variant placement.

    Returns (seq, variants, cluster_sizes) where variants is
    [(pos0, ref, alt)] sorted and cluster_sizes records the intended number
    of variants per simulated cluster."""
    kinds = [k for k, n in MIX for _ in range(n)]
    rng.shuffle(kinds)

    base_len = 300 + sum(
        520 + (420 if k.startswith("sv") else 0) for k in kinds
    )
    seq = (
        np.frombuffer(b"ACGT", np.uint8)[rng.integers(0, 4, base_len + 600)]
        .tobytes().decode()
    )
    # duplicate an interior block at the end: reference-copy kmers give the
    # clusters inside it intercluster multiplicities > 0
    dup = seq[1000 : 1000 + DUP_BLOCK]
    seq = seq + dup

    variants = []
    cluster_sizes = []
    pos = 300
    for kind in kinds:
        pos += int(420 + rng.integers(0, 200))
        if pos + 900 >= base_len:
            break
        ref_base = seq[pos]
        if kind == "snv":
            alt = str(rng.choice([b for b in "ACGT" if b != ref_base]))
            variants.append((pos, ref_base, alt))
            cluster_sizes.append(1)
        elif kind == "indel":
            if rng.random() < 0.5:
                ins = "".join(rng.choice(list("ACGT"), int(rng.integers(2, 9))))
                variants.append((pos, ref_base, ref_base + ins))
            else:
                dlen = int(rng.integers(2, 9))
                variants.append((pos, seq[pos : pos + dlen + 1], ref_base))
            cluster_sizes.append(1)
        elif kind.startswith("dense"):
            n = int(kind[5:])
            p = pos
            for _ in range(n):
                rb = seq[p]
                alt = str(rng.choice([b for b in "ACGT" if b != rb]))
                variants.append((p, rb, alt))
                p += int(rng.integers(4, max(5, (K - 6) // n)))
            cluster_sizes.append(n)
            pos = p
        elif kind == "sv_del":
            dlen = int(rng.integers(150, 401))
            variants.append((pos, seq[pos : pos + dlen + 1], ref_base))
            cluster_sizes.append(1)
            pos += dlen
        else:  # sv_ins
            ins = "".join(rng.choice(list("ACGT"), int(rng.integers(100, 201))))
            variants.append((pos, ref_base, ref_base + ins))
            cluster_sizes.append(1)
    return seq, variants, cluster_sizes


def _simulate(tmp, rng):
    from bayestyper_tpu.io.fasta import Genome, write_fasta
    from bayestyper_tpu.io.kmc import (
        count_kmers_from_sequences, write_kmc1,
    )
    from bayestyper_tpu.io.samples import Sample
    from bayestyper_tpu.constants import GENDER_FEMALE
    from tests.util_sim import apply_haplotype

    seq, variants, cluster_sizes = _make_genome_and_variants(rng)
    genome = Genome()
    genome.names = ["chr1"]
    genome.sequences["chr1"] = seq.encode()
    write_fasta(os.path.join(tmp, "genome.fa"), [("chr1", seq.encode())])

    vcf_path = os.path.join(tmp, "candidates.vcf")
    with open(vcf_path, "w") as fh:
        fh.write("##fileformat=VCFv4.2\n")
        fh.write(f"##contig=<ID=chr1,length={len(seq)}>\n")
        fh.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
        for pos, ref, alt in variants:
            fh.write(f"chr1\t{pos + 1}\t.\t{ref}\t{alt}\t.\t.\t.\n")

    mean, var = COVERAGE, 2.0 * COVERAGE
    truth = [
        [tuple(sorted(rng.integers(0, 2, 2))) for _ in variants]
        for _ in range(NUM_SAMPLES)
    ]
    sample_seeds = rng.integers(0, 2**63, NUM_SAMPLES)

    def _one_sample(si):
        # native k-mer counting + numpy NB draws release the GIL, so the
        # thread pool gets real overlap on this 2-core host
        srng = np.random.default_rng(int(sample_seeds[si]))
        gts = truth[si]
        h1 = apply_haplotype(seq, variants, [g[0] for g in gts])
        h2 = apply_haplotype(seq, variants, [g[1] for g in gts])
        hi, lo, mult = count_kmers_from_sequences(
            [h1.encode(), h2.encode()], K
        )
        m = mult.astype(np.float64)
        mm, vv = mean * m, var * m
        counts = srng.negative_binomial(mm * mm / (vv - mm), mm / vv)
        keep = counts > 0
        prefix = os.path.join(tmp, f"sample{si}")
        write_kmc1(prefix, hi[keep], lo[keep],
                   np.minimum(counts[keep], 2**31 - 1), kmer_length=K)
        return Sample(f"s{si:02d}", GENDER_FEMALE, prefix)

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        samples = list(pool.map(_one_sample, range(NUM_SAMPLES)))
    return genome, vcf_path, variants, truth, samples, cluster_sizes


def main():
    from bayestyper_tpu.utils import jaxenv

    jaxenv.setup()
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from bayestyper_tpu.engine import (
        GenotypeOptions, genotype_unit, run_cluster_phase,
    )
    from bayestyper_tpu.io.samples import ChromosomePloidy
    from bayestyper_tpu.io.vcf import VcfReader

    from bayestyper_tpu.io.fasta import Genome
    from bayestyper_tpu.io.samples import Sample
    from bayestyper_tpu.constants import GENDER_FEMALE

    tmp = f"/tmp/bayestyper_bench_s{SCALE}_k{K}_n{NUM_SAMPLES}"
    manifest = os.path.join(tmp, "manifest.npz")
    t0 = time.perf_counter()
    if os.path.exists(manifest):
        m = np.load(manifest, allow_pickle=True)
        variants = [(int(p), str(r), str(a)) for p, r, a in m["variants"]]
        truth = [[tuple(g) for g in s] for s in m["truth"].tolist()]
        cluster_sizes = m["cluster_sizes"].tolist()
        genome = Genome.load(os.path.join(tmp, "genome.fa"))
        vcf_path = os.path.join(tmp, "candidates.vcf")
        samples = [
            Sample(f"s{si:02d}", GENDER_FEMALE, os.path.join(tmp, f"sample{si}"))
            for si in range(NUM_SAMPLES)
        ]
    else:
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        rng = np.random.default_rng(0)
        genome, vcf_path, variants, truth, samples, cluster_sizes = _simulate(
            tmp, rng
        )
        np.savez(
            manifest,
            variants=np.array(
                [(p, r, a) for p, r, a in variants], dtype=object
            ),
            truth=np.array(truth, np.int8),
            cluster_sizes=np.array(cluster_sizes, np.int32),
        )
    t_sim = time.perf_counter() - t0
    num_variants = len(variants)
    print(f"simulated {num_variants} variants, {len(cluster_sizes)} intended "
          f"clusters, {NUM_SAMPLES} samples, genome {len(genome['chr1'])} bp "
          f"({t_sim:.1f}s)")

    ploidy = ChromosomePloidy.human_default()

    # ---- cluster phase (timed, best of N — this VM's host-steal swings
    # host-bound wall time 3-5x between runs; min is the standard
    # steady-state estimator, cf. timeit) ----
    repeats = int(os.environ.get("BENCH_REPEATS", 2))
    t_cluster = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        unit = run_cluster_phase(
            genome, samples, vcf_path, ploidy, kmer_size=K,
            max_parameter_kmers=1_000_000,
        )
        t_cluster = min(t_cluster, time.perf_counter() - t0)
    num_clusters = len(unit.compiled)
    class_census = {}
    for fc in unit.compiled:
        h = fc.hap_allele.shape[0]
        class_census[h] = class_census.get(h, 0) + 1

    opts = GenotypeOptions(  # production defaults: 20 chains, 100+250 iters
        num_chains=int(os.environ.get("BENCH_CHAINS", 20)),
        burn_in=int(os.environ.get("BENCH_BURN", 100)),
        num_samples=int(os.environ.get("BENCH_SAMPLES", 250)),
        random_seed=1,
        num_host_threads=os.cpu_count() or 1,
    )

    # ---- warm-up: compile every size-class program (subsequent runs hit the
    # persistent XLA cache; axon remote-compile variance note in STATUS.md)
    t0 = time.perf_counter()
    genotype_unit(unit, samples, genome, ploidy,
                  os.path.join(tmp, "warmup.vcf"), opts)
    t_warmup = time.perf_counter() - t0

    # ---- genotype phase (timed, best of N) ----
    out_path = os.path.join(tmp, "genotypes.vcf")
    t_genotype = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        summary = genotype_unit(unit, samples, genome, ploidy, out_path, opts)
        t_genotype = min(t_genotype, time.perf_counter() - t0)

    # ---- sanity: concordance against simulated truth must be high ----
    pos_to_vi = {pos + 1: vi for vi, (pos, _, _) in enumerate(variants)}
    called = correct = total = 0
    for r in VcfReader(out_path, parse_samples=True):
        vi = pos_to_vi.get(r.pos)
        if vi is None:
            continue
        for si, s in enumerate(r.samples):
            total += 1
            gt = s["GT"]
            if "." in gt:
                continue
            called += 1
            a = tuple(sorted(int(x) for x in gt.replace("|", "/").split("/")))
            correct += a == truth[si][vi]
    call_rate = called / max(total, 1)
    concordance = correct / max(called, 1)
    assert concordance > 0.95, f"concordance {concordance:.3f} too low"
    assert call_rate > 0.7, f"call rate {call_rate:.3f} too low"

    t_total = t_cluster + t_genotype
    vps = num_variants / t_total
    print(json.dumps({
        "metric": "variants_per_sec_per_chip_mixed_13s_50x",
        "value": round(vps, 1),
        "unit": "variants/s (cluster+genotype, end-to-end)",
        "vs_baseline": round(vps / BASELINE_VARIANTS_PER_SEC, 2),
        "detail": {
            "num_variants": num_variants,
            "num_clusters": num_clusters,
            "samples": NUM_SAMPLES,
            "coverage": COVERAGE,
            "kmer_size": K,
            "haplotype_class_census": {
                str(k): v for k, v in sorted(class_census.items())
            },
            "cluster_phase_s": round(t_cluster, 1),
            "cluster_phase_variants_per_sec": round(num_variants / t_cluster, 1),
            "genotype_phase_s": round(t_genotype, 1),
            "genotype_phase_variants_per_sec": round(
                num_variants / t_genotype, 1
            ),
            "genotype_phase_clusters_per_sec": round(
                num_clusters / t_genotype, 1
            ),
            "call_rate": round(call_rate, 4),
            "concordance": round(concordance, 4),
            "sim_s": round(t_sim, 1),
            "warmup_s": round(t_warmup, 1),
            "baseline": "README row 3: 11.7M alleles / 31.5h / 28-thread node",
        },
    }))


if __name__ == "__main__":
    main()
