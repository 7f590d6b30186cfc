"""Human-chr20-scale end-to-end benchmark (VERDICT r1 item 2 acceptance).

Simulates a chr20-shaped workload — SCALE=1.0 gives ~1M variants on an
80 Mbp chromosome (chr20-scale variant density for a multi-sample union
callset), 3 samples at 30x, k=55 — then runs the production cluster phase
and genotype phase end-to-end and reports per-phase throughput plus peak
RSS. Variant mix: ~80% isolated SNVs, ~8% indels, ~12% of variants inside
dense 2-3 SNV clusters (< k apart).

Usage:
  python benchmarks/human_scale.py                 # full (~1M variants)
  HS_SCALE=0.01 python benchmarks/human_scale.py   # smoke (~10k variants)
  HS_CHAINS/HS_BURN/HS_SAMPLES                     # Gibbs overrides

Inputs are simulated once and cached in /tmp.
"""

import json
import os
import resource
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 55
NUM_SAMPLES = 3
COVERAGE = 30.0
SCALE = float(os.environ.get("HS_SCALE", "1.0"))
NUM_VARIANT_SITES = int(1_150_000 * SCALE)
GENOME_LEN = int(125_000_000 * SCALE) + 20_000


def _peak_rss_gb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def _now_rss_gb():
    with open("/proc/self/statm") as fh:
        return int(fh.read().split()[1]) * 4096 / 1e9


def _unit_component_bytes(unit, table=None, counts=None):
    """Analytic footprint of the big persistent structures (VERDICT r4 #5:
    break the peak RSS into components so unit-scale memory is a projection,
    not a guess)."""
    import numpy as _np

    def nb(a):
        return a.nbytes if isinstance(a, _np.ndarray) else 0

    compiled = sum(
        nb(fc.kmer_hi) + nb(fc.kmer_lo) + nb(fc.mult) + nb(fc.member)
        + nb(fc.inter_mult_female) + nb(fc.inter_mult_male)
        for fc in unit.compiled
    )
    params = nb(unit.param_hi) + nb(unit.param_lo) + \
        nb(unit.param_mult_female) + nb(unit.param_mult_male)
    out = {
        "unit_compiled_mb": round(compiled / 1e6, 1),
        "unit_param_kmers_mb": round(params / 1e6, 1),
    }
    if table is not None:
        out["count_table_mb"] = round(
            (table.hi.nbytes + table.lo.nbytes + counts.nbytes) / 1e6, 1
        )
    return out


def _simulate(tmp, rng):
    from bayestyper_tpu.io.fasta import Genome, write_fasta
    from bayestyper_tpu.io.kmc import count_kmers_from_sequences, write_kmc1
    from bayestyper_tpu.io.samples import Sample
    from bayestyper_tpu.constants import GENDER_FEMALE

    t0 = time.perf_counter()
    seq_arr = np.frombuffer(b"ACGT", np.uint8)[
        rng.integers(0, 4, GENOME_LEN)
    ].tobytes()
    genome = Genome()
    genome.names = ["chr20"]
    genome.sequences["chr20"] = seq_arr
    write_fasta(os.path.join(tmp, "genome.fa"), [("chr20", seq_arr)])
    print(f"genome {GENOME_LEN/1e6:.0f} Mbp ({time.perf_counter()-t0:.0f}s)",
          flush=True)

    # variant placement: draws gaps; occasionally a dense run of 2-3 SNVs
    t0 = time.perf_counter()
    seq = seq_arr.decode()
    positions = []
    kinds = []
    pos = 1000
    # ~25% of the genome is variant desert (blocks of 5-15 kb) so the
    # cluster phase has real intercluster regions to draw parameter k-mers
    # from, like an actual chromosome
    mean_gap = max(
        int((GENOME_LEN - 2000) * 0.75) // max(NUM_VARIANT_SITES, 1), 60
    )
    while len(positions) < NUM_VARIANT_SITES and pos < GENOME_LEN - 20000:
        r = rng.random()
        if r < 0.003:  # desert
            pos += int(rng.integers(5_000, 15_000))
            continue
        if r < 0.12:  # dense cluster of 2-3 SNVs within one k-window
            n = 2 + int(rng.random() < 0.3)
            for _ in range(n):
                positions.append(pos)
                kinds.append("snv")
                pos += int(rng.integers(5, 20))
            pos += int(rng.integers(mean_gap // 2, mean_gap * 2))
        else:
            positions.append(pos)
            kinds.append("indel" if r < 0.20 else "snv")
            pos += int(rng.integers(mean_gap // 2, mean_gap * 2))

    variants = []
    for pos, kind in zip(positions, kinds):
        rb = seq[pos]
        if kind == "snv":
            alt = "ACGT"[(("ACGT".index(rb)) + 1 + int(rng.integers(0, 3))) % 4]
            if alt == rb:
                alt = "ACGT"[("ACGT".index(rb) + 1) % 4]
            variants.append((pos, rb, alt))
        else:
            if rng.random() < 0.5:
                ins = "".join(
                    "ACGT"[i] for i in rng.integers(0, 4, int(rng.integers(1, 9)))
                )
                variants.append((pos, rb, rb + ins))
            else:
                dlen = int(rng.integers(1, 9))
                variants.append((pos, seq[pos : pos + dlen + 1], rb))
    print(f"placed {len(variants)} variants "
          f"({time.perf_counter()-t0:.0f}s)", flush=True)

    t0 = time.perf_counter()
    with open(os.path.join(tmp, "candidates.vcf"), "w") as fh:
        fh.write("##fileformat=VCFv4.2\n")
        fh.write(f"##contig=<ID=chr20,length={GENOME_LEN}>\n")
        fh.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
        rows = [
            f"chr20\t{p + 1}\t.\t{r}\t{a}\t.\t.\t.\n" for p, r, a in variants
        ]
        fh.writelines(rows)
    print(f"vcf written ({time.perf_counter()-t0:.0f}s)", flush=True)

    from tests.util_sim import apply_haplotype

    truth = np.zeros((NUM_SAMPLES, len(variants), 2), np.int8)
    samples = []
    mean, var = COVERAGE, 2.0 * COVERAGE
    for si in range(NUM_SAMPLES):
        t0 = time.perf_counter()
        gts = np.sort(rng.integers(0, 2, (len(variants), 2)), axis=1)
        truth[si] = gts
        h1 = apply_haplotype(seq, variants, gts[:, 0])
        h2 = apply_haplotype(seq, variants, gts[:, 1])
        hi, lo, mult = count_kmers_from_sequences(
            [h1.encode(), h2.encode()], K
        )
        del h1, h2
        m = mult.astype(np.float64)
        mm, vv = mean * m, var * m
        counts = rng.negative_binomial(mm * mm / (vv - mm), mm / vv)
        keep = counts > 0
        prefix = os.path.join(tmp, f"sample{si}")
        write_kmc1(prefix, hi[keep], lo[keep],
                   np.minimum(counts[keep], 2**31 - 1), kmer_length=K)
        samples.append(Sample(f"s{si}", GENDER_FEMALE, prefix))
        print(f"sample {si}: {len(hi)} kmers "
              f"({time.perf_counter()-t0:.0f}s)", flush=True)
    np.save(os.path.join(tmp, "truth.npy"), truth)
    np.save(
        os.path.join(tmp, "variants.npy"),
        np.array([(p, r, a) for p, r, a in variants], object),
        allow_pickle=True,
    )
    return genome, variants, truth, samples


def main():
    from bayestyper_tpu.utils import jaxenv

    jaxenv.setup()
    from bayestyper_tpu.engine import (
        GenotypeOptions, genotype_unit, run_cluster_phase,
    )
    from bayestyper_tpu.io.fasta import Genome
    from bayestyper_tpu.io.samples import ChromosomePloidy, Sample
    from bayestyper_tpu.io.vcf import VcfReader
    from bayestyper_tpu.constants import GENDER_FEMALE

    tmp = f"/tmp/bayestyper_human_scale_s{SCALE}"
    stamp = os.path.join(tmp, "truth.npy")
    if os.path.exists(stamp):
        genome = Genome.load(os.path.join(tmp, "genome.fa"))
        truth = np.load(stamp)
        v = np.load(os.path.join(tmp, "variants.npy"), allow_pickle=True)
        variants = [(int(p), str(r), str(a)) for p, r, a in v]
        samples = [
            Sample(f"s{si}", GENDER_FEMALE, os.path.join(tmp, f"sample{si}"))
            for si in range(NUM_SAMPLES)
        ]
    else:
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        genome, variants, truth, samples = _simulate(
            tmp, np.random.default_rng(20)
        )
    print(f"workload: {len(variants)} variants, {NUM_SAMPLES} samples at "
          f"{COVERAGE}x, genome {GENOME_LEN/1e6:.0f} Mbp", flush=True)
    ploidy = ChromosomePloidy.human_default()

    # ---- cluster phase (timed) ----
    t0 = time.perf_counter()
    unit = run_cluster_phase(
        genome, samples, os.path.join(tmp, "candidates.vcf"), ploidy,
        kmer_size=K,
    )
    t_cluster = time.perf_counter() - t0
    nv = sum(len(fc.variants) for fc in unit.compiled)
    rss_cluster = _peak_rss_gb()
    rss_cluster_now = _now_rss_gb()
    components = _unit_component_bytes(unit)
    print(f"cluster phase: {t_cluster:.1f}s = {nv/t_cluster:.0f} variants/s "
          f"(peak RSS {rss_cluster:.1f} GB, now {rss_cluster_now:.1f} GB; "
          f"components {components})", flush=True)

    # ---- genotype phase (timed) ----
    opts = GenotypeOptions(
        num_chains=int(os.environ.get("HS_CHAINS", 20)),
        burn_in=int(os.environ.get("HS_BURN", 100)),
        num_samples=int(os.environ.get("HS_SAMPLES", 250)),
        random_seed=1,
        num_host_threads=os.cpu_count() or 1,
    )
    out_path = os.path.join(tmp, "genotypes.vcf")
    t0 = time.perf_counter()
    genotype_unit(unit, samples, genome, ploidy, out_path, opts)
    t_genotype = time.perf_counter() - t0
    print(f"genotype phase: {t_genotype:.1f}s = {nv/t_genotype:.0f} "
          f"variants/s", flush=True)

    # ---- concordance spot check (first 20k records) ----
    pos_to_vi = {p + 1: vi for vi, (p, _, _) in enumerate(variants)}
    called = correct = total = 0
    for ri, r in enumerate(VcfReader(out_path, parse_samples=True)):
        if ri >= 20000:
            break
        vi = pos_to_vi.get(r.pos)
        if vi is None:
            continue
        for si, s in enumerate(r.samples):
            total += 1
            if "." in s["GT"]:
                continue
            called += 1
            a = sorted(int(x) for x in s["GT"].replace("|", "/").split("/"))
            correct += a == sorted(truth[si][vi].tolist())
    print(json.dumps({
        "metric": "human_scale_cluster_phase_variants_per_sec",
        "value": round(nv / t_cluster, 1),
        "unit": "variants/s",
        "detail": {
            "num_variants": nv,
            "num_clusters": len(unit.compiled),
            "cluster_phase_s": round(t_cluster, 1),
            "genotype_phase_s": round(t_genotype, 1),
            "genotype_variants_per_sec": round(nv / t_genotype, 1),
            "end_to_end_variants_per_sec": round(
                nv / (t_cluster + t_genotype), 1
            ),
            "peak_rss_gb": round(_peak_rss_gb(), 1),
            "cluster_rss_now_gb": round(rss_cluster_now, 2),
            "genotype_rss_now_gb": round(_now_rss_gb(), 2),
            "unit_components": components,
            "call_rate": round(called / max(total, 1), 4),
            "concordance": round(correct / max(called, 1), 4),
        },
    }), flush=True)


if __name__ == "__main__":
    main()
