"""E. coli-scale end-to-end run (BASELINE.json configs[0]): ~4.6 Mb genome,
~30k SNV+indel candidates, 1-3 samples at 30x, full cluster + genotype
phases with timing breakdown and genotype concordance.

Usage: python benchmarks/ecoli_scale.py [--variants 30000] [--samples 1]
"""

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tests.util_sim import write_sim_data  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", type=int, default=30000)
    ap.add_argument("--samples", type=int, default=1)
    ap.add_argument("--coverage", type=float, default=15.0)
    ap.add_argument("--kmer-size", type=int, default=55)
    ap.add_argument("--chains", type=int, default=20)
    ap.add_argument("--workdir", default=None)
    args = ap.parse_args()

    from bayestyper_tpu.engine import (
        GenotypeOptions, genotype_unit, run_cluster_phase,
    )
    from bayestyper_tpu.io.samples import ChromosomePloidy
    from bayestyper_tpu.io.vcf import VcfReader
    from bayestyper_tpu.utils import jaxenv

    jaxenv.setup()

    rng = np.random.default_rng(42)
    workdir = Path(args.workdir or tempfile.mkdtemp(prefix="ecoli_bench_"))
    workdir.mkdir(exist_ok=True)

    genome_len = max(args.variants * 150, 500_000)
    t0 = time.perf_counter()
    truth = [
        [tuple(sorted(rng.integers(0, 2, 2))) for _ in range(args.variants + 100)]
        for _ in range(args.samples)
    ]
    genome, genome_path, vcf_path, variants, samples = write_sim_data(
        workdir, rng, truth, k=args.kmer_size,
        num_snv=int(args.variants * 0.85),
        num_ins=int(args.variants * 0.075),
        num_del=int(args.variants * 0.075),
        genome_len=genome_len, coverage=args.coverage,
    )
    t_sim = time.perf_counter() - t0
    print(f"[sim] {len(variants)} variants over {genome_len/1e6:.1f} Mb, "
          f"{args.samples} samples: {t_sim:.1f}s")

    ploidy = ChromosomePloidy.human_default()
    t0 = time.perf_counter()
    unit = run_cluster_phase(
        genome, samples, vcf_path, ploidy, kmer_size=args.kmer_size,
    )
    t_cluster = time.perf_counter() - t0
    print(f"[cluster] {t_cluster:.1f}s "
          f"({len(variants) / t_cluster:.0f} variants/s)")

    out_path = str(workdir / "genotypes.vcf")
    opts = GenotypeOptions(num_chains=args.chains)
    t0 = time.perf_counter()
    summary = genotype_unit(unit, samples, genome, ploidy, out_path, opts)
    t_geno = time.perf_counter() - t0
    print(f"[genotype] {t_geno:.1f}s ({len(variants) / t_geno:.0f} variants/s)")

    reader = VcfReader(out_path, parse_samples=True)
    pos_to_vi = {pos + 1: vi for vi, (pos, _, _) in enumerate(variants)}
    called = correct = total = 0
    for r in reader:
        vi = pos_to_vi[r.pos]
        for si, s in enumerate(r.samples):
            total += 1
            if "." in s["GT"]:
                continue
            called += 1
            a = tuple(sorted(int(x) for x in s["GT"].split("/")))
            correct += a == truth[si][vi]

    result = {
        "variants": len(variants),
        "samples": args.samples,
        "sim_s": round(t_sim, 1),
        "cluster_s": round(t_cluster, 1),
        "genotype_s": round(t_geno, 1),
        "cluster_variants_per_s": round(len(variants) / t_cluster, 1),
        "genotype_variants_per_s": round(len(variants) / t_geno, 1),
        "call_rate": round(called / total, 4),
        "concordance": round(correct / max(called, 1), 4),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
