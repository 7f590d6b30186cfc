"""Command-line interface: `bayestyper-tpu {cluster,genotype,tools ...}`.

Mirrors the reference CLIs (bayesTyper main.cpp:93-96 subcommands + flag
defaults main.cpp:112-407; bayesTyperTools main.cpp:74-99) with the same
option names so existing pipelines translate 1:1. Every option is recorded
into the output VCF ##commandline header (OptionsContainer::getHeader,
OptionsContainer.hpp:44-88 -> GenotypeWriter.cpp:513-514).
"""

from __future__ import annotations

import argparse
import os
import sys


def _cmdline_header(args, name):
    opts = " ".join(
        f"--{k.replace('_', '-')}={v}" for k, v in sorted(vars(args).items())
        if k != "func" and v is not None
    )
    return f"bayesTyperTpu {name} {opts}"


def _add_common(p):
    p.add_argument("-g", "--genome-file", required=True,
                   help="reference genome file (fasta format)")
    p.add_argument("-v", "--vcf-file", help="variant file (vcf format)")
    p.add_argument("-s", "--samples-file", required=True,
                   help="samples file (tab-separated: name, sex (F|M), KMC table prefix)")
    p.add_argument("-d", "--decoy-file", default="",
                   help="decoy sequences file (fasta format)")
    p.add_argument("-o", "--output-prefix", default="bayestyper")
    p.add_argument("-r", "--random-seed", type=int, default=1)
    p.add_argument("-k", "--kmer-size", type=int, default=55)


def cmd_cluster(args):
    from .engine import run_cluster_phase
    from .io.fasta import Genome
    from .io.samples import ChromosomePloidy, read_samples_tsv
    from .ops.bloom import KmerBloomFilter

    genome = Genome.load(args.genome_file, args.decoy_file or None)
    samples = read_samples_tsv(args.samples_file)
    ploidy = (
        ChromosomePloidy.from_file(args.chromosome_ploidy_file)
        if args.chromosome_ploidy_file
        else ChromosomePloidy.human_default()
    )

    blooms = []
    for s in samples:
        bloom_path = s.kmc_prefix + ".bloom.npz"
        if os.path.exists(bloom_path):
            blooms.append(KmerBloomFilter.load(bloom_path))
        else:
            from .tools.make_bloom import kmc_to_bloom

            bloom, _ = kmc_to_bloom(s.kmc_prefix)
            blooms.append(bloom)

    unit = run_cluster_phase(
        genome, samples, args.vcf_file, ploidy,
        sample_blooms=blooms,
        kmer_size=args.kmer_size,
        max_sample_haplotypes=args.max_number_of_sample_haplotypes,
        rng_seed=args.random_seed,
    )
    out = f"{args.output_prefix}_unit_1/variant_clusters.pkl"
    os.makedirs(os.path.dirname(out), exist_ok=True)
    unit.save(out)
    print(f"Wrote inference unit to {out}")
    return 0


def cmd_genotype(args):
    from .engine import GenotypeOptions, InferenceUnitData, genotype_unit
    from .io.fasta import Genome
    from .io.samples import ChromosomePloidy, read_samples_tsv

    genome = Genome.load(args.genome_file, args.decoy_file or None)
    samples = read_samples_tsv(args.samples_file)
    ploidy = (
        ChromosomePloidy.from_file(args.chromosome_ploidy_file)
        if args.chromosome_ploidy_file
        else ChromosomePloidy.human_default()
    )
    unit = InferenceUnitData.load(args.cluster_file)

    prior = tuple(float(x) for x in args.noise_rate_prior.split(","))
    opts = GenotypeOptions(
        num_chains=args.number_of_gibbs_chains,
        burn_in=args.gibbs_burn_in,
        num_samples=args.gibbs_samples,
        kmer_subsampling_rate=args.kmer_subsampling_rate,
        min_genotype_posterior=args.min_genotype_posterior,
        min_number_of_kmers=args.min_number_of_kmers,
        disable_observed_kmers=args.disable_observed_kmers,
        noise_rate_prior=prior,
        noise_genotyping=args.noise_genotyping,
        random_seed=args.random_seed,
    )
    out = args.output_prefix + ".vcf" + (".gz" if args.gzip_output else "")
    if opts.noise_genotyping:
        from .engine import genotype_unit_joint

        genotype_unit_joint(
            unit, samples, genome, ploidy, out, opts,
            command_lines=[_cmdline_header(args, "genotype")],
        )
    else:
        genotype_unit(
            unit, samples, genome, ploidy, out, opts,
            command_lines=[_cmdline_header(args, "genotype")],
        )
    return 0


def cmd_make_bloom(args):
    from .tools.make_bloom import kmc_to_bloom

    _, out = kmc_to_bloom(args.kmer_table_prefix, run_test=args.run_test)
    print(f"Wrote bloom filter to {out}")
    return 0


def main(argv=None):
    parser = argparse.ArgumentParser(
        prog="bayestyper-tpu",
        description="TPU-native Bayesian genotyper (BayesTyper capabilities)",
    )
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("cluster", help="preprocess candidate variants into inference units")
    _add_common(p)
    p.add_argument("-p", "--threads", type=int, default=1)
    p.add_argument("-u", "--min-number-of-unit-variants", type=int, default=5000000)
    p.add_argument("--max-allele-length", type=int, default=500000)
    p.add_argument("--copy-number-variant-threshold", type=float, default=0.5)
    p.add_argument("--max-number-of-sample-haplotypes", type=int, default=32)
    p.add_argument("-y", "--chromosome-ploidy-file", default="")
    p.set_defaults(func=cmd_cluster)

    p = sub.add_parser("genotype", help="genotype inference unit against sample k-mer counts")
    _add_common(p)
    p.add_argument("-c", "--cluster-file", required=True,
                   help="inference unit file from the cluster phase")
    p.add_argument("-z", "--gzip-output", action="store_true")
    p.add_argument("-p", "--threads", type=int, default=1)
    p.add_argument("-y", "--chromosome-ploidy-file", default="")
    p.add_argument("--gibbs-burn-in", type=int, default=100)
    p.add_argument("--gibbs-samples", type=int, default=250)
    p.add_argument("--number-of-gibbs-chains", type=int, default=20)
    p.add_argument("--kmer-subsampling-rate", type=float, default=0.1)
    p.add_argument("--max-haplotype-variant-kmers", type=int, default=500)
    p.add_argument("--noise-genotyping", action="store_true")
    p.add_argument("--noise-rate-prior", default="1,0.01")
    p.add_argument("--min-genotype-posterior", type=float, default=0.99)
    p.add_argument("--min-number-of-kmers", type=float, default=1.0)
    p.add_argument("--disable-observed-kmers", action="store_true")
    p.set_defaults(func=cmd_genotype)

    p = sub.add_parser("makeBloom", help="KMC table -> bloom filter")
    p.add_argument("-k", "--kmer-table-prefix", required=True)
    p.add_argument("--run-test", action="store_true")
    p.set_defaults(func=cmd_make_bloom)

    from .tools import cli_ext

    cli_ext.register(sub)

    args = parser.parse_args(argv)
    return args.func(args)


if __name__ == "__main__":
    sys.exit(main())
