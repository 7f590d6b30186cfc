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
        blooms.append(_load_sample_bloom(s.kmc_prefix))

    unit = run_cluster_phase(
        genome, samples, args.vcf_file, ploidy,
        sample_blooms=blooms,
        kmer_size=args.kmer_size,
        max_sample_haplotypes=args.max_number_of_sample_haplotypes,
        rng_seed=args.random_seed,
        max_allele_length=args.max_allele_length,
        cnv_threshold=args.copy_number_variant_threshold,
        num_threads=args.threads,
    )
    from .engine import split_units

    units = split_units(unit, args.min_number_of_unit_variants)
    for i, u in enumerate(units, 1):
        out = f"{args.output_prefix}_unit_{i}/variant_clusters.pkl"
        os.makedirs(os.path.dirname(out), exist_ok=True)
        u.save(out)
        print(f"Wrote inference unit to {out}")
    from .engine import write_cluster_data_artifacts

    write_cluster_data_artifacts(args.output_prefix, unit, genome)
    return 0


def cmd_genotype(args):
    from .engine import GenotypeOptions, InferenceUnitData, genotype_unit
    from .io.fasta import Genome
    from .io.samples import ChromosomePloidy, read_samples_tsv
    from .utils import jaxenv

    jaxenv.setup()

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
        max_haplotype_variant_kmers=args.max_haplotype_variant_kmers,
        disable_observed_kmers=args.disable_observed_kmers,
        num_host_threads=args.threads,
        noise_rate_prior=prior,
        noise_genotyping=args.noise_genotyping,
        random_seed=args.random_seed,
        num_devices=args.devices or None,
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


def _load_sample_bloom(kmc_prefix):
    """Sample read bloom: reference `.bloomMeta/.bloomData` artifacts take
    precedence (drop-in interop), then the native npz, else build from the
    KMC table."""
    import os

    from .ops.nthash import ReferenceKmerBloom

    if ReferenceKmerBloom.exists(kmc_prefix):
        return ReferenceKmerBloom.load(kmc_prefix)
    path = kmc_prefix + ".bloom.npz"
    if os.path.exists(path):
        from .ops.bloom import KmerBloomFilter

        return KmerBloomFilter.load(path)
    from .tools.make_bloom import kmc_to_bloom

    bloom, _ = kmc_to_bloom(kmc_prefix)
    return bloom


def cmd_make_bloom(args):
    from .tools.make_bloom import kmc_to_bloom

    _, out = kmc_to_bloom(
        args.kmer_table_prefix, run_test=args.run_test,
        reference_format=args.reference_format,
    )
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
    p.add_argument("--devices", type=int, default=0,
                   help="TPU chips for cluster-data-parallel genotyping "
                        "(0 = all visible devices)")
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
    p.add_argument("--reference-format", action="store_true",
                   help="write the reference's .bloomMeta/.bloomData pair "
                        "(ntHash layout) instead of the native npz")
    p.set_defaults(func=cmd_make_bloom)

    p = sub.add_parser("concat", help="concatenate per-unit genotype VCFs")
    p.add_argument("-v", "--vcf-files", required=True,
                   help="comma-separated per-unit VCF paths")
    p.add_argument("-o", "--output-prefix", required=True)
    p.add_argument("-z", "--gzip-output", action="store_true")
    p.set_defaults(func=cmd_concat)

    p = sub.add_parser("workflow",
                       help="full pipeline: [count kmers ->] makeBloom -> cluster -> genotype -> concat")
    _add_common(p)
    p.add_argument("-c", "--cluster-only", action="store_true")
    p.add_argument("--reads", default="",
                   help="comma-separated per-sample read files (fastq/fasta[.gz]) to count kmers when KMC tables are absent")
    p.add_argument("--min-kmer-count", type=int, default=1)
    p.add_argument("-u", "--min-number-of-unit-variants", type=int, default=5000000)
    p.add_argument("--max-number-of-sample-haplotypes", type=int, default=32)
    p.add_argument("-y", "--chromosome-ploidy-file", default="")
    p.add_argument("--number-of-gibbs-chains", type=int, default=20)
    p.add_argument("--gibbs-burn-in", type=int, default=100)
    p.add_argument("--gibbs-samples", type=int, default=250)
    p.add_argument("--kmer-subsampling-rate", type=float, default=0.1)
    p.add_argument("--max-haplotype-variant-kmers", type=int, default=500)
    p.add_argument("--noise-genotyping", action="store_true")
    p.add_argument("-p", "--threads", type=int, default=1)
    p.add_argument("--devices", type=int, default=0,
                   help="TPU chips for cluster-data-parallel genotyping "
                        "(0 = all visible devices)")
    p.add_argument("-z", "--gzip-output", action="store_true")
    p.set_defaults(func=cmd_workflow)

    from .tools import cli_ext

    cli_ext.register(sub)
    cli_ext.register_scripts(sub)

    args = parser.parse_args(argv)
    return args.func(args)


if __name__ == "__main__":
    sys.exit(main())


def cmd_concat(args):
    from .engine import concat_vcfs

    out = args.output_prefix + ".vcf" + (".gz" if args.gzip_output else "")
    n = concat_vcfs(args.vcf_files.split(","), out)
    print(f"Wrote {n} variants to {out}")
    return 0


def cmd_workflow(args):
    """End-to-end pipeline orchestration (the workflows/ Snakemake DAG
    equivalent, workflows/call_candidates_and_genotype.smk): count k-mers
    from reads when no KMC tables exist, build blooms, cluster into units,
    genotype every unit, concatenate."""
    import os

    from .engine import (
        GenotypeOptions, InferenceUnitData, concat_vcfs, genotype_unit,
        genotype_unit_joint, run_cluster_phase, split_units,
    )
    from .io.fasta import Genome
    from .io.samples import ChromosomePloidy, read_samples_tsv
    from .utils import jaxenv

    jaxenv.setup()
    genome = Genome.load(args.genome_file, args.decoy_file or None)
    samples = read_samples_tsv(args.samples_file)
    ploidy = (
        ChromosomePloidy.from_file(args.chromosome_ploidy_file)
        if args.chromosome_ploidy_file
        else ChromosomePloidy.human_default()
    )

    # 1. k-mer tables: build from reads when missing (replaces external KMC3)
    reads = args.reads.split(",") if args.reads else []
    for i, s in enumerate(samples):
        if os.path.exists(s.kmc_prefix + ".kmc_pre"):
            continue
        if i >= len(reads):
            raise SystemExit(
                f"no KMC table at {s.kmc_prefix} and no --reads entry for "
                f"sample {s.name}"
            )
        from .io.fastq import read_sequences
        from .io.kmc import count_kmers_from_sequences, write_kmc1

        print(f"Counting {args.kmer_size}-mers for {s.name} from {reads[i]}")
        hi, lo, counts = count_kmers_from_sequences(
            read_sequences(reads[i]), args.kmer_size, args.min_kmer_count
        )
        write_kmc1(s.kmc_prefix, hi, lo, counts, kmer_length=args.kmer_size)

    # 2. blooms
    from .ops.bloom import KmerBloomFilter
    from .tools.make_bloom import kmc_to_bloom

    blooms = [_load_sample_bloom(s.kmc_prefix) for s in samples]

    # 3. cluster -> units
    unit = run_cluster_phase(
        genome, samples, args.vcf_file, ploidy, sample_blooms=blooms,
        kmer_size=args.kmer_size,
        max_sample_haplotypes=args.max_number_of_sample_haplotypes,
        rng_seed=args.random_seed,
    )
    units = split_units(unit, args.min_number_of_unit_variants)
    unit_paths = []
    for i, u in enumerate(units, 1):
        path = f"{args.output_prefix}_unit_{i}/variant_clusters.pkl"
        os.makedirs(os.path.dirname(path), exist_ok=True)
        u.save(path)
        unit_paths.append(path)
    if args.cluster_only:
        return 0

    # 4. genotype each unit
    opts = GenotypeOptions(
        num_chains=args.number_of_gibbs_chains,
        burn_in=args.gibbs_burn_in,
        num_samples=args.gibbs_samples,
        kmer_subsampling_rate=args.kmer_subsampling_rate,
        max_haplotype_variant_kmers=args.max_haplotype_variant_kmers,
        noise_genotyping=args.noise_genotyping,
        random_seed=args.random_seed,
        num_host_threads=args.threads,
        num_devices=args.devices or None,
    )
    unit_vcfs = []
    for i, path in enumerate(unit_paths, 1):
        u = InferenceUnitData.load(path)
        out = f"{args.output_prefix}_unit_{i}/genotypes.vcf"
        fn = genotype_unit_joint if args.noise_genotyping else genotype_unit
        fn(u, samples, genome, ploidy, out, opts,
           command_lines=[_cmdline_header(args, "workflow")])
        unit_vcfs.append(out)

    # 5. concat
    final = args.output_prefix + ".vcf" + (".gz" if args.gzip_output else "")
    n = concat_vcfs(unit_vcfs, final)
    print(f"Wrote {n} variants to {final}")
    return 0
