"""Registration of the bayesTyperTools-equivalent subcommands
(bayesTyperTools main.cpp:74-99): combine, convertAllele, filter, annotate,
addAttributes. Implemented incrementally in this package's tools modules."""

from __future__ import annotations


def register(sub):
    p = sub.add_parser("combine", help="combine callsets vertically (non-overlapping variants are merged)")
    p.add_argument("-v", "--vcf-files", required=True,
                   help="comma-separated list of <name>:<path> callsets")
    p.add_argument("-o", "--output-prefix", required=True)
    p.add_argument("-z", "--gzip-output", action="store_true")
    p.set_defaults(func=_cmd_combine)

    p = sub.add_parser("convertAllele", help="convert symbolic alleles (<DEL>, <DUP>, <INV>, <INS>, <CN#>) to sequence")
    p.add_argument("-v", "--vcf-file", required=True)
    p.add_argument("-g", "--genome-file", required=True)
    p.add_argument("-o", "--output-prefix", required=True)
    p.add_argument("--alt-file", default="", help="fasta with named alternative allele sequences")
    p.add_argument("--mei-file", default="", help="fasta with mobile element insertion sequences")
    p.add_argument("--keep-imprecise", action="store_true")
    p.add_argument("--keep-partial", action="store_true")
    p.add_argument("-z", "--gzip-output", action="store_true")
    p.set_defaults(func=_cmd_convert_allele)

    p = sub.add_parser("annotate", help="annotate alleles by similarity to an annotation VCF")
    p.add_argument("-v", "--vcf-file", required=True)
    p.add_argument("-a", "--annotation-file", required=True)
    p.add_argument("-o", "--output-prefix", required=True)
    p.add_argument("--match-threshold", type=float, default=0.5)
    p.add_argument("--window-size-scale", type=float, default=3.0)
    p.add_argument("--clear-prev-annotation", action="store_true")
    p.add_argument("-z", "--gzip-output", action="store_true")
    p.set_defaults(func=_cmd_annotate)

    p = sub.add_parser("addAttributes", help="add HPL/RMA/IBC/CONC attributes")
    p.add_argument("-v", "--vcf-file", required=True)
    p.add_argument("-o", "--output-prefix", required=True)
    p.add_argument("-g", "--genome-file", default="")
    p.add_argument("--repeat-file", default="", help="RepeatMasker .out file")
    p.add_argument("--independent-samples-regex", default="",
                   help="regex selecting samples for the inbreeding coefficient")
    p.add_argument("--trio-info", default="",
                   help="comma-separated trios <child>:<father>:<mother>;...")
    p.add_argument("-z", "--gzip-output", action="store_true")
    p.set_defaults(func=_cmd_add_attributes)

    p = sub.add_parser("filter", help="filter genotyped variants")
    p.add_argument("-v", "--vcf-file", required=True)
    p.add_argument("-o", "--output-prefix", required=True)
    p.add_argument("--min-homozygote-genotypes", type=int, default=0)
    p.add_argument("--min-genotype-posterior", type=float, default=0.99)
    p.add_argument("--min-number-of-kmers", type=float, default=1.0)
    p.add_argument("--kmer-coverage-file", default="",
                   help="genomic parameters file from genotyping (for FAK thresholds)")
    p.add_argument("-z", "--gzip-output", action="store_true")
    p.set_defaults(func=_cmd_filter)


def register_scripts(sub):
    """Analysis scripts (src/bayesTyperTools/scripts equivalents)."""
    p = sub.add_parser("getSummary", help="variant/allele summary count tables")
    p.add_argument("-v", "--vcf-file", required=True)
    p.add_argument("-o", "--output-prefix", required=True)
    p.set_defaults(func=lambda a: _run(
        "get_summary", a.vcf_file, a.output_prefix))

    p = sub.add_parser("writeIndels", help="extract indel sequences to fasta")
    p.add_argument("-v", "--vcf-file", required=True)
    p.add_argument("-o", "--output-prefix", required=True)
    p.add_argument("--min-length", type=int, default=1)
    p.set_defaults(func=lambda a: _run(
        "write_indels", a.vcf_file, a.output_prefix, a.min_length))

    p = sub.add_parser("filterStructuralVariants", help="filter by SV length")
    p.add_argument("-v", "--vcf-file", required=True)
    p.add_argument("-o", "--output-prefix", required=True)
    p.add_argument("--min-sv-length", type=int, default=50)
    p.add_argument("--max-sv-length", type=int, default=10**9)
    p.set_defaults(func=lambda a: _run(
        "filter_structural_variants", a.vcf_file, a.output_prefix + ".vcf",
        a.min_sv_length, a.max_sv_length))

    p = sub.add_parser("filterAlleleCallsetOrigin", help="filter alts by ACO")
    p.add_argument("-v", "--vcf-file", required=True)
    p.add_argument("-o", "--output-prefix", required=True)
    p.add_argument("-c", "--callsets", required=True,
                   help="comma-separated callset names to keep")
    p.set_defaults(func=lambda a: _run(
        "filter_allele_callset_origin", a.vcf_file, a.output_prefix + ".vcf",
        a.callsets.split(",")))

    p = sub.add_parser("getGenomicIntervals", help="variant intervals as BED")
    p.add_argument("-v", "--vcf-file", required=True)
    p.add_argument("-o", "--output-prefix", required=True)
    p.add_argument("--flank", type=int, default=0)
    p.set_defaults(func=lambda a: _run(
        "get_genomic_intervals", a.vcf_file, a.output_prefix + ".bed", a.flank))

    p = sub.add_parser("collapseSummaryTable", help="collapse a summary table")
    p.add_argument("-t", "--table-file", required=True)
    p.add_argument("-o", "--output-prefix", required=True)
    p.add_argument("-c", "--columns", required=True,
                   help="comma-separated columns to keep")
    p.set_defaults(func=lambda a: _run(
        "collapse_summary_table", a.table_file, a.output_prefix + ".txt",
        a.columns.split(",")))

    p = sub.add_parser("getKmerStats", help="per-allele kmer support vs a KMC table")
    p.add_argument("-v", "--vcf-file", required=True)
    p.add_argument("-k", "--kmer-table-prefix", required=True)
    p.add_argument("-o", "--output-prefix", required=True)
    p.set_defaults(func=lambda a: _run(
        "get_kmer_stats", a.vcf_file, a.kmer_table_prefix,
        a.output_prefix + ".txt"))

    p = sub.add_parser("convertSeqToAlleleId", help="long alleles -> symbolic IDs + fasta")
    p.add_argument("-v", "--vcf-file", required=True)
    p.add_argument("-o", "--output-prefix", required=True)
    p.add_argument("--min-length", type=int, default=10)
    p.set_defaults(func=lambda a: _run(
        "convert_seq_to_allele_id", a.vcf_file, a.output_prefix, a.min_length))

    p = sub.add_parser("generateDiplotypes", help="per-sample haplotype fastas from genotypes")
    p.add_argument("-v", "--vcf-file", required=True)
    p.add_argument("-g", "--genome-file", required=True)
    p.add_argument("-o", "--output-prefix", required=True)
    p.set_defaults(func=_cmd_generate_diplotypes)

    p = sub.add_parser("convertNestedGenotypes", help="missing-allele genotypes -> './.'")
    p.add_argument("-v", "--vcf-file", required=True)
    p.add_argument("-o", "--output-prefix", required=True)
    p.set_defaults(func=lambda a: _run(
        "convert_nested_genotypes", a.vcf_file, a.output_prefix + ".vcf"))

    p = sub.add_parser("addEditDistanceAndCondordance",
                       help="per-sample GTCO concordance between a truth VCF "
                            "and a callset (annotates both)")
    p.add_argument("-t", "--truth-file", required=True)
    p.add_argument("-v", "--vcf-file", required=True, help="callset VCF")
    p.add_argument("-o", "--output-prefix", required=True)
    p.add_argument("--read-length", type=int, default=100)
    p.set_defaults(func=lambda a: _run(
        "add_edit_distance_and_concordance", a.truth_file, a.vcf_file,
        a.output_prefix + "_truth.vcf", a.output_prefix + "_callset.vcf",
        a.read_length))

    p = sub.add_parser("assessHaplotypeTransmissionSupport",
                       help="annotate HTV from a haplotype-transmissions "
                            "file (founder haplotypes A-D per interval)")
    p.add_argument("-v", "--vcf-file", required=True)
    p.add_argument("-t", "--transmissions-file", required=True)
    p.add_argument("-o", "--output-prefix", required=True)
    p.set_defaults(func=_cmd_transmission)


def _cmd_generate_diplotypes(args):
    from . import scripts
    from ..io.fasta import Genome

    genome = Genome.load(args.genome_file)
    n = scripts.generate_diplotypes(args.vcf_file, genome, args.output_prefix)
    print(f"generate_diplotypes: wrote {n} haplotype fastas")
    return 0


def _cmd_transmission(args):
    from . import scripts

    stats = scripts.assess_haplotype_transmission_support(
        args.vcf_file, args.transmissions_file, args.output_prefix
    )
    print(f"assess_haplotype_transmission_support: {stats}")
    return 0


def _run(name, *fn_args):
    from . import scripts

    result = getattr(scripts, name)(*fn_args)
    print(f"{name}: {result}")
    return 0


def _cmd_combine(args):
    from .combine import combine

    out = args.output_prefix + ".vcf" + (".gz" if args.gzip_output else "")
    specs = []
    for part in args.vcf_files.split(","):
        name, path = part.split(":", 1)
        specs.append((name, path))
    combine(specs, out)
    return 0


def _cmd_convert_allele(args):
    from .convert_allele import convert_allele
    from ..io.fasta import Genome

    genome = Genome.load(args.genome_file)
    out = args.output_prefix + ".vcf" + (".gz" if args.gzip_output else "")
    convert_allele(
        args.vcf_file, genome, out,
        alt_file=args.alt_file or None,
        mei_file=args.mei_file or None,
        keep_imprecise=args.keep_imprecise,
        keep_partial=args.keep_partial,
    )
    return 0


def _cmd_annotate(args):
    from .annotate import annotate

    out = args.output_prefix + ".vcf" + (".gz" if args.gzip_output else "")
    annotate(
        args.vcf_file, args.annotation_file, out,
        match_threshold=args.match_threshold,
        window_size_scale=args.window_size_scale,
        clear_prev_annotation=args.clear_prev_annotation,
    )
    return 0


def _cmd_add_attributes(args):
    from .add_attributes import add_attributes
    from ..io.fasta import Genome

    genome = Genome.load(args.genome_file) if args.genome_file else None
    trios = []
    if args.trio_info:
        for part in args.trio_info.split(","):
            child, father, mother = part.split(":")
            trios.append((child, father, mother))
    out = args.output_prefix + ".vcf" + (".gz" if args.gzip_output else "")
    add_attributes(
        args.vcf_file, out, genome=genome,
        repeatmasker_file=args.repeat_file or None,
        independent_samples_regex=args.independent_samples_regex or None,
        trios=trios or None,
    )
    return 0


def _cmd_filter(args):
    from .filter_tool import filter_vcf

    out = args.output_prefix + ".vcf" + (".gz" if args.gzip_output else "")
    filter_vcf(
        args.vcf_file, out,
        min_homozygote_genotypes=args.min_homozygote_genotypes,
        min_genotype_posterior=args.min_genotype_posterior,
        min_number_of_kmers=args.min_number_of_kmers,
        kmer_coverage_file=args.kmer_coverage_file or None,
    )
    return 0
