"""Analysis scripts tests."""

from bayestyper_tpu.io.vcf import VcfMeta, VcfVariant, VcfWriter
from bayestyper_tpu.tools.scripts import (
    collapse_summary_table,
    filter_allele_callset_origin,
    filter_structural_variants,
    get_genomic_intervals,
    get_summary,
    write_indels,
)


def _write(path, rows):
    meta = VcfMeta()
    meta.contigs = [("chr1", 100000)]
    with VcfWriter(str(path), meta) as w:
        for r in rows:
            w.write(r)
    return str(path)


def _var(pos, ref, alts, info=None):
    return VcfVariant("chr1", pos, [], ref, list(alts), None, [], info or {})


def test_get_summary(tmp_path):
    src = _write(tmp_path / "v.vcf", [
        _var(100, "A", ["C"]),
        _var(200, "AT", ["A"]),
        _var(300, "A", ["ACCGGTT"]),
        _var(400, "A", ["C", "G"]),
    ])
    nv, na = get_summary(src, str(tmp_path / "sum"))
    # num_alleles counts ref + alts like the reference (numAlls())
    assert (nv, na) == (4, 9)
    lines = open(str(tmp_path / "sum_allele.txt")).read().splitlines()
    assert lines[0] == (
        "Count\tChromType\tFilter\tAlleleType\tAlleleLength\tAlleleSVLength"
        "\tIsRedundant\tNumAlleles\tEffectiveNumAlleles\tACP\tAC\tAN\tACO"
        "\tHPL\tIsHomopolymer\tHTV\tNumCompleteSamples\tNumCONCTrue"
        "\tNumCONCFalse\tBASE\tCALL\tGTCO\tMED\tMinNAK\tMinFAK"
    )
    assert any("\tSNP\t" in x for x in lines)
    assert any("\tDeletion\t" in x for x in lines)
    assert any("\tInsertion\t" in x for x in lines)
    assert any("\tReference\t" in x for x in lines)
    vlines = open(str(tmp_path / "sum_variant.txt")).read().splitlines()
    assert vlines[0].startswith("Count\tChromType\tFilter\tVariantType")
    assert any("\tMulti\t" in x for x in vlines)
    assert all("Autosomal" in x for x in vlines[1:])


def test_get_summary_genotyped(tmp_path):
    meta = VcfMeta()
    meta.contigs = [("chr1", 100000)]
    meta.samples = ["s0", "s1"]
    rows = [
        VcfVariant(
            "chr1", 100, [], "A", ["C"], None, [], {"ACO": "cs1:cs2"},
            format_keys=["GT", "APP", "SAF", "NAK", "FAK"],
            samples=[
                {"GT": "0/1", "APP": "1,0.98", "SAF": "0,0",
                 "NAK": "5,4", "FAK": "0.9,0.8"},
                {"GT": "./.", "APP": "0.5,0.2", "SAF": "0,1",
                 "NAK": "-1,-1", "FAK": "-1,-1"},
            ],
        ),
    ]
    with VcfWriter(str(tmp_path / "g.vcf"), meta) as w:
        for r in rows:
            w.write(r)
    get_summary(str(tmp_path / "g.vcf"), str(tmp_path / "sum"))
    vlines = open(str(tmp_path / "sum_variant.txt")).read().splitlines()
    row = vlines[1].split("\t")
    hdr = vlines[0].split("\t")
    d = dict(zip(hdr, row))
    assert d["AN"] == "2"                # one called diploid sample
    assert d["EffectiveNumAlleles"] == "2"
    assert d["MaxAltACP"] == "0.98"      # s1's filtered APP excluded
    assert d["NumCompleteSamples"] == "1"
    assert d["ACO"] == "cs1:cs2"
    alines = open(str(tmp_path / "sum_allele.txt")).read().splitlines()
    ad = [dict(zip(alines[0].split("\t"), x.split("\t")))
          for x in alines[1:]]
    alt = next(x for x in ad if x["AlleleType"] == "SNP")
    assert alt["MinNAK"] == "4.0" and alt["MinFAK"] == "0.80"


def test_write_indels(tmp_path):
    src = _write(tmp_path / "v.vcf", [
        _var(100, "A", ["C"]),
        _var(200, "ATTTT", ["A"]),
        _var(300, "A", ["ACCG"]),
    ])
    n = write_indels(src, str(tmp_path / "indels"))
    assert n == 2
    fa = open(str(tmp_path / "indels.fa")).read()
    assert ">chr1_200_0_Deletion" in fa
    assert ">chr1_300_0_Insertion" in fa


def test_filter_sv_and_intervals(tmp_path):
    src = _write(tmp_path / "v.vcf", [
        _var(100, "A", ["C"]),
        _var(200, "A" + "T" * 80, ["A"]),
        _var(400, "A", ["A" + "G" * 60]),
    ])
    out = str(tmp_path / "sv.vcf")
    kept = filter_structural_variants(src, out, min_sv_length=50)
    assert kept == 2

    bed = str(tmp_path / "iv.bed")
    n = get_genomic_intervals(src, bed, flank=10)
    rows = open(bed).read().splitlines()
    assert n == len(rows) == 3
    assert rows[0] == "chr1\t89\t110"


def test_filter_aco(tmp_path):
    src = _write(tmp_path / "v.vcf", [
        _var(100, "A", ["C", "G"], {"ACO": "gatk,manta"}),
        _var(200, "A", ["T"], {"ACO": "manta"}),
    ])
    out = str(tmp_path / "aco.vcf")
    kept = filter_allele_callset_origin(src, out, ["gatk"])
    assert kept == 1
    from bayestyper_tpu.io.vcf import read_all

    _, variants = read_all(out)
    assert variants[0].alts == ["C"]


def test_collapse_summary_table(tmp_path):
    t = tmp_path / "t.txt"
    t.write_text("Count\tA\tB\n3\tx\t1\n4\tx\t2\n5\ty\t1\n")
    out = str(tmp_path / "c.txt")
    n = collapse_summary_table(str(t), out, ["A"])
    assert n == 2
    body = open(out).read()
    assert "7\tx" in body and "5\ty" in body


def test_convert_seq_to_allele_id(tmp_path):
    from bayestyper_tpu.tools.scripts import convert_seq_to_allele_id

    src = _write(tmp_path / "v.vcf", [
        _var(100, "A", ["ACCGGTTACCGGTT"]),
        _var(200, "A", ["C"]),
    ])
    n = convert_seq_to_allele_id(src, str(tmp_path / "sym"), min_length=10)
    assert n == 1
    from bayestyper_tpu.io.vcf import read_all

    _, variants = read_all(str(tmp_path / "sym.vcf"))
    assert variants[0].alts == ["<chr1_100_0>"]
    assert variants[1].alts == ["C"]
    fa = open(str(tmp_path / "sym_alleles.fa")).read()
    assert "ACCGGTTACCGGTT" in fa


def test_generate_diplotypes(tmp_path):
    from bayestyper_tpu.io.fasta import Genome
    from bayestyper_tpu.io.vcf import VcfMeta, VcfVariant, VcfWriter
    from bayestyper_tpu.tools.scripts import generate_diplotypes

    g = Genome()
    g.names = ["chr1"]
    g.sequences["chr1"] = b"AAAACCCCGGGGTTTT"
    meta = VcfMeta()
    meta.contigs = [("chr1", 16)]
    meta.samples = ["s0"]
    path = str(tmp_path / "g.vcf")
    with VcfWriter(path, meta) as w:
        w.write(VcfVariant("chr1", 5, [], "C", ["T"], None, [], {},
                           ["GT"], [{"GT": "0/1"}]))
    n = generate_diplotypes(path, g, str(tmp_path / "dip"))
    assert n == 2
    h1 = open(str(tmp_path / "dip_s0_h1.fa")).read().splitlines()[1]
    h2 = open(str(tmp_path / "dip_s0_h2.fa")).read().splitlines()[1]
    assert {h1, h2} == {"AAAACCCCGGGGTTTT", "AAAATCCCGGGGTTTT"}


def test_edit_distance_concordance(tmp_path):
    from bayestyper_tpu.io.vcf import VcfMeta, VcfVariant, VcfWriter
    from bayestyper_tpu.tools.scripts import add_edit_distance_and_concordance

    meta = VcfMeta()
    meta.contigs = [("chr1", 100000)]
    meta.samples = ["s0", "s1"]

    def _w(path, rows):
        with VcfWriter(str(path), meta) as w:
            for r in rows:
                w.write(r)
        return str(path)

    truth = _w(tmp_path / "t.vcf", [
        # different representation, same trimmed alt pair (AC->C == A->"")
        VcfVariant("chr1", 100, [], "ACT", ["CT"], None, [], {}, ["GT"],
                   [{"GT": "0/1"}, {"GT": "1/1"}]),
        VcfVariant("chr1", 300, [], "G", ["T"], None, [], {}, ["GT"],
                   [{"GT": "0/1"}, {"GT": "./."}]),
        VcfVariant("chr1", 900, [], "A", ["G"], None, [], {}, ["GT"],
                   [{"GT": "1/1"}, {"GT": "0/1"}]),
    ])
    calls = _w(tmp_path / "c.vcf", [
        VcfVariant("chr1", 100, [], "AC", ["C"], None, [], {}, ["GT"],
                   [{"GT": "1/0"}, {"GT": "0/1"}]),
        # second callset row at the same truth position: the truth GTCO
        # keeps the best (T from the first row)
        VcfVariant("chr1", 100, [], "AC", ["G"], None, [], {}, ["GT"],
                   [{"GT": "0/0"}, {"GT": "0/0"}]),
        VcfVariant("chr1", 5000, [], "G", ["T"], None, [], {}, ["GT"],
                   [{"GT": "1/1"}, {"GT": "0/0"}]),
    ])
    t_out = str(tmp_path / "ot.vcf")
    c_out = str(tmp_path / "oc.vcf")
    n_t, n_c = add_edit_distance_and_concordance(truth, calls, t_out, c_out)
    assert (n_t, n_c) == (3, 3)
    from bayestyper_tpu.io.vcf import read_all

    _, tv = read_all(t_out, parse_samples=True)
    _, cv = read_all(c_out, parse_samples=True)
    # pos 100: trimmed pairs match either phase -> T; s1 1/1 vs 0/1 -> P
    assert [s["GTCO"] for s in cv[0].samples] == ["T", "P"]
    # second row at pos 100: 0/0 vs truth 0/1 -> P ; vs 1/1 -> F
    assert [s["GTCO"] for s in cv[1].samples] == ["P", "F"]
    # truth keeps the best across both rows
    assert [s["GTCO"] for s in tv[0].samples] == ["T", "P"]
    # truth pos 300 unmatched: het -> P; no-call -> I
    assert [s["GTCO"] for s in tv[1].samples] == ["P", "I"]
    # truth pos 900 unmatched: hom-alt -> F; het -> P
    assert [s["GTCO"] for s in tv[2].samples] == ["F", "P"]
    # callset pos 5000 unmatched: hom-alt -> F; hom-ref -> T
    assert [s["GTCO"] for s in cv[2].samples] == ["F", "T"]


def test_transmission_support(tmp_path):
    from bayestyper_tpu.io.vcf import VcfMeta, VcfVariant, VcfWriter, read_all
    from bayestyper_tpu.tools.scripts import (
        assess_haplotype_transmission_support,
    )

    meta = VcfMeta()
    meta.contigs = [("chr1", 1000)]
    # trio: child inherits A (from father) + C (from mother);
    # father = A/B, mother = C/D
    meta.samples = ["child", "father", "mother"]
    path = str(tmp_path / "trio.vcf")
    with VcfWriter(path, meta) as w:
        # consistent: allele 1 on founder A, 0 on B/C/D ->
        # child 0/1, father 0/1, mother 0/0 (validates; TRUE)
        w.write(VcfVariant("chr1", 10, [], "A", ["C"], None, [], {}, ["GT"],
                           [{"GT": "0/1"}, {"GT": "0/1"}, {"GT": "0/0"}]))
        # impossible: child hom-alt but father hom-ref -> FALSE
        w.write(VcfVariant("chr1", 20, [], "A", ["C"], None, [], {}, ["GT"],
                           [{"GT": "1/1"}, {"GT": "0/0"}, {"GT": "1/1"}]))
        # all hom-ref: every founder assignment of a never-seen alt still
        # validates only with all founders = 0 for seen samples... the
        # all-ref assignment validates, plus assignments that put allele 1
        # on no inherited founder slot -> MULTI-TRUE is impossible here
        # since all four founders are inherited by someone; assignment is
        # unique -> TRUE
        w.write(VcfVariant("chr1", 30, [], "A", ["C"], None, [], {}, ["GT"],
                           [{"GT": "0/0"}, {"GT": "0/0"}, {"GT": "0/0"}]))
        # outside any block -> NA
        w.write(VcfVariant("chr1", 900, [], "A", ["C"], None, [], {}, ["GT"],
                           [{"GT": "0/0"}, {"GT": "0/0"}, {"GT": "0/0"}]))
    trans = str(tmp_path / "trans.txt")
    with open(trans, "w") as fh:
        fh.write("#chrom\tstart\tend\tchild\tfather\tmother\n")
        fh.write("chr1\t1\t100\tAC\tAB\tCD\n")
    counts = assess_haplotype_transmission_support(
        path, trans, str(tmp_path / "out")
    )
    assert counts["NA"] == 1
    assert counts["FALSE"] == 1
    assert counts["TRUE"] == 2
    _, rows = read_all(str(tmp_path / "out.vcf"))
    assert [r.info_get("HTV") for r in rows] == [
        "TRUE", "FALSE", "TRUE", "NA"
    ]


def test_convert_nested_genotypes(tmp_path):
    from bayestyper_tpu.io.vcf import VcfMeta, VcfVariant, VcfWriter
    from bayestyper_tpu.tools.scripts import convert_nested_genotypes

    meta = VcfMeta()
    meta.contigs = [("chr1", 1000)]
    meta.samples = ["s0"]
    path = str(tmp_path / "n.vcf")
    with VcfWriter(path, meta) as w:
        w.write(VcfVariant("chr1", 10, [], "A", ["C", "*"], None, [], {},
                           ["GT"], [{"GT": "1/2"}]))
    out = str(tmp_path / "o.vcf")
    n = convert_nested_genotypes(path, out)
    assert n == 1
    from bayestyper_tpu.io.vcf import read_all

    _, variants = read_all(out, parse_samples=True)
    assert variants[0].samples[0]["GT"] == "./."
