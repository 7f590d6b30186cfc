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
    assert (nv, na) == (4, 5)
    lines = open(str(tmp_path / "sum_allele.txt")).read().splitlines()
    assert lines[0].startswith("Count\t")
    assert any("SNV" in x for x in lines)
    assert any("Deletion" in x for x in lines)
    assert any("Insertion" in x for x in lines)


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
