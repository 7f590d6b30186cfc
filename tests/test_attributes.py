"""Typed attribute layer + SampleCall object model + inversion typing."""

from bayestyper_tpu.graph.variants import AlleleType, classify_allele, is_inversion
from bayestyper_tpu.io.attributes import (
    AttributeSet,
    CallStatus,
    Ploidy,
    SampleCall,
    format_typed,
    one_to_two_dim_idx,
    parse_number,
    parse_typed,
    two_to_one_dim_idx,
)


def test_typed_parsing():
    assert parse_typed("3", "Integer") == 3
    assert parse_typed("0.25", "Float") == 0.25
    assert parse_typed("x", "Character") == "x"
    assert parse_typed(".", "Integer") is None
    assert format_typed(0.123456789) == "0.123457"
    assert format_typed(None) == "."
    s = AttributeSet({"GQ": "99"})
    assert s.get_typed("GQ", "Integer") == 99
    s.set_typed("AF", 0.5)
    assert s["AF"] == "0.5"


def test_parse_number():
    assert parse_number("R", 3, 6) == 3
    assert parse_number("A", 3, 6) == 2
    assert parse_number("G", 3, 6) == 6
    assert parse_number(".", 3, 6) is None
    assert parse_number("2", 3, 6) == 2


def test_sample_call_model():
    c = SampleCall.from_gt("0/1")
    assert c.ploidy == Ploidy.DIPLOID
    assert c.call_status == CallStatus.COMPLETE
    assert c.genotype_estimate == [0, 1] and not c.phased
    assert c.gt_string() == "0/1"
    assert c.num_possible_genotypes(3) == 6

    c = SampleCall.from_gt("1|2")
    assert c.phased and c.gt_string() == "1|2"

    c = SampleCall.from_gt("./1")
    assert c.call_status == CallStatus.PARTIAL
    assert c.genotype_estimate == [1]
    assert c.gt_string() == "./."

    c = SampleCall.from_gt("1")
    assert c.ploidy == Ploidy.HAPLOID
    assert c.num_possible_genotypes(4) == 4

    c = SampleCall.from_gt(".")
    assert c.ploidy == Ploidy.ZEROPLOID
    assert c.call_status == CallStatus.MISSING
    assert not c.is_informative()


def test_genotype_index_roundtrip():
    # VCF spec ordering: genotype (j, k) with j<=k sits at k*(k+1)/2 + j
    seen = []
    for idx in range(15):
        pair = one_to_two_dim_idx(idx)
        assert pair[0] <= pair[1]
        assert two_to_one_dim_idx(pair) == idx
        seen.append(pair)
    assert seen[:6] == [(0, 0), (0, 1), (1, 1), (0, 2), (1, 2), (2, 2)]


def test_inversion_typing():
    ref = "ACCGGTTAACCGGATC"
    rc = ref.translate(str.maketrans("ACGT", "TGCA"))[::-1]
    assert is_inversion(rc, ref)
    assert classify_allele("T" + ref, "T" + rc) == AlleleType.INVERSION
    # one mismatch in 16 bases -> 15/16 < 0.95 -> Complex
    broken = ("A" if rc[0] != "A" else "C") + rc[1:]
    assert classify_allele("T" + ref, "T" + broken) == AlleleType.COMPLEX
    # below min size: never inversion
    assert not is_inversion("ACGT", "ACGT"[::-1].translate(
        str.maketrans("ACGT", "TGCA")))
    assert classify_allele("A", "T") == AlleleType.SNV
