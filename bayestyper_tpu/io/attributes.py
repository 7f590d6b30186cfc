"""Typed attribute values + the Sample object model of vcf++.

The reference's vcf++ stores INFO/FORMAT values as typed Attribute::Value
objects behind descriptors (Attribute.hpp:38-90, AttributeSet.cpp) and
models each sample as ploidy + call status + genotype estimate + per-allele
and per-genotype attribute sets (Sample.hpp:41-95). The pipeline-side
readers keep raw strings for speed; this module provides the typed layer
for the toolkit: descriptor-driven parsing/formatting and `SampleCall`,
including the reference's one-dim <-> two-dim genotype index conversion.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field


class CallStatus(enum.Enum):
    MISSING = "Missing"
    PARTIAL = "Partial"
    COMPLETE = "Complete"


class Ploidy(enum.Enum):
    ZEROPLOID = 0
    HAPLOID = 1
    DIPLOID = 2
    POLYPLOID = 3


def parse_typed(raw: str, type_str: str):
    """One raw VCF token -> typed value (Attribute::Value, Attribute.hpp).

    '.' parses to None; Flag has no token and is handled by the caller."""
    if raw is None or raw == ".":
        return None
    if type_str == "Integer":
        return int(raw)
    if type_str == "Float":
        return float(raw)
    if type_str == "Character":
        return raw[0]
    if type_str == "Flag":
        return True
    return raw


def format_typed(value) -> str:
    """Typed value -> VCF token (C++ ostream float formatting for floats)."""
    if value is None:
        return "."
    if isinstance(value, bool):
        return "1" if value else "0"
    if isinstance(value, float):
        return f"{value:.6g}"
    return str(value)


def parse_number(number_str: str, num_alleles: int, num_genotypes: int):
    """Expected value count for a Number= descriptor
    (Attribute::Number, Attribute.hpp: Zero..Four, R, A, G, Dot).
    Returns None for '.' (unbounded)."""
    if number_str == "R":
        return num_alleles
    if number_str == "A":
        return max(num_alleles - 1, 0)
    if number_str == "G":
        return num_genotypes
    if number_str == ".":
        return None
    return int(number_str)


class AttributeSet(dict):
    """Typed id -> value map (vcf++ AttributeSet): dict with typed helpers."""

    def get_typed(self, key, type_str, default=None):
        if key not in self:
            return default
        return parse_typed(self[key], type_str)

    def set_typed(self, key, value):
        self[key] = format_typed(value)


@dataclass
class SampleCall:
    """One sample's call (vcf++ Sample, Sample.hpp:41-95).

    genotype_estimate holds the CALLED allele indices only (missing GT
    components are dropped, making call_status Partial/Missing)."""

    ploidy: Ploidy
    call_status: CallStatus
    genotype_estimate: list
    phased: bool
    info: AttributeSet = field(default_factory=AttributeSet)

    @classmethod
    def from_gt(cls, gt: str):
        """Parse a raw GT token into ploidy/call-status/estimate
        (Sample ctor GT handling, Sample.cpp)."""
        if gt in (None, "", "."):
            return cls(Ploidy.ZEROPLOID, CallStatus.MISSING, [], False)
        phased = "|" in gt
        parts = gt.replace("|", "/").split("/")
        ploidy = {1: Ploidy.HAPLOID, 2: Ploidy.DIPLOID}.get(
            len(parts), Ploidy.POLYPLOID
        )
        called = [int(p) for p in parts if p != "."]
        if len(called) == len(parts):
            status = CallStatus.COMPLETE
        elif called:
            status = CallStatus.PARTIAL
        else:
            status = CallStatus.MISSING
        return cls(ploidy, status, called, phased)

    @classmethod
    def from_fields(cls, sample_dict: dict):
        call = cls.from_gt(sample_dict.get("GT", "."))
        for k, v in sample_dict.items():
            if k != "GT":
                call.info[k] = v
        return call

    def is_informative(self) -> bool:
        """Sample::isInformative: at least one called allele."""
        return bool(self.genotype_estimate)

    def num_possible_genotypes(self, num_alleles: int) -> int:
        if self.ploidy == Ploidy.DIPLOID:
            return num_alleles * (num_alleles + 1) // 2
        if self.ploidy == Ploidy.HAPLOID:
            return num_alleles
        return 0

    def gt_string(self) -> str:
        sep = "|" if self.phased else "/"
        if self.ploidy == Ploidy.ZEROPLOID:
            return "."
        n = 1 if self.ploidy == Ploidy.HAPLOID else (
            2 if self.ploidy == Ploidy.DIPLOID else len(self.genotype_estimate)
        )
        if self.call_status == CallStatus.COMPLETE:
            return sep.join(str(a) for a in self.genotype_estimate)
        return sep.join(["."] * n)


def one_to_two_dim_idx(idx: int):
    """Diploid genotype index -> unordered allele pair (a1 <= a2)
    (Sample::oneToTwoDimIdx): VCF ordering has genotype (j, k), j<=k, at
    index k*(k+1)/2 + j."""
    k = 0
    while (k + 1) * (k + 2) // 2 <= idx:
        k += 1
    j = idx - k * (k + 1) // 2
    return (j, k)


def two_to_one_dim_idx(pair) -> int:
    """Unordered allele pair -> diploid genotype index
    (Sample::twoToOneDimIdx)."""
    j, k = sorted(pair)
    return k * (k + 1) // 2 + j
