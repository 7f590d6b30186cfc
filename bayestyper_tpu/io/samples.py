"""Sample descriptors + chromosome ploidy model.

Equivalents of Sample (Sample.cpp:38-67: samples.tsv row = name, gender F/M,
KMC path prefix) and ChromosomePloidy (ChromosomePloidy.cpp:40-196: human
chrX/chrY defaults by name or a 3-column ploidy file).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..constants import (
    GENDER_FEMALE,
    GENDER_MALE,
    MAX_SAMPLES,
    PLOIDY_DIPLOID,
    PLOIDY_HAPLOID,
    PLOIDY_NULL,
)


@dataclass
class Sample:
    name: str
    gender: int       # GENDER_FEMALE / GENDER_MALE
    kmc_prefix: str


def read_samples_tsv(path: str):
    """Parse samples.tsv: <name>\t<F|M>\t<kmc path prefix> (Sample.cpp:38-67)."""
    samples = []
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split("\t")
            if len(parts) != 3:
                raise ValueError(f"samples file row needs 3 columns: {line!r}")
            name, gender, prefix = parts
            g = gender.upper()
            if g not in ("F", "M"):
                raise ValueError(f"gender must be F or M: {line!r}")
            samples.append(
                Sample(name, GENDER_FEMALE if g == "F" else GENDER_MALE, prefix)
            )
    if not samples:
        raise ValueError(f"no samples in {path}")
    if len(samples) > MAX_SAMPLES:
        raise ValueError(f"at most {MAX_SAMPLES} samples supported (main.cpp:188)")
    return samples


_HUMAN_X = {"chrX", "X", "chrx", "x"}
_HUMAN_Y = {"chrY", "Y", "chry", "y"}


class ChromosomePloidy:
    """chrom x gender -> ploidy level (ChromosomePloidy.cpp:40-196)."""

    def __init__(self, table: dict | None = None):
        # table: chrom -> (female_ploidy, male_ploidy)
        self.table = table or {}

    @classmethod
    def human_default(cls):
        return cls({})

    @classmethod
    def from_file(cls, path: str):
        table = {}
        with open(path) as fh:
            for line in fh:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                chrom, female, male = line.split("\t")
                table[chrom] = (int(female), int(male))
        return cls(table)

    def ploidy(self, chrom: str, gender: int) -> int:
        if chrom in self.table:
            p = self.table[chrom][0 if gender == GENDER_FEMALE else 1]
            assert p in (PLOIDY_NULL, PLOIDY_HAPLOID, PLOIDY_DIPLOID)
            return p
        # human defaults by chromosome name (ChromosomePloidy.cpp:40-92)
        if chrom in _HUMAN_X:
            return PLOIDY_DIPLOID if gender == GENDER_FEMALE else PLOIDY_HAPLOID
        if chrom in _HUMAN_Y:
            return PLOIDY_NULL if gender == GENDER_FEMALE else PLOIDY_HAPLOID
        return PLOIDY_DIPLOID

    def sample_ploidies(self, chrom: str, samples) -> np.ndarray:
        return np.array(
            [self.ploidy(chrom, s.gender) for s in samples], dtype=np.int8
        )
