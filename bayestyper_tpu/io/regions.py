"""Genomic region strings (Regions.cpp:37-50): parse `chr:start-end` lists
and answer overlap queries."""

from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass


@dataclass(frozen=True)
class Region:
    chrom: str
    start: int   # 1-based inclusive
    end: int     # 1-based inclusive

    def overlaps(self, chrom: str, pos: int, end: int | None = None) -> bool:
        end = end if end is not None else pos
        return chrom == self.chrom and pos <= self.end and end >= self.start


class Regions:
    """Parsed `chr1:100-200,chr2,chrX:5000-` region set with overlap query."""

    def __init__(self, spec: str = ""):
        self.by_chrom = defaultdict(list)
        if spec:
            for part in spec.split(","):
                part = part.strip()
                if not part:
                    continue
                if ":" in part:
                    chrom, span = part.split(":", 1)
                    start_s, _, end_s = span.partition("-")
                    start = int(start_s) if start_s else 1
                    end = int(end_s) if end_s else 2**62
                else:
                    chrom, start, end = part, 1, 2**62
                self.by_chrom[chrom].append(Region(chrom, start, end))
        for chrom in self.by_chrom:
            self.by_chrom[chrom].sort(key=lambda r: r.start)

    def __bool__(self):
        return bool(self.by_chrom)

    def overlaps(self, chrom: str, pos: int, end: int | None = None) -> bool:
        """True when [pos, end] (1-based) overlaps any region; an empty
        region set matches everything (the reference's 'no restriction')."""
        if not self.by_chrom:
            return True
        return any(
            r.overlaps(chrom, pos, end) for r in self.by_chrom.get(chrom, [])
        )
