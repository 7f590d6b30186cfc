"""FASTQ reading (plain + gzip) for the built-in k-mer counter.

The reference pipeline counts read k-mers with external KMC3 (README "Usage"
1.2); with this reader + io.kmc.count_kmers_from_sequences +
tools.make_bloom the whole pipeline runs self-contained from FASTQ.
"""

from __future__ import annotations

import gzip


def _open(path: str):
    if path.endswith(".gz"):
        return gzip.open(path, "rt")
    return open(path, "rt")


def read_fastq(path: str):
    """Yield read sequences (bytes, uppercased) from a FASTQ file."""
    with _open(path) as fh:
        while True:
            header = fh.readline()
            if not header:
                return
            seq = fh.readline().rstrip("\n")
            fh.readline()  # +
            fh.readline()  # quals
            if not header.startswith("@"):
                raise ValueError(f"malformed FASTQ record header: {header!r}")
            yield seq.upper().encode()


def read_sequences(path: str):
    """Dispatch on extension: FASTQ or FASTA, yielding sequences."""
    from .fasta import read_fasta

    stripped = path[:-3] if path.endswith(".gz") else path
    if stripped.endswith((".fq", ".fastq")):
        yield from read_fastq(path)
    else:
        for _, seq in read_fasta(path):
            yield seq
