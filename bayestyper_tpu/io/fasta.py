"""FASTA reading and the genome store.

Equivalent of Chromosomes (Chromosomes.cpp:38-175) + vcf++ FastaReader:
ordered chromosome list, name -> index map, decoy name set, uppercased
sequences. (The reference's convertToUpper iterates by value and is a latent
no-op — Chromosomes.cpp:169-175; we uppercase for real.)
"""

from __future__ import annotations

import gzip
from dataclasses import dataclass, field


def _open(path: str, mode="rt"):
    if path.endswith(".gz"):
        return gzip.open(path, mode)
    return open(path, mode)


def read_fasta(path: str):
    """Yield (name, sequence_bytes) records; sequence uppercased."""
    name = None
    chunks = []
    with _open(path, "rt") as fh:
        for line in fh:
            line = line.rstrip("\n")
            if not line:
                continue
            if line.startswith(">"):
                if name is not None:
                    yield name, "".join(chunks).upper().encode()
                name = line[1:].split()[0]
                chunks = []
            else:
                chunks.append(line)
    if name is not None:
        yield name, "".join(chunks).upper().encode()


def write_fasta(path: str, records, line_width=80):
    with _open(path, "wt") as fh:
        for name, seq in records:
            if isinstance(seq, bytes):
                seq = seq.decode()
            fh.write(f">{name}\n")
            for i in range(0, len(seq), line_width):
                fh.write(seq[i : i + line_width] + "\n")


@dataclass
class Genome:
    """Ordered chromosomes + decoys (Chromosomes.hpp)."""

    names: list = field(default_factory=list)
    sequences: dict = field(default_factory=dict)  # name -> bytes
    decoys: set = field(default_factory=set)

    @classmethod
    def load(cls, genome_path: str, decoy_path: str | None = None):
        g = cls()
        for name, seq in read_fasta(genome_path):
            g.names.append(name)
            g.sequences[name] = seq
        if decoy_path:
            for name, seq in read_fasta(decoy_path):
                g.names.append(name)
                g.sequences[name] = seq
                g.decoys.add(name)
        return g

    def __contains__(self, name):
        return name in self.sequences

    def __getitem__(self, name):
        return self.sequences[name]

    def is_decoy(self, name):
        return name in self.decoys

    def total_length(self, include_decoys=True):
        return sum(
            len(s) for n, s in self.sequences.items()
            if include_decoys or n not in self.decoys
        )
