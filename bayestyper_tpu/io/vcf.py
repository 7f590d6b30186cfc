"""Streaming VCF reader/writer with typed INFO/FORMAT metadata.

The working subset of the reference's vcf++ library (src/vcf++/VcfFile.cpp,
VcfMetaData.cpp, Variant.cpp): plain + gzip IO, header parse/store (contigs,
INFO/FILTER/FORMAT descriptors, samples), sites-only vs genotyped reading,
sortedness checking, and row serialisation. Variant records stay close to the
text representation (python dicts/lists) — the tensor representation lives in
the cluster compiler, not here.
"""

from __future__ import annotations

import gzip
import re
from dataclasses import dataclass, field


def _open(path: str, mode="rt"):
    if path.endswith(".gz"):
        return gzip.open(path, mode)
    return open(path, mode)


_STRUCT_RE = re.compile(r'##(\w+)=<(.+)>$')
_KV_RE = re.compile(r'(\w+)=("[^"]*"|[^,]*)')


@dataclass
class VcfMeta:
    fileformat: str = "VCFv4.2"
    contigs: list = field(default_factory=list)      # [(name, length|None)]
    info: dict = field(default_factory=dict)         # id -> {Number, Type, Description}
    fmt: dict = field(default_factory=dict)
    filters: dict = field(default_factory=dict)
    other: list = field(default_factory=list)        # verbatim ## lines
    samples: list = field(default_factory=list)

    def add_info(self, id_, number, type_, desc):
        self.info[id_] = {"Number": str(number), "Type": type_, "Description": desc}

    def add_format(self, id_, number, type_, desc):
        self.fmt[id_] = {"Number": str(number), "Type": type_, "Description": desc}

    def add_filter(self, id_, desc):
        self.filters[id_] = {"Description": desc}

    def contig_index(self):
        return {name: i for i, (name, _) in enumerate(self.contigs)}

    def header_lines(self):
        lines = [f"##fileformat={self.fileformat}"]
        lines.extend(self.other)
        for name, length in self.contigs:
            if length is None:
                lines.append(f"##contig=<ID={name}>")
            else:
                lines.append(f"##contig=<ID={name},length={length}>")
        for fid, d in self.filters.items():
            lines.append(f'##FILTER=<ID={fid},Description="{d["Description"]}">')
        for iid, d in self.info.items():
            lines.append(
                f'##INFO=<ID={iid},Number={d["Number"]},Type={d["Type"]},'
                f'Description="{d["Description"]}">'
            )
        for fid, d in self.fmt.items():
            lines.append(
                f'##FORMAT=<ID={fid},Number={d["Number"]},Type={d["Type"]},'
                f'Description="{d["Description"]}">'
            )
        cols = ["#CHROM", "POS", "ID", "REF", "ALT", "QUAL", "FILTER", "INFO"]
        if self.samples:
            cols += ["FORMAT"] + list(self.samples)
        lines.append("\t".join(cols))
        return lines


@dataclass
class VcfVariant:
    chrom: str
    pos: int                        # 1-based
    ids: list
    ref: str
    alts: list
    qual: float | None
    filters: list
    info: dict                      # id -> raw string value (or True for flags)
    format_keys: list = field(default_factory=list)
    samples: list = field(default_factory=list)      # list of dicts key->str

    def info_get(self, key, default=None):
        return self.info.get(key, default)

    def row(self) -> str:
        ids = ";".join(self.ids) if self.ids else "."
        alts = ",".join(self.alts) if self.alts else "."
        qual = "." if self.qual is None else (
            f"{self.qual:g}" if isinstance(self.qual, float) else str(self.qual)
        )
        filt = ";".join(self.filters) if self.filters else "."
        if self.info:
            parts = []
            for k, v in self.info.items():
                parts.append(k if v is True else f"{k}={v}")
            info = ";".join(parts)
        else:
            info = "."
        cols = [self.chrom, str(self.pos), ids, self.ref, alts, qual, filt, info]
        if self.format_keys:
            cols.append(":".join(self.format_keys))
            for s in self.samples:
                cols.append(":".join(str(s.get(k, ".")) for k in self.format_keys))
        return "\t".join(cols)


def _parse_struct_line(kind, body, meta):
    kv = {m.group(1): m.group(2).strip('"') for m in _KV_RE.finditer(body)}
    if kind == "contig":
        length = int(kv["length"]) if "length" in kv else None
        meta.contigs.append((kv["ID"], length))
    elif kind == "INFO":
        meta.info[kv["ID"]] = {
            "Number": kv.get("Number", "."),
            "Type": kv.get("Type", "String"),
            "Description": kv.get("Description", ""),
        }
    elif kind == "FORMAT":
        meta.fmt[kv["ID"]] = {
            "Number": kv.get("Number", "."),
            "Type": kv.get("Type", "String"),
            "Description": kv.get("Description", ""),
        }
    elif kind == "FILTER":
        meta.filters[kv["ID"]] = {"Description": kv.get("Description", "")}
    else:
        return False
    return True


class VcfReader:
    """Streaming reader. parse_samples=False skips FORMAT/sample columns
    (VcfFileReader vs GenotypedVcfFileReader, VcfFile.hpp:90-129)."""

    def __init__(self, path: str, parse_samples: bool = False):
        self.path = path
        self.parse_samples = parse_samples
        self.meta = VcfMeta()
        self._fh = _open(path, "rt")
        self._read_header()
        self._last = None  # (chrom_idx, pos) sortedness check

    def _read_header(self):
        for line in self._fh:
            line = line.rstrip("\n")
            if line.startswith("##"):
                m = _STRUCT_RE.match(line)
                if m and _parse_struct_line(m.group(1), m.group(2), self.meta):
                    continue
                if line.startswith("##fileformat="):
                    self.meta.fileformat = line.split("=", 1)[1]
                else:
                    self.meta.other.append(line)
            elif line.startswith("#CHROM"):
                cols = line.split("\t")
                if len(cols) > 9:
                    self.meta.samples = cols[9:]
                return
            else:
                raise ValueError(f"malformed VCF header in {self.path}: {line!r}")

    def __iter__(self):
        return self

    def __next__(self) -> VcfVariant:
        for line in self._fh:
            line = line.rstrip("\n")
            if not line:
                continue
            return self._parse_row(line)
        self._fh.close()
        raise StopIteration

    def _parse_row(self, line: str) -> VcfVariant:
        cols = line.split("\t")
        chrom, pos, ids, ref, alts, qual, filt, info = cols[:8]
        v = VcfVariant(
            chrom=chrom,
            pos=int(pos),
            ids=[] if ids == "." else ids.split(";"),
            ref=ref,
            alts=[] if alts == "." else alts.split(","),
            qual=None if qual == "." else float(qual),
            filters=[] if filt == "." else filt.split(";"),
            info=self._parse_info(info),
        )
        if self.parse_samples and len(cols) > 9:
            v.format_keys = cols[8].split(":")
            for s in cols[9:]:
                vals = s.split(":")
                v.samples.append(
                    {k: vals[i] if i < len(vals) else "."
                     for i, k in enumerate(v.format_keys)}
                )
        return v

    @staticmethod
    def _parse_info(info: str) -> dict:
        out = {}
        if info == ".":
            return out
        for part in info.split(";"):
            if "=" in part:
                k, val = part.split("=", 1)
                out[k] = val
            elif part:
                out[part] = True
        return out

    def close(self):
        self._fh.close()


class VcfWriter:
    def __init__(self, path: str, meta: VcfMeta):
        self.path = path
        self.meta = meta
        self._fh = _open(path, "wt")
        for line in meta.header_lines():
            self._fh.write(line + "\n")

    def write(self, variant: VcfVariant):
        self._fh.write(variant.row() + "\n")

    def close(self):
        self._fh.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def merge_contigs(contigs_a, contigs_b):
    """Merge two contig lists preserving order (Auxiliaries::mergeContigs):
    contigs of `a` first, then contigs only in `b`; lengths must agree when
    both sides carry one."""
    merged = list(contigs_a)
    seen = {name: length for name, length in contigs_a}
    for name, length in contigs_b:
        if name in seen:
            if length is not None and seen[name] is not None:
                assert length == seen[name], (name, length, seen[name])
        else:
            merged.append((name, length))
    return merged


def read_all(path: str, parse_samples=False):
    r = VcfReader(path, parse_samples)
    variants = list(r)
    return r.meta, variants


def remove_alts(variant: VcfVariant, remove_indices) -> VcfVariant:
    """Remove alt alleles (0-based alt indices) with genotype fix-ups
    (Variant::removeAlts, Variant.hpp:76): GT indices pointing at removed
    alleles become '.', surviving indices are renumbered; allele-numbered
    INFO fields (Number=A) are subset."""
    remove = set(remove_indices)
    keep = [i for i in range(len(variant.alts)) if i not in remove]
    old_to_new = {0: 0}
    for new_i, old_i in enumerate(keep):
        old_to_new[old_i + 1] = new_i + 1

    variant.alts = [variant.alts[i] for i in keep]
    for key, val in list(variant.info.items()):
        if isinstance(val, str) and val.count(",") == len(remove) + len(keep) - 1:
            parts = val.split(",")
            variant.info[key] = ",".join(parts[i] for i in keep)

    for s in variant.samples:
        gt = s.get("GT")
        if not gt or gt == ".":
            continue
        sep = "|" if "|" in gt else "/"
        out = []
        for a in gt.split(sep):
            if a == ".":
                out.append(".")
            else:
                out.append(str(old_to_new.get(int(a), ".")) if int(a) in old_to_new else ".")
        s["GT"] = sep.join(out)
    return variant
