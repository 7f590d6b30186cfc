"""combine: vertical merge of candidate callsets.

Equivalent of bayesTyperTools combine (Combine.cpp:326-462): per contig,
variants from all callsets are keyed by position; same-position records merge
with the reference allele extended to the longest (addVariant,
Combine.cpp:245-324); every alt carries an ACO origin tag accumulating the
contributing callset names (updateOriginAttribute, Combine.cpp:209-234);
duplicate alts (after ref extension) merge their origins; alleles containing
ambiguous nucleotides are dropped. TODO(decomposition): the reference also
removes alts representable as a chain of other alleles
(getRedundantAlleleSets, Combine.cpp:99-207).
"""

from __future__ import annotations

from collections import defaultdict

from ..io.vcf import VcfMeta, VcfReader, VcfVariant, VcfWriter

_VALID_NT = frozenset("ACGT")


def combine(callsets, out_path):
    """callsets: [(name, vcf_path)]; writes the merged sites-only VCF."""
    readers = [(name, VcfReader(path)) for name, path in callsets]

    # merged contig list preserving order of first appearance
    meta = VcfMeta()
    seen_contigs = set()
    for _, r in readers:
        for c in r.meta.contigs:
            if c[0] not in seen_contigs:
                seen_contigs.add(c[0])
                meta.contigs.append(c)
    meta.add_info("ACO", "A", "String",
                  "Alternative allele call-set origin(s) (<call-set>:...)")

    # position-keyed merge per chromosome
    by_chrom = defaultdict(dict)  # chrom -> pos -> record
    stats = {"read": 0, "written": 0, "dropped_ambiguous": 0}
    for name, reader in readers:
        for v in reader:
            stats["read"] += 1
            ref = v.ref.upper()
            if not set(ref) <= _VALID_NT:
                stats["dropped_ambiguous"] += 1
                continue
            alts = []
            for a in v.alts:
                a = a.upper()
                if a.startswith("<") or set(a) <= _VALID_NT:
                    alts.append(a)
                else:
                    stats["dropped_ambiguous"] += 1
            if not alts:
                continue
            existing_aco = (v.info_get("ACO") or "").split(",")
            slot = by_chrom[v.chrom].setdefault(
                v.pos, {"ref": ref, "alts": {}, "ids": []}
            )
            _merge_into(slot, ref, alts, name, v.ids, existing_aco)

    with VcfWriter(out_path, meta) as w:
        contig_order = [c[0] for c in meta.contigs] or sorted(by_chrom)
        for chrom in contig_order:
            for pos in sorted(by_chrom.get(chrom, {})):
                slot = by_chrom[chrom][pos]
                alts = list(slot["alts"].keys())
                origins = [":".join(sorted(slot["alts"][a])) for a in alts]
                w.write(
                    VcfVariant(
                        chrom=chrom, pos=pos,
                        ids=sorted(set(slot["ids"])),
                        ref=slot["ref"], alts=alts,
                        qual=None, filters=[],
                        info={"ACO": ",".join(origins)},
                    )
                )
                stats["written"] += 1
    return stats


def _merge_into(slot, ref, alts, callset_name, ids, existing_aco):
    """Extend the slot's ref to the longest; re-suffix existing alts
    (addVariant, Combine.cpp:245-324)."""
    cur = slot["ref"]
    if len(ref) > len(cur):
        assert ref.startswith(cur), (ref, cur)
        suffix = ref[len(cur):]
        slot["ref"] = ref
        slot["alts"] = {
            (a + suffix if not a.startswith("<") else a): o
            for a, o in slot["alts"].items()
        }
    elif len(ref) < len(cur):
        assert cur.startswith(ref), (ref, cur)
        suffix = cur[len(ref):]
        alts = [a + suffix if not a.startswith("<") else a for a in alts]

    slot["ids"].extend(ids)
    for i, a in enumerate(alts):
        origins = slot["alts"].setdefault(a, set())
        prior = existing_aco[i] if i < len(existing_aco) and existing_aco[i] not in ("", ".") else None
        origins.add(prior if prior else callset_name)
