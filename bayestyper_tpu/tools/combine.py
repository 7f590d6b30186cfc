"""combine: vertical merge of candidate callsets.

Equivalent of bayesTyperTools combine (Combine.cpp:326-462): per contig,
variants from all callsets are keyed by position; same-position records merge
with the reference allele extended to the longest (addVariant,
Combine.cpp:245-324); every alt carries an ACO origin tag accumulating the
contributing callset names (updateOriginAttribute, Combine.cpp:209-234);
duplicate alts (after ref extension) merge their origins; alleles containing
ambiguous nucleotides are dropped; alts representable as a chain of other
alleles across downstream variants are removed with their origins merged
into the chain members (getRedundantAlleleSets/isAltAlleleRedundant,
Combine.cpp:99-207).
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

    for chrom in by_chrom:
        stats["removed_redundant"] = stats.get("removed_redundant", 0) + \
            _remove_redundant_alts(by_chrom[chrom])

    with VcfWriter(out_path, meta) as w:
        contig_order = [c[0] for c in meta.contigs] or sorted(by_chrom)
        for chrom in contig_order:
            for pos in sorted(by_chrom.get(chrom, {})):
                slot = by_chrom[chrom][pos]
                if not slot["alts"]:
                    continue
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


def _right_trim_pair(ref: str, alt: str):
    """Right-trim a single (ref, alt) pair keeping length >= 1
    (Auxiliaries::rightTrimAllelePair)."""
    n = 0
    while n < min(len(ref), len(alt)) - 1 and ref[-1 - n] == alt[-1 - n]:
        n += 1
    if n:
        return ref[:-n], alt[:-n]
    return ref, alt


def _remove_redundant_alts(chrom_slots, max_depth: int = 6) -> int:
    """Drop alts representable as a chain of other alleles of variants at the
    same-and-downstream positions (isAltAlleleRedundant, Combine.cpp:157-207).
    The chain must reproduce both the ref and alt strings exactly, use >= 2
    alleles, and may pass through reference alleles of intervening variants.
    Redundant alts' origins merge into the chain's alt alleles.
    """
    positions = sorted(chrom_slots)
    pos_index = {p: i for i, p in enumerate(positions)}
    removed = 0

    def alleles_at(pos):
        slot = chrom_slots[pos]
        yield slot["ref"], slot["ref"], None  # reference allele
        for alt_seq in list(slot["alts"].keys()):
            yield slot["ref"], alt_seq, alt_seq

    def find_chain(pi, ref_rest, alt_rest, chain, start_pos, cursor, depth):
        """cursor = next genomic position the chain must explain."""
        if depth > max_depth or pi >= len(positions):
            return None
        pos = positions[pi]
        gap = pos - cursor
        if gap < 0:
            return find_chain(pi + 1, ref_rest, alt_rest, chain, start_pos,
                              cursor, depth)
        if gap > len(ref_rest) or gap > len(alt_rest):
            return None
        if ref_rest[:gap] != alt_rest[:gap]:
            return None
        r_rest, a_rest = ref_rest[gap:], alt_rest[gap:]
        for vref, vallele, alt_key in alleles_at(pos):
            tr, ta = _right_trim_pair(vref, vallele)
            if not r_rest.startswith(tr) or not a_rest.startswith(ta):
                continue
            new_chain = chain + ([(pos, alt_key)] if alt_key else [])
            nr, na = r_rest[len(tr):], a_rest[len(ta):]
            if not nr and not na:
                if len(chain) + 1 >= 2 and (len(new_chain) >= 1):
                    # chain covered everything; require >= 2 chain elements
                    total_elems = len(chain) + 1
                    if total_elems >= 2:
                        return new_chain
                continue
            result = find_chain(pi + 1, nr, na, new_chain, start_pos,
                                pos + len(tr), depth + 1)
            if result is not None and (len(result) + 1) >= 1:
                return result
        # also allow skipping this position entirely (no allele consumed)
        return None

    for pos in positions:
        slot = chrom_slots[pos]
        for alt_seq in list(slot["alts"].keys()):
            tref, talt = _right_trim_pair(slot["ref"], alt_seq)
            if len(tref) <= 1:
                continue
            pi = pos_index[pos]
            # chain may start with an allele of this same variant (other than
            # the alt itself) or of downstream variants
            chain = _search_excluding(
                find_chain, pi, tref, talt, pos, alt_seq
            )
            if chain:
                origins = slot["alts"].pop(alt_seq)
                removed += 1
                for cpos, ckey in chain:
                    if ckey is not None and ckey in chrom_slots[cpos]["alts"]:
                        chrom_slots[cpos]["alts"][ckey] |= origins
    return removed


def _search_excluding(find_chain, pi, tref, talt, start_pos, exclude_alt):
    """Run the chain search while never matching the candidate alt against
    itself in full (a chain of length 1 equal to the alt is not redundancy)."""
    # The >= 2 chain-element requirement in find_chain already excludes the
    # identity chain; just run the search.
    return find_chain(pi, tref, talt, [], start_pos, start_pos, 0)
