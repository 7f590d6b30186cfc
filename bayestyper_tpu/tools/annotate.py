"""annotate: transfer IDs from an annotation VCF by allele similarity.

Equivalent of bayesTyperTools annotate (Annotate.cpp:46-357): per contig,
annotation alleles are indexed by their full-trimmed start AND end positions;
each callset allele searches a window of
ceil(window_size_scale * max(|ref|, |alt|)) around its trimmed position and
matches when
    score = 1 - (ref_edit + alt_edit) / (max ref len + max alt len)
            >= match_threshold        (calcMatchScore, Annotate.cpp:57-63)
with the two cheap length-difference bounds applied before computing real
edit distances (Annotate.cpp:272-292). SNVs match only exactly. Matched
annotation IDs are added to the variant IDs and the per-allele AAI INFO tag.
N-count differences are subtracted from the edit distance (edlibAlignSafe,
Annotate.cpp:70-92).
"""

from __future__ import annotations

import math
from collections import defaultdict

from ..io.vcf import VcfReader, VcfWriter
from ..ops.edit_distance import edit_distance

DEFAULT_MATCH_THRESHOLD = 0.5
DEFAULT_WINDOW_SIZE_SCALE = 3.0


def _score(r1, a1, r2, a2, ref_edit, alt_edit):
    denom = max(r1, r2) + max(a1, a2)
    return 1.0 - (ref_edit + alt_edit) / max(denom, 1)


def _ed_safe(s1: str, s2: str, max_dist: int | None = None) -> int:
    """N-adjusted edit distance; with max_dist, any return > max_dist only
    promises the true value exceeds it (callers reject those matches)."""
    if not s1 and not s2:
        return 0
    if not s1:
        return len(s2)
    if not s2:
        return len(s1)
    n_diff = abs(s1.count("N") - s2.count("N"))
    cap = None if max_dist is None else max(max_dist, 0) + n_diff
    return max(edit_distance(s1, s2, max_dist=cap) - n_diff, 0)


def annotate(variant_file, annotation_file, out_path,
             match_threshold=DEFAULT_MATCH_THRESHOLD,
             window_size_scale=DEFAULT_WINDOW_SIZE_SCALE,
             clear_prev_annotation=False):
    anno_reader = VcfReader(annotation_file)
    # index annotation alleles per chrom by trimmed start and end positions
    anno_index = defaultdict(lambda: defaultdict(list))
    for v in anno_reader:
        for alt in v.alts:
            if alt.startswith("<") or alt in ("*", "."):
                continue
            offset, ref_t, alt_t = _trim_with_offset(v.ref, alt)
            pos_t = v.pos + offset
            entry = (pos_t, ref_t, alt_t, tuple(v.ids))
            anno_index[v.chrom][pos_t].append(entry)
            end_t = pos_t + max(len(ref_t), 1) - 1
            if end_t != pos_t:
                anno_index[v.chrom][end_t].append(entry)

    sorted_keys = {
        chrom: sorted(posmap) for chrom, posmap in anno_index.items()
    }

    reader = VcfReader(variant_file, parse_samples=True)
    meta = reader.meta
    if "AAI" not in meta.info:
        meta.add_info("AAI", "A", "String", "Allele annotation")

    writer = VcfWriter(out_path, meta)
    stats = {"variants": 0, "annotated_alleles": 0}

    import bisect

    for v in reader:
        stats["variants"] += 1
        if clear_prev_annotation:
            v.ids = []
        posmap = anno_index.get(v.chrom, {})
        keys = sorted_keys.get(v.chrom, [])
        aai = []
        new_ids = set(v.ids)
        for alt in v.alts:
            ids = set()
            if not alt.startswith("<") and alt not in ("*", "."):
                offset, ref_t, alt_t = _trim_with_offset(v.ref, alt)
                pos_t = v.pos + offset
                window = math.ceil(
                    window_size_scale * max(len(ref_t), len(alt_t), 1)
                )
                lo = bisect.bisect_left(keys, pos_t - window)
                hi_limit = pos_t + max(len(ref_t), 1) + window
                seen = set()
                for ki in range(lo, len(keys)):
                    if keys[ki] >= hi_limit:
                        break
                    for (apos, aref, aalt, aids) in posmap[keys[ki]]:
                        key = (apos, aref, aalt, aids)
                        if key in seen:
                            continue
                        seen.add(key)
                        if len(ref_t) <= 1 and len(alt_t) == 1 and \
                                len(aref) <= 1 and len(aalt) == 1:
                            # SNV: exact match only (Annotate.cpp:258-268)
                            if pos_t == apos and ref_t == aref and alt_t == aalt:
                                ids.update(aids)
                            continue
                        # length-difference upper bounds first
                        re_b = abs(len(ref_t) - len(aref))
                        ae_b = abs(len(alt_t) - len(aalt))
                        if _score(len(ref_t), len(alt_t), len(aref), len(aalt),
                                  re_b, ae_b) < match_threshold:
                            continue
                        # the edit distances only matter up to the point the
                        # score falls below the threshold — bound them so
                        # the Myers DP can stop early on dissimilar pairs
                        denom = max(len(ref_t), len(aref)) + max(
                            len(alt_t), len(aalt)
                        )
                        budget = int((1.0 - match_threshold) * denom)
                        re = _ed_safe(ref_t, aref, max_dist=budget - ae_b)
                        if _score(len(ref_t), len(alt_t), len(aref), len(aalt),
                                  re, ae_b) < match_threshold:
                            continue
                        ae = _ed_safe(alt_t, aalt, max_dist=budget - re)
                        if _score(len(ref_t), len(alt_t), len(aref), len(aalt),
                                  re, ae) >= match_threshold:
                            ids.update(aids)
            ids.discard(".")
            if ids:
                stats["annotated_alleles"] += 1
                new_ids.update(ids)
                aai.append(":".join(sorted(ids)))
            else:
                aai.append(".")
        v.ids = sorted(new_ids)
        v.info["AAI"] = ",".join(aai)
        writer.write(v)

    writer.close()
    return stats


def _trim_with_offset(ref: str, alt: str):
    """Full trim returning (left offset, trimmed ref, trimmed alt)."""
    i = 0
    while i < min(len(ref), len(alt)) and \
            ref[len(ref) - 1 - i] == alt[len(alt) - 1 - i]:
        i += 1
    r, a = ref[: len(ref) - i], alt[: len(alt) - i]
    j = 0
    while j < min(len(r), len(a)) and r[j] == a[j]:
        j += 1
    return j, r[j:], a[j:]
