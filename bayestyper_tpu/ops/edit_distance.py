"""Edit distance (Levenshtein) — Myers bit-parallel via btnative, with a
vectorised numpy DP fallback.

Replaces the vendored edlib dependency (external/edlib) used by
bayesTyperTools annotate (Annotate.cpp:57-92). The fast path is the native
block-based Myers/Hyyro algorithm (native.myers_edit_distance,
O(n*m/64) word ops — reference-scale 100 kb+ SV alleles in ~a second,
exercised by tests/test_tools.py::test_edit_distance_large). The numpy
fallback runs the classic row DP with the left-to-right insertion
dependency solved in closed form (min-accumulate) and an early exit on the
row minimum; it is O(n*m) cells and intended for short alleles only —
callers without the native library should bound inputs to ~10 kb.
"""

from __future__ import annotations

import numpy as np


def edit_distance(a: str, b: str, max_dist: int | None = None) -> int:
    """Levenshtein distance between a and b; with max_dist set, may return
    any value > max_dist as soon as the distance is known to exceed it."""
    if max_dist is not None and abs(len(a) - len(b)) > max_dist:
        return max_dist + 1

    from .. import native

    if native.available():
        return native.myers_edit_distance(
            a.encode(), b.encode(),
            -1 if max_dist is None else int(max_dist),
        )
    return _edit_distance_numpy(a, b, max_dist)


def _edit_distance_numpy(a: str, b: str, max_dist: int | None = None) -> int:
    if len(a) < len(b):
        a, b = b, a
    if not b:
        return len(a)
    bb = np.frombuffer(b.encode(), dtype=np.uint8)
    idx = np.arange(len(b) + 1, dtype=np.int32)
    prev = idx.copy()
    for i, ca in enumerate(a.encode()):
        t = np.minimum(prev[1:] + 1, prev[:-1] + (bb != ca))
        seed = np.concatenate(
            (np.array([i + 1], dtype=np.int32), t.astype(np.int32))
        )
        cur = np.minimum.accumulate(seed - idx) + idx
        prev = cur
        if max_dist is not None and prev.min() > max_dist:
            return max_dist + 1
    return int(prev[-1])
