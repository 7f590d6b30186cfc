"""Edit distance (Levenshtein) — vectorised numpy DP.

Replaces the vendored edlib dependency (external/edlib) used by
bayesTyperTools annotate (Annotate.cpp:57-92). The DP row update is fully
vectorised: the left-to-right insertion dependency
cur[j] = min(t[j], cur[j-1] + 1) is solved in closed form as
min_{i<=j}(seed[i] + (j - i)) via a single minimum-accumulate.
"""

from __future__ import annotations

import numpy as np


def edit_distance(a: str, b: str, max_dist: int | None = None) -> int:
    """Levenshtein distance between strings a and b; returns max_dist + 1
    early when the band minimum exceeds max_dist."""
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
