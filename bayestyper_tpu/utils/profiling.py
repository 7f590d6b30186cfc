"""TPU profile inspection without TensorBoard.

`_Profiler` (engine.py) captures a JAX profiler trace when BT_PROFILE_DIR
is set (SURVEY §5 observability plan). The stock way to read those traces
is TensorBoard's profile plugin, but its converter is broken against the
TF build in this image (pywrap symbol mismatch) — so this module parses
the xplane protobuf directly and aggregates per-op device time, which is
how the round-3 TPU execution profile in PARITY.md was produced (device
busy 0.26 s vs ~1.8 s tunnelled wall for the bulk genotype wave).

Usage:
    python -m bayestyper_tpu.utils.profiling <profile_dir> [top_n]

where <profile_dir> is the BT_PROFILE_DIR passed to the run (the newest
`plugins/profile/*/\\*.xplane.pb` under it is read).
"""

from __future__ import annotations

import collections
import glob
import os
import sys


def _load_xspace(path: str):
    # the proto lives in TF's tsl tree; make protobuf tolerate the old
    # generated code in this image
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(path, "rb") as fh:
        xs.ParseFromString(fh.read())
    return xs


def find_xplane(profile_dir: str) -> str:
    cands = sorted(glob.glob(
        os.path.join(profile_dir, "plugins", "profile", "*", "*.xplane.pb")
    ))
    if not cands:
        raise FileNotFoundError(
            f"no *.xplane.pb under {profile_dir}/plugins/profile/"
        )
    return cands[-1]


def device_op_times(profile_dir: str):
    """Aggregate device-plane op durations from the newest trace.

    Returns {line_name: (span_seconds, busy_seconds,
                         [(total_s, count, op_name), ...descending])}.
    """
    xs = _load_xspace(find_xplane(profile_dir))
    out = {}
    for p in xs.planes:
        if "TPU" not in p.name and "GPU" not in p.name:
            continue
        meta = {m.id: m.name for m in p.event_metadata.values()}
        for line in p.lines:
            agg = collections.defaultdict(lambda: [0, 0])
            tmin, tmax = 1 << 62, 0
            for ev in line.events:
                name = meta.get(ev.metadata_id, "?")
                agg[name][0] += ev.duration_ps
                agg[name][1] += 1
                tmin = min(tmin, ev.offset_ps)
                tmax = max(tmax, ev.offset_ps + ev.duration_ps)
            if not line.events:
                continue
            rows = sorted(
                ((dur / 1e12, n, name) for name, (dur, n) in agg.items()),
                reverse=True,
            )
            busy = sum(r[0] for r in rows)
            out[f"{p.name}/{line.name}"] = (
                (tmax - tmin) / 1e12, busy, rows
            )
    return out


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print(__doc__)
        return 2
    top_n = int(argv[1]) if len(argv) > 1 else 20
    for line_name, (span, busy, rows) in device_op_times(argv[0]).items():
        print(f"== {line_name}: span {span:.3f}s, busy {busy:.3f}s")
        for total, n, name in rows[:top_n]:
            print(f"  {total:8.4f}s  n={n:6d}  {name[:110]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
