"""Summarise a jax.profiler device trace: self-time by HLO op category and
the top individual ops, from the xplane.pb that `jax.profiler.trace(dir)`
writes under <dir>/plugins/profile/<ts>/*.xplane.pb.

Parsing needs the xprof package (present in this image) and pure-python
protobuf descriptors — run as:

  PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
      python scripts/hlo_stats.py <trace_dir_or_xplane.pb> [top_n]

(the generated *_pb2.py files in tensorboard_plugin_profile/xprof predate
protoc 3.19, so the C++ descriptor pool rejects them; the env var opts
into the pure-python pool.  tensorboard_plugin_profile's own
raw_to_tool_data is additionally incompatible with the installed
tensorflow's _pywrap_profiler — xprof.convert is the one that works.)

This produced the BENCHMARKS.md "Train-step phase decomposition"
attribution table.
"""

from __future__ import annotations

import glob
import json
import os
import sys
from collections import defaultdict

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def find_xplane(path: str) -> str:
    if path.endswith(".xplane.pb"):
        return path
    hits = sorted(glob.glob(os.path.join(path, "**", "*.xplane.pb"),
                            recursive=True))
    if not hits:
        raise SystemExit(f"no *.xplane.pb under {path}")
    return hits[-1]  # newest capture


def main() -> None:
    from xprof.convert import raw_to_tool_data as r2t

    path = find_xplane(sys.argv[1] if len(sys.argv) > 1 else ".")
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    data, _ = r2t.xspace_to_tool_data([path], "hlo_stats", {})
    table = json.loads(data if isinstance(data, str) else data.decode())
    ix = {c["label"]: i for i, c in enumerate(table["cols"])}

    def val(row, col):
        cell = row["c"][ix[col]]
        return cell["v"] if cell else None

    rows = table["rows"]
    total = sum(val(r, "Total self time (us)") or 0 for r in rows)
    print(f"{path}\ntotal device self time: {total / 1e3:.2f} ms")

    by_cat = defaultdict(float)
    for r in rows:
        by_cat[val(r, "HLO op category")] += val(r, "Total self time (us)") or 0
    print("\nby HLO op category:")
    for k, v in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        if v / total < 0.001:
            continue
        print(f"  {k:35s} {v / 1e3:9.2f} ms  {100 * v / total:5.1f}%")

    print(f"\ntop {top_n} ops by self time:")
    rows.sort(key=lambda r: -(val(r, "Total self time (us)") or 0))
    for r in rows[:top_n]:
        t = (val(r, "Total self time (us)") or 0) / 1e3
        print(f"  {t:8.2f} ms {100 * t * 1e3 / total:5.1f}% "
              f"{val(r, 'Bound by') or '?':8s} "
              f"{(val(r, 'Model GFLOP/s') or 0) / 1e3:7.1f} TF/s  "
              f"{(val(r, 'HLO op name') or '')[:40]:40s} "
              f"{(val(r, 'Framework op name') or '')[:70]}")


if __name__ == "__main__":
    main()
