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

# v5e HBM bandwidth peak, the roofline denominator for the non-matmul tail
HBM_PEAK_GBPS = 819.0


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

    # --- HBM roofline per category (round-3 verdict item 3): achieved
    # GB/s = Σ(HBM-BW_i · t_i) / Σ t_i (time-weighted mean of xprof's
    # per-op HBM bandwidth = total HBM bytes / total self time), so the
    # elementwise / formatting / copy tail can be judged against the
    # chip's HBM peak rather than the matmul peak.  This xprof exposes
    # per-op "HBM BW (GiB/s)" and "Measured memory BW (GiB/s)" (all
    # memories incl. CMEM/VMEM) — bytes recover as BW × self-time.
    hbm_col = next(
        (c["label"] for c in table["cols"]
         if c["label"].lower().startswith("hbm bw")), None)
    mem_col = next(
        (c["label"] for c in table["cols"]
         if "measured memory bw" in c["label"].lower()), None)
    stall_col = next(
        (c["label"] for c in table["cols"]
         if "stalled by dma" in c["label"].lower()), None)
    if hbm_col is None:
        print("\n(no HBM-BW column in this xprof version; columns: "
              + ", ".join(c["label"] for c in table["cols"]) + ")")
    else:
        GIB = 1024.0 ** 3
        cat_hbm = defaultdict(float)    # bytes
        cat_mem = defaultdict(float)    # bytes (all memories)
        cat_stall = defaultdict(float)  # us stalled on DMA
        cat_bound = defaultdict(lambda: defaultdict(float))  # us by Bound-by
        for r in rows:
            t_us = val(r, "Total self time (us)") or 0.0
            k = val(r, "HLO op category")
            cat_hbm[k] += (val(r, hbm_col) or 0.0) * GIB * t_us * 1e-6
            if mem_col:
                cat_mem[k] += (val(r, mem_col) or 0.0) * GIB * t_us * 1e-6
            if stall_col:
                cat_stall[k] += (val(r, stall_col) or 0.0) * 1e-2 * t_us
            cat_bound[k][val(r, "Bound by") or "?"] += t_us
        print(f"\nHBM roofline by category (GB/s = Σ HBM-BW·t / Σ t; "
              f"v5e HBM peak {HBM_PEAK_GBPS:.0f} GB/s):")
        print(f"  {'category':35s} {'ms':>8s} {'HBM GB':>8s} {'GB/s':>7s} "
              f"{'%HBM':>6s} {'allmem GB/s':>11s} {'DMA-stall%':>10s}")
        tot_b = tot_m = tot_st = 0.0
        for k, t_us in sorted(by_cat.items(), key=lambda kv: -kv[1]):
            if t_us / total < 0.001:
                continue
            b, m, st = cat_hbm[k], cat_mem[k], cat_stall[k]
            tot_b, tot_m, tot_st = tot_b + b, tot_m + m, tot_st + st
            gbps = b / (t_us * 1e-6) / 1e9 if t_us else 0.0
            mbps = m / (t_us * 1e-6) / 1e9 if t_us else 0.0
            bound = " ".join(
                f"{bk}:{100 * bv / t_us:.0f}%" for bk, bv in sorted(
                    cat_bound[k].items(), key=lambda kv: -kv[1])[:3])
            print(f"  {k:35s} {t_us / 1e3:8.2f} {b / 1e9:8.3f} {gbps:7.1f} "
                  f"{100 * gbps / HBM_PEAK_GBPS:5.1f}% {mbps:11.1f} "
                  f"{100 * st / t_us if t_us else 0:9.1f}%  [{bound}]")
        gbps = tot_b / (total * 1e-6) / 1e9 if total else 0.0
        mbps = tot_m / (total * 1e-6) / 1e9 if total else 0.0
        print(f"  {'TOTAL':35s} {total / 1e3:8.2f} {tot_b / 1e9:8.3f} "
              f"{gbps:7.1f} {100 * gbps / HBM_PEAK_GBPS:5.1f}% {mbps:11.1f} "
              f"{100 * tot_st / total if total else 0:9.1f}%")

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
