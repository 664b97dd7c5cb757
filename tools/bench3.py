#!/usr/bin/env python3
"""Assemble the committed local bench capsule from three full Bench runs.

Round-15 lesson: one of three same-day runs read ~30% slow globally with
no attributable cause (host band), and committing a single run made that
worst case masquerade as a round-over-round regression. The capsule is
now the MEDIAN run (by warm-sweep total) with ALL THREE runs' headline
readings recorded in a `runs: [...]` field, so any cross-round comparison
can see the band it was drawn from.

Usage: python3 tools/bench3.py out.json run1.json run2.json run3.json
(each runN.json = the one-line JSON a `runMain graft.Bench` printed)
"""
import json
import sys

out_path, *run_paths = sys.argv[1:]
runs = []
for p in run_paths:
    with open(p) as f:
        # the bench line is the only line starting with {"metric"
        line = next(l for l in f if l.lstrip().startswith('{"metric"'))
        runs.append(json.loads(line))

KEY = "warm_total"
ordered = sorted(runs, key=lambda r: r[KEY])
median = dict(ordered[len(ordered) // 2])

HEADLINE = [
    "value", "warm_total", "calibration_ops_per_sec",
    "runtime_ops_per_sec", "runtime_ungrouped_ops_per_sec",
    "runtime_lowlat_latency_ms_p50", "runtime_lowlat_latency_ms_p99",
    "runtime_latency_ms_p50", "runtime_multislot_min_ops_per_sec",
    "runtime_multislot_max_ops_per_sec",
    "runtime_paced_tail8_20k_ms_p50", "runtime_paced_tail8_50k_ms_p50",
    "ivfpq_residual_m16_nprobe24_rerank200_recall_at_10",
]
median["runs"] = [
    {k: r[k] for k in HEADLINE if k in r} for r in runs
]
median["capsule"] = "median_of_3_by_" + KEY

with open(out_path, "w") as f:
    json.dump(median, f)
    f.write("\n")
print(f"capsule -> {out_path}: median {KEY}={median[KEY]} of "
      f"{[r[KEY] for r in runs]}")
