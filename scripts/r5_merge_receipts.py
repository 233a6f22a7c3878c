#!/usr/bin/env python
"""Merge the round-5 accuracy-receipt console rows into the final artifact.

The main receipt ran in two time-boxed parts (part1: R18 x3 + the honest
R50 null; part2: MobileNets, trimmed ladder/seeds); this stitches every
JSON row plus the 224px divergence records into
docs/artifacts/r5/r5_boundary_accuracy.json.
"""

import json
import os
import sys

root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
rows, div = [], []
for part in ("results/r5_boundary_accuracy_part1.console",
             "results/r5_boundary_accuracy.console",
             "results/r5_boundary_accuracy_part2.console"):
    p = os.path.join(root, part)
    if not os.path.exists(p):
        continue
    for line in open(p):
        if not line.startswith("{"):
            continue
        r = json.loads(line)
        key = (r.get("family"), r.get("seed"))
        if "gate_pass" in r and key not in {(x["family"], x["seed"]) for x in rows}:
            rows.append(r)
        elif "divergence" in str(r) or ("relaxed" in r and "int8b" in r and "n" in r):
            div.append(r)

for r in rows:
    # statistical context for knife-edge misses: at p ~ 0.998 and n=10240
    # the binomial sigma is ~4.4e-4, i.e. ~2-3 samples; a rung trailing the
    # reference-tolerance metric by less than that is a tie, not a miss.
    # gate_pass fields keep the LETTER of the gate; this annotates.
    p = r["agree_strict_vs_referent"]
    sig = (max(p * (1 - p), 1e-9) / max(r["n_eval"], 1)) ** 0.5
    r["gate_relaxed_within_1sigma"] = bool(
        r["agree_relaxed_vs_strict"] >= p - sig
    )
    r["gate_int8b_within_1sigma"] = bool(
        r["agree_int8b_vs_strict"] >= p - sig
    )

result = {
    "gate": "agree(rung,strict) >= agree(strict,referent) per family x seed, "
            "referent held-out top-1 >= 0.90",
    "note": "R50 rows are honest nulls: the 64-class 32px task does not "
            "train R50 to 0.90 within CPU ladder budgets (best 0.10); its "
            "relaxed-rung evidence rests on the R18 rows (same residual "
            "mechanics) and the r4 8-class receipt.  Run in two time-boxed "
            "parts; see console artifacts.",
    "relaxed_pass_all_measured": all(
        r["gate_relaxed"] for r in rows if r["referent_reached_090"]
    ),
    "int8b_pass_all_measured": all(
        r["gate_int8b"] for r in rows if r["referent_reached_090"]
    ),
    "task_rows": rows,
    "divergence_224": div,
}
out = os.path.join(root, "docs", "artifacts", "r5", "r5_boundary_accuracy.json")
os.makedirs(os.path.dirname(out), exist_ok=True)
with open(out, "w") as f:
    json.dump(result, f, indent=1)
print(f"{len(rows)} rows; relaxed_pass={result['relaxed_pass_all_measured']} "
      f"int8b_pass={result['int8b_pass_all_measured']}; wrote {out}")
