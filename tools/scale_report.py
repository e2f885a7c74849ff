#!/usr/bin/env python3
"""Combine two Bench JSON outputs (e.g. sf0.1 and the 100x scale run) into
BENCH_SCALE.json: per-query steady seconds at both scales plus the observed
scaling ratio (data grew 100x; ratio << 100 = sublinear wall-clock on the
same 32 cores)."""
import json, sys
small, big, out = sys.argv[1], sys.argv[2], sys.argv[3]
a = json.load(open(small)); b = json.load(open(big))
def total(d): return d["total_steady"] if "total_steady" in d else d["value"]
rows = {}
for k in sorted(b["queries"]):
    s = a["queries"].get(k, {}).get("steady"); g = b["queries"][k]["steady"]
    rows[k] = {"steady_sf0.1": s, "steady_sf10": g,
               "ratio": round(g / s, 1) if s and s > 0 and g > 0 else None}
doc = {"factor_data": 100, "sf_small": a["sf"], "sf_big": b["sf"],
       "total_steady_sf0.1": round(total(a), 1),
       "total_steady_sf10": round(total(b), 1), "queries": rows}
json.dump(doc, open(out, "w"), indent=1)
print(f"total {total(a):.1f}s -> {total(b):.1f}s on 100x data")
for k, r in sorted(rows.items(), key=lambda x: -(x[1]['ratio'] or 0))[:15]:
    print(f"{k:24s} {r['steady_sf0.1']!s:>8} -> {r['steady_sf10']!s:>8}  x{r['ratio']}")
