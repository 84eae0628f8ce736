#!/usr/bin/env python3
"""Assemble SWEEP_SF3.json from the sf1.0 and sf3.0 head benches
(round 15, VERDICT #4): second-decade scale evidence for the pair
family + q62. Reads two bench JSONs (min-of-2 singles) and emits one
artifact with walls, the sf3/sf1 ratio, and the 3.5x verdict per
query. Usage: make_sweep_sf3_artifact.py SF1.json SF3.json OUT.json
"""
import json
import sys

sf1 = json.load(open(sys.argv[1]))["queries"]
sf3 = json.load(open(sys.argv[2]))["queries"]
rows = []
for q in sorted(set(sf1) & set(sf3)):
    r = sf3[q] / sf1[q]
    rows.append({
        "query": q,
        "sf1_seconds": round(sf1[q], 2),
        "sf3_seconds": round(sf3[q], 2),
        "ratio": round(r, 2),
        "linear_3x": r <= 3.5,
    })
for q in sorted(set(sf1) - set(sf3)):
    rows.append({"query": q, "sf1_seconds": round(sf1[q], 2),
                 "sf3_seconds": None, "ratio": None, "linear_3x": False,
                 "note": "no sf3 sample (see SCALE.md)"})
out = {
    "scale_up": "sf1.0 -> sf3.0 (3x rows; per-copy text transforms and "
                "part field offsets keep pair outputs ~3x — see "
                "tools/make_sf3.py)",
    "method": "min-of-2 Bench singles, 8g heap, zstd shuffle at sf3",
    "results": rows,
}
with open(sys.argv[3], "w") as f:
    json.dump(out, f, indent=1)
    f.write("\n")
print(json.dumps(out, indent=1))
