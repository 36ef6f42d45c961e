"""Merge the two oracle_check --json sweeps (sf0.01 + sf0.1) into the
committed full-surface correctness artifact CORRECTNESS_local_r4.json:
one row per query with both scales' match flags and wall seconds.

Usage: python tools/merge_correctness.py sf001.json sf01.json out.json
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    a_path, b_path, out = sys.argv[1], sys.argv[2], sys.argv[3]
    a = json.load(open(a_path))
    b = json.load(open(b_path))
    names = sorted(set(a["results"]) | set(b["results"]))
    rows = {}
    n_green = {a["sf_dir"]: 0, b["sf_dir"]: 0}
    for n in names:
        row = {}
        for src in (a, b):
            r = src["results"].get(n)
            tag = src["sf_dir"]
            if r is None:
                row[tag] = None
                continue
            green = bool(
                r.get("rows_match") and r.get("schema_match") and r.get("hash_match")
            )
            n_green[tag] += green
            row[tag] = {
                "green": green,
                "rows": r.get("ray_rows"),
                "sec": r.get("sec"),
                "err": r.get("err"),
            }
        rows[n] = row
    doc = {
        "round": 4,
        "total_queries": len(names),
        "green": {k: v for k, v in n_green.items()},
        "sweeps": {a["sf_dir"]: a_path, b["sf_dir"]: b_path},
        "results": rows,
    }
    with open(out, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"{len(names)} queries; green: {n_green}; wrote {out}")


if __name__ == "__main__":
    main()
