"""sf1 (10x sf0.1) perf ladder for the heaviest non-ingest pipelines.

Evidence for the scale criterion beyond the ingest headline: run each
query at /tmp/sf1 (tools/gen_sf1.py) AND at sf0.1, in ONE fresh Ray
session, and report wall seconds, the sf1/sf0.1 wall ratio (should stay
well under 10x: the ~2 s/wide-op scheduling floor amortizes), and the
peak per-block output size parsed from ds.stats() (no stage may
concentrate the dataset into one giant block).

Usage: python tools/sf1_ladder.py [q1 q2 ...]  (default: the 5 heaviest)
Prints one JSON line; paste the table into BASELINE.md.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

DEFAULT = [
    "dedup_clusters",
    "dedup_embedding_lsh",
    "pipeline_llm_prep",
    "exact_quantiles",
    "bpe_merges",
]

# round-5 coverage: the remaining heavy dedup/graph family (VERDICT r4 #6)
ROUND5 = [
    "dedup_cluster_sizes",
    "dedup_containment",
    "graph_triangles",
]

SF1 = os.environ.get("GRAFT_SF1_DIR", "/tmp/sf1")
SF01 = "/root/testdata/sf0.1"


def peak_block_mb(stats: str) -> float | None:
    """Largest per-block output reported by ds.stats(): prefer the max of
    'Output size bytes: ... max: N', fall back to peak heap."""
    mx = 0
    for m in re.finditer(
        r"output size bytes:.*?max: ([\d.]+)([KMG]?i?B)?", stats, re.I | re.S
    ):
        v = float(m.group(1))
        unit = (m.group(2) or "B").upper()
        mult = {"B": 1, "KB": 2**10, "KIB": 2**10, "MB": 2**20,
                "MIB": 2**20, "GB": 2**30, "GIB": 2**30}.get(unit, 1)
        mx = max(mx, v * mult)
    return round(mx / 2**20, 1) if mx else None


def run(names: list[str]) -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import ray

    cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import __ray_entry__ as entry

    queries = entry.queries()

    def auto_lsh(sf):
        # the scale path: code width tracks corpus size (auto nbits).
        # The registered query pins nbits=8 for its static SQL oracle;
        # at 10x vectors that fixed width goes quadratic (see BASELINE.md)
        from grate_ray.context import configure_shuffle
        from grate_ray.functions.ann import cosine_neardup_pairs_lsh

        configure_shuffle(32)  # BEFORE dataset creation (context freezes)
        return cosine_neardup_pairs_lsh(
            entry._embeddings_with_perturbed(sf), threshold=0.9, nbits=None
        )

    runners = dict(queries)
    runners["dedup_embedding_lsh"] = auto_lsh
    out: dict[str, dict] = {}
    for name in names:
        row: dict = {}
        for tag, sf in (("sf0.1", SF01), ("sf1", SF1)):
            t0 = time.perf_counter()
            res = runners[name](sf)
            stats = None
            if hasattr(res, "to_pandas"):
                df = res.to_pandas()
                try:
                    stats = res.stats()
                except Exception:
                    stats = None
            else:
                df = res
            dt = time.perf_counter() - t0
            row[tag] = {
                "sec": round(dt, 1),
                "rows": len(df),
                "peak_block_mb": peak_block_mb(stats) if stats else None,
            }
        row["ratio"] = round(row["sf1"]["sec"] / row["sf0.1"]["sec"], 2)
        out[name] = row
        print(f"{name}: sf0.1 {row['sf0.1']['sec']}s  sf1 {row['sf1']['sec']}s  "
              f"ratio {row['ratio']}x  peak_block {row['sf1']['peak_block_mb']} MB",
              flush=True)
    print(json.dumps({"num_cpus": cpus, "ladder": out}))
    ray.shutdown()


if __name__ == "__main__":
    args = sys.argv[1:]
    if args == ["--round5"]:
        args = ROUND5
    run(args or DEFAULT)
