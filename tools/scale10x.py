"""10x scale refresh: the BASELINE.md bench-spec-x10 ingest measurement.

Round-3 methodology, re-run on the current engine: same-day 30M-event
headline (best-of-2) for the per-event-rate ratio, then the 300M-event /
600k-conversation input (bench spec x10: 1M-row chunks, zipf 1.1, seed
42 — identical generator spec to ``bench.py`` at sf=1.0, so the cached
``/tmp/graft_bench/binlog_sf1.0`` is reused) ingested exactly-once into
a fresh 128-partition lake. Prints ONE JSON line with both rates, the
ratio, and the weather probe.

Run:  python tools/scale10x.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    import ray

    import bench

    log("phase: weather probe")
    weather = bench.weather_probe()

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from grate_ray.pipelines.cdc import read_binlog
    from grate_ray.pipelines.ingest import ingest

    # same-day 30M headline (best-of-2, identical to bench.py)
    os.environ.setdefault("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    log("phase: 30M headline")
    headline = bench.run_headline(int(os.environ.get("RAY_GRAFT_CPUS", "32")))

    # 300M-event input: bench spec x10 (cached across runs)
    log("phase: sf1 binlog generate/verify")
    binlog_dir, n_events = bench.bench_binlog_dir(1.0)
    log("phase: warm read")

    read_binlog(binlog_dir).count()  # warm page cache, untimed

    out = "/tmp/graft_bench/lake_sf1"
    shutil.rmtree(out, ignore_errors=True)
    log("phase: 300M ingest")
    # GRAFT_MERGE_CACHE_ROWS (or --merge-cache-rows N) pins the per-actor
    # merge-buffer bound so the 10x run PROVES the eviction path under
    # real key cardinality instead of merely having it available
    cache_rows = None
    if "--merge-cache-rows" in sys.argv:
        cache_rows = int(sys.argv[sys.argv.index("--merge-cache-rows") + 1])
    elif os.environ.get("GRAFT_MERGE_CACHE_ROWS"):
        cache_rows = int(os.environ["GRAFT_MERGE_CACHE_ROWS"])
    t0 = time.perf_counter()
    metrics = ingest(
        binlog_dir, out, num_partitions=128, files_per_microbatch=None,
        merge_cache_rows=cache_rows,
    )
    dt = time.perf_counter() - t0
    n_evictions = (
        len(os.listdir(os.path.join(out, "_diag")))
        if os.path.isdir(os.path.join(out, "_diag"))
        else 0
    )
    applied = sum(
        n
        for n, s in zip(
            metrics["n_events"].to_pylist(), metrics["skipped"].to_pylist()
        )
        if not s
    )
    assert applied == n_events, (applied, n_events)

    # live-key count from the committed lake (context for the rate)
    from grate_ray.pipelines.ingest import read_lake

    live_keys = read_lake(out).count()

    r10 = n_events / dt
    r1 = headline["events_per_sec"]
    print(
        json.dumps(
            {
                "metric": "cdc_replay_10x_scale_refresh",
                "sf1_sec": round(dt, 2),
                "sf1_events_per_sec": round(r10),
                "sf1_live_keys": live_keys,
                "headline_30m_sec": round(headline["sec"], 2),
                "headline_30m_events_per_sec": round(r1),
                "per_event_rate_ratio_10x_vs_1x": round(r10 / r1, 3),
                "num_partitions": 128,
                "merge_cache_rows": cache_rows,
                "n_cache_evictions": n_evictions,
                "weather": weather,
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
