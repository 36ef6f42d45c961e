"""CLI entry points — the analogue of the reference's two commands
(``cmd/grater`` print-everything and ``cmd/grate2tsv`` parallel extraction,
/root/reference/cmd/), recast for the CDC engine:

    python -m grate_ray.cli gen     --out DIR --events N [--epoch0 F] [--malformed F]
    python -m grate_ray.cli replay  --binlog DIR [--show N]           # grater
    python -m grate_ray.cli ingest  --binlog DIR --lake DIR [...]     # grate2tsv
    python -m grate_ray.cli show    --lake DIR [--limit N]
    python -m grate_ray.cli lineage --lake DIR --part K
    python -m grate_ray.cli compact --lake DIR

Owns its Ray session (the only module besides bench.py/tests allowed to).
"""

from __future__ import annotations

import argparse
import json
import sys


def _init_ray(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kw = {"num_cpus": num_cpus} if num_cpus else {}
        ray.init(
            address="local", include_dashboard=False,
            ignore_reinit_error=True, logging_level="ERROR", **kw,
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return ray


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="grate_ray")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("gen")
    g.add_argument("--out", required=True)
    g.add_argument("--events", type=int, default=100_000)
    g.add_argument("--convs", type=int, default=None)
    g.add_argument("--epoch0", type=float, default=0.0)
    g.add_argument("--malformed", type=float, default=0.0)
    g.add_argument("--seed", type=int, default=42)

    r = sub.add_parser("replay")
    r.add_argument("--binlog", required=True)
    r.add_argument("--partitions", type=int, default=32)
    r.add_argument("--show", type=int, default=10)

    i = sub.add_parser("ingest")
    i.add_argument("--binlog", required=True)
    i.add_argument("--lake", required=True)
    i.add_argument("--partitions", type=int, default=32)
    i.add_argument("--files-per-microbatch", type=int, default=8)

    s = sub.add_parser("show")
    s.add_argument("--lake", required=True)
    s.add_argument("--partitions", type=int, default=32)
    s.add_argument("--limit", type=int, default=20)

    ln = sub.add_parser("lineage")
    ln.add_argument("--lake", required=True)
    ln.add_argument("--part", type=int, required=True)

    c = sub.add_parser("compact")
    c.add_argument("--lake", required=True)
    c.add_argument("--partitions", type=int, default=32)
    c.add_argument("--keep", type=int, default=1)

    x = sub.add_parser("export")
    x.add_argument("--lake", required=True)
    x.add_argument("--out", required=True)
    x.add_argument("--partitions", type=int, default=32)
    x.add_argument("--format", choices=["csv", "parquet", "jsonl"], default="csv")

    b = sub.add_parser("branch")
    b.add_argument("--lake", required=True)
    b.add_argument("--out", required=True)
    b.add_argument("--at-lsn", type=int, default=None)
    b.add_argument("--at-tag", default=None)

    bd = sub.add_parser("diff")
    bd.add_argument("--lake", required=True)
    bd.add_argument("--branch", required=True)
    bd.add_argument("--limit", type=int, default=20)

    ff = sub.add_parser("ff")
    ff.add_argument("--lake", required=True)
    ff.add_argument("--branch", required=True)

    fk = sub.add_parser("fsck")
    fk.add_argument("--lake", required=True)
    fk.add_argument("--deep", action="store_true")

    ex = sub.add_parser("expire")
    ex.add_argument("--lake", required=True)
    ex.add_argument("--before", required=True, help="ISO timestamp cutoff")

    a = p.parse_args(argv)

    if a.cmd == "gen":
        from .genlog import GenSpec, generate_binlog

        spec = GenSpec(
            num_events=a.events,
            num_convs=a.convs or max(200, a.events // 500),
            seed=a.seed,
            epoch0_frac=a.epoch0,
            malformed_frac=a.malformed,
            chunk_rows=min(1_000_000, max(10_000, a.events // 8)),
        )
        paths = generate_binlog(a.out, spec)
        print(json.dumps({"files": len(paths), "events": a.events, "dir": a.out}))
        return 0

    ray = _init_ray(a.num_cpus)
    try:
        if a.cmd == "replay":
            from .pipelines.cdc import replay

            lake = replay(a.binlog, num_partitions=a.partitions)
            n = 0
            shown = 0
            for b in lake.iter_batches(batch_format="pyarrow"):
                n += b.num_rows
                if shown < a.show:
                    for row in b.slice(0, a.show - shown).to_pylist():
                        print("\t".join(str(v) for v in row.values()))
                        shown += 1
            print(json.dumps({"live_rows": n}), file=sys.stderr)
        elif a.cmd == "ingest":
            from .pipelines.ingest import ingest

            m = ingest(
                a.binlog, a.lake,
                num_partitions=a.partitions,
                files_per_microbatch=a.files_per_microbatch,
            )
            df = m.to_pandas()
            print(
                json.dumps(
                    {
                        "commits": int((~df["skipped"]).sum()),
                        "events": int(df["n_events"].sum()),
                        "live_rows": int(
                            df[~df["skipped"]]
                            .sort_values("lsn_hi")
                            .groupby("part")["live_rows"].last().sum()
                        ),
                    }
                )
            )
        elif a.cmd == "show":
            from .pipelines.ingest import read_lake

            df = read_lake(a.lake, num_partitions=a.partitions).limit(a.limit).to_pandas()
            print(df.to_string())
        elif a.cmd == "lineage":
            from .state.manifest import lineage

            for m in lineage(a.lake, a.part):
                print(json.dumps(m))
        elif a.cmd == "export":
            from .pipelines.ingest import export_lake

            n = export_lake(a.lake, a.out, num_partitions=a.partitions, fmt=a.format)
            print(json.dumps({"rows": n, "out": a.out, "format": a.format}))
        elif a.cmd == "compact":
            from .pipelines.compact import compact_lake

            out = compact_lake(a.lake, num_partitions=a.partitions, keep=a.keep)
            print(json.dumps(out))
        elif a.cmd == "branch":
            from .pipelines.branch import branch_lake

            print(json.dumps(branch_lake(a.lake, a.out, at_lsn=a.at_lsn,
                                         at_tag=a.at_tag)))
        elif a.cmd == "diff":
            from .pipelines.branch import diff_branches

            df = diff_branches(a.lake, a.branch).limit(a.limit).to_pandas()
            print(df.to_string())
        elif a.cmd == "ff":
            from .pipelines.branch import fast_forward_branch

            print(json.dumps(fast_forward_branch(a.lake, a.branch)))
        elif a.cmd == "fsck":
            from .pipelines.compact import fsck_lake

            out = fsck_lake(a.lake, deep=a.deep)
            print(json.dumps(out))
            return 0 if out["ok"] else 1
        elif a.cmd == "expire":
            from .pipelines.merge_into import expire_rows

            m = expire_rows(a.lake, a.before)
            df = m.to_pandas()
            print(json.dumps({"commits": int((~df["skipped"]).sum())
                              if len(df) else 0}))
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
