"""Exactly-once commit manifests for the partitioned Parquet lake.

Design (SURVEY.md §4 checkpoint row; the hardened version of the
reference's append-only ``results.txt`` manifest,
/root/reference/cmd/grate2tsv/main.go:103-156):

- Lake layout: ``<lake>/part=<k>/state-<lsn_hi:012d>.parquet`` — one state
  snapshot per partition per committed LSN range. Deterministic names, so a
  retried writer overwrites byte-identical content in place (idempotent, the
  md5-layout trick at /root/reference/cmd/grate2tsv/main.go:186-188 done
  properly).
- Manifest: ``<lake>/_manifests/part=<k>/commit-<lsn_hi:012d>.json`` written
  via temp-file + atomic rename. A commit is visible iff its manifest
  exists; re-committing the same ``(partition, lsn_hi)`` is a no-op.
- Resume: the committed LSN high-water mark per partition = max manifest;
  a restarted job skips chunks at-or-below it per partition (exactly-once
  under at-least-once task retries: commit is the only side effect).
- Each manifest carries lineage + metrics: events applied by op, live rows,
  state file, parent commit (the per-partition lineage chain).
"""

from __future__ import annotations

import json
import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq


def part_dir(lake_dir: str, part: int) -> str:
    return os.path.join(lake_dir, f"part={part}")


def manifest_dir(lake_dir: str, part: int) -> str:
    return os.path.join(lake_dir, "_manifests", f"part={part}")


def state_path(lake_dir: str, part: int, lsn_hi: int) -> str:
    return os.path.join(part_dir(lake_dir, part), f"state-{lsn_hi:012d}.parquet")


def manifest_path(lake_dir: str, part: int, lsn_hi: int) -> str:
    return os.path.join(manifest_dir(lake_dir, part), f"commit-{lsn_hi:012d}.json")


def committed_lsn(lake_dir: str, part: int) -> int | None:
    """High-water mark: the max committed lsn_hi for a partition."""
    d = manifest_dir(lake_dir, part)
    if not os.path.isdir(d):
        return None
    lsns = [
        int(f[len("commit-") : -len(".json")])
        for f in os.listdir(d)
        if f.startswith("commit-") and f.endswith(".json")
    ]
    return max(lsns) if lsns else None


def read_manifest(lake_dir: str, part: int, lsn_hi: int) -> dict:
    with open(manifest_path(lake_dir, part, lsn_hi)) as f:
        return json.load(f)


def read_state(lake_dir: str, part: int, lsn_hi: int | None = None) -> pa.Table | None:
    """Latest committed state table for a partition (None if no commit)."""
    if lsn_hi is None:
        lsn_hi = committed_lsn(lake_dir, part)
    if lsn_hi is None:
        return None
    m = read_manifest(lake_dir, part, lsn_hi)
    return pq.read_table(os.path.join(lake_dir, m["state_file"]))


def commit_partition(
    lake_dir: str,
    part: int,
    lsn_lo: int,
    lsn_hi: int,
    state: pa.Table,
    metrics: dict | None = None,
) -> dict:
    """Atomically commit a partition state snapshot for [lsn_lo, lsn_hi].

    Idempotent: if the manifest for (part, lsn_hi) already exists, the
    commit is a no-op and the existing manifest is returned — making
    at-least-once task retries exactly-once at the lake level.
    """
    mpath = manifest_path(lake_dir, part, lsn_hi)
    if os.path.exists(mpath):
        with open(mpath) as f:
            return json.load(f)

    os.makedirs(part_dir(lake_dir, part), exist_ok=True)
    os.makedirs(manifest_dir(lake_dir, part), exist_ok=True)

    spath = state_path(lake_dir, part, lsn_hi)
    fd, tmp = tempfile.mkstemp(dir=part_dir(lake_dir, part), suffix=".tmp")
    os.close(fd)
    try:
        pq.write_table(state, tmp)
        os.replace(tmp, spath)  # atomic on POSIX
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)

    parent = committed_lsn(lake_dir, part)
    manifest = {
        "partition": part,
        "lsn_lo": lsn_lo,
        "lsn_hi": lsn_hi,
        "parent_lsn_hi": parent,
        "state_file": os.path.relpath(spath, lake_dir),
        "live_rows": int(state.num_rows),
        "metrics": metrics or {},
        "schema": state.schema.to_string(),
    }
    fd, tmp = tempfile.mkstemp(dir=manifest_dir(lake_dir, part), suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, mpath)
    return manifest


def lineage(lake_dir: str, part: int) -> list[dict]:
    """The commit chain for a partition, oldest → newest."""
    d = manifest_dir(lake_dir, part)
    if not os.path.isdir(d):
        return []
    out = []
    for f in sorted(os.listdir(d)):
        if f.startswith("commit-") and f.endswith(".json"):
            with open(os.path.join(d, f)) as fh:
                out.append(json.load(fh))
    return out


def gc_superseded_states(lake_dir: str, part: int, keep: int = 1) -> list[str]:
    """Remove state snapshots older than the newest ``keep`` commits
    (the manifests — the lineage log — are kept forever)."""
    chain = lineage(lake_dir, part)
    removed = []
    for m in chain[:-keep] if keep else chain:
        p = os.path.join(lake_dir, m["state_file"])
        if os.path.exists(p):
            os.unlink(p)
            removed.append(p)
    return removed
