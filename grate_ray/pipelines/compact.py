"""Lake compaction: collapse delta chains into snapshots, unify
per-partition snapshot schemas, GC superseded files.

Per SURVEY.md §7.4, mid-stream schema evolution writes commits in
whatever unified schema their *last commit* saw — partitions untouched
since an old epoch can lag — and delta commits (state/manifest.py) bound
write amplification at the cost of read amplification (chain reads).
Compaction (a) reconstructs each partition's latest state, (b) rewrites
it as ONE snapshot in the widened union of all live schemas, and (c)
garbage-collects files no longer on any kept commit's reconstruction
chain (manifests — the lineage log — are never deleted).

Compaction rewrites bytes but MUST NOT change logical state: the
rewritten snapshot is re-committed under the same ``lsn_hi`` (explicit
overwrite, manifest kind flipped to ``snapshot``), so resume/idempotence
keys are unchanged.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

from ..stages.evolve import reconcile, unify
from ..state.manifest import (
    committed_lsn,
    gc_superseded_states,
    list_partitions,
    manifest_path,
    read_state,
    state_path,
)


def compact_lake(
    lake_dir: str, num_partitions: int | None = None, keep: int = 1
) -> dict:
    """Returns {partitions_compacted, schemas_unified, snapshots_gced}.
    Partitions are discovered from the manifest tree; ``num_partitions``
    is accepted for API compatibility and ignored."""
    live: list[tuple[int, int, pa.Table]] = []
    for part in list_partitions(lake_dir):
        hw = committed_lsn(lake_dir, part)
        if hw is None:
            continue
        st = read_state(lake_dir, part, hw)
        if st is None:
            continue
        live.append((part, hw, st))
    if not live:
        return {"partitions_compacted": 0, "schemas_unified": 0, "snapshots_gced": 0}

    target = unify([t.schema for _, _, t in live])
    rewritten = 0
    for part, hw, state in live:
        mpath = manifest_path(lake_dir, part, hw)
        with open(mpath) as f:
            m = json.load(f)
        schema_ok = state.schema.equals(target)
        if schema_ok and m.get("kind", "snapshot") == "snapshot":
            continue  # already one snapshot in the target schema
        new_state = (
            state if schema_ok else reconcile(state, target).select(target.names)
        )
        spath = state_path(lake_dir, part, hw)
        tmp = spath + ".compact.tmp"
        pq.write_table(new_state, tmp)
        os.replace(tmp, spath)
        # flip the manifest to a snapshot commit in place (same commit key)
        m["kind"] = "snapshot"
        m["state_file"] = os.path.relpath(spath, lake_dir)
        m["state_rows"] = int(new_state.num_rows)
        m["schema"] = target.to_string()
        m["compacted"] = True
        tmpm = mpath + ".compact.tmp"
        with open(tmpm, "w") as f:
            json.dump(m, f)
        os.replace(tmpm, mpath)
        rewritten += 1

    gced = 0
    for part, _, _ in live:
        gced += len(gc_superseded_states(lake_dir, part, keep=keep))
    return {
        "partitions_compacted": len(live),
        "schemas_unified": rewritten,
        "snapshots_gced": gced,
    }
