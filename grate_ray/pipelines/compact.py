"""Lake compaction: unify per-partition snapshot schemas + GC superseded
snapshots.

Per SURVEY.md §7.4, mid-stream schema evolution writes snapshots in
whatever unified schema their *last commit* saw — partitions untouched
since an old epoch can lag. Compaction brings every partition's latest
snapshot to the join (widened union) of all live snapshot schemas, and
garbage-collects superseded snapshot files (manifests — the lineage log —
are never deleted).

Compaction rewrites bytes but MUST NOT change logical state: the rewritten
snapshot is re-committed under the same ``lsn_hi`` (explicit overwrite),
so resume/idempotence keys are unchanged.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from ..stages.evolve import reconcile, unify
from ..state.manifest import (
    committed_lsn,
    gc_superseded_states,
    manifest_path,
    read_state,
    state_path,
)


def compact_lake(lake_dir: str, num_partitions: int = 32, keep: int = 1) -> dict:
    """Returns {partitions_compacted, schemas_unified, snapshots_gced}."""
    live: list[tuple[int, int, pa.Table]] = []
    for part in range(num_partitions):
        hw = committed_lsn(lake_dir, part)
        if hw is None:
            continue
        live.append((part, hw, read_state(lake_dir, part, hw)))
    if not live:
        return {"partitions_compacted": 0, "schemas_unified": 0, "snapshots_gced": 0}

    target = unify([t.schema for _, _, t in live])
    rewritten = 0
    for part, hw, state in live:
        if state.schema.equals(target):
            continue
        new_state = reconcile(state, target).select(target.names)
        spath = state_path(lake_dir, part, hw)
        tmp = spath + ".compact.tmp"
        pq.write_table(new_state, tmp)
        os.replace(tmp, spath)
        # refresh the manifest's recorded schema in place (same commit key)
        import json

        mpath = manifest_path(lake_dir, part, hw)
        with open(mpath) as f:
            m = json.load(f)
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
