"""Lake compaction: collapse delta chains into snapshots, unify
per-partition snapshot schemas, GC superseded files — DISTRIBUTED, one
task per partition.

Per SURVEY.md §7.4, mid-stream schema evolution writes commits in
whatever unified schema their *last commit* saw — partitions untouched
since an old epoch can lag — and delta commits (state/manifest.py) bound
write amplification at the cost of read amplification (chain reads).
Compaction (a) reconstructs each partition's latest state, (b) rewrites
it as ONE snapshot in the widened union of all live schemas, and (c)
garbage-collects files no longer on any kept commit's reconstruction
chain (manifests — the lineage log — are never deleted).

Planning is driver-side but footer-only (``pq.read_schema`` of the chain
files); the state rewrite — the heavy part — runs as one Ray task per
partition over a partition-id Dataset, like ``read_lake``.

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
    chain_files,
    committed_lsn,
    gc_superseded_states,
    list_partitions,
    manifest_path,
    read_state,
    resolve_chain_file,
    state_path,
)


def _compact_partition(
    lake_dir: str, part: int, target: pa.Schema, keep: int
) -> tuple[int, int]:
    """(rewritten, gced) for one partition — runs inside a Ray task."""
    hw = committed_lsn(lake_dir, part)
    if hw is None:
        return 0, 0
    mpath = manifest_path(lake_dir, part, hw)
    with open(mpath) as f:
        m = json.load(f)
    files = chain_files(lake_dir, part, hw)
    needs_rewrite = m.get("kind", "snapshot") != "snapshot" or len(files) > 1
    rewritten = 0
    if not needs_rewrite and files:
        schema = pq.read_schema(resolve_chain_file(lake_dir, files[0]))
        needs_rewrite = not schema.equals(target)
    if needs_rewrite:
        state = read_state(lake_dir, part, hw)
        if state is None:
            return 0, 0
        if not state.schema.equals(target):
            state = reconcile(state, target).select(target.names)
        spath = state_path(lake_dir, part, hw)
        tmp = spath + ".compact.tmp"
        pq.write_table(state, tmp)
        os.replace(tmp, spath)
        # flip the manifest to a snapshot commit in place (same commit key)
        m["kind"] = "snapshot"
        m["state_file"] = os.path.relpath(spath, lake_dir)
        m["state_rows"] = int(state.num_rows)
        m["schema"] = target.to_string()
        m["compacted"] = True
        tmpm = mpath + ".compact.tmp"
        with open(tmpm, "w") as f:
            json.dump(m, f)
        os.replace(tmpm, mpath)
        rewritten = 1
    gced = len(gc_superseded_states(lake_dir, part, keep=keep))
    return rewritten, gced


def needs_compaction(lake_dir: str, max_chain: int = 8) -> bool:
    """Footer-only trigger check for the auto-compaction pass at the end
    of ``ingest``: true when any partition's reconstruction chain exceeds
    ``max_chain`` files (read amplification) or partitions' NEWEST chain
    files disagree on schema (a mid-stream evolution left lagging
    snapshots). O(partitions) manifest walks + parquet footer reads —
    no data pages touched."""
    schemas: set[str] = set()
    for p in list_partitions(lake_dir):
        if committed_lsn(lake_dir, p) is None:
            continue
        files = chain_files(lake_dir, p)
        if len(files) > max_chain:
            return True
        if files:
            newest = resolve_chain_file(lake_dir, files[-1])
            schemas.add(pq.read_schema(newest).to_string())
            if len(schemas) > 1:
                return True
    return False


def compact_lake(
    lake_dir: str, num_partitions: int | None = None, keep: int = 1
) -> dict:
    """Returns {partitions_compacted, schemas_unified, snapshots_gced}.
    Partitions are discovered from the manifest tree; ``num_partitions``
    is accepted for API compatibility and ignored."""
    import ray.data

    parts = [p for p in list_partitions(lake_dir) if committed_lsn(lake_dir, p) is not None]
    if not parts:
        return {"partitions_compacted": 0, "schemas_unified": 0, "snapshots_gced": 0}

    # footer-only schema planning: the unified target over every live
    # chain file (cheap — no data pages are read on the driver)
    schemas = []
    for p in parts:
        for f in chain_files(lake_dir, p):
            schemas.append(pq.read_schema(resolve_chain_file(lake_dir, f)))
    if not schemas:
        return {"partitions_compacted": 0, "schemas_unified": 0, "snapshots_gced": 0}
    target = unify(schemas)

    ds = ray.data.from_items([{"part": p} for p in parts]).repartition(len(parts))

    def work(t: pa.Table) -> pa.Table:
        rw, gc = [], []
        for p in t["part"].to_pylist():
            r, g = _compact_partition(lake_dir, int(p), target, keep)
            rw.append(r)
            gc.append(g)
        return pa.table(
            {"rewritten": pa.array(rw, pa.int64()), "gced": pa.array(gc, pa.int64())}
        )

    out = pa.concat_tables(
        list(
            ds.map_batches(work, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow"
            )
        )
    )
    import pyarrow.compute as pc

    return {
        "partitions_compacted": len(parts),
        "schemas_unified": int(pc.sum(out["rewritten"]).as_py() or 0),
        "snapshots_gced": int(pc.sum(out["gced"]).as_py() or 0),
    }


def repartition_lake(
    lake_dir: str, out_dir: str, new_partitions: int
) -> pa.Table:
    """RE-BUCKET the lake to a new partition count (the operational move
    when the cluster scales: key→partition is pinned at first ingest, so
    growing from P to P' requires a one-time re-hash). Exactness rules:

    - requires a DRAINED lake (every partition at the same committed
      high-water mark — true after any completed ``ingest`` call, whose
      empty commits advance all partitions per micro-batch); raises
      otherwise, because resuming a new lake whose high-water mark had to
      drop to min(old marks) would re-count metrics for the gap window;
    - each old partition's FULL envelope state (tombstones included —
      dropping them would let late out-of-order events resurrect deleted
      keys) re-hashes by ``crc32(conv_id) % P'`` in one keyed exchange;
    - every new partition commits ONE snapshot at the same ``lsn_hi``,
      so a subsequent ``ingest(out_dir, ...)`` resumes exactly where the
      old lake stopped; the micro-batch plan and column-mapping sidecars
      carry over verbatim.

    Returns (part, state_rows) per new partition. Idempotent: manifests
    make the re-run a no-op."""
    import shutil

    import ray
    import ray.data

    from ..context import configure_shuffle
    from ..schema import KEY_COLS
    from ..stages.partition import add_partition_column
    from ..state.manifest import (
        batch_plan_path,
        column_mapping_path,
        commit_partition,
    )
    from ..state.manifest import write_lake_config as _wlc

    parts = list_partitions(lake_dir)
    if not parts:
        raise ValueError(f"no committed partitions under {lake_dir}")
    hws = {p: committed_lsn(lake_dir, p) for p in parts}
    hw_set = {h for h in hws.values() if h is not None}
    if len(hw_set) != 1:
        raise ValueError(
            f"repartition requires a drained lake (equal per-partition "
            f"high-water marks); got {sorted(hw_set)}"
        )
    hw = hw_set.pop()

    os.makedirs(out_dir, exist_ok=True)
    _wlc(out_dir, new_partitions)
    for sidecar in (batch_plan_path(lake_dir), column_mapping_path(lake_dir)):
        if os.path.exists(sidecar):
            shutil.copy(
                sidecar, os.path.join(out_dir, os.path.basename(sidecar))
            )

    configure_shuffle(new_partitions)
    src = ray.data.from_items([{"part": p} for p in parts]).repartition(
        len(parts)
    )

    def load(t: pa.Table) -> pa.Table:
        out = []
        for p in t["part"].to_pylist():
            st = read_state(lake_dir, int(p))
            if st is None or st.num_rows == 0:
                continue
            out.append(
                add_partition_column(st.drop_columns(["part"]) if "part" in
                                     st.column_names else st, new_partitions)
            )
        if not out:
            from ..schema import BINLOG_SCHEMA

            e = BINLOG_SCHEMA.empty_table()
            return add_partition_column(e, new_partitions)
        return pa.concat_tables(out, promote_options="default")

    def commit_group(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"part": pa.array([], pa.int32()),
                 "state_rows": pa.array([], pa.int64())}
            )
        import pyarrow.compute as pc

        part = int(t["part"][0].as_py())
        st = t.drop_columns(["part"])
        order = pc.sort_indices(
            st, sort_keys=[(k, "ascending") for k in KEY_COLS]
        )
        st = st.take(order)
        commit_partition(out_dir, part, 0, hw, st, {"repartitioned_from": len(parts)})
        return pa.table(
            {
                "part": pa.array([part], pa.int32()),
                "state_rows": pa.array([st.num_rows], pa.int64()),
            }
        )

    res = (
        src.map_batches(load, batch_format="pyarrow")
        .groupby("part")
        .map_groups(commit_group, batch_format="pyarrow")
        .to_pandas()
    )
    # partitions with no rows still need an empty commit so the new
    # lake's high-water mark is uniform (resume prunes correctly)
    from ..state.manifest import commit_empty

    done = set(res["part"].astype(int)) if len(res) else set()
    for p in range(new_partitions):
        if p not in done:
            commit_empty(out_dir, p, 0, hw)
    return pa.Table.from_pandas(res, preserve_index=False)


def lake_stats(lake_dir: str) -> dict:
    """Operational one-pager for a lake — footer/manifest-only (no data
    file is read): per-partition chain lengths and state rows, commit
    counts by kind, on-disk bytes, schema-epoch spread (how many distinct
    newest-commit schemas exist — >1 means compaction would unify), and
    the global committed high-water mark."""
    from ..state.manifest import lineage

    parts = list_partitions(lake_dir)
    kinds: dict[str, int] = {}
    chains: list[int] = []
    rows = 0
    newest_schemas = set()
    hw = None
    data_bytes = 0
    n_files = 0
    for p in parts:
        chain = lineage(lake_dir, p)
        for m in chain:
            kinds[m.get("kind", "snapshot")] = (
                kinds.get(m.get("kind", "snapshot"), 0) + 1
            )
        h = committed_lsn(lake_dir, p)
        if h is not None:
            hw = h if hw is None else max(hw, h)
            rows += read_manifest_rows(lake_dir, p, h)
        chains.append(len(chain_files(lake_dir, p)))
        for m in reversed(chain):
            if m.get("schema"):
                newest_schemas.add(m["schema"])
                break
        pdir = os.path.join(lake_dir, f"part={p}")
        if os.path.isdir(pdir):
            for f in os.listdir(pdir):
                fp = os.path.join(pdir, f)
                if f.endswith(".parquet") and os.path.isfile(fp):
                    data_bytes += os.path.getsize(fp)
                    n_files += 1
    return {
        "partitions": len(parts),
        "committed_hw_lsn": hw,
        "state_rows": rows,
        "commits_by_kind": kinds,
        "max_chain_len": max(chains) if chains else 0,
        "data_files": n_files,
        "data_bytes": data_bytes,
        "schema_epochs": len(newest_schemas),
    }


def read_manifest_rows(lake_dir: str, part: int, lsn_hi: int) -> int:
    from ..state.manifest import read_manifest

    return int(read_manifest(lake_dir, part, lsn_hi).get("state_rows", 0))


def vacuum_lake(lake_dir: str, keep: int = 1) -> dict:
    """Housekeeping sweep: GC superseded chain files across every
    partition (manifests — the lineage log — are never deleted) and
    remove orphaned ``*.tmp`` staging files left by killed writers.
    Returns {"gced": n, "tmp_removed": n}."""
    gced = 0
    for p in list_partitions(lake_dir):
        gced += len(gc_superseded_states(lake_dir, p, keep=keep))
    tmp_removed = 0
    for root, _dirs, files in os.walk(lake_dir):
        for f in files:
            if f.endswith(".tmp"):
                os.unlink(os.path.join(root, f))
                tmp_removed += 1
    return {"gced": gced, "tmp_removed": tmp_removed}


def fsck_lake(lake_dir: str, deep: bool = False) -> dict:
    """Consistency check over the lake's commit metadata (the operational
    "is this lake safe to serve/resume from" probe):

    - config present; every manifest parses; the commit filename LSN
      matches the manifest's ``lsn_hi`` and ``lsn_lo <= lsn_hi``;
    - per-partition lineage links: each commit's ``parent_lsn_hi`` equals
      the previous commit's ``lsn_hi`` (None for the first);
    - the HEAD reconstruction chain's data files resolve (including
      through branch parents) — a GC'd head chain is an error, a GC'd
      historical chain is only reported under ``deep``;
    - ``deep``: every head chain file opens, and a snapshot manifest's
      ``state_rows`` equals the file's actual row count.

    Pure metadata + footer reads (data pages only under ``deep``).
    Returns {"ok", "partitions", "commits", "checked_files", "errors"}.
    """
    import json as _json

    from ..state.manifest import (
        _commit_lsns,
        lake_num_partitions,
        manifest_path,
        read_manifest,
        resolve_chain_file,
    )

    errors: list[str] = []
    checked = 0
    n_commits = 0
    if lake_num_partitions(lake_dir) is None:
        errors.append("missing _lake.json (not a lake)")
    parts = list_partitions(lake_dir)
    for p in parts:
        lsns = _commit_lsns(lake_dir, p)
        prev = None
        for lsn in lsns:
            n_commits += 1
            try:
                m = read_manifest(lake_dir, p, lsn)
            except (OSError, _json.JSONDecodeError) as e:
                errors.append(f"part {p} commit {lsn}: unreadable manifest ({e})")
                prev = lsn
                continue
            if m.get("lsn_hi") != lsn:
                errors.append(
                    f"part {p} commit {lsn}: manifest lsn_hi={m.get('lsn_hi')} "
                    "disagrees with its filename"
                )
            if m.get("lsn_lo") is not None and m["lsn_lo"] > lsn:
                errors.append(f"part {p} commit {lsn}: lsn_lo > lsn_hi")
            if m.get("parent_lsn_hi") != prev:
                errors.append(
                    f"part {p} commit {lsn}: parent_lsn_hi="
                    f"{m.get('parent_lsn_hi')} but previous commit is {prev}"
                )
            prev = lsn
        # head chain must reconstruct
        try:
            files = chain_files(lake_dir, p)
        except Exception as e:
            errors.append(f"part {p}: head chain walk failed ({e})")
            files = []
        for f in files:
            path = resolve_chain_file(lake_dir, f)
            if not os.path.exists(path):
                errors.append(f"part {p}: head chain file missing: {f}")
                continue
            if deep:
                try:
                    pq.read_metadata(path)
                    checked += 1
                except Exception as e:
                    errors.append(f"part {p}: unreadable chain file {f} ({e})")
        if deep and files:
            hw = committed_lsn(lake_dir, p)
            try:
                m = read_manifest(lake_dir, p, hw)
                if m.get("kind") == "snapshot" and m.get("state_file"):
                    path = resolve_chain_file(lake_dir, m["state_file"])
                    rows = pq.read_metadata(path).num_rows
                    if rows != m.get("state_rows"):
                        errors.append(
                            f"part {p} head snapshot rows {rows} != manifest "
                            f"state_rows {m.get('state_rows')}"
                        )
            except Exception as e:
                errors.append(f"part {p}: head snapshot check failed ({e})")
    return {
        "ok": not errors,
        "partitions": len(parts),
        "commits": n_commits,
        "checked_files": checked,
        "errors": errors,
    }
