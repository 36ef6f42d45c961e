"""Exactly-once commit manifests for the partitioned Parquet lake.

Design (SURVEY.md §4 checkpoint row; the hardened version of the
reference's append-only ``results.txt`` manifest,
/root/reference/cmd/grate2tsv/main.go:103-156):

- Lake layout: ``<lake>/part=<k>/state-<lsn_hi:012d>.parquet`` (full
  snapshot) and ``<lake>/part=<k>/delta-<lsn_hi:012d>.parquet`` (one
  micro-batch's LWW winners). Deterministic names, so a retried writer
  overwrites byte-identical content in place (idempotent, the md5-layout
  trick at /root/reference/cmd/grate2tsv/main.go:186-188 done properly).
- Manifest: ``<lake>/_manifests/part=<k>/commit-<lsn_hi:012d>.json`` written
  via temp-file + atomic rename. A commit is visible iff its manifest
  exists; re-committing the same ``(partition, lsn_hi)`` is a no-op.
- Commit kinds: ``snapshot`` (full state), ``delta`` (only this
  micro-batch's reduced winners — O(delta) write amplification instead of
  O(state) per commit), ``empty`` (no events for this partition in the
  micro-batch; advances the high-water mark so resume can prune files).
  State at any commit = nearest snapshot at-or-before it + LWW-merge of
  the deltas after it (exact: LWW-with-tombstones is associative).
- Resume: the committed LSN high-water mark per partition = max manifest;
  a restarted job skips chunks at-or-below it per partition (exactly-once
  under at-least-once task retries: commit is the only side effect).
- Each manifest carries lineage + metrics: events applied by op, state
  rows, state file, parent commit (the per-partition lineage chain).
- ``<lake>/_lake.json`` records the partition count: readers discover
  partitions from the manifest tree, and a re-ingest with a different
  partition count errors instead of silently splitting the key space.
"""

from __future__ import annotations

import json
import os
import tempfile

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def part_dir(lake_dir: str, part: int) -> str:
    return os.path.join(lake_dir, f"part={part}")


def manifest_dir(lake_dir: str, part: int) -> str:
    return os.path.join(lake_dir, "_manifests", f"part={part}")


def state_path(lake_dir: str, part: int, lsn_hi: int) -> str:
    return os.path.join(part_dir(lake_dir, part), f"state-{lsn_hi:012d}.parquet")


def delta_path(lake_dir: str, part: int, lsn_hi: int) -> str:
    return os.path.join(part_dir(lake_dir, part), f"delta-{lsn_hi:012d}.parquet")


def manifest_path(lake_dir: str, part: int, lsn_hi: int) -> str:
    return os.path.join(manifest_dir(lake_dir, part), f"commit-{lsn_hi:012d}.json")


def lake_config_path(lake_dir: str) -> str:
    return os.path.join(lake_dir, "_lake.json")


def batch_plan_path(lake_dir: str) -> str:
    return os.path.join(lake_dir, "_batch_plan.json")


def read_batch_plan(lake_dir: str) -> list[list[int]]:
    """Persisted micro-batch LSN windows [[lo, hi], ...], ascending.

    Commit metrics are exact only if a resumed run replays the SAME
    micro-batch windows it first planned (a window straddling an old
    high-water mark would mix already-counted raw events into reduced
    rows whose winner lsn is above the mark). Persisting the plan makes
    boundaries independent of the resume's ``files_per_microbatch``."""
    p = batch_plan_path(lake_dir)
    if not os.path.exists(p):
        return []
    with open(p) as f:
        return json.load(f).get("batches", [])


def append_batch_plan(lake_dir: str, new_batches: list[list[int]]) -> None:
    """Extend the persisted plan (atomic rewrite; windows append-only)."""
    if not new_batches:
        return
    batches = read_batch_plan(lake_dir) + [list(b) for b in new_batches]
    os.makedirs(lake_dir, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=lake_dir, suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump({"batches": batches}, f)
    os.replace(tmp, batch_plan_path(lake_dir))


def column_mapping_path(lake_dir: str) -> str:
    return os.path.join(lake_dir, "_column_mapping.json")


def read_column_mapping(lake_dir: str) -> dict:
    """The lake's read-side schema evolution sidecar (Delta-column-mapping
    style): ``renames`` maps PHYSICAL column names (as stored in data
    files) → logical names readers see; ``drops`` lists physical names
    removed from the logical schema. Data files are never rewritten —
    renames and drops are metadata-only and apply at read time."""
    p = column_mapping_path(lake_dir)
    if not os.path.exists(p):
        return {"renames": {}, "drops": []}
    with open(p) as f:
        return json.load(f)


def _physical_columns(lake_dir: str) -> set[str]:
    """Physical column names stored in lake data files, read from the
    newest chain manifest's stats (no parquet footer touched)."""
    for p in list_partitions(lake_dir):
        for m in reversed(_chain_manifests(lake_dir, p)):
            s = m.get("stats")
            if s:
                return set(s)
    return set()


def evolve_lake_schema(
    lake_dir: str,
    rename: dict[str, str] | None = None,
    drop: list[str] | None = None,
) -> dict:
    """Apply rename/drop schema evolution to the lake's LOGICAL schema
    (metadata-only; no data file is touched). ``rename`` keys and ``drop``
    entries are CURRENT logical names. Validates: key/envelope columns are
    untouchable, rename targets must not collide with existing logical
    names, and renames compose across calls (a→b then b→c reads a's
    physical data as c). Returns the updated mapping."""
    from ..stages.evolve import PROTECTED_COLS

    m = read_column_mapping(lake_dir)
    renames: dict[str, str] = dict(m.get("renames", {}))
    drops: set[str] = set(m.get("drops", []))
    physical = _physical_columns(lake_dir)

    def logical_view() -> dict[str, str]:
        """current logical name → physical name"""
        return {
            renames.get(c, c): c for c in physical if c not in drops
        }

    for old, new in (rename or {}).items():
        if old in PROTECTED_COLS or new in PROTECTED_COLS:
            raise ValueError(
                f"cannot rename key/envelope column {old!r} -> {new!r}"
            )
        view = logical_view()
        if physical and old not in view:
            raise ValueError(f"unknown column {old!r}")
        if new in view and view[new] != view.get(old):
            raise ValueError(f"rename target {new!r} collides")
        phys = view.get(old, old)
        renames.pop(phys, None)
        if new != phys:
            renames[phys] = new

    for logical in drop or []:
        if logical in PROTECTED_COLS:
            raise ValueError(f"cannot drop key/envelope column {logical!r}")
        view = logical_view()
        if physical and logical not in view:
            raise ValueError(f"unknown column {logical!r}")
        phys = view.get(logical, logical)
        drops.add(phys)
        renames.pop(phys, None)

    out = {"renames": renames, "drops": sorted(drops)}
    os.makedirs(lake_dir, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=lake_dir, suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(out, f)
    os.replace(tmp, column_mapping_path(lake_dir))
    return out


def write_lake_config(lake_dir: str, num_partitions: int) -> None:
    """Persist (or validate) the lake's partition count. The hash mapping
    key→partition is fixed at first ingest; re-ingesting with a different
    count would split the key space silently — error instead."""
    p = lake_config_path(lake_dir)
    if os.path.exists(p):
        with open(p) as f:
            existing = json.load(f)
        if existing.get("num_partitions") != num_partitions:
            raise ValueError(
                f"lake {lake_dir} was created with num_partitions="
                f"{existing.get('num_partitions')}, got {num_partitions}"
            )
        return
    os.makedirs(lake_dir, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=lake_dir, suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump({"num_partitions": num_partitions}, f)
    os.replace(tmp, p)


def lake_parent(lake_dir: str) -> str | None:
    """Parent lake of a copy-on-write branch (None for a root lake)."""
    p = lake_config_path(lake_dir)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f).get("parent")


def resolve_chain_file(lake_dir: str, f: str) -> str:
    """Resolve a lake-relative chain file to an absolute path, falling
    back through the branch parent chain: a copy-on-write branch copies
    only manifests at branch time and SHARES the parent's immutable data
    files until it diverges — files committed after the branch live in
    the branch dir, inherited files stay in (an ancestor of) the parent.
    Returns the local path (possibly nonexistent) when no ancestor has
    the file, so callers keep their GC error reporting."""
    local = os.path.join(lake_dir, f)
    p, d, seen = local, lake_dir, set()
    while not os.path.exists(p):
        parent = lake_parent(d)
        if parent is None or parent in seen:
            return local
        seen.add(parent)
        p = os.path.join(parent, f)
        d = parent
    return p


def lake_num_partitions(lake_dir: str) -> int | None:
    p = lake_config_path(lake_dir)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f).get("num_partitions")


def list_partitions(lake_dir: str) -> list[int]:
    """Partitions that have ever committed — discovered from the manifest
    tree, never trusted from a caller-supplied count (a smaller count must
    not silently drop data at read time)."""
    d = os.path.join(lake_dir, "_manifests")
    if not os.path.isdir(d):
        return []
    out = []
    for name in os.listdir(d):
        if name.startswith("part="):
            try:
                out.append(int(name[len("part="):]))
            except ValueError:
                continue
    return sorted(out)


def committed_lsn(
    lake_dir: str, part: int, asof_lsn: int | None = None
) -> int | None:
    """High-water mark: the max committed lsn_hi for a partition — or,
    with ``asof_lsn``, the newest commit at-or-below it (the commit a
    time-travel read resolves to; None if the partition's first commit is
    later than ``asof_lsn``)."""
    d = manifest_dir(lake_dir, part)
    if not os.path.isdir(d):
        return None
    lsns = [
        int(f[len("commit-") : -len(".json")])
        for f in os.listdir(d)
        if f.startswith("commit-") and f.endswith(".json")
    ]
    if asof_lsn is not None:
        lsns = [l for l in lsns if l <= asof_lsn]
    return max(lsns) if lsns else None


def read_manifest(lake_dir: str, part: int, lsn_hi: int) -> dict:
    with open(manifest_path(lake_dir, part, lsn_hi)) as f:
        return json.load(f)


def _merge_chain(tables: list[pa.Table]) -> pa.Table:
    """LWW-merge snapshot + deltas (full envelope incl. tombstones),
    reconciling schemas across evolution epochs."""
    from ..stages.evolve import reconcile, unify
    from ..stages.merge import lww_reduce

    target = unify([t.schema for t in tables])
    tables = [
        t if t.schema.equals(target) else reconcile(t, target).select(target.names)
        for t in tables
    ]
    return lww_reduce(pa.concat_tables(tables, promote_options="default"))


def _column_stats(table: pa.Table) -> dict:
    """Per-column zone-map stats written into every data-file commit
    (the Delta-log move: stats live in the commit metadata, so query
    planning never opens a parquet footer). Three shapes per column:

    - ``{"min": v, "max": v, "n_null": k}`` — known range (timestamps
      encoded as epoch-microsecond ints so the JSON round-trip is exact);
    - ``{"all_null": true, "n_null": n}`` — every value null (ignorable
      for pruning: a comparison predicate drops nulls);
    - ``{"unknown": true}`` — column present but unrankable (nested type,
      or a float range poisoned by NaN) — poisons pruning on the column.
    """
    stats: dict[str, dict] = {}
    for i, field in enumerate(table.schema):
        t = field.type
        if not (
            pa.types.is_integer(t)
            or pa.types.is_floating(t)
            or pa.types.is_string(t)
            or pa.types.is_large_string(t)
            or pa.types.is_boolean(t)
            or pa.types.is_timestamp(t)
        ):
            stats[field.name] = {"unknown": True}
            continue
        col = table.column(i)
        n_null = col.null_count
        if n_null == table.num_rows:
            stats[field.name] = {"all_null": True, "n_null": n_null}
            continue
        mm = pc.min_max(col)
        lo, hi = mm["min"], mm["max"]
        if pa.types.is_timestamp(t):
            lo, hi = lo.value, hi.value
        else:
            lo, hi = lo.as_py(), hi.as_py()
        if isinstance(lo, float) and (lo != lo or hi != hi):  # NaN poisons
            stats[field.name] = {"unknown": True}
            continue
        stats[field.name] = {"min": lo, "max": hi, "n_null": n_null}
    return stats


def _commit_lsns(lake_dir: str, part: int) -> list[int]:
    d = manifest_dir(lake_dir, part)
    if not os.path.isdir(d):
        return []
    return sorted(
        int(f[len("commit-") : -len(".json")])
        for f in os.listdir(d)
        if f.startswith("commit-") and f.endswith(".json")
    )


def _chain_manifests(
    lake_dir: str, part: int, lsn_hi: int | None = None
) -> list[dict]:
    """Manifests of the data files reconstructing a commit: nearest
    snapshot at-or-before it, then every delta after, in order. Empty
    commits contribute nothing. Walks the manifest chain BACKWARD from
    the commit so cost is O(deltas since last snapshot), not
    O(total commits)."""
    if lsn_hi is None:
        lsn_hi = committed_lsn(lake_dir, part)
    if lsn_hi is None:
        return []
    out_rev: list[dict] = []
    for lsn in reversed([l for l in _commit_lsns(lake_dir, part) if l <= lsn_hi]):
        m = read_manifest(lake_dir, part, lsn)
        kind = m.get("kind", "snapshot")
        if kind == "snapshot":
            out_rev.append(m)
            break
        if kind == "delta":
            out_rev.append(m)
    return list(reversed(out_rev))


def chain_files(lake_dir: str, part: int, lsn_hi: int | None = None) -> list[str]:
    """The state/delta files (lake-relative) reconstructing a commit."""
    return [m["state_file"] for m in _chain_manifests(lake_dir, part, lsn_hi)]


def chain_stats(
    lake_dir: str, part: int, lsn_hi: int | None = None
) -> dict[str, dict] | None:
    """ZONE MAP for a commit: per-column union (min of mins, max of
    maxes) of the chain's data-file stats. Sound for pruning the FINAL
    LWW state because every final value appears verbatim in some chain
    file — a union range that excludes a predicate excludes every row the
    reconstruction can produce (tombstone key values only widen the
    union, never narrow it). A column missing from an older file's stats
    (pre-evolution epoch) is fine: rows whose winner comes from that file
    read as null for the column, and comparison predicates drop nulls.

    Returns None when any chain manifest predates stats entirely —
    pruning then degrades to "keep the partition" (sound).
    """
    mans = _chain_manifests(lake_dir, part, lsn_hi)
    if not mans:
        return None
    zone: dict[str, dict] = {}
    for m in mans:
        s = m.get("stats")
        if s is None:
            return None
        for col, cs in s.items():
            if cs.get("unknown"):
                zone[col] = {"unknown": True}
                continue
            if cs.get("all_null"):
                # record that the column EXISTS (vs a never-seen name) so
                # zone_may_match can distinguish "all-null everywhere"
                # (provably no comparison match) from a typo'd filter column
                zone.setdefault(col, {"all_null": True})
                continue
            z = zone.get(col)
            if z is None or z.get("all_null"):
                zone[col] = {"min": cs["min"], "max": cs["max"]}
            elif not z.get("unknown"):
                z["min"] = min(z["min"], cs["min"])
                z["max"] = max(z["max"], cs["max"])
    return zone


def zone_may_match(zone: dict[str, dict], col: str, op: str, val) -> bool:
    """Can any row of a partition whose zone map is ``zone`` satisfy
    ``col <op> val``? False ⇒ the partition is provably empty under the
    predicate and its chain is never read. Poisoned stats keep the
    partition (sound). A column recorded as all-null in every chain file
    never matches a comparison; a column NEVER seen in any chain stats
    (likely a typo'd filter) keeps the partition so the exact downstream
    filter raises on the unknown name instead of silently pruning to
    an empty result."""
    cs = zone.get(col)
    if cs is None:
        return True  # unknown column: let the exact filter surface the error
    if cs.get("all_null"):
        return False  # all-null everywhere: comparison predicates drop nulls
    if cs.get("unknown"):
        return True
    lo, hi = cs["min"], cs["max"]
    if op == "==":
        return lo <= val <= hi
    if op == "!=":
        return not (lo == hi == val)
    if op == "<":
        return lo < val
    if op == "<=":
        return lo <= val
    if op == ">":
        return hi > val
    if op == ">=":
        return hi >= val
    raise ValueError(f"unsupported filter op {op!r}")


def deltas_since_snapshot(lake_dir: str, part: int) -> int:
    return max(0, len(chain_files(lake_dir, part)) - 1)


def read_state(
    lake_dir: str,
    part: int,
    lsn_hi: int | None = None,
    columns: list[str] | None = None,
) -> pa.Table | None:
    """Committed state table for a partition (None if no commit): the
    nearest snapshot plus LWW-merged deltas. ``columns`` pushes parquet
    column projection into each chain-file read (files missing a
    requested column — older evolution epochs — read what they have; the
    chain merge reconciles schemas)."""
    files = chain_files(lake_dir, part, lsn_hi)
    if not files:
        return None
    tables = []
    for f in files:
        path = resolve_chain_file(lake_dir, f)
        if not os.path.exists(path):
            # the manifest (lineage) is kept forever, but GC/compaction may
            # have removed superseded chain files — surface a clear error
            # instead of a bare FileNotFoundError from the parquet reader
            raise ValueError(
                f"cannot reconstruct partition {part} at lsn_hi={lsn_hi}: "
                f"chain file {f!r} was garbage-collected (raise the GC/"
                f"compaction `keep` to retain time-travel history)"
            )
        cols = None
        if columns is not None:
            have = set(pq.read_schema(path).names)
            cols = [c for c in columns if c in have]
        tables.append(pq.read_table(path, columns=cols))
    if len(tables) == 1:
        return tables[0]
    return _merge_chain(tables)


def _write_parquet_atomic(table: pa.Table, path: str, dir_: str) -> None:
    fd, tmp = tempfile.mkstemp(dir=dir_, suffix=".tmp")
    os.close(fd)
    try:
        pq.write_table(table, tmp)
        os.replace(tmp, path)  # atomic on POSIX
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def _write_manifest_atomic(manifest: dict, mpath: str, dir_: str) -> None:
    fd, tmp = tempfile.mkstemp(dir=dir_, suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, mpath)


def _commit(
    lake_dir: str,
    part: int,
    lsn_lo: int,
    lsn_hi: int,
    kind: str,
    table: pa.Table | None,
    metrics: dict | None,
    state_rows: int,
) -> dict:
    """Shared commit path. Idempotent: an existing manifest for
    (part, lsn_hi) wins and is returned unchanged — making at-least-once
    task retries exactly-once at the lake level."""
    mpath = manifest_path(lake_dir, part, lsn_hi)
    if os.path.exists(mpath):
        with open(mpath) as f:
            return json.load(f)

    os.makedirs(part_dir(lake_dir, part), exist_ok=True)
    os.makedirs(manifest_dir(lake_dir, part), exist_ok=True)

    state_file = None
    if table is not None:
        path = (
            state_path(lake_dir, part, lsn_hi)
            if kind == "snapshot"
            else delta_path(lake_dir, part, lsn_hi)
        )
        _write_parquet_atomic(table, path, part_dir(lake_dir, part))
        state_file = os.path.relpath(path, lake_dir)

    parent = committed_lsn(lake_dir, part)
    manifest = {
        "partition": part,
        "kind": kind,
        "lsn_lo": lsn_lo,
        "lsn_hi": lsn_hi,
        "parent_lsn_hi": parent,
        "state_file": state_file,
        # tombstone-INCLUSIVE row count of the partition state at this
        # commit; the ingest metrics column `live_rows` excludes tombstones
        "state_rows": state_rows,
        "metrics": metrics or {},
        "schema": table.schema.to_string() if table is not None else None,
        # zone-map stats for the data file (None for empty commits)
        "stats": _column_stats(table) if table is not None else None,
    }
    _write_manifest_atomic(manifest, mpath, manifest_dir(lake_dir, part))
    return manifest


def commit_partition(
    lake_dir: str,
    part: int,
    lsn_lo: int,
    lsn_hi: int,
    state: pa.Table,
    metrics: dict | None = None,
) -> dict:
    """Atomically commit a FULL partition state snapshot for
    [lsn_lo, lsn_hi]."""
    return _commit(
        lake_dir, part, lsn_lo, lsn_hi, "snapshot", state, metrics, state.num_rows
    )


def commit_delta(
    lake_dir: str,
    part: int,
    lsn_lo: int,
    lsn_hi: int,
    delta: pa.Table,
    state_rows: int,
    metrics: dict | None = None,
) -> dict:
    """Commit only this micro-batch's LWW winners (O(delta) bytes written,
    not O(state)); ``state_rows`` records the resulting full-state size."""
    return _commit(
        lake_dir, part, lsn_lo, lsn_hi, "delta", delta, metrics, state_rows
    )


def commit_empty(lake_dir: str, part: int, lsn_lo: int, lsn_hi: int) -> dict:
    """Commit a no-event micro-batch for a partition: advances the
    high-water mark (so resume can prune fully-committed binlog files even
    when some partitions never receive events) without writing any data."""
    prev = committed_lsn(lake_dir, part)
    prev_rows = 0
    if prev is not None:
        prev_rows = read_manifest(lake_dir, part, prev).get("state_rows", 0)
    return _commit(lake_dir, part, lsn_lo, lsn_hi, "empty", None, None, prev_rows)


def tags_path(lake_dir: str) -> str:
    return os.path.join(lake_dir, "_tags.json")


def read_tags(lake_dir: str) -> dict[str, int]:
    p = tags_path(lake_dir)
    if not os.path.exists(p):
        return {}
    with open(p) as f:
        return json.load(f)


def tag_lake(lake_dir: str, name: str, lsn: int | None = None) -> int:
    """Pin a NAMED TAG to a commit point (table-format style: a stable
    name for reproducible reads — 'the lake as training run X saw it').
    Defaults to the current global high-water mark. Tags are immutable:
    re-tagging an existing name to a different LSN raises (delete first
    with ``untag_lake``). Returns the pinned LSN. Retention caveat: a
    tag pins the *commit point*, not the chain files — raise the GC
    ``keep`` to retain the bytes the tag resolves through."""
    if lsn is None:
        hws = [
            committed_lsn(lake_dir, p) for p in list_partitions(lake_dir)
        ]
        hws = [h for h in hws if h is not None]
        if not hws:
            raise ValueError(f"no commits to tag under {lake_dir}")
        lsn = max(hws)
    tags = read_tags(lake_dir)
    if name in tags and tags[name] != lsn:
        raise ValueError(
            f"tag {name!r} already pins lsn {tags[name]} (tags are "
            f"immutable; untag_lake first)"
        )
    tags[name] = int(lsn)
    fd, tmp = tempfile.mkstemp(dir=lake_dir, suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(tags, f)
    os.replace(tmp, tags_path(lake_dir))
    return int(lsn)


def untag_lake(lake_dir: str, name: str) -> None:
    tags = read_tags(lake_dir)
    tags.pop(name, None)
    fd, tmp = tempfile.mkstemp(dir=lake_dir, suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(tags, f)
    os.replace(tmp, tags_path(lake_dir))


def resolve_tag(lake_dir: str, name: str) -> int:
    tags = read_tags(lake_dir)
    if name not in tags:
        raise ValueError(f"unknown tag {name!r} (have {sorted(tags)})")
    return tags[name]


def backfill_stats(lake_dir: str) -> int:
    """Retrofit zone-map column stats onto a lake written before the
    stats feature: every snapshot/delta manifest lacking ``stats`` gets
    them computed from its (still present) data file and rewritten
    atomically — after which ``read_lake(filters=...)`` prunes on the old
    lake exactly as on a new one. Metadata-only upgrade; data files are
    untouched; manifests whose data file was GC'd are skipped (their
    commits are no longer readable anyway). Returns #manifests updated."""
    updated = 0
    for part in list_partitions(lake_dir):
        d = manifest_dir(lake_dir, part)
        for f in sorted(os.listdir(d)):
            if not (f.startswith("commit-") and f.endswith(".json")):
                continue
            mpath = os.path.join(d, f)
            with open(mpath) as fh:
                m = json.load(fh)
            if m.get("kind") == "empty" or m.get("stats") is not None:
                continue
            sf = m.get("state_file")
            if not sf:
                continue
            path = resolve_chain_file(lake_dir, sf)
            if not os.path.exists(path):
                continue  # GC'd chain file: commit unreadable regardless
            m["stats"] = _column_stats(pq.read_table(path))
            _write_manifest_atomic(m, mpath, d)
            updated += 1
    return updated


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
    """Remove state/delta files not needed to reconstruct the newest
    ``keep`` commits (the manifests — the lineage log — are kept forever).
    A file is needed iff it is on the reconstruction chain of a kept
    commit (its supporting snapshot and every delta after it)."""
    chain = lineage(lake_dir, part)
    kept = chain[-keep:] if keep else []
    needed: set[str] = set()
    for m in kept:
        needed.update(chain_files(lake_dir, part, m["lsn_hi"]))
    removed = []
    for m in chain:
        f = m.get("state_file")
        if not f or f in needed:
            continue
        p = os.path.join(lake_dir, f)
        if os.path.exists(p):
            os.unlink(p)
            removed.append(p)
    return removed


class ConcurrentWriterError(RuntimeError):
    """A second live writer tried to ingest into the same lake."""


def writer_lock(lake_dir: str):
    """Single-writer guard for the lake (the engine's commit protocol is
    exactly-once under retries of ONE logical writer; two concurrent
    writers planning micro-batches against the same high-water mark
    would double-apply — so the contract is made explicit).

    Implemented as ``fcntl.flock`` on a PERSISTENT lock file: the kernel
    owns liveness, releasing the lock automatically when the holder
    exits or crashes, so there is no stale-lock stealing (and therefore
    no steal TOCTOU race and no PID-reuse misclassification — two
    processes can never both hold it). The file itself is never
    unlinked (unlinking would let a later opener lock a fresh inode
    while an earlier opener still holds the old one); its pid/ts JSON
    payload is diagnostic only. Context manager:
    ``with writer_lock(lake): ...``."""
    import contextlib
    import fcntl
    import time

    path = os.path.join(lake_dir, "_writer.lock")

    @contextlib.contextmanager
    def _lock():
        os.makedirs(lake_dir, exist_ok=True)
        fd = os.open(path, os.O_CREAT | os.O_RDWR)
        try:
            try:
                fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
            except OSError:
                try:
                    holder = json.loads(os.read(fd, 4096).decode() or "{}")
                except Exception:
                    holder = {}
                raise ConcurrentWriterError(
                    f"lake {lake_dir} is locked by live writer "
                    f"pid {holder.get('pid', '?')}"
                )
            os.ftruncate(fd, 0)
            os.lseek(fd, 0, os.SEEK_SET)
            os.write(fd, json.dumps({"pid": os.getpid(), "ts": time.time()}).encode())
            try:
                yield
            finally:
                fcntl.flock(fd, fcntl.LOCK_UN)
        finally:
            os.close(fd)

    return _lock()
