"""Copy-on-write lake branches (git-for-data, lakeFS/Iceberg-branch style).

``branch_lake`` forks a lake at a commit point WITHOUT copying data:
only the (tiny) per-partition commit manifests, the lake config, the
micro-batch plan prefix and the column-mapping sidecar are copied; the
branch's chain files resolve through a ``parent`` pointer in its config
(``state/manifest.resolve_chain_file``) until the branch diverges.
Ingest / merge_into / compaction against the branch write NEW files into
the branch dir — the parent is never touched (branch GC unlinks local
files only; inherited files are not local). Tags are per-branch and
start empty.

This is the isolation primitive the lakehouse workflows want: test a
risky backfill or schema change on a branch against production data,
diff it, then throw the branch away — all O(metadata) except what the
branch itself commits.

Retention caveat: a branch references parent chain files as of branch
time; parent GC/compaction with a small ``keep`` can remove files an
old branch still needs (same contract as time travel — raise ``keep``
on the parent while branches are alive). ``read_state`` raises the
standard GC error if it happens.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..state.manifest import (
    batch_plan_path,
    column_mapping_path,
    lake_config_path,
    lake_num_partitions,
    lake_parent,
    list_partitions,
    manifest_dir,
    read_batch_plan,
    read_state,
    resolve_tag,
)


def branch_lake(
    parent_dir: str,
    branch_dir: str,
    at_lsn: int | None = None,
    at_tag: str | None = None,
) -> dict:
    """Create a copy-on-write branch of ``parent_dir`` at a commit point
    (head when neither ``at_lsn`` nor ``at_tag`` is given; commit-granular
    resolution exactly like ``read_lake(asof_lsn=...)``). Returns
    {"partitions": n, "at_lsn": resolved-or-None}."""
    if at_tag is not None:
        if at_lsn is not None:
            raise ValueError("pass at_lsn or at_tag, not both")
        at_lsn = resolve_tag(parent_dir, at_tag)
    nparts = lake_num_partitions(parent_dir)
    if nparts is None:
        raise FileNotFoundError(f"{parent_dir} is not a lake (no _lake.json)")
    if os.path.exists(lake_config_path(branch_dir)):
        raise FileExistsError(f"{branch_dir} is already a lake")

    os.makedirs(branch_dir, exist_ok=True)

    # 1. per-partition manifests at-or-below the branch point (lineage
    #    prefix — data files stay with the parent)
    n_copied = 0
    for p in list_partitions(parent_dir):
        src = manifest_dir(parent_dir, p)
        dst = manifest_dir(branch_dir, p)
        for f in sorted(os.listdir(src)):
            if not (f.startswith("commit-") and f.endswith(".json")):
                continue
            lsn = int(f[len("commit-") : -len(".json")])
            if at_lsn is not None and lsn > at_lsn:
                continue
            os.makedirs(dst, exist_ok=True)
            shutil.copy2(os.path.join(src, f), os.path.join(dst, f))
            n_copied += 1

    # 2. micro-batch plan prefix (windows at-or-below the branch point:
    #    the branch's own future ingest appends fresh windows)
    plan = [
        [lo, hi]
        for lo, hi in read_batch_plan(parent_dir)
        if at_lsn is None or hi <= at_lsn
    ]
    if plan:
        fd, tmp = tempfile.mkstemp(dir=branch_dir, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump({"batches": plan}, f)
        os.replace(tmp, batch_plan_path(branch_dir))

    # 3. column-mapping sidecar (logical schema travels with the branch)
    if os.path.exists(column_mapping_path(parent_dir)):
        shutil.copy2(
            column_mapping_path(parent_dir), column_mapping_path(branch_dir)
        )

    # 4. config with the parent pointer — written last: a branch is
    #    usable iff its config exists
    fd, tmp = tempfile.mkstemp(dir=branch_dir, suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(
            {
                "num_partitions": nparts,
                "parent": os.path.abspath(parent_dir),
                "branched_at": at_lsn,
            },
            f,
        )
    os.replace(tmp, lake_config_path(branch_dir))
    return {"partitions": len(list_partitions(branch_dir)), "at_lsn": at_lsn,
            "manifests": n_copied}


def diff_branches(base_dir: str, branch_dir: str) -> ray.data.Dataset:
    """Net row differences of ``branch_dir``'s head state vs
    ``base_dir``'s head state, tagged ``change_op`` relative to the
    branch (I: key live only in the branch; U: live in both with a
    different winning event; D: live in base, deleted/absent in the
    branch — row carries the base winner's envelope).

    Both lakes must share the partition count (a branch always does) so
    each partition pair diffs CO-LOCATED in one task — one vectorized
    key join per partition, no shuffle, exactly the ``lake_changes``
    shape across two lineages instead of two commit points."""
    from ..context import configure_shuffle as _cfg
    _cfg(32)  # BEFORE dataset creation: plans freeze the DataContext
    if lake_num_partitions(base_dir) != lake_num_partitions(branch_dir):
        raise ValueError("diff_branches requires the same partition count")
    parts = sorted(
        set(list_partitions(base_dir)) | set(list_partitions(branch_dir))
    )
    cols_spec = {
        "change_op": pa.string(),
        "conv_id": pa.string(),
        "turn_idx": pa.int32(),
        "role": pa.string(),
        "text": pa.string(),
        "tool": pa.string(),
        "ts": pa.timestamp("us"),
        "lsn": pa.int64(),
    }
    empty = pa.table({k: pa.array([], v) for k, v in cols_spec.items()})
    if not parts:
        return ray.data.from_arrow(empty)

    payload = ("role", "text", "tool", "ts")

    def norm(t: pa.Table | None, side: str) -> pa.Table | None:
        if t is None or t.num_rows == 0:
            return None
        cols = {
            "conv_id": t["conv_id"].cast(pa.string()),
            "turn_idx": t["turn_idx"].cast(pa.int32()),
            f"{side}_lsn": t["lsn"].cast(pa.int64()),
            f"{side}_op": t["op"].cast(pa.string()),
        }
        for name in payload:
            cols[f"{side}_{name}"] = (
                t[name].cast(cols_spec[name])
                if name in t.column_names
                else pa.nulls(t.num_rows, cols_spec[name])
            )
        return pa.table(cols)

    def diff(t: pa.Table) -> pa.Table:
        out = []
        for p in t["part"].to_pylist():
            a = norm(read_state(base_dir, int(p)), "a")
            b = norm(read_state(branch_dir, int(p)), "b")
            if a is None and b is None:
                continue
            def with_null_side(j: pa.Table, side: str) -> pa.Table:
                j = j.append_column(
                    f"{side}_lsn", pa.nulls(j.num_rows, pa.int64())
                ).append_column(f"{side}_op", pa.nulls(j.num_rows, pa.string()))
                for n in payload:
                    j = j.append_column(
                        f"{side}_{n}", pa.nulls(j.num_rows, cols_spec[n])
                    )
                return j

            if a is None:
                j = with_null_side(b, "a")
            elif b is None:
                j = with_null_side(a, "b")
            else:
                j = b.join(a, keys=["conv_id", "turn_idx"], join_type="full outer")
            a_live = pc.fill_null(
                pc.and_kleene(
                    pc.is_valid(j["a_lsn"]), pc.not_equal(j["a_op"], "D")
                ),
                False,
            )
            b_live = pc.fill_null(
                pc.and_kleene(
                    pc.is_valid(j["b_lsn"]), pc.not_equal(j["b_op"], "D")
                ),
                False,
            )
            changed = pc.fill_null(pc.not_equal(j["a_lsn"], j["b_lsn"]), True)
            emit = pc.and_(changed, pc.or_(a_live, b_live))
            j = j.filter(emit)
            if j.num_rows == 0:
                continue
            a_live = pc.fill_null(
                pc.and_kleene(
                    pc.is_valid(j["a_lsn"]), pc.not_equal(j["a_op"], "D")
                ),
                False,
            )
            b_live = pc.fill_null(
                pc.and_kleene(
                    pc.is_valid(j["b_lsn"]), pc.not_equal(j["b_op"], "D")
                ),
                False,
            )
            change_op = pc.if_else(
                pc.invert(b_live),
                pa.scalar("D"),
                pc.if_else(a_live, pa.scalar("U"), pa.scalar("I")),
            )
            side = pc.if_else(b_live, pa.scalar("b"), pa.scalar("a"))
            cols = {"change_op": change_op, "conv_id": j["conv_id"],
                    "turn_idx": j["turn_idx"]}
            for name in payload:
                av, bv = j[f"a_{name}"], j[f"b_{name}"]
                if isinstance(av, pa.ChunkedArray):
                    av = av.combine_chunks()
                if isinstance(bv, pa.ChunkedArray):
                    bv = bv.combine_chunks()
                cols[name] = pc.if_else(pc.equal(side, "b"), bv, av)
            cols["lsn"] = pc.if_else(
                pc.equal(side, "b"), j["b_lsn"], j["a_lsn"]
            )
            ch = pa.table(cols).cast(empty.schema)
            idx = pc.sort_indices(
                ch,
                sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")],
            )
            out.append(ch.take(idx))
        if not out:
            return empty
        return pa.concat_tables(out, promote_options="default")

    ds = ray.data.from_items([{"part": p} for p in parts]).repartition(len(parts))
    return ds.map_batches(diff, batch_format="pyarrow")


def fast_forward_branch(parent_dir: str, branch_dir: str) -> dict:
    """PROMOTE a branch: adopt everything the branch committed into its
    parent — the "test the risky backfill on a branch, then fast-forward
    production" workflow. Legal only when the parent has not advanced
    since the fork (every parent commit manifest still exists verbatim in
    the branch lineage — the git fast-forward condition); otherwise
    raises, because promoting over a diverged parent would silently drop
    its commits.

    Mechanics are O(what the branch did): branch-local manifests and
    branch-local data files are copied into the parent (inherited files
    already live there), and the micro-batch plan / column mapping are
    replaced by the branch's (supersets of the parent's, append-only).
    Returns {"manifests": n, "files": k}."""
    par = lake_parent(branch_dir)
    if par != os.path.abspath(parent_dir):
        raise ValueError(
            f"{branch_dir} is not a branch of {parent_dir} (parent={par})"
        )

    # fast-forward condition: parent lineage ⊆ branch lineage, verbatim
    for p in list_partitions(parent_dir):
        src = manifest_dir(parent_dir, p)
        dst = manifest_dir(branch_dir, p)
        for f in os.listdir(src):
            if not (f.startswith("commit-") and f.endswith(".json")):
                continue
            bf = os.path.join(dst, f)
            if not os.path.exists(bf):
                raise ValueError(
                    f"parent advanced since fork (partition {p} commit {f} "
                    "unknown to the branch) — fast-forward refused"
                )

    n_man = n_files = 0
    for p in list_partitions(branch_dir):
        # branch-local data files first: a manifest must never become
        # visible in the parent before the file it references
        bpart = os.path.join(branch_dir, f"part={p}")
        ppart = os.path.join(parent_dir, f"part={p}")
        if os.path.isdir(bpart):
            os.makedirs(ppart, exist_ok=True)
            for f in sorted(os.listdir(bpart)):
                if not f.endswith(".parquet"):
                    continue
                dst = os.path.join(ppart, f)
                if not os.path.exists(dst):
                    tmp = dst + ".ff.tmp"
                    shutil.copy2(os.path.join(bpart, f), tmp)
                    os.replace(tmp, dst)
                    n_files += 1
        bman = manifest_dir(branch_dir, p)
        pman = manifest_dir(parent_dir, p)
        os.makedirs(pman, exist_ok=True)
        for f in sorted(os.listdir(bman)):
            if not (f.startswith("commit-") and f.endswith(".json")):
                continue
            dst = os.path.join(pman, f)
            if not os.path.exists(dst):
                tmp = dst + ".ff.tmp"
                shutil.copy2(os.path.join(bman, f), tmp)
                os.replace(tmp, dst)
                n_man += 1

    if os.path.exists(batch_plan_path(branch_dir)):
        shutil.copy2(batch_plan_path(branch_dir), batch_plan_path(parent_dir))
    if os.path.exists(column_mapping_path(branch_dir)):
        shutil.copy2(
            column_mapping_path(branch_dir), column_mapping_path(parent_dir)
        )
    return {"manifests": n_man, "files": n_files}
