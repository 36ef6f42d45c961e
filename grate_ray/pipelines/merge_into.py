"""Delta-style MERGE INTO for the transcript lake.

The CDC path (pipelines/ingest.py) is *op-driven*: the source already
says I/U/D per event. MERGE is the *condition-driven* counterpart every
lakehouse exposes (Delta/Iceberg `MERGE INTO`): the caller hands a keyed
source relation and the engine decides per key —

- key matched in the lake        → UPDATE (or DELETE when the source
  row's ``delete_col`` flag is set — "WHEN MATCHED AND cond THEN DELETE")
- key not matched                → INSERT (a flagged unmatched row is a
  no-op, matching Delta's matched-only delete clause)

Rather than a second write path, MERGE compiles to the engine's own
change-event contract: classified rows become BINLOG_SCHEMA events with
dense, globally unique LSNs just above the lake's committed high-water
mark, written as disjoint-LSN-range chunk files, and handed to the
ordinary exactly-once ``ingest`` — so MERGE inherits idempotent commits,
manifests, metrics, time travel and the changefeed for free (a merge is
visible in ``lake_changes`` like any other commit).

Scale shape: everything is O(|source| + |lake keys|), never O(lake
payload). Three keyed hops over the merge delta: (1) lake KEYS union
source co-located by conv_id hash for block-local classification, (2)
range-partitioned LSN assignment via the sampled-boundary + driver
prefix-offset pattern (shared with ``global_rank``/``shard_pack`` —
driver state is P integers), (3) the chunk write (one atomic file per
key range, disjoint LSN intervals by construction). The full lake
payload is never read: classification needs only (conv_id, turn_idx)
from the lake side.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data

from ..context import configure_shuffle, join_partitions
from ..schema import BINLOG_SCHEMA

_TS_NULL = np.int64(-(2**62))  # null ts sorts first (deterministic)


def _ts_i64(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    v = col.to_numpy(zero_copy_only=False)
    out = v.astype("datetime64[us]").view(np.int64).copy()
    out[np.isnat(v)] = _TS_NULL
    return out


def plan_merge_events(
    lake_dir: str,
    source: ray.data.Dataset,
    delete_col: str | None = None,
    num_parts: int | None = None,
) -> ray.data.Dataset:
    """Classify ``source`` rows against the CURRENT lake state and return
    the merge change events (BINLOG_SCHEMA minus lsn): op I/U/D with the
    source payload (D keeps ts — LWW ordering needs it — and nulls the
    rest). Duplicate source keys resolve deterministically to the max-ts
    row (ties: source block order)."""
    from .ingest import read_lake

    configure_shuffle(32)
    npart = join_partitions(num_parts or 32)

    payload = ["role", "text", "tool", "ts"]

    def tag_lake(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "conv_id": t["conv_id"],
                "turn_idx": pc.cast(t["turn_idx"], pa.int32()),
                "side": pa.array(np.zeros(n, dtype=np.int8)),
                "role": pa.nulls(n, pa.string()),
                "text": pa.nulls(n, pa.string()),
                "tool": pa.nulls(n, pa.string()),
                # the lake winner's ts rides along: matched U/D events are
                # emitted with ts = max(source ts, lake ts) so a merge
                # always wins the (ts, lsn) LWW reduction (its lsn is above
                # the high-water mark) — an older-ts source row must still
                # apply, per MERGE INTO semantics
                "ts": pc.cast(t["ts"], pa.timestamp("us")),
                "_del": pa.array(np.zeros(n, dtype=bool)),
            }
        )

    def tag_src(t: pa.Table) -> pa.Table:
        n = t.num_rows
        names = set(t.column_names)
        if delete_col is not None and delete_col in names:
            dl = pc.fill_null(pc.cast(t[delete_col], pa.bool_()), False)
        else:
            dl = pa.array(np.zeros(n, dtype=bool))
        cols = {
            "conv_id": t["conv_id"],
            "turn_idx": pc.cast(t["turn_idx"], pa.int32()),
            "side": pa.array(np.ones(n, dtype=np.int8)),
        }
        for c in payload:
            if c == "ts":
                cols[c] = (
                    pc.cast(t[c], pa.timestamp("us"))
                    if c in names
                    else pa.nulls(n, pa.timestamp("us"))
                )
            else:
                cols[c] = t[c] if c in names else pa.nulls(n, pa.string())
        cols["_del"] = dl
        return pa.table(cols)

    lake_keys = read_lake(
        lake_dir, columns=["conv_id", "turn_idx", "ts"]
    ).map_batches(tag_lake, batch_format="pyarrow")
    src = source.map_batches(tag_src, batch_format="pyarrow")

    def classify(t: pa.Table) -> pa.Table:
        empty = BINLOG_SCHEMA.empty_table().drop_columns(["lsn"])
        if t.num_rows == 0:
            return empty
        conv_codes, _ = pd.factorize(t["conv_id"].to_pandas())
        turn = t["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
        side = t["side"].to_numpy(zero_copy_only=False)
        ts = _ts_i64(t["ts"])
        # primary conv, then turn, then side (lake first), then ts:
        # the segment's LAST row is the winning source row (max ts)
        order = np.lexsort((ts, side, turn, conv_codes))
        cc, tt, ss = conv_codes[order], turn[order], side[order]
        change = np.empty(len(cc), dtype=bool)
        change[0] = True
        change[1:] = (cc[1:] != cc[:-1]) | (tt[1:] != tt[:-1])
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], len(cc))
        has0 = ss[starts] == 0
        has1 = ss[ends - 1] == 1
        last = order[ends - 1]
        dl = t["_del"].to_numpy(zero_copy_only=False)[last]
        # matched+flag → D; matched → U; unmatched (no flag) → I
        emit = has1 & (has0 | ~dl)
        if not emit.any():
            return empty
        op = np.where(dl, "D", np.where(has0, "U", "I"))[emit]
        take = pa.array(last[emit])
        picked = t.take(take)
        is_d = pa.array(op == "D")
        # ts = max(source ts, lake winner ts): the merge event's lsn is
        # strictly above the committed high-water mark, so an equal ts
        # still wins the (ts, lsn) order — older-ts source UPDATEs apply
        # instead of silently losing LWW, and a null source ts inherits
        # the lake ts (deterministic) rather than riding lww_reduce's
        # nulls-sort-last accident. Unmatched INSERTs keep the source ts.
        ts_sorted = ts[order]
        lake_ts = np.where(has0, ts_sorted[starts], _TS_NULL)
        new_ts = np.maximum(ts[last], lake_ts)[emit]
        ts_vals = new_ts.astype("datetime64[us]")
        ts_vals[new_ts == _TS_NULL] = np.datetime64("NaT")
        out = {
            "op": pa.array(op.astype(object), pa.string()),
            "conv_id": picked["conv_id"],
            "turn_idx": picked["turn_idx"],
        }
        for c in ["role", "text", "tool"]:
            out[c] = pc.if_else(is_d, pa.nulls(len(op), pa.string()), picked[c])
        out["ts"] = pa.array(ts_vals)  # D keeps ts: tombstones must win LWW
        return pa.table(out, schema=empty.schema)

    return (
        lake_keys.union(src)
        .repartition(npart, keys=["conv_id"])
        .map_batches(classify, batch_format="pyarrow", batch_size=None)
    )


def merge_into(
    lake_dir: str,
    source: ray.data.Dataset,
    delete_col: str | None = None,
    scratch_dir: str | None = None,
    num_parts: int | None = None,
    source_binlog: str | None = None,
) -> pa.Table:
    """MERGE ``source`` into the lake (see module docstring); returns the
    ingest metrics table of the resulting commit(s). The merge delta is
    staged as ordinary binlog chunk files in ``scratch_dir`` (fresh temp
    dir by default) with dense LSNs starting one past the lake's LSN
    frontier, then applied by the exactly-once ``ingest`` — re-merging
    the identical source is a state no-op (every re-classified event
    re-applies the same payload).

    LSN namespace: the frontier is max(committed high-water mark,
    highest PLANNED micro-batch window) — so merging into a lake whose
    persisted batch plan has uncommitted windows cannot reuse their
    LSNs. A binlog with a pending, never-planned backlog is invisible to
    the lake; pass ``source_binlog`` (the lake's binlog dir) and the
    frontier also clears every chunk LSN present there, keeping the
    strict (ts, lsn) total order when a later ``ingest`` drains the
    backlog. Without it, merge_into requires the lake's binlog to be
    fully planned/drained."""
    import uuid

    from ray.data.aggregate import Count

    from ..state.manifest import (
        committed_lsn,
        lake_num_partitions,
        list_partitions,
        read_batch_plan,
    )
    from .ingest import _chunk_lsn_ranges, ingest

    events = plan_merge_events(lake_dir, source, delete_col, num_parts)

    hws = [committed_lsn(lake_dir, p) for p in list_partitions(lake_dir)]
    frontier = max([h for h in hws if h is not None], default=-1)
    for _, hi in read_batch_plan(lake_dir):
        frontier = max(frontier, hi)
    if source_binlog is not None:
        from .cdc import list_binlog_files

        for _, _, hi in _chunk_lsn_ranges(list_binlog_files(source_binlog)):
            frontier = max(frontier, hi)
    lsn0 = frontier + 1

    if scratch_dir is None:
        scratch_dir = os.path.join(
            tempfile.gettempdir(), f"merge_delta_{uuid.uuid4().hex[:8]}"
        )
    os.makedirs(scratch_dir, exist_ok=True)

    # --- LSN assignment: sampled conv ranges → driver prefix offsets ---
    npart = join_partitions(num_parts or 32)

    def block_sample(t: pa.Table) -> pa.Table:
        conv = np.sort(t["conv_id"].to_numpy(zero_copy_only=False))
        if len(conv) > 8:
            pick = np.linspace(0, len(conv) - 1, 8).astype(np.int64)
            conv = conv[pick]
        return pa.table({"conv_id": pa.array(conv.astype(object), pa.string())})

    ev = events.materialize()  # branched: sample pass + tagged pass
    if ev.count() == 0:
        # nothing to merge: no chunks staged; ingest returns empty metrics
        return ingest(
            scratch_dir, lake_dir,
            num_partitions=lake_num_partitions(lake_dir) or 32,
            files_per_microbatch=None,
        )
    sampled = np.sort(
        ev.select_columns(["conv_id"])
        .map_batches(block_sample, batch_format="pyarrow")
        .to_pandas()["conv_id"]
        .to_numpy(dtype=object)
    )
    if len(sampled) == 0:
        boundaries = np.array([], dtype=object)
    else:
        idx = np.unique(
            (np.linspace(0, 1, npart + 1)[1:-1] * (len(sampled) - 1))
            .round()
            .astype(np.int64)
        )
        boundaries = np.unique(sampled[idx])

    def tag(t: pa.Table) -> pa.Table:
        conv = t["conv_id"].to_numpy(zero_copy_only=False)
        part = np.searchsorted(boundaries, conv, side="right").astype(np.int64)
        return t.append_column("part", pa.array(part))

    tagged = ev.map_batches(tag, batch_format="pyarrow")
    counts = (
        tagged.groupby("part")
        .aggregate(Count(alias_name="n"))
        .to_pandas()
        .sort_values("part")
    )
    if len(counts) == 0:
        return ingest(
            scratch_dir, lake_dir,
            num_partitions=lake_num_partitions(lake_dir) or 32,
            files_per_microbatch=None,
        )
    excl = counts["n"].cumsum() - counts["n"]
    offsets = {int(p): int(o) for p, o in zip(counts["part"], excl)}

    def write_chunks(t: pa.Table) -> pa.Table:
        summary = pa.schema(
            [pa.field("lsn_lo", pa.int64()), pa.field("n_events", pa.int64())]
        )
        if t.num_rows == 0:
            return summary.empty_table()
        order = pc.sort_indices(
            t,
            sort_keys=[
                ("part", "ascending"),
                ("conv_id", "ascending"),
                ("turn_idx", "ascending"),
            ],
        )
        t = t.take(order)
        part = t["part"].to_numpy(zero_copy_only=False)
        change = np.empty(len(part), dtype=bool)
        change[0] = True
        change[1:] = part[1:] != part[:-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], len(part))
        los, ns = [], []
        for s, e in zip(starts, ends):  # one chunk file per key range
            seg = t.slice(s, e - s)
            lo = lsn0 + offsets[int(part[s])]
            lsn = pa.array(np.arange(lo, lo + seg.num_rows, dtype=np.int64))
            seg = seg.drop_columns(["part"]).add_column(1, "lsn", lsn)
            path = os.path.join(scratch_dir, f"chunk-{lo:012d}.parquet")
            fd, tmp = tempfile.mkstemp(dir=scratch_dir, suffix=".tmp")
            os.close(fd)
            try:
                pq.write_table(seg.select(BINLOG_SCHEMA.names), tmp)
                os.replace(tmp, path)
            finally:
                if os.path.exists(tmp):
                    os.unlink(tmp)
            los.append(lo)
            ns.append(seg.num_rows)
        return pa.table(
            {"lsn_lo": pa.array(los, pa.int64()), "n_events": pa.array(ns, pa.int64())},
            schema=summary,
        )

    tagged.repartition(npart, keys=["part"]).map_batches(
        write_chunks, batch_format="pyarrow", batch_size=None
    ).materialize()  # barrier: all chunks on disk before ingest plans

    return ingest(
        scratch_dir, lake_dir,
        num_partitions=lake_num_partitions(lake_dir) or 32,
        files_per_microbatch=None,
    )


def expire_rows(
    lake_dir: str,
    before_ts,
    scratch_dir: str | None = None,
    source_binlog: str | None = None,
) -> pa.Table:
    """Retention / TTL delete: tombstone every live row with
    ``ts < before_ts``, compiled onto the ordinary MERGE path (flagged
    matched deletes) — so expiry is a commit like any other:
    changefeed-visible, time-travel-able, exactly-once, idempotent
    (re-running after the rows are gone finds no matches and commits
    nothing new). The candidate read is ``read_lake(filters=...)``, so
    zone-map pruning skips partitions whose commits prove no row is old
    enough — expiry on a mostly-fresh lake touches only stale
    partitions."""
    import pandas as pd

    from .ingest import read_lake

    cutoff = pd.Timestamp(before_ts)

    old = read_lake(
        lake_dir,
        columns=["conv_id", "turn_idx", "ts"],
        filters=[("ts", "<", cutoff.to_pydatetime())],
    )

    def flag(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_del", pa.array(np.ones(t.num_rows, dtype=bool))
        )

    return merge_into(
        lake_dir, old.map_batches(flag, batch_format="pyarrow"),
        delete_col="_del", scratch_dir=scratch_dir,
        source_binlog=source_binlog,
    )
