"""The flagship pipeline: binlog replay → lake final state, Ray-Data-first.

Shape (SURVEY.md §3.4):

    read_parquet(binlog chunks, schema-grouped)
      → map_batches(reconcile, pyarrow)     # schema evolution, stateless
      → map_batches(lww_reduce, pyarrow)    # partial LWW combine, no shuffle
      → map_batches(add partition column)
      → groupby(part).map_groups(final LWW reduce + finalize)   # THE shuffle
      [salted variant: groupby(spart) partial → groupby(part) final]

The partial reduce before the shuffle is the load-bearing scale decision:
update-heavy streams collapse to ≤1 row per key per block before any data
moves, so the all-to-all exchange ships keys, not history. This mirrors how
the reference replays its record log straight into a keyed grid rather than
keeping the log around (/root/reference/xls/sheets.go:104-437).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from ..schema import BINLOG_SCHEMA
from ..stages.evolve import make_reconciler, rename_schema, unify
from ..stages.merge import finalize, lww_reduce
from ..stages.partition import (
    add_partition_column,
    add_salted_partition_column,
    spart_to_part,
)


def list_binlog_files(path: str) -> list[str]:
    if os.path.isfile(path):
        return [path]
    return sorted(
        os.path.join(path, p) for p in os.listdir(path) if p.endswith(".parquet")
    )


def _read_blocks_for(files: list[str]) -> int | None:
    """Read-task parallelism: Ray's auto heuristic coalesces few-file
    inputs into ~1 task per 4 files, which caps every fused downstream map
    stage at that width (measured: read+reconcile identical at 8 and 32
    CPUs). Override to ~4 tasks per CPU so map stages scale."""
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    except Exception:
        cpus = 8
    return max(len(files), cpus * 4)


def schema_groups(
    path: str, renames: dict[str, str] | None = None
) -> tuple[list[tuple[pa.Schema, list[str]]], pa.Schema]:
    """Group binlog chunk files by physical schema; return groups + the
    unified (widened) target schema. ``renames`` (legacy physical name →
    canonical) is applied to each observed schema before unification so a
    renamed column lands in its canonical field instead of forking the
    target."""
    from ..stages.evolve import PROTECTED_COLS

    if renames and PROTECTED_COLS & (set(renames) | set(renames.values())):
        raise ValueError(
            f"cannot rename key/envelope columns: {sorted(PROTECTED_COLS)}"
        )
    files = list_binlog_files(path)
    if not files:
        raise FileNotFoundError(f"no parquet chunks under {path}")
    by_schema: dict[str, tuple[pa.Schema, list[str]]] = {}
    for f in files:
        s = pq.read_schema(f)
        by_schema.setdefault(s.to_string(), (s, []))[1].append(f)
    groups = list(by_schema.values())
    target = unify(
        [rename_schema(s, renames) for s, _ in groups] + [BINLOG_SCHEMA]
    )
    return groups, target


def read_binlog(
    path: str,
    target_schema: pa.Schema | None = None,
    prep=None,
    batch_size: int | None = None,
    num_cpus: float | None = None,
    renames: dict[str, str] | None = None,
) -> ray.data.Dataset:
    """Read a binlog directory that may mix physical schemas (epochs).

    Files are grouped by physical schema; each group's batches are
    reconciled to the unified target inside ONE ``map_batches`` (stateless,
    no shuffle); groups are unioned. ``prep`` (optional) is fused into the
    same operator — reconcile + partial-reduce + partition in a single
    object-store pass (measured: a separate reconcile operator costs a full
    extra pass of the log through plasma).
    """
    groups, target = schema_groups(path, renames=renames)
    if target_schema is not None:
        target = target_schema
    parts = []
    for s, group in groups:
        ds = ray.data.read_parquet(
            group, override_num_blocks=_read_blocks_for(group)
        )
        rec = None if s.equals(target) else make_reconciler(target, renames)
        if rec is not None or prep is not None:
            def fn(t, rec=rec):
                if rec is not None:
                    t = rec(t)
                return prep(t) if prep is not None else t

            kw = {}
            if batch_size is not None:
                kw["batch_size"] = batch_size
            if num_cpus is not None:
                kw["num_cpus"] = num_cpus
            ds = ds.map_batches(fn, batch_format="pyarrow", **kw)
        parts.append(ds)
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def apply_binlog(
    ds: ray.data.Dataset,
    num_partitions: int = 32,
    hot_keys: frozenset[str] | None = None,
    num_salts: int = 8,
) -> ray.data.Dataset:
    """Reduce a binlog Dataset to the lake final state (a lake-schema
    Dataset, key-sorted within partition). The only shuffle is the
    groupby on the partition column."""
    from ..context import REDUCE_BATCH_SIZE, configure_shuffle

    configure_shuffle(num_partitions)
    ds = ds.map_batches(
        lww_reduce, batch_format="pyarrow", batch_size=REDUCE_BATCH_SIZE
    )

    if hot_keys:
        # two-phase salted merge: partial reduce per (part, salt) sub-shard,
        # then final reduce per part — exact by LWW associativity.
        def add_spart(t: pa.Table) -> pa.Table:
            return add_salted_partition_column(
                t, num_partitions, num_salts, hot_keys
            )

        ds = ds.map_batches(add_spart, batch_format="pyarrow")
        ds = ds.groupby("spart").map_groups(
            lambda t: lww_reduce(t), batch_format="pyarrow"
        )
        ds = ds.map_batches(
            lambda t: spart_to_part(t, num_salts), batch_format="pyarrow"
        )
        # coalesce between the two shuffles: map_groups can emit schema-less
        # empty blocks for empty hash partitions, and Ray's hash-shuffle
        # schema broadcast poisons downstream aggregators if such a block is
        # shuffled first; repartition rebuilds blocks and drops empties
        ds = ds.repartition(max(2, num_partitions // 4))
    else:
        ds = ds.map_batches(
            lambda t: add_partition_column(t, num_partitions),
            batch_format="pyarrow",
        )

    def final_group(t: pa.Table) -> pa.Table:
        return finalize(lww_reduce(t))

    return ds.groupby("part").map_groups(final_group, batch_format="pyarrow")


def merge_source_streams(streams: list[ray.data.Dataset]) -> ray.data.Dataset:
    """MULTI-SOURCE CDC merge: combine K independent change streams (each
    with its own strictly-increasing ``lsn`` sequence) into one stream
    under a deterministic total order. The global sequence number is the
    interleave ``lsn' = lsn * K + source_idx`` — it preserves each
    source's internal order, never collides across sources, and keeps the
    LWW tiebreak ``(ts, lsn')`` a strict total order. A ``source_id``
    column is carried for lineage (``finalize`` strips it from the lake
    view; it survives in persisted partition state).

    Stateless per-batch arithmetic fused into each source's read — no
    extra shuffle; the apply's keyed exchange is unchanged. At 100 TB the
    K source tails stream independently and union'd blocks interleave in
    the object store without coordination."""
    import numpy as np
    import pyarrow.compute as pc

    k = len(streams)
    if k == 0:
        raise ValueError("no source streams")
    tagged = []
    for i, ds in enumerate(streams):

        def tag(t: pa.Table, i=i) -> pa.Table:
            glsn = pc.add(
                pc.multiply(t["lsn"], pa.scalar(k, pa.int64())),
                pa.scalar(i, pa.int64()),
            )
            t = t.set_column(t.column_names.index("lsn"), "lsn", glsn)
            return t.append_column(
                "source_id", pa.array(np.full(t.num_rows, i, dtype=np.int32))
            )

        tagged.append(ds.map_batches(tag, batch_format="pyarrow"))
    out = tagged[0]
    for d in tagged[1:]:
        out = out.union(d)
    return out


def replay(
    binlog_path: str,
    num_partitions: int = 32,
    hot_keys: frozenset[str] | None = None,
    num_salts: int = 8,
    renames: dict[str, str] | None = None,
) -> ray.data.Dataset:
    """Fused fast path: ONE map operator does reconcile + partial LWW
    reduce + partition tagging (single object-store pass of the log), then
    the one hash shuffle merges per partition."""
    from ..context import REDUCE_BATCH_SIZE, configure_shuffle

    configure_shuffle(num_partitions)

    def final_group(t: pa.Table) -> pa.Table:
        return finalize(lww_reduce(t))

    if hot_keys:
        def prep_salted(t: pa.Table) -> pa.Table:
            return add_salted_partition_column(
                lww_reduce(t), num_partitions, num_salts, hot_keys
            )

        ds = read_binlog(
            binlog_path, prep=prep_salted, batch_size=REDUCE_BATCH_SIZE,
            num_cpus=1, renames=renames,
        )
        ds = ds.groupby("spart").map_groups(
            lambda t: lww_reduce(t), batch_format="pyarrow"
        )
        ds = ds.map_batches(
            lambda t: spart_to_part(t, num_salts), batch_format="pyarrow"
        ).repartition(max(2, num_partitions // 4))
        return ds.groupby("part").map_groups(final_group, batch_format="pyarrow")

    def prep(t: pa.Table) -> pa.Table:
        return add_partition_column(lww_reduce(t), num_partitions)

    ds = read_binlog(
        binlog_path, prep=prep, batch_size=REDUCE_BATCH_SIZE, num_cpus=1,
        renames=renames,
    )
    return ds.groupby("part").map_groups(final_group, batch_format="pyarrow")


def scd2_history(
    events: ray.data.Dataset, num_partitions: int = 32
) -> ray.data.Dataset:
    """Slowly-Changing-Dimension TYPE-2 version history from the change
    stream — the other classic CDC materialization (the lake keeps ONLY
    the LWW winner; SCD2 keeps EVERY version with its validity interval):
    each I/U event opens a row version valid from its lsn until the key's
    next event in LWW order (ts, lsn); a D event closes the previous
    version without opening one. Emits one row per version with
    ``valid_to_lsn`` (null = still open) and ``is_current`` (1 for the
    open version of a live key, 0 otherwise — a deleted key has no
    current version).

    Shape: ONE keyed repartition on conv_id, then a block-local lexsort +
    shifted-neighbor comparison vectorized ACROSS keys — no per-key
    Python, no window shuffle; the history never concentrates beyond the
    key-hash spread."""
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    from ..context import configure_shuffle, join_partitions

    configure_shuffle(num_partitions)

    def versions(t: pa.Table) -> pa.Table:
        schema = pa.schema(
            [
                pa.field("conv_id", pa.string()),
                pa.field("turn_idx", pa.int32()),
                pa.field("role", pa.string()),
                pa.field("text", pa.string()),
                pa.field("tool", pa.string()),
                pa.field("ts", pa.timestamp("us")),
                pa.field("lsn", pa.int64()),
                pa.field("valid_to_lsn", pa.int64()),
                pa.field("is_current", pa.int64()),
            ]
        )
        if t.num_rows == 0:
            return schema.empty_table()
        cc, _ = pd.factorize(t["conv_id"].to_pandas())
        tt = t["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
        lsn = t["lsn"].to_numpy(zero_copy_only=False).astype(np.int64)
        tsv = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        tsi = tsv.view(np.int64)
        order = np.lexsort((lsn, tsi, tt, cc))
        cs, ts_, ls = cc[order], tt[order], lsn[order]
        nxt_same = np.zeros(len(cs), dtype=bool)
        nxt_same[:-1] = (cs[1:] == cs[:-1]) & (ts_[1:] == ts_[:-1])
        valid_to = np.empty(len(ls), dtype=np.int64)
        valid_to[:-1] = ls[1:]
        valid_to[-1] = 0
        sorted_t = t.take(pa.array(order))
        op = sorted_t["op"].to_numpy(zero_copy_only=False)
        emit = op != "D"
        out = sorted_t.filter(pa.array(emit)).drop_columns(["op"])
        # null out open intervals (no next event for the key)
        vt = pc.if_else(
            pa.array(nxt_same[emit]),
            pa.array(valid_to[emit], pa.int64()),
            pa.nulls(int(emit.sum()), pa.int64()),
        )
        cur = pa.array((~nxt_same[emit]).astype(np.int64))
        out = out.append_column("valid_to_lsn", vt).append_column("is_current", cur)
        return out.select(schema.names).cast(schema)

    return events.repartition(
        join_partitions(num_partitions), keys=["conv_id"]
    ).map_batches(versions, batch_format="pyarrow", batch_size=None)


def superseded_counts(ds: ray.data.Dataset, num_partitions: int = 16) -> ray.data.Dataset:
    """Replay-quality metric: how many binlog events LOST the
    (ts, lsn) LWW reduction, grouped by the losing event's op — the
    update-churn / late-arrival signal a CDC operator watches. Reuses
    the counted LWW reducer (the shuffle ships one winner row per key
    carrying exact per-op raw counts), so superseded_o is just
    Σ cnt_o − #(winner op = o) — no second pass over the log."""
    import numpy as np

    from ..context import REDUCE_BATCH_SIZE, configure_shuffle, join_partitions
    from ..stages.merge import lww_reduce_counted

    configure_shuffle(num_partitions)

    out_schema = pa.schema(
        [pa.field("op", pa.string()), pa.field("superseded", pa.int64())]
    )

    def per_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        t = lww_reduce_counted(t)  # per-key exact merge (keys co-located)
        op = t["op"].to_numpy(zero_copy_only=False)
        sup = {}
        for col, o in (("cnt_i", "I"), ("cnt_u", "U"), ("cnt_d", "D")):
            total = int(t[col].to_numpy(zero_copy_only=False).astype(np.int64).sum())
            winners = int((op == o).sum())
            sup[o] = total - winners
        return pa.table(
            {
                "op": pa.array(list(sup.keys()), pa.string()),
                "superseded": pa.array(list(sup.values()), pa.int64()),
            },
            schema=out_schema,
        )

    def final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        df = t.to_pandas()
        g = df.groupby("op", as_index=False)["superseded"].sum()
        g = g[g["superseded"] > 0]
        return pa.table(
            {
                "op": pa.array(g["op"], pa.string()),
                "superseded": pa.array(g["superseded"].to_numpy("int64")),
            },
            schema=out_schema,
        )

    return (
        ds.map_batches(
            lww_reduce_counted, batch_format="pyarrow", batch_size=REDUCE_BATCH_SIZE
        )
        .repartition(join_partitions(num_partitions), keys=["conv_id", "turn_idx"])
        .map_batches(per_block, batch_format="pyarrow", batch_size=None)
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def fill_forward_tool(state: ray.data.Dataset, num_partitions: int = 16) -> ray.data.Dataset:
    """Forward-fill the nullable ``tool`` column down each conversation
    (turn order) over the LWW final state — the gap-fill window shape
    (last_value IGNORE NULLS). ONE conv-keyed hop, then a pandas
    grouped ffill vectorized across every conversation in the block."""
    from ..context import configure_shuffle, join_partitions

    configure_shuffle(num_partitions)

    out_schema = pa.schema(
        [
            pa.field("conv_id", pa.string()),
            pa.field("turn_idx", pa.int32()),
            pa.field("tool_filled", pa.string()),
        ]
    )

    def per_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        df = t.select(["conv_id", "turn_idx", "tool"]).to_pandas()
        df = df.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        df["tool_filled"] = df.groupby("conv_id", sort=False)["tool"].ffill()
        import numpy as np

        return pa.table(
            {
                "conv_id": pa.array(df["conv_id"], pa.string()),
                "turn_idx": pa.array(df["turn_idx"].to_numpy(np.int32)),
                "tool_filled": pa.array(
                    df["tool_filled"].where(df["tool_filled"].notna(), None),
                    pa.string(),
                ),
            },
            schema=out_schema,
        )

    return state.repartition(
        join_partitions(num_partitions), keys=["conv_id"]
    ).map_batches(per_block, batch_format="pyarrow", batch_size=None)


def conv_role_path(state: ray.data.Dataset, num_partitions: int = 16) -> ray.data.Dataset:
    """Per-conversation ordered role path (roles joined with '>') over
    the LWW final state — the ordered string_agg shape. One conv-keyed
    hop co-locates each conversation; the join runs grouped in the
    block (pandas C-level groupby-agg, conversations are bounded by
    max_turns so no group outgrows a block)."""
    from ..context import configure_shuffle, join_partitions

    configure_shuffle(num_partitions)

    out_schema = pa.schema(
        [pa.field("conv_id", pa.string()), pa.field("role_path", pa.string())]
    )

    def per_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        df = t.select(["conv_id", "turn_idx", "role"]).to_pandas()
        df = df.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        g = df.groupby("conv_id", sort=False)["role"].agg(">".join).reset_index()
        return pa.table(
            {
                "conv_id": pa.array(g["conv_id"], pa.string()),
                "role_path": pa.array(g["role"], pa.string()),
            },
            schema=out_schema,
        )

    return state.repartition(
        join_partitions(num_partitions), keys=["conv_id"]
    ).map_batches(per_block, batch_format="pyarrow", batch_size=None)


def resurrected_keys(ds: ray.data.Dataset, num_partitions: int = 16) -> ray.data.Dataset:
    """Tombstone-resurrection audit: per conversation, how many keys
    carry a live winner (op ≠ D) on top of at least one delete event —
    the delete-then-reinsert pattern a CDC consumer must handle. Falls
    out of the counted LWW shuffle for free: resurrected ⇔ winner op ≠ D
    and cnt_d > 0; the exchange ships winners only."""
    import numpy as np

    from ..context import REDUCE_BATCH_SIZE, configure_shuffle, join_partitions
    from ..stages.merge import lww_reduce_counted

    configure_shuffle(num_partitions)

    out_schema = pa.schema(
        [pa.field("conv_id", pa.string()), pa.field("resurrected", pa.int64())]
    )

    def per_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        t = lww_reduce_counted(t)  # keys co-located → exact winners
        op = t["op"].to_numpy(zero_copy_only=False)
        cnt_d = t["cnt_d"].to_numpy(zero_copy_only=False).astype(np.int64)
        mask = (op != "D") & (cnt_d > 0)
        if not mask.any():
            return out_schema.empty_table()
        conv = t["conv_id"].to_numpy(zero_copy_only=False)[mask]
        keys, n = np.unique(conv, return_counts=True)
        return pa.table(
            {
                "conv_id": pa.array(keys, pa.string()),
                "resurrected": pa.array(n.astype(np.int64)),
            },
            schema=out_schema,
        )

    def final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        df = t.to_pandas().groupby("conv_id", as_index=False)["resurrected"].sum()
        return pa.table(
            {
                "conv_id": pa.array(df["conv_id"], pa.string()),
                "resurrected": pa.array(df["resurrected"].to_numpy("int64")),
            },
            schema=out_schema,
        )

    return (
        ds.map_batches(
            lww_reduce_counted, batch_format="pyarrow", batch_size=REDUCE_BATCH_SIZE
        )
        .repartition(join_partitions(num_partitions), keys=["conv_id", "turn_idx"])
        .map_batches(per_block, batch_format="pyarrow", batch_size=None)
        .repartition(join_partitions(8), keys=["conv_id"])
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def out_of_order_counts(
    ds: ray.data.Dataset, num_partitions: int = 16
) -> ray.data.Dataset:
    """Per-conversation out-of-order-arrival audit: how many events carry
    a ts strictly OLDER than the running max ts of their conversation in
    LSN (arrival) order — the late-data signal that sizes watermark slack
    for the windowed consumers. One conv-keyed hop co-locates each
    conversation's history; inside the block the prefix max is a single
    vectorized ``np.maximum.accumulate`` over lsn-sorted segments (no
    per-row Python). Same bounded-conversation partitioning assumption as
    ``conv_role_path``."""
    import numpy as np

    from ..context import configure_shuffle, join_partitions

    configure_shuffle(num_partitions)

    out_schema = pa.schema(
        [
            pa.field("conv_id", pa.string()),
            pa.field("n_events", pa.int64()),
            pa.field("n_late", pa.int64()),
        ]
    )

    def per_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        conv = t["conv_id"].to_numpy(zero_copy_only=False)
        lsn = t["lsn"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        order = np.lexsort((lsn, conv))
        conv, ts = conv[order], ts[order]
        seg_start = np.empty(len(conv), dtype=bool)
        seg_start[0] = True
        seg_start[1:] = conv[1:] != conv[:-1]
        # prefix max of ts within each conversation segment: subtract the
        # segment's running baseline trick — reset accumulate at segment
        # starts by lifting each segment far above the previous one
        seg_id = np.cumsum(seg_start) - 1
        # rebase to the block minimum BEFORE lifting: raw epoch-us values
        # times n_segments would overflow int64 with many conversations
        # per block; rebased values stay bounded by n_segments * range
        base = ts.min() if len(ts) else 0
        ts0 = ts - base
        lift = (int(ts0.max()) + 1) if len(ts0) else 1
        if len(ts0) and int(seg_id[-1]) * lift >= np.iinfo(np.int64).max - lift:
            raise OverflowError(
                "out_of_order_counts: segment lift would overflow int64 "
                f"(segments={int(seg_id[-1]) + 1}, range={lift})"
            )
        lifted = ts0 + seg_id * lift
        run_max = np.maximum.accumulate(lifted) - seg_id * lift + base
        # late ⇔ ts < max over the STRICT prefix: compare to the running
        # max shifted by one within the segment
        prev_max = np.empty_like(run_max)
        prev_max[1:] = run_max[:-1]
        late = np.zeros(len(ts), dtype=bool)
        inner = ~seg_start
        late[inner] = ts[inner] < prev_max[inner]
        starts = np.flatnonzero(seg_start)
        n_ev = np.diff(np.append(starts, len(conv)))
        n_late = np.add.reduceat(late.astype(np.int64), starts)
        return pa.table(
            {
                "conv_id": pa.array(conv[starts], pa.string()),
                "n_events": pa.array(n_ev.astype(np.int64)),
                "n_late": pa.array(n_late),
            },
            schema=out_schema,
        )

    return ds.repartition(
        join_partitions(num_partitions), keys=["conv_id"]
    ).map_batches(per_block, batch_format="pyarrow", batch_size=None)


def key_skew(ds: ray.data.Dataset, k: int = 10, num_partitions: int = 16) -> ray.data.Dataset:
    """Hot-key diagnostics: the k hottest conversations by event count
    with their share of the whole log — the report that feeds the salted
    repartition path's threshold choice. Per-batch partial counts bound
    the exchange by distinct convs per block; the final share/rank pass
    sees one row per conversation (tiny)."""
    import numpy as np

    from ..context import configure_shuffle, join_partitions

    configure_shuffle(num_partitions)

    part_schema = pa.schema(
        [pa.field("conv_id", pa.string()), pa.field("n", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        conv = t["conv_id"].to_numpy(zero_copy_only=False)
        keys, n = np.unique(conv, return_counts=True)
        return pa.table(
            {"conv_id": pa.array(keys, pa.string()),
             "n": pa.array(n.astype(np.int64))},
            schema=part_schema,
        )

    out_schema = pa.schema(
        [
            pa.field("conv_id", pa.string()),
            pa.field("n_events", pa.int64()),
            pa.field("share", pa.float64()),
        ]
    )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        df = t.to_pandas().groupby("conv_id", as_index=False)["n"].sum()
        return pa.table(
            {"conv_id": pa.array(df["conv_id"], pa.string()),
             "n": pa.array(df["n"].to_numpy("int64"))},
            schema=part_schema,
        )

    def final(t: pa.Table) -> pa.Table:
        from ..functions.num import sql_round

        if t.num_rows == 0:
            return out_schema.empty_table()
        conv = t["conv_id"].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        total = n.sum()
        order = np.lexsort((conv, -n))[:k]
        return pa.table(
            {
                "conv_id": pa.array(conv[order], pa.string()),
                "n_events": pa.array(n[order]),
                "share": sql_round(pa.array(n[order] / total), 6),
            },
            schema=out_schema,
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(join_partitions(num_partitions), keys=["conv_id"])
        .map_batches(merge, batch_format="pyarrow", batch_size=None)
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def first_op_violations(
    ds: ray.data.Dataset, num_partitions: int = 16
) -> ray.data.Dataset:
    """Orphan-op audit: keys whose FIRST event in LSN order is not an
    insert (an update/delete arriving for a key the lake has never seen
    — the upstream-snapshot-gap signal). Distributed argmin: block-local
    first-op candidates (one row per key per batch), one keyed hop
    re-runs the same reduction, then a tiny rollup by the violating op."""
    import numpy as np

    from ..context import configure_shuffle, join_partitions

    configure_shuffle(num_partitions)

    cand_schema = pa.schema(
        [
            pa.field("conv_id", pa.string()),
            pa.field("turn_idx", pa.int32()),
            pa.field("lsn", pa.int64()),
            pa.field("op", pa.string()),
        ]
    )

    def reduce_first(conv, turn, lsn, op) -> pa.Table:
        order = np.lexsort((lsn, turn, conv))
        c, tn = conv[order], turn[order]
        first = np.empty(len(c), dtype=bool)
        first[0] = True
        first[1:] = (c[1:] != c[:-1]) | (tn[1:] != tn[:-1])
        sel = order[np.flatnonzero(first)]
        return pa.table(
            {
                "conv_id": pa.array(conv[sel], pa.string()),
                "turn_idx": pa.array(turn[sel].astype(np.int32)),
                "lsn": pa.array(lsn[sel]),
                "op": pa.array(op[sel], pa.string()),
            },
            schema=cand_schema,
        )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return cand_schema.empty_table()
        return reduce_first(
            t["conv_id"].to_numpy(zero_copy_only=False),
            t["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64),
            t["lsn"].to_numpy(zero_copy_only=False).astype(np.int64),
            t["op"].to_numpy(zero_copy_only=False),
        )

    out_schema = pa.schema(
        [pa.field("first_op", pa.string()), pa.field("n_keys", pa.int64())]
    )

    def per_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        cand = reduce_first(
            t["conv_id"].to_numpy(zero_copy_only=False),
            t["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64),
            t["lsn"].to_numpy(zero_copy_only=False).astype(np.int64),
            t["op"].to_numpy(zero_copy_only=False),
        )
        op = cand["op"].to_numpy(zero_copy_only=False)
        bad = op[op != "I"]
        if len(bad) == 0:
            return out_schema.empty_table()
        keys, n = np.unique(bad, return_counts=True)
        return pa.table(
            {"first_op": pa.array(keys, pa.string()),
             "n_keys": pa.array(n.astype(np.int64))},
            schema=out_schema,
        )

    def final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        df = t.to_pandas().groupby("first_op", as_index=False)["n_keys"].sum()
        return pa.table(
            {"first_op": pa.array(df["first_op"], pa.string()),
             "n_keys": pa.array(df["n_keys"].to_numpy("int64"))},
            schema=out_schema,
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(join_partitions(num_partitions), keys=["conv_id", "turn_idx"])
        .map_batches(per_part, batch_format="pyarrow", batch_size=None)
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def interarrival_hist(
    ds: ray.data.Dataset, num_partitions: int = 16
) -> ray.data.Dataset:
    """Log2-bucketed inter-arrival-gap histogram per conversation stream
    (whole-second gaps > 0 between consecutive events in LSN order) —
    the burstiness profile that sizes the follow-mode poll interval.
    Conv-keyed hop, vectorized segment diffs, then the histogram
    combiner: the final exchange moves O(blocks × buckets) rows."""
    import numpy as np

    from ray.data.aggregate import Sum

    from ..context import configure_shuffle, join_partitions

    configure_shuffle(num_partitions)

    hist_schema = pa.schema(
        [pa.field("bucket", pa.int64()), pa.field("n", pa.int64())]
    )

    def per_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return hist_schema.empty_table()
        conv = t["conv_id"].to_numpy(zero_copy_only=False)
        lsn = t["lsn"].to_numpy(zero_copy_only=False).astype(np.int64)
        # normalize the unit before integer math — ns-unit sources would
        # otherwise floor to milliseconds
        ts = t["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        order = np.lexsort((lsn, conv))
        conv, ts = conv[order], ts[order]
        same = np.zeros(len(conv), dtype=bool)
        same[1:] = conv[1:] == conv[:-1]
        # date_diff('second', a, b) counts second-BOUNDARY crossings, so
        # floor each timestamp to whole seconds first, then difference
        sec = ts // 1_000_000
        gap_s = np.zeros(len(sec), dtype=np.int64)
        gap_s[1:] = sec[1:] - sec[:-1]
        gap_s = np.where(same, gap_s, 0)
        pos = gap_s[gap_s > 0]
        if len(pos) == 0:
            return hist_schema.empty_table()
        b = np.floor(np.log2(pos.astype(np.float64))).astype(np.int64)
        keys, n = np.unique(b, return_counts=True)
        return pa.table(
            {"bucket": pa.array(keys), "n": pa.array(n.astype(np.int64))},
            schema=hist_schema,
        )

    return (
        ds.repartition(join_partitions(num_partitions), keys=["conv_id"])
        .map_batches(per_block, batch_format="pyarrow", batch_size=None)
        .groupby("bucket")
        .aggregate(Sum("n", alias_name="n"))
    )


def conv_text_stats(state: ray.data.Dataset, num_partitions: int = 16) -> ray.data.Dataset:
    """Per-conversation payload profile over the LWW final state: live
    turns, total and mean text length — the table-health rollup a lake
    operator watches after replay. Pure combiner: each block collapses
    to one row per conversation before the tiny keyed hop."""
    import numpy as np

    from ..context import configure_shuffle, join_partitions
    from ..functions.num import sql_round

    configure_shuffle(num_partitions)

    part_schema = pa.schema(
        [
            pa.field("conv_id", pa.string()),
            pa.field("n_turns", pa.int64()),
            pa.field("total_chars", pa.int64()),
        ]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        import pyarrow.compute as pc

        conv = t["conv_id"].to_numpy(zero_copy_only=False)
        ln = (
            pc.utf8_length(
                pc.coalesce(t["text"].combine_chunks(), pa.scalar("", pa.string()))
            )
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        keys, inv = np.unique(conv, return_inverse=True)
        return pa.table(
            {
                "conv_id": pa.array(keys, pa.string()),
                "n_turns": pa.array(np.bincount(inv).astype(np.int64)),
                "total_chars": pa.array(
                    np.bincount(inv, weights=ln).astype(np.int64)
                ),
            },
            schema=part_schema,
        )

    out_schema = pa.schema(
        [
            pa.field("conv_id", pa.string()),
            pa.field("n_turns", pa.int64()),
            pa.field("total_chars", pa.int64()),
            pa.field("mean_chars", pa.float64()),
        ]
    )

    def final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        df = t.to_pandas().groupby("conv_id", as_index=False).sum()
        n = df["n_turns"].to_numpy(np.int64)
        tc = df["total_chars"].to_numpy(np.int64)
        return pa.table(
            {
                "conv_id": pa.array(df["conv_id"], pa.string()),
                "n_turns": pa.array(n),
                "total_chars": pa.array(tc),
                "mean_chars": sql_round(pa.array(tc / n), 6),
            },
            schema=out_schema,
        )

    return (
        state.map_batches(partial, batch_format="pyarrow")
        .repartition(join_partitions(num_partitions), keys=["conv_id"])
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def role_transitions(state: ray.data.Dataset, num_partitions: int = 16) -> ray.data.Dataset:
    """Role-transition bigram counts over the LWW final state: for each
    conversation in turn order, count (role → next role) adjacencies —
    the Markov dialog-structure profile. One conv-keyed hop, vectorized
    segment-bounded adjacent pairs (no cross-conversation bigrams), then
    a tiny pair-keyed sum."""
    import numpy as np

    from ray.data.aggregate import Sum

    from ..context import configure_shuffle, join_partitions

    configure_shuffle(num_partitions)

    pair_schema = pa.schema(
        [
            pa.field("role", pa.string()),
            pa.field("next_role", pa.string()),
            pa.field("n", pa.int64()),
        ]
    )

    def per_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pair_schema.empty_table()
        conv = t["conv_id"].to_numpy(zero_copy_only=False)
        turn = t["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
        role = t["role"].to_numpy(zero_copy_only=False)
        order = np.lexsort((turn, conv))
        conv, role = conv[order], role[order]
        same = np.zeros(len(conv), dtype=bool)
        same[1:] = conv[1:] == conv[:-1]
        idx = np.flatnonzero(same)
        if len(idx) == 0:
            return pair_schema.empty_table()
        a, b = role[idx - 1], role[idx]
        # pair counting via factorized codes (string concat with a numpy
        # U dtype would strip separator/terminator characters)
        ua, ia = np.unique(a, return_inverse=True)
        ub, ib = np.unique(b, return_inverse=True)
        code = ia.astype(np.int64) * len(ub) + ib
        keys, n = np.unique(code, return_counts=True)
        return pa.table(
            {
                "role": pa.array(ua[keys // len(ub)], pa.string()),
                "next_role": pa.array(ub[keys % len(ub)], pa.string()),
                "n": pa.array(n.astype(np.int64)),
            },
            schema=pair_schema,
        )

    return (
        state.repartition(join_partitions(num_partitions), keys=["conv_id"])
        .map_batches(per_block, batch_format="pyarrow", batch_size=None)
        .groupby(["role", "next_role"])
        .aggregate(Sum("n", alias_name="n"))
    )


def partition_balance(
    ds: ray.data.Dataset, num_buckets: int = 64, num_partitions: int = 16
) -> ray.data.Dataset:
    """Partition-layout balance audit: distinct keys and event mass per
    hash bucket under the md5-low64 sharding family (the reference's
    output-sharding scheme and this engine's lookup-index partitioner) —
    the report that validates a partition-count choice before a replay.
    Per-batch per-conv partials, one conv-keyed hop for exact per-key
    totals, then a bucket-keyed combiner: no stage ever sees more than
    O(distinct convs) rows."""
    import numpy as np

    from ray.data.aggregate import Sum

    from ..context import configure_shuffle, join_partitions
    from ..functions.dedup import _md5_lower64

    configure_shuffle(num_partitions)

    key_schema = pa.schema(
        [pa.field("conv_id", pa.string()), pa.field("n", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return key_schema.empty_table()
        conv = t["conv_id"].to_numpy(zero_copy_only=False)
        keys, n = np.unique(conv, return_counts=True)
        return pa.table(
            {"conv_id": pa.array(keys, pa.string()),
             "n": pa.array(n.astype(np.int64))},
            schema=key_schema,
        )

    out_schema = pa.schema(
        [
            pa.field("part", pa.int64()),
            pa.field("n_keys", pa.int64()),
            pa.field("n_events", pa.int64()),
        ]
    )

    def to_buckets(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        df = t.to_pandas().groupby("conv_id", as_index=False)["n"].sum()
        conv = df["conv_id"].to_numpy()
        part = (_md5_lower64(conv) % np.uint64(num_buckets)).astype(np.int64)
        keys, inv = np.unique(part, return_inverse=True)
        return pa.table(
            {
                "part": pa.array(keys),
                "n_keys": pa.array(np.bincount(inv).astype(np.int64)),
                "n_events": pa.array(
                    np.bincount(inv, weights=df["n"].to_numpy(np.int64)).astype(
                        np.int64
                    )
                ),
            },
            schema=out_schema,
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(join_partitions(num_partitions), keys=["conv_id"])
        .map_batches(to_buckets, batch_format="pyarrow", batch_size=None)
        .groupby("part")
        .aggregate(
            Sum("n_keys", alias_name="n_keys"),
            Sum("n_events", alias_name="n_events"),
        )
    )


def turn_holes(state: ray.data.Dataset, num_partitions: int = 16) -> ray.data.Dataset:
    """Turn-continuity audit over the LWW final state: per conversation,
    live turns, the highest turn index, and the number of HOLES
    (max_turn + 1 − n_turns) — deletes and never-arrived turns punch
    holes that a downstream transcript assembler must handle. Pure
    combiner: each block collapses to (conv, count, max) before the tiny
    keyed hop; holes are derived after the exchange."""
    import numpy as np

    from ..context import configure_shuffle, join_partitions

    configure_shuffle(num_partitions)

    part_schema = pa.schema(
        [
            pa.field("conv_id", pa.string()),
            pa.field("n_turns", pa.int64()),
            pa.field("max_turn", pa.int64()),
        ]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        conv = t["conv_id"].to_numpy(zero_copy_only=False)
        turn = t["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
        keys, inv = np.unique(conv, return_inverse=True)
        mx = np.full(len(keys), -1, dtype=np.int64)
        np.maximum.at(mx, inv, turn)
        return pa.table(
            {
                "conv_id": pa.array(keys, pa.string()),
                "n_turns": pa.array(np.bincount(inv).astype(np.int64)),
                "max_turn": pa.array(mx),
            },
            schema=part_schema,
        )

    out_schema = pa.schema(
        [
            pa.field("conv_id", pa.string()),
            pa.field("n_turns", pa.int64()),
            pa.field("max_turn", pa.int64()),
            pa.field("holes", pa.int64()),
        ]
    )

    def final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        df = t.to_pandas().groupby("conv_id", as_index=False).agg(
            n_turns=("n_turns", "sum"), max_turn=("max_turn", "max")
        )
        n = df["n_turns"].to_numpy(np.int64)
        mx = df["max_turn"].to_numpy(np.int64)
        return pa.table(
            {
                "conv_id": pa.array(df["conv_id"], pa.string()),
                "n_turns": pa.array(n),
                "max_turn": pa.array(mx),
                "holes": pa.array(mx + 1 - n),
            },
            schema=out_schema,
        )

    return (
        state.select_columns(["conv_id", "turn_idx"])
        .map_batches(partial, batch_format="pyarrow")
        .repartition(join_partitions(num_partitions), keys=["conv_id"])
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def state_checksum(
    state: ray.data.Dataset, num_buckets: int = 16, num_partitions: int = 16
) -> ray.data.Dataset:
    """Replication-audit checksums of the LWW final state: every live
    row hashes to md5-low64 of its canonical rendering, rows XOR-fold
    into ``num_buckets`` conv-keyed buckets, and the result is
    (bucket, n_keys, checksum-hex) — the constant-size relation two
    replicas exchange to prove state equality without moving data
    (order-independent by XOR; null payloads render as ''). Per-batch
    partial (bucket, count, xor) rows; one tiny keyed hop folds them.
    Hashing is md5 per row — the one per-row loop in the engine's audit
    tier, bounded by the live-state size and embarrassingly parallel."""
    import hashlib

    import numpy as np

    from ..context import configure_shuffle, join_partitions

    configure_shuffle(num_partitions)
    nb = np.uint64(num_buckets)

    part_schema = pa.schema(
        [
            pa.field("bucket", pa.int64()),
            pa.field("n_keys", pa.int64()),
            pa.field("xr", pa.uint64()),
        ]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        conv = t["conv_id"].to_numpy(zero_copy_only=False)
        turn = t["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
        role = t["role"].to_numpy(zero_copy_only=False)
        text = t["text"].to_numpy(zero_copy_only=False)
        tool = t["tool"].to_numpy(zero_copy_only=False)
        ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        n = len(conv)
        hv = np.empty(n, dtype=np.uint64)
        bk = np.empty(n, dtype=np.uint64)
        for i in range(n):
            row = "%s|%d|%s|%s|%s|%d" % (
                conv[i],
                turn[i],
                role[i] if role[i] is not None else "",
                text[i] if text[i] is not None else "",
                tool[i] if tool[i] is not None else "",
                ts[i],
            )
            hv[i] = int.from_bytes(
                hashlib.md5(row.encode("utf-8")).digest()[8:16], "little"
            )
            bk[i] = int.from_bytes(
                hashlib.md5(str(conv[i]).encode("utf-8")).digest()[8:16],
                "little",
            )
        bk = bk % nb
        order = np.argsort(bk, kind="stable")
        bs, hs = bk[order], hv[order]
        new = np.concatenate(([True], bs[1:] != bs[:-1]))
        starts = np.flatnonzero(new)
        xr = np.bitwise_xor.reduceat(hs, starts)
        cnt = np.diff(np.append(starts, n))
        return pa.table(
            {
                "bucket": pa.array(bs[starts].astype(np.int64)),
                "n_keys": pa.array(cnt.astype(np.int64)),
                "xr": pa.array(xr),
            },
            schema=part_schema,
        )

    out_schema = pa.schema(
        [
            pa.field("bucket", pa.int64()),
            pa.field("n_keys", pa.int64()),
            pa.field("checksum", pa.string()),
        ]
    )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        bk = t["bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
        cnt = t["n_keys"].to_numpy(zero_copy_only=False).astype(np.int64)
        xr = t["xr"].to_numpy(zero_copy_only=False).astype(np.uint64)
        order = np.argsort(bk, kind="stable")
        bs, cs, xs = bk[order], cnt[order], xr[order]
        new = np.concatenate(([True], bs[1:] != bs[:-1]))
        starts = np.flatnonzero(new)
        folded = np.bitwise_xor.reduceat(xs, starts)
        return pa.table(
            {
                "bucket": pa.array(bs[starts]),
                "n_keys": pa.array(np.add.reduceat(cs, starts)),
                "checksum": pa.array(
                    [format(int(x), "016x") for x in folded], pa.string()
                ),
            },
            schema=out_schema,
        )

    return (
        state.map_batches(partial, batch_format="pyarrow")
        .repartition(join_partitions(8), keys=["bucket"])
        .map_batches(fold, batch_format="pyarrow", batch_size=None)
    )


def dup_turns(state: ray.data.Dataset, num_partitions: int = 16) -> ray.data.Dataset:
    """Self-duplication audit over the LWW final state: (conv, text)
    pairs appearing on more than one live turn — retry artifacts and
    copy-paste loops a transcript consumer usually wants collapsed.
    Combiner-first per-batch counts keyed on the content itself, one
    keyed hop, HAVING > 1 at the end."""
    import numpy as np
    import pyarrow.compute as pc

    from ..context import configure_shuffle, join_partitions

    configure_shuffle(num_partitions)

    part_schema = pa.schema(
        [
            pa.field("conv_id", pa.string()),
            pa.field("text", pa.string()),
            pa.field("n_dups", pa.int64()),
        ]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        conv = t["conv_id"].to_numpy(zero_copy_only=False)
        text = t["text"].to_numpy(zero_copy_only=False)
        ok = np.array([x is not None for x in text], dtype=bool)
        conv, text = conv[ok], text[ok]
        if len(conv) == 0:
            return part_schema.empty_table()
        key = np.array(
            [f"{c}\x1f{x}" for c, x in zip(conv, text)], dtype=object
        )
        uniq, inv = np.unique(key, return_inverse=True)
        split = [k.split("\x1f", 1) for k in uniq]
        return pa.table(
            {
                "conv_id": pa.array([s[0] for s in split], pa.string()),
                "text": pa.array([s[1] for s in split], pa.string()),
                "n_dups": pa.array(np.bincount(inv).astype(np.int64)),
            },
            schema=part_schema,
        )

    from ray.data.aggregate import Sum

    agg = (
        state.select_columns(["conv_id", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["conv_id", "text"])
        .aggregate(Sum("n_dups", alias_name="n_dups"))
    )

    def having(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        return pa.table(
            {
                "conv_id": t["conv_id"],
                "text": t["text"],
                "n_dups": t["n_dups"].cast(pa.int64()),
            },
            schema=part_schema,
        ).filter(pc.greater(t["n_dups"].cast(pa.int64()), 1))

    return agg.map_batches(having, batch_format="pyarrow")


def conv_longest_gap(
    state: ray.data.Dataset, num_partitions: int = 16
) -> ray.data.Dataset:
    """Per-conversation longest inter-turn timestamp gap over the LWW
    final state (turn order, not ts order — LWW updates can reorder
    wall-clock time, and that inversion is exactly what this audit
    surfaces as a negative-gap floor). Conversations with a single live
    turn are excluded. One conv-keyed hop; gaps resolve per block with
    a segment-masked diff."""
    import numpy as np

    from ..context import configure_shuffle, join_partitions

    configure_shuffle(num_partitions)

    out_schema = pa.schema(
        [
            pa.field("conv_id", pa.string()),
            pa.field("n_turns", pa.int64()),
            pa.field("max_gap_us", pa.int64()),
        ]
    )

    def per_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        conv = t["conv_id"].to_numpy(zero_copy_only=False)
        turn = t["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        order = np.lexsort((turn, conv))
        conv, ts = conv[order], ts[order]
        same = np.empty(len(conv), dtype=bool)
        same[0] = False
        same[1:] = conv[1:] == conv[:-1]
        gaps = np.empty(len(conv), dtype=np.int64)
        gaps[0] = np.iinfo(np.int64).min
        gaps[1:] = ts[1:] - ts[:-1]
        gaps[~same] = np.iinfo(np.int64).min  # segment boundaries
        starts = np.flatnonzero(~same)
        lens = np.diff(np.append(starts, len(conv)))
        keep = lens >= 2
        if not keep.any():
            return out_schema.empty_table()
        mx = np.maximum.reduceat(gaps, starts)  # boundary gap is -inf
        return pa.table(
            {
                "conv_id": pa.array(conv[starts[keep]], pa.string()),
                "n_turns": pa.array(lens[keep].astype(np.int64)),
                "max_gap_us": pa.array(mx[keep]),
            },
            schema=out_schema,
        )

    return state.repartition(
        join_partitions(num_partitions), keys=["conv_id"]
    ).map_batches(per_block, batch_format="pyarrow", batch_size=None)


def tool_usage(state: ray.data.Dataset, num_partitions: int = 16) -> ray.data.Dataset:
    """Per-tool adoption over the LWW final state: live turns carrying
    the tool and DISTINCT conversations using it. Per-batch partials
    bound the exchange by distinct (tool, conv) per block; the
    conversation count finishes exactly after the keyed hop (each
    tool's (tool, conv) partials land whole)."""
    import numpy as np

    from ..context import configure_shuffle, join_partitions

    configure_shuffle(num_partitions)

    pair_schema = pa.schema(
        [
            pa.field("tool", pa.string()),
            pa.field("conv_id", pa.string()),
            pa.field("n_turns", pa.int64()),
        ]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pair_schema.empty_table()
        import pyarrow.compute as pc

        t = t.filter(pc.is_valid(t["tool"]))
        if t.num_rows == 0:
            return pair_schema.empty_table()
        tool = t["tool"].to_numpy(zero_copy_only=False).astype(object)
        conv = t["conv_id"].to_numpy(zero_copy_only=False).astype(object)
        tu, ti = np.unique(tool, return_inverse=True)
        cu, ci = np.unique(conv, return_inverse=True)
        nc = len(cu)
        uniq, inv = np.unique(ti * nc + ci, return_inverse=True)
        return pa.table(
            {
                "tool": pa.array(tu[uniq // nc], pa.string()),
                "conv_id": pa.array(cu[uniq % nc], pa.string()),
                "n_turns": pa.array(np.bincount(inv).astype(np.int64)),
            },
            schema=pair_schema,
        )

    out_schema = pa.schema(
        [
            pa.field("tool", pa.string()),
            pa.field("n_convs", pa.int64()),
            pa.field("n_turns", pa.int64()),
        ]
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        import numpy as np

        tool = t["tool"].to_numpy(zero_copy_only=False).astype(object)
        conv = t["conv_id"].to_numpy(zero_copy_only=False).astype(object)
        n = t["n_turns"].to_numpy(zero_copy_only=False).astype(np.int64)
        # (tool, conv) partials may repeat across source blocks: collapse
        tu, ti = np.unique(tool, return_inverse=True)
        cu, ci = np.unique(conv, return_inverse=True)
        nc = len(cu)
        uniq, inv = np.unique(ti * nc + ci, return_inverse=True)
        turns = np.bincount(inv, weights=n).astype(np.int64)
        tool_of_pair = (uniq // nc).astype(np.int64)
        n_convs = np.bincount(tool_of_pair, minlength=len(tu)).astype(np.int64)
        n_turns = np.bincount(
            tool_of_pair, weights=turns, minlength=len(tu)
        ).astype(np.int64)
        return pa.table(
            {
                "tool": pa.array(tu, pa.string()),
                "n_convs": pa.array(n_convs),
                "n_turns": pa.array(n_turns),
            },
            schema=out_schema,
        )

    return (
        state.map_batches(partial, batch_format="pyarrow")
        .repartition(join_partitions(num_partitions), keys=["tool"])
        .map_batches(finish, batch_format="pyarrow", batch_size=None)
    )
