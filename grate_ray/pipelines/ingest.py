"""Incremental, exactly-once, resumable ingest: binlog tail → Parquet lake.

The driver loop tails the binlog in LSN micro-batches (SURVEY.md §3.4). Each
micro-batch is ONE streaming Dataset execution:

    read_parquet(pending chunk files — file-level LSN pruning)
      → map_batches(reconcile)            # schema evolution
      → map_batches(lww_reduce)           # partial combine pre-shuffle
      → groupby(part).map_groups(PartitionMerger, concurrency=N)
            # stateful actor pool: per-partition sorted merge buffer,
            # loads lake state once (ST1-ST3 load-once analogue,
            # /root/reference/xls/xls.go:248-263), merges, commits a
            # DELTA (snapshot every SNAPSHOT_EVERY deltas)
      → tiny metrics dataset (one row per partition commit)

Exactly-once: Ray retries tasks at-least-once, so the *commit* is the only
side effect and is idempotent — keyed by (partition, lsn_hi), temp-file +
rename (state/manifest.py). Re-merging already-applied events is itself a
semantic no-op (LWW argmax against state that already contains a winner
with ≥ (ts, lsn)), so retries can't corrupt state either.

Resume: a killed job restarts, reads per-partition high-water marks, prunes
binlog files whose lsn range every partition has committed, and skips
already-committed partitions inside the merger.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data

from ..schema import BINLOG_SCHEMA
from ..stages.evolve import make_reconciler, unify
from ..stages.merge import (
    COUNT_COLS,
    finalize,
    lww_reduce,
    lww_reduce_counted,
    merge_into_state,
)
from ..stages.partition import add_partition_column
from ..state.manifest import (
    append_batch_plan,
    chain_stats,
    commit_delta,
    commit_empty,
    commit_partition,
    committed_lsn,
    deltas_since_snapshot,
    lake_num_partitions,
    list_partitions,
    read_batch_plan,
    read_column_mapping,
    read_state,
    write_lake_config,
    zone_may_match,
)

METRICS_SCHEMA = pa.schema(
    [
        pa.field("part", pa.int32()),
        pa.field("lsn_lo", pa.int64()),
        pa.field("lsn_hi", pa.int64()),
        pa.field("n_events", pa.int64()),
        pa.field("n_inserts", pa.int64()),
        pa.field("n_updates", pa.int64()),
        pa.field("n_deletes", pa.int64()),
        pa.field("live_rows", pa.int64()),
        pa.field("skipped", pa.bool_()),
    ]
)


_DICT_COLS = ("op", "role", "tool", "conv_id")


def _dict_encode_cols(t: pa.Table) -> pa.Table:
    """Dictionary-encode the low-cardinality string columns (+ conv_id,
    which repeats across turn keys) BEFORE the hash exchange — the shuffle
    then ships 1-4-byte indices instead of repeated strings. Decoded at
    the merger boundary; text stays plain (unique per row)."""
    for c in _DICT_COLS:
        if c in t.column_names and not pa.types.is_dictionary(t.schema.field(c).type):
            i = t.column_names.index(c)
            t = t.set_column(i, c, pc.dictionary_encode(t[c].combine_chunks()))
    return t


def _decode_dict_cols(t: pa.Table) -> pa.Table:
    for i, f in enumerate(t.schema):
        if pa.types.is_dictionary(f.type):
            t = t.set_column(i, f.name, t[f.name].cast(f.type.value_type))
    return t


class PartitionMerger:
    """Actor-pool merge stage (one call per partition group).

    Holds per-partition sorted merge buffers: lake-partition state is read
    once per actor and cached across calls; incoming group events are
    LWW-reduced (sorted) and merged in. The commit (snapshot + manifest) is
    the only side effect and is idempotent.
    """

    SNAPSHOT_EVERY = 8  # delta commits between full snapshots
    MAX_CACHE_ROWS = 4_000_000  # per-actor merge-buffer bound (SURVEY §4)

    def __init__(
        self,
        lake_dir: str,
        lsn_lo: int,
        lsn_hi: int,
        max_cache_rows: int | None = None,
    ):
        self.lake_dir = lake_dir
        self.lsn_lo = lsn_lo
        self.lsn_hi = lsn_hi
        self.max_cache_rows = max_cache_rows or self.MAX_CACHE_ROWS
        self.state_cache: dict[int, pa.Table] = {}

    def _cache_put(self, part: int, state: pa.Table) -> None:
        """Bounded merge-buffer cache: partition states are re-derivable
        from (snapshot + deltas) on disk, so when cached rows exceed the
        bound we evict everything but the newest entry rather than let
        actor memory grow with the number of partitions served. Each
        eviction drops a tiny diagnostic marker under ``_diag/`` so
        stress tests (and operators) can ASSERT the path ran and that
        post-eviction residency respects the bound."""
        self.state_cache[part] = state
        total = sum(t.num_rows for t in self.state_cache.values())
        if total > self.max_cache_rows:
            self.state_cache = {part: state}
            self._log_eviction(total, state.num_rows)

    def _log_eviction(self, rows_before: int, rows_after: int) -> None:
        import json
        import uuid

        d = os.path.join(self.lake_dir, "_diag")
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, f"evict-{uuid.uuid4().hex[:12]}.json"), "w") as f:
            json.dump(
                {
                    "pid": os.getpid(),
                    "bound": self.max_cache_rows,
                    "cached_rows_before": rows_before,
                    "cached_rows_after": rows_after,
                },
                f,
            )

    def _metrics_row(self, part: int, counts: dict | None, live: int, skipped: bool) -> pa.Table:
        counts = counts or {}
        n_i = counts.get("cnt_i", 0)
        n_u = counts.get("cnt_u", 0)
        n_d = counts.get("cnt_d", 0)
        n = n_i + n_u + n_d  # cnt_events is derived, not shipped
        return pa.table(
            {
                "part": pa.array([part], pa.int32()),
                "lsn_lo": pa.array([self.lsn_lo], pa.int64()),
                "lsn_hi": pa.array([self.lsn_hi], pa.int64()),
                "n_events": pa.array([n], pa.int64()),
                "n_inserts": pa.array([n_i], pa.int64()),
                "n_updates": pa.array([n_u], pa.int64()),
                "n_deletes": pa.array([n_d], pa.int64()),
                "live_rows": pa.array([live], pa.int64()),
                "skipped": pa.array([skipped], pa.bool_()),
            },
            schema=METRICS_SCHEMA,
        )

    def __call__(self, group: pa.Table) -> pa.Table:
        part = group["part"][0].as_py()
        events = _decode_dict_cols(group.drop_columns(["part"]))

        hw = committed_lsn(self.lake_dir, part)
        if hw is not None and hw >= self.lsn_hi:
            # exactly-once: this (partition, micro-batch) is already durable
            return self._metrics_row(part, None, -1, True)

        state = self.state_cache.get(part)
        if state is None:
            state = read_state(self.lake_dir, part)
        if hw is not None:
            # drop replayed winners at-or-below the high-water mark so
            # metrics count each event exactly once under a resume (merge
            # itself is idempotent either way); micro-batch windows are
            # pinned by the persisted plan (read_batch_plan), so boundaries
            # can't drift across resumes regardless of files_per_microbatch
            events = events.filter(pc.greater(events["lsn"], hw))

        # exact raw-event counts carried through the partial reduces
        counts = {
            c: int(pc.sum(events[c]).as_py() or 0)
            for c in COUNT_COLS
            if c in events.column_names
        }
        events = events.drop_columns([c for c in COUNT_COLS if c in events.column_names])
        if state is not None and state.column_names != events.column_names:
            # lake snapshot predates a schema evolution in this micro-batch:
            # widen the persisted state to the incoming unified schema
            from ..stages.evolve import reconcile, unify as _unify

            state = reconcile(state, _unify([state.schema, events.schema])).select(
                events.column_names
            )

        reduced = lww_reduce(events)
        new_state = (
            reduced if state is None or state.num_rows == 0
            else merge_into_state(state, reduced)
        )
        self._cache_put(part, new_state)
        live = int(pc.sum(pc.cast(pc.not_equal(new_state["op"], "D"), pa.int64())).as_py() or 0)
        # write amplification bound (SURVEY.md §4): commit only this
        # micro-batch's winners (O(delta) bytes) and roll a full snapshot
        # every SNAPSHOT_EVERY deltas so reconstruction stays O(1) reads
        if state is None or (
            deltas_since_snapshot(self.lake_dir, part) + 1 >= self.SNAPSHOT_EVERY
        ):
            commit_partition(
                self.lake_dir, part, self.lsn_lo, self.lsn_hi, new_state, counts
            )
        else:
            commit_delta(
                self.lake_dir, part, self.lsn_lo, self.lsn_hi,
                reduced, new_state.num_rows, counts,
            )
        return self._metrics_row(part, counts, live, False)


def _write_deadletter(lake_dir: str, dead: pa.Table) -> str:
    """Write malformed frames for triage. Filename is a content hash so an
    at-least-once task retry overwrites the same file (idempotent)."""
    import hashlib

    from ..stages.validate import DEADLETTER_DIRNAME

    d = os.path.join(lake_dir, DEADLETTER_DIRNAME)
    os.makedirs(d, exist_ok=True)
    lsns = ",".join(str(x) for x in dead["lsn"].to_pylist()[:100])
    h = hashlib.blake2b(
        f"{lsns}|{dead.num_rows}".encode(), digest_size=8
    ).hexdigest()
    path = os.path.join(d, f"dl-{h}.parquet")
    tmp = path + ".tmp"
    pq.write_table(dead, tmp)
    os.replace(tmp, path)
    return path


def read_deadletter(lake_dir: str) -> pa.Table | None:
    from ..stages.validate import DEADLETTER_DIRNAME

    d = os.path.join(lake_dir, DEADLETTER_DIRNAME)
    if not os.path.isdir(d):
        return None
    files = [os.path.join(d, f) for f in sorted(os.listdir(d)) if f.endswith(".parquet")]
    if not files:
        return None
    return pa.concat_tables([pq.read_table(f) for f in files], promote_options="default")


def _chunk_lsn_ranges(files: list[str]) -> list[tuple[str, int, int]]:
    """(file, lsn_min, lsn_max) per chunk file, from parquet stats.

    TORN-TAIL tolerance: a tailing writer's newest chunk may still be
    mid-write (no parquet footer yet). Unreadable files are DEFERRED —
    dropped from this pass, picked up once complete — but only while
    every readable file stays below them lexically (chunk names embed the
    starting LSN, so a torn file that is not the lexical tail means real
    corruption mid-log and raises instead of silently skipping data)."""
    torn: list[str] = []
    out = []
    for f in files:
        try:
            md = pq.read_metadata(f)
        except Exception:
            torn.append(f)
            continue
        schema_names = md.schema.to_arrow_schema().names
        col = schema_names.index("lsn")
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(col).statistics
            if st is not None and st.has_min_max:
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
        if lo is None:  # no stats: read the column
            t = pq.read_table(f, columns=["lsn"])
            lo = pc.min(t["lsn"]).as_py()
            hi = pc.max(t["lsn"]).as_py()
        out.append((f, int(lo), int(hi)))
    if torn:
        max_readable = max((f for f, _, _ in out), default="")
        bad = [f for f in torn if f <= max_readable]
        if bad:
            raise ValueError(
                f"unreadable binlog chunk(s) below the tail: {bad[:3]} — "
                "mid-log corruption (a torn TAIL file would be deferred)"
            )
    out.sort(key=lambda x: x[1])
    # Disjoint LSN ranges per chunk file are load-bearing: resume metrics
    # count events exactly once only if a file's range never straddles a
    # committed high-water mark it wasn't part of. Overlapping ranges would
    # keep state correct (merge is idempotent) but drift commit metrics.
    for (fa, _, hia), (fb, lob, _) in zip(out, out[1:]):
        if lob <= hia:
            raise ValueError(
                f"binlog chunk LSN ranges overlap: {fa} ends at {hia}, "
                f"{fb} starts at {lob}; chunks must carry disjoint ranges"
            )
    return out


def _ingest_impl(
    binlog_path: str,
    lake_dir: str,
    num_partitions: int = 32,
    files_per_microbatch: int | None = 8,
    max_microbatches: int | None = None,
    merger_concurrency: int | tuple[int, int] | None = None,
    hot_keys: frozenset[str] | None = None,
    num_salts: int = 8,
    auto_compact: bool = True,
    compact_max_chain: int | None = None,
    compact_keep: int = 1,
    renames: dict[str, str] | None = None,
    auto_salt: bool = False,
    auto_salt_threshold: float = 0.05,
    row_filter=None,
    merge_cache_rows: int | None = None,
) -> pa.Table:
    """Tail the binlog into the lake; returns the metrics table (one row per
    partition commit across all micro-batches run).

    ``auto_salt``: when no ``hot_keys`` are supplied, run the
    deterministic whole-log hash-sample detector (``find_hot_keys``) over
    the PENDING chunk files before the first micro-batch and salt any
    conversation holding ≥ ``auto_salt_threshold`` of sampled events —
    the skew story self-arms instead of relying on the caller to know
    their hot conversations. Cost: one sampled read pass of the pending
    backlog (1/64 of rows leave the scan).

    ``renames``: legacy physical column name → canonical name, applied in
    the reconciler before the cast/extend — COLUMN-RENAME schema evolution
    for source epochs that renamed a payload column (key/envelope columns
    are never renameable).

    ``row_filter``: optional vectorized source-routing selector (Table →
    Table), fused into the reconcile pass before validation — the
    multi-table split (``ingest_split``) routes each table's sub-stream
    with it. Rows it drops belong to a sibling table's lineage; this
    lake's metrics count only routed events.

    ``auto_compact``: after the tail drains, run the distributed compaction
    pass iff a cheap footer-only check says it's needed — any partition's
    reconstruction chain longer than ``compact_max_chain`` (default: the
    merger's SNAPSHOT_EVERY) or partitions disagreeing on newest schema
    (lagging snapshots from an older engine epoch). Keeps read
    amplification and schema drift bounded without a manual pass."""
    from .cdc import list_binlog_files

    if merger_concurrency is None:
        # FIXED pool size: an autoscaling (1, N) pool ramps up far too
        # slowly for a burst of group tasks (measured: 77s → 14s on the
        # 30M-event bench just by pinning the pool)
        import ray as _ray

        try:
            cpus = int(_ray.cluster_resources().get("CPU", 8)) if _ray.is_initialized() else 8
        except Exception:
            cpus = 8
        merger_concurrency = min(16, max(1, cpus // 2))

    os.makedirs(lake_dir, exist_ok=True)
    write_lake_config(lake_dir, num_partitions)
    files = list_binlog_files(binlog_path)
    ranges = _chunk_lsn_ranges(files)

    if files_per_microbatch is None:
        # auto: scale the micro-batch to the cluster AND the backlog.
        # Per-micro-batch fixed cost is seconds, so a small cluster wants
        # ≥16 files/batch and a big backlog wants ≤~4 batches (measured at
        # 300M events/32 CPUs: 10 batches → 0.63M ev/s, 4 batches → 1.80M
        # ev/s); but ONE oversized batch overflows the object store and
        # spills (300M events in one shuffle → 0.44M ev/s). The ceiling
        # keeps a single batch at ≲100 chunk files.
        import ray as _ray

        try:
            cpus = int(_ray.cluster_resources().get("CPU", 8)) if _ray.is_initialized() else 8
        except Exception:
            cpus = 8
        backlog = len(ranges)
        files_per_microbatch = min(
            max(16, cpus, (backlog + 3) // 4), 100
        )

    # global resume point: files whose entire lsn range is committed by
    # EVERY partition can be pruned at the read. Partitions that receive
    # no events in a micro-batch get an `empty` commit (below), so after
    # the first completed micro-batch every partition has a high-water
    # mark and pruning always engages.
    hws = [committed_lsn(lake_dir, p) for p in range(num_partitions)]
    known = [h for h in hws if h is not None]
    global_hw = min(known) if len(known) == num_partitions else None

    pending = [r for r in ranges if global_hw is None or r[2] > global_hw]

    if auto_salt and hot_keys is None and pending:
        from ..stages.partition import find_hot_keys

        # one sampled pass over the pending backlog (deterministic
        # lsn-hash sample — uniform across the stream, tail-hot keys seen)
        pending_files = [r[0] for r in pending]
        hot_keys = find_hot_keys(
            ray.data.read_parquet(pending_files, columns=["conv_id", "lsn"]),
            threshold_frac=auto_salt_threshold,
        ) or None

    # micro-batch windows come from the PERSISTED plan, so a resume with a
    # different files_per_microbatch replays the exact same (lsn_lo, lsn_hi)
    # windows it first planned — the invariant commit metrics need (a window
    # straddling an old high-water mark would mix already-counted raw events
    # into reduced rows whose winner lsn clears the mark). Files beyond the
    # plan (append-only binlog tail) get new windows, persisted up front so
    # even a crash mid-first-batch pins the boundaries.
    plan = read_batch_plan(lake_dir)
    used = [False] * len(pending)
    batches: list[tuple[list, int, int]] = []
    for lo, hi in plan:
        grp = [
            r for j, r in enumerate(pending)
            if not used[j] and lo <= r[1] and r[2] <= hi
        ]
        for j, r in enumerate(pending):
            if not used[j] and lo <= r[1] and r[2] <= hi:
                used[j] = True
        if grp:
            batches.append((grp, lo, hi))
    rest = [r for j, r in enumerate(pending) if not used[j]]
    if plan and rest and rest[0][1] <= plan[-1][1]:
        raise ValueError(
            f"binlog chunk {rest[0][0]} (lsn {rest[0][1]}-{rest[0][2]}) "
            "straddles the persisted micro-batch plan; the binlog must be "
            "append-only"
        )
    new_windows: list[list[int]] = []
    for i in range(0, len(rest), files_per_microbatch):
        grp = rest[i : i + files_per_microbatch]
        lo = min(b[1] for b in grp)
        hi = max(b[2] for b in grp)
        new_windows.append([lo, hi])
        batches.append((grp, lo, hi))
    append_batch_plan(lake_dir, new_windows)

    metrics_tables: list[pa.Table] = []
    n_batches = 0
    for batch, lsn_lo, lsn_hi in batches:
        if max_microbatches is not None and n_batches >= max_microbatches:
            break
        fpaths = [b[0] for b in batch]

        by_schema: dict[str, tuple[pa.Schema, list[str]]] = {}
        for f in fpaths:
            s = pq.read_schema(f)
            by_schema.setdefault(s.to_string(), (s, []))[1].append(f)
        from ..stages.evolve import PROTECTED_COLS, rename_schema

        if renames and PROTECTED_COLS & (set(renames) | set(renames.values())):
            raise ValueError(
                f"cannot rename key/envelope columns: {sorted(PROTECTED_COLS)}"
            )
        target = unify(
            [rename_schema(s, renames) for s, _ in by_schema.values()]
            + [BINLOG_SCHEMA]
        )
        from .cdc import _read_blocks_for
        from ..context import REDUCE_BATCH_SIZE, configure_shuffle

        configure_shuffle(num_partitions)
        parts = []
        for s, group in by_schema.values():
            d = ray.data.read_parquet(
                group, override_num_blocks=_read_blocks_for(group)
            )
            rec = None if s.equals(target) else make_reconciler(target, renames)

            # reconcile + validate/dead-letter + counted partial reduce +
            # partition tag fused into ONE operator: a single object-store
            # pass per micro-batch
            def prep(t, rec=rec):
                from ..stages.validate import split_valid

                if rec is not None:
                    t = rec(t)
                if row_filter is not None:
                    # source-routing selector (multi-table split): rows
                    # dropped here belong to a DIFFERENT table's stream
                    # and appear in that table's lineage, not this one's
                    t = row_filter(t)
                valid, dead = split_valid(t)
                if dead.num_rows:
                    _write_deadletter(lake_dir, dead)
                reduced = lww_reduce_counted(valid)
                if hot_keys:
                    from ..stages.partition import add_salted_partition_column

                    return _dict_encode_cols(
                        add_salted_partition_column(
                            reduced, num_partitions, num_salts, hot_keys
                        )
                    )
                return _dict_encode_cols(
                    add_partition_column(reduced, num_partitions)
                )

            parts.append(
                d.map_batches(
                    prep, batch_format="pyarrow",
                    batch_size=REDUCE_BATCH_SIZE, num_cpus=1,
                )
            )
        ds = parts[0]
        for p in parts[1:]:
            ds = ds.union(p)

        if hot_keys:
            # salted two-phase merge (hot conversations): phase-1 reduce per
            # (part, salt) sub-shard — exact because LWW-with-counts is an
            # associative reduction — then the per-partition merge below
            from ..stages.partition import spart_to_part

            ds = ds.groupby("spart").map_groups(
                lambda t: lww_reduce_counted(t), batch_format="pyarrow"
            )
            ds = ds.map_batches(
                lambda t: spart_to_part(t, num_salts), batch_format="pyarrow"
            ).repartition(max(2, num_partitions // 4))

        metrics_ds = ds.groupby("part").map_groups(
            PartitionMerger,
            fn_constructor_args=(lake_dir, lsn_lo, lsn_hi, merge_cache_rows),
            batch_format="pyarrow",
            concurrency=merger_concurrency,
        )
        # consume exactly once (a second pass would re-run the merge actors)
        batches = list(metrics_ds.iter_batches(batch_format="pyarrow"))
        mt = pa.concat_tables(batches) if batches else METRICS_SCHEMA.empty_table()
        metrics_tables.append(mt)
        # partitions with no events this micro-batch: advance their
        # high-water mark with an empty commit so global file pruning can
        # engage (a key-hash gap must not force full re-reads forever).
        # Runs after all real commits are durable: if we die before this,
        # resume re-runs the micro-batch and committed partitions skip.
        seen_parts = set(mt["part"].to_pylist())
        for p in range(num_partitions):
            if p not in seen_parts:
                commit_empty(lake_dir, p, lsn_lo, lsn_hi)
        n_batches += 1

    if auto_compact and metrics_tables:
        from .compact import compact_lake, needs_compaction

        # compact_keep is the TIME-TRAVEL retention knob: GC keeps the
        # chain files of the newest `keep` commits, so keep=1 trims
        # history to the head while keep=N preserves N readable versions
        max_chain = compact_max_chain or PartitionMerger.SNAPSHOT_EVERY
        if needs_compaction(lake_dir, max_chain=max_chain):
            compact_lake(lake_dir, keep=compact_keep)

    if not metrics_tables:
        return METRICS_SCHEMA.empty_table()
    return pa.concat_tables(metrics_tables)


def ingest(binlog_path: str, lake_dir: str, *args, **kwargs) -> pa.Table:
    """Single-writer entry for the tail: acquires the lake's writer lock
    (``state/manifest.writer_lock`` — a second LIVE writer raises
    ConcurrentWriterError; a crashed writer's stale lock is stolen), then
    runs the ingest. See ``_ingest_impl`` for the full contract."""
    from ..state.manifest import writer_lock

    with writer_lock(lake_dir):
        return _ingest_impl(binlog_path, lake_dir, *args, **kwargs)


def read_all_metrics(lake_dir: str) -> pa.Table:
    """Lineage metrics across every commit of every partition (one row per
    non-empty commit): the durable record of what was applied — each
    source event appears in exactly one commit's counts."""
    from ..state.manifest import lineage

    parts, lsn_lo, lsn_hi, n_i, n_u, n_d, n_ev, kinds = [], [], [], [], [], [], [], []
    for p in list_partitions(lake_dir):
        for m in lineage(lake_dir, p):
            if m.get("kind") == "empty":
                continue
            c = m.get("metrics") or {}
            i, u, d = c.get("cnt_i", 0), c.get("cnt_u", 0), c.get("cnt_d", 0)
            parts.append(p)
            lsn_lo.append(m["lsn_lo"])
            lsn_hi.append(m["lsn_hi"])
            n_i.append(i)
            n_u.append(u)
            n_d.append(d)
            n_ev.append(i + u + d)
            kinds.append(m.get("kind", "snapshot"))
    return pa.table(
        {
            "part": pa.array(parts, pa.int32()),
            "lsn_lo": pa.array(lsn_lo, pa.int64()),
            "lsn_hi": pa.array(lsn_hi, pa.int64()),
            "n_events": pa.array(n_ev, pa.int64()),
            "n_inserts": pa.array(n_i, pa.int64()),
            "n_updates": pa.array(n_u, pa.int64()),
            "n_deletes": pa.array(n_d, pa.int64()),
            "kind": pa.array(kinds, pa.string()),
        }
    )


def export_lake(
    lake_dir: str, out_dir: str, num_partitions: int | None = None, fmt: str = "csv"
) -> int:
    """Export the live lake view to a directory of csv/parquet part files
    (K1/K2 analogue — the lake's ``part=<k>`` layout is already the
    reference's sharded output tree; this is the flat-file render of it).
    Returns exported row count."""
    ds = read_lake(lake_dir, num_partitions)
    n = ds.count()
    if fmt == "csv":
        ds.write_csv(out_dir)
    elif fmt == "parquet":
        ds.write_parquet(out_dir)
    else:
        raise ValueError(f"unknown export format {fmt!r}")
    return n


def export_lake_incremental(
    lake_dir: str, out_dir: str, fmt: str = "parquet"
) -> dict:
    """INCREMENTAL flat export (the resumable-output contract, K1/K2):
    re-render only partitions whose head commit advanced past the
    export's per-partition watermark — an unchanged lake exports zero
    bytes, a 1-partition delta re-renders 1 file. Output is one
    deterministic file per partition (``part-<k>.parquet``), overwritten
    atomically (temp + rename), with the watermark sidecar updated only
    after the file lands — a killed export re-renders the unfinished
    partitions and never doubles data. Returns
    {"exported": [...], "skipped": [...]}."""
    import json
    import tempfile

    state_path = os.path.join(out_dir, "_export_state.json")
    os.makedirs(out_dir, exist_ok=True)
    marks: dict[str, int] = {}
    if os.path.exists(state_path):
        with open(state_path) as f:
            marks = json.load(f)

    mapping = read_column_mapping(lake_dir)
    col_renames = mapping.get("renames", {})
    col_drops = set(mapping.get("drops", []))
    # a schema-mapping change alters every output file's logical columns:
    # invalidate all watermarks so the next export re-renders everything
    map_tag = json.dumps(mapping, sort_keys=True)
    if marks.get("_mapping") != map_tag:
        marks = {"_mapping": map_tag}

    def render(part: int, lsn_hi: int) -> None:
        from ..stages.evolve import apply_renames

        st = read_state(lake_dir, part)
        if st is None:
            from ..schema import empty_lake_table

            t = empty_lake_table()
        else:
            t = finalize(st)
        # export the LOGICAL view, like read_lake
        keep = [c for c in t.column_names if c not in col_drops]
        t = apply_renames(t.select(keep), col_renames)
        ext = {"parquet": "parquet", "jsonl": "jsonl"}.get(fmt, "csv")
        path = os.path.join(out_dir, f"part-{part}.{ext}")
        fd, tmp = tempfile.mkstemp(dir=out_dir, suffix=".tmp")
        os.close(fd)
        try:
            if fmt == "parquet":
                pq.write_table(t, tmp)
            elif fmt == "jsonl":
                # the LLM-training interchange format: one JSON object per
                # row, ISO timestamps, nulls preserved
                t.to_pandas().to_json(
                    tmp, orient="records", lines=True,
                    date_format="iso", date_unit="us",
                )
            else:
                import pyarrow.csv as pacsv

                pacsv.write_csv(t, tmp)
            os.replace(tmp, path)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)

    parts = list_partitions(lake_dir)
    todo = []
    skipped = []
    for p in parts:
        hw = committed_lsn(lake_dir, p)
        if hw is None:
            continue
        if marks.get(str(p), -1) >= hw:
            skipped.append(p)
            continue
        todo.append((p, hw))

    if todo:
        # distributed render: one task per stale partition
        ds = ray.data.from_items(
            [{"part": p, "hw": hw} for p, hw in todo]
        ).repartition(len(todo))

        def work(t: pa.Table) -> pa.Table:
            for p, hw in zip(t["part"].to_pylist(), t["hw"].to_pylist()):
                render(int(p), int(hw))
            return t

        ds.map_batches(work, batch_format="pyarrow").materialize()
        for p, hw in todo:
            marks[str(p)] = hw
        fd, tmp = tempfile.mkstemp(dir=out_dir, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(marks, f)
        os.replace(tmp, state_path)
    return {"exported": [p for p, _ in todo], "skipped": skipped}


def partitions_for_keys(lake_dir: str, conv_ids: list[str]) -> list[int] | None:
    """PARTITION PRUNING for point lookups: the lake is hash-partitioned
    by ``crc32(conv_id) % num_partitions`` (stages/partition.py), so a
    key-list predicate maps to an exact partition set — the lakehouse
    data-skipping move that turns a point lookup into O(|keys|) chain
    reads instead of O(P). Returns None (no pruning, still correct) when
    the lake predates the config sidecar and the layout is unknown."""
    import zlib

    p = lake_num_partitions(lake_dir)
    if p is None:
        return None
    return sorted({zlib.crc32(c.encode("utf-8")) % p for c in conv_ids})


_FILTER_KERNELS = {
    "==": pc.equal,
    "!=": pc.not_equal,
    "<": pc.less,
    "<=": pc.less_equal,
    ">": pc.greater,
    ">=": pc.greater_equal,
}


def _zone_value(val):
    """Normalize a filter value to the zone-map stats encoding
    (timestamps are stored as epoch-microsecond ints)."""
    import datetime

    import numpy as np

    if isinstance(val, np.datetime64):
        val = val.astype("datetime64[us]").item()
    if isinstance(val, datetime.datetime):
        return int(pa.scalar(val, pa.timestamp("us")).value)
    return val


def prune_partitions(
    lake_dir: str,
    parts: list[int],
    filters: list[tuple],
    asof_lsn: int | None = None,
) -> list[int]:
    """ZONE-MAP partition pruning: drop every partition whose chain-union
    column stats prove a conjunct can match no row of the reconstructed
    state (see manifest.chain_stats for the soundness argument). Lakes
    whose manifests predate stats keep all partitions."""
    kept = []
    for p in parts:
        zone = chain_stats(lake_dir, p, lsn_hi=asof_lsn)
        if zone is None or all(
            zone_may_match(zone, col, op, _zone_value(val))
            for col, op, val in filters
        ):
            kept.append(p)
    return kept


def plan_read(
    lake_dir: str,
    filters: list[tuple] | None = None,
    conv_ids: list[str] | None = None,
    asof_lsn: int | None = None,
) -> dict:
    """EXPLAIN for a lake read: which partitions a ``read_lake`` with
    these predicates would reconstruct vs skip, and why — observability
    for the two data-skipping layers (key-hash point pruning and
    zone-map stats pruning). Pure planning: no chain file is opened."""
    mapping = read_column_mapping(lake_dir)
    to_phys = {v: k for k, v in mapping.get("renames", {}).items()}
    all_parts = [
        p
        for p in list_partitions(lake_dir)
        if committed_lsn(lake_dir, p, asof_lsn=asof_lsn) is not None
    ]
    parts = list(all_parts)
    key_pruned = 0
    if conv_ids is not None:
        target = partitions_for_keys(lake_dir, conv_ids)
        if target is not None:
            kept = [p for p in parts if p in set(target)]
            key_pruned = len(parts) - len(kept)
            parts = kept
    zone_pruned = 0
    if filters:
        phys = [(to_phys.get(c, c), op, v) for c, op, v in filters]
        kept = prune_partitions(lake_dir, parts, phys, asof_lsn=asof_lsn)
        zone_pruned = len(parts) - len(kept)
        parts = kept
    return {
        "committed_partitions": len(all_parts),
        "pruned_by_key_hash": key_pruned,
        "pruned_by_zone_map": zone_pruned,
        "scanned_partitions": sorted(parts),
    }


def _apply_filters(t: pa.Table, filters: list[tuple]) -> pa.Table:
    """Exact conjunctive filter (vectorized; Kleene AND drops nulls)."""
    mask = None
    for col, op, val in filters:
        m = _FILTER_KERNELS[op](t[col], pa.scalar(val))
        mask = m if mask is None else pc.and_(mask, m)
    return t.filter(mask) if mask is not None else t


def read_lake(
    lake_dir: str,
    num_partitions: int | None = None,
    columns: list[str] | None = None,
    asof_lsn: int | None = None,
    conv_ids: list[str] | None = None,
    filters: list[tuple] | None = None,
    asof_tag: str | None = None,
) -> ray.data.Dataset:
    """The live view of the lake: latest committed state per partition
    (nearest snapshot + LWW-merged deltas), tombstones dropped, key-sorted
    within partition.

    Partitions are DISCOVERED from the manifest tree (never trusted from a
    caller-supplied count — a smaller count must not silently drop data;
    ``num_partitions`` is accepted for API compatibility and ignored).

    ``columns`` prunes payload columns AT THE READ (parquet column
    projection — a 2-column consumer must not page the full text column
    off storage); key + envelope columns needed to resolve the LWW chain
    and drop tombstones are always read and stripped from the output
    unless requested.

    ``asof_lsn`` is TIME TRAVEL: reconstruct each partition at its newest
    commit with ``lsn_hi <= asof_lsn`` instead of the head commit. The
    manifests are an immutable commit log; historical commit points stay
    readable as long as their chain files survive GC — note that
    compaction (including ``ingest(auto_compact=True)``, the default,
    when its chain/schema trigger fires) runs
    ``gc_superseded_states(keep=1)``, which trims history to the head;
    raise ``keep`` / disable auto_compact for longer retention. Semantics are commit-granular (like table-format version
    reads): an LSN inside a micro-batch window resolves to the commit
    BELOW it, because a delta file holds only the window's reduced LWW
    winners — the runner-up events inside a window are not recoverable
    from the lake (replay the binlog for sub-commit resolution).
    Partitions with no commit at-or-below ``asof_lsn`` contribute no rows.

    ``conv_ids`` is a POINT-LOOKUP predicate: only the partitions that
    can hold those keys (``partitions_for_keys``) are reconstructed, and
    rows are filtered to the key list — a 3-conversation lookup against
    a 4096-partition lake touches ≤3 chains, not 4096.

    ``filters`` is a conjunctive list of ``(column, op, value)``
    predicates (ops ``== != < <= > >=``) with ZONE-MAP data skipping:
    partitions whose per-commit chain-union column stats (written into
    every manifest at commit time, Delta-log style) prove the conjunct
    empty are never reconstructed; surviving partitions apply the exact
    vectorized filter after LWW finalize. Values may be Python
    scalars / datetimes (timestamps compare exactly).

    The lake's persisted COLUMN MAPPING (``evolve_lake_schema`` —
    rename/drop evolution, metadata-only, Delta-column-mapping style)
    applies here: ``columns`` and ``filters`` take LOGICAL names; dropped
    columns never appear; renamed physical data reads under its logical
    name. Zone-map pruning translates logical → physical to match the
    stats written at commit time.
    """
    if asof_tag is not None:
        from ..state.manifest import resolve_tag

        if asof_lsn is not None:
            raise ValueError("pass asof_lsn or asof_tag, not both")
        asof_lsn = resolve_tag(lake_dir, asof_tag)

    mapping = read_column_mapping(lake_dir)
    col_renames: dict[str, str] = mapping.get("renames", {})
    col_drops = set(mapping.get("drops", []))
    to_phys = {v: k for k, v in col_renames.items()}  # logical → physical

    parts = [
        p
        for p in list_partitions(lake_dir)
        if committed_lsn(lake_dir, p, asof_lsn=asof_lsn) is not None
    ]
    key_set: pa.Array | None = None
    if conv_ids is not None:
        key_set = pa.array(sorted(set(conv_ids)), pa.string())
        target = partitions_for_keys(lake_dir, conv_ids)
        if target is not None:
            parts = [p for p in parts if p in set(target)]
    if filters:
        phys_filters = [(to_phys.get(c, c), op, v) for c, op, v in filters]
        parts = prune_partitions(
            lake_dir, parts, phys_filters, asof_lsn=asof_lsn
        )

    def _to_logical(t: pa.Table) -> pa.Table:
        from ..stages.evolve import apply_renames

        keep = [c for c in t.column_names if c not in col_drops]
        if len(keep) != len(t.column_names):
            t = t.select(keep)
        return apply_renames(t, col_renames)

    if not parts:
        from ..schema import empty_lake_table

        t = _to_logical(empty_lake_table())
        return ray.data.from_arrow(t.select(columns) if columns else t)

    read_cols = None
    if columns is not None:
        need = {"op", "conv_id", "turn_idx", "ts", "lsn"}
        if filters:
            need |= {col for col, _, _ in filters}
        read_cols = sorted({to_phys.get(c, c) for c in need | set(columns)})

    # one reconstruction task per partition (each reads its own chain —
    # embarrassingly parallel, no shuffle)
    ds = ray.data.from_items([{"part": p} for p in parts]).repartition(len(parts))

    def load(t: pa.Table) -> pa.Table:
        out = []
        for p in t["part"].to_pylist():
            st = read_state(lake_dir, int(p), lsn_hi=asof_lsn, columns=read_cols)
            if st is None or st.num_rows == 0:
                continue
            # mapping applies to the finalized view (finalize projects the
            # canonical physical payload; rename/drop are read-time moves)
            v = _to_logical(finalize(st))
            if key_set is not None:
                v = v.filter(pc.is_in(v["conv_id"], value_set=key_set))
            if filters:
                v = _apply_filters(v, filters)
            out.append(v.select(columns) if columns is not None else v)
        if not out:
            from ..schema import empty_lake_table

            e = _to_logical(empty_lake_table())
            return e.select(columns) if columns is not None else e
        return pa.concat_tables(out, promote_options="default")

    return ds.map_batches(load, batch_format="pyarrow")


def lake_changes(
    lake_dir: str, from_lsn: int, to_lsn: int, include_old: bool = False
) -> ray.data.Dataset:
    """CHANGEFEED out of the lake: the net row changes between two commit
    points — every key whose LWW winner at ``to_lsn`` differs from its
    winner at ``from_lsn``, tagged ``change_op``:

    - ``I``: live at ``to`` and absent-or-deleted at ``from``;
    - ``U``: live at both with a different winning event;
    - ``D``: deleted at ``to`` and live at ``from`` (row carries the
      delete event's envelope).

    Snapshot-diff semantics (like a table format's net change-data-feed
    between versions): a key updated five times inside the window emits
    ONE row — its final winner. Works from the manifest chain alone,
    commit-kind-agnostic (snapshot roll commits don't isolate their
    window's delta, so a file-level feed would be wrong; the state diff
    is always exact). Per partition, BOTH chain walks run in the same
    task — co-located, no shuffle — and the diff is one vectorized join
    on the key. ``from_lsn``/``to_lsn`` resolve commit-granular, exactly
    as ``read_lake(asof_lsn=...)`` does.

    ``include_old=True`` additionally carries the FROM-state winner's
    payload as ``old_role``/``old_text``/``old_tool``/``old_ts`` (null
    for inserts) — what an incremental view maintainer needs to retract
    the superseded row's contribution before adding the new one."""
    from ..context import configure_shuffle as _cfg
    _cfg(32)  # BEFORE dataset creation: plans freeze the DataContext
    if from_lsn > to_lsn:
        raise ValueError(
            f"lake_changes requires from_lsn <= to_lsn (got {from_lsn} > {to_lsn})"
        )
    parts = [
        p
        for p in list_partitions(lake_dir)
        if committed_lsn(lake_dir, p, asof_lsn=to_lsn) is not None
    ]
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
    if include_old:
        cols_spec.update(
            {
                "old_role": pa.string(),
                "old_text": pa.string(),
                "old_tool": pa.string(),
                "old_ts": pa.timestamp("us"),
            }
        )
    empty = pa.table({k: pa.array([], v) for k, v in cols_spec.items()})
    if not parts:
        return ray.data.from_arrow(empty)

    def diff(t: pa.Table) -> pa.Table:
        out = []
        for p in t["part"].to_pylist():
            b = read_state(lake_dir, int(p), lsn_hi=to_lsn)
            if b is None or b.num_rows == 0:
                continue
            a = read_state(lake_dir, int(p), lsn_hi=from_lsn)
            # decode any dictionary-encoded key column before the join
            if pa.types.is_dictionary(b.schema.field("conv_id").type):
                b = b.set_column(
                    b.schema.get_field_index("conv_id"),
                    "conv_id",
                    b["conv_id"].cast(pa.string()),
                )
            old_payload = ("role", "text", "tool", "ts")
            if a is not None and a.num_rows:
                acols = {
                    "conv_id": a["conv_id"].cast(pa.string()),
                    "turn_idx": a["turn_idx"],
                    "a_lsn": a["lsn"].cast(pa.int64()),
                    "a_op": a["op"].cast(pa.string()),
                }
                if include_old:
                    for name in old_payload:
                        acols[f"old_{name}"] = (
                            a[name].cast(cols_spec[f"old_{name}"])
                            if name in a.column_names
                            else pa.nulls(a.num_rows, cols_spec[f"old_{name}"])
                        )
                j = b.join(
                    pa.table(acols),
                    keys=["conv_id", "turn_idx"],
                    join_type="left outer",
                )
            else:
                j = b.append_column(
                    "a_lsn", pa.nulls(b.num_rows, pa.int64())
                ).append_column("a_op", pa.nulls(b.num_rows, pa.string()))
                if include_old:
                    for name in old_payload:
                        j = j.append_column(
                            f"old_{name}",
                            pa.nulls(b.num_rows, cols_spec[f"old_{name}"]),
                        )
            b_lsn = j["lsn"].cast(pa.int64())
            a_lsn = j["a_lsn"]
            b_live = pc.not_equal(j["op"], "D")
            a_live = pc.and_kleene(
                pc.is_valid(a_lsn), pc.not_equal(j["a_op"], "D")
            )
            a_live = pc.fill_null(a_live, False)
            changed = pc.fill_null(pc.not_equal(a_lsn, b_lsn), True)
            emit = pc.and_(changed, pc.or_(b_live, a_live))
            j = j.filter(emit)
            if j.num_rows == 0:
                continue
            b_live = pc.not_equal(j["op"], "D")
            a_live = pc.fill_null(
                pc.and_kleene(
                    pc.is_valid(j["a_lsn"]), pc.not_equal(j["a_op"], "D")
                ),
                False,
            )
            change_op = pc.if_else(
                pc.invert(b_live),
                pa.scalar("D"),
                pc.if_else(a_live, pa.scalar("U"), pa.scalar("I")),
            )
            cols = {"change_op": change_op}
            for name in ("conv_id", "turn_idx", "role", "text", "tool", "ts"):
                cols[name] = (
                    j[name]
                    if name in j.column_names
                    else pa.nulls(j.num_rows, empty.schema.field(name).type)
                )
            cols["lsn"] = j["lsn"].cast(pa.int64())
            if include_old:
                # old_* is the retracted LIVE row only — null when the
                # from-state winner was a tombstone (nothing to retract)
                for name in old_payload:
                    col = j[f"old_{name}"]
                    if isinstance(col, pa.ChunkedArray):
                        col = col.combine_chunks()
                    cols[f"old_{name}"] = pc.if_else(
                        a_live, col, pa.scalar(None, cols_spec[f"old_{name}"])
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


def ingest_follow(
    binlog_path: str,
    lake_dir: str,
    num_partitions: int = 32,
    poll_secs: float = 2.0,
    max_idle_polls: int = 3,
    **ingest_kwargs,
) -> pa.Table:
    """FOLLOW-MODE ingest (the tail -f deployment shape): poll the binlog
    directory and run an exactly-once ``ingest`` pass whenever new chunk
    files appear past the lake's committed high-water mark; stop after
    ``max_idle_polls`` consecutive empty polls. Every pass is the normal
    resumable ingest, so kill/restart anywhere keeps state and metrics
    exact; an already-caught-up pass is a cheap no-op (file-level LSN
    pruning skips everything). Returns the concatenated metrics of all
    passes."""
    import time

    from .cdc import list_binlog_files

    out: list[pa.Table] = []
    idle = 0
    seen_hw = -1
    while idle < max_idle_polls:
        files = list_binlog_files(binlog_path)
        ranges = _chunk_lsn_ranges(files) if files else []
        max_lsn = max((r[2] for r in ranges), default=-1)
        if max_lsn > seen_hw:
            m = ingest(
                binlog_path, lake_dir, num_partitions=num_partitions,
                **ingest_kwargs,
            )
            if m.num_rows:
                out.append(m)
            seen_hw = max_lsn
            idle = 0
        else:
            idle += 1
            time.sleep(poll_secs)
    if not out:
        return METRICS_SCHEMA.empty_table()
    return pa.concat_tables(out, promote_options="default")


def ingest_split(
    binlog_path: str,
    out_root: str,
    groups: dict[str, tuple[str, ...]],
    split_col: str = "role",
    **kwargs,
) -> dict[str, pa.Table]:
    """MULTI-TABLE routed ingest: one binlog tail fans out into one lake
    table per group (e.g. dialog vs system turns), each applying LWW over
    ONLY its routed events. Cross-table consistency is transactional BY
    REPLAY, not by a global lock: every per-table ingest is exactly-once
    idempotent over shared lsn windows, so a crash that lands between
    table A's commit and table B's commit of the same window heals on the
    next ``ingest_split`` run — A skips the committed window, B applies
    it, and the pair converges to the same state as an uninterrupted run
    (tests/test_ingest_exactly_once.py::test_split_* prove both orders).
    Routing is a vectorized membership filter fused into each table's
    reconcile pass; non-delete events never route to two groups (groups
    must be disjoint). DELETES BROADCAST TO EVERY GROUP: a CDC delete
    often can't carry the routing attribute (upstream emits key + op
    only — this generator's deletes have a null role), and the tombstone
    must land wherever its key lives; a delete for a key the table never
    held is a semantic no-op under LWW."""
    import pyarrow.compute as pc

    seen: set[str] = set()
    for name, vals in groups.items():
        dup = seen & set(vals)
        if dup:
            raise ValueError(f"group values routed twice: {sorted(dup)}")
        seen |= set(vals)

    metrics: dict[str, pa.Table] = {}
    for name, vals in groups.items():
        metrics[name] = ingest(
            binlog_path,
            os.path.join(out_root, name),
            row_filter=make_route_filter(vals, split_col),
            **kwargs,
        )
    return metrics


def make_route_filter(vals: tuple[str, ...], split_col: str = "role"):
    """Routing predicate for one split table: group membership on
    ``split_col`` OR a delete (tombstones broadcast — see ingest_split).
    Defined at module level so the closure pickles into Ray workers."""
    value_set = pa.array(list(vals), pa.string())

    def route(t: pa.Table) -> pa.Table:
        keep = pc.or_kleene(
            pc.is_in(t[split_col], value_set=value_set),
            pc.equal(t["op"], "D"),
        )
        return t.filter(pc.fill_null(keep, False))

    return route


def read_split(out_root: str, groups: list[str]) -> "ray.data.Dataset":
    """Read a multi-table split lake back as ONE tagged relation
    (table_name + lake columns) — the cross-table audit view."""
    parts = []
    for name in groups:
        ds = read_lake(os.path.join(out_root, name))

        def tag(t: pa.Table, _n=name) -> pa.Table:
            col = pa.array([_n] * t.num_rows, pa.string())
            return t.add_column(0, "table_name", col)

        parts.append(ds.map_batches(tag, batch_format="pyarrow"))
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out
