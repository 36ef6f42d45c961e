"""Stream-shaped operators over the ordered ``events`` log.

Ray Data has no event-time window primitives (SURVEY.md §2.9); these
express the shapes the engine needs:

- tumbling windows: a derived window-start column + groupby — embarrassingly
  parallel, the window column IS the shuffle key;
- session windows / as-of join / range join: ONE hash repartition
  co-locating each user, then a per-BLOCK kernel vectorized ACROSS users
  (segment arithmetic over the (user, ts)-sorted block — numpy cummax /
  searchsorted / reduceat). No per-user Python: a block with 10k users
  costs one function call, not 10k (the per-group ``map_groups`` variant
  pays ~ms of interpreter per user and dies at 100× user counts).

Partitioning assumption (documented per the north-star custom-operator
rule): one user's events fit in one block. True for per-user event
streams; a pathological single-user firehose would need time-sharded
pre-aggregation plus a stitch pass.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..functions.num import sql_round


def tumbling_counts(sf_dir: str, minutes: int = 60) -> ray.data.Dataset:
    """Events per (event_type, window): window = ts floored to the hour
    (or ``minutes``)."""
    from ray.data.aggregate import Count, Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )
    us = minutes * 60 * 1_000_000

    def add_window(t: pa.Table) -> pa.Table:
        ts = t["ts"].cast(pa.int64())
        w = pc.multiply(pc.divide(ts, pa.scalar(us, pa.int64())), pa.scalar(us, pa.int64()))
        return t.append_column("w", w.cast(pa.timestamp("us")))

    agg = (
        ds.map_batches(add_window, batch_format="pyarrow")
        .groupby(["event_type", "w"])
        .aggregate(Count(alias_name="n"), Sum("value", alias_name="sum_value"))
    )
    return agg.map_batches(
        lambda t: t.set_column(
            t.column_names.index("sum_value"),
            "sum_value",
            sql_round(t["sum_value"], 2),
        ),
        batch_format="pyarrow",
    )


def hopping_counts(
    sf_dir: str, window_minutes: int = 60, hop_minutes: int = 15
) -> ray.data.Dataset:
    """HOPPING (overlapping) windows: each event belongs to
    window/hop windows; a vectorized flat-map emits one row per covering
    window start, then the window column is the shuffle key (the 1→N
    flat-map pattern of T16 applied to event-time windowing)."""
    from ray.data.aggregate import Count

    assert window_minutes % hop_minutes == 0
    k = window_minutes // hop_minutes
    hop_us = hop_minutes * 60 * 1_000_000

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
    )

    def explode_windows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    "w": pa.array([], pa.timestamp("us")),
                }
            )
        ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        base = (ts // hop_us) * hop_us  # newest covering window start
        starts = base[:, None] - (np.arange(k) * hop_us)[None, :]  # (n, k)
        et = t["event_type"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_type": pa.array(np.repeat(et, k)),
                "w": pa.array(starts.reshape(-1)).cast(pa.timestamp("us")),
            }
        )

    return (
        ds.map_batches(explode_windows, batch_format="pyarrow")
        .groupby(["event_type", "w"])
        .aggregate(Count(alias_name="n"))
    )


def _by_user(ds: ray.data.Dataset) -> ray.data.Dataset:
    """ONE hash shuffle co-locating each user's events in one block."""
    from ..context import configure_shuffle, join_partitions

    configure_shuffle(32)
    return ds.repartition(join_partitions(64), keys=["user_id"])


def _sorted_block(t: pa.Table, cols: list[str]):
    """Block sorted by (user_id, ts, event_id) → numpy views + user
    segment codes/starts. Vectorized across all users in the block."""
    df = t.select(cols).to_pandas()
    df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    user = df["user_id"].to_numpy()
    seg = np.zeros(len(df), dtype=np.int64)
    if len(df):
        seg[1:] = np.cumsum(user[1:] != user[:-1])
    return df, seg


_TS_UNIT = "datetime64[us]"


def asof_join_events(
    sf_dir: str, left_type: str = "purchase", right_type: str = "click"
) -> ray.data.Dataset:
    """As-of join within the events log: for every ``left_type`` event,
    attach the user's most recent ``right_type`` event at-or-before its
    ts (backward as-of, ts-inclusive). Vectorized across users: rows are
    sorted (user, ts, right-before-left-on-ties) and a single segmented
    running max yields the answer for every left row at once."""
    from ..context import configure_shuffle as _cfg
    _cfg(32)  # BEFORE dataset creation: plans freeze the DataContext
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "event_type", "ts"]
    )

    def per_block(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "event_id": pa.array([], pa.int64()),
                "user_id": pa.array([], pa.int64()),
                "ts": pa.array([], pa.timestamp("us")),
                "last_right_ts": pa.array([], pa.timestamp("us")),
            }
        )
        if t.num_rows == 0:
            return empty
        df = t.to_pandas()
        is_left = (df["event_type"] == left_type).to_numpy()
        is_right = (df["event_type"] == right_type).to_numpy()
        df = df.assign(_l=is_left, _r=is_right)
        # right rows sort BEFORE left rows at equal ts ⇒ the running max
        # below includes exact-ts matches (merge_asof allow_exact_matches)
        df = df.sort_values(
            ["user_id", "ts", "_l", "event_id"], kind="mergesort"
        )
        user = df["user_id"].to_numpy()
        seg = np.zeros(len(df), dtype=np.int64)
        seg[1:] = np.cumsum(user[1:] != user[:-1])
        ts = df["ts"].to_numpy().astype(_TS_UNIT).view(np.int64)
        off = ts - ts.min() + 1  # ≥ 1
        K = off.max() + 2
        right_mask = df["_r"].to_numpy()
        vcomb = seg * K + np.where(right_mask, off, 0)
        run = np.maximum.accumulate(vcomb)
        last_off = run - seg * K  # 0 ⇒ no right event yet in this segment
        left_mask = df["_l"].to_numpy()
        lo = last_off[left_mask]
        # int64 min IS NaT in datetime64 — rows with no prior right event
        last_ts = np.where(
            lo > 0, lo - 1 + ts.min(), np.int64(np.iinfo(np.int64).min)
        )
        out = pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy()[left_mask],
                "user_id": user[left_mask],
                "ts": ts[left_mask].view(_TS_UNIT),
                "last_right_ts": last_ts.view(_TS_UNIT),
            }
        )
        return pa.Table.from_pandas(out, preserve_index=False).cast(empty.schema)

    return _by_user(ds).map_batches(
        per_block, batch_format="pyarrow", batch_size=None
    )


def range_join_trailing_count(
    sf_dir: str, anchor_type: str = "error", window_minutes: int = 5
) -> ray.data.Dataset:
    """Range join within the events log: for every ``anchor_type`` event,
    count the user's events with ts in [anchor_ts - window, anchor_ts]
    (inclusive both ends — mirrored in the oracle). Vectorized across
    users: one searchsorted over composite (segment, ts) keys answers
    every anchor in the block at once."""
    from ..context import configure_shuffle as _cfg
    _cfg(32)  # BEFORE dataset creation: plans freeze the DataContext
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "event_type", "ts"]
    )
    w_us = np.int64(window_minutes * 60 * 1_000_000)

    def per_block(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "event_id": pa.array([], pa.int64()),
                "user_id": pa.array([], pa.int64()),
                "ts": pa.array([], pa.timestamp("us")),
                "n_in_window": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        df, seg = _sorted_block(t, ["event_id", "user_id", "event_type", "ts"])
        ts = df["ts"].to_numpy().astype(_TS_UNIT).view(np.int64)
        off = (ts - ts.min()).astype(np.int64)
        K = off.max() + w_us + 2
        comb = seg * K + off
        anchor = (df["event_type"] == anchor_type).to_numpy()
        a_comb = comb[anchor]
        lo = np.searchsorted(comb, a_comb - w_us, side="left")
        hi = np.searchsorted(comb, a_comb, side="right")
        out = pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy()[anchor],
                "user_id": df["user_id"].to_numpy()[anchor],
                "ts": ts[anchor].view(_TS_UNIT),
                "n_in_window": (hi - lo).astype("int64"),
            }
        )
        return pa.Table.from_pandas(out, preserve_index=False).cast(empty.schema)

    return _by_user(ds).map_batches(
        per_block, batch_format="pyarrow", batch_size=None
    )


def sessionize(sf_dir: str, gap_minutes: int = 30) -> ray.data.Dataset:
    """Session windows per user: a new session starts when the gap from the
    previous event exceeds ``gap_minutes``. Output: one row per session
    (user_id, session_id, n_events, t_start, t_end). Vectorized across
    users: gap breaks + segment-relative cumsum + reduceat aggregation."""
    from ..context import configure_shuffle as _cfg
    _cfg(32)  # BEFORE dataset creation: plans freeze the DataContext
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )
    gap_us = np.int64(gap_minutes * 60 * 1_000_000)

    def per_block(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "session_id": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
                "t_start": pa.array([], pa.timestamp("us")),
                "t_end": pa.array([], pa.timestamp("us")),
            }
        )
        if t.num_rows == 0:
            return empty
        df, seg = _sorted_block(t, ["event_id", "user_id", "ts"])
        ts = df["ts"].to_numpy().astype(_TS_UNIT).view(np.int64)
        n = len(df)
        brk = np.ones(n, dtype=np.int64)  # first row of each user breaks
        if n > 1:
            same_user = seg[1:] == seg[:-1]
            brk[1:] = np.where(
                same_user & (ts[1:] - ts[:-1] <= gap_us), 0, 1
            )
        sess_global = np.cumsum(brk)
        # session_id restarts at 1 per user: subtract the user's base
        seg_starts = np.zeros(n, dtype=bool)
        seg_starts[0] = True
        seg_starts[1:] = seg[1:] != seg[:-1]
        base = np.repeat(sess_global[seg_starts] - 1, np.diff(np.append(np.flatnonzero(seg_starts), n)))
        sess = sess_global - base
        # one output row per (user, session): reduceat over session runs
        s_starts = np.flatnonzero(brk)
        s_lens = np.diff(np.append(s_starts, n))
        out = pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy()[s_starts],
                "session_id": sess[s_starts],
                "n_events": s_lens.astype("int64"),
                "t_start": ts[s_starts].view(_TS_UNIT),
                "t_end": np.maximum.reduceat(ts, s_starts).view(_TS_UNIT),
            }
        )
        return pa.Table.from_pandas(out, preserve_index=False).cast(empty.schema)

    return _by_user(ds).map_batches(
        per_block, batch_format="pyarrow", batch_size=None
    )


def watermark_tumbling(
    ds: ray.data.Dataset,
    order_col: str = "event_id",
    ts_col: str = "ts",
    minutes: int = 60,
    lateness_minutes: int = 10,
    n_buckets: int = 256,
) -> ray.data.Dataset:
    """Tumbling-window rollup WITH WATERMARK late-event handling — the
    out-of-order-stream semantics a CDC/event pipeline needs: processing
    order is ``order_col`` (the log/arrival order); the watermark after event i is
    ``max(ts[0..i]) − lateness``; an event whose ts is behind the
    watermark is dropped as late and counted, not aggregated.

    The running max over a 10^10-event log is a classic scan: phase 1
    computes per-range-bucket ts maxima as per-batch partials (driver
    state = ``n_buckets`` scalars, fixed at any scale — the shard_pack
    two-phase-prefix pattern); phase 2 repartitions by bucket and, per
    co-located block, seeds each bucket's numpy cummax with the exclusive
    prefix max of all earlier buckets, flags late events, and reduces to
    per-window partial counts. One keyed shuffle of (event_id, ts)-slim
    rows; the final window groupby is window-cardinality small.

    Emits (w, n_on_time, n_late) with w the window start timestamp.
    """
    from ray.data.aggregate import Sum

    from ..context import configure_shuffle, join_partitions

    configure_shuffle(32)
    max_id = int(ds.max(order_col))
    c = max_id // n_buckets + 1
    win_us = minutes * 60 * 1_000_000
    late_us = lateness_minutes * 60 * 1_000_000

    def bucket_partials(t: pa.Table) -> pa.Table:
        ids = t[order_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = t[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        b = ids // c
        order = np.argsort(b, kind="stable")
        sb = b[order]
        change = np.empty(len(sb), dtype=bool)
        change[0] = True
        change[1:] = sb[1:] != sb[:-1]
        starts = np.flatnonzero(change)
        return pa.table(
            {
                "bucket": pa.array(sb[starts]),
                "mx": pa.array(np.maximum.reduceat(ts[order], starts)),
            }
        )

    # tiny relation: ≤ n_buckets rows per input batch → combine on driver
    bmax = np.full(n_buckets + 1, np.iinfo(np.int64).min, dtype=np.int64)
    for part in ds.map_batches(bucket_partials, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        bb = part["bucket"].to_numpy(zero_copy_only=False)
        mm = part["mx"].to_numpy(zero_copy_only=False)
        np.maximum.at(bmax, bb, mm)
    # exclusive prefix max: the watermark carried INTO each bucket
    prefix = np.full(n_buckets + 1, np.iinfo(np.int64).min, dtype=np.int64)
    np.maximum.accumulate(bmax[:-1], out=prefix[1:])

    def add_bucket(t: pa.Table) -> pa.Table:
        ids = t[order_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("bucket", pa.array(ids // c))

    def late_partials(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "w": pa.array([], pa.int64()),
                    "n_on_time": pa.array([], pa.int64()),
                    "n_late": pa.array([], pa.int64()),
                }
            )
        b = t["bucket"].to_numpy(zero_copy_only=False)
        ids = t[order_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = t[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, b))
        b, ids, ts = b[order], ids[order], ts[order]
        rmax = np.empty(len(ts), dtype=np.int64)
        change = np.empty(len(b), dtype=bool)
        change[0] = True
        change[1:] = b[1:] != b[:-1]
        runs = np.flatnonzero(change)
        ends = np.append(runs[1:], len(b))
        for s, e in zip(runs, ends):  # ≤ n_buckets runs per block
            np.maximum.accumulate(ts[s:e], out=rmax[s:e])
            np.maximum(rmax[s:e], prefix[b[s]], out=rmax[s:e])
        late = ts < rmax - late_us
        w = (ts // win_us) * win_us
        key_order = np.argsort(w, kind="stable")
        sw = w[key_order]
        kc = np.empty(len(sw), dtype=bool)
        kc[0] = True
        kc[1:] = sw[1:] != sw[:-1]
        starts = np.flatnonzero(kc)
        n = np.diff(np.append(starts, len(sw))).astype(np.int64)
        nl = np.add.reduceat(late[key_order].astype(np.int64), starts)
        return pa.table(
            {
                "w": pa.array(sw[starts]),
                "n_on_time": pa.array(n - nl),
                "n_late": pa.array(nl),
            }
        )

    agg = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .repartition(join_partitions(32), keys=["bucket"])
        .map_batches(late_partials, batch_format="pyarrow", batch_size=None)
        .groupby("w")
        .aggregate(Sum("n_on_time", alias_name="n_on_time"), Sum("n_late", alias_name="n_late"))
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "w": t["w"].cast(pa.timestamp("us")),
                "n_on_time": t["n_on_time"].cast(pa.int64()),
                "n_late": t["n_late"].cast(pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def funnel(
    sf_dir: str,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    within_minutes: int = 120,
    n_parts: int = 32,
) -> ray.data.Dataset:
    """CONVERSION FUNNEL over the event stream: for each user, step k is
    reached iff a ``steps[k]`` event exists strictly after the user's
    step-k−1 time and within ``within_minutes`` of it (step times are the
    EARLIEST qualifying events — the standard first-touch funnel).
    Emits (step, event_type, n_users) — one row per funnel stage.

    Shape: ONE keyed repartition on user_id, then the per-step "min ts
    after previous step" selection runs vectorized ACROSS users per block
    (masked minimum.reduceat over user segments, one pass per step —
    steps are few and fixed); only per-block stage counts shuffle to the
    final tiny sum."""
    import numpy as np

    from ..context import configure_shuffle, join_partitions
    from ..functions.dedup import grouped_reduce

    configure_shuffle(32)
    within_us = within_minutes * 60 * 1_000_000

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "ts"]
    )

    INF = np.int64(2**62)

    def stage_counts(t: pa.Table) -> pa.Table:
        schema = pa.schema(
            [pa.field("step", pa.int64()), pa.field("cnt", pa.int64())]
        )
        if t.num_rows == 0:
            return schema.empty_table()
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        et = t["event_type"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ts, u))
        us_, ts_, et_ = u[order], ts[order], et[order]
        change = np.empty(len(us_), dtype=bool)
        change[0] = True
        change[1:] = us_[1:] != us_[:-1]
        seg = np.cumsum(change) - 1  # user segment id per row
        nseg = seg[-1] + 1
        starts = np.flatnonzero(change)
        prev_t = np.full(nseg, -INF, dtype=np.int64)  # step-0 gate: any ts
        counts = []
        for k, step_name in enumerate(steps):
            gate_lo = prev_t[seg]
            gate_hi = (
                np.full(len(seg), INF, dtype=np.int64)
                if k == 0
                else np.minimum(gate_lo + within_us, INF)
            )
            ok = (et_ == step_name) & (ts_ > gate_lo) & (ts_ <= gate_hi)
            masked = np.where(ok, ts_, INF)
            t_k = np.minimum.reduceat(masked, starts)
            t_k = np.where(t_k < INF, t_k, INF)
            counts.append(int((t_k < INF).sum()))
            prev_t = t_k
        return pa.table(
            {
                "step": pa.array(np.arange(1, len(steps) + 1, dtype=np.int64)),
                "cnt": pa.array(np.array(counts, dtype=np.int64)),
            },
            schema=schema,
        )

    per_block = ds.repartition(
        join_partitions(n_parts), keys=["user_id"]
    ).map_batches(stage_counts, batch_format="pyarrow", batch_size=None)
    total = grouped_reduce(per_block, ["step"], 4, val_col="cnt", out_col="n_users")

    names = list(steps)

    def label(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "step": pa.array([], pa.int64()),
                    "event_type": pa.array([], pa.string()),
                    "n_users": pa.array([], pa.int64()),
                }
            )
        st = t["step"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "step": t["step"],
                "event_type": pa.array([names[s - 1] for s in st], pa.string()),
                "n_users": t["n_users"],
            }
        )

    return total.map_batches(label, batch_format="pyarrow")


def retention_cohorts(
    sf_dir: str,
    minutes: int = 24 * 60,
    max_offset: int = 7,
    n_parts: int = 32,
) -> ray.data.Dataset:
    """COHORT RETENTION over the event stream: users are cohorted by the
    window (default: day) of their FIRST event; cell (cohort, k) counts
    how many of that cohort were active again k windows later. Emits
    (cohort timestamp, k, n_users) for 0 <= k <= max_offset (k=0 is the
    cohort size).

    Shape: ONE keyed repartition on user_id co-locates each user's
    history; the block kernel derives (first-window, offset) pairs
    vectorized across users (segment-min + unique-pair dedup) and emits
    pre-aggregated cell counts; a tiny keyed sum finishes. The user
    dimension never leaves its partition."""
    import numpy as np

    from ..context import configure_shuffle, join_partitions
    from ..functions.dedup import grouped_reduce

    configure_shuffle(32)
    us = minutes * 60 * 1_000_000

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )

    def cells(t: pa.Table) -> pa.Table:
        schema = pa.schema(
            [
                pa.field("cohort", pa.int64()),
                pa.field("k", pa.int64()),
                pa.field("cnt", pa.int64()),
            ]
        )
        if t.num_rows == 0:
            return schema.empty_table()
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = (t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False) // us) * us
        order = np.lexsort((w, u))
        us_, ws_ = u[order], w[order]
        change = np.empty(len(us_), dtype=bool)
        change[0] = True
        change[1:] = us_[1:] != us_[:-1]
        starts = np.flatnonzero(change)
        seg = np.cumsum(change) - 1
        first_w = ws_[starts][seg]  # user's cohort window, per row
        k = (ws_ - first_w) // us
        keep = k <= max_offset
        # distinct (cohort, k) per user → one contribution per cell
        key = seg[keep] * (max_offset + 1) + k[keep]
        pairs = np.unique(
            np.stack([first_w[keep], key], axis=1), axis=0
        )
        cohort = pairs[:, 0]
        kk = pairs[:, 1] % (max_offset + 1)
        cell = cohort * (max_offset + 1) + kk
        cu, cc = np.unique(cell, return_counts=True)
        return pa.table(
            {
                "cohort": pa.array(cu // (max_offset + 1)),
                "k": pa.array(cu % (max_offset + 1)),
                "cnt": pa.array(cc.astype(np.int64)),
            },
            schema=schema,
        )

    per_block = ds.repartition(
        join_partitions(n_parts), keys=["user_id"]
    ).map_batches(cells, batch_format="pyarrow", batch_size=None)
    total = grouped_reduce(
        per_block, ["cohort", "k"], 4, val_col="cnt", out_col="n_users"
    )

    def to_ts(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "cohort": pa.array([], pa.timestamp("us")),
                    "k": pa.array([], pa.int64()),
                    "n_users": pa.array([], pa.int64()),
                }
            )
        import numpy as np

        c = t["cohort"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        return pa.table(
            {"cohort": pa.array(c), "k": t["k"], "n_users": t["n_users"]}
        )

    return total.map_batches(to_ts, batch_format="pyarrow")


def lag_features(sf_dir: str, n_parts: int = 32) -> ray.data.Dataset:
    """Per-user LAG/LEAD window features over the event stream: for every
    event, the previous event's value (lag), the delta against it, and
    the next event's type (lead) under (ts, event_id) ordering — the
    feature-engineering shape every sequence model ingests. ONE keyed
    repartition on user_id, then shifted-neighbor arithmetic vectorized
    ACROSS users per block (no window shuffle, no per-user Python).
    Emits (event_id, user_id, value, prev_value, value_delta@6dp,
    next_type)."""
    import numpy as np

    from ..context import configure_shuffle, join_partitions

    configure_shuffle(32)

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "event_type", "ts", "value"],
    )

    def shifted(t: pa.Table) -> pa.Table:
        schema = pa.schema(
            [
                pa.field("event_id", pa.int64()),
                pa.field("user_id", pa.int64()),
                pa.field("value", pa.float64()),
                pa.field("prev_value", pa.float64()),
                pa.field("value_delta", pa.float64()),
                pa.field("next_type", pa.string()),
            ]
        )
        if t.num_rows == 0:
            return schema.empty_table()
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        v = t["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        et = t["event_type"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        us_, es_, vs_, ts_ = u[order], eid[order], v[order], et[order]
        same_prev = np.zeros(len(us_), dtype=bool)
        same_prev[1:] = us_[1:] == us_[:-1]
        prev = np.empty(len(vs_), dtype=np.float64)
        prev[1:] = vs_[:-1]
        prev[0] = np.nan
        prev = np.where(same_prev, prev, np.nan)
        delta = np.round(vs_ - prev, 6)
        same_next = np.zeros(len(us_), dtype=bool)
        same_next[:-1] = us_[1:] == us_[:-1]
        nxt = np.empty(len(ts_), dtype=object)
        nxt[:-1] = ts_[1:]
        nxt[-1] = None
        nxt = np.where(same_next, nxt, None)
        return pa.table(
            {
                "event_id": pa.array(es_),
                "user_id": pa.array(us_),
                "value": pa.array(vs_),
                "prev_value": pa.array(prev),
                "value_delta": pa.array(delta),
                "next_type": pa.array(nxt, pa.string()),
            },
            schema=schema,
        )

    return ds.repartition(join_partitions(n_parts), keys=["user_id"]).map_batches(
        shifted, batch_format="pyarrow", batch_size=None
    )


def _window_bucket_partials(
    ds: ray.data.Dataset, us: int, n_parts: int, n_buckets: int
) -> ray.data.Dataset:
    """Stage 1+2 of the two-level exact per-window distinct: per-batch
    distinct (window, user) pairs (duplicate activity inside a batch
    never ships), then one hop keyed on (w, hash(user) % B) — so a hot
    window's distinct-user set is SPLIT across B blocks instead of
    landing in one — and a block kernel emitting exact per-bucket
    distinct counts (w, n_partial). Buckets partition the user space,
    so per-bucket distincts sum to the window's distinct count."""
    import numpy as np

    from ..context import configure_shuffle, join_partitions

    configure_shuffle(32)
    shift = np.uint64(64 - int(np.log2(n_buckets)))
    mult = np.uint64(0x9E3779B97F4A7C15)

    def pairs(t: pa.Table) -> pa.Table:
        schema = pa.schema(
            [
                pa.field("w", pa.int64()),
                pa.field("bkt", pa.int64()),
                pa.field("user_id", pa.int64()),
            ]
        )
        if t.num_rows == 0:
            return schema.empty_table()
        ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        w = (ts // us) * us
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq = np.unique(np.stack([w, u], axis=1), axis=0)
        bkt = (
            (uniq[:, 1].astype(np.uint64) * mult) >> shift
        ).astype(np.int64)
        return pa.table(
            {
                "w": pa.array(uniq[:, 0]),
                "bkt": pa.array(bkt),
                "user_id": pa.array(uniq[:, 1]),
            },
            schema=schema,
        )

    def bucket_count(t: pa.Table) -> pa.Table:
        schema = pa.schema(
            [pa.field("w", pa.int64()), pa.field("n_partial", pa.int64())]
        )
        if t.num_rows == 0:
            return schema.empty_table()
        w = t["w"].to_numpy(zero_copy_only=False)
        b = t["bkt"].to_numpy(zero_copy_only=False)
        u = t["user_id"].to_numpy(zero_copy_only=False)
        uniq = np.unique(np.stack([w, b, u], axis=1), axis=0)
        wb = uniq[:, :2]
        change = np.empty(len(wb), dtype=bool)
        change[0] = True
        change[1:] = (wb[1:] != wb[:-1]).any(axis=1)
        starts = np.flatnonzero(change)
        n = np.diff(np.append(starts, len(wb)))
        return pa.table(
            {
                "w": pa.array(wb[starts, 0]),
                "n_partial": pa.array(n.astype(np.int64)),
            },
            schema=schema,
        )

    return ds.map_batches(pairs, batch_format="pyarrow").repartition(
        join_partitions(n_parts), keys=["w", "bkt"]
    ).map_batches(bucket_count, batch_format="pyarrow", batch_size=None)


def window_distinct_exact(
    sf_dir: str, minutes: int = 60, n_parts: int = 32, n_buckets: int = 64
) -> ray.data.Dataset:
    """EXACT distinct users per tumbling window — the combiner-dedup
    counterpart of the HLL sketch path, made skew-proof by a TWO-LEVEL
    distinct: the first hop is keyed on (window, hash(user) % B) so a
    peak-hour window with 10⁸ distinct users spreads over B blocks
    (each O(pairs/B)), each block emits its exact per-bucket distinct
    count, and a second TINY hop (≤ B rows per window) sums buckets per
    window. Use this when window×distinct cardinality is affordable;
    the sketch variant (`windowed_approx_distinct`) when it is not.
    Emits (w timestamp, n_users). ``n_buckets`` must be a power of two."""
    import numpy as np

    from ..context import configure_shuffle, join_partitions

    configure_shuffle(32)
    us = minutes * 60 * 1_000_000

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id"]
    )
    partials = _window_bucket_partials(ds, us, n_parts, n_buckets)

    def sum_block(t: pa.Table) -> pa.Table:
        schema = pa.schema(
            [pa.field("w", pa.timestamp("us")), pa.field("n_users", pa.int64())]
        )
        if t.num_rows == 0:
            return schema.empty_table()
        w = t["w"].to_numpy(zero_copy_only=False)
        n = t["n_partial"].to_numpy(zero_copy_only=False)
        order = np.argsort(w, kind="stable")
        ws, ns = w[order], n[order]
        change = np.empty(len(ws), dtype=bool)
        change[0] = True
        change[1:] = ws[1:] != ws[:-1]
        starts = np.flatnonzero(change)
        sums = np.add.reduceat(ns, starts)
        return pa.table(
            {
                "w": pa.array(ws[starts].astype("datetime64[us]")),
                "n_users": pa.array(sums.astype(np.int64)),
            },
            schema=schema,
        )

    return partials.repartition(
        join_partitions(min(n_parts, 8)), keys=["w"]
    ).map_batches(sum_block, batch_format="pyarrow", batch_size=None)


def window_top_types(
    sf_dir: str, minutes: int = 60, k: int = 3, n_parts: int = 32
) -> ray.data.Dataset:
    """Top-k event types per tumbling window (the 'trending' query):
    per-batch partial (window, type) counts BEFORE the shuffle, one keyed
    hop on the window, then per-window count-merge + top-k rank
    vectorized across windows (count DESC, type ASC ties). Emits
    (w, rank, event_type, n)."""
    import numpy as np
    import pandas as pd

    from ..context import configure_shuffle, join_partitions

    configure_shuffle(32)
    us = minutes * 60 * 1_000_000

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
    )

    def partials(t: pa.Table) -> pa.Table:
        schema = pa.schema(
            [
                pa.field("w", pa.int64()),
                pa.field("event_type", pa.string()),
                pa.field("cnt", pa.int64()),
            ]
        )
        if t.num_rows == 0:
            return schema.empty_table()
        ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        w = (ts // us) * us
        codes, uniques = pd.factorize(t["event_type"].to_pandas())
        key = w * len(uniques) + codes if len(uniques) else w
        ku, cc = np.unique(key, return_counts=True)
        return pa.table(
            {
                "w": pa.array(ku // len(uniques)),
                "event_type": pa.array(
                    np.asarray(uniques, dtype=object)[ku % len(uniques)],
                    pa.string(),
                ),
                "cnt": pa.array(cc.astype(np.int64)),
            },
            schema=schema,
        )

    def topk(t: pa.Table) -> pa.Table:
        schema = pa.schema(
            [
                pa.field("w", pa.timestamp("us")),
                pa.field("rank", pa.int64()),
                pa.field("event_type", pa.string()),
                pa.field("n", pa.int64()),
            ]
        )
        if t.num_rows == 0:
            return schema.empty_table()
        df = (
            t.to_pandas()
            .groupby(["w", "event_type"], as_index=False)["cnt"].sum()
        )
        w = df["w"].to_numpy()
        et = df["event_type"].to_numpy(dtype=object)
        n = df["cnt"].to_numpy()
        order = np.lexsort((et, -n, w))
        ws, es, ns = w[order], et[order], n[order]
        change = np.empty(len(ws), dtype=bool)
        change[0] = True
        change[1:] = ws[1:] != ws[:-1]
        starts = np.flatnonzero(change)
        rank = np.arange(len(ws), dtype=np.int64) - np.repeat(
            starts, np.diff(np.append(starts, len(ws)))
        ) + 1
        keep = rank <= k
        return pa.table(
            {
                "w": pa.array(ws[keep].astype("datetime64[us]")),
                "rank": pa.array(rank[keep]),
                "event_type": pa.array(es[keep], pa.string()),
                "n": pa.array(ns[keep].astype(np.int64)),
            },
            schema=schema,
        )

    return ds.map_batches(partials, batch_format="pyarrow").repartition(
        join_partitions(n_parts), keys=["w"]
    ).map_batches(topk, batch_format="pyarrow", batch_size=None)


def rolling_mean(
    sf_dir: str, k: int = 4, n_parts: int = 32
) -> ray.data.Dataset:
    """Per-user TRAILING moving average over the last ``k`` events
    (SQL: ``avg(value) OVER (PARTITION BY user ORDER BY ts, event_id
    ROWS BETWEEN k-1 PRECEDING AND CURRENT ROW)``) — the rolling-window
    companion of the lag/lead features. ONE user-keyed hop, then a block
    kernel computes every user's windows at once: segment-clamped
    prefix-sum differencing (window sums = C[i+1] − C[w0], w0 clamped to
    the user's segment start), null values excluded from both sum and
    count exactly as SQL windows do. 6dp snap mirrors the oracle."""
    import numpy as np

    from ..context import configure_shuffle, join_partitions
    from ..functions.num import sql_round

    configure_shuffle(32)
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "value"]
    )

    def per_block(t: pa.Table) -> pa.Table:
        schema = pa.schema(
            [
                pa.field("event_id", pa.int64()),
                pa.field("user_id", pa.int64()),
                pa.field("rolling_avg", pa.float64()),
            ]
        )
        if t.num_rows == 0:
            return schema.empty_table()
        df, seg = _sorted_block(t, ["event_id", "user_id", "ts", "value"])
        v = df["value"].to_numpy().astype(np.float64)
        ok = ~np.isnan(v)
        v0 = np.where(ok, v, 0.0)
        n = len(df)
        i = np.arange(n)
        seg_starts = np.zeros(n, dtype=bool)
        seg_starts[0] = True
        seg_starts[1:] = seg[1:] != seg[:-1]
        starts = np.flatnonzero(seg_starts)
        lens = np.diff(np.append(starts, n))
        row_start = np.repeat(starts, lens)
        w0 = np.maximum(row_start, i - (k - 1))
        C = np.concatenate([[0.0], np.cumsum(v0)])
        N = np.concatenate([[0], np.cumsum(ok.astype(np.int64))])
        s = C[i + 1] - C[w0]
        cnt = N[i + 1] - N[w0]
        avg = np.where(cnt > 0, s / np.maximum(cnt, 1), np.nan)
        rounded = sql_round(pa.array(avg), 6).to_numpy(zero_copy_only=False)
        out = pa.table(
            {
                "event_id": pa.array(
                    df["event_id"].to_numpy().astype(np.int64)
                ),
                "user_id": pa.array(df["user_id"].to_numpy().astype(np.int64)),
                # from_pandas: NaN (all-null window) → SQL NULL
                "rolling_avg": pa.array(rounded, from_pandas=True),
            },
            schema=schema,
        )
        return out

    return _by_user(ds).map_batches(
        per_block, batch_format="pyarrow", batch_size=None
    )


def event_transitions(sf_dir: str, n_parts: int = 32) -> ray.data.Dataset:
    """Markov transition counts: per user, events ordered by (ts,
    event_id) form a chain; count every (prev_type → type) bigram
    globally. ONE user-keyed hop makes each user's chain block-local
    (no cross-block bigrams by construction), the block kernel shifts
    within segments and emits per-block partial counts, and a tiny
    groupby sums them — the exchange moves O(types²) rows per block."""
    import numpy as np

    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "event_type", "ts"]
    )

    def partial(t: pa.Table) -> pa.Table:
        schema = pa.schema(
            [
                pa.field("src", pa.string()),
                pa.field("dst", pa.string()),
                pa.field("n", pa.int64()),
            ]
        )
        if t.num_rows == 0:
            return schema.empty_table()
        df, seg = _sorted_block(t, ["event_id", "user_id", "event_type", "ts"])
        et = df["event_type"].to_numpy()
        same = np.zeros(len(df), dtype=bool)
        same[1:] = seg[1:] == seg[:-1]  # row has an in-user predecessor
        src = np.roll(et, 1)[same]
        dst = et[same]
        if len(dst) == 0:
            return schema.empty_table()
        import pandas as pd

        g = (
            pd.DataFrame({"src": src, "dst": dst})
            .groupby(["src", "dst"], as_index=False)
            .size()
        )
        return pa.table(
            {
                "src": pa.array(g["src"], pa.string()),
                "dst": pa.array(g["dst"], pa.string()),
                "n": pa.array(g["size"].to_numpy(np.int64)),
            },
            schema=schema,
        )

    return (
        _by_user(ds)
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(["src", "dst"])
        .aggregate(Sum("n", alias_name="n"))
    )


def ntile_stats(
    sf_dir: str, tiles: int = 4, n_parts: int = 32
) -> ray.data.Dataset:
    """Per-user NTILE(tiles) over (value, event_id) order with exact SQL
    tile sizing (first n mod k tiles get the extra row), rolled up to
    (user, tile) count + mean — per-user value-quartile features. ONE
    user-keyed hop; the block kernel assigns every user's tiles at once
    with segment index arithmetic and reduces in the same pass (no
    second shuffle: a user's rows never span blocks)."""
    import numpy as np

    from ..context import configure_shuffle, join_partitions
    from ..functions.num import sql_round

    configure_shuffle(32)
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "value"]
    )

    def per_block(t: pa.Table) -> pa.Table:
        schema = pa.schema(
            [
                pa.field("user_id", pa.int64()),
                pa.field("tile", pa.int64()),
                pa.field("n", pa.int64()),
                pa.field("avg_value", pa.float64()),
            ]
        )
        if t.num_rows == 0:
            return schema.empty_table()
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = t["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        e = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = ~np.isnan(v)
        u, v, e = u[keep], v[keep], e[keep]
        if len(u) == 0:
            return schema.empty_table()
        order = np.lexsort((e, v, u))
        u, v = u[order], v[order]
        change = np.empty(len(u), dtype=bool)
        change[0] = True
        change[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(change)
        lens = np.diff(np.append(starts, len(u)))
        i = np.arange(len(u)) - np.repeat(starts, lens)  # pos within user
        n = np.repeat(lens, lens)
        base, rem = n // tiles, n % tiles
        big_span = rem * (base + 1)
        tile = np.where(
            i < big_span,
            i // np.maximum(base + 1, 1),
            rem + (i - big_span) // np.maximum(base, 1),
        ) + 1
        # reduce (user, tile) in the same pass: key = seg * tiles + tile
        seg = np.repeat(np.arange(len(starts)), lens)
        key = seg * tiles + (tile - 1)
        uk, inv = np.unique(key, return_inverse=True)
        cnt = np.bincount(inv)
        s = np.bincount(inv, weights=v)
        return pa.table(
            {
                "user_id": pa.array(u[starts][uk // tiles]),
                "tile": pa.array((uk % tiles + 1).astype(np.int64)),
                "n": pa.array(cnt.astype(np.int64)),
                "avg_value": sql_round(pa.array(s / cnt), 6),
            },
            schema=schema,
        )

    return ds.repartition(join_partitions(n_parts), keys=["user_id"]).map_batches(
        per_block, batch_format="pyarrow", batch_size=None
    )


def running_total(sf_dir: str) -> ray.data.Dataset:
    """Per-user cumulative sum of value over (ts, event_id) order — the
    UNBOUNDED PRECEDING window companion of rolling_mean. ONE user-keyed
    hop, then segment-reset prefix sums across every user in the block
    (global cumsum minus each segment's starting offset); nulls add 0
    but still emit a row, exactly as SQL sum() OVER ignores NULLs."""
    import numpy as np

    from ..functions.num import sql_round

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "value"]
    )

    def per_block(t: pa.Table) -> pa.Table:
        schema = pa.schema(
            [
                pa.field("event_id", pa.int64()),
                pa.field("user_id", pa.int64()),
                pa.field("running_sum", pa.float64()),
            ]
        )
        if t.num_rows == 0:
            return schema.empty_table()
        df, seg = _sorted_block(t, ["event_id", "user_id", "ts", "value"])
        v = df["value"].to_numpy().astype(np.float64)
        ok = ~np.isnan(v)
        v0 = np.where(ok, v, 0.0)
        csum = np.cumsum(v0)
        starts = np.zeros(len(df), dtype=bool)
        starts[0] = True
        starts[1:] = seg[1:] != seg[:-1]
        sidx = np.flatnonzero(starts)
        lens = np.diff(np.append(sidx, len(df)))
        base = np.repeat(csum[sidx] - v0[sidx], lens)
        run = csum - base
        # a user whose prefix is all-null yields SQL NULL until the
        # first non-null value arrives
        seen = np.cumsum(ok.astype(np.int64))
        seen_base = np.repeat(seen[sidx] - ok[sidx].astype(np.int64), lens)
        any_seen = (seen - seen_base) > 0
        rounded = sql_round(pa.array(run), 6).to_numpy(zero_copy_only=False)
        out = np.where(any_seen, rounded, np.nan)
        return pa.table(
            {
                "event_id": pa.array(df["event_id"].to_numpy().astype(np.int64)),
                "user_id": pa.array(df["user_id"].to_numpy().astype(np.int64)),
                "running_sum": pa.array(out, from_pandas=True),
            },
            schema=schema,
        )

    return _by_user(ds).map_batches(
        per_block, batch_format="pyarrow", batch_size=None
    )


def collapse_repeats(sf_dir: str, n_parts: int = 32) -> ray.data.Dataset:
    """Per-user run-length structure of the event sequence: total events
    and the number of RUNS after collapsing consecutive duplicate event
    types under (ts, event_id) order — the streaming change-detection
    shape (state transitions vs heartbeats). ONE keyed hop on user_id,
    then the run counter is a shifted-comparison vectorized ACROSS all
    users in the block (per-user boundaries reset the comparison)."""
    import numpy as np

    from ..context import configure_shuffle, join_partitions

    configure_shuffle(32)
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_type", "ts", "event_id"],
    )

    schema = pa.schema(
        [
            pa.field("user_id", pa.int64()),
            pa.field("n_events", pa.int64()),
            pa.field("n_runs", pa.int64()),
        ]
    )

    def per_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return schema.empty_table()
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        et = t["event_type"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        us_, es_ = u[order], et[order]
        new_run = np.ones(len(us_), dtype=bool)
        new_run[1:] = (us_[1:] != us_[:-1]) | (es_[1:] != es_[:-1])
        change = np.empty(len(us_), dtype=bool)
        change[0] = True
        change[1:] = us_[1:] != us_[:-1]
        starts = np.flatnonzero(change)
        lens = np.diff(np.append(starts, len(us_)))
        runs = np.add.reduceat(new_run.astype(np.int64), starts)
        return pa.table(
            {
                "user_id": pa.array(us_[starts]),
                "n_events": pa.array(lens.astype(np.int64)),
                "n_runs": pa.array(runs),
            },
            schema=schema,
        )

    return ds.repartition(join_partitions(n_parts), keys=["user_id"]).map_batches(
        per_block, batch_format="pyarrow", batch_size=None
    )


def linear_interp(sf_dir: str) -> ray.data.Dataset:
    """Per-user LINEAR INTERPOLATION of gaps in the value series — the
    sensor-style gap-fill companion of cdc_fill_forward's LOCF. Nulls
    are planted deterministically (event_id % 5 == 0, mirrored in the
    oracle) since the synthetic events table is dense. Interior nulls
    get prev + (next − prev) · (ts − prev_ts)/(next_ts − prev_ts);
    leading/trailing nulls (no bracketing observation) stay NULL. ONE
    user-keyed hop; prev/next non-null resolution is a pair of
    segment-reset ``maximum.accumulate`` passes vectorized across every
    user in the block — no per-row Python."""
    import numpy as np

    from ..functions.num import sql_round

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "value"]
    )

    out_schema = pa.schema(
        [
            pa.field("event_id", pa.int64()),
            pa.field("user_id", pa.int64()),
            pa.field("v_filled", pa.float64()),
        ]
    )

    def per_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        df, seg = _sorted_block(t, ["event_id", "user_id", "ts", "value"])
        eid = df["event_id"].to_numpy().astype(np.int64)
        v = df["value"].to_numpy().astype(np.float64)
        v = np.where(eid % 5 == 0, np.nan, v)  # planted gaps (oracle mirror)
        ts = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        n = len(v)
        ok = ~np.isnan(v)
        idx = np.arange(n)
        starts = np.zeros(n, dtype=bool)
        starts[0] = True
        starts[1:] = seg[1:] != seg[:-1]
        sidx = np.flatnonzero(starts)
        lens = np.diff(np.append(sidx, n))
        seg_start = np.repeat(sidx, lens)
        seg_end = np.repeat(sidx + lens - 1, lens)
        # last valid index at/before i (a null row's is strictly before);
        # plain accumulate leaks across users — mask lookbacks that land
        # before this row's segment start
        prev = np.maximum.accumulate(np.where(ok, idx, -1))
        prev = np.where(prev >= seg_start, prev, -1)
        # first valid index at/after i, same trick reversed
        nxt = np.minimum.accumulate(np.where(ok, idx, n + 1)[::-1])[::-1]
        nxt = np.where(nxt <= seg_end, nxt, -1)
        filled = v.copy()
        need = ~ok
        p, q = prev[need], nxt[need]
        can = (p >= 0) & (q >= 0)
        pi, qi = p[can], q[can]
        dt = (ts[qi] - ts[pi]).astype(np.float64)
        # bracketing observations at the SAME timestamp (tie): take prev,
        # mirrored by the oracle's CASE WHEN nt = pt THEN pv
        with np.errstate(invalid="ignore", divide="ignore"):
            ratio = (ts[need][can] - ts[pi]).astype(np.float64) / dt
        interp = v[pi] + (v[qi] - v[pi]) * ratio
        interp = np.where(dt == 0.0, v[pi], interp)
        vals = np.full(need.sum(), np.nan)
        vals[can] = interp
        filled[need] = vals
        rounded = sql_round(pa.array(filled, from_pandas=True), 6)
        return pa.table(
            {
                "event_id": pa.array(eid),
                "user_id": pa.array(df["user_id"].to_numpy().astype(np.int64)),
                "v_filled": rounded,
            },
            schema=out_schema,
        )

    return _by_user(ds).map_batches(
        per_block, batch_format="pyarrow", batch_size=None
    )


def above_mean_runs(sf_dir: str) -> ray.data.Dataset:
    """Gaps-and-islands at fact scale: per user, the LONGEST consecutive
    run (in (ts, event_id) order) of events whose value exceeds the
    global mean, plus the run count. Two passes: a scalar mean
    aggregate (rounded to 6dp in BOTH engines so an exact-boundary
    value can't flip between them), then ONE user-keyed hop with the
    run-length structure computed by shifted comparisons vectorized
    across all users in the block. Users with no hot runs are omitted
    (mirroring the SQL islands' GROUP BY)."""
    import numpy as np

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "value"]
    )

    # pass 1: global mean (two scalars leave the cluster)
    def mean_partial(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False)
        v = v[~np.isnan(v)]
        return pa.table(
            {
                "s": pa.array([float(v.sum())], pa.float64()),
                "n": pa.array([len(v)], pa.int64()),
            }
        )

    agg = ds.map_batches(mean_partial, batch_format="pyarrow").sum(["s", "n"])
    mu = round(float(agg["sum(s)"]) / float(agg["sum(n)"]), 6)

    out_schema = pa.schema(
        [
            pa.field("user_id", pa.int64()),
            pa.field("longest_hot_run", pa.int64()),
            pa.field("n_hot_runs", pa.int64()),
        ]
    )

    def per_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        df, seg = _sorted_block(t, ["event_id", "user_id", "ts", "value"])
        v = df["value"].to_numpy().astype(np.float64)
        keep = ~np.isnan(v)
        user = df["user_id"].to_numpy().astype(np.int64)[keep]
        hot = v[keep] > mu
        if len(user) == 0 or not hot.any():
            return out_schema.empty_table()
        # run id: increments at user boundary or hot-flag change
        change = np.ones(len(user), dtype=bool)
        change[1:] = (user[1:] != user[:-1]) | (hot[1:] != hot[:-1])
        run_id = np.cumsum(change) - 1
        starts = np.flatnonzero(change)
        run_len = np.diff(np.append(starts, len(user)))
        run_user = user[starts]
        run_hot = hot[starts]
        hu, hl = run_user[run_hot], run_len[run_hot]
        uniq, inv = np.unique(hu, return_inverse=True)
        longest = np.zeros(len(uniq), dtype=np.int64)
        np.maximum.at(longest, inv, hl)
        return pa.table(
            {
                "user_id": pa.array(uniq),
                "longest_hot_run": pa.array(longest),
                "n_hot_runs": pa.array(np.bincount(inv).astype(np.int64)),
            },
            schema=out_schema,
        )

    return _by_user(ds).map_batches(
        per_block, batch_format="pyarrow", batch_size=None
    )


def value_autocorr(sf_dir: str, min_pairs: int = 2) -> ray.data.Dataset:
    """Per-user LAG-1 AUTOCORRELATION of the value series under
    (ts, event_id) order — the sequence-stationarity probe. ONE
    user-keyed hop; consecutive (vₜ, vₜ₊₁) pairs come from a segment-
    masked shift (pairs never cross users or a NULL), and each user's
    correlation is the standard cross-moment ratio over its pairs.
    Users with < ``min_pairs`` valid pairs (or zero variance on either
    side) are omitted, mirroring the oracle's HAVING + NaN filter."""
    import numpy as np

    from ..functions.num import sql_round

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "value"]
    )

    out_schema = pa.schema(
        [
            pa.field("user_id", pa.int64()),
            pa.field("n_pairs", pa.int64()),
            pa.field("autocorr", pa.float64()),
        ]
    )

    def per_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        df, seg = _sorted_block(t, ["event_id", "user_id", "ts", "value"])
        v = df["value"].to_numpy().astype(np.float64)
        user = df["user_id"].to_numpy().astype(np.int64)
        n = len(v)
        if n < 2:
            return out_schema.empty_table()
        same = seg[1:] == seg[:-1]
        x, y = v[:-1], v[1:]
        okp = same & ~np.isnan(x) & ~np.isnan(y)
        if not okp.any():
            return out_schema.empty_table()
        pu = user[:-1][okp]
        xs, ys = x[okp], y[okp]
        uniq, inv = np.unique(pu, return_inverse=True)
        cnt = np.bincount(inv).astype(np.float64)
        sx = np.bincount(inv, weights=xs)
        sy = np.bincount(inv, weights=ys)
        sxx = np.bincount(inv, weights=xs * xs)
        syy = np.bincount(inv, weights=ys * ys)
        sxy = np.bincount(inv, weights=xs * ys)
        with np.errstate(invalid="ignore", divide="ignore"):
            corr = (sxy - sx * sy / cnt) / np.sqrt(
                (sxx - sx * sx / cnt) * (syy - sy * sy / cnt)
            )
        keep = (cnt >= min_pairs) & np.isfinite(corr)
        return pa.table(
            {
                "user_id": pa.array(uniq[keep]),
                "n_pairs": pa.array(cnt[keep].astype(np.int64)),
                "autocorr": sql_round(pa.array(corr[keep]), 6),
            },
            schema=out_schema,
        )

    return _by_user(ds).map_batches(
        per_block, batch_format="pyarrow", batch_size=None
    )


def type_cooccurrence(sf_dir: str) -> ray.data.Dataset:
    """Event-type co-engagement matrix: for every unordered type pair
    (a ≤ b), how many users emitted BOTH. Per-batch (user, type)
    dedup → ONE user-keyed hop (each user's type set lands whole) →
    per-block pair expansion over ≤|types| elements per user → a final
    |types|²-bounded count hop. The pair space is dimension-bounded, so
    the exchange never scales with events."""
    import numpy as np

    from ..context import configure_shuffle, join_partitions

    configure_shuffle(16)
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )

    ut_schema = pa.schema(
        [pa.field("user_id", pa.int64()), pa.field("event_type", pa.string())]
    )

    def dedup_batch(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return ut_schema.empty_table()
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        et = t["event_type"].to_numpy(zero_copy_only=False).astype(object)
        # factorize (no fixed-width unicode cast: long categories would
        # truncate and silently merge distinct keys)
        types, code = np.unique(et, return_inverse=True)
        _, first = np.unique(u * len(types) + code, return_index=True)
        return pa.table(
            {
                "user_id": pa.array(u[first]),
                "event_type": pa.array(et[first], pa.string()),
            },
            schema=ut_schema,
        )

    pair_schema = pa.schema(
        [
            pa.field("a", pa.string()),
            pa.field("b", pa.string()),
            pa.field("n", pa.int64()),
        ]
    )

    def pairs_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pair_schema.empty_table()
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        et = t["event_type"].to_numpy(zero_copy_only=False).astype(object)
        # block-level re-dedup (same (user, type) may arrive from many
        # batches) via factorized integer keys, then per-user expansion
        types, code = np.unique(et, return_inverse=True)
        nt = len(types)
        _, first = np.unique(u * nt + code, return_index=True)
        u, code = u[first], code[first]
        order = np.lexsort((code, u))
        u, code = u[order], code[order]
        starts = np.flatnonzero(np.concatenate(([True], u[1:] != u[:-1])))
        lens = np.diff(np.append(starts, len(u)))
        pa_, pb_ = [], []
        for s, ln in zip(starts, lens):
            if ln < 2:
                continue
            ii, jj = np.triu_indices(ln, k=1)
            pa_.append(code[s + ii])
            pb_.append(code[s + jj])
        if not pa_:
            return pair_schema.empty_table()
        aa = np.concatenate(pa_)
        bb = np.concatenate(pb_)
        uniq, inv = np.unique(aa * nt + bb, return_inverse=True)
        return pa.table(
            {
                "a": pa.array(types[uniq // nt], pa.string()),
                "b": pa.array(types[uniq % nt], pa.string()),
                "n": pa.array(np.bincount(inv).astype(np.int64)),
            },
            schema=pair_schema,
        )

    from ray.data.aggregate import Sum

    return (
        ds.map_batches(dedup_batch, batch_format="pyarrow")
        .repartition(join_partitions(32), keys=["user_id"])
        .map_batches(pairs_block, batch_format="pyarrow", batch_size=None)
        .groupby(["a", "b"])
        .aggregate(Sum("n", alias_name="n"))
    )


def window_rank_change(sf_dir: str, minutes: int = 1440) -> ray.data.Dataset:
    """Streaming-leaderboard shifts: per tumbling window, each event
    type's count rank (row_number over count DESC / type ASC) and its rank
    delta vs the previous window (NULL for a type's first window). The
    per-window rollup is combiner-first; the rank/lag finish runs on the
    window × type relation — dimension-bounded, single block."""
    import numpy as np

    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
    )
    us = minutes * 60 * 1_000_000

    part_schema = pa.schema(
        [
            pa.field("w", pa.timestamp("us")),
            pa.field("event_type", pa.string()),
            pa.field("n", pa.int64()),
        ]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        w = (ts // us) * us
        et = t["event_type"].to_numpy(zero_copy_only=False).astype(object)
        # factorize both key parts (no fixed-width unicode cast: long
        # categories would truncate and merge distinct keys)
        types, code = np.unique(et, return_inverse=True)
        wu, winv = np.unique(w, return_inverse=True)
        nt = len(types)
        uniq, inv = np.unique(winv * nt + code, return_inverse=True)
        return pa.table(
            {
                "w": pa.array(wu[uniq // nt]).cast(pa.timestamp("us")),
                "event_type": pa.array(types[uniq % nt], pa.string()),
                "n": pa.array(np.bincount(inv).astype(np.int64)),
            },
            schema=part_schema,
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["w", "event_type"])
        .aggregate(Sum("n", alias_name="n"))
        .repartition(1)
    )

    out_schema = pa.schema(
        [
            pa.field("w", pa.timestamp("us")),
            pa.field("event_type", pa.string()),
            pa.field("n", pa.int64()),
            pa.field("rnk", pa.int64()),
            pa.field("rank_change", pa.float64()),
        ]
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        df = t.to_pandas().sort_values(["w", "event_type"])
        w = df["w"].to_numpy("datetime64[us]").astype(np.int64)
        et = df["event_type"].to_numpy(object)
        n = df["n"].to_numpy(np.int64)
        # dense rank per window: count DESC, type ASC
        order = np.lexsort((et, -n, w))
        ws, es, ns = w[order], et[order], n[order]
        new_w = np.concatenate(([True], ws[1:] != ws[:-1]))
        wstart = np.flatnonzero(new_w)
        wlens = np.diff(np.append(wstart, len(ws)))
        rnk = np.arange(len(ws)) - np.repeat(wstart, wlens) + 1
        # previous-window rank per type: sort by (type, window)
        o2 = np.lexsort((ws, np.array([str(x) for x in es])))
        es2, ws2, r2 = (
            np.array([str(x) for x in es])[o2],
            ws[o2],
            rnk[o2],
        )
        same_type = np.concatenate(([False], es2[1:] == es2[:-1]))
        prev = np.full(len(r2), np.nan)
        prev[1:] = r2[:-1].astype(np.float64)
        prev[~same_type] = np.nan
        change = prev - r2.astype(np.float64)  # + = moved up
        back = np.empty(len(o2), dtype=np.int64)
        back[o2] = np.arange(len(o2))
        change_in_rank_order = change[back]
        return pa.table(
            {
                "w": pa.array(ws).cast(pa.timestamp("us")),
                "event_type": pa.array(list(es), pa.string()),
                "n": pa.array(ns),
                "rnk": pa.array(rnk.astype(np.int64)),
                "rank_change": pa.array(
                    change_in_rank_order, from_pandas=True
                ),
            },
            schema=out_schema,
        )

    return agg.map_batches(finish, batch_format="pyarrow", batch_size=None)
