"""User-behavior analytics over the events stream: sessionization,
cohort retention, ordered funnels.

These are the classic product/training-data activity reports a 100-TB
event log needs; each is expressed with ONE user-keyed exchange (each
user's events land whole in one block) followed by vectorized
segment-reset kernels — no window-function shuffle, no driver loops.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..functions.num import sql_round

_US = 1_000_000


def session_windows(
    sf_dir: str, gap_minutes: int = 30, num_partitions: int = 16
) -> ray.data.Dataset:
    """Per-user sessionization (gap timeout): maximal event runs whose
    inter-arrival gap is ≤ ``gap_minutes``. ONE user-keyed repartition;
    sessions resolve inside each block with a vectorized diff against
    the (ts, event_id)-sorted stream. Output: sessions, events and
    events-per-session per user."""
    from ..context import configure_shuffle, join_partitions

    configure_shuffle(num_partitions)
    gap_us = gap_minutes * 60 * _US
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id"]
    )

    out_schema = pa.schema(
        [
            pa.field("user_id", pa.int64()),
            pa.field("n_sessions", pa.int64()),
            pa.field("n_events", pa.int64()),
            pa.field("events_per_session", pa.float64()),
        ]
    )

    def per_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((eid, ts, u))
        u, ts = u[order], ts[order]
        new_user = np.empty(len(u), dtype=bool)
        new_user[0] = True
        new_user[1:] = u[1:] != u[:-1]
        gap = np.empty(len(u), dtype=bool)
        gap[0] = True
        gap[1:] = (ts[1:] - ts[:-1]) > gap_us
        new_sess = new_user | gap
        starts = np.flatnonzero(new_user)
        n_ev = np.diff(np.append(starts, len(u)))
        n_sess = np.add.reduceat(new_sess.astype(np.int64), starts)
        return pa.table(
            {
                "user_id": pa.array(u[starts]),
                "n_sessions": pa.array(n_sess),
                "n_events": pa.array(n_ev.astype(np.int64)),
                "events_per_session": sql_round(
                    pa.array(n_ev / n_sess.astype(np.float64)), 6
                ),
            },
            schema=out_schema,
        )

    return ds.repartition(
        join_partitions(num_partitions), keys=["user_id"]
    ).map_batches(per_block, batch_format="pyarrow", batch_size=None)


def retention_cohorts(sf_dir: str, num_partitions: int = 16) -> ray.data.Dataset:
    """Weekly cohort retention: cohort = the ISO week of a user's first
    event; a cell (cohort_week, week_offset) counts users from that
    cohort active ``offset`` weeks later. Per-batch (user, week) dedup
    bounds the exchange by distinct (user, week) per block; the keyed
    hop co-locates each user's weeks; the final count hop is
    cohort-grid-sized."""
    from ray.data.aggregate import Sum

    from ..context import configure_shuffle, join_partitions

    configure_shuffle(num_partitions)
    week_us = 7 * 24 * 3600 * _US
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )

    uw_schema = pa.schema(
        [pa.field("user_id", pa.int64()), pa.field("week", pa.int64())]
    )

    def dedup_batch(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return uw_schema.empty_table()
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        # epoch-anchored weeks (not ISO): deterministic, oracle-mirrored
        wk = ts // week_us
        # factorized (user, week) dedup
        wku, wki = np.unique(wk, return_inverse=True)
        nw = len(wku)
        keys, first = np.unique(u * nw + wki, return_index=True)
        return pa.table(
            {
                "user_id": pa.array(u[first]),
                "week": pa.array(wk[first].astype(np.int64)),
            },
            schema=uw_schema,
        )

    cell_schema = pa.schema(
        [
            pa.field("cohort_week", pa.int64()),
            pa.field("week_offset", pa.int64()),
            pa.field("n_users", pa.int64()),
        ]
    )

    def per_user_cells(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return cell_schema.empty_table()
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        wk = t["week"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((wk, u))
        u, wk = u[order], wk[order]
        # block-level (user, week) re-dedup (pairs may arrive from many
        # source batches)
        keep = np.empty(len(u), dtype=bool)
        keep[0] = True
        keep[1:] = (u[1:] != u[:-1]) | (wk[1:] != wk[:-1])
        u, wk = u[keep], wk[keep]
        new_user = np.empty(len(u), dtype=bool)
        new_user[0] = True
        new_user[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(new_user)
        lens = np.diff(np.append(starts, len(u)))
        cohort = np.repeat(wk[starts], lens)  # first (=min) week per user
        offset = wk - cohort
        key = cohort * 10_000 + offset  # offsets bounded by weeks-in-log
        uniq, inv = np.unique(key, return_inverse=True)
        return pa.table(
            {
                "cohort_week": pa.array(uniq // 10_000),
                "week_offset": pa.array(uniq % 10_000),
                "n_users": pa.array(np.bincount(inv).astype(np.int64)),
            },
            schema=cell_schema,
        )

    return (
        ds.map_batches(dedup_batch, batch_format="pyarrow")
        .repartition(join_partitions(num_partitions), keys=["user_id"])
        .map_batches(per_user_cells, batch_format="pyarrow", batch_size=None)
        .groupby(["cohort_week", "week_offset"])
        .aggregate(Sum("n_users", alias_name="n_users"))
        .map_batches(
            lambda t: pa.table(
                {
                    "cohort_week": t["cohort_week"].cast(pa.int64()),
                    "week_offset": t["week_offset"].cast(pa.int64()),
                    "n_users": t["n_users"].cast(pa.int64()),
                },
                schema=cell_schema,
            ),
            batch_format="pyarrow",
        )
    )


def funnel_conversion(
    sf_dir: str,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Ordered funnel: how many users reached step k — step k counts
    only if it happens strictly AFTER the user's earliest completion of
    step k-1 (the classic min-timestamp chaining). ONE user-keyed hop;
    each user's chain resolves vectorized inside the block; output is
    one row per step with the reach count and conversion from step 1."""
    from ray.data.aggregate import Sum

    from ..context import configure_shuffle, join_partitions

    configure_shuffle(num_partitions)
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"]
    )

    # pre-prune: only funnel-step events enter the exchange
    def prune(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.is_in(t["event_type"], value_set=pa.array(steps)))

    part_schema = pa.schema(
        [pa.field("step", pa.int32()), pa.field("n_users", pa.int64())]
    )

    def per_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        et = t["event_type"].to_numpy(zero_copy_only=False).astype(object)
        step_of = {s: i for i, s in enumerate(steps)}
        sid = np.array([step_of[x] for x in et], dtype=np.int64)
        order = np.lexsort((ts, u))
        u, ts, sid = u[order], ts[order], sid[order]
        new_user = np.empty(len(u), dtype=bool)
        new_user[0] = True
        new_user[1:] = u[1:] != u[:-1]
        user_idx = np.cumsum(new_user) - 1
        n_users = int(user_idx[-1]) + 1
        # min-ts chaining, vectorized: the only loop is over the K funnel
        # STEPS — each iteration is one masked minimum-per-user scatter
        big = np.iinfo(np.int64).max
        prev = np.full(n_users, -1, dtype=np.int64)
        alive = np.ones(n_users, dtype=bool)
        reach = np.zeros(len(steps), dtype=np.int64)
        for k in range(len(steps)):
            m = (sid == k) & (ts > prev[user_idx]) & alive[user_idx]
            cur = np.full(n_users, big, dtype=np.int64)
            np.minimum.at(cur, user_idx[m], ts[m])
            alive &= cur != big
            prev = np.where(alive, cur, prev)
            reach[k] = int(alive.sum())
        return pa.table(
            {
                "step": pa.array(np.arange(len(steps), dtype=np.int32)),
                "n_users": pa.array(reach),
            },
            schema=part_schema,
        )

    out_schema = pa.schema(
        [
            pa.field("step", pa.int32()),
            pa.field("event_type", pa.string()),
            pa.field("n_users", pa.int64()),
            pa.field("conversion", pa.float64()),
        ]
    )

    def final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        step = t["step"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = t["n_users"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(step)
        step, n = step[order], n[order]
        base = float(n[0]) if len(n) and n[0] else 1.0
        return pa.table(
            {
                "step": pa.array(step.astype(np.int32)),
                "event_type": pa.array([steps[int(s)] for s in step], pa.string()),
                "n_users": pa.array(n),
                "conversion": sql_round(pa.array(n / base), 6),
            },
            schema=out_schema,
        )

    return (
        ds.map_batches(prune, batch_format="pyarrow")
        .repartition(join_partitions(num_partitions), keys=["user_id"])
        .map_batches(per_block, batch_format="pyarrow", batch_size=None)
        .groupby("step")
        .aggregate(Sum("n_users", alias_name="n_users"))
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )
