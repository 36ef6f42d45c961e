"""Stream-shaped operators over the ordered ``events`` log.

Ray Data has no event-time window primitives (SURVEY.md §2.9); these
express the two standard shapes the engine needs:

- tumbling windows: a derived window-start column + groupby — embarrassingly
  parallel, the window column IS the shuffle key;
- session windows: per-key ``map_groups`` over the ts-sorted group with a
  vectorized gap-split (state never leaves the group = the partitioning
  assumption, documented per the north-star custom-operator rule).
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


def asof_join_events(
    sf_dir: str, left_type: str = "purchase", right_type: str = "click"
) -> ray.data.Dataset:
    """As-of join within the events log: for every ``left_type`` event,
    attach the user's most recent ``right_type`` event at-or-before its
    ts (backward as-of, ts-inclusive; ties among right events at the same
    ts resolve to that ts). Implemented as groupby(user) + per-group
    ``pd.merge_asof`` over ts-sorted frames — the composition path for
    as-of/range joins Ray Data lacks natively (partitioning assumption:
    one user's history fits in a group)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "event_type", "ts"]
    )

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["event_type"] == left_type].sort_values(["ts", "event_id"])
        right = g[g["event_type"] == right_type].sort_values(["ts", "event_id"])
        if left.empty:
            return pd.DataFrame(
                {
                    "event_id": pd.Series([], dtype="int64"),
                    "user_id": pd.Series([], dtype="int64"),
                    "ts": pd.Series([], dtype="datetime64[us]"),
                    "last_right_ts": pd.Series([], dtype="datetime64[us]"),
                }
            )
        out = pd.merge_asof(
            left[["event_id", "user_id", "ts"]],
            right[["ts"]].rename(columns={"ts": "last_right_ts"}),
            left_on="ts",
            right_on="last_right_ts",
            direction="backward",
            allow_exact_matches=True,
        )
        return out

    return ds.groupby("user_id").map_groups(per_user, batch_format="pandas")


def range_join_trailing_count(
    sf_dir: str, anchor_type: str = "error", window_minutes: int = 5
) -> ray.data.Dataset:
    """Range join within the events log: for every ``anchor_type`` event,
    count the user's events with ts in [anchor_ts - window, anchor_ts]
    (inclusive both ends — mirrored in the oracle). Per-user group +
    vectorized ``searchsorted`` over the sorted ts array; same
    partitioning assumption as the as-of join."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "event_type", "ts"]
    )
    w = np.timedelta64(window_minutes * 60 * 1_000_000, "us")

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        all_ts = g["ts"].to_numpy()
        anchors = g[g["event_type"] == anchor_type]
        if anchors.empty:
            return pd.DataFrame(
                {
                    "event_id": pd.Series([], dtype="int64"),
                    "user_id": pd.Series([], dtype="int64"),
                    "ts": pd.Series([], dtype="datetime64[us]"),
                    "n_in_window": pd.Series([], dtype="int64"),
                }
            )
        a_ts = anchors["ts"].to_numpy()
        lo = np.searchsorted(all_ts, a_ts - w, side="left")
        hi = np.searchsorted(all_ts, a_ts, side="right")
        return pd.DataFrame(
            {
                "event_id": anchors["event_id"].to_numpy(),
                "user_id": anchors["user_id"].to_numpy(),
                "ts": a_ts,
                "n_in_window": (hi - lo).astype("int64"),
            }
        )

    return ds.groupby("user_id").map_groups(per_user, batch_format="pandas")


def sessionize(sf_dir: str, gap_minutes: int = 30) -> ray.data.Dataset:
    """Session windows per user: a new session starts when the gap from the
    previous event exceeds ``gap_minutes``. Output: one row per session
    (user_id, session_id, n_events, t_start, t_end).

    Partitioning assumption: one user's events fit in one group (true for
    per-user event streams; a pathological single-user firehose would need
    time-sharded pre-sessionization plus a stitch pass).
    """
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )
    gap = np.timedelta64(gap_minutes * 60 * 1_000_000, "us")

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        ts = g["ts"].to_numpy()
        brk = np.ones(len(g), dtype=np.int64)
        if len(g) > 1:
            brk[1:] = (ts[1:] - ts[:-1] > gap).astype(np.int64)
        sess = np.cumsum(brk)
        g = g.assign(session_id=sess)
        out = (
            g.groupby("session_id")
            .agg(
                user_id=("user_id", "first"),
                n_events=("event_id", "size"),
                t_start=("ts", "min"),
                t_end=("ts", "max"),
            )
            .reset_index()
        )
        return out[["user_id", "session_id", "n_events", "t_start", "t_end"]]

    return ds.groupby("user_id").map_groups(per_user, batch_format="pandas")
