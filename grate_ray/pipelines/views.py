"""Incremental materialized-view maintenance over the lake changefeed.

The CDC payoff feature: a downstream aggregate ("view") is kept current
by applying only the NET CHANGES between two commits — retract the old
row's contribution, add the new one — never recomputing from the full
state. Correctness leans on ``lake_changes(include_old=True)`` emitting
exactly one (old, new) pair per winner-moved key:

    view@B = view@A  −  f(old rows of U/D)  +  f(new rows of I/U)

which is exact for any commutative, invertible aggregate (counts, sums).
"""

from __future__ import annotations

import pandas as pd

import ray
import ray.data

from ..context import configure_shuffle
from .ingest import lake_changes, read_lake


def turn_counts_view(lake_dir: str, asof_lsn: int | None = None) -> ray.data.Dataset:
    """The base view: live-turn counts per (conv_id, role) at a commit
    point — per-batch partial counts (combiner), one keyed repartition,
    final reduce per block."""
    configure_shuffle(16)
    state = read_lake(lake_dir, asof_lsn=asof_lsn, columns=["conv_id", "role"])
    return _reduce_counts(
        state.map_batches(_partial_counts, batch_format="pandas")
    )


def incremental_turn_counts(
    lake_dir: str, from_lsn: int, to_lsn: int
) -> ray.data.Dataset:
    """Maintain the (conv_id, role) turn-count view from ``from_lsn`` to
    ``to_lsn`` INCREMENTALLY: base view at the from-commit, plus ±1
    deltas derived from the changefeed (I: +new, D: −old, U: −old +new).
    Only winner-moved keys flow; the full to-state is never re-read.
    The driver query's oracle is the full recompute at ``to_lsn`` — the
    equality IS the incremental-maintenance correctness proof."""
    configure_shuffle(16)
    base = read_lake(
        lake_dir, asof_lsn=from_lsn, columns=["conv_id", "role"]
    ).map_batches(_partial_counts, batch_format="pandas")

    changes = lake_changes(lake_dir, from_lsn, to_lsn, include_old=True)

    def deltas(df: pd.DataFrame) -> pd.DataFrame:
        add = df[df["change_op"].isin(["I", "U"])]
        sub = df[df["change_op"].isin(["D", "U"])]
        return pd.concat(
            [
                pd.DataFrame(
                    {
                        "conv_id": add["conv_id"].to_numpy(),
                        "role": add["role"].fillna("").to_numpy(),
                        "n": 1,
                    }
                ),
                pd.DataFrame(
                    {
                        "conv_id": sub["conv_id"].to_numpy(),
                        "role": sub["old_role"].fillna("").to_numpy(),
                        "n": -1,
                    }
                ),
            ],
            ignore_index=True,
        ).astype({"n": "int64"})

    delta_ds = changes.map_batches(deltas, batch_format="pandas")
    return _reduce_counts(base.union(delta_ds))


def _partial_counts(df: pd.DataFrame) -> pd.DataFrame:
    g = (
        df.assign(role=df["role"].fillna(""))
        .groupby(["conv_id", "role"], sort=False)
        .size()
        .reset_index(name="n")
    )
    g["n"] = g["n"].astype("int64")
    return g


def _reduce_counts(ds: ray.data.Dataset) -> ray.data.Dataset:
    co = ds.repartition(16, keys=["conv_id"])

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    "conv_id": pd.Series([], dtype="object"),
                    "role": pd.Series([], dtype="object"),
                    "n_turns": pd.Series([], dtype="int64"),
                }
            )
        out = (
            df.groupby(["conv_id", "role"], sort=True)["n"]
            .sum()
            .reset_index(name="n_turns")
        )
        out = out[out["n_turns"] > 0].reset_index(drop=True)
        out["n_turns"] = out["n_turns"].astype("int64")
        return out

    return co.map_batches(final, batch_format="pandas", batch_size=None)
