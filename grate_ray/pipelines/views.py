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
import pyarrow.compute as pc

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


# --- incremental secondary index (content fingerprint → key) -----------------


def text_index_view(lake_dir: str, asof_lsn: int | None = None) -> ray.data.Dataset:
    """Secondary index over live lake text at a commit point: one row
    per live (conv_id, turn_idx) with the 64-bit content fingerprint
    (``fingerprint64`` ≡ DuckDB md5_number_lower) — the relation the
    exact-dedup / content-lookup family probes. Embarrassingly parallel
    projection over the reconstructed state."""
    import pyarrow as pa

    from ..functions.text import fingerprint64

    state = read_lake(
        lake_dir, asof_lsn=asof_lsn, columns=["conv_id", "turn_idx", "text"]
    )

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "fp": fingerprint64(
                    t["text"].combine_chunks()
                    if isinstance(t["text"], pa.ChunkedArray)
                    else t["text"]
                ),
                "conv_id": t["conv_id"],
                "turn_idx": t["turn_idx"],
            }
        )

    return state.map_batches(project, batch_format="pyarrow")


def incremental_text_index(
    lake_dir: str, from_lsn: int, to_lsn: int
) -> ray.data.Dataset:
    """Maintain the content-fingerprint index from ``from_lsn`` to
    ``to_lsn`` INCREMENTALLY from the changefeed — the non-aggregate
    counterpart of ``incremental_turn_counts`` (an index row set is
    maintainable under deletes, unlike a min/argmin aggregate):

        index@B = (index@A  ∖  keys touched by any change)
                   ∪  fingerprint(new live rows of I/U)

    One keyed co-location by conv_id; the anti-join (base minus touched
    keys) and the union both happen in the same vectorized block pass.
    Only winner-moved keys flow; the full to-state is never re-read.
    The driver oracle is the full recompute at ``to_lsn``."""
    import numpy as np
    import pyarrow as pa

    from ..functions.text import fingerprint64

    configure_shuffle(16)
    base = text_index_view(lake_dir, asof_lsn=from_lsn).map_batches(
        lambda t: t.append_column("kind", pa.array([0] * t.num_rows, pa.int8())),
        batch_format="pyarrow",
    )
    changes = lake_changes(lake_dir, from_lsn, to_lsn)

    def touch_and_add(t: pa.Table) -> pa.Table:
        # every changed key is a removal (kind=1); I/U rows re-add their
        # new fingerprint (kind=2)
        out_fp, out_conv, out_turn, out_kind = [], [], [], []
        conv = t["conv_id"]
        turn = t["turn_idx"]
        n = t.num_rows
        out_fp.append(pa.array(np.zeros(n, np.uint64)))
        out_conv.append(conv)
        out_turn.append(turn)
        out_kind.append(pa.array(np.ones(n, np.int8)))
        live = pc.is_in(t["change_op"], value_set=pa.array(["I", "U"]))
        lt = t.filter(live)
        out_fp.append(
            fingerprint64(
                lt["text"].combine_chunks()
                if isinstance(lt["text"], pa.ChunkedArray)
                else lt["text"]
            )
        )
        out_conv.append(lt["conv_id"])
        out_turn.append(lt["turn_idx"])
        out_kind.append(pa.array(np.full(lt.num_rows, 2, np.int8)))
        return pa.table(
            {
                "fp": pa.concat_arrays(
                    [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in out_fp]
                ),
                "conv_id": pa.concat_arrays(
                    [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in out_conv]
                ),
                "turn_idx": pa.concat_arrays(
                    [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in out_turn]
                ),
                "kind": pa.concat_arrays(
                    [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in out_kind]
                ),
            }
        )

    delta = changes.map_batches(touch_and_add, batch_format="pyarrow")

    def apply_block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    "fp": pd.Series([], dtype="uint64"),
                    "conv_id": pd.Series([], dtype="object"),
                    "turn_idx": pd.Series([], dtype="int32"),
                }
            )
        # composite key via block-local factorize — NEVER string-concat
        # with a separator (pandas string ops silently drop NUL bytes,
        # and any printable separator can collide: 'conv3'+'40' ==
        # 'conv34'+'0')
        codes, _ = pd.factorize(df["conv_id"])
        key = pd.Series(
            codes.astype("int64") * 2_000_000_000
            + df["turn_idx"].to_numpy().astype("int64"),
            index=df.index,
        )
        touched = set(key[df["kind"] == 1])
        keep_base = (df["kind"] == 0) & ~key.isin(touched)
        out = df[keep_base | (df["kind"] == 2)]
        return pd.DataFrame(
            {
                "fp": out["fp"].astype("uint64").to_numpy(),
                "conv_id": out["conv_id"].to_numpy(),
                "turn_idx": out["turn_idx"].to_numpy(),
            }
        )

    return (
        base.union(delta)
        .repartition(16, keys=["conv_id"])
        .map_batches(apply_block, batch_format="pandas", batch_size=None)
    )


def content_lookup(
    lake_dir: str, texts: list[str], max_convs: int = 100_000
) -> ray.data.Dataset:
    """CONTENT → ROW lookup accelerated by the secondary index: the
    target texts fingerprint to a tiny broadcast set, ONE streaming
    ``is_in`` probe of the fingerprint index yields the candidate keys,
    and only the partitions that can hold those conversations are
    reconstructed (``read_lake(conv_ids=...)`` point pruning). A
    text-equality filter on the fetched rows removes any fingerprint
    collision, so results are exact: every live lake row whose text
    equals one of the targets.

    The driver never sees matched ROWS: candidate conv_ids are
    deduplicated IN-CLUSTER (per-block distinct, one keyed hop,
    per-block distinct again), so a degenerate probe (boilerplate text
    matching half the lake) pulls at most one row per matching
    conversation — and ``max_convs`` caps even that, raising instead of
    silently materializing an unbounded id list on the driver."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..context import configure_shuffle, join_partitions
    from ..functions.text import fingerprint64

    configure_shuffle(32)
    targets = pa.array([t or "" for t in texts], pa.string())
    fps = fingerprint64(targets)

    def probe_distinct(t: pa.Table) -> pa.Table:
        m = t.filter(pc.is_in(t["fp"], value_set=fps))
        return pa.table({"conv_id": m["conv_id"].combine_chunks().unique()})

    def block_distinct(t: pa.Table) -> pa.Table:
        return pa.table({"conv_id": t["conv_id"].combine_chunks().unique()})

    cand = (
        text_index_view(lake_dir)
        .map_batches(probe_distinct, batch_format="pyarrow")
        .repartition(join_partitions(16), keys=["conv_id"])
        .map_batches(block_distinct, batch_format="pyarrow", batch_size=None)
        .limit(max_convs + 1)  # driver pull bounded by the cap, not matches
        .to_pandas()
    )
    if len(cand) > max_convs:
        raise ValueError(
            f"content_lookup matched more than max_convs={max_convs} "
            "conversations — the probe text is too unselective to point-"
            "look-up; raise max_convs or use read_lake(filters=...) to "
            "stream the matches instead of materializing ids"
        )
    convs = sorted(cand["conv_id"]) if len(cand) else []
    if not convs:
        from ..schema import empty_lake_table

        return ray.data.from_arrow(empty_lake_table())
    rows = read_lake(lake_dir, conv_ids=convs)

    def exact(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t["text"], value_set=targets))

    return rows.map_batches(exact, batch_format="pyarrow")


def _cursor_path(cursor_dir: str, group: str) -> str:
    import os

    return os.path.join(cursor_dir, f"cursor-{group}.json")


def read_cursor(cursor_dir: str, group: str = "default") -> int:
    """This consumer group's acknowledged LSN (-1 = from the beginning)."""
    import json
    import os

    p = _cursor_path(cursor_dir, group)
    if not os.path.exists(p):
        return -1
    with open(p) as f:
        return json.load(f)["acked_lsn"]


def poll_changes(
    lake_dir: str, cursor_dir: str, group: str = "default"
) -> tuple[ray.data.Dataset | None, int, int]:
    """CONSUMER-GROUP changefeed poll: the net changes between this
    group's acknowledged cursor and the lake's current head commit.
    Returns (changes, from_lsn, to_lsn); changes is None when the group
    is already caught up. The cursor does NOT move here — call
    ``ack_changes(cursor_dir, to_lsn, group)`` after the batch is durably
    processed. Poll-then-ack gives the standard delivery ladder:
    at-least-once if the consumer crashes between processing and ack
    (the re-poll re-delivers the same net diff — deterministic, so
    idempotent consumers get exactly-once end to end)."""
    from ..state.manifest import committed_lsn, list_partitions

    acked = read_cursor(cursor_dir, group)
    heads = [
        committed_lsn(lake_dir, p) for p in list_partitions(lake_dir)
    ]
    heads = [h for h in heads if h is not None]
    if not heads:
        return None, acked, acked
    head = max(heads)
    if head <= acked:
        return None, acked, acked
    # acked = -1 (fresh group) resolves to an empty from-state, so the
    # first poll delivers every live row as an insert
    return lake_changes(lake_dir, acked, head), acked, head


def ack_changes(cursor_dir: str, to_lsn: int, group: str = "default") -> None:
    """Advance the group cursor (atomic temp+rename; monotonic — an ack
    below the current cursor is ignored, so replayed/laggard workers
    can't move the group backwards)."""
    import json
    import os
    import tempfile

    os.makedirs(cursor_dir, exist_ok=True)
    cur = read_cursor(cursor_dir, group)
    if to_lsn <= cur:
        return
    fd, tmp = tempfile.mkstemp(dir=cursor_dir, suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump({"acked_lsn": to_lsn}, f)
    os.replace(tmp, _cursor_path(cursor_dir, group))
