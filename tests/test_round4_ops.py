"""Unit tests for the round-4 session-2 operator batch: the pure
reduction kernels are cross-checked against trivially-correct in-memory
references (the same golden-comparison strategy as the reference's
simple_test.go fixtures — SURVEY.md §5)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _events_table():
    # deterministic small event stream: 4 users × interleaved types with
    # consecutive duplicates and ts ties (event_id breaks them)
    n = 200
    eid = np.arange(n, dtype=np.int64)
    return pa.table(
        {
            "event_id": pa.array(eid),
            "ts": pa.array((1_700_000_000_000_000 + (eid // 3) * 1_000_000)).cast(
                pa.timestamp("us")
            ),
            "user_id": pa.array(eid % 4),
            "event_type": pa.array(
                np.array(["view", "view", "click", "purchase"])[(eid // 2) % 4],
                pa.string(),
            ),
            "value": pa.array((eid % 7).astype(np.float64)),
            "props": pa.array(["{}"] * n, pa.string()),
        }
    )


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("r4ops")
    pq.write_table(_events_table(), str(d / "events.parquet"))
    return str(d)


def test_collapse_repeats_matches_naive(ray_session, events_dir):
    from grate_ray.pipelines.windows import collapse_repeats

    got = (
        collapse_repeats(events_dir)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    df = _events_table().to_pandas().sort_values(["user_id", "ts", "event_id"])
    exp = []
    for u, g in df.groupby("user_id"):
        runs = int((g["event_type"] != g["event_type"].shift()).sum())
        exp.append({"user_id": u, "n_events": len(g), "n_runs": runs})
    exp = pd.DataFrame(exp).sort_values("user_id").reset_index(drop=True)
    assert got["n_events"].tolist() == exp["n_events"].tolist()
    assert got["n_runs"].tolist() == exp["n_runs"].tolist()


def test_bigram_topk_document_bounded(ray_session):
    """A bigram must never span two documents, and counts are global."""
    import ray.data

    from grate_ray.functions.search import bigram_topk

    docs = ray.data.from_arrow(
        pa.table(
            {
                "text": pa.array(
                    [
                        "a b c",   # ab, bc
                        "c a b",   # ca, ab
                        "b",       # no bigram
                        "",        # no bigram
                        "a  b",    # double space → empty token blocks the pair
                    ],
                    pa.string(),
                )
            }
        )
    )
    got = bigram_topk(docs, k=10).to_pandas()
    counts = dict(zip(got["bigram"], got["n"]))
    assert counts == {"a b": 2, "b c": 1, "c a": 1}


def test_first_last_event_tie_break(ray_session, events_dir):
    """ts ties must resolve by event_id on both ends."""
    from grate_ray.pipelines.relational import first_last_event

    got = (
        first_last_event(events_dir)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    df = _events_table().to_pandas().sort_values(["ts", "event_id"])
    for _, row in got.iterrows():
        g = df[df["user_id"] == row["user_id"]]
        assert row["first_type"] == g.iloc[0]["event_type"]
        assert row["last_type"] == g.iloc[-1]["event_type"]


def test_superseded_counts_conserve_events(ray_session):
    """Σ superseded + #keys == total events, and per-op splits match a
    naive replay."""
    import ray.data

    from grate_ray.pipelines.cdc import superseded_counts

    n = 300
    lsn = np.arange(n, dtype=np.int64)
    t = pa.table(
        {
            "op": pa.array(np.where(lsn % 11 == 3, "D", np.where(lsn % 2 == 0, "I", "U"))),
            "lsn": pa.array(lsn),
            "conv_id": pa.array(np.char.add("c", (lsn % 7).astype("U2"))),
            "turn_idx": pa.array((lsn % 5).astype(np.int32)),
            "role": pa.array(["user"] * n, pa.string()),
            "text": pa.array((lsn % 13).astype("U4")),
            "tool": pa.array([None] * n, pa.string()),
            "ts": pa.array(1_700_000_000_000_000 + lsn * 1000).cast(pa.timestamp("us")),
        }
    )
    got = superseded_counts(ray.data.from_arrow(t), num_partitions=4).to_pandas()
    df = t.to_pandas()
    winners = df.sort_values(["ts", "lsn"]).groupby(["conv_id", "turn_idx"]).tail(1)
    naive = (
        df.groupby("op").size() - winners.groupby("op").size().reindex(df["op"].unique(), fill_value=0)
    ).dropna()
    exp = {k: int(v) for k, v in naive.items() if v > 0}
    assert dict(zip(got["op"], got["superseded"])) == exp
    assert int(got["superseded"].sum()) + len(winners) == n
