"""Window operators + lake export."""

import os

import numpy as np
import pandas as pd
import pytest

from grate_ray.pipelines.windows import sessionize, tumbling_counts


@pytest.mark.usefixtures("ray_session")
def test_tumbling_window_counts(sf_dir):
    out = tumbling_counts(sf_dir).to_pandas()
    assert (out["n"] > 0).all()
    # windows align to the hour
    assert (out["w"].dt.minute == 0).all()
    assert (out["w"].dt.second == 0).all()
    import pyarrow.parquet as pq

    total = pq.read_metadata(f"{sf_dir}/events.parquet").num_rows
    assert out["n"].sum() == total


@pytest.mark.usefixtures("ray_session")
def test_sessionize_gap_semantics(sf_dir):
    out = sessionize(sf_dir, gap_minutes=30).to_pandas()
    # sessions per user are 1..k consecutive, spans non-overlapping in order
    for uid, g in out.groupby("user_id"):
        g = g.sort_values("session_id")
        assert g["session_id"].tolist() == list(range(1, len(g) + 1))
        starts = g["t_start"].to_numpy()
        ends = g["t_end"].to_numpy()
        assert (ends >= starts).all()
        if len(g) > 1:
            gaps = starts[1:] - ends[:-1]
            assert (gaps > np.timedelta64(30 * 60, "s")).all()
    import pyarrow.parquet as pq

    total = pq.read_metadata(f"{sf_dir}/events.parquet").num_rows
    assert out["n_events"].sum() == total


@pytest.mark.usefixtures("ray_session")
def test_export_lake(tmp_path_factory):
    from grate_ray.genlog import GenSpec, generate_binlog
    from grate_ray.pipelines.ingest import export_lake, ingest

    d = str(tmp_path_factory.mktemp("ebinlog"))
    lake = str(tmp_path_factory.mktemp("elake"))
    out = str(tmp_path_factory.mktemp("eout"))
    generate_binlog(d, GenSpec(num_events=3_000, num_convs=30, seed=4, chunk_rows=3_000))
    ingest(d, lake, num_partitions=4, files_per_microbatch=1)
    n = export_lake(lake, out, num_partitions=4, fmt="csv")
    assert n > 0
    files = [f for f in os.listdir(out) if f.endswith(".csv")]
    assert files
    got = pd.concat(pd.read_csv(os.path.join(out, f)) for f in files)
    assert len(got) == n
    assert set(got.columns) == {"conv_id", "turn_idx", "role", "text", "tool", "ts"}


def test_export_jsonl_roundtrip(ray_session, tmp_path_factory):
    """JSONL export (the LLM-training interchange format): one object per
    row, values round-trip through pandas read_json, incremental skip
    still applies."""
    from grate_ray.genlog import GenSpec, generate_binlog
    from grate_ray.pipelines.ingest import (
        export_lake_incremental, ingest, read_lake,
    )

    d = str(tmp_path_factory.mktemp("jbinlog"))
    lake = str(tmp_path_factory.mktemp("jlake"))
    out = str(tmp_path_factory.mktemp("jout"))
    generate_binlog(d, GenSpec(num_events=3_000, num_convs=30, seed=5, chunk_rows=3_000))
    ingest(d, lake, num_partitions=4, files_per_microbatch=1)
    r = export_lake_incremental(lake, out, fmt="jsonl")
    assert r["exported"]
    files = sorted(f for f in os.listdir(out) if f.endswith(".jsonl"))
    assert files
    got = pd.concat(
        pd.read_json(os.path.join(out, f), lines=True,
                     dtype={"conv_id": str}, convert_dates=["ts"])
        for f in files
    )
    exp = read_lake(lake).to_pandas()
    assert len(got) == len(exp)
    g = got.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    e = exp.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert (g["text"].fillna("") == e["text"].fillna("")).all()
    assert (g["ts"].dt.tz_localize(None) == e["ts"]).all()
    # unchanged lake: second export writes nothing
    r2 = export_lake_incremental(lake, out, fmt="jsonl")
    assert r2["exported"] == []


def test_funnel_semantics(ray_session, tmp_path, monkeypatch):
    """First-touch funnel: strictly-after ordering, within-window cutoff,
    and partition independence on a hand-built stream."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from grate_ray.pipelines.windows import funnel

    t0 = pd.Timestamp("2026-01-01").value // 1000
    MIN = 60 * 1_000_000
    rows = [
        # user 1: full funnel within windows
        (1, "view", t0), (1, "click", t0 + 10 * MIN), (1, "purchase", t0 + 30 * MIN),
        # user 2: click BEFORE view → stops after view
        (2, "click", t0), (2, "view", t0 + 5 * MIN),
        # user 3: click too late (>120min after view) → stops after view
        (3, "view", t0), (3, "click", t0 + 121 * MIN),
        # user 4: view+click, purchase exactly at the 120min edge (<=) → counts
        (4, "view", t0), (4, "click", t0 + 60 * MIN),
        (4, "purchase", t0 + 180 * MIN),
        # user 5: never views
        (5, "purchase", t0),
    ]
    u, e, ts = zip(*rows)
    t = pa.table(
        {
            "user_id": pa.array(u, pa.int64()),
            "event_type": pa.array(e),
            "ts": pa.array(np.array(ts, dtype="datetime64[us]")),
            "value": pa.array([1.0] * len(u)),
        }
    )
    d = tmp_path / "ev"
    d.mkdir()
    pq.write_table(t, str(d / "events.parquet"))
    out = (
        funnel(str(d), steps=("view", "click", "purchase"), within_minutes=120)
        .to_pandas()
        .set_index("step")
        .sort_index()
    )
    assert out.loc[1, "n_users"] == 4  # users 1-4 view
    assert out.loc[2, "n_users"] == 2  # users 1, 4 (2's click precedes its
    #                                    view; 3's click is past the window)
    assert out.loc[3, "n_users"] == 2  # users 1 and 4 (120min edge inclusive)


def test_window_distinct_exact_two_level_skew(ray_session, tmp_path):
    """Correctness AND skew-resistance of the two-level exact distinct:
    plant one hot window holding 50% of ALL users; per-bucket partial
    counts (the first hop's peak block payload) must stay O(distinct/B)
    instead of the hot window's whole distinct set landing in one block."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from grate_ray.pipelines.windows import (
        _window_bucket_partials,
        window_distinct_exact,
    )

    rng = np.random.default_rng(11)
    n_users = 20_000
    hot_users = np.arange(n_users // 2)                      # 50% of users
    cold = rng.integers(0, n_users, 4_000)
    base = pd.Timestamp("2026-03-01").value // 1000          # µs
    hour = 3_600 * 1_000_000
    ts = np.concatenate(
        [
            np.full(len(hot_users), base + hour),            # ONE hot window
            base + (rng.integers(2, 26, len(cold)) * hour),  # 24 cold windows
        ]
    )
    users = np.concatenate([hot_users, cold])
    t = pa.table(
        {
            "event_id": pa.array(np.arange(len(users)), pa.int64()),
            "user_id": pa.array(users.astype(np.int64)),
            "ts": pa.array(ts.astype("datetime64[us]")),
        }
    )
    d = tmp_path / "sk"
    d.mkdir()
    pq.write_table(t, d / "events.parquet")

    B = 16
    got = (
        window_distinct_exact(str(d), minutes=60, n_buckets=B)
        .to_pandas()
        .sort_values("w")
        .reset_index(drop=True)
    )
    df = pd.DataFrame({"w": ts // hour * hour, "u": users})
    want = (
        df.groupby("w")["u"].nunique().sort_index().rename("n_users")
    )
    assert got["n_users"].tolist() == want.tolist()
    assert got["n_users"].max() == len(hot_users)  # the hot window is there

    # peak first-hop block payload: per-(w,bucket) distinct counts must be
    # ~distinct/B, not the whole hot window in one block
    parts = _window_bucket_partials(
        ray.data.read_parquet(str(d / "events.parquet"), columns=["ts", "user_id"]),
        hour, 32, B,
    ).to_pandas()
    hot_total = len(hot_users)
    assert parts["n_partial"].max() <= 3 * hot_total // B
    assert parts["n_partial"].sum() == want.sum()
