"""Per-group top-k and exact distributed quantiles (relational ops)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def test_grouped_topk_matches_window_reference(ray_session, sf_dir):
    """Combiner-pruned per-group top-k must equal the serial row_number
    window reference (value desc, event_id asc per user)."""
    from grate_ray.pipelines.relational import grouped_topk

    got = (
        grouped_topk(sf_dir, k=3)
        .to_pandas()
        .sort_values(["user_id", "rank"])
        .reset_index(drop=True)
    )
    ev = pd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "value"]
    )
    ev = ev.sort_values(
        ["user_id", "value", "event_id"], ascending=[True, False, True]
    )
    ev["rank"] = ev.groupby("user_id").cumcount() + 1
    want = ev[ev["rank"] <= 3].sort_values(["user_id", "rank"]).reset_index(drop=True)
    assert len(got) == len(want) > 0
    for col in ("user_id", "event_id", "rank"):
        assert got[col].tolist() == want[col].tolist(), col


def test_exact_quantiles_multi_level_refinement(ray_session, tmp_path):
    """A tiny max_pull forces ≥2 histogram refinement levels; answers must
    still be the exact k-th smallest (k = ceil(q·n)) — including under a
    heavily skewed value distribution where most mass lands in one bin."""
    from grate_ray.pipelines.relational import exact_quantiles

    rng = np.random.default_rng(3)
    # skew: 90% of values packed into a narrow band, long tail above
    vals = np.concatenate(
        [
            rng.uniform(1000.0, 1001.0, 45_000),
            rng.uniform(0.0, 100_000.0, 5_000),
        ]
    )
    t = pa.table(
        {
            "o_orderkey": pa.array(np.arange(len(vals)), pa.int64()),
            "o_totalprice": pa.array(vals, pa.float64()),
        }
    )
    d = tmp_path / "q"
    d.mkdir()
    pq.write_table(t, d / "orders.parquet")

    got = exact_quantiles(
        str(d), qs=(0.5, 0.9, 0.99), nbins=16, max_pull=500
    ).to_pydict()
    s = np.sort(vals)
    n = len(s)
    for q, v in zip(got["q"], got["value"]):
        frac = {"p50": 0.5, "p90": 0.9, "p99": 0.99}[q]
        k = int(np.ceil(frac * n))
        assert v == float(s[k - 1]), (q, v, float(s[k - 1]))


def test_profile_table_with_nulls(ray_session, tmp_path):
    """Profile stats must be exact under nulls: n counts all rows, n_null
    per column, distinct excludes nulls, min/max render canonically."""
    from grate_ray.pipelines.relational import profile_table

    t = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "event_type": pa.array(["b", None, "a", "b", None]),
            "user_id": pa.array([10, 10, None, 30, 30], pa.int64()),
            "value": pa.array([2.5, None, 0.1, 2.5, -3.0], pa.float64()),
        }
    )
    d = tmp_path / "ev"
    d.mkdir()
    pq.write_table(t, d / "events.parquet")

    df = profile_table(str(d)).to_pandas().set_index("col")
    assert df.loc["event_id"].tolist() == [5, 0, 5, "1", "5"]
    assert df.loc["event_type"].tolist() == [5, 2, 2, "a", "b"]
    assert df.loc["user_id"].tolist() == [5, 1, 2, "10", "30"]
    assert df.loc["value"].tolist() == [5, 1, 3, "-3.000000", "2.500000"]


def test_watermark_tumbling_matches_serial(ray_session):
    """Distributed two-phase prefix-max watermark equals the serial
    running-max semantics on a disordered stream (including cross-bucket
    carryover of the watermark)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from grate_ray.context import configure_shuffle
    from grate_ray.pipelines.windows import watermark_tumbling

    configure_shuffle(8)
    rng = np.random.default_rng(13)
    n = 5_000
    arrival = np.arange(n, dtype=np.int64)
    # event time mostly advances with arrival but jitters backwards
    base = arrival * 60_000_000  # one event per minute
    jitter = rng.integers(-40, 5, n) * 60_000_000  # up to 40 min behind
    ts = np.maximum(base + jitter, 0)

    win_us = 3600_000_000
    late_us = 600_000_000
    wm = np.maximum.accumulate(ts)
    late = ts < wm - late_us
    w = (ts // win_us) * win_us
    exp = {}
    for wi, li in zip(w, late):
        a, b = exp.get(wi, (0, 0))
        exp[wi] = (a + (0 if li else 1), b + (1 if li else 0))

    t = pa.table(
        {
            "event_id": pa.array(arrival),
            "ts": pa.array(ts).cast(pa.timestamp("us")),
        }
    )
    out = (
        watermark_tumbling(
            ray.data.from_arrow(t), minutes=60, lateness_minutes=10, n_buckets=16
        )
        .to_pandas()
        .set_index("w")
        .sort_index()
    )
    got = {
        int(k.value // 1000): (int(r["n_on_time"]), int(r["n_late"]))
        for k, r in out.iterrows()
    }
    got_us = {int(k): v for k, v in got.items()}
    exp_us = {int(k): v for k, v in exp.items()}
    assert got_us == exp_us
    assert sum(v[1] for v in exp.values()) > 100  # disorder actually bites


def test_global_rank_exact(ray_session):
    """Dense global rank equals the serial argsort ranking; conversations
    never straddle range boundaries (all rows of a conv in one part)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from grate_ray.context import configure_shuffle
    from grate_ray.pipelines.relational import global_rank

    configure_shuffle(8)
    rng = np.random.default_rng(9)
    convs = [f"conv{i}" for i in rng.permutation(37)]
    rows = [(c, int(t)) for c in convs for t in rng.permutation(5)]
    rng.shuffle(rows)
    t = pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        }
    )
    out = (
        global_rank(ray.data.from_arrow(t).repartition(6), num_parts=7)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    want = sorted(rows)
    assert list(zip(out["conv_id"], out["turn_idx"])) == want
    # the rank column must be exactly the position in the sorted order
    assert out.sort_values("rank")[["conv_id", "turn_idx"]].values.tolist() == [
        list(r) for r in want
    ]
    assert sorted(out["rank"]) == list(range(len(rows)))


def test_table_diff_semantics(ray_session):
    """I/U/D classification, null-safe compare (null==null emits no
    change; null→value and value→null emit U)."""
    import pyarrow as pa
    import ray.data

    from grate_ray.context import configure_shuffle
    from grate_ray.pipelines.relational import table_diff

    configure_shuffle(8)
    old = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "text": pa.array(["a", "b", None, "d", None], pa.string()),
        }
    )
    new = pa.table(
        {
            "doc_id": pa.array([2, 3, 4, 5, 6], pa.int64()),
            "text": pa.array(["b2", None, None, "e", "f"], pa.string()),
        }
    )
    out = (
        table_diff(
            ray.data.from_arrow(old).repartition(2),
            ray.data.from_arrow(new).repartition(3),
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    got = {
        (int(r.doc_id), r.change_op, r.text if r.text == r.text else None)
        for r in out.itertuples()
    }
    assert got == {
        (1, "D", "a"),   # only in old
        (2, "U", "b2"),  # changed
        # 3: null == null → no change
        (4, "U", None),  # value → null
        (5, "U", "e"),   # null → value
        (6, "I", "f"),   # only in new
    }


def test_grouped_quantile_edge_qs(ray_session, sf_dir):
    """quantile_disc edge cases: q=0 must return each group's MINIMUM
    (not index into the previous group — the ceil(0·n)−1 regression),
    q=1 the maximum, q=0.5 the disc median (element at ceil(n/2)−1)."""
    from grate_ray.pipelines.relational import grouped_quantile

    ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "value"])
    ev = ev.dropna(subset=["value"])

    for q, ref in [
        (0.0, ev.groupby("user_id")["value"].min()),
        (1.0, ev.groupby("user_id")["value"].max()),
        (
            0.5,
            ev.sort_values(["user_id", "value"])
            .groupby("user_id")["value"]
            .apply(lambda s: s.iloc[int(np.ceil(0.5 * len(s))) - 1]),
        ),
    ]:
        got = (
            grouped_quantile(sf_dir, q=q)
            .to_pandas()
            .sort_values("user_id")
            .set_index("user_id")["q_value"]
        )
        want = ref.sort_index()
        assert len(got) == len(want) > 0
        assert np.allclose(got.to_numpy(), want.to_numpy()), f"q={q}"


def test_grouped_quantile_cont_interpolates(ray_session, sf_dir):
    from grate_ray.pipelines.relational import grouped_quantile_cont

    ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "value"])
    ev = ev.dropna(subset=["value"])
    got = (
        grouped_quantile_cont(sf_dir, q=0.9)
        .to_pandas()
        .sort_values("user_id")
        .set_index("user_id")["q_value"]
    )
    want = ev.groupby("user_id")["value"].quantile(0.9, interpolation="linear")
    assert len(got) == len(want) > 0
    assert np.allclose(got.to_numpy(), want.sort_index().to_numpy(), atol=1e-6)


def test_uniform_sample_deterministic_hash_order(ray_session, sf_dir):
    import hashlib

    from grate_ray.pipelines.relational import uniform_sample

    got = uniform_sample(sf_dir, n=100).to_pandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])
    h = ev["event_id"].map(lambda e: hashlib.md5(str(e).encode()).hexdigest())
    want = ev.loc[h.sort_values().index[:100], "event_id"].tolist()
    assert sorted(got["event_id"].tolist()) == sorted(want)
    # re-run identical (no RNG anywhere)
    again = uniform_sample(sf_dir, n=100).to_pandas()
    assert sorted(again["event_id"].tolist()) == sorted(want)


def test_rolling_mean_matches_pandas_window(ray_session, sf_dir):
    from grate_ray.pipelines.windows import rolling_mean

    got = (
        rolling_mean(sf_dir, k=4)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    ev = pd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "value"],
    ).sort_values(["user_id", "ts", "event_id"])
    ref = (
        ev.groupby("user_id")["value"]
        .rolling(4, min_periods=1)
        .mean()
        .reset_index(level=0, drop=True)
    )
    ev["want"] = ref
    ev = ev.sort_values("event_id").reset_index(drop=True)
    assert len(got) == len(ev) > 0
    a = got["rolling_avg"].to_numpy(dtype=float)
    b = ev["want"].to_numpy(dtype=float)
    assert np.allclose(a, b, atol=1e-6, equal_nan=True)


def test_event_transitions_match_pandas_bigrams(ray_session, sf_dir):
    from grate_ray.pipelines.windows import event_transitions

    got = (
        event_transitions(sf_dir)
        .to_pandas()
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )
    ev = pd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "event_type", "ts"],
    ).sort_values(["user_id", "ts", "event_id"])
    ev["src"] = ev.groupby("user_id")["event_type"].shift(1)
    want = (
        ev.dropna(subset=["src"])
        .groupby(["src", "event_type"], as_index=False)
        .size()
        .rename(columns={"event_type": "dst", "size": "n"})
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    assert (got["n"].to_numpy() == want["n"].to_numpy()).all()


def test_ntile_exact_sql_tile_sizing(ray_session, sf_dir):
    """SQL NTILE: first n%k tiles get ceil(n/k) rows — verify per-user
    tile sizes and that each user's tile sizes differ by at most 1."""
    from grate_ray.pipelines.windows import ntile_stats

    got = ntile_stats(sf_dir, tiles=4).to_pandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "value"])
    nn = ev.dropna(subset=["value"]).groupby("user_id").size()
    for uid, g in got.groupby("user_id"):
        n = nn[uid]
        base, rem = divmod(n, 4)
        expect = sorted(
            [base + 1] * rem + [base] * (4 - rem) if base else [1] * rem
        )
        assert sorted(g["n"].tolist()) == [x for x in expect if x > 0]
    assert got["n"].sum() == nn.sum()
