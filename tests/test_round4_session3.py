"""Unit tests for the round-4 session-3 operator batch: CDC stream
diagnostics (out-of-order audit, key skew, first-op violations,
inter-arrival histogram), the Q3/Q4/Q13/Q14-shaped relational ops, the
two-pass broadcast scalers, and int8 quantization error — each pure
reduction kernel cross-checked against a trivially-correct in-memory
reference (SURVEY.md §5 golden-comparison strategy)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _binlog_table():
    # small adversarial stream: interleaved conversations, ts that go
    # BACKWARD in lsn order, keys whose first op is U or D
    rows = [
        # (lsn, conv, turn, op, ts_seconds)
        (0, "a", 0, "I", 100),
        (1, "b", 0, "U", 200),   # first op for (b,0) is U → violation
        (2, "a", 0, "U", 90),    # late: older than running max (100)
        (3, "a", 1, "D", 150),   # first op for (a,1) is D → violation
        (4, "b", 0, "I", 200),   # ts tie with lsn 1 → NOT late (strict <)
        (5, "a", 0, "U", 100),   # equals running max → NOT late
        (6, "b", 1, "I", 205),
        (7, "b", 1, "U", 1230),  # gap 1025 s → bucket floor(log2(1025))=10
        (8, "a", 2, "I", 151),   # gap vs lsn 5: 51 s → bucket 5
    ]
    return pa.table(
        {
            "op": pa.array([r[3] for r in rows], pa.string()),
            "lsn": pa.array([r[0] for r in rows], pa.int64()),
            "conv_id": pa.array([r[1] for r in rows], pa.string()),
            "turn_idx": pa.array([r[2] for r in rows], pa.int32()),
            "role": pa.array(["user"] * len(rows), pa.string()),
            "text": pa.array(["t"] * len(rows), pa.string()),
            "tool": pa.array([None] * len(rows), pa.string()),
            "ts": pa.array(
                [r[4] * 1_000_000 for r in rows], pa.int64()
            ).cast(pa.timestamp("us")),
        }
    )


@pytest.fixture(scope="module")
def binlog_ds(ray_session):
    import ray.data

    from grate_ray.context import configure_shuffle

    # keyed repartition requires HASH_SHUFFLE on the context a dataset is
    # CREATED under — set it before from_arrow, as queries() does
    configure_shuffle(8)
    return ray.data.from_arrow(_binlog_table())


def test_out_of_order_counts(binlog_ds):
    from grate_ray.pipelines.cdc import out_of_order_counts

    got = (
        out_of_order_counts(binlog_ds)
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    # conv a: events lsn 0,2,3,5,8 → late lsn 2 (90 < 100) and lsn 5
    #   (100 < running max 150 set by lsn 3)
    # conv b: events lsn 1,4,6,7 → lsn 4 ts==200 TIES the max → not late
    assert got["conv_id"].tolist() == ["a", "b"]
    assert got["n_events"].tolist() == [5, 4]
    assert got["n_late"].tolist() == [2, 0]


def test_key_skew_topk_and_share(binlog_ds):
    from grate_ray.pipelines.cdc import key_skew

    got = key_skew(binlog_ds, k=1).to_pandas()
    # conv a has 5 of 9 events; ties impossible here
    assert len(got) == 1
    assert got["conv_id"][0] == "a"
    assert got["n_events"][0] == 5
    assert abs(got["share"][0] - round(5 / 9, 6)) < 1e-12


def test_first_op_violations(binlog_ds):
    from grate_ray.pipelines.cdc import first_op_violations

    got = (
        first_op_violations(binlog_ds)
        .to_pandas()
        .sort_values("first_op")
        .reset_index(drop=True)
    )
    # (a,1) first op D; (b,0) first op U — (a,0),(a,2),(b,1) start with I
    assert got["first_op"].tolist() == ["D", "U"]
    assert got["n_keys"].tolist() == [1, 1]


def test_interarrival_hist_buckets(binlog_ds):
    from grate_ray.pipelines.cdc import interarrival_hist

    got = (
        interarrival_hist(binlog_ds)
        .to_pandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    # conv a gaps (lsn order 0,2,3,5,8): -10, 60, -50, 51 → pos: 60→5, 51→5
    # conv b gaps (1,4,6,7): 0, 5, 1025 → pos: 5→2, 1025→10
    exp = {2: 1, 5: 2, 10: 1}
    assert dict(zip(got["bucket"], got["n"])) == exp


def test_interarrival_second_boundary_semantics(ray_session):
    # 1.9s → 2.1s crosses ONE second boundary (date_diff semantics), not
    # floor(0.2s)=0; 1.1s → 1.9s crosses none
    import ray.data

    from grate_ray.context import configure_shuffle
    from grate_ray.pipelines.cdc import interarrival_hist

    configure_shuffle(8)
    t = _binlog_table().to_pandas()
    t = t.iloc[:3].copy()
    t["conv_id"] = "x"
    t["lsn"] = [0, 1, 2]
    t["ts"] = pd.to_datetime([1_100_000, 1_900_000, 2_100_000], unit="us")
    ds = ray.data.from_arrow(pa.Table.from_pandas(t, preserve_index=False))
    got = interarrival_hist(ds).to_pandas()
    # only the 1.9→2.1 hop registers: one whole-second crossing → bucket 0
    assert dict(zip(got["bucket"], got["n"])) == {0: 1}


def _tpch_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("r4s3tpch")
    rng = np.random.RandomState(7)
    n_cust, n_ord, n_li = 40, 120, 360
    cust = pa.table(
        {
            "c_custkey": pa.array(np.arange(n_cust, dtype=np.int64)),
            "c_name": pa.array([f"c{i}" for i in range(n_cust)], pa.string()),
            "c_nationkey": pa.array((np.arange(n_cust) % 5).astype(np.int32)),
            "c_acctbal": pa.array(rng.uniform(0, 1000, n_cust)),
            "c_mktsegment": pa.array(
                np.array(["BUILDING", "AUTOMOBILE"])[np.arange(n_cust) % 2],
                pa.string(),
            ),
        }
    )
    odate = pd.Timestamp("1996-01-01").value // 1000 + rng.randint(
        0, 4 * 365, n_ord
    ) * 86_400_000_000
    orders = pa.table(
        {
            "o_orderkey": pa.array(np.arange(n_ord, dtype=np.int64)),
            "o_custkey": pa.array(rng.randint(0, n_cust, n_ord).astype(np.int64)),
            "o_orderstatus": pa.array(["O"] * n_ord, pa.string()),
            "o_totalprice": pa.array(rng.uniform(100, 9000, n_ord)),
            "o_orderdate": pa.array(odate, pa.int64()).cast(pa.timestamp("us")),
            "o_orderpriority": pa.array(
                np.array(["1-URGENT", "3-MEDIUM"])[np.arange(n_ord) % 2], pa.string()
            ),
        }
    )
    lok = rng.randint(0, n_ord, n_li).astype(np.int64)
    sdate = odate[lok] + rng.randint(1, 200, n_li) * 86_400_000_000
    li = pa.table(
        {
            "l_orderkey": pa.array(lok),
            "l_partkey": pa.array(rng.randint(0, 30, n_li).astype(np.int64)),
            "l_suppkey": pa.array(np.zeros(n_li, dtype=np.int64)),
            "l_linenumber": pa.array(np.arange(n_li, dtype=np.int32)),
            "l_quantity": pa.array(rng.randint(1, 50, n_li).astype(np.float64)),
            "l_extendedprice": pa.array(rng.uniform(10, 5000, n_li)),
            "l_discount": pa.array(rng.uniform(0, 0.1, n_li)),
            "l_tax": pa.array(np.zeros(n_li)),
            "l_returnflag": pa.array(["N"] * n_li, pa.string()),
            "l_linestatus": pa.array(["O"] * n_li, pa.string()),
            "l_shipdate": pa.array(sdate, pa.int64()).cast(pa.timestamp("us")),
        }
    )
    part = pa.table(
        {
            "p_partkey": pa.array(np.arange(30, dtype=np.int64)),
            "p_name": pa.array([f"p{i}" for i in range(30)], pa.string()),
            "p_brand": pa.array(["B"] * 30, pa.string()),
            "p_type": pa.array(
                np.array(["PROMO", "STANDARD", "ECONOMY"])[np.arange(30) % 3],
                pa.string(),
            ),
            "p_size": pa.array(np.ones(30, dtype=np.int32)),
            "p_retailprice": pa.array(np.ones(30)),
        }
    )
    for name, t in (
        ("customer", cust), ("orders", orders), ("lineitem", li), ("part", part)
    ):
        pq.write_table(t, str(d / f"{name}.parquet"))
    return str(d), cust.to_pandas(), orders.to_pandas(), li.to_pandas(), part.to_pandas()


@pytest.fixture(scope="module")
def tpch(tmp_path_factory, ray_session):
    return _tpch_dir(tmp_path_factory)


def test_ship_priority_matches_naive(tpch):
    from grate_ray.pipelines.relational import ship_priority

    d, cust, orders, li, _ = tpch
    got = ship_priority(d, k=5).to_pandas()
    cut = pd.Timestamp("1998-07-01")
    j = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey").merge(
        cust, left_on="o_custkey", right_on="c_custkey"
    )
    j = j[
        (j["c_mktsegment"] == "BUILDING")
        & (j["o_orderdate"] < cut)
        & (j["l_shipdate"] > cut)
    ]
    j["rev"] = j["l_extendedprice"] * (1 - j["l_discount"])
    g = (
        j.groupby(["l_orderkey", "o_orderdate", "o_orderpriority"], as_index=False)[
            "rev"
        ]
        .sum()
        .sort_values(["rev", "l_orderkey"], ascending=[False, True])
        .head(5)
    )
    assert got["l_orderkey"].tolist() == g["l_orderkey"].tolist()
    np.testing.assert_allclose(got["revenue"], g["rev"].round(2), atol=0.011)


def test_late_orders_matches_naive(tpch):
    from grate_ray.pipelines.relational import late_orders_by_priority

    d, _, orders, li, _ = tpch
    got = (
        late_orders_by_priority(d, days=90)
        .to_pandas()
        .sort_values("o_orderpriority")
        .reset_index(drop=True)
    )
    mx = li.groupby("l_orderkey", as_index=False)["l_shipdate"].max()
    j = orders.merge(mx, left_on="o_orderkey", right_on="l_orderkey")
    late = j[j["l_shipdate"] > j["o_orderdate"] + pd.Timedelta(days=90)]
    exp = (
        late.groupby("o_orderpriority")
        .size()
        .reset_index(name="n")
        .sort_values("o_orderpriority")
    )
    assert got["o_orderpriority"].tolist() == exp["o_orderpriority"].tolist()
    assert got["n_late"].tolist() == exp["n"].tolist()


def test_customer_order_counts_includes_zero_bucket(tpch):
    from grate_ray.pipelines.relational import customer_order_counts

    d, cust, orders, _, _ = tpch
    got = customer_order_counts(d).to_pandas()
    per_cust = orders.groupby("o_custkey").size()
    exp = per_cust.value_counts().to_dict()
    zeros = len(cust) - len(per_cust)
    if zeros:
        exp[0] = zeros
    assert dict(zip(got["c_count"], got["custdist"])) == exp


def test_promo_share_matches_naive(tpch):
    from grate_ray.pipelines.relational import promo_share

    d, _, _, li, part = tpch
    got = promo_share(d).to_pandas().sort_values("month").reset_index(drop=True)
    j = li.merge(part, left_on="l_partkey", right_on="p_partkey")
    j["rev"] = j["l_extendedprice"] * (1 - j["l_discount"])
    j["month"] = j["l_shipdate"].values.astype("datetime64[M]")
    g = j.groupby("month").apply(
        lambda x: x.loc[x["p_type"] == "PROMO", "rev"].sum() / x["rev"].sum(),
        include_groups=False,
    )
    exp = g.sort_index()
    np.testing.assert_allclose(got["promo_share"], exp.values, atol=1e-6)


def test_value_outliers_and_minmax(ray_session, tmp_path_factory):
    from grate_ray.pipelines.relational import value_minmax_scaled, value_outliers

    d = tmp_path_factory.mktemp("r4s3ev")
    n = 500
    rng = np.random.RandomState(3)
    v = rng.normal(10, 2, n)
    v[::97] += 40  # plant outliers
    t = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": pa.array(
                np.arange(n, dtype=np.int64) * 1_000_000
            ).cast(pa.timestamp("us")),
            "user_id": pa.array(np.zeros(n, dtype=np.int64)),
            "event_type": pa.array(
                np.array(["x", "y"])[np.arange(n) % 2], pa.string()
            ),
            "value": pa.array(v),
            "props": pa.array(["{}"] * n, pa.string()),
        }
    )
    pq.write_table(t, str(d / "events.parquet"))

    got = value_outliers(str(d)).to_pandas()
    df = t.to_pandas()
    exp = {}
    for ty, g in df.groupby("event_type"):
        mu, sd = g["value"].mean(), g["value"].std(ddof=0)
        k = int((np.abs(g["value"] - mu) > 3 * sd).sum())
        if k:
            exp[ty] = k
    assert dict(zip(got["event_type"], got["n_outliers"])) == exp

    scaled = value_minmax_scaled(str(d)).to_pandas().sort_values("event_id")
    for ty, g in df.groupby("event_type"):
        mn, mx = g["value"].min(), g["value"].max()
        expv = (g["value"] - mn) / (mx - mn)
        gotv = scaled.set_index("event_id").loc[g.index, "scaled"]
        np.testing.assert_allclose(gotv.values, expv.values, atol=1e-12)


def test_embedding_quantize_roundtrip(ray_session, tmp_path_factory):
    from grate_ray.functions.embed import embedding_quantize

    d = tmp_path_factory.mktemp("r4s3emb")
    rng = np.random.RandomState(5)
    vecs = rng.normal(0, 1, (20, 8)).astype(np.float32)
    vecs[3] = 0.0  # all-zero vector → mse exactly 0
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(20, dtype=np.int64)),
            "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
            "label": pa.array(np.zeros(20, dtype=np.int32)),
        }
    )
    pq.write_table(t, str(d / "embeddings.parquet"))
    got = embedding_quantize(str(d)).to_pandas().sort_values("vec_id")
    x = vecs.astype(np.float64)
    mx = np.abs(x).max(axis=1)
    safe = np.where(mx == 0, 1.0, mx)
    q = np.trunc(x * 127 / safe[:, None] + np.copysign(0.5, x))
    dq = q * safe[:, None] / 127
    mse = np.where(mx == 0, 0.0, ((x - dq) ** 2).mean(axis=1))
    np.testing.assert_allclose(got["mse"].values, np.round(mse, 12), atol=1e-12)
    assert got["mse"].iloc[3] == 0.0


def test_label_cohesion_algebraic_identity(ray_session, tmp_path_factory):
    # the (‖Σx̂‖²−n)/2 collapse must equal the naive pairwise mean
    from grate_ray.functions.embed import label_cohesion

    d = tmp_path_factory.mktemp("r4s3coh")
    rng = np.random.RandomState(11)
    vecs = rng.normal(0, 1, (30, 6)).astype(np.float32)
    labels = (np.arange(30) % 3).astype(np.int32)
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(30, dtype=np.int64)),
            "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
            "label": pa.array(labels),
        }
    )
    pq.write_table(t, str(d / "embeddings.parquet"))
    got = label_cohesion(str(d)).to_pandas().sort_values("label")
    x = vecs.astype(np.float64)
    xh = x / np.linalg.norm(x, axis=1, keepdims=True)
    for lab in range(3):
        g = xh[labels == lab]
        sims = [
            g[i] @ g[j] for i in range(len(g)) for j in range(i + 1, len(g))
        ]
        exp = np.mean(sims)
        assert abs(got.set_index("label").loc[lab, "mean_cosine"] - exp) < 1e-6


def test_readability_counts(ray_session):
    import ray.data

    from grate_ray.functions.text import readability

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(
                ["Hello there!! How are you? fine...", "", "aeiou xyz"],
                pa.string(),
            ),
        }
    )
    got = (
        readability(ray.data.from_arrow(docs))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["n_tokens"].tolist() == [6, 0, 2]
    assert got["n_sentences"].tolist() == [3, 0, 0]
    assert got["n_syllables"].tolist() == [10, 0, 1]
    # doc 0: 206.835 - 1.015*(6/3) - 84.6*(10/6)
    assert abs(got["flesch"][0] - round(206.835 - 1.015 * 2 - 84.6 * 10 / 6, 6)) < 1e-9


def test_doc_length_hist(ray_session):
    import ray.data

    from grate_ray.functions.text import doc_length_hist

    texts = ["w", "a b", "a b c d", "", "one two three four five six seven eight"]
    docs = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    got = doc_length_hist(ray.data.from_arrow(docs)).to_pandas()
    # token counts 1,2,4,(0 dropped),8 → buckets 0,1,2,3
    assert dict(zip(got["bucket"], got["n_docs"])) == {0: 1, 1: 1, 2: 1, 3: 1}


def test_role_transitions_segment_bounded(ray_session):
    import ray.data

    from grate_ray.context import configure_shuffle
    from grate_ray.pipelines.cdc import role_transitions

    configure_shuffle(8)
    state = pa.table(
        {
            "conv_id": pa.array(["a", "a", "a", "b", "b"], pa.string()),
            "turn_idx": pa.array([0, 1, 2, 0, 1], pa.int32()),
            "role": pa.array(
                ["user", "assistant", "user", "user", "assistant"], pa.string()
            ),
            "text": pa.array(["x"] * 5, pa.string()),
            "tool": pa.array([None] * 5, pa.string()),
            "ts": pa.array([0] * 5, pa.int64()).cast(pa.timestamp("us")),
        }
    )
    got = role_transitions(ray.data.from_arrow(state)).to_pandas()
    pairs = {
        (r, n): c for r, n, c in zip(got["role"], got["next_role"], got["n"])
    }
    # a: user→assistant, assistant→user; b: user→assistant.
    # NO a-last→b-first cross-conversation bigram.
    assert pairs == {("user", "assistant"): 2, ("assistant", "user"): 1}


def test_supplier_pct_rank_ties(ray_session, tmp_path_factory):
    from grate_ray.pipelines.relational import supplier_pct_rank

    d = tmp_path_factory.mktemp("r4s3sup")
    t = pa.table(
        {
            "s_suppkey": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "s_name": pa.array([f"s{i}" for i in range(5)], pa.string()),
            "s_nationkey": pa.array([0, 0, 0, 0, 1], pa.int32()),
            "s_acctbal": pa.array([10.0, 20.0, 20.0, 30.0, 5.0]),
        }
    )
    pq.write_table(t, str(d / "supplier.parquet"))
    got = supplier_pct_rank(str(d)).to_pandas().sort_values("s_suppkey")
    # nation 0: ranks 1,2,2,4 → pct (rank-1)/3 = 0, 1/3, 1/3, 1
    np.testing.assert_allclose(
        got["pct_rank"].tolist(), [0.0, 1 / 3, 1 / 3, 1.0, 0.0], atol=1e-12
    )
