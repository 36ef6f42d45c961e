"""Unit tests for the LWW merge kernels (no Ray needed)."""

import pyarrow as pa
import pytest

from grate_ray.genlog import GenSpec, _gen_chunk, oracle_final_state, to_epoch0
from grate_ray.schema import BINLOG_SCHEMA, LAKE_SCHEMA
from grate_ray.stages.evolve import reconcile, unify
from grate_ray.stages.merge import finalize, lww_reduce, merge_into_state


def mk(rows):
    """rows: list of (op, lsn, conv, turn, role, text, tool, ts_us)"""
    cols = list(zip(*rows))
    return pa.table(
        {
            "op": pa.array(cols[0], pa.string()),
            "lsn": pa.array(cols[1], pa.int64()),
            "conv_id": pa.array(cols[2], pa.string()),
            "turn_idx": pa.array(cols[3], pa.int32()),
            "role": pa.array(cols[4], pa.string()),
            "text": pa.array(cols[5], pa.string()),
            "tool": pa.array(cols[6], pa.string()),
            "ts": pa.array(cols[7], pa.int64()).cast(pa.timestamp("us")),
        },
        schema=BINLOG_SCHEMA,
    )


def test_lww_basic_upsert():
    t = mk(
        [
            ("I", 1, "a", 0, "user", "v1", None, 100),
            ("U", 2, "a", 0, "user", "v2", None, 200),
            ("I", 3, "b", 0, "user", "b1", None, 150),
        ]
    )
    out = finalize(lww_reduce(t))
    assert out["text"].to_pylist() == ["v2", "b1"]
    assert out["conv_id"].to_pylist() == ["a", "b"]


def test_lww_lsn_tiebreak_on_equal_ts():
    t = mk(
        [
            ("I", 5, "a", 0, "user", "low-lsn", None, 100),
            ("U", 9, "a", 0, "user", "high-lsn", None, 100),
        ]
    )
    assert finalize(lww_reduce(t))["text"].to_pylist() == ["high-lsn"]


def test_lww_out_of_order_ts_wins_over_later_lsn():
    t = mk(
        [
            ("I", 1, "a", 0, "user", "newer-ts", None, 500),
            ("U", 2, "a", 0, "user", "older-ts", None, 100),
        ]
    )
    assert finalize(lww_reduce(t))["text"].to_pylist() == ["newer-ts"]


def test_delete_tombstone_drops_key():
    t = mk(
        [
            ("I", 1, "a", 0, "user", "v1", None, 100),
            ("D", 2, "a", 0, None, None, None, 200),
            ("I", 3, "a", 1, "user", "stays", None, 100),
        ]
    )
    out = finalize(lww_reduce(t))
    assert out["text"].to_pylist() == ["stays"]


def test_update_after_delete_resurrects():
    t = mk(
        [
            ("I", 1, "a", 0, "user", "v1", None, 100),
            ("D", 2, "a", 0, None, None, None, 200),
            ("U", 3, "a", 0, "user", "back", None, 300),
        ]
    )
    assert finalize(lww_reduce(t))["text"].to_pylist() == ["back"]


def test_delete_of_never_inserted_key():
    t = mk([("D", 1, "ghost", 0, None, None, None, 100)])
    assert finalize(lww_reduce(t)).num_rows == 0


def test_merge_into_state_keeps_tombstone_across_commits():
    # chunk 1: insert then delete (delete has LATER ts)
    c1 = mk(
        [
            ("I", 1, "a", 0, "user", "v1", None, 100),
            ("D", 2, "a", 0, None, None, None, 500),
        ]
    )
    state = lww_reduce(c1)
    # chunk 2: late event with later lsn but EARLIER ts → tombstone must win
    c2 = mk([("U", 3, "a", 0, "user", "late", None, 200)])
    state = merge_into_state(state, lww_reduce(c2))
    assert finalize(state).num_rows == 0
    # a genuinely newer event resurrects
    c3 = mk([("I", 4, "a", 0, "user", "new", None, 600)])
    state = merge_into_state(state, lww_reduce(c3))
    assert finalize(state)["text"].to_pylist() == ["new"]


def test_reduce_matches_oracle_random():
    spec = GenSpec(num_events=20_000, num_convs=50, max_turns=16, seed=7)
    t = _gen_chunk(spec, 0, spec.num_events)
    got = finalize(lww_reduce(t))
    want = oracle_final_state([t])
    assert got.num_rows == want.num_rows
    got = got.combine_chunks()
    for col in want.column_names:
        assert got[col].to_pylist() == want[col].to_pylist(), col


def test_reduce_is_associative_across_chunks():
    spec = GenSpec(num_events=10_000, num_convs=30, max_turns=8, seed=11)
    t = _gen_chunk(spec, 0, spec.num_events)
    whole = finalize(lww_reduce(t))
    state = lww_reduce(t.slice(0, 3000))
    state = merge_into_state(state, lww_reduce(t.slice(3000, 4000)))
    state = merge_into_state(state, lww_reduce(t.slice(7000)))
    inc = finalize(state)
    assert inc.equals(whole.combine_chunks()) or (
        inc.to_pydict() == whole.to_pydict()
    )


def test_schema_evolution_epoch0_reconcile():
    spec = GenSpec(num_events=5_000, num_convs=20, seed=3)
    full = _gen_chunk(spec, 0, spec.num_events)
    e0 = to_epoch0(full.slice(0, 2500))
    e1 = full.slice(2500)
    target = unify([e0.schema, e1.schema])
    assert target.field("ts").type == pa.timestamp("us")
    assert "tool" in target.names
    r0, r1 = reconcile(e0, target), reconcile(e1, target)
    assert r0.schema.names == r1.schema.names
    merged = finalize(lww_reduce(pa.concat_tables([r0.select(r1.column_names), r1])))
    want = oracle_final_state([e0, e1])
    assert merged.num_rows == want.num_rows
    # epoch-0 rows have null tool and second-truncated ts
    assert merged["text"].to_pylist() == want["text"].to_pylist()
    assert merged["ts"].to_pylist() == want["ts"].to_pylist()


def test_empty_and_single_row():
    assert finalize(lww_reduce(BINLOG_SCHEMA.empty_table())).num_rows == 0
    one = mk([("I", 1, "a", 0, "user", "x", None, 1)])
    assert finalize(lww_reduce(one))["text"].to_pylist() == ["x"]
    assert finalize(one).schema.names == LAKE_SCHEMA.names


def test_unify_widening_properties():
    """evolve.unify: commutative join on the widening lattice."""
    import pyarrow as pa
    from grate_ray.stages.evolve import unify, reconcile

    s1 = pa.schema([("a", pa.int32()), ("b", pa.string())])
    s2 = pa.schema([("a", pa.int64()), ("c", pa.float32())])
    s3 = pa.schema([("a", pa.int8()), ("c", pa.float64()), ("d", pa.timestamp("us"))])
    for x, y in [(s1, s2), (s2, s3), (s1, s3)]:
        assert set(unify([x, y]).names) == set(unify([y, x]).names)
        for f in unify([x, y]):
            assert unify([y, x]).field(f.name).type == f.type
    u = unify([s1, s2, s3])
    assert u.field("a").type == pa.int64()
    assert u.field("c").type == pa.float64()
    # idempotent: unify with itself is identity
    assert unify([u, u]).equals(u)
    # reconcile to the union round-trips every schema's data
    t = pa.table({"a": pa.array([1], pa.int32()), "b": ["x"]}, schema=s1)
    r = reconcile(t, u)
    assert r["a"].type == pa.int64()
    assert r["c"].null_count == 1 and r["d"].null_count == 1


def test_unify_int_vs_timestamp_widens_to_timestamp():
    import pyarrow as pa
    from grate_ray.stages.evolve import unify

    s = unify([
        pa.schema([("ts", pa.int32())]),
        pa.schema([("ts", pa.timestamp("us"))]),
    ])
    assert s.field("ts").type == pa.timestamp("us")


def test_hll_accuracy_and_merge():
    """HLL estimate within ~3% at p=12; merge == union semantics."""
    import numpy as np
    from grate_ray.functions.sketch import (
        hll_estimate, hll_from_values, hll_merge,
    )

    vals = [f"key-{i}" for i in range(50_000)]
    est = hll_estimate(hll_from_values(vals))
    assert abs(est - 50_000) / 50_000 < 0.03, est
    # merge of disjoint halves == sketch of the union
    a = hll_from_values(vals[:25_000])
    b = hll_from_values(vals[25_000:])
    assert np.array_equal(hll_merge([a, b]), hll_from_values(vals))
    # merge with overlap doesn't double count
    c = hll_from_values(vals[:30_000])
    est2 = hll_estimate(hll_merge([a, c]))
    assert abs(est2 - 30_000) / 30_000 < 0.03, est2


def test_grouped_reduce_matches_pandas(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from grate_ray.context import configure_shuffle
    from grate_ray.functions.dedup import grouped_reduce

    configure_shuffle(8)
    rng = np.random.default_rng(0)
    n = 50_000
    df = pd.DataFrame(
        {
            "a": rng.integers(0, 500, n),
            "b": rng.integers(0, 50, n),
            "v": rng.integers(-100, 100, n),
        }
    )
    ds = ray.data.from_arrow(pa.Table.from_pandas(df)).map_batches(
        lambda t: t, batch_format="pyarrow", batch_size=1000
    )
    for val, red, ref in [
        (None, "sum", df.groupby(["a", "b"]).size()),
        ("v", "sum", df.groupby(["a", "b"])["v"].sum()),
        ("v", "min", df.groupby(["a", "b"])["v"].min()),
    ]:
        got = (
            grouped_reduce(ds, ["a", "b"], 8, val_col=val, reduce=red, out_col="x")
            .to_pandas()
            .set_index(["a", "b"])["x"]
            .sort_index()
        )
        expect = ref.sort_index().astype("int64")
        expect.name = "x"
        pd.testing.assert_series_equal(got, expect)


def test_windowed_approx_distinct_accuracy(ray_session):
    """Per-window HLL estimates land within sketch error of the true
    per-window distinct counts regardless of partitioning."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from grate_ray.context import configure_shuffle
    from grate_ray.functions.sketch import windowed_approx_distinct

    rng = np.random.default_rng(17)
    n = 40_000
    ts = pd.Timestamp("2026-01-01").value // 1000 + rng.integers(
        0, 6 * 3600, n
    ) * 1_000_000  # 6 one-hour windows
    users = rng.integers(0, 800, n)
    t = pa.table(
        {
            "ts": pa.array(ts.astype("datetime64[us]")),
            "user_id": pa.array(users.astype(np.int64)),
        }
    )
    configure_shuffle(8)
    out = (
        windowed_approx_distinct(
            ray.data.from_arrow(t).repartition(5), minutes=60, p=8
        )
        .to_pandas()
        .set_index("w")
        .sort_index()
    )
    df = pd.DataFrame({"w": ts - (ts % 3_600_000_000), "u": users})
    truth = df.groupby("w")["u"].nunique()
    assert len(out) == len(truth) == 6
    for w, true_n in truth.items():
        est = out.loc[pd.Timestamp(w, unit="us"), "approx_distinct"]
        assert abs(est - true_n) / true_n < 0.25, (w, est, true_n)
