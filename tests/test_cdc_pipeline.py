"""End-to-end CDC replay on Ray Data vs the in-memory oracle (golden-state
tests; the analogue of the reference's golden-tsv loops,
/root/reference/xls/simple_test.go:45-91)."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from grate_ray.genlog import GenSpec, generate_binlog, oracle_final_state
from grate_ray.pipelines.cdc import apply_binlog, read_binlog, replay
from grate_ray.stages.partition import find_hot_keys


def _assert_matches_oracle(ds, binlog_dir, check_tool=True):
    got = ds.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    import os

    tables = [
        pq.read_table(os.path.join(binlog_dir, f))
        for f in sorted(os.listdir(binlog_dir))
        if f.endswith(".parquet")
    ]
    want = oracle_final_state(tables).to_pandas()
    assert len(got) == len(want), (len(got), len(want))
    for col in ["conv_id", "turn_idx", "role", "text"] + (["tool"] if check_tool else []):
        assert got[col].tolist() == want[col].tolist(), col
    assert got["ts"].tolist() == want["ts"].tolist()


@pytest.mark.usefixtures("ray_session")
def test_replay_matches_oracle(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("binlog1"))
    generate_binlog(d, GenSpec(num_events=30_000, num_convs=200, seed=42, chunk_rows=7_000))
    ds = replay(d, num_partitions=8)
    _assert_matches_oracle(ds, d)


@pytest.mark.usefixtures("ray_session")
def test_replay_mixed_epochs(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("binlog2"))
    generate_binlog(
        d,
        GenSpec(num_events=20_000, num_convs=100, seed=5, epoch0_frac=0.4, chunk_rows=6_000),
    )
    ds = replay(d, num_partitions=8)
    _assert_matches_oracle(ds, d)


@pytest.mark.usefixtures("ray_session")
def test_replay_salted_hot_key(tmp_path_factory):
    # zipf_a close to 1 → conv0 takes a large share of events
    d = str(tmp_path_factory.mktemp("binlog3"))
    generate_binlog(
        d, GenSpec(num_events=25_000, num_convs=150, seed=9, zipf_a=1.05, chunk_rows=9_000)
    )
    ds_in = read_binlog(d)
    hot = find_hot_keys(ds_in, threshold_frac=0.05)
    assert "conv0" in hot  # the Zipf head must be detected
    out = apply_binlog(read_binlog(d), num_partitions=8, hot_keys=hot, num_salts=4)
    _assert_matches_oracle(out, d)


@pytest.mark.usefixtures("ray_session")
def test_output_sorted_within_partition(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("binlog4"))
    generate_binlog(d, GenSpec(num_events=5_000, num_convs=40, seed=2, chunk_rows=5_000))
    # batches need not align with partition groups, but within any batch the
    # rows of one conversation must be contiguous and turn-ordered (the
    # row-major iteration contract, /root/reference/commonxl/sheet.go:111-126)
    for batch in replay(d, num_partitions=4).iter_batches(batch_format="pyarrow"):
        df = batch.to_pandas()
        seen = []
        for conv, g in df.groupby("conv_id", sort=False):
            assert g["turn_idx"].is_monotonic_increasing, conv
            assert (g.index.to_numpy()[1:] - g.index.to_numpy()[:-1] == 1).all(), conv
            seen.append(conv)
        assert len(seen) == len(set(seen))


@pytest.mark.usefixtures("ray_session")
def test_find_hot_keys_sees_tail_only_hot_key():
    # a conversation that blows up LATE in the log (after the old 250k-row
    # prefix) must still be detected: sampling is lsn % 64 == 0 across the
    # whole stream, not a limit() prefix scan
    import numpy as np
    import ray

    n = 320_000
    conv = np.array([f"conv{i % 997}" for i in range(n)], dtype=object)
    conv[270_000:] = "tailhot"  # ~15.6% of events, all past row 270k
    t = pa.table(
        {
            "conv_id": pa.array(conv, pa.string()),
            "lsn": pa.array(np.arange(n, dtype=np.int64)),
        }
    )
    hot = find_hot_keys(ray.data.from_arrow(t), threshold_frac=0.05)
    assert "tailhot" in hot
    # no cold key sneaks in: each conv{i} holds ~0.08% of events
    assert all(k == "tailhot" for k in hot)


def test_count_min_sketch_properties():
    """Overestimate-only, exact when unsaturated, merge == bulk add."""
    import numpy as np

    from grate_ray.functions.sketch import CountMin

    rng = np.random.default_rng(3)
    keys = [f"k{i}" for i in range(300)]
    counts = rng.integers(1, 50, len(keys))
    cm = CountMin(4, 4096)
    cm.add(keys, counts)
    est = cm.query(keys)
    assert (est >= counts).all()          # never underestimates
    assert (est <= counts + counts.sum()).all()
    # wide sketch vs 300 keys: collisions negligible → exact for most
    assert (est == counts).mean() > 0.95

    half = len(keys) // 2
    a, b = CountMin(4, 4096), CountMin(4, 4096)
    a.add(keys[:half], counts[:half])
    b.add(keys[half:], counts[half:])
    assert (a.merge(b).table == cm.table).all()

    rt = CountMin.from_row(cm.to_row())
    assert (rt.query(keys) == est).all()


def test_find_hot_keys_cms_full_stream(ray_session):
    """CMS detector finds a hot key that exists ONLY in the log's tail
    and one spread thinly across every batch — the cases sampling or
    per-batch top-k can degrade on; cold keys stay cold."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from grate_ray.stages.partition import find_hot_keys_cms

    rng = np.random.default_rng(9)
    n = 60_000
    keys = np.array([f"conv{i}" for i in rng.integers(0, 2000, n)], dtype=object)
    # hot key A: only in the final 8% of the log
    keys[int(n * 0.92):] = "hotA"
    # hot key B: every 12th event throughout (≈8.3% of the stream)
    keys[::12] = "hotB"
    t = pa.table({"conv_id": pa.array(list(keys), pa.string()),
                  "lsn": pa.array(np.arange(n), pa.int64())})
    ds = ray.data.from_arrow(t).repartition(16)
    hot = find_hot_keys_cms(ds, threshold_frac=0.05)
    assert "hotA" in hot and "hotB" in hot
    assert all(k in ("hotA", "hotB") for k in hot)


def test_heavy_hitters_exact_with_pruning(ray_session):
    """Sketch-pruned heavy hitters equal the exact GROUP BY answer —
    including a planted tail-only hot key; candidate false positives
    from sketch collisions cannot leak through the exact filter."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from grate_ray.context import configure_shuffle
    from grate_ray.stages.partition import heavy_hitters

    configure_shuffle(8)
    rng = np.random.default_rng(17)
    n = 40_000
    keys = np.array([f"c{i}" for i in rng.integers(0, 3000, n)], dtype=object)
    keys[int(n * 0.95):] = "tailhot"
    keys[::30] = "spreadhot"
    df = pd.Series(keys).value_counts()
    thr = 0.01
    exp = {k: int(v) for k, v in df.items() if v >= thr * n}

    t = pa.table({"conv_id": pa.array(list(keys), pa.string())})
    out = (
        heavy_hitters(
            ray.data.from_arrow(t).repartition(16), threshold_frac=thr, w=2048
        )
        .to_pandas()
        .set_index("conv_id")["n_events"]
        .to_dict()
    )
    assert out == exp and "tailhot" in out and "spreadhot" in out


@pytest.mark.usefixtures("ray_session")
def test_merge_source_streams_total_order(tmp_path_factory):
    """Two independent sources merge under lsn' = lsn*K + idx: a source-1
    event at the same (key, ts) as a source-0 event with the same local
    lsn must win (higher interleaved lsn), and per-source order is kept."""
    import ray

    from grate_ray.pipelines.cdc import merge_source_streams
    from grate_ray.stages.merge import finalize, lww_reduce

    ts = pa.array([1_000_000] * 3, pa.int64()).cast(pa.timestamp("us"))

    def mk(texts):
        return pa.table(
            {
                "op": pa.array(["I", "U", "U"], pa.string()),
                "lsn": pa.array([1, 2, 3], pa.int64()),
                "conv_id": pa.array(["c"] * 3, pa.string()),
                "turn_idx": pa.array([0, 0, 0], pa.int32()),
                "role": pa.array(["user"] * 3, pa.string()),
                "text": pa.array(texts, pa.string()),
                "tool": pa.array([None] * 3, pa.string()),
                "ts": ts,
            }
        )

    s0 = ray.data.from_arrow(mk(["a0", "b0", "c0"]))
    s1 = ray.data.from_arrow(mk(["a1", "b1", "c1"]))
    merged = merge_source_streams([s0, s1])
    t = pa.concat_tables(
        [ray.get(r) for r in merged.to_arrow_refs()],
        promote_options="default",
    )
    # interleave: per-source lsn order preserved, no collisions
    g = sorted(t["lsn"].to_pylist())
    assert len(set(g)) == 6
    assert t.column("source_id").null_count == 0
    # ties on ts resolve by global lsn: source-1 local-lsn-3 has glsn 7 → wins
    final = finalize(lww_reduce(t))
    assert final["text"].to_pylist() == ["c1"]


def test_scd2_history_serial_reference(ray_session):
    """SCD2 versions equal a serial per-key replay: I/U open versions,
    D closes without opening, reinsert after delete opens a new version,
    equal-ts ties order by lsn."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from grate_ray.context import configure_shuffle
    from grate_ray.pipelines.cdc import scd2_history

    ts0 = pd.Timestamp("2026-01-01")
    rows = []
    # key A: I, U, U  (3 versions, last current)
    for i, op in enumerate(["I", "U", "U"]):
        rows.append(("a", 0, op, 10 + i, ts0 + pd.Timedelta(seconds=i), f"a{i}"))
    # key B: I, D, I (reinsert) — 2 versions, first closed by D
    rows.append(("b", 1, "I", 20, ts0, "b0"))
    rows.append(("b", 1, "D", 21, ts0 + pd.Timedelta(seconds=1), None))
    rows.append(("b", 1, "I", 22, ts0 + pd.Timedelta(seconds=2), "b1"))
    # key C: equal ts, lsn breaks the tie; ends deleted — no current row
    rows.append(("c", 2, "I", 30, ts0, "c0"))
    rows.append(("c", 2, "U", 31, ts0, "c1"))
    rows.append(("c", 2, "D", 32, ts0, None))
    conv, turn, op, lsn, ts, text = zip(*rows)
    t = pa.table(
        {
            "op": pa.array(op),
            "lsn": pa.array(lsn, pa.int64()),
            "conv_id": pa.array(conv),
            "turn_idx": pa.array(np.array(turn, dtype=np.int32)),
            "role": pa.array(["r"] * len(rows)),
            "text": pa.array(text, pa.string()),
            "tool": pa.nulls(len(rows), pa.string()),
            "ts": pa.array(pd.to_datetime(list(ts)), pa.timestamp("us")),
        }
    )
    configure_shuffle(8)
    out = (
        scd2_history(ray.data.from_arrow(t).repartition(3), num_partitions=8)
        .to_pandas()
        .sort_values("lsn")
        .reset_index(drop=True)
    )
    exp = {
        # lsn: (valid_to, is_current)
        10: (11, 0), 11: (12, 0), 12: (None, 1),
        20: (21, 0), 22: (None, 1),
        30: (31, 0), 31: (32, 0),
    }
    assert len(out) == len(exp)
    for _, r in out.iterrows():
        vt, cur = exp[int(r.lsn)]
        got_vt = None if pd.isna(r.valid_to_lsn) else int(r.valid_to_lsn)
        assert got_vt == vt, (r.lsn, got_vt, vt)
        assert int(r.is_current) == cur, (r.lsn, r.is_current, cur)
