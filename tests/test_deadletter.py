"""Malformed-frame dead-lettering (FIXTURES.md F4): corrupted events are
quarantined with reasons; replay state still matches the oracle."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from grate_ray.genlog import GenSpec, generate_binlog, oracle_final_state
from grate_ray.pipelines.ingest import ingest, read_deadletter, read_lake
from grate_ray.stages.validate import split_valid


def test_split_valid_rules():
    t = pa.table(
        {
            "op": ["I", "X", "I", "D", None, "I"],
            "lsn": pa.array([1, 2, 3, 4, 5, None], pa.int64()),
            "conv_id": ["a", "b", None, "d", "e", "f"],
            "turn_idx": pa.array([0, 1, 2, -1, 3, 4], pa.int32()),
            "role": ["u"] * 6,
            "text": ["x"] * 6,
            "tool": [None] * 6,
            "ts": pa.array([10, 20, 30, 40, 50, 60], pa.int64()).cast(
                pa.timestamp("us")
            ),
        }
    )
    valid, dead = split_valid(t)
    assert valid["lsn"].to_pylist() == [1]
    reasons = dict(zip(dead["lsn"].to_pylist(), dead["reason"].to_pylist()))
    assert reasons[2] == "bad_op"
    assert reasons[3] == "bad_conv_id"
    assert reasons[4] == "bad_turn_idx"
    assert "bad_op" in reasons[5]
    assert reasons[None] == "null_lsn"


def test_null_ts_dead_letters():
    t = pa.table(
        {
            "op": ["I", "D"],
            "lsn": pa.array([1, 2], pa.int64()),
            "conv_id": ["a", "a"],
            "turn_idx": pa.array([0, 0], pa.int32()),
            "role": ["u", None],
            "text": ["x", None],
            "tool": [None, None],
            "ts": pa.array([None, None], pa.int64()).cast(pa.timestamp("us")),
        }
    )
    valid, dead = split_valid(t)
    assert valid.num_rows == 0
    assert set(dead["reason"].to_pylist()) == {"null_ts"}


@pytest.mark.usefixtures("ray_session")
def test_ingest_with_malformed_frames(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("mbinlog"))
    lake = str(tmp_path_factory.mktemp("mlake"))
    generate_binlog(
        d,
        GenSpec(
            num_events=10_000, num_convs=80, seed=77,
            malformed_frac=0.05, chunk_rows=2_500,
        ),
    )
    metrics = ingest(d, lake, num_partitions=8, files_per_microbatch=2)

    dl = read_deadletter(lake)
    assert dl is not None and dl.num_rows > 0
    assert set(dl["reason"].to_pylist()) <= {
        "bad_op", "null_lsn", "bad_conv_id", "bad_turn_idx", "null_ts",
        "bad_op+bad_conv_id", "bad_op+null_ts", "bad_conv_id+null_ts",
    }

    got = (
        read_lake(lake, num_partitions=8)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    tables = [
        pq.read_table(os.path.join(d, f))
        for f in sorted(os.listdir(d))
        if f.endswith(".parquet")
    ]
    want = oracle_final_state(tables).to_pandas()
    assert len(got) == len(want)
    assert got["text"].tolist() == want["text"].tolist()

    # valid events + dead-lettered events account for every source event
    mdf = metrics.to_pandas()
    assert mdf["n_events"].sum() + dl.num_rows == 10_000