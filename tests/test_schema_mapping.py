"""Column rename/drop schema evolution: stream-side rename reconciliation
(make_reconciler(renames=)) and the lake's persisted read-side column
mapping (evolve_lake_schema / read_lake logical view) — metadata-only,
Delta-column-mapping style."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from grate_ray.genlog import GenSpec, generate_binlog, oracle_final_state
from grate_ray.pipelines.cdc import replay
from grate_ray.pipelines.ingest import ingest, read_lake
from grate_ray.schema import BINLOG_SCHEMA
from grate_ray.stages.evolve import apply_renames, make_reconciler
from grate_ray.state.manifest import evolve_lake_schema, read_column_mapping

P = 8


def test_reconciler_applies_renames():
    t = pa.table(
        {
            "op": ["I"],
            "lsn": pa.array([1], pa.int64()),
            "conv_id": ["a"],
            "turn_idx": pa.array([0], pa.int32()),
            "speaker": ["user"],
            "content": ["hi"],
            "ts": pa.array([1], pa.int64()).cast(pa.timestamp("us")),
        }
    )
    rec = make_reconciler(
        BINLOG_SCHEMA, renames={"speaker": "role", "content": "text"}
    )
    out = rec(t)
    assert out.column_names == BINLOG_SCHEMA.names
    assert out["role"].to_pylist() == ["user"]
    assert out["text"].to_pylist() == ["hi"]
    assert out["tool"].null_count == 1  # added as all-null


def test_rename_protected_columns_rejected():
    from grate_ray.pipelines.cdc import schema_groups

    with pytest.raises(ValueError, match="key/envelope"):
        schema_groups("/nonexistent", renames={"conv_id": "cid"})


@pytest.mark.usefixtures("ray_session")
def test_replay_with_renamed_epoch(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("rnbinlog"))
    generate_binlog(
        d,
        GenSpec(num_events=6_000, num_convs=50, seed=11, epoch0_frac=0.0,
                chunk_rows=2_000),
    )
    files = sorted(f for f in os.listdir(d) if f.endswith(".parquet"))
    # rewrite the middle chunk as a legacy epoch: role→speaker, text→content
    legacy = os.path.join(d, files[1])
    t = pq.read_table(legacy)
    back = {"role": "speaker", "text": "content"}
    pq.write_table(
        t.rename_columns([back.get(n, n) for n in t.column_names]), legacy
    )

    got = (
        replay(d, num_partitions=P,
               renames={"speaker": "role", "content": "text"})
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    # oracle over name-normalized chunks
    tables = []
    for f in files:
        t = pq.read_table(os.path.join(d, f))
        tables.append(
            apply_renames(t, {"speaker": "role", "content": "text"})
        )
    want = oracle_final_state(tables).to_pandas()
    assert len(got) == len(want)
    for col in want.columns:
        assert got[col].tolist() == want[col].tolist(), col


@pytest.fixture()
def mlake(tmp_path_factory, ray_session):
    d = str(tmp_path_factory.mktemp("mbinlog"))
    lake = str(tmp_path_factory.mktemp("mlake"))
    generate_binlog(
        d, GenSpec(num_events=5_000, num_convs=40, seed=5, chunk_rows=2_500)
    )
    ingest(d, lake, num_partitions=P, files_per_microbatch=2)
    return lake


def test_lake_rename_and_drop_logical_view(mlake):
    base = read_lake(mlake).to_pandas().sort_values(
        ["conv_id", "turn_idx"]
    ).reset_index(drop=True)

    evolve_lake_schema(mlake, rename={"tool": "tool_name"})
    evolve_lake_schema(mlake, drop=["role"])

    got = read_lake(mlake).to_pandas().sort_values(
        ["conv_id", "turn_idx"]
    ).reset_index(drop=True)
    assert "tool_name" in got.columns and "tool" not in got.columns
    assert "role" not in got.columns
    assert got["tool_name"].tolist() == base["tool"].tolist()
    assert got["text"].tolist() == base["text"].tolist()

    # logical column projection and filters on a renamed column
    proj = read_lake(mlake, columns=["conv_id", "tool_name"]).to_pandas()
    assert sorted(proj.columns) == ["conv_id", "tool_name"]
    flt = read_lake(
        mlake, filters=[("tool_name", "==", base["tool"].dropna().iloc[0])]
    ).to_pandas()
    assert len(flt) > 0
    assert (flt["tool_name"] == base["tool"].dropna().iloc[0]).all()


def test_lake_rename_compose_and_validation(mlake):
    evolve_lake_schema(mlake, rename={"tool": "tool_a"})
    evolve_lake_schema(mlake, rename={"tool_a": "tool_b"})
    m = read_column_mapping(mlake)
    assert m["renames"] == {"tool": "tool_b"}  # composed, physical key kept

    with pytest.raises(ValueError, match="key/envelope"):
        evolve_lake_schema(mlake, rename={"conv_id": "cid"})
    with pytest.raises(ValueError, match="key/envelope"):
        evolve_lake_schema(mlake, drop=["ts"])
    with pytest.raises(ValueError, match="collides"):
        evolve_lake_schema(mlake, rename={"tool_b": "text"})
    with pytest.raises(ValueError, match="unknown column"):
        evolve_lake_schema(mlake, rename={"tool": "x"})  # old name is stale
    # rename back to the physical name removes the mapping entry
    evolve_lake_schema(mlake, rename={"tool_b": "tool"})
    assert read_column_mapping(mlake)["renames"] == {}
