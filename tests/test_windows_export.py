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
