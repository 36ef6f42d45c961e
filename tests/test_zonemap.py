"""Zone-map data skipping: per-commit column stats in the manifest,
chain-union partition pruning, exact filtered reads (the Delta-log-style
stats-in-commit-metadata move recast over the lake's manifest chain)."""

import datetime
import json
import os

import pyarrow.compute as pc
import pytest

from grate_ray.genlog import GenSpec, generate_binlog
from grate_ray.pipelines.ingest import ingest, prune_partitions, read_lake
from grate_ray.state.manifest import (
    chain_stats,
    lineage,
    list_partitions,
    zone_may_match,
)

P = 8


@pytest.fixture(scope="module")
def zlake(tmp_path_factory, ray_session):
    d = str(tmp_path_factory.mktemp("zbinlog"))
    lake = str(tmp_path_factory.mktemp("zlake"))
    generate_binlog(
        d, GenSpec(num_events=8_000, num_convs=60, seed=7, chunk_rows=2_000)
    )
    ingest(d, lake, num_partitions=P, files_per_microbatch=2)
    return lake


def test_stats_written_on_every_data_commit(zlake):
    saw_data_commit = False
    for p in list_partitions(zlake):
        for m in lineage(zlake, p):
            if m.get("kind") in ("snapshot", "delta"):
                saw_data_commit = True
                st = m.get("stats")
                assert st is not None
                for col in ("conv_id", "turn_idx", "lsn", "ts"):
                    assert col in st
                    assert "min" in st[col] or st[col].get("all_null")
                # lsn range inside the commit's window
                assert st["lsn"]["min"] >= m["lsn_lo"]
                assert st["lsn"]["max"] <= m["lsn_hi"]
            elif m.get("kind") == "empty":
                assert m.get("stats") is None
    assert saw_data_commit


def test_chain_stats_bound_final_state(zlake):
    """The zone union must be a superset range of the reconstructed live
    state (the soundness invariant pruning relies on)."""
    from grate_ray.stages.merge import finalize
    from grate_ray.state.manifest import read_state

    checked = 0
    for p in list_partitions(zlake):
        zone = chain_stats(zlake, p)
        st = read_state(zlake, p)
        if zone is None or st is None or st.num_rows == 0:
            continue
        live = finalize(st)
        if live.num_rows == 0:
            continue
        for col in ("turn_idx", "ts"):
            mm = pc.min_max(live[col])
            if col == "ts":  # zone stats encode timestamps as epoch micros
                lo, hi = mm["min"].value, mm["max"].value
            else:
                lo, hi = mm["min"].as_py(), mm["max"].as_py()
            assert zone[col]["min"] <= lo and zone[col]["max"] >= hi
        checked += 1
    assert checked > 0


def test_zone_may_match_ops():
    zone = {"x": {"min": 5, "max": 10}, "dead": {"unknown": True}}
    assert zone_may_match(zone, "x", "==", 7)
    assert not zone_may_match(zone, "x", "==", 11)
    assert not zone_may_match(zone, "x", "<", 5)
    assert zone_may_match(zone, "x", "<", 6)
    assert not zone_may_match(zone, "x", "<=", 4)
    assert zone_may_match(zone, "x", "<=", 5)
    assert not zone_may_match(zone, "x", ">", 10)
    assert zone_may_match(zone, "x", ">", 9)
    assert not zone_may_match(zone, "x", ">=", 11)
    assert zone_may_match(zone, "x", ">=", 10)
    assert zone_may_match(zone, "x", "!=", 7)
    assert not zone_may_match({"x": {"min": 3, "max": 3}}, "x", "!=", 3)
    # unknown stats keep the partition (sound)
    assert zone_may_match(zone, "dead", "==", 1)
    # column recorded all-null everywhere: comparisons can never match
    assert not zone_may_match({"x": {"all_null": True}}, "x", "==", 1)
    # column NEVER seen in any chain stats (likely a typo): keep the
    # partition so the exact downstream filter raises on the unknown name
    assert zone_may_match(zone, "missing", "==", 1)


def test_prune_all_partitions_on_impossible_predicate(zlake):
    parts = list_partitions(zlake)
    kept = prune_partitions(zlake, parts, [("turn_idx", ">=", 10_000_000)])
    assert kept == []
    # the read returns an empty, well-formed dataset (schema preserved)
    ds = read_lake(zlake, filters=[("turn_idx", ">=", 10_000_000)])
    assert "conv_id" in ds.schema().names
    assert ds.count() == 0


def test_filtered_read_exact(zlake):
    full = read_lake(zlake).to_pandas()
    got = (
        read_lake(zlake, filters=[("role", "==", "user"), ("turn_idx", "<", 5)])
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    want = (
        full[(full["role"] == "user") & (full["turn_idx"] < 5)]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert got.equals(want)


def test_timestamp_filter_exact(zlake):
    full = read_lake(zlake).to_pandas()
    cut = full["ts"].quantile(0.5).to_pydatetime()
    got = (
        read_lake(zlake, filters=[("ts", ">=", cut)])
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    want = (
        full[full["ts"] >= cut]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert got.equals(want)
    # and an impossible future timestamp prunes every partition
    far = datetime.datetime(2100, 1, 1)
    assert prune_partitions(
        zlake, list_partitions(zlake), [("ts", ">=", far)]
    ) == []


def test_pre_stats_lake_degrades_to_no_pruning(zlake, tmp_path):
    # clone the manifest tree and strip stats (a lake written before the
    # zone-map feature): pruning must keep everything, reads stay exact
    import shutil

    old = str(tmp_path / "oldlake")
    shutil.copytree(zlake, old)
    for p in list_partitions(old):
        mdir = os.path.join(old, "_manifests", f"part={p}")
        for f in os.listdir(mdir):
            mp = os.path.join(mdir, f)
            with open(mp) as fh:
                m = json.load(fh)
            m.pop("stats", None)
            with open(mp, "w") as fh:
                json.dump(m, fh)
    parts = list_partitions(old)
    assert prune_partitions(old, parts, [("turn_idx", ">=", 10_000_000)]) == parts
    got = (
        read_lake(old, filters=[("role", "==", "assistant")])
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    full = read_lake(old).to_pandas()
    want = (
        full[full["role"] == "assistant"]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert got.equals(want)


def test_plan_read_reports_pruning(zlake):
    from grate_ray.pipelines.ingest import plan_read

    base = plan_read(zlake)
    assert base["pruned_by_key_hash"] == 0 == base["pruned_by_zone_map"]
    assert len(base["scanned_partitions"]) == base["committed_partitions"]
    zp = plan_read(zlake, filters=[("turn_idx", ">=", 10_000_000)])
    assert zp["pruned_by_zone_map"] == zp["committed_partitions"]
    assert zp["scanned_partitions"] == []
    kp = plan_read(zlake, conv_ids=["conv1"])
    assert kp["pruned_by_key_hash"] >= P - 1
    assert len(kp["scanned_partitions"]) <= 1


def test_backfill_stats_upgrades_old_lake(zlake, tmp_path):
    """Strip stats (pre-feature lake) → no pruning; backfill → pruning
    engages again and filtered reads stay exact."""
    import shutil

    from grate_ray.state.manifest import backfill_stats

    old = str(tmp_path / "upg")
    shutil.copytree(zlake, old)
    for p in list_partitions(old):
        mdir = os.path.join(old, "_manifests", f"part={p}")
        for f in os.listdir(mdir):
            mp = os.path.join(mdir, f)
            with open(mp) as fh:
                m = json.load(fh)
            m.pop("stats", None)
            with open(mp, "w") as fh:
                json.dump(m, fh)
    parts = list_partitions(old)
    assert prune_partitions(old, parts, [("turn_idx", ">=", 10**7)]) == parts
    n = backfill_stats(old)
    assert n > 0
    assert prune_partitions(old, parts, [("turn_idx", ">=", 10**7)]) == []
    # second run is a no-op
    assert backfill_stats(old) == 0
    got = (
        read_lake(old, filters=[("role", "==", "user")])
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    full = read_lake(old).to_pandas()
    want = (
        full[full["role"] == "user"]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert got.equals(want)


def test_typod_filter_column_raises_not_empty(zlake):
    """A filter on a column the lake has NEVER seen must surface the
    error (KeyError from the exact filter) instead of silently pruning
    every partition to an empty result."""
    import ray as _ray

    with pytest.raises((KeyError, _ray.exceptions.RayTaskError)):
        read_lake(zlake, filters=[("txet", "==", "x")]).count()
