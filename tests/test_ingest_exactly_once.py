"""Exactly-once sink, checkpoint/resume, lineage + metrics tests
(SURVEY.md §5 'manifest idempotence, resume-mid-stream kill test')."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from grate_ray.genlog import GenSpec, generate_binlog, oracle_final_state
from grate_ray.pipelines.ingest import ingest, read_lake
from grate_ray.state.manifest import (
    commit_partition,
    committed_lsn,
    gc_superseded_states,
    lineage,
    read_state,
)

P = 8  # partitions used throughout


def _oracle(binlog_dir):
    tables = [
        pq.read_table(os.path.join(binlog_dir, f))
        for f in sorted(os.listdir(binlog_dir))
        if f.endswith(".parquet")
    ]
    return oracle_final_state(tables)


def _assert_lake_matches(lake_dir, binlog_dir):
    got = (
        read_lake(lake_dir, num_partitions=P)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    want = _oracle(binlog_dir).to_pandas()
    assert len(got) == len(want)
    for col in want.columns:
        assert got[col].tolist() == want[col].tolist(), col


def test_manifest_commit_idempotent(tmp_path):
    lake = str(tmp_path / "lake")
    t = pa.table({"op": ["I"], "lsn": [1], "conv_id": ["a"], "turn_idx": [0]})
    m1 = commit_partition(lake, 3, 0, 99, t, {"n": 1})
    # second commit with DIFFERENT state must be a no-op (same key)
    t2 = pa.table({"op": ["I"], "lsn": [2], "conv_id": ["b"], "turn_idx": [1]})
    m2 = commit_partition(lake, 3, 0, 99, t2, {"n": 2})
    assert m1 == m2
    assert read_state(lake, 3)["conv_id"].to_pylist() == ["a"]
    assert committed_lsn(lake, 3) == 99


@pytest.mark.usefixtures("ray_session")
def test_ingest_full_matches_oracle(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ibinlog"))
    lake = str(tmp_path_factory.mktemp("ilake"))
    generate_binlog(d, GenSpec(num_events=12_000, num_convs=100, seed=21, chunk_rows=3_000))
    metrics = ingest(d, lake, num_partitions=P, files_per_microbatch=2)
    _assert_lake_matches(lake, d)
    mdf = metrics.to_pandas()
    assert not mdf["skipped"].any()
    # every event counted exactly once across all partition commits
    assert mdf["n_events"].sum() == 12_000
    assert (
        mdf["n_inserts"].sum() + mdf["n_updates"].sum() + mdf["n_deletes"].sum()
        == 12_000
    )


@pytest.mark.usefixtures("ray_session")
def test_ingest_kill_and_resume(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("kbinlog"))
    lake = str(tmp_path_factory.mktemp("klake"))
    generate_binlog(
        d, GenSpec(num_events=16_000, num_convs=120, seed=33, epoch0_frac=0.35, chunk_rows=2_000)
    )
    # 'killed' run: only 2 of 4 micro-batches complete
    m1 = ingest(d, lake, num_partitions=P, files_per_microbatch=2, max_microbatches=2)
    assert m1.num_rows > 0
    hw_after_kill = [committed_lsn(lake, p) for p in range(P)]
    assert any(h is not None for h in hw_after_kill)
    # resume: must skip committed work and converge to the oracle state
    m2 = ingest(d, lake, num_partitions=P, files_per_microbatch=2)
    _assert_lake_matches(lake, d)
    both = pa.concat_tables([m1, m2]).to_pandas()
    applied = both[~both["skipped"]]
    # exactly-once: each event counted once across kill+resume
    assert applied["n_events"].sum() == 16_000


@pytest.mark.usefixtures("ray_session")
def test_ingest_rerun_is_noop(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("nbinlog"))
    lake = str(tmp_path_factory.mktemp("nlake"))
    generate_binlog(d, GenSpec(num_events=4_000, num_convs=40, seed=8, chunk_rows=2_000))
    ingest(d, lake, num_partitions=P, files_per_microbatch=4)
    before = {p: committed_lsn(lake, p) for p in range(P)}
    m2 = ingest(d, lake, num_partitions=P, files_per_microbatch=4)
    after = {p: committed_lsn(lake, p) for p in range(P)}
    assert before == after
    mdf = m2.to_pandas()
    assert mdf.empty or mdf["skipped"].all() or mdf["n_events"].sum() == 0
    _assert_lake_matches(lake, d)


@pytest.mark.usefixtures("ray_session")
def test_ingest_salted_hot_conv(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("sbinlog"))
    lake = str(tmp_path_factory.mktemp("slake"))
    generate_binlog(
        d, GenSpec(num_events=14_000, num_convs=100, seed=19, zipf_a=1.05, chunk_rows=3_500)
    )
    from grate_ray.pipelines.cdc import read_binlog
    from grate_ray.stages.partition import find_hot_keys

    hot = find_hot_keys(read_binlog(d), threshold_frac=0.05)
    assert hot
    metrics = ingest(
        d, lake, num_partitions=P, files_per_microbatch=2,
        hot_keys=hot, num_salts=4,
    )
    _assert_lake_matches(lake, d)
    assert metrics.to_pandas()["n_events"].sum() == 14_000


@pytest.mark.usefixtures("ray_session")
def test_lineage_chain_and_gc(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("lbinlog"))
    lake = str(tmp_path_factory.mktemp("llake"))
    generate_binlog(d, GenSpec(num_events=9_000, num_convs=60, seed=13, chunk_rows=1_500))
    ingest(d, lake, num_partitions=P, files_per_microbatch=2)  # 3 micro-batches
    chains = [lineage(lake, p) for p in range(P)]
    assert any(len(c) >= 2 for c in chains)
    for chain in chains:
        for prev, cur in zip(chain, chain[1:]):
            assert cur["parent_lsn_hi"] == prev["lsn_hi"]
            assert cur["lsn_lo"] > prev["lsn_hi"] or cur["lsn_lo"] >= prev["lsn_lo"]
    # gc keeps latest snapshot only; live view unchanged
    for p in range(P):
        gc_superseded_states(lake, p, keep=1)
    _assert_lake_matches(lake, d)


@pytest.mark.usefixtures("ray_session")
def test_compaction_unifies_lagging_schemas(tmp_path_factory):
    """Ingest always reconciles to the engine's declared schema, so lagging
    snapshots only arise from commits made by an OLDER engine version —
    emulate one with a manual epoch-0-shaped commit, then compact."""
    from grate_ray.pipelines.compact import compact_lake
    from grate_ray.pipelines.ingest import read_lake

    lake = str(tmp_path_factory.mktemp("clake"))
    # partition 0: legacy snapshot without `tool`, int32 seconds ts
    legacy = pa.table(
        {
            "op": pa.array(["I"], pa.string()),
            "lsn": pa.array([5], pa.int64()),
            "conv_id": pa.array(["a"], pa.string()),
            "turn_idx": pa.array([0], pa.int32()),
            "role": pa.array(["user"], pa.string()),
            "text": pa.array(["old"], pa.string()),
            "ts": pa.array([1_700_000_000], pa.int32()),
        }
    )
    commit_partition(lake, 0, 0, 99, legacy, {})
    # partition 1: current full schema
    modern = pa.table(
        {
            "op": pa.array(["I"], pa.string()),
            "lsn": pa.array([7], pa.int64()),
            "conv_id": pa.array(["b"], pa.string()),
            "turn_idx": pa.array([0], pa.int32()),
            "role": pa.array(["user"], pa.string()),
            "text": pa.array(["new"], pa.string()),
            "tool": pa.array([None], pa.string()),
            "ts": pa.array([1_700_000_123_000_000], pa.int64()).cast(
                pa.timestamp("us")
            ),
        }
    )
    commit_partition(lake, 1, 0, 99, modern, {})
    out = compact_lake(lake, num_partitions=P)
    assert out["schemas_unified"] >= 1  # legacy widened (+ column-order canonicalization may rewrite others)
    s0 = read_state(lake, 0).schema
    s1 = read_state(lake, 1).schema
    assert s0.names == s1.names
    assert s0.field("ts").type == pa.timestamp("us")
    df = read_lake(lake, num_partitions=P).to_pandas().sort_values("conv_id")
    assert df["text"].tolist() == ["old", "new"]
    assert df["tool"].isna().all()


@pytest.mark.usefixtures("ray_session")
def test_ingest_resume_with_different_batch_size(tmp_path_factory):
    """The persisted micro-batch plan pins LSN windows: a resume with a
    DIFFERENT files_per_microbatch must still count every event exactly
    once (without the plan, a window straddling the old high-water mark
    mixes already-counted raw events into reduced rows whose winner lsn
    clears the mark)."""
    d = str(tmp_path_factory.mktemp("rbinlog"))
    lake = str(tmp_path_factory.mktemp("rlake"))
    generate_binlog(
        d, GenSpec(num_events=8_000, num_convs=120, seed=44, chunk_rows=2_000)
    )
    # killed run plans 1-file windows, completes 2 of 4
    m1 = ingest(d, lake, num_partitions=P, files_per_microbatch=1, max_microbatches=2)
    # resume asks for much bigger batches — plan must override
    m2 = ingest(d, lake, num_partitions=P, files_per_microbatch=5)
    _assert_lake_matches(lake, d)
    both = pa.concat_tables([m1, m2]).to_pandas()
    applied = both[~both["skipped"]]
    assert applied["n_events"].sum() == 8_000
    # and the plan really was honored: resumed commits reuse 1-file windows
    from grate_ray.state.manifest import read_batch_plan

    plan = read_batch_plan(lake)
    assert len(plan) == 4  # one window per chunk file, planned up front


@pytest.mark.usefixtures("ray_session")
def test_read_lake_time_travel(tmp_path_factory):
    """read_lake(asof_lsn=...) reconstructs the historical state at a
    commit boundary from the immutable manifest chain; an LSN inside a
    micro-batch window resolves to the commit BELOW it (commit-granular,
    like table-format version reads)."""
    import pyarrow.compute as pc

    from grate_ray.state.manifest import read_batch_plan

    d = str(tmp_path_factory.mktemp("tbinlog"))
    lake = str(tmp_path_factory.mktemp("tlake"))
    generate_binlog(
        d, GenSpec(num_events=9_000, num_convs=100, seed=55, chunk_rows=1_500)
    )
    ingest(d, lake, num_partitions=P, files_per_microbatch=2, auto_compact=False)
    plan = read_batch_plan(lake)
    assert len(plan) == 3  # 6 chunk files / 2 per micro-batch

    def state_at(asof):
        return (
            read_lake(lake, asof_lsn=asof)
            .to_pandas()
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )

    def oracle_at(asof):
        full = pa.concat_tables(
            pq.read_table(os.path.join(d, f))
            for f in sorted(os.listdir(d))
            if f.endswith(".parquet")
        )
        return oracle_final_state(
            [full.filter(pc.less_equal(full["lsn"], asof))]
        ).to_pandas()

    # exact historical state at the 2nd micro-batch boundary
    asof = plan[1][1]
    got, want = state_at(asof), oracle_at(asof)
    assert len(got) == len(want) > 0
    for col in want.columns:
        assert got[col].tolist() == want[col].tolist(), col

    # an LSN strictly inside the 3rd window resolves to the same commit
    mid = plan[2][1] - 1
    assert plan[2][0] <= mid < plan[2][1]
    got_mid = state_at(plan[2][0] - 1 if plan[2][0] > asof else asof)
    assert got_mid.equals(got)

    # before the first commit: no rows, schema intact (checked via
    # Dataset.schema() — Ray's to_pandas drops columns on all-empty data)
    early_ds = read_lake(lake, asof_lsn=plan[0][0] - 1)
    assert early_ds.count() == 0
    assert "conv_id" in early_ds.schema().names

    # head read (asof=None) still matches the full oracle
    _assert_lake_matches(lake, d)


@pytest.mark.usefixtures("ray_session")
def test_lake_changes_net_diff(tmp_path_factory):
    """lake_changes(from, to) must equal the serial snapshot diff of the
    two commit states: winner-moved keys only, tagged I/U/D, one row per
    key regardless of how many events hit it inside the window."""
    import pandas as pd

    from grate_ray.pipelines.ingest import lake_changes
    from grate_ray.state.manifest import read_batch_plan

    d = str(tmp_path_factory.mktemp("cbinlog"))
    lake = str(tmp_path_factory.mktemp("clake"))
    generate_binlog(
        d, GenSpec(num_events=9_000, num_convs=80, seed=66, chunk_rows=1_500)
    )
    ingest(d, lake, num_partitions=P, files_per_microbatch=2, auto_compact=False)
    plan = read_batch_plan(lake)
    a_lsn, b_lsn = plan[0][1], plan[2][1]

    got = (
        lake_changes(lake, from_lsn=a_lsn, to_lsn=b_lsn)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )

    # serial reference: LWW winners (with op) at each prefix, then diff
    raw = pd.concat(
        pq.read_table(os.path.join(d, f)).to_pandas()
        for f in sorted(os.listdir(d))
        if f.endswith(".parquet")
    )

    def winners(asof):
        w = (
            raw[raw["lsn"] <= asof]
            .sort_values(["ts", "lsn"])
            .groupby(["conv_id", "turn_idx"], as_index=False)
            .tail(1)
        )
        return w.set_index(["conv_id", "turn_idx"])

    wa, wb = winners(a_lsn), winners(b_lsn)
    rows = []
    for key, b in wb.iterrows():
        a = wa.loc[key] if key in wa.index else None
        a_live = a is not None and a["op"] != "D"
        changed = a is None or a["lsn"] != b["lsn"]
        b_live = b["op"] != "D"
        if not changed or not (b_live or a_live):
            continue
        rows.append(
            {
                "change_op": "D" if not b_live else ("U" if a_live else "I"),
                "conv_id": key[0],
                "turn_idx": key[1],
                "lsn": b["lsn"],
            }
        )
    want = (
        pd.DataFrame(rows)
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    for col in ("change_op", "conv_id", "turn_idx", "lsn"):
        assert got[col].tolist() == want[col].tolist(), col
    # all three change kinds actually exercised
    assert set(got["change_op"]) == {"I", "U", "D"}


@pytest.mark.usefixtures("ray_session")
def test_ingest_auto_compacts(tmp_path_factory):
    """Ingest with mixed-epoch chunks and a low chain threshold must end
    single-snapshot, unified-schema per partition WITHOUT a manual
    compact_lake call (plus: a lagging legacy-schema snapshot planted
    before the tail is unified by the same auto pass)."""
    from grate_ray.state.manifest import chain_files

    d = str(tmp_path_factory.mktemp("abinlog"))
    lake = str(tmp_path_factory.mktemp("alake"))
    generate_binlog(
        d,
        GenSpec(num_events=6_000, num_convs=80, seed=77, epoch0_frac=0.4, chunk_rows=1_500),
    )
    ingest(d, lake, num_partitions=P, files_per_microbatch=1, compact_max_chain=2)
    _assert_lake_matches(lake, d)
    schemas = set()
    for p in range(P):
        files = chain_files(lake, p)
        if not files:
            continue
        assert len(files) == 1, f"partition {p} chain not compacted: {files}"
        schemas.add(pq.read_schema(os.path.join(lake, files[0])).to_string())
    assert len(schemas) == 1  # one unified schema across partitions


@pytest.mark.usefixtures("ray_session")
def test_incremental_view_equals_full_recompute(tmp_path_factory):
    """view@B maintained from view@A + changefeed deltas must equal the
    full recompute at B — for every consecutive commit pair (exercises
    retraction on U and D, not just inserts)."""
    from grate_ray.pipelines.views import incremental_turn_counts, turn_counts_view
    from grate_ray.state.manifest import read_batch_plan

    d = str(tmp_path_factory.mktemp("vbinlog"))
    lake = str(tmp_path_factory.mktemp("vlake"))
    generate_binlog(
        d, GenSpec(num_events=6_000, num_convs=60, seed=99, chunk_rows=1_000)
    )
    ingest(d, lake, num_partitions=P, files_per_microbatch=2, auto_compact=False)
    plan = read_batch_plan(lake)

    def norm(ds):
        return (
            ds.to_pandas()
            .sort_values(["conv_id", "role"])
            .reset_index(drop=True)
        )

    for a, b in zip(plan, plan[1:]):
        inc = norm(incremental_turn_counts(lake, from_lsn=a[1], to_lsn=b[1]))
        full = norm(turn_counts_view(lake, asof_lsn=b[1]))
        assert len(inc) == len(full) > 0, (a, b)
        for col in ("conv_id", "role", "n_turns"):
            assert inc[col].tolist() == full[col].tolist(), (col, a, b)


def test_time_travel_after_gc_raises_clearly(tmp_path):
    """GC keeps manifests (lineage) forever but removes superseded chain
    files; a time-travel read past the retention horizon must fail with
    an actionable error, and head reads must be unaffected."""
    lake = str(tmp_path / "lake")
    for i, lsn in enumerate([10, 20, 30]):
        t = pa.table(
            {
                "op": ["I"],
                "lsn": pa.array([lsn], pa.int64()),
                "conv_id": [f"c{i}"],
                "turn_idx": pa.array([0], pa.int32()),
            }
        )
        commit_partition(lake, 0, lsn - 9, lsn, t, {})
    gc_superseded_states(lake, 0, keep=1)
    # head still reads
    assert read_state(lake, 0) is not None
    # history before the kept horizon: clear error, not FileNotFoundError
    with pytest.raises(ValueError, match="garbage-collected"):
        read_state(lake, 0, lsn_hi=20)


def test_point_lookup_prunes_partitions(tmp_path_factory, ray_session):
    """read_lake(conv_ids=...) returns exactly the full-read rows for
    those keys, and partitions_for_keys maps each key to its one hash
    partition (the pruned read plan touches ≤len(keys) chains)."""
    import zlib

    from grate_ray.pipelines.ingest import partitions_for_keys

    d = str(tmp_path_factory.mktemp("plbinlog"))
    lake = str(tmp_path_factory.mktemp("pllake"))
    generate_binlog(d, GenSpec(num_events=20_000, chunk_rows=5_000))
    ingest(d, lake, num_partitions=P, files_per_microbatch=4)

    full = read_lake(lake).to_pandas()
    keys = sorted(full["conv_id"].unique())[:3]

    target = partitions_for_keys(lake, keys)
    assert target == sorted({zlib.crc32(k.encode()) % P for k in keys})
    assert len(target) <= len(keys)

    got = (
        read_lake(lake, conv_ids=keys)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    want = (
        full[full["conv_id"].isin(keys)]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) and len(got) > 0
    for col in want.columns:
        assert got[col].tolist() == want[col].tolist(), col

    # a key that hashes to a partition outside the pruned set returns
    # nothing rather than a wrong row
    assert read_lake(lake, conv_ids=["no-such-conv"]).count() == 0


def test_incremental_index_equals_full_recompute(tmp_path_factory):
    """index@B maintained from index@A (remove touched keys, re-add live
    I/U rows) must equal the full fingerprint projection at B — for
    every consecutive commit pair (exercises U retraction and D removal,
    not just inserts)."""
    from grate_ray.pipelines.views import incremental_text_index, text_index_view
    from grate_ray.state.manifest import read_batch_plan

    d = str(tmp_path_factory.mktemp("ibinlog2"))
    lake = str(tmp_path_factory.mktemp("ilake2"))
    generate_binlog(
        d, GenSpec(num_events=6_000, num_convs=60, seed=101, chunk_rows=1_000)
    )
    ingest(d, lake, num_partitions=P, files_per_microbatch=2, auto_compact=False)
    plan = read_batch_plan(lake)

    def norm(ds):
        return (
            ds.to_pandas()
            .astype({"fp": "uint64"})
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )

    for a, b in zip(plan, plan[1:]):
        inc = norm(incremental_text_index(lake, from_lsn=a[1], to_lsn=b[1]))
        full = norm(text_index_view(lake, asof_lsn=b[1]))
        assert len(inc) == len(full) > 0, (a, b)
        for col in ("fp", "conv_id", "turn_idx"):
            assert inc[col].tolist() == full[col].tolist(), (col, a, b)


@pytest.mark.usefixtures("ray_session")
def test_incremental_export_watermarks(tmp_path_factory):
    """Export re-renders only partitions whose head commit advanced; an
    unchanged lake exports nothing; a schema-mapping change invalidates
    every watermark; final files read back as the exact oracle state."""
    import glob

    from grate_ray.pipelines.ingest import export_lake_incremental
    from grate_ray.state.manifest import evolve_lake_schema

    d = str(tmp_path_factory.mktemp("xbinlog"))
    lake = str(tmp_path_factory.mktemp("xlake"))
    out = str(tmp_path_factory.mktemp("xout"))
    generate_binlog(
        d, GenSpec(num_events=8_000, num_convs=60, seed=19, chunk_rows=1_000)
    )
    # stage 1: half the log
    ingest(d, lake, num_partitions=P, files_per_microbatch=2,
           max_microbatches=2)
    r1 = export_lake_incremental(lake, out)
    assert len(r1["exported"]) > 0 and not r1["skipped"]
    # unchanged lake → no work
    r2 = export_lake_incremental(lake, out)
    assert not r2["exported"] and len(r2["skipped"]) == len(r1["exported"])
    # stage 2: drain the rest → only advanced partitions re-render
    ingest(d, lake, num_partitions=P, files_per_microbatch=2)
    r3 = export_lake_incremental(lake, out)
    assert len(r3["exported"]) > 0
    got = (
        pa.concat_tables(
            [pq.read_table(f) for f in
             sorted(glob.glob(os.path.join(out, "part-*.parquet")))],
            promote_options="default",
        )
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    want = _oracle(d).to_pandas()
    assert len(got) == len(want)
    for col in want.columns:
        assert got[col].tolist() == want[col].tolist(), col
    # mapping change (rename) invalidates watermarks → full re-render
    evolve_lake_schema(lake, rename={"tool": "tool_name"})
    r4 = export_lake_incremental(lake, out)
    from grate_ray.state.manifest import list_partitions

    assert set(r4["exported"]) == set(list_partitions(lake))
    cols = pq.read_schema(
        sorted(glob.glob(os.path.join(out, "part-*.parquet")))[0]
    ).names
    assert "tool_name" in cols and "tool" not in cols


@pytest.mark.usefixtures("ray_session")
def test_content_lookup_finds_all_copies(tmp_path_factory):
    """Index-accelerated content lookup returns EVERY live row sharing a
    target's text (planted cross-conversation duplicates), and nothing
    else; unknown text → empty with schema."""
    from grate_ray.pipelines.views import content_lookup

    d = str(tmp_path_factory.mktemp("lbinlog"))
    lake = str(tmp_path_factory.mktemp("llake"))
    generate_binlog(
        d, GenSpec(num_events=4_000, num_convs=30, seed=3, chunk_rows=2_000)
    )
    ingest(d, lake, num_partitions=P, files_per_microbatch=2)
    full = read_lake(lake).to_pandas()
    # pick a text and count its live copies (genlog texts repeat by key)
    target = full["text"].iloc[5]
    want = full[full["text"] == target]
    got = content_lookup(lake, [target]).to_pandas()
    assert len(got) == len(want)
    assert set(zip(got["conv_id"], got["turn_idx"])) == set(
        zip(want["conv_id"], want["turn_idx"])
    )
    miss = content_lookup(lake, ["no such text anywhere"])
    assert miss.count() == 0
    assert "conv_id" in miss.schema().names


@pytest.mark.usefixtures("ray_session")
def test_content_lookup_degenerate_probe_bounded(tmp_path_factory):
    """A degenerate probe (boilerplate text present in ~50% of rows,
    spread over every conversation) must still answer exactly — the
    driver pull is the in-cluster-deduped conv_id list, not the matched
    rows — and max_convs caps that list with a clear error instead of an
    unbounded driver materialization."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from grate_ray.pipelines.views import content_lookup

    d = str(tmp_path_factory.mktemp("dbinlog"))
    lake = str(tmp_path_factory.mktemp("dlake"))
    # hand-build a binlog: every even turn of EVERY conv shares one text
    n_convs, turns = 40, 20
    conv = np.repeat([f"conv{i:03d}" for i in range(n_convs)], turns)
    turn = np.tile(np.arange(turns, dtype=np.int32), n_convs)
    boiler = "I agree with the terms and conditions."
    uniq = np.array(
        [f"unique-{c}-{t}" for c, t in zip(conv, turn)], dtype=object
    )
    text = np.where(turn % 2 == 0, boiler, uniq)
    t = pa.table(
        {
            "op": pa.array(["I"] * len(conv)),
            "lsn": pa.array(np.arange(len(conv), dtype=np.int64)),
            "conv_id": pa.array(conv),
            "turn_idx": pa.array(turn, pa.int32()),
            "role": pa.array(["user"] * len(conv)),
            "text": pa.array(text.astype(object), pa.string()),
            "tool": pa.nulls(len(conv), pa.string()),
            "ts": pa.array(
                np.arange(len(conv)).astype("datetime64[us]"), pa.timestamp("us")
            ),
        }
    )
    os.makedirs(d, exist_ok=True)
    pq.write_table(t, os.path.join(d, "chunk-000000000000.parquet"))
    ingest(d, lake, num_partitions=P, files_per_microbatch=None)

    got = content_lookup(lake, [boiler]).to_pandas()
    assert len(got) == n_convs * (turns // 2)          # every copy found
    assert set(got["conv_id"]) == set(f"conv{i:03d}" for i in range(n_convs))

    with pytest.raises(ValueError, match="max_convs"):
        content_lookup(lake, [boiler], max_convs=10).to_pandas()


@pytest.mark.usefixtures("ray_session")
def test_repartition_lake_and_resume(tmp_path_factory):
    """Re-bucket 8→5 partitions mid-stream (at a micro-batch boundary),
    resume ingest on the NEW lake: final state equals the oracle, and
    metrics across old+new lakes count every event exactly once."""
    from grate_ray.pipelines.compact import repartition_lake
    from grate_ray.state.manifest import list_partitions

    d = str(tmp_path_factory.mktemp("rbinlog"))
    lake = str(tmp_path_factory.mktemp("rlakeA"))
    lake2 = str(tmp_path_factory.mktemp("rlakeB"))
    generate_binlog(
        d, GenSpec(num_events=6_000, num_convs=90, seed=29,
                   epoch0_frac=0.3, chunk_rows=1_500)
    )
    m1 = ingest(d, lake, num_partitions=P, files_per_microbatch=2,
                max_microbatches=1)
    res = repartition_lake(lake, lake2, new_partitions=5)
    assert set(list_partitions(lake2)) == set(range(5))
    # old and new live views agree
    a = read_lake(lake).to_pandas().sort_values(
        ["conv_id", "turn_idx"]).reset_index(drop=True)
    b = read_lake(lake2).to_pandas().sort_values(
        ["conv_id", "turn_idx"]).reset_index(drop=True)
    assert a.equals(b)
    # resume the tail on the re-bucketed lake
    m2 = ingest(d, lake2, num_partitions=5, files_per_microbatch=2)
    got = read_lake(lake2).to_pandas().sort_values(
        ["conv_id", "turn_idx"]).reset_index(drop=True)
    want = _oracle(d).to_pandas()
    assert len(got) == len(want)
    for col in want.columns:
        assert got[col].tolist() == want[col].tolist(), col
    both = pa.concat_tables(
        [m1, m2], promote_options="default").to_pandas()
    assert both[~both["skipped"]]["n_events"].sum() == 6_000
    # idempotent: re-running the repartition is a no-op
    res2 = repartition_lake(lake, lake2.rstrip("/"), new_partitions=5)
    assert sorted(res2["part"].to_pylist()) == sorted(res["part"].to_pylist())


@pytest.mark.usefixtures("ray_session")
def test_changefeed_consumer_groups(tmp_path_factory):
    """Poll-then-ack consumer groups: deterministic re-delivery before
    ack (at-least-once), no re-delivery after ack, independent groups,
    monotonic cursors, and applying the polled batches to an external
    copy reproduces the live lake exactly."""
    from grate_ray.pipelines.views import ack_changes, poll_changes, read_cursor

    d = str(tmp_path_factory.mktemp("cbinlog"))
    lake = str(tmp_path_factory.mktemp("clake2"))
    cur = str(tmp_path_factory.mktemp("cursors"))
    generate_binlog(
        d, GenSpec(num_events=6_000, num_convs=50, seed=23, chunk_rows=1_000)
    )
    ingest(d, lake, num_partitions=P, files_per_microbatch=2,
           max_microbatches=2)

    external: dict = {}  # the downstream copy a consumer maintains

    def apply(df):
        for r in df.itertuples():
            k = (r.conv_id, int(r.turn_idx))
            if r.change_op == "D":
                external.pop(k, None)
            else:
                external[k] = (r.role, r.text, r.tool, r.ts)

    ds1, frm1, to1 = poll_changes(lake, cur, group="g1")
    assert frm1 == -1 and ds1 is not None
    b1 = ds1.to_pandas()
    assert (b1["change_op"] == "I").all()  # fresh group: everything is I
    # crash before ack: the re-poll re-delivers the identical batch
    ds1b, frm1b, to1b = poll_changes(lake, cur, group="g1")
    assert (frm1b, to1b) == (frm1, to1)
    b1b = ds1b.to_pandas().sort_values(["conv_id", "turn_idx"])
    assert b1.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True).equals(
        b1b.reset_index(drop=True)
    )
    apply(b1)
    ack_changes(cur, to1, group="g1")
    # caught up → nothing
    ds_none, _, _ = poll_changes(lake, cur, group="g1")
    assert ds_none is None
    # tail arrives
    ingest(d, lake, num_partitions=P, files_per_microbatch=2)
    ds2, frm2, to2 = poll_changes(lake, cur, group="g1")
    assert frm2 == to1 and to2 > to1
    b2 = ds2.to_pandas()
    assert set(b2["change_op"]) <= {"I", "U", "D"}
    apply(b2)
    ack_changes(cur, to2, group="g1")
    # the external copy equals the live lake
    live = read_lake(lake).to_pandas()
    got = {
        (r.conv_id, int(r.turn_idx)): (r.role, r.text, r.tool, r.ts)
        for r in live.itertuples()
    }
    assert external == got
    # a second group is independent and gets the full state as inserts
    dsg2, f2, t2 = poll_changes(lake, cur, group="g2")
    assert f2 == -1 and (dsg2.to_pandas()["change_op"] == "I").all()
    # monotonic: a stale ack cannot move the cursor back
    ack_changes(cur, to1, group="g1")
    assert read_cursor(cur, "g1") == to2


@pytest.mark.usefixtures("ray_session")
def test_lake_stats_and_vacuum(tmp_path_factory):
    from grate_ray.pipelines.compact import lake_stats, vacuum_lake

    d = str(tmp_path_factory.mktemp("vbinlog"))
    lake = str(tmp_path_factory.mktemp("vlake"))
    generate_binlog(
        d, GenSpec(num_events=6_000, num_convs=50, seed=31, chunk_rows=1_000)
    )
    ingest(d, lake, num_partitions=P, files_per_microbatch=2,
           auto_compact=False)
    s = lake_stats(lake)
    assert s["partitions"] == P
    live = len(_oracle(d))
    assert s["state_rows"] >= live  # state keeps tombstones
    assert s["state_rows"] <= 6_000  # but never more than distinct keys
    assert s["commits_by_kind"].get("snapshot", 0) + s[
        "commits_by_kind"
    ].get("delta", 0) > 0
    assert s["max_chain_len"] >= 1 and s["data_files"] > 0
    assert s["schema_epochs"] == 1
    assert s["committed_hw_lsn"] == 5_999
    # plant an orphan tmp + run vacuum
    open(os.path.join(lake, "part=0", "junk.tmp"), "w").write("x")
    v = vacuum_lake(lake, keep=1)
    assert v["tmp_removed"] == 1
    # live view unchanged after GC
    _assert_lake_matches(lake, d)


@pytest.mark.usefixtures("ray_session")
def test_ingest_follow_growing_binlog(tmp_path_factory):
    """Follow mode: new chunk files appearing between polls are picked
    up; the final lake equals the oracle over everything written; each
    event is counted exactly once across passes."""
    import shutil
    import threading
    import time

    from grate_ray.pipelines.ingest import ingest_follow

    stage = str(tmp_path_factory.mktemp("fstage"))
    d = str(tmp_path_factory.mktemp("fbinlog"))
    lake = str(tmp_path_factory.mktemp("flake"))
    generate_binlog(
        stage, GenSpec(num_events=8_000, num_convs=60, seed=37,
                       chunk_rows=1_000)
    )
    chunks = sorted(
        f for f in os.listdir(stage) if f.endswith(".parquet")
    )
    # start with half the log present
    for f in chunks[:4]:
        shutil.copy(os.path.join(stage, f), os.path.join(d, f))

    def feeder():
        for f in chunks[4:]:
            time.sleep(1.0)
            shutil.copy(os.path.join(stage, f), os.path.join(d, f))

    th = threading.Thread(target=feeder)
    th.start()
    metrics = ingest_follow(
        d, lake, num_partitions=P, poll_secs=0.5, max_idle_polls=4,
        files_per_microbatch=2,
    )
    th.join()
    # the follower may have stopped before the last file landed — one
    # catch-up pass is part of the contract (idempotent)
    metrics2 = ingest_follow(
        d, lake, num_partitions=P, poll_secs=0.1, max_idle_polls=1,
        files_per_microbatch=2,
    )
    _assert_lake_matches(lake, d)
    both = pa.concat_tables(
        [m for m in (metrics, metrics2) if m.num_rows],
        promote_options="default",
    ).to_pandas()
    assert both[~both["skipped"]]["n_events"].sum() == 8_000


@pytest.mark.usefixtures("ray_session")
def test_ingest_auto_salt(tmp_path_factory, monkeypatch):
    """auto_salt arms the salted two-phase merge by itself on a skewed
    log (detector finds the hot conversations); state and exactly-once
    metrics stay exact."""
    import grate_ray.pipelines.ingest as ing

    d = str(tmp_path_factory.mktemp("abinlog"))
    lake = str(tmp_path_factory.mktemp("alake"))
    generate_binlog(
        d, GenSpec(num_events=14_000, num_convs=100, seed=41, zipf_a=1.05,
                   chunk_rows=3_500)
    )
    detected = {}
    from grate_ray.stages.partition import find_hot_keys as real_fhk

    def spy(ds, **kw):
        hot = real_fhk(ds, **kw)
        detected["hot"] = hot
        return hot

    monkeypatch.setattr(
        "grate_ray.stages.partition.find_hot_keys", spy
    )
    metrics = ing.ingest(
        d, lake, num_partitions=P, files_per_microbatch=2, auto_salt=True
    )
    assert detected["hot"]  # the zipf log has hot conversations
    _assert_lake_matches(lake, d)
    assert metrics.to_pandas()["n_events"].sum() == 14_000


@pytest.mark.usefixtures("ray_session")
def test_torn_tail_chunk_deferred(tmp_path_factory):
    """A half-written tail chunk (no parquet footer) defers instead of
    crashing the ingest; once the writer finishes it, a follow-up pass
    picks it up. A torn chunk BELOW the tail raises (real corruption)."""
    import shutil

    d = str(tmp_path_factory.mktemp("tbinlog"))
    lake = str(tmp_path_factory.mktemp("tlake"))
    generate_binlog(
        d, GenSpec(num_events=4_000, num_convs=30, seed=43, chunk_rows=1_000)
    )
    chunks = sorted(f for f in os.listdir(d) if f.endswith(".parquet"))
    # simulate a torn tail: a lexically-last file holding garbage
    torn = os.path.join(d, "chunk-zzz-partial.parquet")
    with open(torn, "wb") as f:
        f.write(b"PAR1 only half written")
    m1 = ingest(d, lake, num_partitions=P, files_per_microbatch=2)
    assert m1.to_pandas()["n_events"].sum() == 4_000  # torn tail ignored
    # writer finishes the tail: replace garbage with a real chunk
    os.unlink(torn)
    last = pq.read_table(os.path.join(d, chunks[-1]))
    shifted = last.set_column(
        last.column_names.index("lsn"),
        "lsn",
        pa.array(
            [v + 4_000 for v in last["lsn"].to_pylist()], pa.int64()
        ),
    )
    pq.write_table(shifted, os.path.join(d, "chunk-zzz-partial.parquet"))
    m2 = ingest(d, lake, num_partitions=P, files_per_microbatch=2)
    assert m2.to_pandas()["n_events"].sum() == shifted.num_rows
    # torn file BELOW the tail → hard error
    mid = os.path.join(d, chunks[0])
    shutil.copy(mid, mid + ".bak")
    with open(mid, "wb") as f:
        f.write(b"garbage")
    with pytest.raises(ValueError, match="below the tail"):
        ingest(d, lake, num_partitions=P, files_per_microbatch=2)


@pytest.mark.usefixtures("ray_session")
def test_lake_tags(tmp_path_factory):
    """Named tags pin commit points: read_lake(asof_tag=...) equals the
    asof_lsn read at tag time even after more data lands; tags are
    immutable; unknown tags raise."""
    from grate_ray.state.manifest import resolve_tag, tag_lake, untag_lake

    d = str(tmp_path_factory.mktemp("gbinlog"))
    lake = str(tmp_path_factory.mktemp("glake"))
    generate_binlog(
        d, GenSpec(num_events=6_000, num_convs=50, seed=47, chunk_rows=1_000)
    )
    ingest(d, lake, num_partitions=P, files_per_microbatch=2,
           max_microbatches=2, auto_compact=False)
    lsn1 = tag_lake(lake, "v1")
    snap1 = read_lake(lake).to_pandas().sort_values(
        ["conv_id", "turn_idx"]).reset_index(drop=True)
    # more data lands
    ingest(d, lake, num_partitions=P, files_per_microbatch=2,
           auto_compact=False)
    tagged = read_lake(lake, asof_tag="v1").to_pandas().sort_values(
        ["conv_id", "turn_idx"]).reset_index(drop=True)
    assert tagged.equals(snap1)
    head = read_lake(lake).to_pandas()
    assert len(head) >= len(snap1)
    assert resolve_tag(lake, "v1") == lsn1
    with pytest.raises(ValueError, match="immutable"):
        tag_lake(lake, "v1", lsn=lsn1 + 1)
    tag_lake(lake, "v1", lsn=lsn1)  # same lsn: idempotent no-op
    with pytest.raises(ValueError, match="unknown tag"):
        read_lake(lake, asof_tag="nope").take_all()
    untag_lake(lake, "v1")
    with pytest.raises(ValueError, match="unknown tag"):
        read_lake(lake, asof_tag="v1").take_all()


# --- multi-table routed ingest (ingest_split) --------------------------------

_GROUPS = {"dialog": ("user", "assistant"), "system": ("system", "tool")}


def _route(t, roles):
    # the engine's own routing predicate (group membership, deletes
    # broadcast) — also the in-memory reference filter here
    from grate_ray.pipelines.ingest import make_route_filter

    return make_route_filter(tuple(roles))(t)


def _split_oracle(binlog_dir, roles):
    tables = []
    for f in sorted(os.listdir(binlog_dir)):
        if not f.endswith(".parquet"):
            continue
        tables.append(_route(pq.read_table(os.path.join(binlog_dir, f)), roles))
    return oracle_final_state(tables)


def _assert_split_matches(out_root, binlog_dir):
    for name, roles in _GROUPS.items():
        got = (
            read_lake(os.path.join(out_root, name), num_partitions=P)
            .to_pandas()
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )
        want = _split_oracle(binlog_dir, roles).to_pandas()
        assert len(got) == len(want), name
        for col in want.columns:
            assert got[col].tolist() == want[col].tolist(), (name, col)


@pytest.mark.usefixtures("ray_session")
def test_split_full_matches_reference(tmp_path_factory):
    from grate_ray.pipelines.ingest import ingest_split

    d = str(tmp_path_factory.mktemp("sbinlog"))
    out = str(tmp_path_factory.mktemp("slakes"))
    generate_binlog(d, GenSpec(num_events=8_000, num_convs=80, seed=91, chunk_rows=2_000))
    metrics = ingest_split(d, out, _GROUPS, num_partitions=P, files_per_microbatch=2)
    _assert_split_matches(out, d)
    # every non-delete routed to exactly one table's lineage; deletes
    # broadcast to all groups (tombstones must reach the key's table)
    total = sum(m.to_pandas()["n_events"].sum() for m in metrics.values())
    n_del = _count_ops(d, "D")
    assert total == (8_000 - n_del) + len(_GROUPS) * n_del
    # overlapping groups are rejected up front
    with pytest.raises(ValueError):
        ingest_split(d, out, {"a": ("user",), "b": ("user", "tool")})


@pytest.mark.usefixtures("ray_session")
def test_split_crash_between_tables_heals(tmp_path_factory):
    """Crash landing BETWEEN table A's commit and table B's commit of the
    same lsn window must heal on the next ingest_split run (transactional
    by replay): A skips its committed windows, B catches up."""
    from grate_ray.pipelines.ingest import ingest_split

    d = str(tmp_path_factory.mktemp("cbinlog"))
    out = str(tmp_path_factory.mktemp("clakes"))
    generate_binlog(d, GenSpec(num_events=8_000, num_convs=80, seed=92, chunk_rows=1_000))

    # simulated crash: dialog commits 2 of 8 windows, system none
    m_partial = ingest(
        d,
        os.path.join(out, "dialog"),
        num_partitions=P,
        files_per_microbatch=1,
        max_microbatches=2,
        row_filter=__import__(
            "grate_ray.pipelines.ingest", fromlist=["x"]
        ).make_route_filter(_GROUPS["dialog"]),
    )
    applied_before = m_partial.to_pandas()
    applied_before = applied_before[~applied_before["skipped"]]["n_events"].sum()
    assert applied_before > 0

    # heal: the full split run must converge both tables to the reference
    metrics = ingest_split(d, out, _GROUPS, num_partitions=P, files_per_microbatch=1)
    _assert_split_matches(out, d)
    # exactly-once across crash+heal: dialog's healed run counts only the
    # un-committed remainder, never re-counting the pre-crash windows
    dialog_df = metrics["dialog"].to_pandas()
    healed = dialog_df[~dialog_df["skipped"]]["n_events"].sum()
    want_dialog = _split_oracle_count(d, _GROUPS["dialog"])
    assert applied_before + healed == want_dialog

    # a further rerun is a pure no-op on both tables
    metrics2 = ingest_split(d, out, _GROUPS, num_partitions=P, files_per_microbatch=1)
    for name in _GROUPS:
        df = metrics2[name].to_pandas()
        assert df[~df["skipped"]].empty


def _split_oracle_count(binlog_dir, roles):
    n = 0
    for f in sorted(os.listdir(binlog_dir)):
        if f.endswith(".parquet"):
            n += _route(pq.read_table(os.path.join(binlog_dir, f)), roles).num_rows
    return n


def _count_ops(binlog_dir, op):
    import pyarrow.compute as pc

    n = 0
    for f in sorted(os.listdir(binlog_dir)):
        if f.endswith(".parquet"):
            t = pq.read_table(os.path.join(binlog_dir, f))
            n += int(pc.sum(pc.cast(pc.equal(t["op"], op), pa.int64())).as_py() or 0)
    return n
