"""Multi-table Source (S5/S11), range expansion (T16), Formats() (T6),
strict Scan (T7) and delta-commit lake tests."""

import numpy as np
import pyarrow as pa
import pytest


def test_book_encode_decode_roundtrip():
    from grate_ray.sources.registry import open_payload
    from grate_ray.sources.workbook import encode_book

    payload = encode_book(
        [
            ("alpha", False, ["1\ta", "2\tb"]),
            ("beta", True, ["3\tc"]),
            ("gamma", False, ["4\td", "5\te"]),
        ]
    )
    fmt, t = open_payload(payload)
    assert fmt == "book"
    assert t["_table"].to_pylist() == ["alpha", "alpha", "beta", "gamma", "gamma"]
    assert t["_hidden"].to_pylist() == [False, False, True, False, False]
    assert t["c0"].to_pylist() == ["1", "2", "3", "4", "5"]


def test_book_list_hidden_filter():
    from grate_ray.sources.workbook import decode_book, get_table, list_tables

    payload = "#table vis\n1\tx\n#table hid hidden\n2\ty\n"
    t = decode_book(payload)
    # emulate the decode-stage output shape
    t = t.rename_columns(["row_idx", "c0", "c1", "table_name", "hidden"])
    t = t.append_column("payload_id", pa.array([0] * t.num_rows))
    t = t.append_column("format", pa.array(["book"] * t.num_rows))
    vis = list_tables(t)
    assert vis["table_name"].to_pylist() == ["vis"]
    both = list_tables(t, include_hidden=True)
    assert sorted(both["table_name"].to_pylist()) == ["hid", "vis"]
    # hidden tables remain gettable by name (reference: Get works on hidden)
    assert get_table(t, "hid")["c0"].to_pylist() == ["2"]


def test_book_sniffs_before_tsv():
    from grate_ray.sources.registry import open_payload, registered

    assert registered()[:2] == ["sst_book", "book"]  # containers outrank plaintext
    # a plain tsv payload must NOT be claimed by the book decoder
    fmt, _ = open_payload("1\ta\n2\tb")
    assert fmt == "tsv"


def test_expand_range_events_kernel():
    from grate_ray.stages.expand import COVERED_SENTINEL, expand_range_events

    t = pa.table(
        {
            "op": ["I", "I"],
            "lsn": [1, 2],
            "conv_id": ["c1", "c2"],
            "turn_idx": pa.array([5, 10], pa.int32()),
            "text": ["anchor1", "anchor2"],
            "ts": [100, 200],
            "span": [3, 1],
        }
    )
    out = expand_range_events(t)
    assert out.num_rows == 4
    assert out["turn_idx"].to_pylist() == [5, 6, 7, 10]
    assert out["text"].to_pylist() == [
        "anchor1", COVERED_SENTINEL, COVERED_SENTINEL, "anchor2",
    ]
    assert out["lsn"].to_pylist() == [1, 1, 1, 2]
    assert "span" not in out.column_names


def test_infer_formats_mapping():
    from grate_ray.functions.format import infer_formats

    col = pa.array(["12", "3.5", "", "hello", "2024-01-01", "true"])
    ids, codes = infer_formats(col)
    assert ids.to_pylist() == [1, 2, 0, 49, 14, 0]
    assert codes.to_pylist() == ["0", "0.00", "General", "@", "mm-dd-yy", "General"]


def test_scan_strict_routes_bad_rows(ray_session, sf_dir):
    import ray.data
    from grate_ray.pipelines.extract import decode_payloads, frame_rows, scan_typed

    t = pa.table(
        {
            "k": pa.array([1, 2, 3, 4], pa.int64()),
            "v": ["1.5", "oops", "2.5", "3.5"],
        }
    )
    ds = ray.data.from_arrow(t)
    payloads = frame_rows(ds, ["k", "v"], group_mod=2, key_col="k", sep="\t")
    out = scan_typed(
        decode_payloads(payloads, ncols=2), ["k", "v"],
        [pa.int64(), pa.float64()], strict=True,
    ).to_pandas().sort_values("k")
    assert out["k"].tolist() == [1, 3, 4]  # row k=2 dead-lettered
    assert out["v"].tolist() == [1.5, 2.5, 3.5]


def test_delta_commits_bound_write_amplification(ray_session, tmp_path):
    """Many micro-batches → delta commits between snapshots, correct
    reconstruction, snapshot roll at SNAPSHOT_EVERY, GC keeps the chain."""
    from grate_ray.genlog import GenSpec, generate_binlog
    from grate_ray.pipelines.cdc import replay
    from grate_ray.pipelines.ingest import PartitionMerger, ingest, read_lake
    from grate_ray.state.manifest import (
        chain_files,
        gc_superseded_states,
        lineage,
        list_partitions,
    )

    binlog = str(tmp_path / "binlog")
    lake = str(tmp_path / "lake")
    generate_binlog(
        binlog, GenSpec(num_events=40_000, chunk_rows=4_000, seed=3, num_convs=50)
    )
    ingest(binlog, lake, num_partitions=4, files_per_microbatch=1)

    parts = list_partitions(lake)
    assert parts, "no partitions committed"
    kinds_seen = set()
    for p in parts:
        chain = lineage(lake, p)
        kinds = [m.get("kind") for m in chain]
        kinds_seen.update(kinds)
        assert kinds[0] == "snapshot"  # first commit is always a snapshot
        # chain reads stay bounded: never more deltas than SNAPSHOT_EVERY
        assert len(chain_files(lake, p)) <= PartitionMerger.SNAPSHOT_EVERY + 1
    assert "delta" in kinds_seen  # write amplification actually bounded

    # reconstruction equals a plain full replay
    lake_df = (
        read_lake(lake).to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    replay_df = (
        replay(binlog, num_partitions=4).to_pandas()
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    assert lake_df.equals(replay_df[lake_df.columns.tolist()])

    # GC removes unreachable files but keeps every chain file
    for p in parts:
        gc_superseded_states(lake, p, keep=1)
    lake_df2 = (
        read_lake(lake).to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    assert lake_df2.equals(lake_df)


def test_empty_partition_gets_hw_commit(ray_session, tmp_path):
    """A partition with no events still advances its high-water mark, so
    resume pruning engages even with key-hash gaps."""
    from grate_ray.genlog import GenSpec, generate_binlog
    from grate_ray.pipelines.ingest import ingest
    from grate_ray.state.manifest import committed_lsn, lineage

    binlog = str(tmp_path / "binlog")
    lake = str(tmp_path / "lake")
    # 1 conversation → most of the 8 partitions receive nothing
    generate_binlog(
        binlog, GenSpec(num_events=5_000, chunk_rows=5_000, seed=5, num_convs=1)
    )
    ingest(binlog, lake, num_partitions=8, files_per_microbatch=1)
    hws = [committed_lsn(lake, p) for p in range(8)]
    assert all(h is not None for h in hws)
    assert len(set(hws)) == 1  # all advanced to the same point
    empty_parts = [
        p for p in range(8)
        if all(m.get("kind") == "empty" for m in lineage(lake, p))
    ]
    assert len(empty_parts) >= 5


def test_schema_evolution_across_delta_chain(ray_session, tmp_path):
    """Mixed-epoch binlog ingested in many small micro-batches: deltas of
    different physical schemas stack on one chain; reconstruction must
    unify (widen) and match a plain full replay."""
    from grate_ray.genlog import GenSpec, generate_binlog
    from grate_ray.pipelines.cdc import replay
    from grate_ray.pipelines.ingest import ingest, read_lake

    binlog = str(tmp_path / "binlog")
    lake = str(tmp_path / "lake")
    generate_binlog(
        binlog,
        GenSpec(num_events=18_000, chunk_rows=3_000, seed=11, num_convs=40,
                epoch0_frac=0.5),
    )
    ingest(binlog, lake, num_partitions=4, files_per_microbatch=1)
    lake_df = (
        read_lake(lake).to_pandas()
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    replay_df = (
        replay(binlog, num_partitions=4).to_pandas()
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    assert lake_df.equals(replay_df[lake_df.columns.tolist()])
