"""Delta-style MERGE INTO semantics, idempotence, and changefeed visibility."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def _build_lake(tmp_path, n_events=20_000, n_convs=200, parts=8):
    from grate_ray.genlog import GenSpec, generate_binlog
    from grate_ray.pipelines.ingest import ingest

    bl, lk = str(tmp_path / "binlog"), str(tmp_path / "lake")
    generate_binlog(
        bl, GenSpec(num_events=n_events, num_convs=n_convs, chunk_rows=5_000)
    )
    ingest(bl, lk, num_partitions=parts, files_per_microbatch=None)
    return lk


def _source_from(before: pd.DataFrame) -> pa.Table:
    """Updates (turn%3==0, not deleted keys), inserts (+100000 turns),
    deletes (turn%7==0) — disjoint key sets so classification is
    unambiguous."""
    upd = before[(before.turn_idx % 3 == 0) & (before.turn_idx % 7 != 0)].copy()
    upd["text"] = upd["text"].str.upper() + "!"
    upd["_del"] = False
    ins = before[before.turn_idx % 5 == 2].copy()
    ins["turn_idx"] = ins["turn_idx"] + 100_000
    ins["role"] = "merged"
    ins["_del"] = False
    dele = before[before.turn_idx % 7 == 0].copy()
    dele["_del"] = True
    src = pd.concat([upd, ins, dele], ignore_index=True)
    return pa.Table.from_pandas(src, preserve_index=False)


def _expected(before: pd.DataFrame) -> pd.DataFrame:
    upd_mask = (before.turn_idx % 3 == 0) & (before.turn_idx % 7 != 0)
    exp = before.copy()
    exp.loc[upd_mask, "text"] = exp.loc[upd_mask, "text"].str.upper() + "!"
    exp = exp[exp.turn_idx % 7 != 0]
    ins = before[before.turn_idx % 5 == 2].copy()
    ins["turn_idx"] = ins["turn_idx"] + 100_000
    ins["role"] = "merged"
    return pd.concat([exp, ins], ignore_index=True)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    return (
        df.sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)[["conv_id", "turn_idx", "role", "text", "tool", "ts"]]
    )


def test_merge_into_semantics_and_idempotence(ray_session, tmp_path):
    from grate_ray.pipelines.ingest import read_lake
    from grate_ray.pipelines.merge_into import merge_into

    lk = _build_lake(tmp_path)
    before = read_lake(lk).to_pandas()
    assert len(before) > 1000
    src = _source_from(before)

    m = merge_into(lk, ray.data.from_arrow(src), delete_col="_del")
    assert m.num_rows > 0  # commits happened
    after = read_lake(lk).to_pandas()
    pd.testing.assert_frame_equal(_canon(after), _canon(_expected(before)))

    # idempotence: merging the identical source again is a state no-op
    # (updates re-apply the same payload; inserts become updates with the
    # same payload; deleted keys are unmatched + flagged → skipped)
    merge_into(lk, ray.data.from_arrow(src), delete_col="_del")
    again = read_lake(lk).to_pandas()
    pd.testing.assert_frame_equal(_canon(again), _canon(after))


def test_merge_visible_in_changefeed(ray_session, tmp_path):
    """A merge commits through the ordinary ingest path, so lake_changes
    between the pre- and post-merge high-water marks reports exactly the
    net I/U/D the merge performed."""
    from grate_ray.pipelines.ingest import lake_changes, read_lake
    from grate_ray.pipelines.merge_into import merge_into
    from grate_ray.state.manifest import committed_lsn, list_partitions

    lk = _build_lake(tmp_path, n_events=8_000, n_convs=60)
    before = read_lake(lk).to_pandas()
    hw0 = max(committed_lsn(lk, p) for p in list_partitions(lk))
    src = _source_from(before)
    merge_into(lk, ray.data.from_arrow(src), delete_col="_del")
    hw1 = max(committed_lsn(lk, p) for p in list_partitions(lk))

    ch = lake_changes(lk, from_lsn=hw0, to_lsn=hw1).to_pandas()
    n_upd = ((before.turn_idx % 3 == 0) & (before.turn_idx % 7 != 0)).sum()
    n_ins = (before.turn_idx % 5 == 2).sum()
    n_del = (before.turn_idx % 7 == 0).sum()
    got = ch["change_op"].value_counts().to_dict()
    # updates that don't change the payload (text already ends with "!"?
    # impossible here) all count; changefeed reports NET row changes
    assert got.get("I", 0) == n_ins
    assert got.get("D", 0) == n_del
    assert got.get("U", 0) == n_upd


def test_merge_duplicate_source_keys_resolve_by_ts(ray_session, tmp_path):
    from grate_ray.pipelines.ingest import read_lake
    from grate_ray.pipelines.merge_into import merge_into

    lk = _build_lake(tmp_path, n_events=4_000, n_convs=30)
    before = read_lake(lk).to_pandas()
    key = before.iloc[0]
    rows = []
    for i, txt in enumerate(["older", "newer"]):
        rows.append(
            {
                "conv_id": key.conv_id,
                "turn_idx": int(key.turn_idx),
                "role": "r",
                "text": txt,
                "tool": None,
                "ts": pd.Timestamp("2026-01-01") + pd.Timedelta(seconds=i),
                "_del": False,
            }
        )
    src = pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False)
    merge_into(lk, ray.data.from_arrow(src), delete_col="_del")
    after = read_lake(lk).to_pandas()
    got = after[
        (after.conv_id == key.conv_id) & (after.turn_idx == key.turn_idx)
    ]["text"].tolist()
    assert got == ["newer"]


def test_expire_rows_ttl(ray_session, tmp_path):
    from grate_ray.pipelines.ingest import read_lake
    from grate_ray.pipelines.merge_into import expire_rows

    lk = _build_lake(tmp_path, n_events=6_000, n_convs=50)
    before = read_lake(lk).to_pandas()
    cutoff = before["ts"].sort_values().iloc[len(before) // 2]
    expire_rows(lk, cutoff)
    after = read_lake(lk).to_pandas()
    exp = before[before["ts"] >= cutoff]
    pd.testing.assert_frame_equal(_canon(after), _canon(exp))
    # idempotent: nothing old remains, second expiry changes nothing
    expire_rows(lk, cutoff)
    pd.testing.assert_frame_equal(_canon(read_lake(lk).to_pandas()), _canon(exp))


def test_writer_lock_blocks_live_and_ignores_stale(ray_session, tmp_path):
    """flock semantics: a process HOLDING the kernel lock blocks ingest;
    a crashed writer's leftover lock FILE is inert (the kernel released
    the flock on exit), so no stealing — and no steal race — is needed."""
    import json
    import os
    import subprocess
    import sys

    import pytest

    from grate_ray.state.manifest import ConcurrentWriterError, writer_lock

    lk = _build_lake(tmp_path, n_events=3_000, n_convs=20)
    lock_path = os.path.join(lk, "_writer.lock")

    # a LIVE foreign writer (subprocess holding the flock) blocks ingest
    holder = subprocess.Popen(
        [
            sys.executable,
            "-c",
            "import fcntl,os,sys,json,time\n"
            f"fd=os.open({lock_path!r}, os.O_CREAT|os.O_RDWR)\n"
            "fcntl.flock(fd, fcntl.LOCK_EX)\n"
            "os.write(fd, json.dumps({'pid': os.getpid()}).encode())\n"
            "print('locked', flush=True)\n"
            "time.sleep(60)\n",
        ],
        stdout=subprocess.PIPE,
    )
    try:
        assert holder.stdout.readline().strip() == b"locked"
        from grate_ray.genlog import GenSpec, generate_binlog
        from grate_ray.pipelines.ingest import ingest

        bl2 = str(tmp_path / "binlog2")
        generate_binlog(
            bl2, GenSpec(num_events=3_000, num_convs=20, chunk_rows=3_000)
        )
        with pytest.raises(ConcurrentWriterError):
            ingest(bl2, lk, num_partitions=8, files_per_microbatch=None)
    finally:
        holder.kill()
        holder.wait()

    # a DEAD writer's leftover lock file carries no flock: ingest proceeds
    with open(lock_path, "w") as f:
        json.dump({"pid": 999999999, "ts": 0}, f)
    ingest(bl2, lk, num_partitions=8, files_per_microbatch=None)

    # context manager releases the flock on exit (file persists by design)
    with writer_lock(lk):
        assert os.path.exists(lock_path)
    with writer_lock(lk):
        pass  # re-acquirable immediately


def test_merge_update_with_older_source_ts_applies(ray_session, tmp_path):
    """MERGE semantics: WHEN MATCHED THEN UPDATE applies regardless of the
    source row's ts. The emitted event carries ts = max(source ts, lake
    ts) and an above-high-water lsn, so it wins the (ts, lsn) LWW order
    even when the source ts is OLDER than the lake winner's. A null
    source ts inherits the lake ts (deterministic, still applies)."""
    from grate_ray.pipelines.ingest import read_lake
    from grate_ray.pipelines.merge_into import merge_into

    lk = _build_lake(tmp_path, n_events=4_000, n_convs=30)
    before = read_lake(lk).to_pandas()
    k_old = before.iloc[0]
    k_null = before.iloc[1]
    rows = [
        {
            "conv_id": k_old.conv_id,
            "turn_idx": int(k_old.turn_idx),
            "role": "r",
            "text": "older-ts-update",
            "tool": None,
            "ts": pd.Timestamp(k_old.ts) - pd.Timedelta(days=365),
            "_del": False,
        },
        {
            "conv_id": k_null.conv_id,
            "turn_idx": int(k_null.turn_idx),
            "role": "r",
            "text": "null-ts-update",
            "tool": None,
            "ts": pd.NaT,
            "_del": False,
        },
    ]
    src = pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False)
    merge_into(lk, ray.data.from_arrow(src), delete_col="_del")
    after = read_lake(lk).to_pandas()

    got_old = after[
        (after.conv_id == k_old.conv_id) & (after.turn_idx == k_old.turn_idx)
    ]
    assert got_old["text"].tolist() == ["older-ts-update"]
    # stored ts is the max — the lake's original ts, never rewound
    assert got_old["ts"].iloc[0] == k_old.ts

    got_null = after[
        (after.conv_id == k_null.conv_id) & (after.turn_idx == k_null.turn_idx)
    ]
    assert got_null["text"].tolist() == ["null-ts-update"]
    assert got_null["ts"].iloc[0] == k_null.ts


def test_merge_lsn_frontier_clears_pending_binlog(ray_session, tmp_path):
    """A merge into a lake whose binlog holds an UN-INGESTED backlog must
    not mint LSNs that collide with the backlog's: with source_binlog
    passed, merge LSNs start above every pending chunk LSN, so a later
    drain keeps the strict (ts, lsn) total order and disjoint windows."""
    from grate_ray.genlog import GenSpec, generate_binlog
    from grate_ray.pipelines.cdc import list_binlog_files
    from grate_ray.pipelines.ingest import _chunk_lsn_ranges, ingest, read_lake
    from grate_ray.pipelines.merge_into import merge_into
    from grate_ray.state.manifest import committed_lsn, list_partitions

    bl, lk = str(tmp_path / "binlog"), str(tmp_path / "lake")
    generate_binlog(bl, GenSpec(num_events=6_000, num_convs=40, chunk_rows=1_000))
    files = sorted(list_binlog_files(bl))
    # ingest only the first half; the rest stays as a pending backlog
    import os
    import shutil

    staged = str(tmp_path / "staged")
    os.makedirs(staged)
    for f in files[3:]:
        shutil.move(f, os.path.join(staged, os.path.basename(f)))
    ingest(bl, lk, num_partitions=8, files_per_microbatch=None)
    for f in sorted(os.listdir(staged)):
        shutil.move(os.path.join(staged, f), os.path.join(bl, f))

    hw = max(committed_lsn(lk, p) for p in list_partitions(lk))
    backlog_hi = max(hi for _, _, hi in _chunk_lsn_ranges(list_binlog_files(bl)))
    assert backlog_hi > hw  # pending events with LSNs above the mark exist

    before = read_lake(lk).to_pandas()
    key = before.iloc[0]
    src = pa.Table.from_pandas(
        pd.DataFrame(
            [
                {
                    "conv_id": key.conv_id,
                    "turn_idx": int(key.turn_idx),
                    "role": "r",
                    "text": "merged-above-backlog",
                    "tool": None,
                    "ts": pd.Timestamp("2030-01-01"),
                    "_del": False,
                }
            ]
        ),
        preserve_index=False,
    )
    scratch = str(tmp_path / "merge_scratch")
    merge_into(
        lk, ray.data.from_arrow(src), delete_col="_del",
        scratch_dir=scratch, source_binlog=bl,
    )
    merge_lo = min(
        lo for _, lo, _ in _chunk_lsn_ranges(list_binlog_files(scratch))
    )
    assert merge_lo > backlog_hi  # no LSN collision with the pending tail

    # draining the backlog afterwards still applies cleanly
    ingest(bl, lk, num_partitions=8, files_per_microbatch=None)
    after = read_lake(lk).to_pandas()
    got = after[(after.conv_id == key.conv_id) & (after.turn_idx == key.turn_idx)]
    assert got["text"].tolist() == ["merged-above-backlog"]
