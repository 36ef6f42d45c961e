"""Copy-on-write branch semantics: zero-copy fork, isolation, diff."""

import glob
import os

import pandas as pd
import pyarrow as pa
import ray.data


def _build_lake(tmp_path, n_events=12_000, n_convs=80, parts=8):
    from grate_ray.genlog import GenSpec, generate_binlog
    from grate_ray.pipelines.ingest import ingest

    bl, lk = str(tmp_path / "binlog"), str(tmp_path / "lake")
    generate_binlog(
        bl, GenSpec(num_events=n_events, num_convs=n_convs, chunk_rows=3_000)
    )
    ingest(bl, lk, num_partitions=parts, files_per_microbatch=None)
    return lk


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    return (
        df.sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)[["conv_id", "turn_idx", "role", "text", "tool", "ts"]]
    )


def test_branch_is_zero_copy_and_reads_equal(ray_session, tmp_path):
    from grate_ray.pipelines.branch import branch_lake
    from grate_ray.pipelines.ingest import read_lake

    lk = _build_lake(tmp_path)
    br = str(tmp_path / "branch")
    info = branch_lake(lk, br)
    assert info["manifests"] > 0
    # zero-copy: the branch holds no data files, only manifests+config
    assert glob.glob(os.path.join(br, "part=*", "*.parquet")) == []
    pd.testing.assert_frame_equal(
        _canon(read_lake(br).to_pandas()), _canon(read_lake(lk).to_pandas())
    )


def test_branch_divergence_is_isolated(ray_session, tmp_path):
    from grate_ray.pipelines.branch import branch_lake, diff_branches
    from grate_ray.pipelines.ingest import read_lake
    from grate_ray.pipelines.merge_into import merge_into

    lk = _build_lake(tmp_path)
    br = str(tmp_path / "branch")
    branch_lake(lk, br)
    base = read_lake(lk).to_pandas()

    src = base[base.turn_idx % 4 == 1].copy()
    src["text"] = "BR:" + src["text"]
    src["_del"] = False
    dele = base[base.turn_idx % 9 == 0].copy()
    dele["_del"] = True
    srct = pa.Table.from_pandas(pd.concat([src, dele]), preserve_index=False)
    merge_into(br, ray.data.from_arrow(srct), delete_col="_del")

    # branch sees the merge…
    after = read_lake(br).to_pandas()
    exp = base.copy()
    m = exp.turn_idx % 4 == 1
    exp.loc[m, "text"] = "BR:" + exp.loc[m, "text"]
    exp = exp[exp.turn_idx % 9 != 0]
    pd.testing.assert_frame_equal(_canon(after), _canon(exp))
    # …the parent does not
    pd.testing.assert_frame_equal(_canon(read_lake(lk).to_pandas()), _canon(base))

    # diff reports exactly the divergence (relative to the branch)
    d = diff_branches(lk, br).to_pandas()
    counts = d["change_op"].value_counts().to_dict()
    n_upd = ((base.turn_idx % 4 == 1) & (base.turn_idx % 9 != 0)).sum()
    n_del = (base.turn_idx % 9 == 0).sum()
    assert counts.get("U", 0) == n_upd
    assert counts.get("D", 0) == n_del
    assert counts.get("I", 0) == 0


def test_branch_at_lsn_matches_time_travel(ray_session, tmp_path):
    from grate_ray.pipelines.branch import branch_lake
    from grate_ray.pipelines.ingest import read_lake
    from grate_ray.state.manifest import committed_lsn, list_partitions

    from grate_ray.genlog import GenSpec, generate_binlog
    from grate_ray.pipelines.ingest import ingest

    bl, lk = str(tmp_path / "binlog"), str(tmp_path / "lake")
    generate_binlog(
        bl, GenSpec(num_events=12_000, num_convs=80, chunk_rows=3_000)
    )
    # two micro-batch windows → at least two commit points per partition
    ingest(bl, lk, num_partitions=8, files_per_microbatch=2, auto_compact=False)
    hws = sorted(committed_lsn(lk, p) for p in list_partitions(lk))
    mid = hws[0] - 1  # below the head: resolves to an earlier commit
    br = str(tmp_path / "branch_mid")
    branch_lake(lk, br, at_lsn=mid)
    pd.testing.assert_frame_equal(
        _canon(read_lake(br).to_pandas()),
        _canon(read_lake(lk, asof_lsn=mid).to_pandas()),
    )


def test_fast_forward_promotes_branch(ray_session, tmp_path):
    from grate_ray.pipelines.branch import (
        branch_lake, diff_branches, fast_forward_branch,
    )
    from grate_ray.pipelines.ingest import read_lake
    from grate_ray.pipelines.merge_into import merge_into

    lk = _build_lake(tmp_path)
    br = str(tmp_path / "branch")
    branch_lake(lk, br)
    base = read_lake(lk).to_pandas()
    src = base[base.turn_idx % 4 == 1].copy()
    src["text"] = "FF:" + src["text"]
    src["_del"] = False
    merge_into(br, ray.data.from_arrow(
        pa.Table.from_pandas(src, preserve_index=False)), delete_col="_del")

    r = fast_forward_branch(lk, br)
    assert r["manifests"] > 0 and r["files"] > 0
    # parent adopted the branch: identical states, empty diff
    pd.testing.assert_frame_equal(
        _canon(read_lake(lk).to_pandas()), _canon(read_lake(br).to_pandas())
    )
    assert len(diff_branches(lk, br).to_pandas()) == 0


def test_fast_forward_refuses_diverged_parent(ray_session, tmp_path):
    import pytest

    from grate_ray.pipelines.branch import branch_lake, fast_forward_branch
    from grate_ray.pipelines.ingest import read_lake
    from grate_ray.pipelines.merge_into import merge_into

    lk = _build_lake(tmp_path)
    br = str(tmp_path / "branch")
    branch_lake(lk, br)
    base = read_lake(lk).to_pandas()
    # parent advances AFTER the fork
    psrc = base[base.turn_idx % 6 == 2].copy()
    psrc["text"] = "P:" + psrc["text"]
    psrc["_del"] = False
    merge_into(lk, ray.data.from_arrow(
        pa.Table.from_pandas(psrc, preserve_index=False)), delete_col="_del")
    with pytest.raises(ValueError, match="fast-forward refused"):
        fast_forward_branch(lk, br)


def test_fsck_lake_detects_damage(ray_session, tmp_path):
    import json
    import os

    from grate_ray.pipelines.compact import fsck_lake
    from grate_ray.state.manifest import manifest_dir

    lk = _build_lake(tmp_path, n_events=6_000, n_convs=40)
    r = fsck_lake(lk, deep=True)
    assert r["ok"], r["errors"]
    assert r["commits"] > 0 and r["checked_files"] > 0

    # delete a head chain file → flagged
    part_files = [
        os.path.join(lk, "part=0", f)
        for f in sorted(os.listdir(os.path.join(lk, "part=0")))
        if f.endswith(".parquet")
    ]
    os.unlink(part_files[-1])
    r2 = fsck_lake(lk)
    assert not r2["ok"]
    assert any("chain file missing" in e for e in r2["errors"])

    # corrupt a manifest → flagged (filename/lsn_hi disagreement)
    md = manifest_dir(lk, 1)
    mf = os.path.join(md, sorted(os.listdir(md))[-1])
    with open(mf) as f:
        m = json.load(f)
    m["lsn_hi"] = m["lsn_hi"] + 1
    with open(mf, "w") as f:
        json.dump(m, f)
    r3 = fsck_lake(lk)
    assert any("disagrees with its filename" in e for e in r3["errors"])
