"""Last-writer-wins upsert-merge kernels — the core CDC apply.

Semantics reproduced (see SURVEY.md §1.4): the reference's ``Sheet.Put`` is a
keyed upsert where replaying the record log yields last-writer-wins state at
each ``(row, col)`` (/root/reference/commonxl/sheet.go:51-85); absent keys /
blank cells are never materialized (delete ≡ absence,
/root/reference/xls/sheets.go:421-423). Here the key is
``(conv_id, turn_idx)`` and the replay order is the strict total order
``(ts, lsn)`` per key.

LWW-with-tombstones is an **associative, commutative reduction** (argmax by
``(ts, lsn)`` keeping the op tag, dropping 'D' winners only at the very end).
That makes the scale story cheap:

  1. partial reduce inside every ``map_batches`` batch (vectorized numpy
     lexsort — no shuffle, collapses update-heavy streams early);
  2. one hash shuffle on the partition column, final reduce per partition;
  3. optional salt sub-split of hot partitions with a second tiny reduce
     (see stages/partition.py) — still exact because of associativity.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..schema import PAYLOAD_COLS


def _key_codes(t: pa.Table) -> np.ndarray:
    """Dense int64 group codes for (conv_id, turn_idx) — vectorized via
    dictionary-encoding the string key (cheap: unique values only).
    Already-dictionary-encoded conv_id (the slim shuffle payload) reuses
    its indices directly."""
    conv_arr = t["conv_id"].combine_chunks()
    if pa.types.is_dictionary(conv_arr.type):
        conv_codes = conv_arr.indices
    else:
        conv_codes = pc.dictionary_encode(conv_arr).indices
    conv = conv_codes.to_numpy(zero_copy_only=False).astype(np.int64)
    turn = t["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
    return (conv << 32) | (turn & 0xFFFFFFFF)


def lww_reduce(t: pa.Table) -> pa.Table:
    """Reduce a binlog table to ≤1 row per (conv_id, turn_idx): the event
    with max (ts, lsn). Keeps the op column (tombstones survive partial
    reduces). Pure vectorized numpy; zero-copy takes."""
    if t.num_rows <= 1:
        return t
    code = _key_codes(t)
    ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
    lsn = t["lsn"].to_numpy(zero_copy_only=False)
    order = np.lexsort((lsn, ts, code))  # primary: code, then ts, then lsn
    sorted_code = code[order]
    # last element of each code-run is the LWW winner
    is_last = np.empty(len(order), dtype=bool)
    is_last[:-1] = sorted_code[:-1] != sorted_code[1:]
    is_last[-1] = True
    winners = order[is_last]
    return t.take(pa.array(winners))


# slim shuffle payload: 3 × int32 (cnt_events is derived as i+u+d by the
# consumer — 20 fewer bytes per exchanged row than 4 × int64)
COUNT_COLS = ["cnt_i", "cnt_u", "cnt_d"]


def lww_reduce_counted(t: pa.Table) -> pa.Table:
    """LWW reduce that carries exact per-key raw-event counts through
    partial reduces (so commit metrics count each source event once even
    though the shuffle only ships winners). Count columns are initialized
    from ``op`` on first application and summed per key-run afterwards."""
    if COUNT_COLS[0] not in t.column_names:
        op = t["op"].combine_chunks()
        for col, val in (("cnt_i", "I"), ("cnt_u", "U"), ("cnt_d", "D")):
            t = t.append_column(col, pc.cast(pc.equal(op, val), pa.int32()))
    if t.num_rows <= 1:
        return t
    code = _key_codes(t)
    ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
    lsn = t["lsn"].to_numpy(zero_copy_only=False)
    order = np.lexsort((lsn, ts, code))
    sorted_code = code[order]
    starts = np.empty(len(order), dtype=bool)
    starts[0] = True
    starts[1:] = sorted_code[1:] != sorted_code[:-1]
    run_starts = np.flatnonzero(starts)
    is_last = np.empty(len(order), dtype=bool)
    is_last[:-1] = starts[1:]
    is_last[-1] = True
    winners = order[is_last]
    out = t.drop_columns(COUNT_COLS).take(pa.array(winners))
    for col in COUNT_COLS:
        vals = t[col].to_numpy(zero_copy_only=False).astype(np.int64)[order]
        sums = np.add.reduceat(vals, run_starts)
        out = out.append_column(col, pa.array(sums.astype(np.int32)))
    return out


def finalize(t: pa.Table, sort: bool = True) -> pa.Table:
    """Drop tombstone winners and the envelope, order by (conv_id, turn_idx).

    Output contract = the lake schema; stable (conv_id, turn_idx) ordering is
    the analogue of the reference's row-major iteration contract
    (/root/reference/commonxl/sheet.go:111-126).
    """
    t = t.filter(pc.not_equal(t["op"], "D"))
    keep = ["conv_id", "turn_idx"] + [c for c in PAYLOAD_COLS if c in t.column_names]
    t = t.select(keep)
    if sort and t.num_rows > 1:
        idx = pc.sort_indices(
            t, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]
        )
        t = t.take(idx)
    return t


def merge_into_state(state: pa.Table, events: pa.Table) -> pa.Table:
    """Merge incoming binlog events into existing lake-partition *state*.

    Persisted partition state keeps the full reduced envelope — including
    tombstones and the winning ``(ts, lsn)`` per key — so that LWW ordering
    stays exact across commits even when a later-LSN chunk carries an
    earlier ``ts`` (out-of-order arrival). ``finalize`` is only the *read
    view* that drops tombstones; dropping them from persisted state would
    let an out-of-order late event resurrect a deleted key.

    Both inputs carry the binlog envelope (op, lsn, ...). Returns new state
    in the same shape, ≤1 row per key.
    """
    if state.num_rows == 0:
        return lww_reduce(events)
    state = state.select(events.column_names)
    both = pa.concat_tables([state, events], promote_options="default")
    return lww_reduce(both)
