"""Event-frame validation: malformed change events → dead-letter, never
crash (FIXTURES.md F4; the hardened version of the reference's per-file
error-and-skip, /root/reference/cmd/grater/main.go:26-30).

A binlog row is malformed iff any envelope/key field is unusable:
  - op not in {I, U, D}
  - lsn null
  - conv_id null/empty, turn_idx null or negative
  - null ts (every op needs a ts: it is LWW-order-bearing, deletes included)

``split_valid`` is vectorized (one boolean mask per rule); the dead-letter
side keeps the full row plus a ``reason`` column for triage, written by the
ingest loop to ``<lake>/_deadletter/`` as parquet.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

DEADLETTER_DIRNAME = "_deadletter"


def _mask_or(*masks):
    out = masks[0]
    for m in masks[1:]:
        out = pc.or_kleene(out, m)
    return out


def split_valid(t: pa.Table) -> tuple[pa.Table, pa.Table]:
    """Returns (valid_rows, deadletter_rows_with_reason)."""
    op_bad = pc.invert(pc.is_in(t["op"], value_set=pa.array(["I", "U", "D"])))
    op_bad = pc.fill_null(op_bad, True)
    lsn_bad = pc.is_null(t["lsn"])
    conv_bad = pc.or_kleene(
        pc.is_null(t["conv_id"]), pc.equal(pc.fill_null(t["conv_id"], ""), "")
    )
    turn_bad = pc.or_kleene(
        pc.is_null(t["turn_idx"]),
        pc.less(pc.fill_null(t["turn_idx"], pa.scalar(-1, t["turn_idx"].type)), 0),
    )
    ts_bad = pc.is_null(t["ts"])
    bad = pc.fill_null(_mask_or(op_bad, lsn_bad, conv_bad, turn_bad, ts_bad), True)

    valid = t.filter(pc.invert(bad))
    dead = t.filter(bad)
    if dead.num_rows:
        reasons = []
        ob, lb, cb, tb, sb = (
            pc.fill_null(m, True).to_pylist() if hasattr(m, "to_pylist") else m
            for m in (op_bad, lsn_bad, conv_bad, turn_bad, ts_bad)
        )
        keep = pc.fill_null(bad, True).to_pylist()
        for i, k in enumerate(keep):
            if not k:
                continue
            r = []
            if ob[i]:
                r.append("bad_op")
            if lb[i]:
                r.append("null_lsn")
            if cb[i]:
                r.append("bad_conv_id")
            if tb[i]:
                r.append("bad_turn_idx")
            if sb[i]:
                r.append("null_ts")
            reasons.append("+".join(r) or "unknown")
        dead = dead.append_column("reason", pa.array(reasons, pa.string()))
    else:
        dead = dead.append_column("reason", pa.array([], pa.string()))
    return valid, dead
