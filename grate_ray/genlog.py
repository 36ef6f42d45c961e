"""Deterministic seeded binlog generator + in-memory oracle.

Produces a simulated binlog (parquet directory) of insert/update/delete
change events over transcript rows, the engine's analogue of the reference's
record-log input (/root/reference/xls/xls.go:175-338). Fully vectorized
(numpy) and chunked so bench-scale logs (10^7+ events) generate without
materializing everything.

Properties exercised on purpose (FIXTURES.md F2/F4):
- Zipf-skewed ``conv_id`` distribution (one hot conversation) → salting test.
- Equal-``ts`` duplicate keys → LSN tiebreak test.
- Deletes of never-inserted keys, updates after delete.
- Interleaved schema-evolution epochs: epoch-0 chunks lack ``tool`` and carry
  ``ts`` as int32 epoch-seconds; epoch-1 chunks are the full schema.

The in-memory oracle (`oracle_final_state`) is the trivial reference replay:
a dict keyed ``(conv_id, turn_idx)``, last-writer-wins by ``(ts, lsn)`` —
the analogue of the golden-tsv comparison loop in
/root/reference/xls/simple_test.go:45-91.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .schema import BINLOG_SCHEMA, BINLOG_SCHEMA_EPOCH0

BASE_TS_US = 1_700_000_000_000_000  # 2023-11-14T22:13:20Z, microseconds


@dataclass(frozen=True)
class GenSpec:
    num_events: int = 100_000
    num_convs: int = 1_000
    max_turns: int = 64
    seed: int = 42
    zipf_a: float = 1.3  # Zipf exponent for conv_id skew
    p_update: float = 0.25
    p_delete: float = 0.08
    epoch0_frac: float = 0.0  # leading fraction of the log in epoch-0 schema
    ts_tie_every: int = 8  # ts advances once per this many lsns → equal-ts ties
    chunk_rows: int = 1_000_000
    malformed_frac: float = 0.0  # fraction of rows made invalid (F4 dead-letter)


def _gen_chunk(spec: GenSpec, lsn_lo: int, lsn_hi: int) -> pa.Table:
    """Generate events [lsn_lo, lsn_hi) as a full-schema (epoch-1) table."""
    n = lsn_hi - lsn_lo
    rng = np.random.default_rng(spec.seed + 7919 * (lsn_lo // max(1, spec.chunk_rows)))
    lsn = np.arange(lsn_lo, lsn_hi, dtype=np.int64)

    # Zipf-skewed conversation ids; tail wraps (mod) so the head stays hot.
    conv_num = (rng.zipf(spec.zipf_a, size=n) - 1) % spec.num_convs
    turn = rng.integers(0, spec.max_turns, size=n).astype(np.int32)

    u = rng.random(n)
    op = np.full(n, "I", dtype="U1")
    op[u < spec.p_update + spec.p_delete] = "U"
    op[u < spec.p_delete] = "D"

    # ts mostly increases with lsn but repeats within ties; occasional jitter
    # makes some later-lsn events carry an *earlier* ts (out-of-order arrival).
    ts = BASE_TS_US + (lsn // spec.ts_tie_every) * 1_000_000
    jitter = rng.integers(-2, 3, size=n) * 1_000_000
    ts = ts + jitter

    conv_s = np.char.add("conv", conv_num.astype("U8"))
    roles = np.array(["user", "assistant", "system", "tool"])
    role = roles[(turn % 4)]
    text = np.char.add(
        np.char.add(np.char.add("msg ", conv_num.astype("U8")), ":"),
        np.char.add(turn.astype("U4"), np.char.add(" v", lsn.astype("U12"))),
    )
    tools = np.array([None, "search", "calc", "browse"], dtype=object)
    tool = tools[rng.integers(0, 4, size=n)]

    is_del = op == "D"
    text = text.astype(object)
    text[is_del] = None
    role = role.astype(object)
    role[is_del] = None
    tool[is_del] = None

    conv_obj = conv_s.astype(object)
    op_obj = op.astype(object)
    ts = ts.astype(object)
    if spec.malformed_frac > 0:
        # malformed frames (F4): bad op / null conv / null ts on non-delete
        bad = rng.random(n) < spec.malformed_frac
        kind = rng.integers(0, 3, size=n)
        op_obj[bad & (kind == 0)] = "X"
        conv_obj[bad & (kind == 1)] = None
        m = bad & (kind == 2)
        for i in np.flatnonzero(m):
            ts[i] = None

    return pa.table(
        {
            "op": pa.array(op_obj, type=pa.string()),
            "lsn": pa.array(lsn),
            "conv_id": pa.array(conv_obj, type=pa.string()),
            "turn_idx": pa.array(turn),
            "role": pa.array(role, type=pa.string()),
            "text": pa.array(text, type=pa.string()),
            "tool": pa.array(tool, type=pa.string()),
            "ts": pa.array(ts, type=pa.int64()).cast(pa.timestamp("us")),
        },
        schema=BINLOG_SCHEMA,
    )


def to_epoch0(t: pa.Table) -> pa.Table:
    """Downgrade a full-schema chunk to the epoch-0 physical schema:
    drop ``tool``, truncate ``ts`` to int32 epoch-seconds."""
    import pyarrow.compute as pc

    ts_s = pc.cast(
        pc.divide(t["ts"].cast(pa.int64()), pa.scalar(1_000_000, pa.int64())),
        pa.int32(),
    )  # null-preserving
    return pa.table(
        {
            "op": t["op"],
            "lsn": t["lsn"],
            "conv_id": t["conv_id"],
            "turn_idx": t["turn_idx"],
            "role": t["role"],
            "text": t["text"],
            "ts": ts_s,
        },
        schema=BINLOG_SCHEMA_EPOCH0,
    )


def generate_binlog(out_dir: str, spec: GenSpec) -> list[str]:
    """Write the binlog as a directory of parquet chunk files; returns paths.

    Files are named ``chunk-<lsn_lo:012d>.parquet`` so lexical order == LSN
    order. Epoch-0 files get the epoch-0 physical schema (schema-evolution
    input); a ``_SPEC`` sentinel makes generation idempotent per spec.
    """
    os.makedirs(out_dir, exist_ok=True)
    sentinel = os.path.join(out_dir, "_SPEC")
    spec_repr = repr(spec)
    if os.path.exists(sentinel):
        with open(sentinel) as f:
            if f.read() == spec_repr:
                return sorted(
                    os.path.join(out_dir, p)
                    for p in os.listdir(out_dir)
                    if p.endswith(".parquet")
                )
    for p in os.listdir(out_dir):
        if p.endswith(".parquet"):
            os.unlink(os.path.join(out_dir, p))

    epoch0_hi = int(spec.num_events * spec.epoch0_frac)
    paths = []
    for lo in range(0, spec.num_events, spec.chunk_rows):
        hi = min(lo + spec.chunk_rows, spec.num_events)
        t = _gen_chunk(spec, lo, hi)
        if hi <= epoch0_hi:
            t = to_epoch0(t)
        elif lo < epoch0_hi:
            # split a chunk straddling the epoch boundary
            t0 = to_epoch0(t.slice(0, epoch0_hi - lo))
            p0 = os.path.join(out_dir, f"chunk-{lo:012d}.parquet")
            pq.write_table(t0, p0)
            paths.append(p0)
            t = t.slice(epoch0_hi - lo)
            lo = epoch0_hi
        p = os.path.join(out_dir, f"chunk-{lo:012d}.parquet")
        pq.write_table(t, p)
        paths.append(p)
    tmp = sentinel + ".tmp"
    with open(tmp, "w") as f:
        f.write(spec_repr)
    os.replace(tmp, sentinel)
    return paths


def oracle_final_state(tables: list[pa.Table]) -> pa.Table:
    """Trivial in-memory reference replay: dict keyed (conv_id, turn_idx),
    LWW by (ts, lsn); deletes remove the key. Small-scale test oracle only."""
    state: dict[tuple[str, int], tuple] = {}
    best: dict[tuple[str, int], tuple[int, int]] = {}
    for t in tables:
        cols = {name: t[name].to_pylist() for name in t.column_names}
        has_tool = "tool" in cols
        ts_is_int = pa.types.is_integer(t.schema.field("ts").type)
        if ts_is_int:
            ts_us_col = [int(v) * 1_000_000 for v in cols["ts"]]
        else:
            ts_us_col = t["ts"].cast(pa.int64()).to_pylist()
        for i in range(t.num_rows):
            op_i = cols["op"][i]
            conv_i = cols["conv_id"][i]
            turn_i = cols["turn_idx"][i]
            # mirror stages/validate.py: malformed frames never reach state
            if (
                op_i not in ("I", "U", "D")
                or conv_i in (None, "")
                or turn_i is None
                or turn_i < 0
                or cols["lsn"][i] is None
                or ts_us_col[i] is None
            ):
                continue
            key = (conv_i, turn_i)
            ts_us = ts_us_col[i]
            order = (ts_us, cols["lsn"][i])
            if key in best and order <= best[key]:
                continue
            best[key] = order
            if cols["op"][i] == "D":
                state[key] = None  # tombstone is the current winner
            else:
                state[key] = (
                    cols["role"][i],
                    cols["text"][i],
                    cols["tool"][i] if has_tool else None,
                    ts_us,
                )
    rows = [
        (k[0], k[1], v[0], v[1], v[2], v[3])
        for k, v in sorted(state.items())
        if v is not None
    ]
    if not rows:
        from .schema import empty_lake_table

        return empty_lake_table()
    conv, turn, role, text, tool, ts = zip(*rows)
    return pa.table(
        {
            "conv_id": pa.array(conv, pa.string()),
            "turn_idx": pa.array(turn, pa.int32()),
            "role": pa.array(role, pa.string()),
            "text": pa.array(text, pa.string()),
            "tool": pa.array(tool, pa.string()),
            "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
        }
    )
