"""Arrow schemas for the transcript lake and the change-event binlog.

The lake table schema comes from ``BASELINE.json:input_hint``; the binlog
envelope adds ``op`` / ``lsn``, the analogue of the reference's typed record
stream ``rec{RecType, RecSize, Data}`` + file position LSN
(/root/reference/xls/structs.go:17-21, xls/xls.go:207).

Epoch-0 of the binlog (pre-evolution) lacks the ``tool`` column and carries
``ts`` as int32 epoch-seconds; the evolution reconciler (stages/evolve.py)
widens both to the current lake schema — the disciplined version of the
reference's grow-on-out-of-bounds grid writes
(/root/reference/commonxl/sheet.go:53-68).
"""

from __future__ import annotations

import pyarrow as pa

# --- lake table (final state) ------------------------------------------------

KEY_COLS = ["conv_id", "turn_idx"]
ORDER_COLS = ["ts", "lsn"]  # LWW tiebreak: later (ts, lsn) wins

LAKE_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
        pa.field("role", pa.string()),
        pa.field("text", pa.string()),
        pa.field("tool", pa.string()),  # nullable; absent pre-evolution
        pa.field("ts", pa.timestamp("us")),
    ]
)

PAYLOAD_COLS = ["role", "text", "tool", "ts"]

# --- binlog (change-event stream) -------------------------------------------

BINLOG_SCHEMA = pa.schema(
    [
        pa.field("op", pa.string()),  # 'I' | 'U' | 'D' (D carries key cols only)
        pa.field("lsn", pa.int64()),  # strictly increasing log sequence number
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
        pa.field("role", pa.string()),
        pa.field("text", pa.string()),
        pa.field("tool", pa.string()),
        pa.field("ts", pa.timestamp("us")),
    ]
)

# Epoch-0 (pre-evolution): no `tool`, ts encoded as int32 epoch-seconds.
BINLOG_SCHEMA_EPOCH0 = pa.schema(
    [
        pa.field("op", pa.string()),
        pa.field("lsn", pa.int64()),
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
        pa.field("role", pa.string()),
        pa.field("text", pa.string()),
        pa.field("ts", pa.int32()),  # epoch seconds (widening target)
    ]
)

BINLOG_COLS = [f.name for f in BINLOG_SCHEMA]


def empty_lake_table() -> pa.Table:
    return LAKE_SCHEMA.empty_table()


def empty_binlog_table() -> pa.Table:
    return BINLOG_SCHEMA.empty_table()
