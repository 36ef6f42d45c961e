"""Deterministic binlog derivation from the driver's ``events`` table.

The driver's correctness gate runs each Ray query AND an oracle SQL string
side-by-side on the same parquet tables. To make the CDC replay
oracle-checkable, the change-event binlog is *derived* from the ``events``
table with pure modular arithmetic — expressed identically as Arrow/numpy
kernels here and as the SQL fragment ``BINLOG_SQL`` (used by
``__ray_entry__.oracle_sql``). No randomness, no hashing, no files.

Mapping (events → binlog envelope, FIXTURES.md F2):
  lsn      = event_id
  conv_id  = 'conv' || (user_id % 211)
  turn_idx = event_id % 37
  op       = 'D' if event_id % 17 == 3, 'U' if event_id % 3 == 1, else 'I'
  role     = ('user','assistant','system','tool')[event_id % 4]
  text     = event_type || ' #' || (event_id % 997)
  tool     = ('search','calc',NULL,NULL,NULL)[event_id % 5]
  ts       = ts
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

_ROLES = np.array(["user", "assistant", "system", "tool"])


def derive_binlog_batch(t: pa.Table) -> pa.Table:
    eid = t["event_id"].to_numpy(zero_copy_only=False)
    uid = t["user_id"].to_numpy(zero_copy_only=False)
    op = np.where(eid % 17 == 3, "D", np.where(eid % 3 == 1, "U", "I"))
    conv = np.char.add("conv", (uid % 211).astype("U8"))
    turn = (eid % 37).astype(np.int32)
    role = _ROLES[eid % 4]
    num = pa.array((eid % 997).astype("U8"))
    text = pc.binary_join_element_wise(
        t["event_type"].combine_chunks(), num, " #"
    )
    tool = np.full(len(eid), None, dtype=object)
    tool[eid % 5 == 0] = "search"
    tool[eid % 5 == 1] = "calc"
    return pa.table(
        {
            "op": pa.array(op),
            "lsn": t["event_id"],
            "conv_id": pa.array(conv),
            "turn_idx": pa.array(turn),
            "role": pa.array(role),
            "text": text,
            "tool": pa.array(tool, pa.string()),
            "ts": t["ts"],
        }
    )


def binlog_from_events(sf_dir: str) -> ray.data.Dataset:
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "event_type", "ts"],
    )
    return ds.map_batches(derive_binlog_batch, batch_format="pyarrow")


# The same derivation as ANSI SQL over the pre-registered `events` view.
BINLOG_SQL = """
SELECT
  CASE WHEN event_id % 17 = 3 THEN 'D'
       WHEN event_id % 3 = 1 THEN 'U'
       ELSE 'I' END                                   AS op,
  event_id                                            AS lsn,
  'conv' || CAST(user_id % 211 AS VARCHAR)            AS conv_id,
  CAST(event_id % 37 AS INTEGER)                      AS turn_idx,
  CASE event_id % 4 WHEN 0 THEN 'user' WHEN 1 THEN 'assistant'
       WHEN 2 THEN 'system' ELSE 'tool' END           AS role,
  event_type || ' #' || CAST(event_id % 997 AS VARCHAR) AS text,
  CASE event_id % 5 WHEN 0 THEN 'search' WHEN 1 THEN 'calc'
       ELSE NULL END                                  AS tool,
  ts                                                  AS ts
FROM events
"""

# LWW final state over any binlog-shaped relation (SQL mirror of
# stages/merge.py lww_reduce + finalize).
LWW_FINAL_SQL = """
SELECT conv_id, turn_idx, role, text, tool, ts
FROM (
  SELECT *, row_number() OVER (
           PARTITION BY conv_id, turn_idx
           ORDER BY ts DESC, lsn DESC) AS rn
  FROM ({binlog}) b
) r
WHERE rn = 1 AND op <> 'D'
"""
