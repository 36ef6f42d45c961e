"""Schema-evolution reconciler: Arrow schema union + widening casts.

The reference tolerates shape drift by growing the grid on out-of-bounds
writes and coercing each cell to its *declared* format type
(/root/reference/commonxl/sheet.go:53-68, commonxl/cell.go:119-196 — the
"schema widening" machinery). Our disciplined version: every batch is
reconciled to the current target schema per commit —

- **column add**: a field missing from the batch materializes as all-null
  (nullable) — e.g. the epoch-0 binlog lacks ``tool``;
- **type widen**: int widening (int8→…→int64), float widening, and the
  epoch-0 special case int32 *epoch-seconds* → ``timestamp[us]``;
- extra columns not in the target are preserved (the target is a minimum).

``unify`` computes the evolution-lattice join of observed schemas so the
target itself can evolve as new epochs appear mid-stream.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_INT_ORDER = {
    pa.int8(): 0, pa.int16(): 1, pa.int32(): 2, pa.int64(): 3,
    pa.uint8(): 0, pa.uint16(): 1, pa.uint32(): 2, pa.uint64(): 3,
}


def _widen(a: pa.DataType, b: pa.DataType) -> pa.DataType:
    """Join of two types in the widening lattice."""
    if a == b:
        return a
    if pa.types.is_integer(a) and pa.types.is_integer(b):
        return a if _INT_ORDER[a] >= _INT_ORDER[b] else b
    if (pa.types.is_floating(a) and pa.types.is_integer(b)) or (
        pa.types.is_integer(a) and pa.types.is_floating(b)
    ):
        return a if pa.types.is_floating(a) else b
    if pa.types.is_floating(a) and pa.types.is_floating(b):
        return a if a.bit_width >= b.bit_width else b
    # int epoch-seconds vs timestamp → timestamp[us]
    if pa.types.is_timestamp(a) and pa.types.is_integer(b):
        return a
    if pa.types.is_integer(a) and pa.types.is_timestamp(b):
        return b
    if pa.types.is_string(a) or pa.types.is_string(b):
        return pa.string()
    raise TypeError(f"cannot widen {a} vs {b}")


def unify(schemas: list[pa.Schema]) -> pa.Schema:
    """Union of field names; widened join of types; order = first-seen."""
    fields: dict[str, pa.DataType] = {}
    for s in schemas:
        for f in s:
            if f.name in fields:
                fields[f.name] = _widen(fields[f.name], f.type)
            else:
                fields[f.name] = f.type
    return pa.schema([pa.field(n, t) for n, t in fields.items()])


# envelope + key + LWW-order columns: schema evolution may never rename or
# drop these (the merge machinery addresses them by name)
PROTECTED_COLS = frozenset({"op", "lsn", "conv_id", "turn_idx", "ts"})


def apply_renames(t: pa.Table, renames: dict[str, str] | None) -> pa.Table:
    """Rename columns physical → logical (zero-copy, metadata-only).
    Names absent from the table are ignored, so one rename map serves
    every epoch of a mixed-schema stream."""
    if not renames:
        return t
    return t.rename_columns([renames.get(n, n) for n in t.column_names])


def rename_schema(s: pa.Schema, renames: dict[str, str] | None) -> pa.Schema:
    if not renames:
        return s
    return pa.schema(
        [pa.field(renames.get(f.name, f.name), f.type) for f in s]
    )


def reconcile(t: pa.Table, target: pa.Schema) -> pa.Table:
    """Cast/extend ``t`` to carry at least the target schema's columns.

    Column order follows the target (extras appended) so downstream
    ``pa.concat_tables`` / Ray block unioning sees one stable schema.
    """
    cols: dict[str, pa.ChunkedArray | pa.Array] = {}
    for f in target:
        if f.name not in t.column_names:
            cols[f.name] = pa.nulls(t.num_rows, f.type)
            continue
        c = t[f.name]
        if c.type == f.type:
            cols[f.name] = c
        elif pa.types.is_timestamp(f.type) and pa.types.is_integer(c.type):
            # epoch-0 widening: int epoch-seconds → timestamp[us]
            us = pc.multiply(c.cast(pa.int64()), pa.scalar(1_000_000, pa.int64()))
            cols[f.name] = us.cast(f.type)
        else:
            cols[f.name] = c.cast(f.type)
    for name in t.column_names:
        if name not in cols:
            cols[name] = t[name]
    return pa.table(cols)


def make_reconciler(target: pa.Schema, renames: dict[str, str] | None = None):
    """A map_batches-ready closure (stateless task) that pins the target.
    ``renames`` maps legacy physical column names → canonical names and is
    applied before the cast/extend (COLUMN RENAME evolution: a source
    epoch that renamed ``role`` → ``speaker`` reconciles into the same
    lake column, Delta-column-mapping style)."""

    def _fn(t: pa.Table) -> pa.Table:
        return reconcile(apply_renames(t, renames), target)

    return _fn
