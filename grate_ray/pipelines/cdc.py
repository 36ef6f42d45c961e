"""The flagship pipeline: binlog replay → lake final state, Ray-Data-first.

Shape (SURVEY.md §3.4):

    read_parquet(binlog chunks, schema-grouped)
      → map_batches(reconcile, pyarrow)     # schema evolution, stateless
      → map_batches(lww_reduce, pyarrow)    # partial LWW combine, no shuffle
      → map_batches(add partition column)
      → groupby(part).map_groups(final LWW reduce + finalize)   # THE shuffle
      [salted variant: groupby(spart) partial → groupby(part) final]

The partial reduce before the shuffle is the load-bearing scale decision:
update-heavy streams collapse to ≤1 row per key per block before any data
moves, so the all-to-all exchange ships keys, not history. This mirrors how
the reference replays its record log straight into a keyed grid rather than
keeping the log around (/root/reference/xls/sheets.go:104-437).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from ..schema import BINLOG_SCHEMA
from ..stages.evolve import make_reconciler, unify
from ..stages.merge import finalize, lww_reduce
from ..stages.partition import (
    add_partition_column,
    add_salted_partition_column,
    spart_to_part,
)


def list_binlog_files(path: str) -> list[str]:
    if os.path.isfile(path):
        return [path]
    return sorted(
        os.path.join(path, p) for p in os.listdir(path) if p.endswith(".parquet")
    )


def read_binlog(path: str, target_schema: pa.Schema | None = None) -> ray.data.Dataset:
    """Read a binlog directory that may mix physical schemas (epochs).

    Files are grouped by physical schema; each group becomes one
    ``read_parquet`` whose batches are reconciled to the unified target
    inside ``map_batches`` (stateless, no shuffle); groups are unioned.
    """
    files = list_binlog_files(path)
    if not files:
        raise FileNotFoundError(f"no parquet chunks under {path}")
    by_schema: dict[str, tuple[pa.Schema, list[str]]] = {}
    for f in files:
        s = pq.read_schema(f)
        by_schema.setdefault(s.to_string(), (s, []))[1].append(f)
    target = target_schema or unify(
        [s for s, _ in by_schema.values()] + [BINLOG_SCHEMA]
    )
    parts = []
    for s, group in by_schema.values():
        ds = ray.data.read_parquet(group)
        if not s.equals(target):
            ds = ds.map_batches(make_reconciler(target), batch_format="pyarrow")
        parts.append(ds)
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def apply_binlog(
    ds: ray.data.Dataset,
    num_partitions: int = 32,
    hot_keys: frozenset[str] | None = None,
    num_salts: int = 8,
) -> ray.data.Dataset:
    """Reduce a binlog Dataset to the lake final state (a lake-schema
    Dataset, key-sorted within partition). The only shuffle is the
    groupby on the partition column."""
    from ..context import REDUCE_BATCH_SIZE, configure_shuffle

    configure_shuffle(num_partitions)
    ds = ds.map_batches(
        lww_reduce, batch_format="pyarrow", batch_size=REDUCE_BATCH_SIZE
    )

    if hot_keys:
        # two-phase salted merge: partial reduce per (part, salt) sub-shard,
        # then final reduce per part — exact by LWW associativity.
        def add_spart(t: pa.Table) -> pa.Table:
            return add_salted_partition_column(
                t, num_partitions, num_salts, hot_keys
            )

        ds = ds.map_batches(add_spart, batch_format="pyarrow")
        ds = ds.groupby("spart").map_groups(
            lambda t: lww_reduce(t), batch_format="pyarrow"
        )
        ds = ds.map_batches(
            lambda t: spart_to_part(t, num_salts), batch_format="pyarrow"
        )
        # coalesce between the two shuffles: map_groups can emit schema-less
        # empty blocks for empty hash partitions, and Ray's hash-shuffle
        # schema broadcast poisons downstream aggregators if such a block is
        # shuffled first; repartition rebuilds blocks and drops empties
        ds = ds.repartition(max(2, num_partitions // 4))
    else:
        ds = ds.map_batches(
            lambda t: add_partition_column(t, num_partitions),
            batch_format="pyarrow",
        )

    def final_group(t: pa.Table) -> pa.Table:
        return finalize(lww_reduce(t))

    return ds.groupby("part").map_groups(final_group, batch_format="pyarrow")


def replay(binlog_path: str, num_partitions: int = 32, **kw) -> ray.data.Dataset:
    """read → reconcile → reduce → shuffle-merge; returns the lake view."""
    return apply_binlog(read_binlog(binlog_path), num_partitions=num_partitions, **kw)
