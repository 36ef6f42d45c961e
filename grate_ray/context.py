"""Ray Data execution tuning for the engine's pipelines.

Measured on the sf0.1 bench binlog (3M events, 32 CPUs): the default
SORT_SHUFFLE_PULL_BASED strategy ran the groupby exchange in ~40s (its
sort-map stage serialized into one task); HASH_SHUFFLE with parallelism
matched to the partition count and a small aggregator pool runs the same
exchange in ~2.5s. Partial-reduce batches of 500k rows collapse ~2×
before the shuffle (vs ~1.3× at Ray's default ~10k block splits).

These are DataContext-level knobs (global per session); we only touch
shuffle settings, and derive sizes from the session's CPU count so the
same code tunes itself at num_cpus=8 and 32 (and on a real cluster).
"""

from __future__ import annotations

import os

# rows per partial-reduce batch; GRAFT_REDUCE_BATCH overrides for tuning
# experiments (bench sweeps — see BASELINE.md's shuffle experiment log).
# Round-3 sweep on the 30M-event headline: 250k → 1.72M ev/s, 500k →
# 1.89M, 1M → 2.45M (reproduced 2.39M), 2M → 2.23M at 32 CPUs; neutral
# at 8 CPUs (767k both) — the larger partial reduce collapses more
# duplicate keys BEFORE the hash exchange, cutting the bandwidth-bound
# shuffle bytes that cap the high-CPU leg on a single box.
REDUCE_BATCH_SIZE = int(os.environ.get("GRAFT_REDUCE_BATCH", "1000000"))


def join_partitions(desired: int = 32) -> int:
    """Partition count for Dataset.join: must not exceed cluster CPUs —
    join aggregator actors scale with partitions and a 32-partition join
    on a 4-CPU cluster deadlocks outright (measured)."""
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    except Exception:
        cpus = 8
    return max(2, min(desired, cpus))


def actor_pool_size(cap: int = 8) -> int:
    """Upper bound for map_batches actor pools, leaving headroom for plain
    map tasks: a pool of ``cpus`` actors starves its own upstream (measured
    deadlock at num_cpus=4 with a 4-actor pool + a shuffle in one DAG).
    Used as the autoscale ceiling for the ANN scorer pools."""
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    except Exception:
        cpus = 8
    return max(1, min(cap, cpus // 2))


def configure_shuffle(num_partitions: int) -> None:
    import ray
    from ray.data import DataContext
    from ray.data.context import ShuffleStrategy

    ctx = DataContext.get_current()
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    except Exception:
        cpus = 8
    ctx.default_hash_shuffle_parallelism = max(8, min(num_partitions, cpus))
    aggs = os.environ.get("GRAFT_SHUFFLE_AGGS")
    ctx.max_hash_shuffle_aggregators = (
        int(aggs) if aggs else max(2, cpus // 4)
    )
    # aggregator actors must not reserve whole CPU slots: at small CPU
    # counts (tests run at 4) full-slot aggregators + any actor-pool map
    # stage starve the map tasks and the pipeline deadlocks
    ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = 0.05
    ctx.hash_aggregate_operator_actor_num_cpus_per_partition_override = 0.05
    # join aggregator actors have their own knob; without it a chained
    # pair of joins at 8 CPUs reserves every slot and deadlocks alongside
    # any fixed actor-pool map stage (measured: minhash verify pipeline)
    ctx.join_operator_actor_num_cpus_per_partition_override = 0.05


def nonempty_blocks(ds):
    """Drop empty blocks from a (bounded) relation before a hash join.

    Ray 2.49 emits SCHEMA-LESS empty blocks from map_batches tasks whose
    input partition was empty (the UDF's typed empty output is ignored),
    and the join's HashShuffleAggregator crashes unifying a schema-less
    block with real rows ("No match or multiple matches for key field
    reference ..."). Any keyed repartition with fewer live keys than
    partitions produces such blocks — the small/skewed-relation regime
    of the candidate/graph joins.

    This is a zero-copy guard: materialize, then rebuild the dataset
    from the NON-EMPTY block refs (moves object refs, not data). If
    every block is empty, reconstruct a typed empty relation from the
    dataset's logical schema so downstream joins see column names.
    Intended for BOUNDED relations (candidates, sizes, graph edges) —
    the callers that already materialize mid-DAG by design."""
    import ray.data as rd

    m = ds.materialize()
    refs, total = [], 0
    for bundle in m.iter_internal_ref_bundles():
        for ref, md in bundle.blocks:
            total += 1
            if md.num_rows:
                refs.append(ref)
    if len(refs) == total:
        return m
    if refs:
        return rd.from_arrow_refs(refs)
    sch = m.schema(fetch_if_missing=True)
    base = getattr(sch, "base_schema", None)
    if base is not None:
        return rd.from_arrow(base.empty_table())
    return m
