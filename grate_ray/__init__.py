"""grate_ray — a Ray-Data-native CDC / incremental-ingest engine.

Recasts the data-processing capabilities of the reference tabular-extraction
library (pbnjay/grate) as a change-data-capture engine over multi-turn
conversation transcripts:

- a simulated binlog of insert/update/delete events (the analogue of the
  reference's BIFF record log, /root/reference/xls/xls.go:175-338) is
  replayed into a partitioned Parquet lake table keyed by
  ``(conv_id, turn_idx)`` with last-writer-wins semantics (the analogue of
  ``Sheet.Put`` upsert, /root/reference/commonxl/sheet.go:51-85);
- format sniffing/decoding (csv/tsv payload frames) mirrors the priority
  registry (/root/reference/grate.go:58-92);
- schema evolution (added columns, widened types) mirrors the reference's
  grow-on-out-of-bounds grid + declared-format coercion
  (/root/reference/commonxl/sheet.go:53-68, cell.go:119-196);
- exactly-once commits via idempotent per-partition manifests mirror (and
  harden) the reference's append-only results.txt manifest
  (/root/reference/cmd/grate2tsv/main.go:103-156).

Everything is expressed Ray-Data-first: ``ray.data.Dataset`` pipelines,
``map_batches`` over zero-copy Arrow, actor pools for stateful stages,
``groupby``/``map_groups`` for the single wide (shuffle) step.
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level API (keeps `import grate_ray` Ray-free until used):
    the lake lifecycle a user drives — tail/commit, read (head or
    time-travel), changefeed, incremental views, compaction."""
    _api = {
        "ingest": ("grate_ray.pipelines.ingest", "ingest"),
        "ingest_follow": ("grate_ray.pipelines.ingest", "ingest_follow"),
        "read_lake": ("grate_ray.pipelines.ingest", "read_lake"),
        "lake_changes": ("grate_ray.pipelines.ingest", "lake_changes"),
        "replay": ("grate_ray.pipelines.cdc", "replay"),
        "apply_binlog": ("grate_ray.pipelines.cdc", "apply_binlog"),
        "compact_lake": ("grate_ray.pipelines.compact", "compact_lake"),
        "incremental_turn_counts": (
            "grate_ray.pipelines.views",
            "incremental_turn_counts",
        ),
        "turn_counts_view": ("grate_ray.pipelines.views", "turn_counts_view"),
        # round-3 lakehouse surface
        "plan_read": ("grate_ray.pipelines.ingest", "plan_read"),
        "export_lake_incremental": (
            "grate_ray.pipelines.ingest",
            "export_lake_incremental",
        ),
        "merge_source_streams": (
            "grate_ray.pipelines.cdc",
            "merge_source_streams",
        ),
        "repartition_lake": ("grate_ray.pipelines.compact", "repartition_lake"),
        "lake_stats": ("grate_ray.pipelines.compact", "lake_stats"),
        "vacuum_lake": ("grate_ray.pipelines.compact", "vacuum_lake"),
        "evolve_lake_schema": (
            "grate_ray.state.manifest",
            "evolve_lake_schema",
        ),
        "backfill_stats": ("grate_ray.state.manifest", "backfill_stats"),
        "tag_lake": ("grate_ray.state.manifest", "tag_lake"),
        "untag_lake": ("grate_ray.state.manifest", "untag_lake"),
        "resolve_tag": ("grate_ray.state.manifest", "resolve_tag"),
        "poll_changes": ("grate_ray.pipelines.views", "poll_changes"),
        "ack_changes": ("grate_ray.pipelines.views", "ack_changes"),
        "content_lookup": ("grate_ray.pipelines.views", "content_lookup"),
        "table_diff": ("grate_ray.pipelines.relational", "table_diff"),
        "global_rank": ("grate_ray.pipelines.relational", "global_rank"),
        "dialog_pairs": ("grate_ray.pipelines.llmprep", "dialog_pairs"),
        # round-3 additions: condition-driven merge, branches, history
        "merge_into": ("grate_ray.pipelines.merge_into", "merge_into"),
        "branch_lake": ("grate_ray.pipelines.branch", "branch_lake"),
        "diff_branches": ("grate_ray.pipelines.branch", "diff_branches"),
        "scd2_history": ("grate_ray.pipelines.cdc", "scd2_history"),
        "semantic_dedup": ("grate_ray.functions.ann", "semantic_dedup"),
        "chunk_dedup": ("grate_ray.functions.dedup", "chunk_dedup"),
        "approx_distinct": ("grate_ray.functions.sketch", "approx_distinct"),
        "fast_forward_branch": ("grate_ray.pipelines.branch", "fast_forward_branch"),
        "expire_rows": ("grate_ray.pipelines.merge_into", "expire_rows"),
        "fsck_lake": ("grate_ray.pipelines.compact", "fsck_lake"),
        "contrastive_triplets": (
            "grate_ray.pipelines.llmprep",
            "contrastive_triplets",
        ),
        "hashed_embeddings": ("grate_ray.functions.embed", "hashed_embeddings"),
    }
    if name in _api:
        import importlib

        mod, attr = _api[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
