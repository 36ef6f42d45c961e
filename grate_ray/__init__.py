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
