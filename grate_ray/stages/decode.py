"""Ray decode stage: per-payload format dispatch with dead-lettering.

The CDC recast of the reference's Open loop (SURVEY.md §2.1 S2): each input
row is a framed payload (one dropped "file" of rows); an actor-pool stage
holds the decoder registry (state built once per actor, ST1-style) and
tries decoders in priority order per payload. Payloads no decoder accepts
go to the dead-letter output — never a crash (contrast the reference's
panic-prone cell paths, /root/reference/commonxl/cell.go:300).

Output schema is fixed per stage instance (``ncols`` wide): accepted rows
carry ``payload_id, format, row_idx, c0..c{ncols-1}``; dead-letter rows
carry ``format='deadletter'``, null cells and the raw payload for triage.
"""

from __future__ import annotations

import pyarrow as pa

DEADLETTER = "deadletter"


class PayloadDecoder:
    """map_batches callable class → actor pool.

    Expects batches with columns ``payload_id`` (any scalar) and
    ``payload`` (string). Decoded payloads whose width differs from
    ``ncols`` are dead-lettered too (schema stability).
    """

    def __init__(self, ncols: int):
        # registry import installs builtin decoders once per actor
        from ..sources import registry

        self._open = registry.open_payload
        self._unknown = registry.UnknownFormat
        self.ncols = ncols

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fmts, row_idx, payload_keep = [], [], [], []
        tnames: list[str | None] = []
        hiddens: list[bool | None] = []
        styles: list[str | None] = []
        cells: list[list[str | None]] = [[] for _ in range(self.ncols)]
        pids = batch["payload_id"].to_pylist()
        payloads = batch["payload"].to_pylist()
        for pid, payload in zip(pids, payloads):
            try:
                fmt, t = self._open(payload)
                # container formats (workbook) carry _-prefixed metadata
                # columns; payload width = the c* cell columns only
                width = sum(1 for c in t.column_names if c.startswith("c"))
                if width != self.ncols:
                    raise self._unknown(f"width {width} != {self.ncols}")
            except self._unknown:
                ids.append(pid)
                fmts.append(DEADLETTER)
                row_idx.append(None)
                payload_keep.append(payload)
                tnames.append(None)
                hiddens.append(None)
                styles.append(None)
                for c in range(self.ncols):
                    cells[c].append(None)
                continue
            n = t.num_rows
            ids.extend([pid] * n)
            fmts.extend([fmt] * n)
            row_idx.extend(t["row_idx"].to_pylist())
            payload_keep.extend([None] * n)
            tnames.extend(
                t["_table"].to_pylist() if "_table" in t.column_names else [None] * n
            )
            hiddens.extend(
                t["_hidden"].to_pylist() if "_hidden" in t.column_names else [None] * n
            )
            styles.extend(
                t["_styles"].to_pylist() if "_styles" in t.column_names else [None] * n
            )
            for c in range(self.ncols):
                cells[c].extend(t[f"c{c}"].to_pylist())
        data = {
            "payload_id": pa.array(ids),
            "format": pa.array(fmts, pa.string()),
            "row_idx": pa.array(row_idx, pa.int32()),
            "payload": pa.array(payload_keep, pa.string()),
            "table_name": pa.array(tnames, pa.string()),
            "hidden": pa.array(hiddens, pa.bool_()),
            "styles": pa.array(styles, pa.string()),
        }
        for c in range(self.ncols):
            data[f"c{c}"] = pa.array(cells[c], pa.string())
        return pa.table(data)
