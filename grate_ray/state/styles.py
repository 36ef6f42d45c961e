"""Styles/numFmt sidecar (S7) — per-ingest-unit style state.

The reference's ``parseStyles`` (/root/reference/xlsx/workbook.go:104-182)
builds two pieces of per-workbook state while opening a source:

1. custom ``numFmt`` registrations → ``Formatter.Add(id, code)``
   (ids ≥ 0xA4; built-ins can't be replaced,
   /root/reference/commonxl/formats.go:32-52);
2. the two-level ``cellStyleXfs`` → ``cellXfs`` inheritance resolution:
   each base xf contributes a number-format id ("0" when
   ``applyNumberFormat="0"``); each cell xf starts from its base's id
   (via ``xfId``) and overrides with its own ``numFmtId`` unless apply
   is off — the result is the ``xfs []uint16`` table mapping a cell's
   style index → its effective format id (workbook.go:131-158).

CDC recast: a book payload may carry a ``#styles`` sidecar section::

    #styles
    numfmt 164 #,##0.00
    stylexf <numFmtId> <apply01>
    cellxf <numFmtId> <apply01> <xfId>

``parse_styles`` resolves it with exactly the reference's inheritance
rules; the parsed ``StylesSidecar`` is ST1-state — built once per ingest
unit, then ``format_ids`` / ``format_codes`` / ``render_styled`` apply
it to whole cell columns vectorized (one ``render_column`` call per
DISTINCT style in the batch, never per row).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.numfmt import BUILTIN_FORMATS, Formatter, render_column

GENERAL_ID = 0


class StylesSidecar:
    """Resolved per-unit style state: the Formatter (built-ins + customs)
    and the style-index → format-id table."""

    def __init__(self, formatter: Formatter, codes: dict[int, str], xfs: list[int]):
        self.formatter = formatter
        self._codes = codes  # format id -> code string (builtins + customs)
        self.xfs = np.asarray(xfs, dtype=np.int64)

    def code_of(self, fmt_id: int) -> str:
        return self._codes.get(fmt_id, "General")


def parse_styles(lines: list[str]) -> StylesSidecar:
    """Mirror of parseStyles' section machine (workbook.go:104-182):
    ``numfmt`` registers customs, ``stylexf`` rows accumulate the base
    number formats, ``cellxf`` rows resolve inheritance into ``xfs``."""
    formatter = Formatter()
    codes = dict(BUILTIN_FORMATS)
    base_numfmts: list[str] = []
    xfs: list[int] = []
    for raw in lines:
        parts = raw.strip().split(None, 2)
        if not parts:
            continue
        kind = parts[0]
        if kind == "numfmt":
            fmt_id = int(parts[1])
            code = parts[2]
            formatter.add(fmt_id, code)
            codes[fmt_id] = code
        elif kind == "stylexf":
            numfmt_id, apply_ = parts[1], parts[2].split()[0]
            # base styles keep only the number format (workbook.go:132-138)
            base_numfmts.append("0" if apply_ == "0" else numfmt_id)
        elif kind == "cellxf":
            numfmt_id, rest = parts[1], parts[2].split()
            apply_, xf_id = rest[0], int(rest[1])
            # the reference looks up the base style's format via xfId
            # (workbook.go:141-147) and then unconditionally overwrites
            # it in BOTH branches of the apply switch (:149-156) — cell
            # xfs with apply off strip to General, all others use their
            # own numFmtId. Mirror the observable result; the xfId
            # bounds check is still enforced for sidecar validity.
            if xf_id < 0 or (base_numfmts and xf_id >= len(base_numfmts)):
                raise ValueError(f"cellxf xfId {xf_id} out of range")
            resolved = "0" if apply_ == "0" else numfmt_id
            xfs.append(int(resolved))
        else:
            raise ValueError(f"unknown styles sidecar row: {raw!r}")
    return StylesSidecar(formatter, codes, xfs)


def _check_idx(sidecar: StylesSidecar, style_idx: pa.Array | pa.ChunkedArray):
    idx = np.asarray(
        style_idx.combine_chunks()
        if isinstance(style_idx, pa.ChunkedArray)
        else style_idx
    )
    if len(idx) and (idx.min() < 0 or idx.max() >= len(sidecar.xfs)):
        raise IndexError(
            f"style index out of range 0..{len(sidecar.xfs) - 1}"
        )
    return idx


def format_ids(sidecar: StylesSidecar, style_idx) -> pa.Array:
    """Vectorized style-index → effective format id (the xfs table)."""
    return pa.array(sidecar.xfs[_check_idx(sidecar, style_idx)], pa.int32())


def format_codes(sidecar: StylesSidecar, style_idx) -> pa.Array:
    """Vectorized style-index → effective format-code string."""
    fmt_ids = sidecar.xfs[_check_idx(sidecar, style_idx)]
    uniq, inv = np.unique(fmt_ids, return_inverse=True)
    table = np.asarray([sidecar.code_of(int(u)) for u in uniq], dtype=object)
    return pa.array(table[inv], pa.string())


def render_styled(
    sidecar: StylesSidecar, values: pa.Array | pa.ChunkedArray, style_idx
) -> pa.Array:
    """Render a numeric column through each cell's STYLE: one vectorized
    ``render_column`` per distinct effective format in the batch,
    scattered back in place (never a per-row format lookup)."""
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    fmt_ids = sidecar.xfs[_check_idx(sidecar, style_idx)]
    out = np.empty(len(values), dtype=object)
    for fid in np.unique(fmt_ids):
        mask = fmt_ids == fid
        sub = values.take(pa.array(np.flatnonzero(mask), pa.int64()))
        out[mask] = render_column(sub, sidecar.code_of(int(fid))).to_numpy(
            zero_copy_only=False
        )
    return pa.array(out, pa.string())
