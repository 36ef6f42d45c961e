"""TSV / CSV payload decoders with the reference's acceptance heuristic.

Mirrors ``simple/tsv.go`` and ``simple/csv.go``: read all rows, build a
column-count histogram, accept iff >80% of rows share one column count and
that count is >1 (/root/reference/simple/tsv.go:41-54, csv.go:49-63; ragged
rows are allowed up to that 20% budget, kept at their own length and padded
blank on render — blank ≡ empty string, SURVEY.md §1.2).

Output: a ``pyarrow.Table`` of string columns ``c0..c{n-1}`` (n = dominant
column count), rows padded/truncated to n, plus the original row index.
"""

from __future__ import annotations

import csv as _csv
import io
from collections import Counter

import pyarrow as pa

from .registry import NotInFormat

MIN_ACCEPT_FRAC = 0.8


def _is_blank(r: list[str]) -> bool:
    return not r or (len(r) == 1 and r[0] == "")


def _to_table(rows: list[list[str]]) -> pa.Table:
    counts = Counter(len(r) for r in rows if not _is_blank(r))
    if not counts:
        raise NotInFormat("no rows")
    ncols, freq = counts.most_common(1)[0]
    nonempty = sum(counts.values())
    if ncols <= 1 or freq / nonempty <= MIN_ACCEPT_FRAC:
        raise NotInFormat(
            f"dominant column count {ncols} covers {freq}/{nonempty} rows"
        )
    cols: list[list[str]] = [[] for _ in range(ncols)]
    row_idx: list[int] = []
    for i, r in enumerate(rows):
        if _is_blank(r):
            continue  # blank-row skip (≅ grate2tsv main.go:231-259)
        row_idx.append(i)
        for c in range(ncols):
            cols[c].append(r[c] if c < len(r) else "")
    data = {"row_idx": pa.array(row_idx, pa.int32())}
    for c in range(ncols):
        data[f"c{c}"] = pa.array(cols[c], pa.string())
    return pa.table(data)


def decode_tsv(payload: str) -> pa.Table:
    lines = payload.split("\n")
    if lines and lines[-1] == "":
        lines.pop()
    if not lines:
        raise NotInFormat("empty payload")
    rows = [ln.rstrip("\r").split("\t") for ln in lines]
    # a TSV payload must actually contain tabs (the reference's heuristic
    # rejects count==1, which covers this)
    return _to_table(rows)


def decode_jsonl(payload: str) -> pa.Table:
    """JSON-lines decoder (registry priority 5 — sniffed before tsv/csv,
    like xlsx=5 outranks the plaintext formats in the reference registry,
    /root/reference/grate.go:83-92). Accepts iff >80% of non-blank lines
    parse as JSON objects; rows are rendered to the same string-cell grid
    as the other decoders (keys sorted → column order stable)."""
    import json

    lines = [ln for ln in payload.split("\n") if ln.strip()]
    if not lines:
        raise NotInFormat("empty payload")
    parsed = []
    ok = 0
    for ln in lines:
        try:
            obj = json.loads(ln)
            if isinstance(obj, dict) and obj:
                parsed.append(obj)
                ok += 1
                continue
        except json.JSONDecodeError:
            pass
        parsed.append(None)
    if ok / len(lines) <= MIN_ACCEPT_FRAC:
        raise NotInFormat(f"{ok}/{len(lines)} json lines")
    keys = sorted({k for o in parsed if o for k in o})
    if len(keys) <= 1:
        raise NotInFormat("needs >1 column")
    rows = [
        ["" if o.get(k) is None else str(o.get(k)) for k in keys] if o else [""]
        for o in parsed
    ]
    return _to_table(rows)


def decode_csv(payload: str) -> pa.Table:
    try:
        rows = list(_csv.reader(io.StringIO(payload)))
    except _csv.Error as e:  # parse error → not this format (csv.go:36-45)
        raise NotInFormat(str(e)) from e
    return _to_table(rows)


def decode_fixedwidth(payload: str) -> pa.Table:
    """Fixed-width columnar text decoder (registry priority 12 — after
    tsv, before csv): the classic space-aligned report/mainframe-dump
    layout. Sniff-by-parse: the payload must contain NO tabs, and >80%
    of non-blank lines must split on runs of ≥2 spaces into the SAME
    column count ≥ 2 (the same acceptance fraction as the tsv/csv
    heuristics, /root/reference/simple/simple.go's 80% rule). Cells are
    the stripped segments; rows that split differently become
    single-cell rows (the shared lenient-grid convention)."""
    import re

    if "\t" in payload:
        raise NotInFormat("tabs present: not fixed-width")
    lines = [ln.rstrip() for ln in payload.split("\n")]
    if lines and lines[-1] == "":
        lines.pop()
    lines = [ln for ln in lines if ln.strip()]
    if not lines:
        raise NotInFormat("empty payload")
    splitter = re.compile(r" {2,}")
    split = [splitter.split(ln) for ln in lines]
    counts = [len(s) for s in split]
    from collections import Counter

    (mode, n_mode), = Counter(counts).most_common(1)
    if mode < 2:
        raise NotInFormat("needs >=2 fixed-width columns")
    if n_mode / len(lines) <= MIN_ACCEPT_FRAC:
        raise NotInFormat(f"{n_mode}/{len(lines)} lines at width {mode}")
    rows = [s if len(s) == mode else [lines[i]] for i, s in enumerate(split)]
    return _to_table(rows)
