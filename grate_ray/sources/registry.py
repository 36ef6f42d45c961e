"""Priority-ordered format registry + sniff-by-parse open.

The analogue of the reference's pluggable-source surface:
``grate.Register(name, priority, opener)`` (/root/reference/grate.go:83-92)
and ``grate.Open``'s try-each-opener-until-not-ErrNotInFormat loop
(/root/reference/grate.go:58-72, sentinel errors errs.go:19-22).

Decoders take a raw payload string (one framed batch of rows — the CDC
recast of "one dropped file") and either return a ``pyarrow.Table`` of
string columns or raise ``NotInFormat``. ``open_payload`` tries decoders in
priority order; if none accepts, raises ``UnknownFormat`` — callers route
those payloads to a dead-letter output instead of crashing (the engine's
hardening of the reference's per-file error-and-skip,
/root/reference/cmd/grater/main.go:26-30).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

import pyarrow as pa


class NotInFormat(Exception):
    """Decoder sniffed the payload and declined (≅ grate.ErrNotInFormat)."""


class UnknownFormat(Exception):
    """No registered decoder accepted the payload (≅ grate.ErrUnknownFormat)."""


@dataclass(order=True)
class _Entry:
    priority: int
    name: str = field(compare=False)
    decode: Callable[[str], pa.Table] = field(compare=False)


_REGISTRY: list[_Entry] = []


def register(name: str, priority: int, decode: Callable[[str], pa.Table]) -> None:
    """Register a decoder; lower priority is tried first (xls=1 … csv=15 in
    the reference). Re-registration under the same name replaces."""
    global _REGISTRY
    _REGISTRY = [e for e in _REGISTRY if e.name != name]
    _REGISTRY.append(_Entry(priority, name, decode))
    _REGISTRY.sort()


def registered() -> list[str]:
    return [e.name for e in _REGISTRY]


def open_payload(payload: str) -> tuple[str, pa.Table]:
    """Try each registered decoder by priority; first acceptance wins."""
    for e in _REGISTRY:
        try:
            return e.name, e.decode(payload)
        except NotInFormat:
            continue
    raise UnknownFormat(f"no registered format accepted payload ({len(payload)} chars)")


def _install_builtins() -> None:
    from .textual import decode_csv, decode_fixedwidth, decode_jsonl, decode_tsv

    if "jsonl" not in registered():
        register("jsonl", 5, decode_jsonl)
    if "tsv" not in registered():
        register("tsv", 10, decode_tsv)
    if "fixedw" not in registered():
        register("fixedw", 12, decode_fixedwidth)
    if "csv" not in registered():
        register("csv", 15, decode_csv)
    from . import workbook  # noqa: F401  (self-registers "book" @ 3)
    from . import sst  # noqa: F401  (self-registers "sst_book" @ 2)


_install_builtins()
