"""CFB container ingest pipelines — S8 (+ S10 when encrypted).

The reference's .xls path layered: CFB container parse → (optional RC4
FilePass decryption) → named per-sheet payload streams → format-sniffed
decode (/root/reference/xls/xls.go:83-226: ``openDoc`` pulls the
``Workbook`` stream out of ``cfb.Document``, checks for a ``FilePass``
record, and re-parses through the RC4 overlay).

Ray-Data-first recast: containers are binary files on disk;
``ray.data.read_binary_files`` streams them, ``CFBExtractor`` (an
actor-pool ``map_batches`` stage) parses each container ONCE, verifies
the password against the FilePass stream when present (S10), decrypts
stream payloads, and re-frames every stream as a ``#table``-headed book
payload — so the rest of the ingest is the EXISTING registry-sniffed
decode stage (``stages/decode.py``) and typed ``Scan``
(``pipelines/extract.py``). The container never crosses a stage
boundary unparsed twice.

Scale notes: one container = one ingest unit; extraction is
embarrassingly parallel over containers (no shuffle); key material is
derived once per (password, salt) and cached per actor (ST1). Containers
are small-batched (``batch_size=4``) because each row is a whole file.
"""

from __future__ import annotations

import os

import numpy as np

import pyarrow as pa

import ray
import ray.data

FILEPASS = "FilePass"


class CFBExtractor:
    """map_batches callable → actor pool. Input: ``read_binary_files``
    batches (``bytes``, ``path``). Output: one row per stream —
    ``payload_id`` (container stem), ``payload`` (book-framed text).

    Encrypted containers (a ``FilePass`` stream present) are verified
    and decrypted inline; a wrong password dead-letters the whole
    container (``format='deadletter'`` downstream) rather than crashing
    the stage — the engine's hardening of the reference's fail-fast
    (/root/reference/xls/xls.go:210-226).
    """

    def __init__(self, password: str | None = None):
        from ..sources import cfb, crypto

        self._cfb = cfb
        self._crypto = crypto
        self._password = password or crypto.DEFAULT_PASSWORD
        self._keys: dict[bytes, bytes] = {}  # salt -> Hfinal (per-actor cache)

    def _hfinal(self, filepass: bytes) -> bytes:
        fp = self._crypto.BasicRC4(filepass)
        key = self._keys.get(fp.salt)
        if key is None:
            key = fp.verify(self._password)
            self._keys[fp.salt] = key
        return key

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..sources.workbook import HEADER

        ids: list[str] = []
        payloads: list[str] = []
        for blob, path in zip(
            batch["bytes"].to_pylist(), batch["path"].to_pylist()
        ):
            stem = os.path.splitext(os.path.basename(path))[0]
            try:
                doc = self._cfb.parse(blob)
                names = [n for n, _ in doc.list_streams() if n != FILEPASS]
                key = None
                if FILEPASS in dict(doc.list_streams()):
                    key = self._hfinal(doc.read_stream(FILEPASS))
                for name in names:
                    data = doc.read_stream(name)
                    if key is not None:
                        data = self._crypto.crypt_stream(key, data)
                    text = data.decode("utf-8")
                    ids.append(stem)
                    payloads.append(f"{HEADER}{name}\n{text}")
            except (
                self._cfb.NotCFB,
                self._cfb.CorruptCFB,
                self._crypto.BadFilePass,
                self._crypto.VerifyFailed,
                UnicodeDecodeError,
            ) as e:
                # emit an un-sniffable payload: the decode stage
                # dead-letters it with the raw reason attached
                ids.append(stem)
                payloads.append(f"\x00cfb-error: {e}")
        return pa.table(
            {
                "payload_id": pa.array(ids, pa.string()),
                "payload": pa.array(payloads, pa.string()),
            }
        )


def synthesize_container_dir(
    sf_dir: str,
    table: str,
    cols: list[str],
    key_col: str,
    name_col: str,
    group_mod: int = 8,
    encrypt: bool = False,
    password: str | None = None,
    version: int = 3,
) -> str:
    """Deterministically pack a testdata table into ``group_mod`` CFB
    containers under /tmp scratch (crash-safe staging + ``_OK`` marker,
    same contract as the ingest binlog cache): one container per
    ``key % group_mod``, one TSV stream per distinct ``name_col`` value
    inside it. ``encrypt=True`` adds a FilePass stream and RC4-encrypts
    every payload stream (S10). Idempotent across driver calls."""
    from ..context import configure_shuffle as _cfg
    _cfg(32)  # BEFORE dataset creation: plans freeze the DataContext
    import hashlib
    import shutil
    import uuid

    import pandas as pd

    from ..sources.cfb import write_cfb
    from ..sources.crypto import DEFAULT_PASSWORD, crypt_stream, make_filepass

    pw = password or DEFAULT_PASSWORD
    tag = hashlib.md5(
        f"{sf_dir}|{table}|{','.join(cols)}|{key_col}|{name_col}|"
        f"{group_mod}|{encrypt}|{pw}|cfbv{version}|v1".encode()
    ).hexdigest()[:8]
    out_dir = f"/tmp/graft_q/cfb_{table}_{tag}"
    if os.path.exists(os.path.join(out_dir, "_OK")):
        return out_dir
    shutil.rmtree(out_dir, ignore_errors=True)
    staging = f"{out_dir}.tmp-{uuid.uuid4().hex[:8]}"
    os.makedirs(staging, exist_ok=True)

    filepass = make_filepass(pw) if encrypt else None
    hfinal = None
    if encrypt:
        from ..sources.crypto import BasicRC4

        hfinal = BasicRC4(filepass).verify(pw)

    def build(t: pa.Table) -> pa.Table:
        from .extract import join_lines

        t = t.sort_by(key_col)
        grp = int(t["grp"][0].as_py())
        lines = join_lines(t, cols)
        nm = t[name_col].to_numpy(zero_copy_only=False).astype("U")
        streams: dict[str, bytes] = {}
        for name in sorted(np.unique(nm).tolist()):
            idx = np.flatnonzero(nm == name)
            data = "\n".join(lines[idx].tolist()).encode("utf-8")
            if hfinal is not None:
                data = crypt_stream(hfinal, data)
            streams[name] = data
        if filepass is not None:
            streams[FILEPASS] = filepass
        blob = write_cfb(streams, version=version)
        path = os.path.join(staging, f"c{grp:04d}.cfb")
        with open(path, "wb") as f:
            f.write(blob)
        return pa.table(
            {
                "grp": pa.array([grp], pa.int64()),
                "bytes": pa.array([len(blob)], pa.int64()),
            }
        )

    from .extract import _add_grp_arrow

    (
        ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=cols)
        .map_batches(
            _add_grp_arrow(cols, key_col, group_mod), batch_format="pyarrow"
        )
        .groupby("grp")
        .map_groups(build, batch_format="pyarrow")
        .materialize()
    )
    open(os.path.join(staging, "_OK"), "w").write("ok")
    try:
        os.rename(staging, out_dir)
    except OSError:
        # concurrent synthesizer won the rename — theirs is identical
        # (deterministic content); keep it and drop our staging
        if not os.path.exists(os.path.join(out_dir, "_OK")):
            raise
        shutil.rmtree(staging, ignore_errors=True)
    return out_dir


def read_containers(
    container_dir: str, ncols: int, password: str | None = None
) -> ray.data.Dataset:
    """Container dir → decoded cell grid: binary read → CFBExtractor
    actor pool → registry-sniffed decode (the extracted book payloads
    carry stream names through as ``table_name``)."""
    from .extract import decode_payloads

    ds = ray.data.read_binary_files(
        container_dir, file_extensions=["cfb"], include_paths=True
    )
    extracted = ds.map_batches(
        CFBExtractor,
        fn_constructor_kwargs={"password": password},
        batch_format="pyarrow",
        batch_size=4,  # rows are whole containers
        concurrency=(1, 8),
    )
    return decode_payloads(extracted, ncols=ncols)


def cfb_roundtrip(
    sf_dir: str,
    encrypt: bool = False,
    password: str | None = None,
    version: int = 3,
) -> ray.data.Dataset:
    """Full-table round trip through CFB containers: customer packed into
    8 containers (one stream per market segment), extracted, decoded and
    typed-scanned back — the oracle is the original table. With
    ``encrypt=True`` every stream additionally passes through the S10
    RC4 path (FilePass verify + per-stream block-counter decrypt)."""
    from .extract import scan_typed

    cols = ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]
    d = synthesize_container_dir(
        sf_dir, "customer", cols, key_col="c_custkey",
        name_col="c_mktsegment", group_mod=8, encrypt=encrypt,
        password=password, version=version,
    )
    decoded = read_containers(d, ncols=len(cols), password=password)
    return scan_typed(
        decoded, cols,
        [pa.int64(), pa.string(), pa.int32(), pa.float64(), pa.string()],
    )


def rc4_orders_roundtrip(sf_dir: str) -> ray.data.Dataset:
    """S10 driver pipeline: orders packed into ENCRYPTED containers (one
    RC4 stream per order status + FilePass, default VelvetSweatshop
    password), then verified, decrypted, decoded and typed-scanned back.
    Orders streams run ~19 KB at sf0.01, so this exercises the ≥4096-byte
    regular-FAT chain, where the customer round trip covers the
    mini-stream path."""
    from .extract import scan_typed

    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"]
    d = synthesize_container_dir(
        sf_dir, "orders", cols, key_col="o_orderkey",
        name_col="o_orderstatus", group_mod=8, encrypt=True,
    )
    decoded = read_containers(d, ncols=len(cols))
    return scan_typed(
        decoded, cols, [pa.int64(), pa.int64(), pa.string(), pa.float64()]
    )
