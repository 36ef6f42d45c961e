"""MS Compound File Binary (CFB/OLE2) container source — S8.

A real, spec-correct CFB v3 reader and writer (MS-CFB), the container
format the reference parses to reach the xls Workbook stream
(/root/reference/xls/cfb/cfb.go:107-363): header asserts (cfb.go:113-158),
DIFAT chain + FAT (cfb.go:166-212), miniFAT (cfb.go:215-234), directory
entries (cfb.go:242-281) and sector-chain stream readers — regular
(getStreamReader, cfb.go:283-314) and mini-stream (getMiniStreamReader,
cfb.go:316-363).

Differences from the reference, on purpose:

- ``parse`` walks the FULL directory chain through the FAT (the
  reference's ``buildDirs`` reads only the first sector's 4 entries —
  enough for .xls, not for general containers).
- Streams come back as ``bytes`` assembled from sector slices of one
  ``memoryview`` over the container (the analogue of the reference's
  zero-copy ``SliceReader`` slice-of-slices, cfb/slicereader.go:10-101).
- A deterministic writer exists so the engine can synthesize containers
  for tests/fixtures (the reference only reads).

In the CDC engine a CFB container is one *ingest unit* holding many named
framed payloads (streams); the extraction stage in
``pipelines/container.py`` decodes each blob inside ``map_batches`` —
the container never crosses the wire unparsed more than once.
"""

from __future__ import annotations

import struct

SIGNATURE = 0xE11AB1A1E011CFD0  # D0 CF 11 E0 A1 B1 1A E1 little-endian
SECTOR_SHIFT = 9  # v3: 512-byte sectors
MINI_SHIFT = 6  # 64-byte mini sectors
SECTOR = 1 << SECTOR_SHIFT
MINI_SECTOR = 1 << MINI_SHIFT
MINI_CUTOFF = 0x1000  # streams < 4096 bytes live in the mini stream

FREESECT = 0xFFFFFFFF
ENDOFCHAIN = 0xFFFFFFFE
FATSECT = 0xFFFFFFFD
DIFSECT = 0xFFFFFFFC
NOSTREAM = 0xFFFFFFFF

TYPE_UNKNOWN, TYPE_STORAGE, TYPE_STREAM, TYPE_ROOT = 0x00, 0x01, 0x02, 0x05

_FAT_PER_SECTOR = SECTOR // 4  # 128
_DIR_ENTRY = 128  # bytes per directory entry

# header layout mirrors the reference's `header` struct field for field
# (/root/reference/xls/cfb/cfb.go:33-52)
_HEADER = struct.Struct(
    "<Q16s HHHHH 6s iiIiiIiIi"
)  # + 109 DIFAT slots appended separately


class NotCFB(Exception):
    """Payload is not a CFB container (≅ grate.ErrNotInFormat)."""


class CorruptCFB(Exception):
    """Signature matched but the structure is invalid."""


def _le32s(buf: memoryview) -> list[int]:
    return list(struct.unpack(f"<{len(buf) // 4}I", buf))


class CFBDocument:
    """Parsed compound file: header-validated, FAT/miniFAT/directory
    loaded once; streams extracted on demand by name."""

    def __init__(self, data: bytes):
        self._data = memoryview(data)
        self._fat: list[int] = []
        self._minifat: list[int] = []
        # name -> (start_sector, size)
        self._streams: dict[str, tuple[int, int]] = {}
        self._mini_start = ENDOFCHAIN
        self._mini_size = 0
        self._load()

    # -- parsing ---------------------------------------------------------

    def _load(self) -> None:
        d = self._data
        if len(d) < SECTOR:
            raise NotCFB("too short")
        (
            sig, clsid, minor, major, border, sshift, mshift, resv1,
            ndirsect, nfat, firstdir, txsig, minicut, firstminifat,
            nminifat, firstdifat, ndifat,
        ) = _HEADER.unpack(d[: _HEADER.size])
        if sig != SIGNATURE:
            raise NotCFB("bad signature")
        if border != 0xFFFE:
            raise NotCFB("bad byte-order mark")
        # full assertions, as the reference sets fullAssertions=true
        # (/root/reference/xls/cfb/cfb.go:120-157)
        if clsid != b"\x00" * 16:
            raise CorruptCFB("non-zero CLSID")
        if major not in (3, 4):
            raise CorruptCFB(f"unknown major version {major}")
        if major == 3 and sshift != 9:
            raise CorruptCFB("invalid sector size for v3")
        if major == 4 and sshift != 12:
            raise CorruptCFB("invalid sector size for v4")
        if major == 3 and ndirsect != 0:
            raise CorruptCFB("v3 does not support directory sector count")
        if mshift != 6:
            raise CorruptCFB("invalid mini sector size")
        if minicut != MINI_CUTOFF:
            raise CorruptCFB("invalid mini stream cutoff")
        self._shift = sshift
        self._ssize = 1 << sshift
        per = self._ssize // 4

        def sector(sid: int) -> memoryview:
            offs = (1 + sid) << self._shift
            if offs + self._ssize > len(d):
                raise CorruptCFB(f"sector {sid} beyond EOF")
            return d[offs : offs + self._ssize]

        self._sector = sector

        # step 1: DIFAT — 109 header slots, then chained DIFAT sectors
        # (cfb.go:166-212)
        difat_slots = _le32s(d[_HEADER.size : _HEADER.size + 109 * 4])
        fat_sids = [s for s in difat_slots if s != FREESECT]
        sid = firstdifat
        seen = 0
        while sid != ENDOFCHAIN and sid != FREESECT:
            sec = _le32s(sector(sid))
            for s in sec[: per - 1]:
                if s not in (FREESECT, ENDOFCHAIN):
                    fat_sids.append(s)
            sid = sec[per - 1]  # last slot chains the next DIFAT sector
            seen += 1
            if seen > max(ndifat, 0) + 1:
                raise CorruptCFB("DIFAT chain loop")
        for fsid in fat_sids:
            self._fat.extend(_le32s(sector(fsid)))

        # step 2: miniFAT chain (cfb.go:215-234)
        sid = firstminifat
        while sid != ENDOFCHAIN and sid != FREESECT:
            self._minifat.extend(_le32s(sector(sid)))
            sid = self._fat[sid]

        # step 3: directory — walk the WHOLE chain via the FAT
        # (generalizes the reference's first-4-entries buildDirs,
        # cfb.go:242-281)
        sid = firstdir
        while sid != ENDOFCHAIN and sid != FREESECT:
            sec = sector(sid)
            for j in range(self._ssize // _DIR_ENTRY):
                self._read_dirent(sec[j * _DIR_ENTRY : (j + 1) * _DIR_ENTRY])
            sid = self._fat[sid]

    def _read_dirent(self, e: memoryview) -> None:
        name_bytes = bytes(e[:64])
        (nlen,) = struct.unpack("<h", e[64:66])
        otype = e[66]
        if otype == TYPE_UNKNOWN:
            return
        if nlen < 2 or nlen > 64 or (nlen & 1):
            raise CorruptCFB("invalid directory name length")
        name = name_bytes[: nlen - 2].decode("utf-16-le")
        (start,) = struct.unpack("<i", e[116:120])
        (size,) = struct.unpack("<Q", e[120:128])
        if self._shift == 9:
            size &= 0xFFFFFFFF  # v3 masks the upper half (cfb.go:253-256)
        if otype == TYPE_ROOT:
            self._mini_start = start & 0xFFFFFFFF
            self._mini_size = size
        elif otype == TYPE_STREAM:
            self._streams[name] = (start & 0xFFFFFFFF, size)
        # TYPE_STORAGE: named directory, no payload — nothing to record

    # -- stream access ---------------------------------------------------

    def list_streams(self) -> list[tuple[str, int]]:
        """(name, size) of every stream, name-sorted (≅ Document.ListDir)."""
        return sorted((n, sz) for n, (_, sz) in self._streams.items())

    def read_stream(self, name: str) -> bytes:
        """Stream payload by name, via the FAT chain (≥4096 bytes) or the
        mini-stream chain (<4096), as cfb.go:283-363."""
        if name not in self._streams:
            raise KeyError(name)
        sid, size = self._streams[name]
        if size == 0:
            return b""
        if size < MINI_CUTOFF:
            return self._read_mini(sid, size)
        return self._read_regular(sid, size)

    def _read_regular(self, sid: int, size: int) -> bytes:
        parts: list[memoryview] = []
        left = size
        while sid not in (ENDOFCHAIN, FREESECT) and left > 0:
            sec = self._sector(sid)
            take = min(left, len(sec))
            parts.append(sec[:take])
            left -= take
            sid = self._fat[sid]
        if left:
            raise CorruptCFB("incomplete stream read")
        return b"".join(parts)

    def _read_mini(self, sid: int, size: int) -> bytes:
        # materialize the mini-stream container once (the reference
        # recomputes per call and TODOs a cache, cfb.go:317 — we cache)
        if not hasattr(self, "_ministream"):
            self._ministream = self._read_regular(
                self._mini_start, self._mini_size
            )
        ms = memoryview(self._ministream)
        parts: list[memoryview] = []
        left = size
        while sid not in (ENDOFCHAIN, FREESECT) and left > 0:
            offs = sid << MINI_SHIFT
            take = min(left, MINI_SECTOR)
            parts.append(ms[offs : offs + take])
            left -= take
            sid = self._minifat[sid]
        if left:
            raise CorruptCFB("incomplete mini-stream read")
        return b"".join(parts)


def parse(data: bytes) -> CFBDocument:
    """Sniff-by-parse entry: raises NotCFB fast on foreign payloads."""
    return CFBDocument(data)


# -- writer (fixtures / round-trip tests; the reference only reads) ------


def _pad_sector(b: bytes, ssize: int = SECTOR) -> bytes:
    return b + b"\x00" * (-len(b) % ssize)


def _dirent(
    name: str,
    otype: int,
    start: int,
    size: int,
    left: int = NOSTREAM,
    right: int = NOSTREAM,
    child: int = NOSTREAM,
) -> bytes:
    nb = name.encode("utf-16-le") + b"\x00\x00"
    if len(nb) > 64:
        raise ValueError(f"stream name too long: {name!r}")
    return (
        nb.ljust(64, b"\x00")
        + struct.pack("<hBB", len(nb), otype, 1)  # color: black
        + struct.pack("<III", left, right, child)
        + b"\x00" * 16  # CLSID
        + b"\x00" * 4  # state bits
        + b"\x00" * 16  # creation/modified times: zero for determinism
        + struct.pack("<IQ", start & 0xFFFFFFFF, size)
    )


def write_cfb(streams: dict[str, bytes], version: int = 3) -> bytes:
    """Serialize named streams into a valid CFB v3 or v4 container.

    Deterministic for a given input dict (names are sorted): streams
    < 4096 bytes go to the mini stream (64-byte mini sectors), larger
    ones get regular FAT chains (512-byte sectors for v3, 4096-byte for
    v4 — MajorVersion-switched shift like the reference reader,
    /root/reference/xls/cfb/cfb.go:125-158). Sector layout:
    [FAT][DIFAT?][directory][miniFAT][mini stream][big streams].
    v4 headers carry the directory-sector count and pad the 512-byte
    header block out to one full 4096-byte sector.
    """
    if version not in (3, 4):
        raise ValueError(f"unsupported CFB version {version}")
    shift = SECTOR_SHIFT if version == 3 else 12
    ssize = 1 << shift
    fat_per = ssize // 4
    names = sorted(streams)
    if not names:
        raise ValueError("empty container")

    # -- partition into mini / regular and build payload areas
    mini_names = [n for n in names if len(streams[n]) < MINI_CUTOFF]
    big_names = [n for n in names if len(streams[n]) >= MINI_CUTOFF]

    mini_blob = bytearray()
    minifat: list[int] = []
    mini_start_of: dict[str, int] = {}
    for n in mini_names:
        b = streams[n]
        if not b:
            mini_start_of[n] = ENDOFCHAIN
            continue
        nsec = -(-len(b) // MINI_SECTOR)
        first = len(minifat)
        mini_start_of[n] = first
        minifat.extend(range(first + 1, first + nsec))
        minifat.append(ENDOFCHAIN)
        mini_blob += b + b"\x00" * (-len(b) % MINI_SECTOR)

    n_mini_sectors = -(-len(mini_blob) // ssize) if mini_blob else 0
    n_minifat_sectors = -(-len(minifat) // fat_per) if minifat else 0
    big_sectors_of = {n: -(-len(streams[n]) // ssize) for n in big_names}

    # directory: root + one entry per stream, right-sibling chain off
    # the root's child (valid single-path red-black tree, all black)
    n_dirents = 1 + len(names)
    n_dir_sectors = -(-n_dirents // (ssize // _DIR_ENTRY))

    n_data = (
        n_dir_sectors + n_minifat_sectors + n_mini_sectors
        + sum(big_sectors_of.values())
    )

    # solve FAT/DIFAT sector counts to a fixed point (FAT covers itself,
    # DIFAT sectors hold FAT locations 110+)
    n_fat, n_difat = 1, 0
    while True:
        total = n_data + n_fat + n_difat
        need_fat = -(-total // fat_per)
        need_difat = 0 if need_fat <= 109 else -(-(need_fat - 109) // (fat_per - 1))
        if (need_fat, need_difat) == (n_fat, n_difat):
            break
        n_fat, n_difat = need_fat, need_difat

    # -- assign sector ids in layout order
    fat_sids = list(range(n_fat))
    difat_sids = list(range(n_fat, n_fat + n_difat))
    cursor = n_fat + n_difat
    dir_first = cursor
    cursor += n_dir_sectors
    minifat_first = cursor if n_minifat_sectors else ENDOFCHAIN
    cursor += n_minifat_sectors
    mini_first = cursor if n_mini_sectors else ENDOFCHAIN
    cursor += n_mini_sectors
    big_start_of: dict[str, int] = {}
    for n in big_names:
        big_start_of[n] = cursor
        cursor += big_sectors_of[n]
    total_sectors = cursor

    # -- FAT
    fat = [FREESECT] * (n_fat * fat_per)
    for s in fat_sids:
        fat[s] = FATSECT
    for s in difat_sids:
        fat[s] = DIFSECT

    def chain(first: int, count: int) -> None:
        for i in range(count - 1):
            fat[first + i] = first + i + 1
        if count:
            fat[first + count - 1] = ENDOFCHAIN

    chain(dir_first, n_dir_sectors)
    if n_minifat_sectors:
        chain(minifat_first, n_minifat_sectors)
    if n_mini_sectors:
        chain(mini_first, n_mini_sectors)
    for n in big_names:
        chain(big_start_of[n], big_sectors_of[n])

    # -- directory entries
    def start_of(n: str) -> int:
        if n in big_start_of:
            return big_start_of[n]
        s = mini_start_of[n]
        return s if s != ENDOFCHAIN else ENDOFCHAIN

    dirents = [
        _dirent(
            "Root Entry", TYPE_ROOT,
            mini_first if n_mini_sectors else ENDOFCHAIN,
            n_mini_sectors * ssize if n_mini_sectors else 0,
            child=1,
        )
    ]
    for i, n in enumerate(names):
        right = i + 2 if i + 1 < len(names) else NOSTREAM
        dirents.append(
            _dirent(n, TYPE_STREAM, start_of(n), len(streams[n]), right=right)
        )
    free = b"\x00" * 64 + struct.pack("<hBB", 0, TYPE_UNKNOWN, 0) + (
        struct.pack("<III", NOSTREAM, NOSTREAM, NOSTREAM)
        + b"\x00" * 36 + struct.pack("<IQ", 0, 0)
    )
    while len(dirents) % (ssize // _DIR_ENTRY):
        dirents.append(free)

    # -- header + DIFAT
    header = _HEADER.pack(
        SIGNATURE, b"\x00" * 16, 0x3E, version, 0xFFFE, shift, MINI_SHIFT,
        b"\x00" * 6, n_dir_sectors if version == 4 else 0, n_fat,
        dir_first, 0, MINI_CUTOFF, minifat_first, n_minifat_sectors,
        difat_sids[0] if difat_sids else ENDOFCHAIN, n_difat,
    )
    head_slots = fat_sids[:109] + [FREESECT] * (109 - min(len(fat_sids), 109))
    header += struct.pack("<109I", *head_slots)
    assert len(header) == SECTOR  # the header struct is 512 bytes in BOTH
    # versions; v4 zero-pads the rest of its 4096-byte first block
    header = header.ljust(ssize, b"\x00")

    out = bytearray(header)
    for fs in range(n_fat):
        out += struct.pack(
            f"<{fat_per}I",
            *fat[fs * fat_per : (fs + 1) * fat_per],
        )
    spill = fat_sids[109:]
    for ds in range(n_difat):
        slots = spill[ds * (fat_per - 1) : (ds + 1) * (fat_per - 1)]
        slots += [FREESECT] * (fat_per - 1 - len(slots))
        nxt = difat_sids[ds + 1] if ds + 1 < n_difat else ENDOFCHAIN
        out += struct.pack(f"<{fat_per}I", *slots, nxt)
    out += b"".join(dirents)
    if n_minifat_sectors:
        mf = minifat + [FREESECT] * (
            n_minifat_sectors * fat_per - len(minifat)
        )
        out += struct.pack(f"<{len(mf)}I", *mf)
    if n_mini_sectors:
        out += _pad_sector(bytes(mini_blob), ssize)
    for n in big_names:
        out += _pad_sector(streams[n], ssize)
    assert len(out) == (1 + total_sectors) * ssize
    return bytes(out)
