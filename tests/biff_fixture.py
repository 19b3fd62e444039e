"""Hand-rolled minimal BIFF8-in-CFB writer for exercising the stdlib
legacy .xls reader (panorama_elt_spark/sources/xls_biff.py) without any
Excel library. Layouts follow the public [MS-CFB]/[MS-XLS] specs; both
storage paths are covered: FAT (stream >= 4096 bytes) and miniFAT."""

from __future__ import annotations

import struct

FREESECT = 0xFFFFFFFF
ENDOFCHAIN = 0xFFFFFFFE
FATSECT = 0xFFFFFFFD


def _rec(rid: int, payload: bytes) -> bytes:
    return struct.pack("<HH", rid, len(payload)) + payload


def _bof(dt: int) -> bytes:
    return _rec(0x0809, struct.pack("<HHHHII", 0x0600, dt, 0x0DBB, 0x07CC, 0, 0))


def _sst(strings: list[str]) -> bytes:
    body = struct.pack("<II", len(strings), len(strings))
    for s in strings:
        body += struct.pack("<HB", len(s), 0) + s.encode("latin-1")
    return _rec(0x00FC, body)


def _boundsheet(pos: int, name: str) -> bytes:
    return _rec(
        0x0085,
        struct.pack("<IHBB", pos, 0, len(name), 0) + name.encode("latin-1"),
    )


def _sheet_substream(rows: list[list], sst: list[str]) -> bytes:
    out = _bof(0x0010)
    for r, row in enumerate(rows):
        for c, v in enumerate(row):
            if v is None:
                continue
            if isinstance(v, str):
                out += _rec(0x00FD, struct.pack("<HHHI", r, c, 0, sst.index(v)))
            elif isinstance(v, int):
                out += _rec(0x027E, struct.pack("<HHHI", r, c, 0, ((v << 2) | 2) & 0xFFFFFFFF))
            else:
                out += _rec(0x0203, struct.pack("<HHH", r, c, 0) + struct.pack("<d", float(v)))
    return out + _rec(0x000A, b"")


def workbook_stream(sheets: dict[str, list[list]]) -> bytes:
    strings: list[str] = []
    for rows in sheets.values():
        for row in rows:
            for v in row:
                if isinstance(v, str) and v not in strings:
                    strings.append(v)
    subs = {name: _sheet_substream(rows, strings) for name, rows in sheets.items()}
    # globals size is stable: boundsheet sizes don't depend on positions
    globals_parts = [_bof(0x0005), _sst(strings)]
    bs_stub = [_boundsheet(0, n) for n in subs]
    globals_len = sum(len(p) for p in globals_parts) + sum(len(b) for b in bs_stub) + 4
    out = b"".join(globals_parts)
    pos = globals_len
    for name, sub in subs.items():
        out += _boundsheet(pos, name)
        pos += len(sub)
    out += _rec(0x000A, b"")
    assert len(out) == globals_len
    for sub in subs.values():
        out += sub
    return out


def _dir_entry(name: str, otype: int, start: int, size: int) -> bytes:
    raw = name.encode("utf-16-le") + b"\x00\x00"
    e = bytearray(128)
    e[0 : len(raw)] = raw
    struct.pack_into("<H", e, 64, len(raw))
    e[66] = otype
    e[67] = 1  # black
    struct.pack_into("<i", e, 68, -1)
    struct.pack_into("<i", e, 72, -1)
    struct.pack_into("<i", e, 76, -1)
    struct.pack_into("<I", e, 116, start & 0xFFFFFFFF)
    struct.pack_into("<Q", e, 120, size)
    return bytes(e)


def _header(fat_sectors: list[int], dir_start: int, minifat_start: int, n_minifat: int) -> bytes:
    h = bytearray(512)
    h[0:8] = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
    struct.pack_into("<H", h, 24, 0x003E)  # minor
    struct.pack_into("<H", h, 26, 0x0003)  # major (v3, 512-byte sectors)
    struct.pack_into("<H", h, 28, 0xFFFE)  # little-endian
    struct.pack_into("<H", h, 30, 9)  # sector shift
    struct.pack_into("<H", h, 32, 6)  # mini sector shift
    struct.pack_into("<I", h, 44, len(fat_sectors))
    struct.pack_into("<i", h, 48, dir_start)
    struct.pack_into("<I", h, 56, 4096)  # mini cutoff
    struct.pack_into("<i", h, 60, minifat_start)
    struct.pack_into("<I", h, 64, n_minifat)
    struct.pack_into("<i", h, 68, -2)  # no extended DIFAT
    struct.pack_into("<I", h, 72, 0)
    for i in range(109):
        struct.pack_into(
            "<I", h, 76 + 4 * i,
            fat_sectors[i] if i < len(fat_sectors) else FREESECT,
        )
    return bytes(h)


def _pad(b: bytes, size: int) -> bytes:
    return b + b"\x00" * (-len(b) % size)


def cfb_container(stream: bytes) -> bytes:
    """Wrap a Workbook stream in a minimal CFB. Streams >= 4096 bytes go
    through the main FAT; smaller ones through the miniFAT — exercising
    both read paths."""
    if len(stream) >= 4096:
        data_sect = _pad(stream, 512)
        n_data = len(data_sect) // 512
        # sectors: 0 = FAT, 1 = directory, 2.. = stream
        fat = [FATSECT, ENDOFCHAIN] + [
            (3 + i if i < n_data - 1 else ENDOFCHAIN) for i in range(n_data)
        ]
        fat_sect = _pad(b"".join(struct.pack("<I", x) for x in fat), 512)
        assert len(fat_sect) == 512
        dirs = _pad(
            _dir_entry("Root Entry", 5, ENDOFCHAIN, 0)
            + _dir_entry("Workbook", 2, 2, len(stream)),
            512,
        )
        return _header([0], 1, -2, 0) + fat_sect + dirs + data_sect
    mini = _pad(stream, 64)
    n_mini = len(mini) // 64
    ministream = _pad(mini, 512)
    n_ms = len(ministream) // 512
    # sectors: 0 = FAT, 1 = directory, 2 = miniFAT, 3.. = ministream
    fat = [FATSECT, ENDOFCHAIN, ENDOFCHAIN] + [
        (4 + i if i < n_ms - 1 else ENDOFCHAIN) for i in range(n_ms)
    ]
    fat_sect = _pad(b"".join(struct.pack("<I", x) for x in fat), 512)
    minifat = [
        (i + 1 if i < n_mini - 1 else ENDOFCHAIN) for i in range(n_mini)
    ]
    minifat_sect = _pad(b"".join(struct.pack("<I", x) for x in minifat), 512)
    dirs = _pad(
        _dir_entry("Root Entry", 5, 3, len(ministream))
        + _dir_entry("Workbook", 2, 0, len(stream)),
        512,
    )
    return _header([0], 1, 2, 1) + fat_sect + dirs + minifat_sect + ministream


def write_xls(path: str, sheets: dict[str, list[list]], *, pad_to_fat: bool = False) -> None:
    stream = workbook_stream(sheets)
    if pad_to_fat and len(stream) < 4096:
        # legitimate padding: trailing free space after EOF is ignored
        # by record readers that stop at the sheet EOFs
        stream = stream + b"\x00" * (4096 - len(stream))
    with open(path, "wb") as fh:
        fh.write(cfb_container(stream))
