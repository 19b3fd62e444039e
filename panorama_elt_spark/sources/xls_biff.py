"""Stdlib legacy ``.xls`` (BIFF8) reader — closes the reference's
binary-Excel niche (``xls_datasource.py`` reads both ``.xls`` and
``.xlsx`` via xlrd/pandas) without any third-party engine.

A ``.xls`` file is an OLE2 Compound File Binary (MS-CFB): a FAT-chained
sector store whose ``Workbook`` stream holds BIFF8 records. This module
implements exactly the subset the reference's contract needs — sheet
enumeration, the shared-string table, text/number/RK/boolean cells, all
surfaced as strings with the first row as header (the all-string raw
layer, §1.3) — and raises ``XlsBiffUnsupported`` with a precise reason
on anything outside that subset (encrypted workbooks, BIFF5,
CONTINUE-spanning strings), so callers gate cleanly instead of
mis-parsing.

Layout references are the public [MS-CFB] and [MS-XLS] specifications.
Parsing is driver-side by design: the reference caps sheets at 10^6
rows (``xls_datasource.py:111``), the same bound ``read_xls_tables``
applies.
"""

from __future__ import annotations

import struct

ENDOFCHAIN = -2
FREESECT = -1

_CFB_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"

# BIFF8 record ids
_BOF = 0x0809
_EOF = 0x000A
_SST = 0x00FC
_CONTINUE = 0x003C
_BOUNDSHEET = 0x0085
_LABELSST = 0x00FD
_LABEL = 0x0204
_NUMBER = 0x0203
_RK = 0x027E
_MULRK = 0x00BD
_BOOLERR = 0x0205
_FILEPASS = 0x002F


class XlsBiffUnsupported(RuntimeError):
    """The file is valid but uses a BIFF/CFB feature outside the
    implemented subset (the caller surfaces this as the xlrd gate)."""


def _cfb_open_stream(data: bytes, names: tuple[str, ...]) -> bytes:
    """Return the bytes of the first directory stream whose name is in
    ``names``, following FAT or miniFAT chains as its size dictates."""
    if data[:8] != _CFB_MAGIC:
        raise XlsBiffUnsupported("not an OLE2 compound file")
    # the layout below (sector 0 at byte 512, stream size = low dword) is
    # the v3 layout; gate v4 (4096-byte sectors, 64-bit stream sizes)
    # explicitly instead of relying on garbage reads to raise
    major = struct.unpack_from("<H", data, 26)[0]
    ssz = 1 << struct.unpack_from("<H", data, 30)[0]
    if major != 3 or ssz != 512:
        raise XlsBiffUnsupported(
            f"CFB major version {major} with {ssz}-byte sectors "
            "(only v3 / 512-byte sectors implemented)"
        )
    mssz = 1 << struct.unpack_from("<H", data, 32)[0]
    dir_start = struct.unpack_from("<i", data, 48)[0]
    mini_cutoff = struct.unpack_from("<I", data, 56)[0]
    minifat_start = struct.unpack_from("<i", data, 60)[0]
    difat_start = struct.unpack_from("<i", data, 68)[0]
    n_difat = struct.unpack_from("<I", data, 72)[0]
    difat = list(struct.unpack_from("<109i", data, 76))
    s = difat_start
    per = ssz // 4
    for _ in range(n_difat):
        ent = struct.unpack_from(f"<{per}i", data, 512 + s * ssz)
        difat.extend(ent[:-1])
        s = ent[-1]
    fat: list[int] = []
    for fs in difat:
        if fs in (FREESECT, ENDOFCHAIN):
            continue
        fat.extend(struct.unpack_from(f"<{per}i", data, 512 + fs * ssz))

    def fat_chain(start: int) -> bytes:
        out, s, hops = bytearray(), start, 0
        while s not in (ENDOFCHAIN, FREESECT) and s >= 0:
            out += data[512 + s * ssz : 512 + (s + 1) * ssz]
            s = fat[s]
            hops += 1
            if hops > len(fat) + 1:
                raise XlsBiffUnsupported("cyclic FAT chain")
        return bytes(out)

    dirdata = fat_chain(dir_start)
    entries = []
    for off in range(0, len(dirdata), 128):
        if off + 128 > len(dirdata):
            break
        nlen = struct.unpack_from("<H", dirdata, off + 64)[0]
        name = (
            dirdata[off : off + nlen - 2].decode("utf-16-le", "replace")
            if nlen >= 2
            else ""
        )
        otype = dirdata[off + 66]
        start = struct.unpack_from("<i", dirdata, off + 116)[0]
        size = struct.unpack_from("<I", dirdata, off + 120)[0]  # v3: low dword
        entries.append((name, otype, start, size))
    root = next((e for e in entries if e[1] == 5), None)
    target = next((e for e in entries if e[1] == 2 and e[0] in names), None)
    if target is None:
        raise XlsBiffUnsupported(f"no {'/'.join(names)} stream in directory")
    _, _, start, size = target
    if size >= mini_cutoff:
        return fat_chain(start)[:size]
    if root is None:
        raise XlsBiffUnsupported("mini stream without root entry")
    ministream = fat_chain(root[2])
    minifat: list[int] = []
    s = minifat_start
    while s not in (ENDOFCHAIN, FREESECT) and s >= 0:
        minifat.extend(struct.unpack_from(f"<{per}i", data, 512 + s * ssz))
        s = fat[s]
    out, s, hops = bytearray(), start, 0
    while s not in (ENDOFCHAIN, FREESECT) and s >= 0:
        out += ministream[s * mssz : (s + 1) * mssz]
        s = minifat[s]
        hops += 1
        if hops > len(minifat) + 1:
            raise XlsBiffUnsupported("cyclic miniFAT chain")
    return bytes(out[:size])


def _records(stream: bytes, pos: int = 0):
    """Yield (record_id, payload, offset) from a BIFF record stream."""
    n = len(stream)
    while pos + 4 <= n:
        rid, ln = struct.unpack_from("<HH", stream, pos)
        payload = stream[pos + 4 : pos + 4 + ln]
        yield rid, payload, pos
        pos += 4 + ln


def _unicode_string(buf: bytes, off: int, cch_width: int = 2) -> tuple[str, int]:
    """XLUnicodeString / ShortXLUnicodeString at ``off``; returns
    (text, bytes consumed). Rich-text runs and FarEast blocks are
    skipped; a string that would span a CONTINUE record has already
    truncated ``buf`` and raises upstream."""
    if cch_width == 1:
        cch = buf[off]
        p = off + 1
    else:
        cch = struct.unpack_from("<H", buf, off)[0]
        p = off + 2
    grbit = buf[p]
    p += 1
    n_runs = 0
    cb_ext = 0
    if grbit & 0x08:  # fRichSt
        n_runs = struct.unpack_from("<H", buf, p)[0]
        p += 2
    if grbit & 0x04:  # fExtSt
        cb_ext = struct.unpack_from("<I", buf, p)[0]
        p += 4
    nbytes = cch * (2 if grbit & 0x01 else 1)
    if p + nbytes > len(buf):
        raise XlsBiffUnsupported("string spans a CONTINUE record")
    raw = buf[p : p + nbytes]
    text = raw.decode("utf-16-le") if grbit & 0x01 else raw.decode("latin-1")
    p += nbytes + 4 * n_runs + cb_ext
    return text, p - off


def _parse_sst(payload: bytes) -> list[str]:
    n_unique = struct.unpack_from("<I", payload, 4)[0]
    out: list[str] = []
    p = 8
    for _ in range(n_unique):
        text, used = _unicode_string(payload, p)
        out.append(text)
        p += used
    return out


def _rk_value(rk: int) -> float:
    val: float
    if rk & 0x02:  # 30-bit signed int
        i = rk >> 2
        if i & (1 << 29):
            i -= 1 << 30
        val = float(i)
    else:  # top 30 bits of an IEEE double
        val = struct.unpack("<d", struct.pack("<Q", (rk & ~0x3) << 32))[0]
    if rk & 0x01:
        val /= 100.0
    return val


def _num_str(v: float) -> str:
    """Surface numerics the way the xlsx path surfaces raw <v> text:
    integral doubles without the trailing .0."""
    return str(int(v)) if float(v).is_integer() and abs(v) < 1e15 else repr(v)


def read_xls_biff(data: bytes) -> dict[str, list[dict[int, str | None]]]:
    """Parse a BIFF8 workbook: {sheet_name: [{col_index: value}]} in the
    same shape ``_read_xlsx_stdlib`` produces, so both formats share the
    header/DataFrame plumbing. Malformed structures surface as
    ``XlsBiffUnsupported`` (the gate), never as a mis-parse."""
    try:
        return _read_xls_biff(data)
    except XlsBiffUnsupported:
        raise
    except (IndexError, ValueError, struct.error, UnicodeDecodeError) as exc:
        raise XlsBiffUnsupported(f"malformed CFB/BIFF structure: {exc}") from exc


def _read_xls_biff(data: bytes) -> dict[str, list[dict[int, str | None]]]:
    wb = _cfb_open_stream(data, ("Workbook", "Book"))
    # globals substream: version check, encryption gate, SST, sheet dir
    sst: list[str] = []
    sheets: list[tuple[str, int]] = []  # (name, stream offset)
    prev_rid = -1
    for rid, payload, _off in _records(wb):
        if rid == _BOF:
            ver = struct.unpack_from("<H", payload, 0)[0]
            if ver != 0x0600:
                raise XlsBiffUnsupported(f"BIFF version 0x{ver:04x} (need BIFF8)")
        elif rid == _FILEPASS:
            raise XlsBiffUnsupported("encrypted workbook")
        elif rid == _SST:
            sst = _parse_sst(payload)
        elif rid == _CONTINUE and prev_rid == _SST:
            # a truncated SST would otherwise mis-index silently
            raise XlsBiffUnsupported("SST spans CONTINUE records")
        elif rid == _BOUNDSHEET:
            pos = struct.unpack_from("<I", payload, 0)[0]
            name, _ = _unicode_string(payload, 6, cch_width=1)
            sheets.append((name, pos))
        elif rid == _EOF:
            break
        prev_rid = rid

    out: dict[str, list[dict[int, str | None]]] = {}
    for name, pos in sheets:
        cells: dict[int, dict[int, str | None]] = {}

        def put(row: int, col: int, val: str | None) -> None:
            cells.setdefault(row, {})[col] = val

        for rid, payload, _off in _records(wb, pos):
            if rid == _EOF:
                break
            if rid == _LABELSST:
                row, col, _xf, isst = struct.unpack_from("<HHHI", payload, 0)
                put(row, col, sst[isst] if isst < len(sst) else None)
            elif rid == _LABEL:
                row, col = struct.unpack_from("<HH", payload, 0)
                text, _ = _unicode_string(payload, 6)
                put(row, col, text)
            elif rid == _NUMBER:
                row, col, _xf = struct.unpack_from("<HHH", payload, 0)
                (x,) = struct.unpack_from("<d", payload, 6)
                put(row, col, _num_str(x))
            elif rid == _RK:
                row, col, _xf, rk = struct.unpack_from("<HHHI", payload, 0)
                put(row, col, _num_str(_rk_value(rk)))
            elif rid == _MULRK:
                row, col_first = struct.unpack_from("<HH", payload, 0)
                n = (len(payload) - 6) // 6
                for i in range(n):
                    _xf, rk = struct.unpack_from("<HI", payload, 4 + 6 * i)
                    put(row, col_first + i, _num_str(_rk_value(rk)))
            elif rid == _BOOLERR:
                row, col, _xf = struct.unpack_from("<HHH", payload, 0)
                v, is_err = payload[6], payload[7]
                put(row, col, None if is_err else str(int(v)))
        if not cells:
            out[name] = []
            continue
        out[name] = [cells.get(r, {}) for r in range(max(cells) + 1)]
    return out
