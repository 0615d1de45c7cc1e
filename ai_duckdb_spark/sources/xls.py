"""Minimal stdlib-only .xls (BIFF8) reader (SURVEY.md §2.1 S4).

The reference reads .xls through pandas+xlrd (reference doc.py:47-49);
xlrd is absent in this container, so — like the .xlsx stdlib fallback in
io.py — this module parses the subset of the format that the flat
first-row-is-header tables the upload surface accepts actually use:

  * the OLE2/CFB compound-file container ([MS-CFB]): FAT + miniFAT
    sector chains, directory, the "Workbook"/"Book" stream (small
    streams live in the root entry's mini stream — the common case for
    .xls files under 4 KB);
  * BIFF8 records ([MS-XLS]): the shared-string table (SST, including
    CONTINUE spillover with per-boundary option bytes), the first
    BOUNDSHEET's cell records — LABELSST, NUMBER, RK, MULRK, LABEL,
    BOOLERR, and the substream framing (BOF/EOF).

Formulas, dates-as-numbers formatting, charts, and BIFF5 are out of
scope; pandas' reader takes priority whenever an engine is installed.
"""

from __future__ import annotations

import struct

import pandas as pd

_CFB_SIG = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_FREESECT = -1
_ENDOFCHAIN = -2


def _chain(start: int, table: list[int]) -> list[int]:
    out: list[int] = []
    seen: set[int] = set()
    s = start
    while s >= 0:
        if s in seen or s >= len(table):
            raise ValueError("corrupt sector chain")
        seen.add(s)
        out.append(s)
        s = table[s]
    return out


def cfb_stream(data: bytes, stream_names: tuple[str, ...]) -> bytes:
    """Extract a named stream from an OLE2 compound file ([MS-CFB])."""
    if data[:8] != _CFB_SIG:
        raise ValueError("not an OLE2 compound file")
    sect_size = 1 << struct.unpack_from("<H", data, 30)[0]
    mini_size = 1 << struct.unpack_from("<H", data, 32)[0]
    n_fat = struct.unpack_from("<I", data, 44)[0]
    dir_start = struct.unpack_from("<i", data, 48)[0]
    mini_cutoff = struct.unpack_from("<I", data, 56)[0]
    minifat_start = struct.unpack_from("<i", data, 60)[0]
    difat_start = struct.unpack_from("<i", data, 68)[0]
    n_difat = struct.unpack_from("<I", data, 72)[0]

    def sector(i: int) -> bytes:
        off = 512 + i * sect_size
        return data[off : off + sect_size]

    per_sect = sect_size // 4
    difat = list(struct.unpack_from("<109i", data, 76))
    # n_difat is an untrusted uint32: a corrupt header can claim billions
    # of DIFAT sectors while pointing the chain at a valid self-looping
    # sector, turning this walk into an unbounded allocation (found by
    # fuzzing). A file of len(data) bytes has at most that many real
    # sectors — cap the walk there and reject cycles.
    max_sects = (len(data) - 512) // sect_size + 1 if len(data) > 512 else 0
    seen_difat: set[int] = set()
    s = difat_start
    for _ in range(min(n_difat, max_sects)):
        if s < 0:
            break
        if s in seen_difat:
            raise ValueError("corrupt DIFAT chain")
        seen_difat.add(s)
        body = struct.unpack(f"<{per_sect}i", sector(s))
        difat.extend(body[:-1])
        s = body[-1]
    fat: list[int] = []
    for fs in difat[:n_fat]:
        if fs >= 0:
            fat.extend(struct.unpack(f"<{per_sect}i", sector(fs)))

    dir_data = b"".join(sector(i) for i in _chain(dir_start, fat))
    root: tuple[int, int] | None = None
    target: tuple[int, int] | None = None
    for off in range(0, len(dir_data) - 127, 128):
        raw = dir_data[off : off + 128]
        name_len = struct.unpack_from("<H", raw, 64)[0]
        if name_len < 2 or name_len > 64:
            continue
        name = raw[: name_len - 2].decode("utf-16-le", errors="replace")
        otype = raw[66]
        start = struct.unpack_from("<i", raw, 116)[0]
        size = struct.unpack_from("<I", raw, 120)[0]  # v3: low 32 bits
        if otype == 5:
            root = (start, size)
        elif otype == 2 and name in stream_names and target is None:
            target = (start, size)
    if target is None:
        raise ValueError(f"no stream named any of {stream_names}")

    start, size = target
    if size < mini_cutoff:
        if root is None:
            raise ValueError("mini stream without a root entry")
        container = b"".join(sector(i) for i in _chain(root[0], fat))
        minifat: list[int] = []
        if minifat_start >= 0:
            for i in _chain(minifat_start, fat):
                minifat.extend(struct.unpack(f"<{per_sect}i", sector(i)))
        out = b"".join(
            container[ms * mini_size : (ms + 1) * mini_size]
            for ms in _chain(start, minifat)
        )
    else:
        out = b"".join(sector(i) for i in _chain(start, fat))
    return out[:size]


# ---------------------------------------------------------------- BIFF8

_BOF = 0x0809
_EOF = 0x000A
_SST = 0x00FC
_CONTINUE = 0x003C
_BOUNDSHEET = 0x0085
_LABELSST = 0x00FD
_NUMBER = 0x0203
_RK = 0x027E
_MULRK = 0x00BD
_LABEL = 0x0204
_BOOLERR = 0x0205


def _records(stream: bytes, pos: int = 0):
    while pos + 4 <= len(stream):
        rid, ln = struct.unpack_from("<HH", stream, pos)
        yield rid, stream[pos + 4 : pos + 4 + ln]
        pos += 4 + ln


class _SstCursor:
    """Byte cursor over SST + CONTINUE payloads. Per [MS-XLS] 2.5.293,
    only string CHARACTER runs may split at a CONTINUE boundary (the
    continuation re-states a 1-byte option flag); fixed-width fields
    never split, so reads of those just hop to the next chunk when the
    current one is exhausted."""

    def __init__(self, chunks: list[bytes]):
        self.chunks = chunks
        self.ci = 0
        self.pos = 0

    def _hop(self) -> None:
        while self.ci < len(self.chunks) and self.pos >= len(self.chunks[self.ci]):
            self.ci += 1
            self.pos = 0

    def take(self, n: int) -> bytes:
        """n raw bytes, spanning chunk boundaries transparently (counts,
        rich-run/ext-block skips)."""
        out = b""
        while n > 0:
            self._hop()
            chunk = self.chunks[self.ci]
            grab = min(n, len(chunk) - self.pos)
            out += chunk[self.pos : self.pos + grab]
            self.pos += grab
            n -= grab
        return out

    def read_string(self) -> str:
        cch = struct.unpack("<H", self.take(2))[0]
        flags = self.take(1)[0]
        high = flags & 0x01
        n_runs = struct.unpack("<H", self.take(2))[0] if flags & 0x08 else 0
        cb_ext = struct.unpack("<i", self.take(4))[0] if flags & 0x04 else 0
        text = ""
        remaining = cch
        while remaining > 0:
            self._hop()
            chunk = self.chunks[self.ci]
            avail = len(chunk) - self.pos
            if avail == 0:
                raise ValueError("SST string runs past the record stream")
            width = 2 if high else 1
            n_here = min(remaining, avail // width)
            if n_here == 0:
                # char split across the boundary can't happen (width 2
                # strings are 2-byte aligned within a chunk by spec);
                # treat as boundary: hop and re-read the option byte
                self.ci += 1
                self.pos = 0
                high = self.take(1)[0] & 0x01
                continue
            raw = chunk[self.pos : self.pos + n_here * width]
            self.pos += n_here * width
            text += raw.decode("utf-16-le" if high else "latin-1")
            remaining -= n_here
            if remaining > 0:
                # hit a CONTINUE boundary: next chunk starts with a new
                # option byte for the rest of this string
                self._hop()
                high = self.take(1)[0] & 0x01
        self.take(4 * n_runs)
        self.take(cb_ext)
        return text


def _parse_sst(chunks: list[bytes]) -> list[str]:
    cur = _SstCursor(chunks)
    cur.take(4)  # total ref count
    n_unique = struct.unpack("<I", cur.take(4))[0]
    return [cur.read_string() for _ in range(n_unique)]


def _decode_rk(rk: int) -> float:
    if rk & 2:  # 30-bit signed integer
        v = rk >> 2
        if v & (1 << 29):
            v -= 1 << 30
        val = float(v)
    else:  # high 30 bits of an IEEE double
        val = struct.unpack("<d", struct.pack("<Q", (rk & 0xFFFFFFFC) << 32))[0]
    return val / 100 if rk & 1 else val


def _num(v: float) -> object:
    return int(v) if float(v).is_integer() else v


def _parse_cells(stream: bytes, offset: int, sst: list[str]) -> dict[tuple[int, int], object]:
    cells: dict[tuple[int, int], object] = {}
    depth = 0
    for rid, payload in _records(stream, offset):
        if rid == _BOF:
            depth += 1
        elif rid == _EOF:
            depth -= 1
            if depth <= 0:
                break
        elif rid == _LABELSST:
            r, c, _, isst = struct.unpack_from("<HHHI", payload)
            cells[(r, c)] = sst[isst]
        elif rid == _NUMBER:
            r, c, _ = struct.unpack_from("<HHH", payload)
            cells[(r, c)] = _num(struct.unpack_from("<d", payload, 6)[0])
        elif rid == _RK:
            r, c, _ = struct.unpack_from("<HHH", payload)
            cells[(r, c)] = _num(_decode_rk(struct.unpack_from("<I", payload, 6)[0]))
        elif rid == _MULRK:
            r, col_first = struct.unpack_from("<HH", payload)
            col_last = struct.unpack_from("<H", payload, len(payload) - 2)[0]
            for i in range(col_last - col_first + 1):
                rk = struct.unpack_from("<I", payload, 4 + 6 * i + 2)[0]
                cells[(r, col_first + i)] = _num(_decode_rk(rk))
        elif rid == _LABEL:  # inline BIFF8 unicode string cell
            r, c, _ = struct.unpack_from("<HHH", payload)
            cch, flags = struct.unpack_from("<HB", payload, 6)
            if flags & 1:
                cells[(r, c)] = payload[9 : 9 + 2 * cch].decode("utf-16-le")
            else:
                cells[(r, c)] = payload[9 : 9 + cch].decode("latin-1")
        elif rid == _BOOLERR:
            r, c, _, val, is_err = struct.unpack_from("<HHHBB", payload)
            if not is_err:
                cells[(r, c)] = bool(val)
    return cells


def read_xls_stdlib(file_path: str) -> pd.DataFrame:
    """First worksheet of a BIFF8 .xls as a DataFrame (row 0 = header) —
    same tabular contract as io._read_xlsx_stdlib."""
    with open(file_path, "rb") as f:
        data = f.read()
    wb = cfb_stream(data, ("Workbook", "Book"))

    # workbook-globals pass: SST (+ its CONTINUEs) and the first sheet's
    # substream offset from BOUNDSHEET
    sst: list[str] = []
    sheet_offset: int | None = None
    sst_chunks: list[bytes] | None = None
    for rid, payload in _records(wb):
        if rid == _SST:
            sst_chunks = [payload]
        elif rid == _CONTINUE and sst_chunks is not None:
            sst_chunks.append(payload)
        else:
            if sst_chunks is not None:
                sst = _parse_sst(sst_chunks)
                sst_chunks = None
            if rid == _BOUNDSHEET and sheet_offset is None:
                sheet_offset = struct.unpack_from("<I", payload)[0]
            elif rid == _EOF:
                break
    if sst_chunks is not None:
        sst = _parse_sst(sst_chunks)
    if sheet_offset is None:
        raise ValueError("xls has no worksheets")

    cells = _parse_cells(wb, sheet_offset, sst)
    if not cells:
        return pd.DataFrame()
    n_rows = max(r for r, _ in cells) + 1
    width = max(c for _, c in cells) + 1
    # A corrupt stream can carry arbitrary uint16 cell coordinates, and
    # materializing the dense grid below would allocate n_rows*width
    # cells (65536x65536 worst case, tens of GB — found by fuzzing).
    # BIFF8's own limits are 65536 rows x 256 columns, and the upload
    # contract is a dense header-plus-rows table, so a grid vastly
    # larger than the actual cell count is corruption, not data.
    if width > 256 or n_rows > 65536:
        raise ValueError("xls cell coordinates exceed BIFF8 sheet limits")
    if n_rows * width > max(65536, 64 * len(cells)):
        raise ValueError("xls cell grid implausibly sparse — corrupt stream")
    header = [str(cells.get((0, i), f"col{i}")) for i in range(width)]
    body = [[cells.get((r, i)) for i in range(width)] for r in range(1, n_rows)]
    return pd.DataFrame(body, columns=header)
