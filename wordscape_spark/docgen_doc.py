"""Independent legacy ``.doc`` (Word 97 binary) renderer — the docgen twin
for ``operators/doc_legacy.py``.

Renders paragraph text into a REAL [MS-CFB] compound file containing a
[MS-DOC] WordDocument stream (FIB + text) and 0Table stream (CLX piece
table), so the reader is round-trip-tested against bytes it did not
produce-from-shared-code: this module builds the formats from the public
specs directly (header/DIFAT/FAT/miniFAT/directory; FIB field offsets;
Pcdt/PlcPcd with per-piece fCompressed), sharing nothing with the parser
but the span grammar.

Deliberate structure choices that exercise the reader's paths:

* text is split into up to three pieces, alternating cp1252-compressed and
  UTF-16LE encodings (piece seams land mid-paragraph);
* the CLX carries a leading Prc (property-modifier blob) the reader must
  skip before the Pcdt;
* streams under the 4096-byte cutoff live in the ministream (miniFAT
  chains); larger ones take regular FAT chains — both arise in practice
  (small docs: everything mini; big docs: WordDocument in the FAT).

Scope matches the reader: body paragraphs + page breaks (0x0C); control
chars in input text are normalized to spaces ([MS-DOC] text space rules);
no CHPX/PAPX formatting is written, mirroring the text-level boundary
documented in doc_legacy.py.
"""

from __future__ import annotations

import os
import pathlib
import re
import struct
import tempfile

from wordscape_spark import datagen
from wordscape_spark import signal as sig

_ENDOFCHAIN = 0xFFFFFFFE
_FREESECT = 0xFFFFFFFF
_FATSECT = 0xFFFFFFFD

_FIB_SIZE = 1472
_CTRL_RE = re.compile("[\x00-\x08\x0a-\x1f]")  # \t (0x09) is legal text


# ---------------------------------------------------------------------------
# [MS-DOC] WordDocument + 0Table streams
# ---------------------------------------------------------------------------


def _encode_pieces(text: str) -> tuple[bytes, bytes, int]:
    """(text bytes after the FIB, CLX bytes, ccpText).  Splits into ≤3
    pieces with alternating cp1252/UTF-16 encodings where the text allows
    it; ccpText counts CPs (cp1252 bytes / UTF-16 code units)."""
    n = len(text)
    if n >= 9:
        bounds = [0, n // 3, 2 * n // 3, n]
    else:
        bounds = [0, n]
    pieces = [text[bounds[i]:bounds[i + 1]] for i in range(len(bounds) - 1)]

    data = bytearray()
    cps = [0]
    pcds = []
    for i, piece in enumerate(pieces):
        compressed = False
        if i % 2 == 0:
            try:
                enc = piece.encode("cp1252")
                compressed = True
            except UnicodeEncodeError:
                enc = piece.encode("utf-16-le")
        else:
            enc = piece.encode("utf-16-le")
        offset = _FIB_SIZE + len(data)
        if compressed:
            fc = (offset * 2) | 0x40000000
            count = len(enc)
        else:
            fc = offset
            count = len(enc) // 2
        data += enc
        cps.append(cps[-1] + count)
        pcds.append(struct.pack("<HIH", 0, fc, 0))

    plc = b"".join(struct.pack("<I", cp) for cp in cps) + b"".join(pcds)
    # a Prc the reader must skip (grpprl payload is opaque to text recovery)
    prc = b"\x01" + struct.pack("<H", 6) + b"\x00" * 6
    clx = prc + b"\x02" + struct.pack("<I", len(plc)) + plc
    return bytes(data), clx, cps[-1]


def build_doc(items: list[str | None], which_table: int = 0) -> bytes:
    """Render paragraphs (``None`` = page break) into .doc bytes.

    ``which_table`` selects the table-stream name (0Table/1Table) and sets
    the FIB ``fWhichTblStm`` flag accordingly — Word emits both in the
    wild (the flag flips on incremental save)."""
    parts = []
    for item in items:
        if item is None:
            parts.append("\x0c")
        else:
            parts.append(_CTRL_RE.sub(" ", item) + "\r")
    text = "".join(parts)
    if not text.endswith("\r"):
        text += "\r"

    text_bytes, clx, ccp_text = _encode_pieces(text)

    fib = bytearray(_FIB_SIZE)
    struct.pack_into("<H", fib, 0x0000, 0xA5EC)   # wIdent
    struct.pack_into("<H", fib, 0x0002, 0x00C1)   # nFib (Word 97)
    struct.pack_into("<H", fib, 0x000A, 0x0200 if which_table else 0)
    struct.pack_into("<H", fib, 0x0020, 0x000E)   # csw
    struct.pack_into("<H", fib, 0x003E, 0x0016)   # cslw
    struct.pack_into("<I", fib, 0x0040, _FIB_SIZE + len(text_bytes))  # cbMac
    struct.pack_into("<I", fib, 0x004C, ccp_text)  # ccpText
    struct.pack_into("<H", fib, 0x0098, 0x005D)   # cbRgFcLcb (93 pairs)
    struct.pack_into("<I", fib, 0x01A2, 0)        # fcClx (CLX at 0Table:0)
    struct.pack_into("<I", fib, 0x01A6, len(clx))  # lcbClx

    word_stream = bytes(fib) + text_bytes
    return _build_cfb(
        {"WordDocument": word_stream, f"{which_table}Table": clx}
    )


# ---------------------------------------------------------------------------
# [MS-CFB] compound file writer (v3, 512-byte sectors)
# ---------------------------------------------------------------------------


def _pad(b: bytes, size: int, fill: bytes = b"\x00") -> bytes:
    rem = len(b) % size
    return b if rem == 0 else b + fill * (size - rem)


def _dir_entry(
    name: str, etype: int, start: int, size: int,
    left: int = _FREESECT, right: int = _FREESECT, child: int = _FREESECT,
) -> bytes:
    raw = name.encode("utf-16-le") + b"\x00\x00"
    ent = bytearray(128)
    ent[:len(raw)] = raw
    struct.pack_into("<H", ent, 64, len(raw))
    ent[66] = etype
    ent[67] = 1  # black
    struct.pack_into("<I", ent, 68, left)
    struct.pack_into("<I", ent, 72, right)
    struct.pack_into("<I", ent, 76, child)
    struct.pack_into("<I", ent, 116, start)
    struct.pack_into("<Q", ent, 120, size)
    return bytes(ent)


def _build_cfb(streams: dict[str, bytes]) -> bytes:
    SEC, MINI, CUTOFF = 512, 64, 4096

    mini_names = [n for n, b in streams.items() if len(b) < CUTOFF]
    big_names = [n for n in streams if n not in mini_names]

    # ministream + miniFAT chains (sequential per stream)
    ministream = bytearray()
    minifat: list[int] = []
    mini_start: dict[str, int] = {}
    for name in mini_names:
        body = _pad(streams[name], MINI)
        first = len(minifat)
        n_m = len(body) // MINI
        mini_start[name] = first if n_m else _ENDOFCHAIN
        for i in range(n_m):
            minifat.append(first + i + 1 if i < n_m - 1 else _ENDOFCHAIN)
        ministream += body
    minifat_bytes = _pad(
        b"".join(struct.pack("<I", v) for v in minifat), SEC,
        struct.pack("<I", _FREESECT),
    )
    ministream = _pad(bytes(ministream), SEC)

    n_dir = 1          # 3 entries fit in one 512-byte sector (4 slots)
    n_minifat = len(minifat_bytes) // SEC if minifat else 0
    n_ministream = len(ministream) // SEC
    big_padded = {n: _pad(streams[n], SEC) for n in big_names}
    n_big = {n: len(b) // SEC for n, b in big_padded.items()}

    n_data = n_dir + n_minifat + n_ministream + sum(n_big.values())
    # FAT sectors cover data + the FAT itself (fixpoint)
    n_fat = 1
    while (n_data + n_fat) * 4 > n_fat * SEC:
        n_fat += 1
    if n_fat > 109:
        raise ValueError("document too large for header DIFAT")

    # sector layout: [FAT][dir][miniFAT][ministream][big streams...]
    first_dir = n_fat
    first_minifat = first_dir + n_dir if n_minifat else _ENDOFCHAIN
    first_ministream = n_fat + n_dir + n_minifat
    big_first: dict[str, int] = {}
    cursor = first_ministream + n_ministream
    for name in big_names:
        big_first[name] = cursor if n_big[name] else _ENDOFCHAIN
        cursor += n_big[name]
    total = cursor

    fat = [_FREESECT] * (n_fat * SEC // 4)
    for i in range(n_fat):
        fat[i] = _FATSECT
    fat[first_dir] = _ENDOFCHAIN

    def chain(first: int, count: int) -> None:
        for i in range(count):
            fat[first + i] = first + i + 1 if i < count - 1 else _ENDOFCHAIN

    if n_minifat:
        chain(first_minifat, n_minifat)
    if n_ministream:
        chain(first_ministream, n_ministream)
    for name in big_names:
        if n_big[name]:
            chain(big_first[name], n_big[name])

    # directory: Root → WordDocument (tree root) with 0Table as left child
    # (CFB orders children by (name length, name): "0Table" sorts first)
    starts = {}
    for name in streams:
        starts[name] = (
            mini_start[name] if name in mini_names else big_first[name]
        )
    order = list(streams)  # entry ids 1..n in dict order
    ids = {name: i + 1 for i, name in enumerate(order)}
    root = _dir_entry(
        "Root Entry", 5,
        first_ministream if n_ministream else _ENDOFCHAIN,
        len(ministream), child=ids[order[0]],
    )
    entries = [root]
    for i, name in enumerate(order):
        left = ids[order[i + 1]] if i + 1 < len(order) else _FREESECT
        entries.append(
            _dir_entry(name, 2, starts[name], len(streams[name]), left=left)
        )
    dir_bytes = _pad(b"".join(entries), SEC)

    header = bytearray(512)
    header[:8] = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
    struct.pack_into("<H", header, 24, 0x003E)   # minor version
    struct.pack_into("<H", header, 26, 0x0003)   # major version 3
    struct.pack_into("<H", header, 28, 0xFFFE)   # little-endian
    struct.pack_into("<H", header, 30, 9)        # 512-byte sectors
    struct.pack_into("<H", header, 32, 6)        # 64-byte mini sectors
    struct.pack_into("<I", header, 44, n_fat)
    struct.pack_into("<I", header, 48, first_dir)
    struct.pack_into("<I", header, 56, CUTOFF)
    struct.pack_into(
        "<I", header, 60,
        first_minifat if n_minifat else _ENDOFCHAIN,
    )
    struct.pack_into("<I", header, 64, n_minifat)
    struct.pack_into("<I", header, 68, _ENDOFCHAIN)  # no DIFAT sectors
    struct.pack_into("<I", header, 72, 0)
    for i in range(109):
        struct.pack_into(
            "<I", header, 76 + 4 * i, i if i < n_fat else _FREESECT
        )

    body = bytearray(total * SEC)

    def put(sector: int, data: bytes) -> None:
        body[sector * SEC:sector * SEC + len(data)] = data

    put(0, b"".join(struct.pack("<I", v) for v in fat))
    put(first_dir, dir_bytes)
    if n_minifat:
        put(first_minifat, minifat_bytes)
    if n_ministream:
        put(first_ministream, ministream)
    for name in big_names:
        if n_big[name]:
            put(big_first[name], big_padded[name])

    return bytes(header) + bytes(body)


# ---------------------------------------------------------------------------
# interleaved table → paragraph items → binary ingestion table
# ---------------------------------------------------------------------------


_PAR_RE = re.compile(r"p=(\d+)")


def spans_to_paragraph_items(spans: list[dict]) -> list[str | None]:
    """Body-paragraph texts (+ ``None`` page breaks) from interleaved spans.

    Scope of the .doc rendering: body ``r`` runs grouped per paragraph in
    offset order, page breaks kept in position; header/footer/table/sdt/
    figure/meta spans are not representable at .doc text level and are
    skipped (doc_legacy.py scope note)."""
    pars: dict[int, list[tuple[int, str]]] = {}
    breaks: list[tuple[int, int]] = []  # (after_par, seq)
    last_par = -1
    for span in sorted(spans, key=lambda s: s["offset"]):
        kind = span["kind"]
        if kind == sig.PAGE_BREAK:
            breaks.append((last_par, span["offset"]))
        elif kind.startswith("r;"):
            m = _PAR_RE.search(kind)
            if not m:
                continue
            p = int(m.group(1))
            pars.setdefault(p, []).append(
                (span["offset"], span["text"] or "")
            )
            last_par = p
    items: list[str | None] = []
    by_par = sorted(pars)
    break_after: dict[int, int] = {}
    for after, _ in breaks:
        break_after[after] = break_after.get(after, 0) + 1
    for count in range(break_after.get(-1, 0)):
        items.append(None)
    for p in by_par:
        items.append("".join(t for _, t in sorted(pars[p])))
        for _ in range(break_after.get(p, 0)):
            items.append(None)
    return items


def ensure_doc(sf: float) -> str:
    """Materialize a (doc_id, content) parquet of real .doc bytes rendered
    from the interleaved table — the legacy-binary twin of
    docxgen.ensure_docx."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    out_dir = (
        pathlib.Path("/root/repo/data/doc_legacy")
        / f"v{datagen.DATAGEN_VERSION}"
        / f"sf{sf:g}"
    )
    out = out_dir / "docs.parquet"
    if out.exists():
        return str(out)
    out_dir.mkdir(parents=True, exist_ok=True)
    table = pq.read_table(datagen.ensure_interleaved(sf)).to_pylist()
    rows = [
        {
            "doc_id": row["doc_id"],
            "content": build_doc(spans_to_paragraph_items(row["spans"])),
        }
        for row in table
    ]
    fd, tmp = tempfile.mkstemp(dir=out_dir, suffix=".parquet.tmp")
    os.close(fd)
    try:
        pq.write_table(
            pa.Table.from_pylist(
                rows,
                schema=pa.schema(
                    [("doc_id", pa.string()), ("content", pa.binary())]
                ),
            ),
            tmp,
            row_group_size=256,
        )
        os.replace(tmp, out)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return str(out)
