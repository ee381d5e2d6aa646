"""Legacy ``.doc`` (Word 97-2003 binary) text-level ingestion.

The reference converts ``.doc`` → ``.docx`` through a LibreOffice unoserver
subprocess before annotating
(/root/reference/app/src/annotation/soffice/conversion_manager.py:161-223) —
a boundary a Spark executor can't ship.  This module implements the
text-level half natively instead: a pure-stdlib reader for the two public
formats involved ([MS-CFB] compound file + [MS-DOC] piece table) that
recovers the main-document *text and paragraph structure* and emits it in
the interleaved span grammar, so ``extract()`` runs unchanged downstream.

Scope (documented): character/paragraph FORMATTING (CHPX/PAPX FKPs) is not
decoded — every paragraph enters the classifier as style "normal", so
classification degrades to the content-aware + body-font path.  That is the
honest text-level analog of "convert then annotate": full-fidelity styling
still requires the reference's LibreOffice conversion.

Reader structure:

* ``CfbFile`` — [MS-CFB] v3/v4: DIFAT → FAT chains, directory tree,
  miniFAT + ministream for streams under the 4096-byte cutoff.
* ``extract_doc_paragraphs`` — [MS-DOC]: FIB (wIdent 0xA5EC, fWhichTblStm
  flag → 0Table/1Table, ccpText, fcClx/lcbClx), CLX walk (Prc skip → Pcdt),
  PlcPcd piece table with per-piece fCompressed (cp1252 at fc/2) vs
  UTF-16LE decoding, reassembled main text cut to ccpText.
* Paragraph marks: 0x0D (and 0x07 table cell/row marks — text-level
  flattening); 0x0C page breaks become standalone ``pb`` spans; field and
  object control chars (0x01/0x02/0x05/0x08/0x13/0x14/0x15) are stripped.

The independent inverse renderer lives in ``wordscape_spark/docgen_doc.py``
(the docxgen pattern): round-trip tests + the ``doc_ingest`` driver query
pin this chain against a dual-dialect SQL oracle over the interleaved table.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from wordscape_spark import signal as sig

CFB_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"

_FREESECT = 0xFFFFFFFF
_ENDOFCHAIN = 0xFFFFFFFE

# control chars stripped from paragraph text (field begin/sep/end, embedded
# object/picture marks, annotation refs)
_STRIP = {0x01, 0x02, 0x05, 0x08, 0x13, 0x14, 0x15}


def _u16(b: bytes, off: int) -> int:
    return struct.unpack_from("<H", b, off)[0]


def _u32(b: bytes, off: int) -> int:
    return struct.unpack_from("<I", b, off)[0]


class CfbFile:
    """Minimal [MS-CFB] reader: named streams out of a compound file."""

    def __init__(self, data: bytes):
        if data[:8] != CFB_MAGIC:
            raise ValueError("not a compound file (bad magic)")
        self.data = data
        sector_shift = _u16(data, 30)
        self.sector = 1 << sector_shift
        self.mini_sector = 1 << _u16(data, 32)
        self.mini_cutoff = _u32(data, 56)
        n_fat = _u32(data, 44)
        first_dir = _u32(data, 48)
        first_minifat = _u32(data, 60)
        first_difat = _u32(data, 68)

        # DIFAT: 109 header entries + chained DIFAT sectors
        difat = [_u32(data, 76 + 4 * i) for i in range(109)]
        sect = first_difat
        per = self.sector // 4 - 1
        while sect not in (_ENDOFCHAIN, _FREESECT):
            base = self._sector_off(sect)
            difat.extend(
                _u32(data, base + 4 * i) for i in range(per)
            )
            sect = _u32(data, base + 4 * per)
        self.fat: list[int] = []
        for fs in difat[:n_fat]:
            base = self._sector_off(fs)
            self.fat.extend(
                _u32(data, base + 4 * i) for i in range(self.sector // 4)
            )

        dir_bytes = self._read_chain(first_dir)
        self.entries = []
        for off in range(0, len(dir_bytes), 128):
            ent = dir_bytes[off:off + 128]
            if len(ent) < 128:
                break
            name_len = _u16(ent, 64)
            if name_len == 0:
                continue
            name = ent[: max(0, name_len - 2)].decode("utf-16-le")
            self.entries.append(
                {
                    "name": name,
                    "type": ent[66],
                    "start": _u32(ent, 116),
                    "size": struct.unpack_from("<Q", ent, 120)[0],
                }
            )
        root = next(e for e in self.entries if e["type"] == 5)
        self._ministream = self._read_chain(root["start"])[: root["size"]]
        self.minifat: list[int] = []
        if first_minifat not in (_ENDOFCHAIN, _FREESECT):
            mf = self._read_chain(first_minifat)
            self.minifat = [
                _u32(mf, 4 * i) for i in range(len(mf) // 4)
            ]

    def _sector_off(self, sect: int) -> int:
        return self.sector * (sect + 1)

    def _read_chain(self, start: int) -> bytes:
        out = bytearray()
        sect = start
        seen = 0
        while sect not in (_ENDOFCHAIN, _FREESECT):
            base = self._sector_off(sect)
            out += self.data[base:base + self.sector]
            sect = self.fat[sect]
            seen += 1
            if seen > len(self.fat) + 1:
                raise ValueError("FAT chain cycle")
        return bytes(out)

    def _read_mini_chain(self, start: int) -> bytes:
        out = bytearray()
        sect = start
        seen = 0
        while sect not in (_ENDOFCHAIN, _FREESECT):
            off = sect * self.mini_sector
            out += self._ministream[off:off + self.mini_sector]
            sect = self.minifat[sect]
            seen += 1
            if seen > len(self.minifat) + 1:
                raise ValueError("miniFAT chain cycle")
        return bytes(out)

    def stream(self, name: str) -> bytes:
        for e in self.entries:
            if e["type"] == 2 and e["name"] == name:
                if e["size"] < self.mini_cutoff:
                    raw = self._read_mini_chain(e["start"])
                else:
                    raw = self._read_chain(e["start"])
                return raw[: e["size"]]
        raise KeyError(name)


def extract_doc_text(data: bytes) -> str:
    """Main-document text of a .doc byte string (piece-table reassembly)."""
    cfb = CfbFile(data)
    wd = cfb.stream("WordDocument")
    if _u16(wd, 0) != 0xA5EC:
        raise ValueError("not a Word binary file (bad wIdent)")
    which = (_u16(wd, 0x000A) >> 9) & 1
    table = cfb.stream(f"{which}Table")
    ccp_text = _u32(wd, 0x004C)
    fc_clx = _u32(wd, 0x01A2)
    lcb_clx = _u32(wd, 0x01A6)
    clx = table[fc_clx:fc_clx + lcb_clx]

    pos = 0
    while pos < len(clx) and clx[pos] == 0x01:  # Prc: skip property blobs
        pos += 3 + _u16(clx, pos + 1)
    if pos >= len(clx) or clx[pos] != 0x02:
        raise ValueError("malformed CLX: no Pcdt")
    lcb = _u32(clx, pos + 1)
    plc = clx[pos + 5:pos + 5 + lcb]
    n = (lcb - 4) // 12
    cps = [_u32(plc, 4 * i) for i in range(n + 1)]

    parts = []
    for i in range(n):
        fc_raw = _u32(plc, 4 * (n + 1) + 8 * i + 2)
        count = cps[i + 1] - cps[i]
        if fc_raw & 0x40000000:  # fCompressed: cp1252 bytes at fc/2
            fc = (fc_raw & 0x3FFFFFFF) // 2
            parts.append(wd[fc:fc + count].decode("cp1252"))
        else:
            fc = fc_raw & 0x3FFFFFFF
            parts.append(wd[fc:fc + 2 * count].decode("utf-16-le"))
    return "".join(parts)[:ccp_text]


def extract_doc_paragraphs(data: bytes) -> list[str | None]:
    """Paragraph texts in document order; ``None`` marks a page break.

    0x0D ends a paragraph, 0x07 ends a table cell/row (flattened to a
    paragraph boundary at text level), 0x0C is a page break; field/object
    control chars are stripped from the text."""
    text = extract_doc_text(data)
    out: list[str | None] = []
    buf: list[str] = []
    for ch in text:
        o = ord(ch)
        if o in (0x0D, 0x07):
            out.append("".join(buf))
            buf = []
        elif o == 0x0C:
            if buf:
                out.append("".join(buf))
                buf = []
            out.append(None)  # page break
        elif o in _STRIP:
            continue
        else:
            buf.append(ch)
    if buf:
        out.append("".join(buf))
    return out


def parse_doc_bytes(data: bytes) -> list[dict]:
    """One .doc byte string → ordered span rows in the interleaved grammar
    (every paragraph style "normal"; page breaks as ``pb`` spans)."""
    rows = []
    par = 0
    for item in extract_doc_paragraphs(data):
        if item is None:
            rows.append(
                {"kind": sig.PAGE_BREAK, "text": None, "media_ref": None}
            )
            continue
        rows.append(
            {
                "kind": sig.encode_run(par=par, style="normal"),
                "text": item,
                "media_ref": None,
            }
        )
        par += 1
    return [
        {**r, "offset": i} for i, r in enumerate(rows)
    ]


def doc_to_spans(
    df: DataFrame, id_col: str = "doc_id", content_col: str = "content"
) -> DataFrame:
    """Arrow-batched legacy-.doc ingestion: (doc_id, content binary) →
    (doc_id, spans).  Zero shuffle; per-document fault isolation — a
    corrupt compound file yields an empty spans array (rejected downstream
    as min_text) instead of failing the task."""
    from wordscape_spark.operators.extract import INPUT_SCHEMA

    def parse_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, content in zip(pdf[id_col], pdf[content_col]):
                try:
                    spans = parse_doc_bytes(bytes(content))
                except Exception:  # noqa: BLE001 — isolation boundary
                    spans = []
                rows.append({"doc_id": doc_id, "spans": spans})
            if rows:
                yield pd.DataFrame(rows)

    return df.mapInPandas(parse_batches, schema=INPUT_SCHEMA)
