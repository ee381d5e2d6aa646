"""Entity taxonomy and builtin-style mapping tables.

Semantics mirror the reference's entity category set and builtin-style
handling (see /root/reference/app/settings/entities.py:1-95,
/root/reference/app/src/annotation/colorization/mappings.py:23-70 and
/root/reference/app/src/annotation/builtin_styles.py:1-378); the tables below
are our own Spark-first re-expression (category *names* are the public
taxonomy; we key everything on names/ids, never on render colors).
"""

from __future__ import annotations

# ---------------------------------------------------------------- categories
TITLE = "title"
HEADING = tuple(f"heading_{i}" for i in range(1, 10))  # heading_1..heading_9
TEXT = "text"
LIST = "list"
HEADER = "header"
FOOTER = "footer"
TABLE_HEADER = "table_header"
TABLE_HEADER_CELL = "table_header_cell"
TABLE = "table"
TABLE_CELL = "table_cell"
TOC = "toc"
BIBLIOGRAPHY = "bibliography"
QUOTE = "quote"
EQUATION = "equation"
FIGURE = "figure"
TABLE_CAPTION = "table_caption"
FOOTNOTE = "footnote"
ANNOTATION = "annotation"
FORM_FIELD = "form_field"
FORM_TAG = "form_tag"
TABLE_ROW = "table_row"
TABLE_COLUMN = "table_column"
TABLE_HEADER_ROW = "table_header_row"

# internal sentinel for uncolored whitespace runs (never emitted)
WHITESPACE = "__ws__"

# id assignment mirrors the reference taxonomy ids 0..30
ENTITY_NAMES: tuple[str, ...] = (
    TITLE,
    *HEADING,
    TEXT,
    LIST,
    HEADER,
    FOOTER,
    TABLE_HEADER,
    TABLE_HEADER_CELL,
    TABLE,
    TABLE_CELL,
    TOC,
    BIBLIOGRAPHY,
    QUOTE,
    EQUATION,
    FIGURE,
    TABLE_CAPTION,
    FOOTNOTE,
    ANNOTATION,
    FORM_FIELD,
    FORM_TAG,
    TABLE_ROW,
    TABLE_COLUMN,
    TABLE_HEADER_ROW,
)
NAME_TO_ID: dict[str, int] = {n: i for i, n in enumerate(ENTITY_NAMES)}
ID_TO_NAME: dict[int, str] = {i: n for n, i in NAME_TO_ID.items()}

# categories excluded from the quality-score numerator
# (ref: app/src/annotation/annotation_quality.py:11-15)
QUALITY_IGNORED = frozenset({TABLE_ROW, TABLE_CELL, TABLE_COLUMN})

# categories whose spans may legitimately be empty
# (ref: app/src/annotation/postprocessing/filters.py:92-121)
ALLOWED_EMPTY = frozenset(
    {TABLE, TABLE_CELL, TABLE_ROW, TABLE_COLUMN, TABLE_HEADER,
     TABLE_HEADER_CELL, TABLE_HEADER_ROW, FIGURE, FORM_FIELD}
)

# ------------------------------------------------------------ decision sources
SRC_BUILTIN = "builtin"
SRC_XML_PATTERN = "xml_pattern"
SRC_CONTENT_AWARE = "content_aware_heuristic"
SRC_HEURISTIC_USINGBUILTIN = "body_heading_heuristic_usingbuiltin"
SRC_HEURISTIC_BASE = "body_heading_heuristic_base"

DECISION_SOURCES = (
    SRC_BUILTIN,
    SRC_XML_PATTERN,
    SRC_CONTENT_AWARE,
    SRC_HEURISTIC_USINGBUILTIN,
    SRC_HEURISTIC_BASE,
)
# "builtin" sources for the annotation-quality score
# (ref: app/settings/annotation.py:17-20)
BUILTIN_SOURCES = frozenset({SRC_BUILTIN, SRC_XML_PATTERN})

# ------------------------------------------------------- builtin-style mapping
# style-name prefix -> category; evaluated in declaration order with
# last-match-wins, like the reference's mapping scan
# (ref: colorization/entities/paragraph.py:46-49).
STYLE_PREFIX_TO_CATEGORY: tuple[tuple[str, str], ...] = (
    ("body", TEXT),
    ("normal", TEXT),
    ("plain text", TEXT),
    ("no spacing", TEXT),
    ("default", TEXT),
    ("title", TITLE),
    ("heading 1", HEADING[0]),
    ("heading 2", HEADING[1]),
    ("heading 3", HEADING[2]),
    ("heading 4", HEADING[3]),
    ("heading 5", HEADING[4]),
    ("heading 6", HEADING[5]),
    ("heading 7", HEADING[6]),
    ("heading 8", HEADING[7]),
    ("heading 9", HEADING[8]),
    ("header", HEADER),
    ("footer", FOOTER),
    ("list", LIST),
    ("toc", TOC),
    ("bibliography", BIBLIOGRAPHY),
    ("quote", QUOTE),
    ("intense quote", QUOTE),
    ("caption", TABLE_CAPTION),
    ("footnote", FOOTNOTE),
    ("annotation", ANNOTATION),
)

# The set of style names we recognize as Word builtins.  A style whose name is
# NOT in this set falls through to the font heuristics; a style in the set but
# matching no prefix above is dropped ("unrecognized" in the reference,
# paragraph.py:85-86).  This is the standard public Word builtin-style name
# list (subset sufficient for the engine + datagen).
BUILTIN_STYLES: frozenset[str] = frozenset(
    [
        "normal",
        "body text",
        "body text 2",
        "body text 3",
        "body text indent",
        "plain text",
        "no spacing",
        "default paragraph font",
        "title",
        "subtitle",
        *(f"heading {i}" for i in range(1, 10)),
        *(f"index {i}" for i in range(1, 10)),
        *(f"toc {i}" for i in range(1, 10)),
        "normal indent",
        "footnote text",
        "footnote reference",
        "annotation text",
        "annotation reference",
        "header",
        "footer",
        "index heading",
        "caption",
        "table of figures",
        "envelope address",
        "envelope return",
        "line number",
        "page number",
        "endnote reference",
        "endnote text",
        "table of authorities",
        "macro",
        "toa heading",
        "list",
        *(f"list {i}" for i in range(2, 6)),
        "list bullet",
        *(f"list bullet {i}" for i in range(2, 6)),
        "list number",
        *(f"list number {i}" for i in range(2, 6)),
        "list paragraph",
        "list continue",
        *(f"list continue {i}" for i in range(2, 6)),
        "quote",
        "intense quote",
        "block text",
        "bibliography",
        "signature",
        "closing",
        "date",
        "salutation",
        "message header",
        "note heading",
        "document map",
        "normal (web)",
        "normal table",
        "hyperlink",
        "strong",
        "emphasis",
    ]
)

# "subtitle" maps to no category on purpose (exercises the unrecognized-builtin
# drop path), same for "macro", "index N", "signature", ...

# ---------------------------------------------------- content-aware constants
# (ref: app/settings/content_awareness.py:1-21)
FORM_FIELD_SYMBOLS = ("_", ".", "…")
QUOTE_SYMBOLS = ('"', "'")
NUMBERING_SYMBOLS = (
    "-", "•", "➢", "◦", "▪", "▫", "●",
    "○", "■", "□", "▶", "⁃", "◆", "◇",
    "◐", "◑",
)
NUMBERING_FOLLOWERS = (".", ":", ")")


from functools import lru_cache as _lru_cache


@_lru_cache(maxsize=4096)
def map_builtin_style(style_lower: str) -> str | None:
    """Last-match prefix mapping of a lowercase builtin style name."""
    found = None
    for prefix, cat in STYLE_PREFIX_TO_CATEGORY:
        if style_lower.startswith(prefix):
            found = cat
    return found
