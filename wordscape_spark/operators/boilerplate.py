"""HTML main-content extraction — boilerplate stripping via block-level
DOM heuristics (the "HTML boilerplate strip / DOM heuristics" leg of the
north rule), entirely in native Spark SQL expressions.

Public provenance: the block-classification scheme follows jusText
(Pomikálek 2011, "Removing Boilerplate and Duplicate Content from Web
Corpora", ch. 5) as popularized by CommonCrawl curation pipelines
(CCNet, RefinedWeb, FineWeb all run a DOM/block main-content extractor
before any quality gate):

1. segment the page into blocks at block-level tag boundaries;
2. per block, compute word count, anchor-text (link) density and
   stop-word density;
3. classify each block GOOD / SHORT / BAD — link density above
   threshold → BAD (context-free, checked first per jusText so a nav
   bar can't be rescued by smoothing), then too few words → SHORT,
   then stop-word density below threshold → BAD (a real deployment
   passes a full ~600-word stop list; the default here is the
   corpus-appropriate 8-word set with the density gate disabled —
   see ``stop_frac_min``);
4. context smoothing: a SHORT block adjacent to a GOOD block is kept
   (jusText's "near-good" propagation, simplified to one hop).

Scale shape: the whole operator is ONE projection per row — block
split, per-block features, classification and neighbor smoothing all
run over in-row arrays (``transform`` / ``filter`` / ``aggregate``),
so the physical plan has zero Exchange and the page HTML never
shuffles.  Compare trafilatura/jusText in a ``mapInPandas``: correct
too, but pays Arrow transfer for every page; the native form keeps
the hot path JVM-side (pinned by
tests/test_boilerplate.py::test_html_plan_zero_exchange).

Parser scope (documented simplification): block segmentation is
regex-based over well-formed lowercase tags — the deterministic
subset the dual-dialect oracle can re-derive.  Real-web HTML with
malformed/cased/script-embedded markup would route through an
``lxml``-backed ``mapInPandas`` adapter behind the same block-feature
contract (the adapters.py seam pattern); the classification and
smoothing semantics above are the part that carries.

Reference parity note: the reference pipeline never parses HTML (its
corpus is .docx), but its candidate-URL harvest starts from Common
Crawl WAT records (ref: app/src/url_processing/process_wat.py) — this
operator is the main-content step a text-side fork of the same corpus
needs, per the north rule.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from wordscape_spark.operators.quality_rules import STOP_WORDS

# block-level tags (HTML5 content-sectioning + grouping subset).  The
# pattern is backslash-free on purpose: the same literal is valid in
# Java (Spark) and RE2 (DuckDB) regex dialects with no escaping drift.
BLOCK_TAG_PATTERN = (
    "</?(?:html|head|title|body|nav|header|footer|aside|section|article"
    "|div|p|h[1-6]|ul|ol|li|table|tr|td|th|br)[^>]*>"
)
ANCHOR_PATTERN = "<a[^>]*>([^<]*)</a>"

MIN_BLOCK_WORDS = 5
MAX_LINK_DENSITY = 0.35


def _seg_struct_expr(seg: str, stop_words: tuple[str, ...]) -> str:
    """Per-segment feature struct (txt, chars, nw, stp, ld).

    The cleaned text and its word array are each bound ONCE via the
    transform(array(<expr>), v -> ...)[0] idiom — an alias referenced
    once inside a HOF lambda is re-evaluated per use otherwise (the
    CollapseProject trap documented in operators/fingerprint.py)."""
    anchor = (
        f"coalesce(aggregate(regexp_extract_all({seg}, '{ANCHOR_PATTERN}',"
        " 1), 0L, (a, x) -> a + length(x)), 0L)"
    )
    clean = (
        f"trim(regexp_replace(replace(replace(regexp_replace({seg},"
        " '<[^>]*>', ' '), '&nbsp;', ' '), '&amp;', '&'), '\\\\s+', ' '))"
    )
    stop_in = ", ".join(f"'{w}'" for w in stop_words)
    return (
        f"transform(array({clean}), c -> "
        "transform(array(filter(split(c, ' '), w -> w != '')), ws -> "
        "named_struct("
        "'txt', c, "
        "'chars', length(c), "
        "'nw', size(ws), "
        f"'stp', size(filter(ws, w -> lower(w) IN ({stop_in}))), "
        f"'ld', CASE WHEN length(c) > 0 THEN CAST({anchor} AS DOUBLE)"
        " / length(c) ELSE CAST(0.0 AS DOUBLE) END"
        "))[0])[0]"
    )


def html_main_content(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    min_words: int = MIN_BLOCK_WORDS,
    max_link_density: float = MAX_LINK_DENSITY,
    stop_frac_min: float = 0.0,
    stop_words: tuple[str, ...] = STOP_WORDS,
) -> DataFrame:
    """Extract main content from an HTML column via jusText-style block
    classification + one-hop near-good smoothing.

    Returns (doc_id, main_text, n_blocks, n_kept, boiler_char_frac),
    dropping pages with no content block (the c4_clean convention).
    ``stop_frac_min`` = 0.0 disables the stop-word-density gate (set
    ~0.30 with a full language stop list, per jusText defaults)."""
    blocks = (
        f"filter(transform(split(h, '{BLOCK_TAG_PATTERN}'),"
        f" s -> {_seg_struct_expr('s', stop_words)}), b -> b.nw > 0)"
    )
    # jusText order: the context-free link-density BAD precedes the
    # length check — a link-dense nav bar must not be rescued by the
    # near-good smoothing just because real content follows it
    cls = (
        "transform(blocks, b -> "
        f"CASE WHEN b.ld > CAST({max_link_density} AS DOUBLE) THEN 'bad' "
        f"WHEN b.nw < {min_words} THEN 'short' "
        f"WHEN CAST(b.stp AS DOUBLE) / b.nw < CAST({stop_frac_min} AS"
        " DOUBLE) THEN 'bad' "
        "ELSE 'good' END)"
    )
    # explicit CASE guards (no reliance on AND short-circuit): ANSI mode
    # errors on element_at index 0 / size+1
    prev_good = "CASE WHEN i > 1 THEN element_at(cls, i - 1) ELSE '' END"
    next_good = (
        "CASE WHEN i < size(cls) THEN element_at(cls, i + 1) ELSE '' END"
    )
    keep = (
        f"element_at(cls, i) = 'good' OR (element_at(cls, i) = 'short'"
        f" AND ({prev_good} = 'good' OR {next_good} = 'good'))"
    )
    marked = (
        "CASE WHEN size(blocks) = 0 THEN "
        "CAST(array() AS ARRAY<STRUCT<k: BOOLEAN, txt: STRING,"
        " chars: INT>>) "
        "ELSE transform(sequence(1, size(blocks)), i -> named_struct("
        f"'k', {keep}, "
        "'txt', element_at(blocks, i).txt, "
        "'chars', element_at(blocks, i).chars)) END"
    )
    frac = (
        "round(CAST(aggregate(marked, 0L, (a, m) ->"
        " a + IF(m.k, 0L, CAST(m.chars AS BIGINT))) AS DOUBLE)"
        " / aggregate(marked, 0L, (a, m) -> a + m.chars), 6)"
    )
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.coalesce(F.col(html_col), F.lit("")).alias("h"),
        )
        .withColumn("blocks", F.expr(blocks))
        .withColumn("cls", F.expr(cls))
        .withColumn("marked", F.expr(marked))
        .filter(F.expr("exists(marked, m -> m.k)"))
        .select(
            "doc_id",
            F.array_join(
                F.expr("transform(filter(marked, m -> m.k), m -> m.txt)"),
                "\n",
            ).alias("main_text"),
            F.expr("CAST(size(blocks) AS BIGINT)").alias("n_blocks"),
            F.expr("CAST(size(filter(marked, m -> m.k)) AS BIGINT)").alias(
                "n_kept"
            ),
            F.expr(frac).alias("boiler_char_frac"),
        )
    )


def demo_html_expr(dialect: str) -> str:
    """Deterministic HTML page over (doc_id, text) — the test fixture
    both dialects synthesize identically (the pii_scrub planted-block
    pattern): title + nav + (every 3rd doc) link-farm sidebar + h1 +
    12-word <p> paragraphs + a short teaser + an inline-markup block +
    a link-heavy footer with entities.  Exercises every classification
    path: SHORT dropped (title/nav), SHORT kept via next-good (h1) and
    prev-good (teaser), BAD by link density (sidebar/footer), GOOD
    (paragraphs), inline-tag stripping (<a>/<b>) and entity decode
    (&amp;/&nbsp;)."""
    sidebar = (
        '<div><a href="/p1">More links here now</a>&nbsp;'
        '<a href="/p2">and even more links</a></div>'
    )
    head = (
        '<nav><a href="/">Home</a> <a href="/about">About</a>'
        ' <a href="/contact">Contact</a></nav>'
    )
    bold = (
        "<p>Here is <b>bold</b> text and this block has enough words"
        " to stay.</p>"
    )
    footer = (
        "<footer>Copyright &amp; legal"
        ' <a href="/tos">Terms of Service</a>'
        ' <a href="/privacy">Privacy Policy</a></footer>'
    )
    if dialect == "spark":
        paras = (
            "CASE WHEN size(ws) = 0 THEN '' ELSE concat_ws('',"
            " transform(sequence(1, CAST(ceil(size(ws) / 12.0) AS INT)),"
            " i -> concat('<p>', concat_ws(' ',"
            " slice(ws, (i - 1) * 12 + 1, 12)), '.</p>'))) END"
        )
        return (
            "transform(array(filter(split(text, '\\\\s+'),"
            " w -> w != '')), ws -> concat("
            "'<html><head><title>Doc ', CAST(doc_id AS STRING),"
            " '</title></head><body>', "
            f"'{head}', "
            f"CASE WHEN CAST(doc_id AS BIGINT) % 3 = 0 THEN '{sidebar}'"
            " ELSE '' END, "
            "'<h1>', concat_ws(' ', slice(ws, 1, 3)), '</h1>', "
            f"{paras}, "
            "'<div>Read more</div>', "
            f"'{bold}', "
            f"'{footer}', "
            "'</body></html>'))[0]"
        )
    paras = (
        "CASE WHEN len(ws) = 0 THEN '' ELSE array_to_string("
        "list_transform(range(1, CAST(ceil(len(ws) / 12.0) AS INT) + 1),"
        " i -> '<p>' || array_to_string("
        "list_slice(ws, (i - 1) * 12 + 1, (i - 1) * 12 + 12), ' ')"
        " || '.</p>'), '') END"
    )
    return (
        "'<html><head><title>Doc ' || CAST(doc_id AS VARCHAR)"
        " || '</title></head><body>'"
        f" || '{head}'"
        f" || CASE WHEN doc_id % 3 = 0 THEN '{sidebar}' ELSE '' END"
        " || '<h1>' || array_to_string(list_slice(ws, 1, 3), ' ')"
        f" || '</h1>' || {paras} || '<div>Read more</div>'"
        f" || '{bold}' || '{footer}' || '</body></html>'"
    )
