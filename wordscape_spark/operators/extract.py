"""The extraction operator — classified ordered span sequences per document.

Execution strategy (designed for 10^12-row scale):

* The input table has one row per document, so the normal path is a pure
  ``mapInPandas`` — **zero shuffle**: each Arrow batch of documents is
  classified independently.  (The reference's per-document two-pass heuristic
  would force a ``groupBy(doc_id)`` only if spans arrived exploded.)
* Skewed mega-documents (``size(spans) > cfg.salt_threshold``) would stall a
  task the way one huge doc stalls a reference worker (SURVEY §4.1).  They
  take the *salted path*: spans are chunked at element boundaries, the
  per-document font-heuristic state (which is additive per paragraph) is
  computed per chunk and merged, broadcast-joined back to the chunks, chunks
  are classified in parallel, and partial results are re-merged in chunk
  order.  Results are bit-identical to the single-pass path (tested).
* Oversized documents are rejected *natively* (``F.size < …``) before any
  Python executes — the cheap-gate-first ordering the reference hand-rolls
  (annotator_process.py:292-319) expressed as Catalyst-visible predicates.
"""

from __future__ import annotations

import json
from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

from wordscape_spark.config import DEFAULT_CONFIG, ExtractConfig
from wordscape_spark.core import classify as C

SPAN_TYPE = StructType(
    [
        StructField("kind", StringType()),
        StructField("text", StringType()),
        StructField("media_ref", StringType()),
        StructField("offset", IntegerType()),
    ]
)

# classified output spans additionally carry the 1-based page number
# (page model, orm/models.py:132-187); the span-equality surface is still
# (kind, text, media_ref, offset)
OUT_SPAN_TYPE = StructType(
    [
        StructField("kind", StringType()),
        StructField("text", StringType()),
        StructField("media_ref", StringType()),
        StructField("offset", IntegerType()),
        StructField("page", IntegerType()),
    ]
)

PAGE_TYPE = StructType(
    [
        StructField("page", IntegerType()),
        StructField("text", StringType()),
        StructField("counts", MapType(StringType(), LongType())),
    ]
)

INPUT_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("spans", ArrayType(SPAN_TYPE)),
    ]
)

EXTRACTED_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("ok", BooleanType()),
        StructField("reject_reason", StringType()),
        StructField("spans", ArrayType(OUT_SPAN_TYPE)),
        StructField("pages", ArrayType(PAGE_TYPE)),
        StructField("text", StringType()),
        StructField("counts", MapType(StringType(), LongType())),
        StructField("quality", DoubleType()),
        StructField("builtin_props", MapType(StringType(), DoubleType())),
        StructField("props", MapType(StringType(), StringType())),
        StructField("lang_tags", ArrayType(StringType())),
        StructField("num_words", LongType()),
        StructField("num_chars", LongType()),
        StructField("num_alph_chars", LongType()),
        StructField("num_numeric_chars", LongType()),
        StructField("num_alphnum_chars", LongType()),
        StructField("alnum_prop", DoubleType()),
        StructField("alph_to_num_ratio", DoubleType()),
    ]
)

# the span-equality surface alone (the north-star per-row invariant):
# skips doc text, page records, entity-count/props maps and text metrics —
# the return-leg Arrow→JVM conversion of those columns is the single
# largest cost of the full row at scale (they roughly triple the output
# string volume: doc text + per-page text duplicate every span text)
EXTRACTED_SLIM_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("ok", BooleanType()),
        StructField("reject_reason", StringType()),
        StructField("spans", ArrayType(OUT_SPAN_TYPE)),
    ]
)


def _result_row_slim(doc_id: str, res: C.DocResult) -> dict:
    return {
        "doc_id": doc_id,
        "ok": res.ok,
        "reject_reason": res.reject_reason,
        "spans": _out_spans_to_rows(res.spans, res.span_pages),
    }


_CHUNK_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("chunk_idx", IntegerType()),
        StructField("spans", ArrayType(SPAN_TYPE)),
        StructField("font_state", StringType()),
    ]
)

_FONTMAP_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("font_state", StringType()),
    ]
)

_PARTIAL_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("chunk_idx", IntegerType()),
        StructField("spans", ArrayType(OUT_SPAN_TYPE)),  # page is chunk-local
        StructField("pages", ArrayType(PAGE_TYPE)),      # chunk-local pages
        StructField("text", StringType()),
        StructField("counts", MapType(StringType(), LongType())),
        StructField("char_counter", StringType()),
        StructField("meta_json", StringType()),  # props/lang_tags of chunk
    ]
)


def _spans_to_tuples(spans) -> list[tuple]:
    return [
        (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans
    ]


def _spans_to_rows(spans: list[tuple]) -> list[dict]:
    return [
        {"kind": k, "text": t, "media_ref": m, "offset": o}
        for (k, t, m, o) in spans
    ]


def _out_spans_to_rows(spans: list[tuple], span_pages: list[int]) -> list[dict]:
    pages = span_pages if len(span_pages) == len(spans) else [1] * len(spans)
    return [
        {"kind": k, "text": t, "media_ref": m, "offset": o, "page": p}
        for (k, t, m, o), p in zip(spans, pages)
    ]


def _pages_to_rows(pages: list[tuple]) -> list[dict]:
    return [
        {"page": p, "text": t, "counts": {k: int(v) for k, v in c.items()}}
        for (p, t, c) in pages
    ]


def _result_row(doc_id: str, res: C.DocResult, metrics=None) -> dict:
    # D10 metrics are computed here, inside the classification UDF: they
    # parallelize with classification at zero extra Arrow traffic.  (A native
    # column-expression variant was measured slower end-to-end — JVM string
    # passes over multi-MB mega-doc texts straggle; see operators/text.py
    # metrics_exprs for the SQL-side twin used by the oracle.)  Batch callers
    # pass precomputed ``metrics`` (one vectorized text_metrics_batch pass
    # per Arrow batch instead of two regex subs + a translate per doc).
    if metrics is None:
        metrics = C.text_metrics(res.text if res.ok else "")
    return {
        "doc_id": doc_id,
        "ok": res.ok,
        "reject_reason": res.reject_reason,
        "spans": _out_spans_to_rows(res.spans, res.span_pages),
        "pages": _pages_to_rows(res.pages),
        "text": res.text,
        "counts": {k: int(v) for k, v in res.counts.items()},
        "quality": float(res.quality),
        "builtin_props": res.builtin_props,
        "props": res.props,
        "lang_tags": list(res.lang_tags),
        "num_words": int(metrics["num_words"]),
        "num_chars": int(metrics["num_chars"]),
        "num_alph_chars": int(metrics["num_alph_chars"]),
        "num_numeric_chars": int(metrics["num_numeric_chars"]),
        "num_alphnum_chars": int(metrics["num_alphnum_chars"]),
        "alnum_prop": float(metrics["alnum_prop"]),
        "alph_to_num_ratio": float(metrics["alph_to_num_ratio"]),
    }


def _safe_classify(spans, cfg: ExtractConfig) -> C.DocResult:
    """Per-document fault isolation: a malformed document becomes a reject
    row instead of failing the task (the reference's failed_*.jsonl model,
    annotator_process.py:199-282 — at 10^12 rows one bad doc must never
    kill a job)."""
    if spans is None:
        # NULL spans array (producer wrote a null, not []): a distinct
        # marker, not error:TypeError from inside the classifier
        return C.DocResult(False, "null_spans", [], "", {}, 0.0, {})
    try:
        return C.classify_document(_spans_to_tuples(spans), cfg)
    except Exception as exc:  # noqa: BLE001 — intentional isolation boundary
        return C.DocResult(
            False, f"error:{type(exc).__name__}", [], "", {}, 0.0, {}
        )


def _make_classify_fn(cfg: ExtractConfig):
    def classify_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                _result_row(doc_id, _safe_classify(spans, cfg))
                for doc_id, spans in zip(pdf["doc_id"], pdf["spans"])
            ]
            if rows:
                yield pd.DataFrame(rows)

    return classify_batches


def _slim_record_batch(results, arrow_schema):
    """Column-wise Arrow assembly of slim rows (doc_id, DocResult pairs).

    Byte-identical to ``RecordBatch.from_pylist`` over ``_result_row_slim``
    rows (pinned by test) without materializing a dict per row and per span
    — from_pylist re-hashes every field name for every span."""
    import pyarrow as pa

    S = pa.string()
    I32 = pa.int32()
    doc_ids = []
    oks = []
    rejects = []
    sk: list = []
    st: list = []
    sm: list = []
    so: list = []
    sp: list = []
    soff = [0]
    stot = 0
    for d, r in results:
        doc_ids.append(d)
        oks.append(r.ok)
        rejects.append(r.reject_reason)
        spans = r.spans
        if spans:
            pages = (
                r.span_pages
                if len(r.span_pages) == len(spans)
                else [1] * len(spans)
            )
            ks, ts, ms, os_ = zip(*spans)
            sk.extend(ks)
            st.extend(ts)
            sm.extend(ms)
            so.extend(os_)
            sp.extend(pages)
            stot += len(spans)
        soff.append(stot)
    spans_arr = pa.ListArray.from_arrays(
        pa.array(soff, I32),
        pa.StructArray.from_arrays(
            [pa.array(sk, S), pa.array(st, S), pa.array(sm, S),
             pa.array(so, I32), pa.array(sp, I32)],
            names=["kind", "text", "media_ref", "offset", "page"],
        ),
    )
    return pa.RecordBatch.from_arrays(
        [pa.array(doc_ids, S), pa.array(oks, pa.bool_()),
         pa.array(rejects, S), spans_arr],
        schema=arrow_schema,
    )


def _full_record_batch(results, metrics, arrow_schema):
    """Column-wise Arrow assembly of full EXTRACTED_SCHEMA rows — the
    column-by-column twin of ``_result_row`` + ``from_pylist`` (map entry
    order = dict insertion order, exactly like from_pylist; pinned by
    test)."""
    import pyarrow as pa

    S = pa.string()
    I32 = pa.int32()
    I64 = pa.int64()
    F64 = pa.float64()
    doc_ids = []
    oks = []
    rejects = []
    texts = []
    quality = []
    sk: list = []
    st: list = []
    sm: list = []
    so: list = []
    sp: list = []
    soff = [0]
    pg_num: list = []
    pg_text: list = []
    pgoff = [0]
    pgc_k: list = []
    pgc_v: list = []
    pgcoff = [0]
    cnt_k: list = []
    cnt_v: list = []
    cntoff = [0]
    bp_k: list = []
    bp_v: list = []
    bpoff = [0]
    pr_k: list = []
    pr_v: list = []
    proff = [0]
    lt: list = []
    ltoff = [0]
    nw = []
    nc = []
    nal = []
    nnu = []
    nan_ = []
    ap = []
    ar = []
    stot = ptot = pctot = ctot = btot = prtot = ltot = 0
    for (d, r), m in zip(results, metrics):
        doc_ids.append(d)
        oks.append(r.ok)
        rejects.append(r.reject_reason)
        texts.append(r.text)
        quality.append(float(r.quality))
        spans = r.spans
        if spans:
            pages = (
                r.span_pages
                if len(r.span_pages) == len(spans)
                else [1] * len(spans)
            )
            ks, ts, ms, os_ = zip(*spans)
            sk.extend(ks)
            st.extend(ts)
            sm.extend(ms)
            so.extend(os_)
            sp.extend(pages)
            stot += len(spans)
        soff.append(stot)
        for p, t_, c in r.pages:
            pg_num.append(p)
            pg_text.append(t_)
            for k, v in c.items():
                pgc_k.append(k)
                pgc_v.append(int(v))
                pctot += 1
            pgcoff.append(pctot)
            ptot += 1
        pgoff.append(ptot)
        for k, v in r.counts.items():
            cnt_k.append(k)
            cnt_v.append(int(v))
            ctot += 1
        cntoff.append(ctot)
        for k, v in r.builtin_props.items():
            bp_k.append(k)
            bp_v.append(v)
            btot += 1
        bpoff.append(btot)
        for k, v in r.props.items():
            pr_k.append(k)
            pr_v.append(v)
            prtot += 1
        proff.append(prtot)
        lt.extend(r.lang_tags)
        ltot += len(r.lang_tags)
        ltoff.append(ltot)
        nw.append(int(m["num_words"]))
        nc.append(int(m["num_chars"]))
        nal.append(int(m["num_alph_chars"]))
        nnu.append(int(m["num_numeric_chars"]))
        nan_.append(int(m["num_alphnum_chars"]))
        ap.append(float(m["alnum_prop"]))
        ar.append(float(m["alph_to_num_ratio"]))
    spans_arr = pa.ListArray.from_arrays(
        pa.array(soff, I32),
        pa.StructArray.from_arrays(
            [pa.array(sk, S), pa.array(st, S), pa.array(sm, S),
             pa.array(so, I32), pa.array(sp, I32)],
            names=["kind", "text", "media_ref", "offset", "page"],
        ),
    )
    pages_arr = pa.ListArray.from_arrays(
        pa.array(pgoff, I32),
        pa.StructArray.from_arrays(
            [
                pa.array(pg_num, I32),
                pa.array(pg_text, S),
                pa.MapArray.from_arrays(
                    pa.array(pgcoff, I32),
                    pa.array(pgc_k, S),
                    pa.array(pgc_v, I64),
                ),
            ],
            names=["page", "text", "counts"],
        ),
    )
    counts_map = pa.MapArray.from_arrays(
        pa.array(cntoff, I32), pa.array(cnt_k, S), pa.array(cnt_v, I64)
    )
    bp_map = pa.MapArray.from_arrays(
        pa.array(bpoff, I32), pa.array(bp_k, S), pa.array(bp_v, F64)
    )
    pr_map = pa.MapArray.from_arrays(
        pa.array(proff, I32), pa.array(pr_k, S), pa.array(pr_v, S)
    )
    lt_arr = pa.ListArray.from_arrays(pa.array(ltoff, I32), pa.array(lt, S))
    return pa.RecordBatch.from_arrays(
        [pa.array(doc_ids, S), pa.array(oks, pa.bool_()),
         pa.array(rejects, S), spans_arr, pages_arr, pa.array(texts, S),
         counts_map, pa.array(quality, F64), bp_map, pr_map, lt_arr,
         pa.array(nw, I64), pa.array(nc, I64), pa.array(nal, I64),
         pa.array(nnu, I64), pa.array(nan_, I64), pa.array(ap, F64),
         pa.array(ar, F64)],
        schema=arrow_schema,
    )


def _make_classify_arrow_fn(
    cfg: ExtractConfig, row_fn=None, out_schema=None
):
    """mapInArrow variant of the classifier — the hot path.

    Skips the Arrow↔pandas round-trip entirely: the nested spans column is
    read with ``to_pylist()`` (one C-level pass) and results are rebuilt as
    a RecordBatch with an explicit schema (no pandas object-column
    inference).  Measured ~2× end-to-end extraction throughput vs
    mapInPandas on this schema — pandas materializes every nested struct as
    object arrays of dicts twice (in and out).

    ``row_fn``/``out_schema`` select the output shape: the full
    EXTRACTED_SCHEMA row (default) or the slim span-surface row
    (``extract_slim``)."""
    import pyarrow as pa

    if row_fn is None:
        row_fn = _result_row
    if out_schema is None:
        out_schema = EXTRACTED_SCHEMA

    # the full-row surface computes D10 text metrics: batch them (one
    # vectorized pass per Arrow batch) instead of per-doc regex work
    batch_metrics = row_fn is _result_row

    def classify_batches(batches):
        from pyspark.sql.pandas.types import to_arrow_schema

        arrow_schema = to_arrow_schema(out_schema)
        for batch in batches:
            doc_ids = batch.column(0).to_pylist()
            spans_col = batch.column(1)
            results = []
            if spans_col.null_count == 0:
                # flat-child decode: one to_pylist per LEAF column instead
                # of materializing a dict per span (nested to_pylist) —
                # measured 16% faster end-to-end on the sf0.8 mix, and the
                # classifier consumes tuples directly with no dict hop
                offsets = spans_col.offsets.to_pylist()
                flat = spans_col.flatten()
                # field access is BY NAME: a conforming table whose struct
                # children are ordered differently (read_docs normalizes,
                # but callers can hand extract() any DataFrame) must not be
                # silently decoded in the wrong order.
                # kind strings repeat heavily (~6× at the corpus mix):
                # dictionary-encode so each distinct kind materializes ONE
                # Python string (fewer allocations, and the shared objects
                # make the parse-cache dict lookups identity-fast).  A NULL
                # kind (malformed producer) keeps the plain decode so it
                # still fails per-document inside _safe_classify_tuples.
                kind_arr = flat.field("kind")
                if kind_arr.null_count == 0:
                    enc = kind_arr.dictionary_encode()
                    uniq = enc.dictionary.to_pylist()
                    kinds = [uniq[i] for i in enc.indices.to_numpy(
                        zero_copy_only=False).tolist()]
                else:
                    kinds = kind_arr.to_pylist()
                texts = flat.field("text").to_pylist()
                refs = flat.field("media_ref").to_pylist()
                offs = flat.field("offset").to_pylist()
                base = offsets[0]
                for i, doc_id in enumerate(doc_ids):
                    lo = offsets[i] - base
                    hi = offsets[i + 1] - base
                    tuples = list(
                        zip(kinds[lo:hi], texts[lo:hi],
                            refs[lo:hi], offs[lo:hi])
                    )
                    results.append(
                        (doc_id, _safe_classify_tuples(tuples, cfg))
                    )
            else:  # null spans arrays: keep the error-reject semantics
                for doc_id, spans in zip(doc_ids, spans_col.to_pylist()):
                    results.append(
                        (doc_id, _safe_classify_rows(spans, cfg))
                    )
            if not results:
                continue
            # column-wise Arrow assembly for the two known surfaces (byte-
            # identical to from_pylist over the row dicts — pinned by test);
            # any other row_fn keeps the generic row-dict path
            if batch_metrics:
                metrics = C.text_metrics_batch(
                    [res.text if res.ok else "" for _, res in results]
                )
                yield _full_record_batch(results, metrics, arrow_schema)
            elif row_fn is _result_row_slim:
                yield _slim_record_batch(results, arrow_schema)
            else:
                rows = [row_fn(doc_id, res) for doc_id, res in results]
                yield pa.RecordBatch.from_pylist(rows, schema=arrow_schema)

    return classify_batches


def _safe_classify_tuples(
    tuples: list[tuple], cfg: ExtractConfig
) -> C.DocResult:
    """_safe_classify for pre-built (kind, text, media_ref, offset) tuples
    (the flat-child Arrow decode path)."""
    try:
        return C.classify_document(tuples, cfg)
    except Exception as exc:  # noqa: BLE001 — intentional isolation boundary
        return C.DocResult(
            False, f"error:{type(exc).__name__}", [], "", {}, 0.0, {}
        )


def _safe_classify_rows(spans: list[dict], cfg: ExtractConfig) -> C.DocResult:
    """_safe_classify for plain list-of-dict spans (Arrow to_pylist form)."""
    if spans is None:
        return C.DocResult(False, "null_spans", [], "", {}, 0.0, {})
    try:
        return C.classify_document(
            [
                (s["kind"], s["text"], s["media_ref"], s["offset"])
                for s in spans
            ],
            cfg,
        )
    except Exception as exc:  # noqa: BLE001 — intentional isolation boundary
        return C.DocResult(
            False, f"error:{type(exc).__name__}", [], "", {}, 0.0, {}
        )


# ---------------------------------------------------------------------------
# salted mega-document path
# ---------------------------------------------------------------------------


def _element_key(kind: str) -> tuple:
    tag, _, rest = kind.partition(";")
    if tag in ("r", "hp", "fp", "xp"):
        p = ""
        for field in rest.split(";"):
            if field.startswith("p="):
                p = field[2:]
                break
        return (tag, p)
    if tag == "tc":
        t = ""
        for field in rest.split(";"):
            if field.startswith("t="):
                t = field[2:]
                break
        return (tag, t)
    return (tag, object())  # sdt / fig: every span its own element


def _chunk_spans(spans: list[tuple], target: int) -> list[list[tuple]]:
    """Split ordered spans into chunks, never crossing an element boundary."""
    ordered = sorted(spans, key=lambda s: s[3])
    chunks: list[list[tuple]] = []
    cur: list[tuple] = []
    cur_key: tuple | None = None
    for span in ordered:
        key = _element_key(span[0])
        if len(cur) >= target and key != cur_key:
            chunks.append(cur)
            cur = []
        cur.append(span)
        cur_key = key
    if cur:
        chunks.append(cur)
    return chunks


def _font_state_of(elements: list, cfg: ExtractConfig) -> str:
    h = C.FontHeuristics(cfg)
    for el in elements:
        if isinstance(el, C.BodyPar):
            h._evaluate_paragraph(el)
    return json.dumps(
        {
            "counts": h.font_size_count,
            "apps": h.font_size_appearances,
            "tracker": h.builtin_heading_tracker,
        }
    )


def _make_chunk_fn(cfg: ExtractConfig):
    def chunk_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                if len(spans) > cfg.max_doc_spans:
                    # oversized-doc gate (B1/C1 analog): reject without
                    # classifying — marker chunk, resolved at merge
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "chunk_idx": -1,
                            "spans": [],
                            "font_state": "REJ:too_many_spans",
                        }
                    )
                    continue
                try:
                    tuples = _spans_to_tuples(spans)
                    doc_rows = []
                    for idx, chunk in enumerate(
                        _chunk_spans(tuples, cfg.salt_chunk_spans)
                    ):
                        elements = C.parse_elements(chunk)
                        doc_rows.append(
                            {
                                "doc_id": doc_id,
                                "chunk_idx": idx,
                                "spans": _spans_to_rows(chunk),
                                "font_state": _font_state_of(elements, cfg),
                            }
                        )
                    rows.extend(doc_rows)
                except Exception as exc:  # noqa: BLE001 — fault isolation
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "chunk_idx": -1,
                            "spans": [],
                            "font_state": f"ERR:{type(exc).__name__}",
                        }
                    )
            if rows:
                yield pd.DataFrame(rows)

    return chunk_batches


def _merge_font_states(key, pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values("chunk_idx")  # insertion order must match 1-pass
    counts: dict[str, int] = {}
    apps: dict[str, int] = {}
    tracker: list = []
    for state_json in pdf["font_state"]:
        if state_json.startswith(("ERR:", "REJ:")):
            return pd.DataFrame(
                [{"doc_id": key[0], "font_state": state_json}]
            )
        st = json.loads(state_json)
        for k, v in st["counts"].items():
            counts[k] = counts.get(k, 0) + v
        for k, v in st["apps"].items():
            apps[k] = apps.get(k, 0) + v
        tracker.extend(st["tracker"])
    merged = json.dumps({"counts": counts, "apps": apps, "tracker": tracker})
    return pd.DataFrame([{"doc_id": key[0], "font_state": merged}])


def _heuristics_from_state(state_json: str, cfg: ExtractConfig) -> C.FontHeuristics:
    st = json.loads(state_json)
    h = C.FontHeuristics(cfg)
    h.merge_state(st["counts"], st["apps"], [tuple(t) for t in st["tracker"]])
    h.build()
    return h


def _make_chunk_classify_fn(cfg: ExtractConfig):
    def classify_chunks(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        from collections import OrderedDict

        # bounded per-task LRU: evict one entry at a time so a task
        # interleaving chunks of >64 mega-docs re-derives only the coldest
        # heuristics map, not all of them
        heuristics_cache: OrderedDict[str, C.FontHeuristics] = OrderedDict()
        for pdf in batches:
            rows = []
            for doc_id, chunk_idx, spans, state in zip(
                pdf["doc_id"], pdf["chunk_idx"], pdf["spans"], pdf["doc_font_state"]
            ):
                try:
                    if state.startswith(("ERR:", "REJ:")) or chunk_idx < 0:
                        raise _ChunkError(state)
                    h = heuristics_cache.get(doc_id)
                    if h is None:
                        h = _heuristics_from_state(state, cfg)
                        heuristics_cache[doc_id] = h
                        if len(heuristics_cache) > 64:
                            heuristics_cache.popitem(last=False)
                    else:
                        heuristics_cache.move_to_end(doc_id)
                    elements = C.parse_elements(_spans_to_tuples(spans))
                    out_spans, char_counter, counts, span_pages, pages = (
                        C.classify_elements(elements, h)
                    )
                except Exception as exc:  # noqa: BLE001 — fault isolation
                    marker = (
                        state if state.startswith(("ERR:", "REJ:"))
                        else f"ERR:{type(exc).__name__}"
                    )
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "chunk_idx": int(chunk_idx),
                            "spans": [],
                            "pages": [],
                            "text": "",
                            "counts": {},
                            "char_counter": marker,
                            "meta_json": "{}",
                        }
                    )
                    continue
                props: dict[str, str] = {}
                lang_tags: list[str] = []
                for el in elements:
                    if isinstance(el, C.Meta):
                        if el.key == "lang_tag":
                            lang_tags.append(el.value)
                        elif el.key:
                            props[el.key] = el.value
                rows.append(
                    {
                        "doc_id": doc_id,
                        "chunk_idx": int(chunk_idx),
                        "spans": [
                            {"kind": k, "text": t, "media_ref": m,
                             "offset": i, "page": p}
                            for i, ((k, t, m), p) in enumerate(
                                zip(out_spans, span_pages)
                            )
                        ],
                        "pages": _pages_to_rows(pages),
                        "text": C.serialize_text(elements),
                        "counts": {k: int(v) for k, v in counts.items()},
                        "char_counter": json.dumps(char_counter),
                        "meta_json": json.dumps(
                            {"props": props, "lang_tags": lang_tags}
                        ),
                    }
                )
            if rows:
                yield pd.DataFrame(rows)

    return classify_chunks


class _ChunkError(Exception):
    pass


def _make_merge_partials_fn(cfg: ExtractConfig, row_fn=_result_row):
    """``row_fn`` picks the output surface: ``_result_row`` (full
    EXTRACTED_SCHEMA) or ``_result_row_slim`` (span surface only) — the
    merge logic is identical, only the returned row (and therefore the
    Arrow return-leg volume) differs."""

    def merge_partials(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("chunk_idx")
        for marker in pdf["char_counter"]:
            if marker.startswith("ERR:"):
                res = C.DocResult(
                    False, f"error:{marker[4:]}", [], "", {}, 0.0, {}
                )
                return pd.DataFrame([row_fn(key[0], res)])
            if marker.startswith("REJ:"):
                res = C.DocResult(False, marker[4:], [], "", {}, 0.0, {})
                return pd.DataFrame([row_fn(key[0], res)])
        text = "\n".join(t for t in pdf["text"] if len(t) > 0)
        if len(text) < cfg.min_text_chars:
            res = C.DocResult(False, "min_text", [], text, {}, 0.0, {})
            return pd.DataFrame([row_fn(key[0], res)])
        spans: list[tuple] = []
        span_pages: list[int] = []
        counts: dict[str, int] = {}
        counter: dict[int, list[float]] = {}
        # page renumbering: chunk-local pages are 1-based; chunk i's page 1
        # continues the last page of chunk i-1 (a chunk boundary is never a
        # page break), so the running offset grows by (chunk_pages - 1)
        page_offset = 0
        merged_pages: dict[int, tuple[list[str], dict[str, int]]] = {}
        doc_props: dict[str, str] = {}
        lang_tags: set[str] = set()
        for chunk_spans, chunk_pages, chunk_counts, counter_json, meta_json in zip(
            pdf["spans"], pdf["pages"], pdf["counts"],
            pdf["char_counter"], pdf["meta_json"],
        ):
            for s in chunk_spans:
                spans.append((s["kind"], s["text"], s["media_ref"]))
                span_pages.append(int(s["page"]) + page_offset)
            for p in chunk_pages:
                g = int(p["page"]) + page_offset
                rec = merged_pages.setdefault(g, ([], {}))
                if p["text"]:
                    rec[0].append(p["text"])
                for k, v in (p["counts"] or {}).items():
                    rec[1][k] = rec[1].get(k, 0) + int(v)
            page_offset += max(len(chunk_pages) - 1, 0)
            for k, v in chunk_counts.items():
                counts[k] = counts.get(k, 0) + int(v)
            for ent_id, (b, h) in json.loads(counter_json).items():
                slot = counter.setdefault(int(ent_id), [0.0, 0.0])
                slot[0] += b
                slot[1] += h
            meta = json.loads(meta_json)
            doc_props.update(meta.get("props", {}))
            lang_tags.update(meta.get("lang_tags", []))
        quality, builtin_props = C.quality_from_counter(counter, counts)
        res = C.DocResult(
            True,
            None,
            [(k, t, m, i) for i, (k, t, m) in enumerate(spans)],
            text,
            counts,
            quality,
            builtin_props,
            span_pages=span_pages,
            pages=[
                (p, "\n".join(parts), pc)
                for p, (parts, pc) in sorted(merged_pages.items())
            ],
            props=doc_props,
            lang_tags=sorted(lang_tags),
        )
        return pd.DataFrame([row_fn(key[0], res)])

    return merge_partials


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


def ensure_parallelism(
    df: DataFrame, min_partitions: int | None = None
) -> DataFrame:
    """Guarantee the downstream Python stage is parallel — without touching
    ``df.rdd`` (converting the plan to an RDD just to read a partition count
    forces a full plan-to-RDD translation per call).

    File scans — the only input kind that exists at 100 TB — are already
    split by the session confs (``spark.sql.files.minPartitionNum`` ≥ cores,
    ``maxPartitionBytes``), and AQE coalesces over-splitting at runtime, so
    no dynamic check is needed: this is a no-op.  For non-file inputs
    (in-memory test frames, post-aggregation locals) pass ``min_partitions``
    to force an explicit round-robin repartition."""
    if min_partitions is not None:
        return df.repartition(min_partitions)
    return df


def extract(docs: DataFrame, cfg: ExtractConfig = DEFAULT_CONFIG) -> DataFrame:
    """Classify every document; returns the EXTRACTED_SCHEMA DataFrame.

    ``docs`` must have (doc_id string, spans array<struct<kind,text,
    media_ref,offset>>).
    """
    # Exactly TWO scans of the input: the small path and the salted path.
    # The oversized-document gate (too_many_spans, no Python classification)
    # is folded into the chunk UDF as a reject marker so it does not cost a
    # third scan.
    #
    # The split predicate prefers the MAINTAINED ``n_spans`` column (the
    # Iceberg-size-metadata analog, written by the table producer): a plain
    # column comparison pushes down to the parquet scan, so the mega-doc
    # branch is answered from row-group min/max statistics — it reads only
    # the handful of groups that can contain a mega-doc instead of decoding
    # the whole multi-GB spans column a second time (evidence:
    # BENCH/PRUNING.md).  Tables without the column fall back to
    # ``size(spans)``, which both branches must compute post-scan.
    if "n_spans" in docs.columns:
        # NULL n_spans (imperfect producer metadata) satisfies neither
        # predicate — route NULLs down the small path so no row is silently
        # dropped; IsNotNull on the big branch still pushes down.
        n_spans = F.col("n_spans")
        small = docs.filter(
            (n_spans <= F.lit(cfg.salt_threshold)) | n_spans.isNull()
        )
        big = docs.filter(n_spans > F.lit(cfg.salt_threshold))
    else:
        # size(NULL) is NULL (not -1) since Spark 3.0: a NULL spans array
        # would satisfy neither predicate and vanish — route it small,
        # like the maintained-column branch (kernel rejects it per-doc)
        n_spans = F.size("spans")
        small = docs.filter(
            (n_spans <= F.lit(cfg.salt_threshold)) | F.col("spans").isNull()
        )
        big = docs.filter(n_spans > F.lit(cfg.salt_threshold))

    # (A heavy-first two-branch scan — union the >8k-span docs first so
    # their tasks start in wave 1 — was A/B-measured at pinned 16 cores and
    # showed no gain over the plain scan: 256 splits / 16 waves already
    # absorb the ~110k-span stragglers.  Kept out to avoid an extra scan.)
    small_out = ensure_parallelism(small.select("doc_id", "spans")).mapInArrow(
        _make_classify_arrow_fn(cfg), schema=EXTRACTED_SCHEMA
    )

    big_out = _extract_salted(big, cfg)

    return small_out.unionByName(big_out)


def _extract_salted(
    big: DataFrame,
    cfg: ExtractConfig,
    row_fn=_result_row,
    out_schema: StructType = EXTRACTED_SCHEMA,
) -> DataFrame:
    """The salted mega-doc path: chunk → merge font state → broadcast join
    → classify → merge partials.  The groupBy keys are mega-doc ids only
    (few), so the shuffles here touch a tiny fraction of the data.  The
    chunk stage is persisted: it feeds both the font-state merge and the
    classify join, and would otherwise be recomputed per consumer.

    ``row_fn``/``out_schema`` choose the output surface (full vs slim) at
    the final merge, so slim consumers never pay the fat Arrow return leg
    even for mega-docs."""
    chunks = (
        ensure_parallelism(big.select("doc_id", "spans"))
        .mapInPandas(_make_chunk_fn(cfg), schema=_CHUNK_SCHEMA)
        # spread one doc's chunks across the cluster — this IS the salt
        .repartition("doc_id", "chunk_idx")
        .persist()
    )
    font_maps = (
        chunks.select("doc_id", "chunk_idx", "font_state")
        .groupBy("doc_id")
        .applyInPandas(_merge_font_states, schema=_FONTMAP_SCHEMA)
        .withColumnRenamed("font_state", "doc_font_state")
    )
    classified = (
        chunks.drop("font_state")
        .join(F.broadcast(font_maps), "doc_id")
        .mapInPandas(_make_chunk_classify_fn(cfg), schema=_PARTIAL_SCHEMA)
    )
    return classified.groupBy("doc_id").applyInPandas(
        _make_merge_partials_fn(cfg, row_fn), schema=out_schema
    )


def extract_slim(
    docs: DataFrame, cfg: ExtractConfig = DEFAULT_CONFIG
) -> DataFrame:
    """Classify every document, emitting ONLY the span-equality surface
    (EXTRACTED_SLIM_SCHEMA) — for pipelines that consume classified spans
    without the metadata columns.  Catalyst cannot prune columns through an
    opaque mapInArrow, so a caller that wants only spans must choose the
    slim function, not project afterward.  Same classifier, same salted
    mega-doc handling — the salted branch shares the full path's
    chunk/classify/merge pipeline but emits slim rows at the final merge,
    so mega-doc-heavy tables skip the fat return leg too."""
    if "n_spans" in docs.columns:
        n_spans = F.col("n_spans")
        small = docs.filter(
            (n_spans <= F.lit(cfg.salt_threshold)) | n_spans.isNull()
        )
        big = docs.filter(n_spans > F.lit(cfg.salt_threshold))
    else:
        # size(NULL) is NULL (not -1) since Spark 3.0: a NULL spans array
        # would satisfy neither predicate and vanish — route it small,
        # like the maintained-column branch (kernel rejects it per-doc)
        n_spans = F.size("spans")
        small = docs.filter(
            (n_spans <= F.lit(cfg.salt_threshold)) | F.col("spans").isNull()
        )
        big = docs.filter(n_spans > F.lit(cfg.salt_threshold))

    small_out = ensure_parallelism(small.select("doc_id", "spans")).mapInArrow(
        _make_classify_arrow_fn(
            cfg, row_fn=_result_row_slim, out_schema=EXTRACTED_SLIM_SCHEMA
        ),
        schema=EXTRACTED_SLIM_SCHEMA,
    )
    big_out = _extract_salted(
        big, cfg, row_fn=_result_row_slim, out_schema=EXTRACTED_SLIM_SCHEMA
    )
    return small_out.unionByName(big_out)


def spans_out(extracted: DataFrame) -> DataFrame:
    """The classified interleaved output table (the span-equality surface)."""
    return extracted.filter("ok").select("doc_id", "spans")


def doc_meta(extracted: DataFrame) -> DataFrame:
    return extracted.filter("ok").select(
        "doc_id",
        "text",
        "counts",
        "quality",
        "builtin_props",
        "pages",
        "props",
        "lang_tags",
        "num_words",
        "num_chars",
        "num_alph_chars",
        "num_numeric_chars",
        "num_alphnum_chars",
        "alnum_prop",
        "alph_to_num_ratio",
    )


def doc_meta_wide(extracted: DataFrame) -> DataFrame:
    """The reference's ORM-shaped metadata row: one ``num_<entity>`` column
    per taxonomy category (DocMetadataRecordDB, orm/models.py:49-129) plus
    quality + text metrics — materialized from the counts map with native
    element_at (no explode/pivot shuffle)."""
    from wordscape_spark import taxonomy as tax

    out = extracted.filter("ok")
    for name in tax.ENTITY_NAMES:
        out = out.withColumn(
            f"num_{name}",
            F.coalesce(F.element_at("counts", name), F.lit(0)).cast("long"),
        )
    return out.drop("spans", "pages", "counts", "builtin_props", "props",
                    "lang_tags", "text", "ok", "reject_reason")


def page_meta(extracted: DataFrame) -> DataFrame:
    """Per-page records — the PageMetadataRecordDB analog
    (orm/models.py:132-187): one row per physical page with page-level text
    and entity counts.  A plain explode: no shuffle, partitioning inherited
    from the extraction output."""
    return (
        extracted.filter("ok")
        .select("doc_id", F.explode("pages").alias("pg"))
        .select(
            "doc_id",
            F.col("pg.page").alias("page_number"),
            F.col("pg.text").alias("page_text"),
            F.col("pg.counts").alias("page_counts"),
        )
    )


def rejects(extracted: DataFrame) -> DataFrame:
    """Per-document fault isolation — the reference's failed_*.jsonl analog
    (annotator_process.py:769-778) as a side-output table."""
    return extracted.filter(~F.col("ok")).select("doc_id", "reject_reason")
