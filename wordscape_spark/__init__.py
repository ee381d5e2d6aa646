"""wordscape_spark — a from-scratch PySpark-native document-understanding
extraction engine with the query/data-processing capabilities of
DS3Lab/WordScape (reference at /root/reference, studied for semantics only).

The engine operates over an interleaved-document table

    doc_id: string
    spans:  array<struct<kind: string, text: string, media_ref: string, offset: int>>

where input ``kind`` carries the raw structural signal of each span (see
``wordscape_spark.signal``) and the engine emits the classified, ordered span
sequence using WordScape's 31-category entity taxonomy, plus document metadata,
quality scores, language ID, dedup keys and quality-gate filters — all as
idiomatic Spark DataFrame operators (Arrow-vectorized grouped-map UDFs for the
per-document classifier, pure column expressions everywhere else).
"""

__version__ = "0.1.0"
