import pytest

from wordscape_spark.operators import langid_trigram as L


def test_classify_text_separates_languages():
    en = L.classify_text("the report of the market and the annual growth")
    de = L.classify_text("der bericht und die nicht von dem mit für das ist")
    fr = L.classify_text("le rapport dans les pour que cette avec nous vous")
    assert max(en, key=en.get) == "__label__en"
    assert max(de, key=de.get) == "__label__de"
    assert max(fr, key=fr.get) == "__label__fr"
    assert abs(sum(en.values()) - 1.0) < 1e-3


def test_empty_is_unknown():
    assert L.classify_text("") == {L.UNKNOWN: 1.0}
    assert L.classify_text("  ") == {L.UNKNOWN: 1.0}


def test_spark_matches_python(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(30)
    got = L.with_trigram_langid(docs).select("doc_id", "text", "languages",
                                             "top_lang").collect()
    for r in got:
        expected = L.classify_text(r["text"])
        assert dict(r["languages"]) == pytest.approx(expected)
        assert r["top_lang"] == max(
            expected.items(), key=lambda kv: (kv[1], kv[0])
        )[0]


def test_train_then_serve_roundtrip(spark):
    """Distributed training feeds the serving seam: fit the trigram table
    on a cleanly-labeled corpus (one doc per vocabulary language), build
    a classify_with_tables model from the collected counts, and the
    model must identify each language from held-out samples of its own
    vocabulary.  (The synthetic documents table mixes languages within a
    document, so it tests the machinery poorly — label quality is the
    stopword scorer's concern, q `langid`.)"""
    from wordscape_spark import models
    from wordscape_spark.datagen import VOCAB

    rows = [
        (lang_name, " ".join(words * 3))
        for lang_name, words in VOCAB.items()
    ]
    df = spark.createDataFrame(rows, "top_lang string, text string")
    counts = L.train_trigram_counts(df, k=256).collect()
    assert all(r["rank"] <= 256 for r in counts)
    tables = models.tables_from_counts(counts)
    assert set(tables) == set(VOCAB)
    for lang_name, words in VOCAB.items():
        sample = " ".join(words[:12])
        got = L.classify_with_tables(sample, tables, 1)
        assert got == {f"__label__{lang_name}": max(got.values())}, (
            lang_name, got)


def test_train_trigram_deterministic_ties(spark):
    rows = [("xx", "ab ab cd cd")]  # "ab " and "cd " families tie
    df = spark.createDataFrame(rows, "top_lang string, text string")
    a = L.train_trigram_counts(df, k=5).collect()
    b = L.train_trigram_counts(df.repartition(7), k=5).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # ties on n resolve by trigram ascending
    ranked = sorted(a, key=lambda r: r["rank"])
    for i in range(len(ranked) - 1):
        assert (ranked[i]["n"], ranked[i + 1]["trigram"]) >= (
            ranked[i + 1]["n"], ranked[i]["trigram"])


def test_train_trigram_empty_text_emits_no_grams(spark):
    """Spark's sequence(1, 0) is the DESCENDING [1, 0] — ungated, an
    empty-normalized doc (length 2 after padding) emitted two bogus '  '
    trigrams the oracle's empty range(1,1) never saw (ADVICE r5)."""
    rows = [("xx", ""), ("xx", "   "), ("xx", "\x01\x02")]
    df = spark.createDataFrame(rows, "top_lang string, text string")
    assert L.train_trigram_counts(df, k=8).collect() == []
    # and mixed with real text, only the real doc contributes
    df2 = spark.createDataFrame(
        rows + [("xx", "abc")], "top_lang string, text string"
    )
    grams = {r["trigram"] for r in L.train_trigram_counts(df2, k=8).collect()}
    assert grams == {" ab", "abc", "bc "}
