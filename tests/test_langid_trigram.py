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
