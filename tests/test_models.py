"""File-backed model artifacts (wordscape_spark/models.py): the injection
seams driven by REAL files — a bundled KenLM-format .arpa and a serialized
trigram table — with the ARPA backoff math pinned against HAND-COMPUTED
literals (no repo code produced the expected numbers)."""

import math

import pyspark.sql.functions as F
import pytest

from wordscape_spark import models as M
from wordscape_spark.operators import langid_trigram as L
from wordscape_spark.operators.perplexity import with_perplexity


def test_arpa_perplexity_matches_hand_computed_literals():
    """Every number below is read straight off resources/tiny.arpa by hand:
    in-vocab sentence uses only bigram entries; the OOV sentence exercises
    the backoff recursion (backoff weight + unigram, and the
    unseen-context-means-no-penalty rule)."""
    m = M.ArpaModel.load(M.TINY_ARPA_PATH)
    # "the cat sat on the mat": <s> the | the cat | cat sat | sat on |
    # on the | the mat | mat </s>  — all present as bigrams
    total = -(0.3010 + 0.4771 + 0.3010 + 0.4771 + 0.3010 + 0.60206 + 0.4771)
    expected = round(10 ** (-total / 7), 6)
    assert m.perplexity("the cat sat on the mat") == expected

    # "the dog sat": p(the|<s>) = -0.3010 (bigram);
    # p(dog|the) = backoff(the) + p(<unk>) = -0.30103 + -1.0;
    # p(sat|dog) = p(sat) = -0.9031 (context 'dog' unseen → no penalty);
    # p(</s>|sat) = -0.60206 (bigram)
    total2 = -(0.3010 + (0.30103 + 1.0) + 0.9031 + 0.60206)
    expected2 = round(10 ** (-total2 / 4), 6)
    assert m.perplexity("the dog sat") == expected2

    assert m.perplexity("") == 0.0


def test_arpa_reader_parses_backoffs_and_orders():
    m = M.ArpaModel.load(M.TINY_ARPA_PATH)
    assert m.order == 2
    assert m.logprob[("the",)] == -0.60206
    assert m.backoff[("the",)] == -0.30103
    assert m.logprob[("<s>", "the")] == -0.3010
    assert ("<s>", "the") not in m.backoff


def test_file_trigram_classifier_identical_to_in_memory():
    fc = M.file_trigram_classifier()
    for text in [
        "", "the quick brown fox jumps", "der schnelle braune fuchs",
        "le renard brun rapide", "abc",
    ]:
        assert fc(text) == L.classify_text(text), repr(text)


def test_spark_roundtrip_with_file_backends(spark):
    """The partial-over-module-function scorers must pickle to executors,
    lazy-load the artifact there, and reproduce driver-side scoring."""
    rows = [
        ("d1", "the cat sat on the mat", "en"),
        ("d2", "the dog sat", "en"),
        ("d3", "der schnelle braune fuchs springt", "de"),
        ("d4", "", "en"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string, lang string")

    scored = {
        r["doc_id"]: r["perplexity"]
        for r in with_perplexity(
            df, scorer=M.file_perplexity_scorer()
        ).collect()
    }
    arpa = M.ArpaModel.load(M.TINY_ARPA_PATH)
    assert scored["d1"] == arpa.perplexity("the cat sat on the mat")
    assert scored["d2"] == arpa.perplexity("the dog sat")
    assert scored["d3"] == 0.0  # language-matched application
    assert scored["d4"] == 0.0

    lid = {
        r["doc_id"]: r["languages_topk"]
        for r in L.with_trigram_langid(
            df, model=M.file_trigram_classifier()
        ).collect()
    }
    for doc_id, text, _ in rows:
        assert lid[doc_id] == L.serialize_topk(L.classify_text(text)), doc_id
