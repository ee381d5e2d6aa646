"""Multilingual temperature sampling (operators/mixing.py): rates must
match an independent pure-Python re-derivation, the sample must be
exactly the md5-uniform-under-rate set, and the corpus must not
shuffle (broadcast join + filter only)."""

import hashlib
import math

import pytest

from wordscape_spark.operators import mixing

DOCS = (
    [(i, f"en doc {i}", "en") for i in range(40)]
    + [(100 + i, f"de doc {i}", "de") for i in range(8)]
    + [(200 + i, f"fr doc {i}", "fr") for i in range(2)]
)
ALPHA, FRAC = 0.3, 0.5


def _py_rates():
    n = {}
    for _, _, lang in DOCS:
        n[lang] = n.get(lang, 0) + 1
    total = sum(n.values())
    qd = sum((c / total) ** ALPHA for c in n.values())
    return {
        lang: min(1.0, FRAC * total * ((c / total) ** ALPHA / qd) / c)
        for lang, c in n.items()
    }


def _u(doc_id):
    return (
        int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) + 0.5
    ) / 4294967296.0


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        DOCS, "doc_id long, text string, lang string"
    )


def test_rates_match_python(corpus):
    got = {
        r["lang"]: (r["n_docs"], r["rate"])
        for r in mixing.language_sampling_rates(
            corpus, alpha=ALPHA, target_frac=FRAC
        ).collect()
    }
    want = _py_rates()
    assert set(got) == set(want)
    for lang, rate in want.items():
        assert got[lang][1] == pytest.approx(rate, abs=1e-12), lang


def test_low_resource_languages_upsampled(corpus):
    """alpha < 1 must give the tail languages a HIGHER keep rate than
    the head language (the entire point of temperature mixing)."""
    rates = _py_rates()
    assert rates["fr"] > rates["de"] > rates["en"]
    # fr is so small the cap binds
    assert rates["fr"] == 1.0


def test_sample_is_exact_uniform_under_rate_set(corpus):
    rates = _py_rates()
    want = sorted(
        doc_id for doc_id, _, lang in DOCS if _u(doc_id) < rates[lang]
    )
    got = sorted(
        r["doc_id"]
        for r in mixing.temperature_sample(
            corpus, alpha=ALPHA, target_frac=FRAC
        ).collect()
    )
    assert got == want
    # and it kept the payload columns minus the join internals
    cols = mixing.temperature_sample(corpus).columns
    assert cols == ["doc_id", "text", "lang"]


def test_no_corpus_shuffle(corpus):
    """The only exchanges allowed are for the ≤|languages|-row rate
    table (its groupBy); the corpus side must reach the join without
    an Exchange above its scan."""
    plan = (
        mixing.temperature_sample(corpus)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
