"""BPE training/encoding (operators/bpe.py): the distributed trainer
must match a pure-Python reference implementation (Sennrich-style
zip-count + left-to-right scan-merge) on corpora with ties, overlapping
pairs and empty docs; encoding must never merge across word boundaries;
the encode plan stays Exchange-free."""

from collections import Counter

import pytest

from wordscape_spark.operators import bpe
from wordscape_spark.operators import shaping


# ------------------------------------------------------ python reference


def _py_train(texts, k):
    words = Counter()
    for t in texts:
        for w in (t or "").lower().strip().split():
            words[w] += 1
    toks = {w: " " + "".join(c + " " for c in w) for w in words}
    merges = []
    for rank in range(1, k + 1):
        pairs = Counter()
        for w, cnt in words.items():
            parts = toks[w].split()
            for a, b in zip(parts, parts[1:]):
                pairs[(a, b)] += cnt
        if not pairs:
            break
        (lhs, rhs), freq = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, lhs, rhs, freq))
        for w in toks:
            toks[w] = toks[w].replace(f" {lhs} {rhs} ", f" {lhs}{rhs} ")
    return merges


def _py_encode(text, merges):
    ws = (text or "").lower().strip().split()
    s = " " + " ".join("".join(c + " " for c in w) for w in ws)
    for _, lhs, rhs, _ in merges:
        s = s.replace(f" {lhs} {rhs} ", f" {lhs}{rhs} ")
    return len(s.split())


CORPUS = [
    (0, "the cat sat on the mat"),
    (1, "the bat and the cat chat"),
    (2, "aaa aaaa aa a"),  # overlapping (a, a) pairs
    (3, "zz zz zz yy yy xx"),  # tie-break territory
    (4, ""),  # empty doc
    (5, "   spaced    out\ttabs  "),
    (6, "punct, punct. punct! (punct)"),
    (7, "the the the thethe"),
]
K = 6


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


@pytest.fixture(scope="module")
def merges(docs):
    return bpe.bpe_train(docs, n_merges=K)


def test_train_matches_python(merges):
    assert merges == _py_train([t for _, t in CORPUS], K)


def test_encode_matches_python(docs, merges):
    got = {
        r["doc_id"]: r["n_tokens"]
        for r in bpe.bpe_encode(docs, merges).collect()
    }
    want = {i: _py_encode(t, merges) for i, t in CORPUS}
    assert got == want


def test_no_cross_word_merges(spark):
    """'a b' as two words must never merge even when (a, b) is the top
    pair inside words — the double-space join blocks it."""
    rows = [(0, "ab ab ab"), (1, "a b")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = bpe.bpe_train(df, n_merges=1)
    assert merges[0][1:3] == ("a", "b")
    got = {r["doc_id"]: r["n_tokens"] for r in bpe.bpe_encode(df, merges).collect()}
    assert got == {0: 3, 1: 2}  # 'ab' x3 merged; 'a b' stays two tokens


def test_early_stop_no_pairs(spark):
    df = spark.createDataFrame(
        [(0, "a b c"), (1, "a a b")], "doc_id long, text string"
    )
    # singleton words have no adjacent pairs: training stops early
    assert bpe.bpe_train(df, n_merges=5) == []


def test_max_vocab_words_cap(docs):
    hist = bpe.word_histogram(docs, max_vocab_words=3)
    assert hist.count() == 3


def test_invalid_n_merges(docs):
    with pytest.raises(ValueError):
        bpe.bpe_train(docs, n_merges=0)


def test_encode_plan_no_exchange(docs, merges):
    plan = (
        bpe.bpe_encode(docs, merges)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


# ------------------------------------------------------------ data splits


def test_split_weights_validation():
    with pytest.raises(ValueError):
        shaping.split_expr("doc_id", {"train": 50, "val": 10}, "spark")


def test_split_deterministic_and_exhaustive(spark):
    df = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["split"] for r in shaping.assign_split(df).collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in shaping.assign_split(df.repartition(13)).collect()
    }
    assert a == b
    counts = Counter(a.values())
    assert set(counts) <= {"train", "val", "test"}
    assert counts["train"] > 900  # 98% nominal


def test_train_oracle_fuzz_vs_python():
    """The generated merge-round CTEs (the oracle's semantic core: pair
    zip, tie-break, left-to-right literal replace) must match the pure-
    Python reference on random adversarial corpora — tiny alphabets
    force count ties and overlapping pairs.  DuckDB-only: fast, and the
    Spark<->oracle leg is covered by the sf0.01 parity gate."""
    import random

    import duckdb

    rng = random.Random(0xB9E)
    for trial in range(30):
        n_docs = rng.randint(1, 12)
        corpus = []
        for i in range(n_docs):
            words = [
                "".join(
                    rng.choice("aab") for _ in range(rng.randint(1, 6))
                )
                for _ in range(rng.randint(0, 10))
            ]
            corpus.append((i, " ".join(words)))
        k = rng.randint(1, 5)
        want = _py_train([t for _, t in corpus], k)
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE documents(doc_id BIGINT, text VARCHAR)"
        )
        con.executemany("INSERT INTO documents VALUES (?, ?)", corpus)
        ctes, union = bpe.train_ctes("documents", k)
        got = [
            tuple(r)
            for r in con.execute(
                f"WITH {ctes} SELECT rank, lhs, rhs, freq FROM ({union})"
                " ORDER BY rank"
            ).fetchall()
        ]
        # the SQL chain has no early stop: rounds past pair exhaustion
        # emit no row (LIMIT 1 over empty), so got is want's prefix-equal
        assert got == want, (trial, corpus, k)
