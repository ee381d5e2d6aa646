"""File-backed model artifacts for the injection seams.

Round 3 proved the fastText/KenLM swap points (`with_trigram_langid(model=…)`,
`with_perplexity(scorer=…)`) with in-closure fakes; this module exercises them
with REAL file artifacts so the per-executor lazy-load path is driven by a
file on disk, not a pickled closure:

* ``ArpaModel`` — a pure-Python reader for the standard ARPA n-gram format
  KenLM consumes (``\\data\\`` header, per-order ``\\N-grams:`` sections of
  ``logprob<TAB>ngram[<TAB>backoff]``), scoring with the standard Katz
  backoff recursion and the reference's perplexity formula
  ``10^(−Σ log10 p / N)`` (/root/reference/app/src/quality/perplexity.py:42-55,
  which delegates the same math to kenlm.Model.score per line).  A tiny
  bundled bigram model (``resources/tiny.arpa``) stands in for the
  reference's 5-gram .arpa/.bin artifacts (perplexity.py:13-27).
* a SERIALIZED trigram language-ID table (json on disk, written by
  ``ensure_trigram_file``) loaded per executor through the same scoring math
  as the in-memory model — the file-path analog of loading ``lid.176.ftz``
  once per worker (language_detection/inference.py:8-27).

Both loaders cache per (process, path): executors load each artifact once,
exactly like the reference's module-level lazy model singletons.  The
returned scorers are ``functools.partial`` over module-level functions, so
they pickle by reference (no closure shipping).
"""

from __future__ import annotations

import functools
import json
import math
import pathlib

TINY_ARPA_PATH = str(pathlib.Path(__file__).parent / "resources" / "tiny.arpa")

_MODELS_DIR = pathlib.Path(__file__).resolve().parent.parent / "data" / "models"


# ---------------------------------------------------------------------------
# ARPA (KenLM text format) reader
# ---------------------------------------------------------------------------


class ArpaModel:
    """Standard ARPA n-gram model: log10 probs + backoff weights per order.

    Scoring follows the usual backoff recursion KenLM implements natively:
    use the longest matching n-gram; otherwise add the context's backoff
    weight (0 if the context itself is unseen) and recurse on the shortened
    context; unigram OOVs fall to ``<unk>``.
    """

    def __init__(self, logprob: dict[tuple, float], backoff: dict[tuple, float],
                 order: int):
        self.logprob = logprob
        self.backoff = backoff
        self.order = order

    @classmethod
    def load(cls, path: str) -> "ArpaModel":
        logprob: dict[tuple, float] = {}
        backoff: dict[tuple, float] = {}
        order = 0
        section = 0
        with open(path, encoding="utf-8") as f:
            for raw in f:
                line = raw.strip()
                if not line or line.startswith("\\data\\") or line.startswith("ngram "):
                    continue
                if line == "\\end\\":
                    break
                if line.endswith("-grams:") and line.startswith("\\"):
                    section = int(line[1:line.index("-")])
                    order = max(order, section)
                    continue
                if section == 0:
                    continue
                parts = line.split("\t")
                lp = float(parts[0])
                gram = tuple(parts[1].split(" "))
                logprob[gram] = lp
                if len(parts) > 2:
                    backoff[gram] = float(parts[2])
        if order == 0:
            raise ValueError(f"not an ARPA file: {path}")
        return cls(logprob, backoff, order)

    def word_logprob(self, word: str, context: tuple) -> float:
        context = context[-(self.order - 1):] if self.order > 1 else ()
        gram = context + (word,)
        lp = self.logprob.get(gram)
        if lp is not None:
            return lp
        if not context:
            return self.logprob.get(("<unk>",), -7.0)
        # unseen n-gram: apply the context's backoff weight (0 when the
        # context itself is unseen) and recurse on the shortened context
        bo = self.backoff.get(context, 0.0)
        return bo + self.word_logprob(word, context[1:])

    def perplexity(self, text: str) -> float:
        """Reference formula over whitespace tokens + </s>, <s> context
        (quality/perplexity.py:42-55)."""
        tokens = (text or "").lower().split()
        if not tokens:
            return 0.0
        context: tuple = ("<s>",)
        total = 0.0
        for tok in tokens + ["</s>"]:
            total += self.word_logprob(tok, context)
            context = (context + (tok,))[-(self.order - 1):]
        n = len(tokens) + 1
        return round(10 ** (-total / n), 6)


_ARPA_CACHE: dict[str, ArpaModel] = {}


def _arpa_model(path: str) -> ArpaModel:
    m = _ARPA_CACHE.get(path)
    if m is None:
        m = ArpaModel.load(path)
        _ARPA_CACHE[path] = m
    return m


def _arpa_score(text: str, lang: str, path: str, match_lang: str) -> float:
    """(text, lang) -> perplexity; scored only for the model's language,
    like the reference's language-matched model application
    (pp_compute_perplexity.py:27-43)."""
    if lang != match_lang:
        return 0.0
    return _arpa_model(path).perplexity(text)


def file_perplexity_scorer(path: str = TINY_ARPA_PATH, match_lang: str = "en"):
    """A picklable KenLM-shaped scorer for ``with_perplexity(scorer=…)``
    backed by an .arpa file lazy-loaded once per executor process."""
    return functools.partial(_arpa_score, path=path, match_lang=match_lang)


# ---------------------------------------------------------------------------
# serialized trigram language-ID table
# ---------------------------------------------------------------------------


def save_trigram_model(path: str) -> None:
    """Serialize the trigram tables to json (floats round-trip exactly via
    repr, so the file-backed scorer is byte-identical to the in-memory one)."""
    from wordscape_spark.operators.langid_trigram import _model

    p = pathlib.Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    tmp = p.with_suffix(".tmp")
    tmp.write_text(json.dumps(_model()))
    tmp.replace(p)


def ensure_trigram_file() -> str:
    """Deterministic on-disk trigram artifact (regenerated when absent)."""
    path = _MODELS_DIR / "trigram_v1.json"
    if not path.exists():
        save_trigram_model(str(path))
    return str(path)


_TRIGRAM_CACHE: dict[str, dict] = {}


def _trigram_tables(path: str) -> dict:
    t = _TRIGRAM_CACHE.get(path)
    if t is None:
        t = json.loads(pathlib.Path(path).read_text())
        _TRIGRAM_CACHE[path] = t
    return t


def _file_trigram_classify(text: str, path: str, top_k: int) -> dict[str, float]:
    from wordscape_spark.operators import langid_trigram as L

    return L.classify_with_tables(text, _trigram_tables(path), top_k)


def file_trigram_classifier(path: str | None = None, top_k: int | None = None):
    """A picklable fastText-shaped classifier for
    ``with_trigram_langid(model=…)`` backed by a serialized table file
    lazy-loaded once per executor process."""
    from wordscape_spark.config import DEFAULT_CONFIG

    if path is None:
        path = ensure_trigram_file()
    if top_k is None:
        top_k = DEFAULT_CONFIG.top_k_languages
    return functools.partial(_file_trigram_classify, path=path, top_k=top_k)


def tables_from_counts(rows) -> dict[str, dict[str, float]]:
    """Turn the collected output of
    ``langid_trigram.train_trigram_counts`` (rows with lang / trigram /
    n) into the ``classify_with_tables`` log-prob table, with the same
    add-one smoothing as the import-time model — the train → serve
    bridge: fit the table distributedly, collect the (bounded,
    k-per-language) counts, classify with it through the existing
    ``with_trigram_langid(model=...)`` seam."""
    per: dict[str, dict[str, int]] = {}
    for r in rows:
        per.setdefault(r["lang"], {})[r["trigram"]] = int(r["n"])
    tables: dict[str, dict[str, float]] = {}
    for lang, grams in per.items():
        total = sum(grams.values())
        v = len(grams) + 1
        t = {
            g: math.log10((c + 1) / (total + v)) for g, c in grams.items()
        }
        t["__default__"] = math.log10(1 / (total + v))
        tables[lang] = t
    return tables
