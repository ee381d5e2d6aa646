"""Real-model adapter seams (adapters.py): conversion logic driven through
stubbed backends driver-side (the sandbox has neither fasttext nor kenlm),
plus skip-if-absent end-to-end tests for hosts that DO have the deps."""

import sys
import types

import pytest

from wordscape_spark import adapters as A


@pytest.fixture
def fake_fasttext(monkeypatch):
    class _Model:
        def predict(self, text, k):
            assert "\n" not in text  # fastText rejects multi-line input
            labels = ("__label__en", "__label__de", "__label__fr")[:k]
            probs = (0.91234567, 0.05, 0.05)[:k]
            return labels, probs

    mod = types.ModuleType("fasttext")
    mod.load_model = lambda path: _Model()
    monkeypatch.setitem(sys.modules, "fasttext", mod)
    A._FASTTEXT_CACHE.clear()
    yield mod
    A._FASTTEXT_CACHE.clear()


@pytest.fixture
def fake_kenlm(monkeypatch):
    class _Model:
        def __init__(self, path):
            self.path = path

        def perplexity(self, text):
            return 123.4567891

    mod = types.ModuleType("kenlm")
    mod.Model = _Model
    monkeypatch.setitem(sys.modules, "kenlm", mod)
    A._KENLM_CACHE.clear()
    yield mod
    A._KENLM_CACHE.clear()


def test_fasttext_adapter_contract(fake_fasttext):
    fn = A.fasttext_classifier("/models/lid.176.ftz", top_k=3)
    out = fn("hello\nworld")
    # sorted by (-conf, label), 6dp rounding, ties broken lexicographically
    assert list(out) == ["__label__en", "__label__de", "__label__fr"]
    assert out["__label__en"] == 0.912346
    assert out["__label__de"] == 0.05


def test_fasttext_adapter_empty_text(fake_fasttext):
    fn = A.fasttext_classifier("/models/lid.176.ftz", top_k=3)
    assert fn("") == {"__label__unknown": 1.0}
    assert fn(None) == {"__label__unknown": 1.0}


def test_fasttext_adapter_caches_per_path(fake_fasttext):
    fn = A.fasttext_classifier("/models/lid.176.ftz", top_k=1)
    fn("a b c")
    m1 = A._FASTTEXT_CACHE["/models/lid.176.ftz"]
    fn("d e f")
    assert A._FASTTEXT_CACHE["/models/lid.176.ftz"] is m1


def test_kenlm_adapter_contract(fake_kenlm):
    fn = A.kenlm_scorer("/models/en.arpa", match_lang="en")
    assert fn("some text", "en") == 123.456789  # 6dp rounding
    assert fn("some text", "de") == 0.0  # language-matched scoring only
    assert fn("", "en") == 0.0


def test_adapters_pickle_by_reference(fake_fasttext, fake_kenlm):
    """The partials must pickle WITHOUT the model object (the whole point:
    executors load the file themselves)."""
    import pickle

    ft = pickle.loads(pickle.dumps(A.fasttext_classifier("/m.ftz", top_k=2)))
    assert list(ft("guten tag welt")) == ["__label__en", "__label__de"]
    kl = pickle.loads(pickle.dumps(A.kenlm_scorer("/m.arpa")))
    assert kl("x y", "en") == 123.456789


def test_missing_backend_raises_actionable_importerror(monkeypatch):
    monkeypatch.setitem(sys.modules, "fasttext", None)
    monkeypatch.setitem(sys.modules, "kenlm", None)
    A._FASTTEXT_CACHE.clear()
    A._KENLM_CACHE.clear()
    with pytest.raises(ImportError, match="fasttext-wheel"):
        A.fasttext_classifier("/m.ftz", top_k=1)("hi there")
    with pytest.raises(ImportError, match="pip install kenlm"):
        A.kenlm_scorer("/m.arpa")("hi there", "en")


# --- end-to-end through the Spark seams, only where the real deps exist ---


def test_fasttext_seam_end_to_end(spark, tmp_path):
    fasttext = pytest.importorskip("fasttext")
    import urllib.request

    model_path = tmp_path / "lid.176.ftz"
    try:
        urllib.request.urlretrieve(
            "https://dl.fbaipublicfiles.com/fasttext/supervised-models/"
            "lid.176.ftz",
            model_path,
        )
    except OSError:
        pytest.skip("no network for lid.176.ftz")
    from wordscape_spark.operators.langid_trigram import with_trigram_langid

    df = spark.createDataFrame(
        [("d1", "the quick brown fox jumps over the lazy dog")],
        "doc_id string, text string",
    )
    out = with_trigram_langid(
        df, model=A.fasttext_classifier(str(model_path))
    ).first()
    assert out["top_lang"] == "__label__en"


def test_kenlm_seam_end_to_end(spark):
    kenlm = pytest.importorskip("kenlm")
    from wordscape_spark.models import TINY_ARPA_PATH
    from wordscape_spark.operators.perplexity import with_perplexity

    df = spark.createDataFrame(
        [("d1", "the cat sat", "en")], "doc_id string, text string, lang string"
    )
    out = with_perplexity(
        df, scorer=A.kenlm_scorer(TINY_ARPA_PATH)
    ).first()
    assert out["perplexity"] > 0


# --- oletools OleID maldoc indicators -------------------------------------


@pytest.fixture
def fake_oletools(monkeypatch):
    class _Ind:
        def __init__(self, id, value, risk):
            self.id, self.value, self.risk = id, value, risk

    class _OleID:
        def __init__(self, f):
            self._head = f.read(4)

        def check(self):
            if self._head == b"BOOM":
                raise ValueError("not an OLE file")
            return [
                _Ind("vba", True, "HIGH"),
                _Ind("encrypted", True, "info"),   # info risk -> not raised
                _Ind("flash", False, "HIGH"),      # falsy value -> not raised
                _Ind("unrelated", True, "HIGH"),   # not in names -> ignored
            ]

    oleid_mod = types.ModuleType("oletools.oleid")
    oleid_mod.OleID = _OleID
    pkg = types.ModuleType("oletools")
    pkg.oleid = oleid_mod
    monkeypatch.setitem(sys.modules, "oletools", pkg)
    monkeypatch.setitem(sys.modules, "oletools.oleid", oleid_mod)
    yield pkg


def test_oleid_adapter_contract(fake_oletools):
    fn = A.oleid_indicators(("vba", "encrypted", "flash"))
    out = fn(b"\xd0\xcf\x11\xe0 fake ole body")
    assert out == {"vba": True, "encrypted": False, "flash": False}


def test_oleid_adapter_fails_closed_on_unparseable(fake_oletools):
    fn = A.oleid_indicators(("vba", "encrypted"))
    assert fn(b"BOOM not ole") == {"vba": True, "encrypted": True}


def test_oleid_adapter_pickles_by_reference(fake_oletools):
    import pickle

    fn = pickle.loads(pickle.dumps(A.oleid_indicators(("vba",))))
    assert fn(b"\xd0\xcf\x11\xe0 x") == {"vba": True}


def test_oleid_missing_backend_raises_actionable_importerror(monkeypatch):
    monkeypatch.setitem(sys.modules, "oletools", None)
    with pytest.raises(ImportError, match="pip install .?oletools"):
        A.oleid_indicators(("vba",))(b"\xd0\xcf\x11\xe0")


def _fake_indicator_backend(content: bytes) -> dict:
    # NB: defined at test-module level only for the requires-names test
    # below (driver-side); the Spark seam test uses a local def so
    # cloudpickle serializes it by VALUE — executors cannot import the
    # test module.
    return {"vba": b"VBA" in content, "xlm": b"XLM" in content}


def test_maldoc_injection_seam_end_to_end(spark):
    from wordscape_spark.operators import maldoc as MD

    def fake_backend(content: bytes) -> dict:
        return {"vba": b"VBA" in content, "xlm": b"XLM" in content}

    media = spark.createDataFrame(
        [("d1", "m1", b"clean bytes"), ("d2", "m2", b"has VBA macro"),
         ("d3", "m3", b"has XLM sheet")],
        "doc_id string, media_ref string, content binary",
    )
    out = MD.maldoc_check(
        media,
        indicators=fake_backend,
        indicator_names=["vba", "xlm"],
        fatal=frozenset({"vba"}),  # xlm flagged but not fatal
    ).orderBy("doc_id")
    rows = out.collect()
    assert [r["malicious"] for r in rows] == [False, True, False]
    assert [r["ind_xlm"] for r in rows] == [False, False, True]
    assert out.columns == ["doc_id", "media_ref", "ind_vba", "ind_xlm",
                           "malicious"]


def test_maldoc_injection_requires_names(spark):
    from wordscape_spark.operators import maldoc as MD

    media = spark.createDataFrame(
        [("d1", "m1", b"x")], "doc_id string, media_ref string, content binary"
    )
    with pytest.raises(ValueError, match="indicator_names"):
        MD.maldoc_check(media, indicators=_fake_indicator_backend)


# --- PIL image decode (features + resize) ----------------------------------


@pytest.fixture
def fake_pil(monkeypatch):
    """Stub PIL: content b'IMG:<w>x<h>:<payload>' decodes to an image whose
    grayscale pixels are the payload bytes cycled to w*h; anything else
    raises.  Bomb-gate proof: touching pixel data on a bomb-sized image
    raises, so the adapter must gate on .size alone."""

    class _Img:
        def __init__(self, w, h, payload):
            self.size = (w, h)
            self._payload = payload

        def _pixels(self, n):
            if self.size[0] * self.size[1] > 10_000_000:
                raise AssertionError("pixel access on bomb-sized image")
            p = self._payload or b"\x00"
            return list((p * (n // len(p) + 1))[:n])

        def convert(self, mode):
            return self

        def getdata(self):
            return self._pixels(self.size[0] * self.size[1])

        def resize(self, wh):
            out = _Img(wh[0], wh[1], self._payload)
            return out

        def save(self, buf, format):
            buf.write(
                f"RESIZED:{self.size[0]}x{self.size[1]}:{format}".encode()
            )

    def _open(f):
        data = f.read()
        if not data.startswith(b"IMG:"):
            raise OSError("cannot identify image file")
        head, _, payload = data[4:].partition(b":")
        w, h = head.split(b"x")
        return _Img(int(w), int(h), payload)

    image_mod = types.ModuleType("PIL.Image")
    image_mod.open = _open
    pkg = types.ModuleType("PIL")
    pkg.Image = image_mod
    monkeypatch.setitem(sys.modules, "PIL", pkg)
    monkeypatch.setitem(sys.modules, "PIL.Image", image_mod)
    yield pkg


def test_pil_feature_decoder_contract(fake_pil):
    fn = A.pil_feature_decoder()
    out = fn(b"IMG:4x2:\x10\x20")
    assert out["n_bytes"] == len(b"IMG:4x2:\x10\x20")
    # mean over the 8 cycled grayscale pixels: (0x10+0x20)/2
    assert out["byte_mean"] == 24.0
    assert len(out["phash"]) == 16
    assert out["phash"] not in ("bomb", "decode_error")
    int(out["phash"], 16)  # valid 64-bit hex


def test_pil_feature_decoder_bomb_gate_is_header_only(fake_pil):
    """Oversized pixel count must be rejected from the HEADER: the stub
    raises on any pixel access for bomb-sized images (zip_bomb.py:63-131
    behavior — reject before decompressing)."""
    fn = A.pil_feature_decoder(max_pixels=1_000_000)
    out = fn(b"IMG:100000x100000:\x10")
    assert out["phash"] == "bomb" and out["byte_mean"] == -1.0


def test_pil_feature_decoder_fails_closed(fake_pil):
    out = A.pil_feature_decoder()(b"\x89PNG not really")
    assert out["phash"] == "decode_error" and out["byte_mean"] == -1.0
    assert out["n_bytes"] == 15


def test_pil_resampler_contract(fake_pil):
    fn = A.pil_resampler(fmt="PNG")
    assert fn(b"IMG:64x32:\x10", 16, 8) == b"RESIZED:16x8:PNG"
    # bomb and undecodable inputs pass through byte-identically (the
    # operator's no-resampler default), never raise
    bomb = A.pil_resampler(max_pixels=100)(b"IMG:1000x1000:\x10", 8, 8)
    assert bomb == b"IMG:1000x1000:\x10"
    assert A.pil_resampler()(b"junk", 8, 8) == b"junk"


def test_pil_decoder_drives_extract_features_batch_loop(fake_pil):
    """The seam contract the operator relies on: decoder output keys match
    FEATURE_SCHEMA's feature fields exactly (driver-side check — the stub
    only exists in this process; real-cluster use ships Pillow)."""
    from wordscape_spark.operators.multimodal import FEATURE_SCHEMA

    out = A.pil_feature_decoder()(b"IMG:4x2:\x10\x20")
    feature_fields = {
        f.name for f in FEATURE_SCHEMA.fields
        if f.name not in ("doc_id", "media_ref")
    }
    assert set(out) == feature_fields


def test_pil_seam_end_to_end(spark):
    pytest.importorskip("PIL")
    from wordscape_spark.operators.multimodal import (
        extract_features,
        resize_media,
    )

    import io
    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (32, 16), (100, 150, 200)).save(buf, format="PNG")
    png = buf.getvalue()
    df = spark.createDataFrame(
        [("d1", "m1", bytearray(png), "png", 32, 16)],
        "doc_id string, media_ref string, content binary, fmt string, "
        "width int, height int",
    )
    feats = extract_features(df, decoder=A.pil_feature_decoder()).first()
    assert feats["phash"] not in ("bomb", "decode_error")
    resized = resize_media(df, max_dim=8, resampler=A.pil_resampler()).first()
    out = Image.open(io.BytesIO(bytes(resized["content"])))
    assert out.size == (8, 4)


# --- SentencePiece tokenize-before-KenLM ------------------------------------


@pytest.fixture
def fake_sentencepiece(monkeypatch):
    class _SP:
        def load(self, path):
            self.path = path

        def encode_as_pieces(self, text):
            return ["▁" + w for w in text.split()]

    mod = types.ModuleType("sentencepiece")
    mod.SentencePieceProcessor = _SP
    monkeypatch.setitem(sys.modules, "sentencepiece", mod)
    A._SP_CACHE.clear()
    yield mod
    A._SP_CACHE.clear()


@pytest.fixture
def recording_kenlm(monkeypatch):
    seen = []

    class _Model:
        def __init__(self, path):
            pass

        def perplexity(self, text):
            seen.append(text)
            return 42.0

    mod = types.ModuleType("kenlm")
    mod.Model = _Model
    monkeypatch.setitem(sys.modules, "kenlm", mod)
    A._KENLM_CACHE.clear()
    yield seen
    A._KENLM_CACHE.clear()


def test_kenlm_scores_sentencepiece_pieces(fake_sentencepiece, recording_kenlm):
    """With sp_model set, KenLM must receive the space-joined pieces, not
    raw text — the reference's tokenize-then-score order
    (quality/perplexity.py:26-38)."""
    fn = A.kenlm_scorer("/m/en.bin", sp_model="/m/en.sp.model")
    assert fn("the cat sat", "en") == 42.0
    assert recording_kenlm == ["▁the ▁cat ▁sat"]
    # language gate still short-circuits BEFORE tokenization
    assert fn("der hund", "de") == 0.0
    assert len(recording_kenlm) == 1


def test_kenlm_raw_text_without_sp_model(recording_kenlm):
    fn = A.kenlm_scorer("/m/en.bin")
    fn("plain text path", "en")
    assert recording_kenlm == ["plain text path"]
