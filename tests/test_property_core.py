"""Property tests (hypothesis) over the classification core — no Spark:

* never crashes on arbitrary span content (the fault-isolation boundary in
  the Spark operator should only ever see reject rows for *malformed
  signals*, not for weird-but-valid content);
* deterministic: same input ⇒ identical output;
* offset-permutation invariant: span order is defined by `offset`, not by
  array position;
* output spans only use taxonomy kinds; offsets are dense and increasing;
* serialized text is reconstructable from body elements.
"""

import hypothesis.strategies as st
from hypothesis import given, settings

from wordscape_spark import signal as sig
from wordscape_spark import taxonomy as tax
from wordscape_spark.config import ExtractConfig
from wordscape_spark.core import classify as C

CFG = ExtractConfig(min_text_chars=0)

texts = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=40
)
styles = st.sampled_from(
    ["", "normal", "heading 1", "title", "toc 1", "macro", "custom x",
     "list bullet", "quote"]
)
sizes = st.sampled_from([sig.FONT_UNKNOWN, 9.0, 11.0, 14.0, 24.0])
tris = st.sampled_from([None, True, False])


@st.composite
def documents(draw):
    spans = []
    par = 0
    n = draw(st.integers(1, 12))
    for _ in range(n):
        kind_roll = draw(st.integers(0, 9))
        if kind_roll < 6:
            for _r in range(draw(st.integers(1, 3))):
                spans.append(
                    (
                        sig.encode_run(
                            par=par,
                            style=draw(styles),
                            par_size=draw(sizes),
                            par_bold=draw(tris),
                            par_italic=draw(tris),
                            size=draw(sizes),
                            bold=draw(tris),
                            italic=draw(tris),
                            underline=draw(st.booleans()),
                            math=draw(st.booleans()),
                            numbered=draw(st.booleans()),
                        ),
                        draw(texts),
                        None,
                    )
                )
            par += 1
        elif kind_roll < 8:
            spans.append(
                (sig.encode_cell(par, draw(st.integers(0, 2)),
                                 draw(st.integers(0, 2)),
                                 draw(st.booleans())),
                 draw(texts), None)
            )
        elif kind_roll == 8:
            spans.append(("fig", "", "media/a.png"))
        else:
            spans.append((sig.encode_sdt(draw(st.sampled_from(
                ["toc", "bibliography", ""]))), draw(texts), None))
    return [(k, t, m, i) for i, (k, t, m) in enumerate(spans)]


@settings(max_examples=250, deadline=None)
@given(documents())
def test_never_crashes_and_deterministic(doc):
    a = C.classify_document(doc, CFG)
    b = C.classify_document(doc, CFG)
    assert a == b
    assert a.ok


@settings(max_examples=150, deadline=None)
@given(documents(), st.randoms())
def test_offset_permutation_invariant(doc, rnd):
    shuffled = list(doc)
    rnd.shuffle(shuffled)
    assert C.classify_document(shuffled, CFG) == C.classify_document(doc, CFG)


@settings(max_examples=250, deadline=None)
@given(documents())
def test_output_wellformed(doc):
    res = C.classify_document(doc, CFG)
    valid = set(tax.ENTITY_NAMES)
    for i, (kind, text, media_ref, off) in enumerate(res.spans):
        assert kind in valid
        assert off == i  # dense, increasing offsets
        if kind == tax.FIGURE:
            assert media_ref is not None
    for kind in res.counts:
        assert kind in valid
    assert 0.0 <= res.quality <= 1.0 + 1e-9
