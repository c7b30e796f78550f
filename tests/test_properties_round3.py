"""Property-based invariants (hypothesis): PDF writer/reader roundtrip
over arbitrary text, chunking reassembly, stratified-sample layout
independence. Bounded example counts — the suite is CI-gated on wall
time."""

from hypothesis import given, settings, strategies as st

# printable-ish text incl. PDF-delimiter chars and non-latin1
_line = st.text(
    alphabet=st.characters(
        codec="utf-8",
        exclude_categories=("Cs",),
        exclude_characters="\r\n\x00",
    ),
    min_size=0,
    max_size=60,
)


@settings(max_examples=60, deadline=None)
@given(st.lists(_line, min_size=1, max_size=8))
def test_pdf_roundtrip_property(lines):
    from html5ever_elixir_spark.parser.pdf import (
        extract_pdf_text,
        make_simple_pdf,
    )

    text, _ = extract_pdf_text(make_simple_pdf(lines))
    assert text == "\n".join(lines)


@settings(max_examples=30, deadline=None)
@given(st.lists(_line, min_size=1, max_size=6))
def test_pdf_objstm_roundtrip_property(lines):
    from html5ever_elixir_spark.parser.pdf import (
        extract_pdf_text,
        make_objstm_pdf,
    )

    text, _ = extract_pdf_text(make_objstm_pdf(lines))
    assert text == "\n".join(lines)


@settings(max_examples=40, deadline=None)
@given(
    st.integers(min_value=1, max_value=500),
    st.integers(min_value=2, max_value=60),
    st.integers(min_value=0, max_value=30),
)
def test_chunking_covers_all_words_exactly(n_words, chunk, overlap):
    # pure-Python mirror of the SQL chunking expressions: every word
    # index covered, consecutive chunks overlap by exactly `overlap`
    # (except a short tail), chunk lengths bounded
    if overlap >= chunk:
        overlap = chunk - 1
    step = chunk - overlap
    import math

    n_chunks = max(1, math.ceil((n_words - overlap) / step))
    seen = []
    prev_hi = None
    for i in range(n_chunks):
        lo = i * step
        hi = min(lo + chunk, n_words)
        assert lo < n_words  # no empty chunk
        assert hi - lo <= chunk
        if prev_hi is not None and hi > prev_hi:
            assert lo == prev_hi - overlap  # exact overlap
        seen.extend(range(lo, hi))
        prev_hi = hi
    assert set(seen) == set(range(n_words))  # complete coverage


# -- round 4: PNG encode→decode roundtrip over arbitrary images --------------

@settings(max_examples=50, deadline=None)
@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=12),
    st.sampled_from([0, 2, 4, 6]),
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_png_roundtrip_property(w, h, color_type, seed):
    import random

    from tests.test_round4_fixes import _make_png
    from html5ever_elixir_spark.operators.multimodal import _decode_raster

    rng = random.Random(seed)
    nchan = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    flat = [rng.randrange(256) for _ in range(w * h * nchan)]
    filters = [rng.randrange(5) for _ in range(h)]
    gw, gh, px = _decode_raster(_make_png(w, h, flat, color_type, filters))
    assert (gw, gh) == (w, h)
    # expected luma, mirroring the decoder's channel handling
    if nchan == 1:
        exp = flat
    elif nchan == 2:
        exp = flat[0::2]
    else:
        exp = [
            (flat[k] * 299 + flat[k + 1] * 587 + flat[k + 2] * 114) // 1000
            for k in range(0, len(flat), nchan)
        ]
    assert px == exp
