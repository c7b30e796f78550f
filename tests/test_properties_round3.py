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
