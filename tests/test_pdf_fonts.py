"""Simple-font glyph→text fidelity: /Encoding base encodings (WinAnsi,
MacRoman, Standard), /Differences overrides, and ToUnicode CMaps
(bfchar + both bfrange forms) — the round-4 coverage for crawled-PDF
text extraction (ISO 32000-1 §9.6.6 / §9.10.3 / Appendix D). The
reference repo has no PDF path; this is north-rule "PDF/layout parse"
surface."""

import zlib

import pytest

from html5ever_elixir_spark.parser.pdf import extract_pdf_text


def _obj(num, body):
    return f"{num} 0 obj\n".encode() + body + b"\nendobj\n"


def _stream_obj(num, payload, extra=b""):
    return _obj(
        num,
        b"<< /Length " + str(len(payload)).encode() + extra
        + b" >>\nstream\n" + payload + b"\nendstream",
    )


def _font_pdf(content, font_objs, font_refs, extra_objs=b"",
              resources_inline=True, page_extra=b""):
    """One-page PDF: content stream (obj 4), /Font resources pointing at
    ``font_refs`` (e.g. b"/F1 5 0 R"), plus ``font_objs`` bytes."""
    res = b"<< /Font << " + font_refs + b" >> >>"
    page_res = b" /Resources " + res if resources_inline else b""
    return (
        b"%PDF-1.4\n"
        + _obj(1, b"<< /Type /Catalog /Pages 2 0 R >>")
        + _obj(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
        + _obj(3, b"<< /Type /Page /Contents 4 0 R" + page_res + page_extra + b" >>")
        + _stream_obj(4, content)
        + font_objs
        + extra_objs
        + b"%%EOF"
    )


def test_winansi_encoding_decodes_cp1252_range():
    # 0x93/0x94 are cp1252 curly quotes, 0x85 ellipsis — latin-1 would
    # produce C1 control characters here
    content = b"BT /F1 12 Tf (\x93q\x94 \x85 \xe9) Tj ET"
    fonts = _obj(5, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
                    b" /Encoding /WinAnsiEncoding >>")
    text, _ = extract_pdf_text(_font_pdf(content, fonts, b"/F1 5 0 R"))
    assert text == "“q” … é"


def test_macroman_encoding():
    # mac_roman: 0x8E = é, 0xD0 = en dash, 0xA5 = bullet
    content = b"BT /F1 12 Tf (caf\x8e \xd0 \xa5) Tj ET"
    fonts = _obj(5, b"<< /Type /Font /Subtype /TrueType /BaseFont /Times"
                    b" /Encoding /MacRomanEncoding >>")
    text, _ = extract_pdf_text(_font_pdf(content, fonts, b"/F1 5 0 R"))
    assert text == "café – •"


def test_differences_override_with_winansi_base():
    # remap 0x41→eacute, 0x42→uni0153 (œ), 0x43 consecutive → Zcaron;
    # unmapped glyph name → U+FFFD marker; bytes outside Differences
    # keep the base encoding
    enc = (b"<< /BaseEncoding /WinAnsiEncoding"
           b" /Differences [65 /eacute /uni0153 /Zcaron 70 /nosuchglyph] >>")
    fonts = _obj(5, b"<< /Type /Font /Subtype /Type1 /Encoding " + enc + b" >>")
    content = b"BT /F1 10 Tf (ABC dF \x93) Tj ET"
    text, _ = extract_pdf_text(_font_pdf(content, fonts, b"/F1 5 0 R"))
    assert text == "éœŽ d� “"


def test_differences_default_base_is_standard_encoding():
    # no /BaseEncoding → StandardEncoding: 0xA4 fraction, 0x27 quoteright
    enc = b"<< /Differences [66 /bullet] >>"
    fonts = _obj(5, b"<< /Type /Font /Encoding " + enc + b" >>")
    content = b"BT /F1 10 Tf (A'B\xa4) Tj ET"
    text, _ = extract_pdf_text(_font_pdf(content, fonts, b"/F1 5 0 R"))
    assert text == "A’•⁄"


def test_indirect_encoding_dict():
    fonts = _obj(5, b"<< /Type /Font /Encoding 6 0 R >>") + _obj(
        6, b"<< /BaseEncoding /WinAnsiEncoding /Differences [88 /Euro] >>"
    )
    content = b"BT /F1 10 Tf (X = \x80) Tj ET"
    text, _ = extract_pdf_text(_font_pdf(content, fonts, b"/F1 5 0 R"))
    assert text == "€ = €"  # 88='X'→Euro via Differences; 0x80 cp1252 Euro


def test_tounicode_bfchar_and_bfrange_forms():
    cmap = (
        b"/CIDInit /ProcSet findresource begin\n"
        b"begincmap\n"
        b"1 begincodespacerange <00> <FF> endcodespacerange\n"
        b"2 beginbfchar\n<41> <0634>\n<42> <00660069>\nendbfchar\n"
        b"2 beginbfrange\n"
        b"<61> <63> <03B1>\n"                     # a,b,c → α,β,γ (increment)
        b"<64> <65> [<2192> <21D2>]\n"            # d,e → →,⇒ (array form)
        b"endbfrange\nendcmap\n"
    )
    flate = zlib.compress(cmap)
    fonts = _obj(5, b"<< /Type /Font /ToUnicode 6 0 R >>") + _stream_obj(
        6, flate, b" /Filter /FlateDecode"
    )
    content = b"BT /F1 10 Tf (AB abcde) Tj ET"
    text, _ = extract_pdf_text(_font_pdf(content, fonts, b"/F1 5 0 R"))
    # A→ش, B→"fi" (multi-char dst), space unmapped → ASCII passthrough
    assert text == "شfi αβγ→⇒"


def test_tounicode_wins_over_encoding_and_fills_from_it():
    cmap = b"1 beginbfchar <41> <0041> endbfchar\n"  # only 'A' mapped
    fonts = _obj(
        5,
        b"<< /Type /Font /Encoding << /Differences [65 /bullet 66 /Euro] >>"
        b" /ToUnicode 6 0 R >>",
    ) + _stream_obj(6, cmap)
    content = b"BT /F1 10 Tf (AB) Tj ET"
    text, _ = extract_pdf_text(_font_pdf(content, fonts, b"/F1 5 0 R"))
    # A: ToUnicode says U+0041 (overriding Differences' bullet);
    # B: CMap gap filled by the Encoding map (Euro)
    assert text == "A€"


def test_two_fonts_switch_mid_page():
    fonts = _obj(5, b"<< /Type /Font /Encoding /WinAnsiEncoding >>") + _obj(
        6, b"<< /Type /Font /Encoding /MacRomanEncoding >>"
    )
    content = (b"BT /F1 12 Tf (\x8e) Tj ET"      # cp1252 0x8E = Ž
               b" BT /F2 12 Tf (\x8e) Tj ET")    # mac_roman 0x8E = é
    text, _ = extract_pdf_text(
        _font_pdf(content, fonts, b"/F1 5 0 R /F2 6 0 R")
    )
    assert text == "Ž\né"


def test_resources_inherited_from_pages_node():
    fonts = _obj(5, b"<< /Type /Font /Encoding /WinAnsiEncoding >>")
    pdf = (
        b"%PDF-1.4\n"
        + _obj(1, b"<< /Type /Catalog /Pages 2 0 R >>")
        + _obj(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1"
                  b" /Resources << /Font << /F1 5 0 R >> >> >>")
        + _obj(3, b"<< /Type /Page /Contents 4 0 R >>")  # no own Resources
        + _stream_obj(4, b"BT /F1 12 Tf (\x93ok\x94) Tj ET")
        + fonts
        + b"%%EOF"
    )
    text, _ = extract_pdf_text(pdf)
    assert text == "“ok”"


def test_indirect_resources_dict():
    fonts = _obj(5, b"<< /Type /Font /Encoding /WinAnsiEncoding >>")
    pdf = (
        b"%PDF-1.4\n"
        + _obj(1, b"<< /Type /Catalog /Pages 2 0 R >>")
        + _obj(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
        + _obj(3, b"<< /Type /Page /Contents 4 0 R /Resources 7 0 R >>")
        + _stream_obj(4, b"BT /F1 12 Tf (\x85) Tj ET")
        + fonts
        + _obj(7, b"<< /Font << /F1 5 0 R >> >>")
        + b"%%EOF"
    )
    text, _ = extract_pdf_text(pdf)
    assert text == "…"


def test_no_font_info_keeps_latin1_passthrough():
    # font without /Encoding or /ToUnicode → legacy behavior (builtin
    # encoding unknowable) — the writer-roundtrip invariant
    fonts = _obj(5, b"<< /Type /Font /Subtype /Type1 /BaseFont /Courier >>")
    content = b"BT /F1 12 Tf (caf\xe9 \x93) Tj ET"
    text, _ = extract_pdf_text(_font_pdf(content, fonts, b"/F1 5 0 R"))
    assert text == "caf\xe9 \x93"


def test_octal_overflow_masks_to_byte():
    # \777 overflows: spec says ignore high-order overflow → 0xFF
    fonts = _obj(5, b"<< /Type /Font /Encoding /WinAnsiEncoding >>")
    content = b"BT /F1 12 Tf (\\777) Tj ET"
    text, _ = extract_pdf_text(_font_pdf(content, fonts, b"/F1 5 0 R"))
    assert text == "ÿ"  # cp1252 0xFF


def test_hex_string_decoded_through_font():
    fonts = _obj(5, b"<< /Type /Font /Encoding /WinAnsiEncoding >>")
    content = b"BT /F1 12 Tf <93 6F 6B 94> Tj ET"
    text, _ = extract_pdf_text(_font_pdf(content, fonts, b"/F1 5 0 R"))
    assert text == "“ok”"


def test_font_encoding_tables_sane():
    from html5ever_elixir_spark.parser.pdf import (
        _base_encoding,
        _glyph_to_unicode,
    )

    win = _base_encoding(b"WinAnsiEncoding")
    assert win[0x80] == "€" and win[0x81] is None and win[0xE9] == "é"
    mac = _base_encoding(b"MacRomanEncoding")
    assert mac[0xDB] == "¤"  # PDF table, not Apple's euro revision
    std = _base_encoding(b"StandardEncoding")
    assert std[0x27] == "’" and std[0xA9] == "'" and std[0xAE] == "ﬁ"
    assert _glyph_to_unicode("uni00E90041") == "é" + "A"
    assert _glyph_to_unicode("u1F600") == "😀"
    assert _glyph_to_unicode("g123") == "�"


def test_writer_roundtrip_untouched_by_font_layer():
    from html5ever_elixir_spark.parser.pdf import make_simple_pdf

    lines = ["plain writer line one", "and (two) with \\ escapes"]
    text, n_pages = extract_pdf_text(make_simple_pdf(lines))
    assert text == "\n".join(lines) and n_pages == 1


def test_type0_identity_h_with_tounicode():
    # 2-byte Identity-H codes through a 2-byte ToUnicode: the dominant
    # crawled-PDF layout for CJK / non-Latin text
    cmap = (
        b"2 beginbfchar\n<0105> <4F60>\n<0106> <597D>\nendbfchar\n"
        b"1 beginbfrange\n<0200> <0202> <0041>\nendbfrange\n"
    )
    fonts = _obj(
        5, b"<< /Type /Font /Subtype /Type0 /BaseFont /Noto"
           b" /Encoding /Identity-H /ToUnicode 6 0 R >>"
    ) + _stream_obj(6, cmap)
    content = b"BT /F1 12 Tf <0105 0106 0200 0201 0202> Tj ET"
    text, _ = extract_pdf_text(_font_pdf(content, fonts, b"/F1 5 0 R"))
    assert text == "你好ABC"


def test_type0_identity_h_literal_string_and_odd_tail():
    cmap = b"1 beginbfchar <0041> <0058> endbfchar\n"
    fonts = _obj(
        5, b"<< /Type /Font /Subtype /Type0 /Encoding /Identity-H"
           b" /ToUnicode 6 0 R >>"
    ) + _stream_obj(6, cmap)
    # literal string bytes \x00 A = code 0x0041 → X; trailing odd byte → �
    content = b"BT /F1 12 Tf (\x00A\x00) Tj ET"
    text, _ = extract_pdf_text(_font_pdf(content, fonts, b"/F1 5 0 R"))
    assert text == "X�"


def test_type0_identity_without_tounicode_is_lossy_not_garbage():
    fonts = _obj(
        5, b"<< /Type /Font /Subtype /Type0 /Encoding /Identity-H >>"
    )
    content = b"BT /F1 12 Tf <00410042> Tj ET"
    text, _ = extract_pdf_text(_font_pdf(content, fonts, b"/F1 5 0 R"))
    # Identity CIDs are glyph ids, not characters: U+FFFD, never "AB"
    assert text == "��"


def test_type0_predefined_cmap_degrades_to_replacement():
    # r7: predefined external CMaps (no embedded data) decode every
    # 2-byte code to U+FFFD — a distinct degradation, never mojibake
    # (pre-r7 this passed the raw bytes through as latin-1 "ab")
    fonts = _obj(
        5, b"<< /Type /Font /Subtype /Type0 /Encoding /GBK-EUC-H >>"
    )
    content = b"BT /F1 12 Tf (ab) Tj ET"
    text, _ = extract_pdf_text(_font_pdf(content, fonts, b"/F1 5 0 R"))
    assert text == "�"


def test_tj_kerning_inserts_word_spaces():
    # justified text: [-250] between strings is a word space; small
    # kerning (letter fitting) is not
    fonts = _obj(5, b"<< /Type /Font /Subtype /Type1 >>")
    content = (b"BT /F1 12 Tf [(Hello) -250 (world) -40 (!) ] TJ ET")
    text, _ = extract_pdf_text(_font_pdf(content, fonts, b"/F1 5 0 R"))
    assert text == "Hello world!"


def test_tj_kerning_leading_number_adds_nothing():
    fonts = _obj(5, b"<< /Type /Font /Subtype /Type1 >>")
    content = b"BT /F1 12 Tf [ -900 (x) ] TJ ET"
    text, _ = extract_pdf_text(_font_pdf(content, fonts, b"/F1 5 0 R"))
    assert text == "x"


# -- round 4b: Form XObjects + inline images --------------------------------

def test_form_xobject_text_recursed_in_stream_order():
    form = _stream_obj(6, b"BT /F1 9 Tf (from the form) Tj ET")
    fonts = _obj(7, b"<< /Type /Font /Encoding /WinAnsiEncoding >>")
    pdf = (
        b"%PDF-1.4\n"
        + _obj(1, b"<< /Type /Catalog /Pages 2 0 R >>")
        + _obj(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
        + _obj(3, b"<< /Type /Page /Contents 4 0 R /Resources << "
                  b"/Font << /F1 7 0 R >> /XObject << /Fm1 6 0 R >> >> >>")
        + _stream_obj(4, b"BT /F1 12 Tf (before) Tj ET /Fm1 Do "
                         b"BT /F1 12 Tf (after) Tj ET")
        + form.replace(b"<< /Length", b"<< /Subtype /Form /Length")
        + fonts
        + b"%%EOF"
    )
    text, _ = extract_pdf_text(pdf)
    assert text == "before\nfrom the form\nafter"


def test_form_xobject_own_resources_and_cycle_guard():
    # the form carries its OWN /Font (MacRoman) and references ITSELF —
    # the cycle guard must terminate after one level
    pdf = (
        b"%PDF-1.4\n"
        + _obj(1, b"<< /Type /Catalog /Pages 2 0 R >>")
        + _obj(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
        + _obj(3, b"<< /Type /Page /Contents 4 0 R /Resources << "
                  b"/XObject << /Fm 6 0 R >> >> >>")
        + _stream_obj(4, b"/Fm Do")
        + _obj(6, b"<< /Subtype /Form /Length 44 /Resources << "
                  b"/Font << /G 7 0 R >> /XObject << /Fm 6 0 R >> >> >>"
                  b"\nstream\nBT /G 8 Tf (\x8e) Tj ET /Fm Do /Fm Do"
                  b"\nendstream")
        + _obj(7, b"<< /Type /Font /Encoding /MacRomanEncoding >>")
        + b"%%EOF"
    )
    text, _ = extract_pdf_text(pdf)
    assert text == "é"  # mac_roman 0x8E; recursion terminated


def test_image_xobject_not_recursed():
    pdf = (
        b"%PDF-1.4\n"
        + _obj(1, b"<< /Type /Catalog /Pages 2 0 R >>")
        + _obj(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
        + _obj(3, b"<< /Type /Page /Contents 4 0 R /Resources << "
                  b"/XObject << /Im1 6 0 R >> >> >>")
        + _stream_obj(4, b"BT (real) Tj ET /Im1 Do")
        + _obj(6, b"<< /Subtype /Image /Length 20 >>\nstream\n"
                  b"BT (fake) Tj ET xxx\nendstream")
        + b"%%EOF"
    )
    text, _ = extract_pdf_text(pdf)
    assert text == "real"


def test_inline_image_binary_cannot_inject_text():
    # the BI..ID binary payload contains a fake text show AND a bare
    # "EI" without surrounding whitespace — both must be skipped
    payload = b"\x00\x01EIzz (fake) Tj \xff\xfe"
    content = (b"BT (one) Tj ET "
               b"BI /W 2 /H 2 /BPC 8 ID " + payload + b" EI "
               b"BT (two) Tj ET")
    fonts = _obj(5, b"<< /Type /Font >>")
    text, _ = extract_pdf_text(_font_pdf(content, fonts, b"/F1 5 0 R"))
    assert text == "one\ntwo"


def test_fuzz_font_and_xobject_paths_never_escape_error_contract():
    # same corruption contract as the base fuzz, over PDFs that exercise
    # the round-4 surfaces: encodings, Differences, ToUnicode CMaps,
    # Type0/Identity-H, Form XObjects, inline images, TJ kerning
    import random

    from html5ever_elixir_spark.parser.pdf import PdfError

    cmap = zlib.compress(
        b"1 beginbfchar <41> <0041> endbfchar\n"
        b"1 beginbfrange <61> <7A> <03B1> endbfrange\n"
    )
    bases = [
        _font_pdf(
            b"BT /F1 12 Tf [(kern) -250 (ed)] TJ ET",
            _obj(5, b"<< /Type /Font /Encoding << /BaseEncoding "
                    b"/WinAnsiEncoding /Differences [65 /eacute] >> "
                    b"/ToUnicode 6 0 R >>") + _stream_obj(
                6, cmap, b" /Filter /FlateDecode"),
            b"/F1 5 0 R",
        ),
        _font_pdf(
            b"BT /F1 12 Tf <00410042> Tj ET",
            _obj(5, b"<< /Type /Font /Subtype /Type0 "
                    b"/Encoding /Identity-H /ToUnicode 6 0 R >>")
            + _stream_obj(6, b"1 beginbfchar <0041> <0058> endbfchar"),
            b"/F1 5 0 R",
        ),
        (b"%PDF-1.4\n"
         + _obj(1, b"<< /Type /Catalog /Pages 2 0 R >>")
         + _obj(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
         + _obj(3, b"<< /Type /Page /Contents 4 0 R /Resources << "
                   b"/XObject << /Fm 6 0 R >> >> >>")
         + _stream_obj(4, b"BI /W 1 ID \x00\xff EI /Fm Do BT (t) Tj ET")
         + _obj(6, b"<< /Subtype /Form /Length 20 >>\nstream\n"
                   b"BT (form txt) Tj ET \nendstream")
         + b"%%EOF"),
    ]
    rng = random.Random(7)
    for base in bases:
        for trial in range(100):
            buf = bytearray(base)
            mode = trial % 3
            if mode == 0:
                buf = buf[: rng.randrange(1, len(buf))]
            elif mode == 1:
                for _ in range(rng.randrange(1, 6)):
                    buf[rng.randrange(len(buf))] = rng.randrange(256)
            else:
                at = rng.randrange(len(buf))
                del buf[at : at + rng.randrange(1, 40)]
            try:
                text, n = extract_pdf_text(bytes(buf))
                assert isinstance(text, str) and n >= 0
            except PdfError:
                pass


# ---------------------------------------------------------------------------
# r7: Type0 fonts with EMBEDDED CID CMaps (ISO 32000-2 §9.7.5.3) —
# variable-width codespace splitting + cidchar/cidrange + ToUnicode.


def _cid_font_objs(cmap_body: bytes, tou_body: bytes | None = None):
    tou_ref = b" /ToUnicode 7 0 R" if tou_body is not None else b""
    objs = _obj(
        5,
        b"<< /Type /Font /Subtype /Type0 /BaseFont /T "
        b"/Encoding 6 0 R /DescendantFonts [8 0 R]" + tou_ref + b" >>",
    ) + _stream_obj(6, cmap_body, b" /Type /CMap")
    if tou_body is not None:
        objs += _stream_obj(7, tou_body)
    objs += _obj(8, b"<< /Type /Font /Subtype /CIDFontType2 >>")
    return objs


_MIXED_CMAP = b"""begincmap
2 begincodespacerange
<20> <20>
<0100> <0102>
endcodespacerange
1 begincidchar
<0100> 1
endcidchar
1 begincidrange
<0101> <0102> 2
endcidrange
endcmap"""


def test_cid_cmap_mixed_width_with_tounicode():
    tou = (b"1 begincodespacerange\n<0100> <FFFF>\nendcodespacerange\n"
           b"4 beginbfchar\n<20> <0020>\n<0100> <0041>\n<0101> <0042>\n"
           b"<0102> <0043>\nendbfchar")
    # codes: A space B C  (1-byte space splits between 2-byte codes)
    content = b"BT /F1 12 Tf <0100200101 0102> Tj ET"
    text, _ = extract_pdf_text(
        _font_pdf(content, _cid_font_objs(_MIXED_CMAP, tou), b"/F1 5 0 R")
    )
    assert text == "A BC"


def test_cid_cmap_without_tounicode_is_fffd_not_garbage():
    content = b"BT /F1 12 Tf <01000101> Tj ET"
    text, _ = extract_pdf_text(
        _font_pdf(content, _cid_font_objs(_MIXED_CMAP), b"/F1 5 0 R")
    )
    # CIDs resolve (1, 2) but carry no character mapping
    assert text == "��"


def test_cid_cmap_bytes_outside_codespace_consume_shortest():
    tou = (b"1 beginbfchar\n<0100> <0058>\nendbfchar")
    # 0xFF matches no range: consume 1 byte (shortest width) as U+FFFD,
    # then a valid 2-byte code
    content = b"BT /F1 12 Tf <FF0100> Tj ET"
    text, _ = extract_pdf_text(
        _font_pdf(content, _cid_font_objs(_MIXED_CMAP, tou), b"/F1 5 0 R")
    )
    assert text == "�X"


def test_make_cid_pdf_roundtrip_and_encrypted_composition():
    from html5ever_elixir_spark.parser.pdf import (
        encrypt_pdf_aes,
        make_cid_pdf,
    )

    lines = ["Hello CID world", "second line with spaces", "x!@# 42"]
    pdf = make_cid_pdf(lines)
    assert extract_pdf_text(pdf)[0] == "\n".join(lines)
    # >40 lines: page break + per-page font resolution
    many = [f"line {i} of a longer doc" for i in range(95)]
    t2, np2 = extract_pdf_text(make_cid_pdf(many))
    assert t2 == "\n".join(many) and np2 == 3
    # encryption composes: the CMap/ToUnicode streams decrypt before
    # font resolution
    enc = encrypt_pdf_aes(pdf, file_id=b"\x01" * 16)
    assert extract_pdf_text(enc)[0] == "\n".join(lines)


def test_parse_cid_cmap_units():
    from html5ever_elixir_spark.parser.pdf import _parse_cid_cmap

    codespace, cids = _parse_cid_cmap(_MIXED_CMAP)
    assert (1, 0x20, 0x20) in codespace
    assert (2, 0x0100, 0x0102) in codespace
    assert cids == {0x0100: 1, 0x0101: 2, 0x0102: 3}


# ---------------------------------------------------------------------------
# r8: predefined Uni*-UCS2-* CMaps (public Adobe families) — the 2-byte
# code IS the UCS-2 code unit, decoded without external data files


def test_ucs2_predefined_cjk_roundtrip():
    from html5ever_elixir_spark.parser.pdf import make_ucs2_pdf

    lines = ["你好 world", "東京 2024", "ascii only"]
    for name in ("UniGB-UCS2-H", "UniJIS-UCS2-H", "UniKS-UCS2-H",
                 "UniCNS-UCS2-H"):
        text, n_pages = extract_pdf_text(make_ucs2_pdf(lines, name))
        assert text == "\n".join(lines), name
        assert n_pages == 1


def test_ucs2_predefined_non_bmp_rejected_by_writer():
    from html5ever_elixir_spark.parser.pdf import make_ucs2_pdf

    with pytest.raises(ValueError):
        make_ucs2_pdf(["emoji \U0001f600"])


def test_ucs2_surrogate_codes_decode_fffd():
    # hand-build a show string containing a lone surrogate code unit:
    # outside the UCS2 codespace -> U+FFFD, never a Python chr() error;
    # odd trailing byte -> U+FFFD too
    content = b"BT /F1 12 Tf <D8000062> Tj <006141> Tj ET"
    fonts = _obj(
        5,
        b"<< /Type /Font /Subtype /Type0 /BaseFont /T "
        b"/Encoding /UniJIS-UCS2-H /DescendantFonts [6 0 R] >>",
    ) + _obj(
        6,
        b"<< /Type /Font /Subtype /CIDFontType0 /BaseFont /T "
        b"/CIDSystemInfo << /Registry (Adobe) /Ordering (Japan1) "
        b"/Supplement 4 >> >>",
    )
    text, _ = extract_pdf_text(_font_pdf(content, fonts, b"/F1 5 0 R"))
    assert text == "�b" + "a�"


def test_ucs2_tounicode_wins_per_code():
    # a ToUnicode on a predefined-UCS2 font overrides chr(code)
    from html5ever_elixir_spark.parser.pdf import make_ucs2_pdf

    pdf = make_ucs2_pdf(["aZ"])
    tou = zlib.compress(b"""/CIDInit /ProcSet findresource begin
begincmap
1 begincodespacerange
<0000> <FFFF>
endcodespacerange
1 beginbfchar
<0061> <0051>
endbfchar
endcmap
end""")
    # append the ToUnicode object and point the font at it
    n_obj = pdf.count(b" 0 obj")
    tou_id = n_obj + 1
    assert b"/Encoding /UniGB-UCS2-H /DescendantFonts" in pdf
    pdf = pdf.replace(
        b"/Encoding /UniGB-UCS2-H",
        f"/Encoding /UniGB-UCS2-H /ToUnicode {tou_id} 0 R".encode(),
    )
    obj = (f"{tou_id} 0 obj\n<< /Length {len(tou)} /Filter /FlateDecode "
           ">>\nstream\n").encode() + tou + b"\nendstream\nendobj\n"
    at = pdf.rfind(b"xref")
    pdf = pdf[:at] + obj + pdf[at:]
    # fix startxref (xref table offsets of existing objs are unchanged;
    # readers in this repo tolerate the appended object via scan)
    text, _ = extract_pdf_text(pdf)
    assert text == "QZ"  # 0x61 remapped to Q, 0x5A still identity


def test_ucs2_encrypted_composes():
    from html5ever_elixir_spark.parser.pdf import (
        encrypt_pdf_rc4,
        make_ucs2_pdf,
    )

    lines = ["中文 secret"]
    pdf = encrypt_pdf_rc4(make_ucs2_pdf(lines), file_id=b"x" * 16)
    text, _ = extract_pdf_text(pdf)
    assert text == lines[0]
