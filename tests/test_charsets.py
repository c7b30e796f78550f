"""Legacy multi-byte / single-byte charset sniffing (r7).

The WHATWG label table subset in parser/encoding.py maps crawl-common
labels onto stdlib codecs; decode never fails (errors="replace").
"""

from html5ever_elixir_spark.parser.encoding import sniff_decode


def _page(label: str, body: str, codec: str) -> bytes:
    return (
        f"<html><head><meta charset={label}></head>"
        f"<body><p>{body}</p></body></html>"
    ).encode(codec)


def test_declared_shift_jis():
    t, e = sniff_decode(_page("Shift_JIS", "こんにちは世界", "cp932"))
    assert e == "cp932" and "こんにちは世界" in t


def test_declared_gbk_and_gb2312():
    for label in ("gbk", "GB2312"):
        t, e = sniff_decode(_page(label, "你好，世界", "gb18030"))
        assert e == "gb18030" and "你好，世界" in t


def test_declared_euc_kr():
    t, e = sniff_decode(_page("euc-kr", "안녕하세요", "cp949"))
    assert e == "cp949" and "안녕하세요" in t


def test_declared_big5():
    t, e = sniff_decode(_page("big5", "中文測試", "big5hkscs"))
    assert e == "big5hkscs" and "中文測試" in t


def test_declared_euc_jp_and_iso2022jp():
    t, e = sniff_decode(_page("euc-jp", "日本語", "euc_jp"))
    assert e == "euc_jp" and "日本語" in t
    t, e = sniff_decode(_page("iso-2022-jp", "日本語", "iso2022_jp"))
    assert e == "iso2022_jp" and "日本語" in t


def test_declared_single_byte_families():
    cases = [
        ("koi8-r", "Привет", "koi8_r"),
        ("windows-1251", "Привет", "cp1251"),
        ("iso-8859-2", "Žluťoučký", "iso8859_2"),
        ("iso-8859-7", "Ελλάδα", "iso8859_7"),
        ("windows-874", "ไทย", "cp874"),
        ("iso-8859-9", "Türkçe", "cp1254"),  # WHATWG: 8859-9 → w1254
    ]
    for label, text, codec in cases:
        t, e = sniff_decode(_page(label, text, codec))
        assert e == codec and text in t, label


def test_mojibake_bytes_never_fail():
    # declared shift_jis but the body bytes are cp1251: replacement
    # chars, not an exception
    raw = "<html><head><meta charset=shift_jis></head><body><p>".encode(
        "ascii"
    ) + "Привет".encode("cp1251")
    t, e = sniff_decode(raw)
    assert e == "cp932" and isinstance(t, str)


def test_unknown_label_falls_through_to_utf8_chain():
    t, e = sniff_decode(_page("x-no-such-charset", "héllo", "utf-8"))
    assert e == "utf-8" and "héllo" in t
