"""WHATWG-style encoding sniffing for crawled HTML bytes (Encoding
Standard + HTML §13.2.3 prescan, simplified): BOM → declared
``<meta charset>`` within the first 1024 bytes → UTF-8 attempt →
windows-1252 fallback. A real 100 TB crawl is full of legacy cp1252 /
latin-1 pages; strict-UTF-8-only (the reference's contract,
lib/html5ever.ex typed error) drops them all as error rows.

This module is OPT-IN (``parse_and_extract(encoding="sniff")``): the
default path stays strict UTF-8 with the reference's exact error
message, so every byte-parity gate is unchanged.

windows-1252 decodes per the WHATWG Encoding Standard: latin-1 plus
the 0x80–0x9F table, with the five undefined bytes passing through as
their C1 code points (browsers never fail on single-byte decodes) —
Python's ``cp1252`` codec raises on those, hence the explicit table.
"""

from __future__ import annotations

# WHATWG windows-1252: 0x80-0x9F remap (index = byte - 0x80); the five
# C1 pass-throughs are 0x81, 0x8D, 0x8F, 0x90, 0x9D
_C1 = [
    0x20AC, 0x0081, 0x201A, 0x0192, 0x201E, 0x2026, 0x2020, 0x2021,
    0x02C6, 0x2030, 0x0160, 0x2039, 0x0152, 0x008D, 0x017D, 0x008F,
    0x0090, 0x2018, 0x2019, 0x201C, 0x201D, 0x2022, 0x2013, 0x2014,
    0x02DC, 0x2122, 0x0161, 0x203A, 0x0153, 0x009D, 0x017E, 0x0178,
]
_W1252_TABLE = {0x80 + i: chr(cp) for i, cp in enumerate(_C1)}


def decode_windows_1252(data: bytes) -> str:
    return data.decode("latin-1").translate(_W1252_TABLE)


# charset labels → canonical decoder, per the Encoding Standard's label
# table (the subset a pure-Python pipeline supports; unknown labels fall
# through the sniff chain). All the latin-1 family labels map to
# windows-1252 — that IS the standard's mapping, not an approximation.
_LABELS = {
    "utf-8": "utf-8", "utf8": "utf-8", "unicode-1-1-utf-8": "utf-8",
    "windows-1252": "w1252", "cp1252": "w1252", "x-cp1252": "w1252",
    "iso-8859-1": "w1252", "iso8859-1": "w1252", "latin1": "w1252",
    "l1": "w1252", "us-ascii": "w1252", "ascii": "w1252",
    "iso-ir-100": "w1252", "cp819": "w1252", "ibm819": "w1252",
    # §13.2.3.2: a meta-declared UTF-16 is treated as UTF-8 (the bytes
    # being prescanned obviously weren't UTF-16)
    "utf-16": "utf-8", "utf-16le": "utf-8", "utf-16be": "utf-8",
}

# WHATWG label → Python stdlib codec for the legacy multi-byte and
# single-byte families a real crawl carries (Encoding Standard label
# table, the subset stdlib covers). Canonical-name choices follow the
# standard: Shift_JIS decodes as windows-31j (cp932), EUC-KR as
# windows-949 (cp949), Big5 includes HKSCS, GBK's decoder is shared
# with gb18030's two-byte space (Python's gb18030 accepts a superset —
# fine for decode). Decoding uses errors="replace", mirroring browser
# never-fail semantics; stdlib codecs differ from the WHATWG tables in
# a handful of corner mappings (documented approximation).
_PY_LABELS = {
    # Japanese
    "shift_jis": "cp932", "shift-jis": "cp932", "sjis": "cp932",
    "x-sjis": "cp932", "ms_kanji": "cp932", "ms932": "cp932",
    "windows-31j": "cp932", "csshiftjis": "cp932",
    "euc-jp": "euc_jp", "x-euc-jp": "euc_jp",
    "cseucpkdfmtjapanese": "euc_jp",
    "iso-2022-jp": "iso2022_jp", "csiso2022jp": "iso2022_jp",
    # Simplified Chinese
    "gbk": "gb18030", "gb2312": "gb18030", "gb_2312": "gb18030",
    "gb_2312-80": "gb18030", "chinese": "gb18030",
    "csgb2312": "gb18030", "csiso58gb231280": "gb18030",
    "iso-ir-58": "gb18030", "x-gbk": "gb18030", "gb18030": "gb18030",
    # Traditional Chinese
    "big5": "big5hkscs", "big5-hkscs": "big5hkscs",
    "cn-big5": "big5hkscs", "x-x-big5": "big5hkscs",
    "csbig5": "big5hkscs",
    # Korean
    "euc-kr": "cp949", "korean": "cp949", "windows-949": "cp949",
    "csksc56011987": "cp949", "ks_c_5601-1987": "cp949",
    "ks_c_5601-1989": "cp949", "ksc5601": "cp949", "ksc_5601": "cp949",
    "iso-ir-149": "cp949",
    # Thai
    "windows-874": "cp874", "dos-874": "cp874", "tis-620": "cp874",
    "iso-8859-11": "cp874", "iso8859-11": "cp874",
    # Cyrillic
    "koi8-r": "koi8_r", "koi8": "koi8_r", "koi": "koi8_r",
    "cskoi8r": "koi8_r", "koi8_r": "koi8_r",
    "koi8-u": "koi8_u", "koi8-ru": "koi8_u",
    "x-mac-cyrillic": "mac_cyrillic", "x-mac-ukrainian": "mac_cyrillic",
    "macintosh": "mac_roman", "csmacintosh": "mac_roman",
    "mac": "mac_roman", "x-mac-roman": "mac_roman",
    # windows-125x + the WHATWG iso-8859 aliases onto them
    "windows-1250": "cp1250", "cp1250": "cp1250", "x-cp1250": "cp1250",
    "windows-1251": "cp1251", "cp1251": "cp1251", "x-cp1251": "cp1251",
    "windows-1253": "cp1253", "cp1253": "cp1253", "x-cp1253": "cp1253",
    "windows-1254": "cp1254", "cp1254": "cp1254", "x-cp1254": "cp1254",
    "iso-8859-9": "cp1254", "iso8859-9": "cp1254", "latin5": "cp1254",
    "l5": "cp1254", "iso-ir-148": "cp1254",
    "windows-1255": "cp1255", "cp1255": "cp1255", "x-cp1255": "cp1255",
    "windows-1256": "cp1256", "cp1256": "cp1256", "x-cp1256": "cp1256",
    "windows-1257": "cp1257", "cp1257": "cp1257", "x-cp1257": "cp1257",
    "windows-1258": "cp1258", "cp1258": "cp1258", "x-cp1258": "cp1258",
    # remaining iso-8859 parts stdlib covers directly
    "iso-8859-2": "iso8859_2", "iso8859-2": "iso8859_2",
    "latin2": "iso8859_2", "l2": "iso8859_2", "csisolatin2": "iso8859_2",
    "iso-ir-101": "iso8859_2",
    "iso-8859-3": "iso8859_3", "iso8859-3": "iso8859_3",
    "latin3": "iso8859_3",
    "iso-8859-4": "iso8859_4", "iso8859-4": "iso8859_4",
    "latin4": "iso8859_4",
    "iso-8859-5": "iso8859_5", "iso8859-5": "iso8859_5",
    "cyrillic": "iso8859_5",
    "iso-8859-6": "iso8859_6", "iso8859-6": "iso8859_6",
    "arabic": "iso8859_6",
    "iso-8859-7": "iso8859_7", "iso8859-7": "iso8859_7",
    "greek": "iso8859_7", "greek8": "iso8859_7",
    "iso-8859-8": "iso8859_8", "iso8859-8": "iso8859_8",
    "hebrew": "iso8859_8", "iso-8859-8-i": "iso8859_8",
    "iso-8859-10": "iso8859_10", "iso8859-10": "iso8859_10",
    "latin6": "iso8859_10",
    "iso-8859-13": "iso8859_13", "iso8859-13": "iso8859_13",
    "iso-8859-14": "iso8859_14", "iso8859-14": "iso8859_14",
    "iso-8859-15": "iso8859_15", "iso8859-15": "iso8859_15",
    "latin9": "iso8859_15", "l9": "iso8859_15",
    "iso-8859-16": "iso8859_16", "iso8859-16": "iso8859_16",
    # DOS Cyrillic
    "ibm866": "cp866", "866": "cp866", "cp866": "cp866",
    "csibm866": "cp866",
}

# labels the prescan treats as *recognized*: the spec's "get an
# encoding" fails on unknown labels and the meta loop CONTINUES
# scanning (a later valid meta still wins) — returning an unknown
# label here would wrongly end the prescan.
_KNOWN_LABELS = frozenset(_LABELS) | frozenset(_PY_LABELS)

# §13.2.3.2 "prescan a byte stream to determine its encoding" — the
# real spec algorithm over the first 1 KiB (an earlier regex version
# false-matched metas inside comments and <metadata> tags; this one is
# differentially gated against html5lib-1.1's EncodingParser).

_B_WS = frozenset(b"\t\n\x0c\r ")
_B_WS_SLASH = frozenset(b"\t\n\x0c\r /")


class _PrescanEOF(Exception):
    """Ran off the sniff window mid-construct: abort the prescan."""


def _get_attribute(data: bytes, pos: int):
    """Spec "get an attribute": returns (name, value, newpos) or None
    when the tag ends ('>'), raising _PrescanEOF at end of data.
    Names/values come back ASCII-lowercased like the spec demands."""
    n = len(data)
    while pos < n and data[pos] in _B_WS_SLASH:
        pos += 1
    if pos >= n:
        raise _PrescanEOF
    if data[pos] == 0x3E:  # '>'
        return None
    name = bytearray()
    value = bytearray()
    while True:
        if pos >= n:
            raise _PrescanEOF
        b = data[pos]
        if b == 0x3D and name:  # '='
            pos += 1
            break
        if b in _B_WS:
            # spaces step: skip ws, then require '='
            while pos < n and data[pos] in _B_WS:
                pos += 1
            if pos >= n:
                raise _PrescanEOF
            if data[pos] != 0x3D:
                return bytes(name), b"", pos
            pos += 1
            break
        if b in (0x2F, 0x3E):  # '/' '>'
            return bytes(name), b"", pos
        name.append(b + 0x20 if 0x41 <= b <= 0x5A else b)
        pos += 1
    while pos < n and data[pos] in _B_WS:
        pos += 1
    if pos >= n:
        raise _PrescanEOF
    b = data[pos]
    if b in (0x22, 0x27):  # quoted value
        quote = b
        pos += 1
        while True:
            if pos >= n:
                raise _PrescanEOF
            b = data[pos]
            pos += 1
            if b == quote:
                return bytes(name), bytes(value), pos
            value.append(b + 0x20 if 0x41 <= b <= 0x5A else b)
    if b == 0x3E:
        return bytes(name), b"", pos
    while pos < n:
        b = data[pos]
        if b in _B_WS or b == 0x3E:
            return bytes(name), bytes(value), pos
        value.append(b + 0x20 if 0x41 <= b <= 0x5A else b)
        pos += 1
    raise _PrescanEOF


def _charset_from_content(s: bytes):
    """Spec "extract a character encoding from a meta element" over an
    already-lowercased content attribute value."""
    pos = 0
    n = len(s)
    while True:
        idx = s.find(b"charset", pos)
        if idx == -1:
            return None
        pos = idx + 7
        while pos < n and s[pos] in _B_WS:
            pos += 1
        if pos >= n or s[pos] != 0x3D:  # '='
            continue
        pos += 1
        while pos < n and s[pos] in _B_WS:
            pos += 1
        if pos >= n:
            return None
        b = s[pos]
        if b in (0x22, 0x27):
            end = s.find(bytes((b,)), pos + 1)
            return s[pos + 1:end] if end != -1 else None
        end = pos
        while end < n and s[end] != 0x3B and s[end] not in _B_WS:  # ';'
            end += 1
        return s[pos:end] or None


def _prescan_meta(data: bytes):
    """Declared-charset label per the §13.2.3.2 prescan, or None."""
    if b"<meta" not in data.lower():
        # no '<meta' byte sequence anywhere → every path through the
        # scan returns None; skip the Python walk (one C-speed check
        # vs ~120 µs of per-tag parsing on meta-less tag-dense heads)
        return None
    pos = 0
    n = len(data)
    try:
        while pos < n:
            if data[pos] != 0x3C:  # '<'
                # jump to the next tag open at C speed — text runs are
                # most of a page and a per-byte Python loop here costs
                # ~parse-level overhead per sniffed document
                pos = data.find(b"<", pos + 1)
                if pos == -1:
                    return None
                continue
            if data[pos + 1:pos + 4] == b"!--":
                end = data.find(b"-->", pos + 2)
                if end == -1:
                    return None
                pos = end + 3
                continue
            if (
                data[pos + 1:pos + 5].lower() == b"meta"
                and pos + 5 < n
                and data[pos + 5] in _B_WS_SLASH
            ):
                pos += 6
                seen = set()
                got_pragma = False
                need_pragma = None
                charset = None
                while True:
                    att = _get_attribute(data, pos)
                    if att is None:
                        break
                    name, value, pos = att
                    if name in seen:
                        continue
                    seen.add(name)
                    if name == b"http-equiv":
                        if value == b"content-type":
                            got_pragma = True
                    elif name == b"content":
                        if charset is None:
                            cs = _charset_from_content(value)
                            if cs is not None:
                                charset = cs
                                need_pragma = True
                    elif name == b"charset":
                        charset = value
                        need_pragma = False
                if need_pragma is None or (need_pragma and not got_pragma):
                    continue
                if not charset:
                    continue
                label = charset.strip(b"\t\n\x0c\r ")
                try:
                    text = label.decode("ascii").lower()
                except UnicodeDecodeError:
                    continue
                if text == "x-user-defined":
                    return b"windows-1252"
                if text not in _KNOWN_LABELS:
                    continue  # spec: unknown label → keep scanning
                if text in ("utf-16", "utf-16le", "utf-16be"):
                    return b"utf-8"
                return label
            nxt = data[pos + 1:pos + 2]
            if nxt.isalpha() or (
                nxt == b"/" and data[pos + 2:pos + 3].isalpha()
            ):
                # a tag: '>' inside a QUOTED attribute value must not
                # end it early — but when no quote occurs before the
                # next '>', the tag trivially ends there (C-speed fast
                # path; tag-dense heads would otherwise pay ~1 µs of
                # Python attribute parsing per tag)
                gt = data.find(b">", pos + 1)
                if gt == -1:
                    return None
                dq = data.find(b'"', pos + 1, gt)
                sq = data.find(b"'", pos + 1, gt)
                if dq == -1 and sq == -1:
                    pos = gt + 1
                    continue
                # slow path: skip the name, then drain attributes
                pos += 2
                while pos < n and data[pos] not in _B_WS and data[pos] != 0x3E:
                    pos += 1
                while True:
                    att = _get_attribute(data, pos)
                    if att is None:
                        break
                    _, _, pos = att
                pos += 1  # past '>'
                continue
            if nxt in (b"!", b"/", b"?"):
                end = data.find(b">", pos + 1)
                if end == -1:
                    return None
                pos = end + 1
                continue
            pos += 1
    except _PrescanEOF:
        return None
    return None


def sniff_decode(data: bytes) -> tuple[str, str]:
    """(text, encoding_used). Never raises on real-world bytes: the
    windows-1252 fallback decodes any byte string."""
    if data[:3] == b"\xef\xbb\xbf":
        return data[3:].decode("utf-8", errors="replace"), "utf-8"
    if data[:2] == b"\xff\xfe":
        return data[2:].decode("utf-16-le", errors="replace"), "utf-16-le"
    if data[:2] == b"\xfe\xff":
        return data[2:].decode("utf-16-be", errors="replace"), "utf-16-be"
    label_b = _prescan_meta(data[:1024])
    if label_b is not None:
        label = label_b.decode("ascii", errors="replace")
        enc = _LABELS.get(label)
        if enc == "utf-8":
            return data.decode("utf-8", errors="replace"), "utf-8"
        if enc == "w1252":
            return decode_windows_1252(data), "windows-1252"
        codec = _PY_LABELS.get(label)
        if codec is not None:
            return data.decode(codec, errors="replace"), codec
        # unknown label: fall through to the attempt chain
    try:
        return data.decode("utf-8"), "utf-8"
    except UnicodeDecodeError:
        return decode_windows_1252(data), "windows-1252"
