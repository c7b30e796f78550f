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

import re

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

# simplified prescan: charset= inside a <meta ...> tag in the first
# 1 KiB (covers both <meta charset=X> and
# <meta http-equiv=... content="text/html; charset=X">)
_META_RE = re.compile(
    rb"<meta[^>]{0,512}?charset\s*=\s*[\"']?\s*([a-zA-Z0-9_\-:]+)",
    re.IGNORECASE | re.DOTALL,
)


def sniff_decode(data: bytes) -> tuple[str, str]:
    """(text, encoding_used). Never raises on real-world bytes: the
    windows-1252 fallback decodes any byte string."""
    if data[:3] == b"\xef\xbb\xbf":
        return data[3:].decode("utf-8", errors="replace"), "utf-8"
    if data[:2] == b"\xff\xfe":
        return data[2:].decode("utf-16-le", errors="replace"), "utf-16-le"
    if data[:2] == b"\xfe\xff":
        return data[2:].decode("utf-16-be", errors="replace"), "utf-16-be"
    m = _META_RE.search(data[:1024])
    if m:
        enc = _LABELS.get(m.group(1).decode("ascii").lower())
        if enc == "utf-8":
            return data.decode("utf-8", errors="replace"), "utf-8"
        if enc == "w1252":
            return decode_windows_1252(data), "windows-1252"
        # unknown label: fall through to the attempt chain
    try:
        return data.decode("utf-8"), "utf-8"
    except UnicodeDecodeError:
        return decode_windows_1252(data), "windows-1252"
