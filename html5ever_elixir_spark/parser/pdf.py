"""Minimal from-scratch PDF text extraction (the north rule's
"PDF/layout parse" alongside the HTML path; the reference repo is
HTML-only, so scope here is the pipeline mandate, not reference parity).

Scope (honest): classic cross-reference PDFs with direct page trees and
Tj/TJ/'/" text-showing operators, optional FlateDecode (stdlib zlib) on
content streams with PNG (10-15) and TIFF (2, 8-bit) predictors,
literal/hex string syntax with escapes, and line-break reconstruction
from Td/TD/T*/Tm moves. Object resolution takes the classic
cross-reference fast path when the tables validate (offsets actually
point at the right `N 0 obj` headers, /Prev and hybrid /XRefStm chains
walked newest-first) and falls back to a full linear scan otherwise —
crawled PDFs routinely carry slightly-off offsets. PDF 1.5+ layouts
are supported: cross-reference STREAMS (W-field rows, Flate +
predictor) and compressed object streams (/ObjStm type-2 entries,
where modern PDFs keep their catalog/pages dicts). Explicitly NOT
handled: encrypted files, CID / composite fonts, ToUnicode CMaps — a
corpus job routes those rows to the error column rather than failing
(same row-level error contract as the HTML parser's invalid-UTF-8
path).

The companion :func:`make_simple_pdf` produces deterministic
single-font PDFs used by the oracle roundtrip gate and tests; its
output always exercises FlateDecode so the extractor's inflate path is
load-bearing, not decorative.
"""

from __future__ import annotations

import re
import zlib

# ---------------------------------------------------------------------------
# writer (deterministic synthetic PDFs for tests/benchmarks — no
# external data, per the driver contract)


def _escape_pdf_string(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def _pdf_show_string(line: str) -> str:
    """A Tj-able string token: literal ( ) syntax for Latin-1 text,
    UTF-16BE hex string (with BOM) otherwise — both forms the reader
    decodes back exactly."""
    try:
        line.encode("latin-1")
    except UnicodeEncodeError:
        return "<FEFF" + line.encode("utf-16-be").hex().upper() + ">"
    return f"({_escape_pdf_string(line)})"


def make_simple_pdf(lines: list[str], lines_per_page: int = 40) -> bytes:
    """One-font (Helvetica) PDF: each text line is one Tj show, pages
    break every ``lines_per_page`` lines. Content streams are
    Flate-compressed. Latin-1 lines use literal strings; anything else
    is written as a BOM-prefixed UTF-16BE hex string."""
    pages = [
        lines[i : i + lines_per_page]
        for i in range(0, max(len(lines), 1), lines_per_page)
    ]
    objs: dict[int, bytes] = {}
    font_id = 3 + 2 * len(pages)
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(len(pages)))
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[2] = (
        f"<< /Type /Pages /Kids [{kids}] /Count {len(pages)} >>".encode()
    )
    for i, page_lines in enumerate(pages):
        page_id = 3 + 2 * i
        content_id = page_id + 1
        ops = ["BT", "/F1 12 Tf", "72 720 Td"]
        for j, line in enumerate(page_lines):
            if j:
                ops.append("0 -14 Td")
            ops.append(f"{_pdf_show_string(line)} Tj")
        ops.append("ET")
        raw = "\n".join(ops).encode("latin-1")
        flate = zlib.compress(raw)
        objs[page_id] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Contents {content_id} 0 R "
            f"/Resources << /Font << /F1 {font_id} 0 R >> >> >>".encode()
        )
        objs[content_id] = (
            f"<< /Length {len(flate)} /Filter /FlateDecode >>\nstream\n".encode()
            + flate
            + b"\nendstream"
        )
    objs[font_id] = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"

    out = bytearray(b"%PDF-1.4\n")
    offsets = {}
    for oid in sorted(objs):
        offsets[oid] = len(out)
        out += f"{oid} 0 obj\n".encode() + objs[oid] + b"\nendobj\n"
    xref_at = len(out)
    n = max(objs) + 1
    out += f"xref\n0 {n}\n".encode()
    out += b"0000000000 65535 f \n"
    for oid in range(1, n):
        out += f"{offsets[oid]:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {n} /Root 1 0 R >>\nstartxref\n{xref_at}\n%%EOF"
    ).encode()
    return bytes(out)



def make_objstm_pdf(lines: list[str], predictor: int = 12) -> bytes:
    """PDF 1.5 layout generator for tests: the document dicts
    (catalog/pages/page) packed in a Flate-compressed object stream,
    the content stream a regular object, and a cross-reference STREAM
    (W [1 4 1], PNG-up predictor by default) — the modern layout
    crawled PDFs overwhelmingly use. Single page, same text model as
    :func:`make_simple_pdf`."""
    ops = ["BT", "/F1 12 Tf", "72 720 Td"]
    for j, line in enumerate(lines):
        if j:
            ops.append("0 -14 Td")
        ops.append(f"{_pdf_show_string(line)} Tj")
    ops.append("ET")
    content = zlib.compress("\n".join(ops).encode("latin-1"))

    dicts = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
        (3, b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"),
    ]
    offs, cat = [], b""
    for _oid, body in dicts:
        offs.append(len(cat))
        cat += body + b"\n"
    header = " ".join(f"{oid} {o}" for (oid, _), o in zip(dicts, offs))
    header = (header + "\n").encode()
    stm_payload = zlib.compress(header + cat)

    out = bytearray(b"%PDF-1.5\n")
    positions: dict[int, int] = {}

    def emit(oid: int, body: bytes) -> None:
        positions[oid] = len(out)
        out.extend(f"{oid} 0 obj\n".encode() + body + b"\nendobj\n")

    emit(4, b"<< /Length " + str(len(content)).encode()
         + b" /Filter /FlateDecode >>\nstream\n" + content + b"\nendstream")
    emit(5, b"<< /Type /ObjStm /N 3 /First " + str(len(header)).encode()
         + b" /Length " + str(len(stm_payload)).encode()
         + b" /Filter /FlateDecode >>\nstream\n" + stm_payload
         + b"\nendstream")

    xref_at = len(out)
    rows = [
        (0, 0, 255),  # free head (field 3 capped to the 1-byte W width)
        (2, 5, 0), (2, 5, 1), (2, 5, 2),      # objects 1-3 in ObjStm 5
        (1, positions[4], 0), (1, positions[5], 0), (1, xref_at, 0),
    ]
    raw = b"".join(
        bytes([t]) + f1.to_bytes(4, "big") + bytes([f2]) for t, f1, f2 in rows
    )
    parms = b""
    if predictor >= 10:  # forward-apply PNG up so the reader undoes it
        rowlen = 6
        filtered = bytearray()
        prev = bytes(rowlen)
        for r in range(0, len(raw), rowlen):
            row = raw[r : r + rowlen]
            filtered.append(2)
            filtered.extend((row[j] - prev[j]) & 0xFF for j in range(rowlen))
            prev = row
        raw = bytes(filtered)
        parms = (b" /DecodeParms << /Predictor 12 /Columns 6 >>")
    xref_payload = zlib.compress(raw)
    emit(6, b"<< /Type /XRef /Size 7 /W [1 4 1] /Root 1 0 R /Length "
         + str(len(xref_payload)).encode() + b" /Filter /FlateDecode"
         + parms + b" >>\nstream\n" + xref_payload + b"\nendstream")
    out.extend(b"startxref\n" + str(xref_at).encode() + b"\n%%EOF")
    return bytes(out)


# ---------------------------------------------------------------------------
# reader

_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b", re.S)
_REF_RE = re.compile(rb"/(\w+)\s+(\d+)\s+\d+\s+R")
_KIDS_RE = re.compile(rb"/Kids\s*\[((?:\s*\d+\s+\d+\s+R)+)\s*\]")
_STREAM_RE = re.compile(rb"stream\r?\n")


class PdfError(ValueError):
    """Unparseable / out-of-scope PDF (row-level error, never job-fatal)."""


# direct /Length only — negative lookaheads reject the indirect form
# '/Length 5 0 R' (matching its object number as a byte count slices the
# stream wrong: Flate fails loudly, uncompressed truncates silently).
# (?!\d) anchors the digit run: without it the engine backtracks on
# '/Length 50 0 R' to capture '5' and sneak past the indirect-ref guard.
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?!\d)(?!\s+\d+\s+R)")


def _object_body_end(data: bytes, hdr_end: int) -> int:
    """Index of this object's 'endobj' (or -1). For stream objects with
    a direct /Length, skip past the stream payload first — compressed
    bytes can legitimately contain the literal text 'endobj'."""
    search_from = hdr_end
    sm = _STREAM_RE.search(data, hdr_end)
    if sm is not None:
        lm = _LENGTH_RE.search(data, hdr_end, sm.start())
        # only if this stream belongs to THIS object (no endobj
        # between the header and the stream keyword)
        if lm is not None and data.find(b"endobj", hdr_end, sm.start()) == -1:
            search_from = sm.end() + int(lm.group(1))
    return data.find(b"endobj", search_from)


_STARTXREF_RE = re.compile(rb"startxref\s+(\d+)")
_XREF_KW_RE = re.compile(rb"[\r\n\t ]*xref[\r\n\t ]+")
_XREF_SUBSEC_RE = re.compile(rb"(\d+)[\t ]+(\d+)[\r\n\t ]+")
_XREF_ENTRY_RE = re.compile(rb"(\d{10})[\t ]+(\d{5})[\t ]+([nf])[\r\n\t ]*")
_OBJ_AT_RE = re.compile(rb"[\r\n\t ]*(\d+)\s+\d+\s+obj\b")


def _int_key(d: bytes, key: bytes):
    m = re.search(rb"/" + key + rb"\s+(\d+)", d)
    return int(m.group(1)) if m else None


def _parse_xref_stream(data: bytes, off: int):
    """Parse a PDF 1.5+ cross-reference STREAM at ``off``. Returns
    (entries, prev, stream_body) where entries is a list of
    (oid, type, f1, f2) rows, or None when the object is not a valid
    xref stream. The stream payload goes through the shared
    Flate + predictor path (xref streams almost always use PNG up)."""
    hm = _OBJ_AT_RE.match(data, off)
    if hm is None:
        return None
    end = _object_body_end(data, hm.end())
    if end == -1:
        return None
    body = data[hm.end():end]
    sm = _STREAM_RE.search(body)
    if sm is None or b"/XRef" not in body[: sm.start()]:
        return None
    head = body[: sm.start()]
    wm = re.search(rb"/W\s*\[\s*(\d+)\s+(\d+)\s+(\d+)\s*\]", head)
    size = _int_key(head, b"Size")
    if wm is None or size is None:
        return None
    a, b, c = (int(g) for g in wm.groups())
    rowlen = a + b + c
    if rowlen == 0 or b == 0:
        return None
    im = re.search(rb"/Index\s*\[([^\]]*)\]", head)
    if im:
        nums = [int(x) for x in re.findall(rb"\d+", im.group(1))]
        index = list(zip(nums[0::2], nums[1::2]))
    else:
        index = [(0, size)]
    raw = _content_stream(body)
    entries = []
    pos = 0
    for start, count in index:
        for i in range(count):
            row = raw[pos : pos + rowlen]
            pos += rowlen
            if len(row) < rowlen:
                return None
            t = int.from_bytes(row[:a], "big") if a else 1
            f1 = int.from_bytes(row[a : a + b], "big")
            f2 = int.from_bytes(row[a + b :], "big") if c else 0
            entries.append((start + i, t, f1, f2))
    return entries, _int_key(head, b"Prev"), body


def _load_objstm(body: bytes) -> list[tuple[int, bytes]] | None:
    """Decode an object stream (/Type /ObjStm): header of N
    (objnum, offset) pairs, then the concatenated object bodies at
    /First + offset. Returns [(objnum, body), ...] in stream order."""
    sm = _STREAM_RE.search(body)
    if sm is None:
        return None
    head = body[: sm.start()]
    n = _int_key(head, b"N")
    first = _int_key(head, b"First")
    if n is None or first is None:
        return None
    content = _content_stream(body)
    nums = [int(x) for x in re.findall(rb"\d+", content[:first])]
    if len(nums) < 2 * n:
        return None
    pairs = list(zip(nums[0 : 2 * n : 2], nums[1 : 2 * n : 2]))
    out = []
    for i, (oid, rel) in enumerate(pairs):
        lo = first + rel
        hi = first + pairs[i + 1][1] if i + 1 < n else len(content)
        if lo > len(content) or hi < lo:
            return None
        out.append((oid, content[lo:hi]))
    return out


def _objects_via_xref(data: bytes) -> dict[int, bytes] | None:
    """Cross-reference fast path: follow the last startxref through the
    /Prev (and hybrid /XRefStm) chain, newest table first, so the
    newest-generation definition wins and freed objects stay deleted.
    Handles BOTH classic tables and PDF 1.5+ xref streams, including
    type-2 entries (objects inside /ObjStm compressed object streams —
    where modern PDFs keep their catalog/pages dicts). Returns None —
    caller falls back to the linear scan — on missing/garbled tables or
    any direct offset that does not actually point at the right
    'N 0 obj' header (crawled PDFs routinely carry slightly-off
    offsets)."""
    sx = None
    for sx in _STARTXREF_RE.finditer(data):
        pass
    if sx is None:
        return None
    if _OBJ_RE.search(data, sx.end()) is not None:
        # object definitions AFTER the newest startxref: an appended
        # incremental update with no xref of its own — the table is
        # stale, only the scan sees the newest definitions
        return None
    offsets: dict[int, int] = {}
    in_objstm: dict[int, tuple[int, int]] = {}
    decided: set[int] = set()
    seen_tables: set[int] = set()
    queue = [int(sx.group(1))]
    while queue:
        off = queue.pop(0)
        if off in seen_tables or not (0 <= off < len(data)):
            return None
        seen_tables.add(off)
        nexts: list[int] = []
        km = _XREF_KW_RE.match(data, off)
        if km is not None:  # classic table
            pos = km.end()
            while True:
                sm = _XREF_SUBSEC_RE.match(data, pos)
                if sm is None:
                    break
                start, count = int(sm.group(1)), int(sm.group(2))
                pos = sm.end()
                for i in range(count):
                    em = _XREF_ENTRY_RE.match(data, pos)
                    if em is None:
                        return None
                    pos = em.end()
                    oid = start + i
                    if oid in decided:
                        continue
                    decided.add(oid)
                    if em.group(3) == b"n" and oid > 0:
                        offsets[oid] = int(em.group(1))
            end = data.find(b"startxref", pos)
            seg = data[pos : end if end != -1 else len(data)]
            # hybrid-reference file: the /XRefStm complements the table
            # and takes priority over /Prev (ISO 32000-1 §7.5.8.4)
            hs = re.search(rb"/XRefStm\s+(\d+)", seg)
            if hs:
                nexts.append(int(hs.group(1)))
            pm = re.search(rb"/Prev\s+(\d+)", seg)
            if pm:
                nexts.append(int(pm.group(1)))
        else:  # xref stream
            try:
                parsed = _parse_xref_stream(data, off)
            except PdfError:
                return None
            if parsed is None:
                return None
            entries, prev, _ = parsed
            for oid, t, f1, f2 in entries:
                if oid in decided or oid == 0:
                    continue
                decided.add(oid)
                if t == 1:
                    offsets[oid] = f1
                elif t == 2:
                    in_objstm[oid] = (f1, f2)
                # t == 0 (free) and unknown types: decided, absent
            if prev is not None:
                nexts.append(prev)
        queue = nexts + queue
    if not offsets and not in_objstm:
        return None
    objs: dict[int, bytes] = {}
    for oid, o in offsets.items():
        hm = _OBJ_AT_RE.match(data, o) if 0 <= o < len(data) else None
        if hm is None or int(hm.group(1)) != oid:
            return None  # off-by-some offset: distrust the whole table
        end = _object_body_end(data, hm.end())
        if end == -1:
            return None
        objs[oid] = data[hm.end():end]
    # materialize type-2 objects from their object streams
    by_stm: dict[int, list[int]] = {}
    for oid, (stm, _idx) in in_objstm.items():
        by_stm.setdefault(stm, []).append(oid)
    for stm, oids in by_stm.items():
        if stm not in objs:
            return None
        try:
            loaded = _load_objstm(objs[stm])
        except PdfError:
            return None
        if loaded is None:
            return None
        bodies = dict(loaded)
        for oid in oids:
            idx = in_objstm[oid][1]
            if idx >= len(loaded) or loaded[idx][0] != oid:
                # index/objnum mismatch: tolerate via the objnum map
                if oid not in bodies:
                    return None
                objs[oid] = bodies[oid]
            else:
                objs[oid] = loaded[idx][1]
    return objs


def _objects(data: bytes) -> dict[int, bytes]:
    """Object id → body bytes (between 'obj' and its 'endobj'). Tries
    the validated xref-table fast path first (no full-file scan on big
    well-formed PDFs), then the linear scan: LAST definition wins,
    matching the newest-generation rule for appended incremental
    updates."""
    objs = _objects_via_xref(data)
    if objs:
        return objs
    objs = {}
    pos = 0
    n = len(data)
    while pos < n:
        m = _OBJ_RE.search(data, pos)
        if m is None:
            break
        end = _object_body_end(data, m.end())
        if end == -1:
            pos = m.end()
            continue
        oid = int(m.group(1))
        objs[oid] = data[m.end():end]  # last wins (incremental updates)
        pos = end + 6
    if not objs:
        raise PdfError("no PDF objects found")
    return objs


def _content_stream(body: bytes) -> bytes:
    sm = _STREAM_RE.search(body)
    if sm is None:
        return b""
    lm = _LENGTH_RE.search(body[: sm.start()])
    if lm is not None:
        raw = body[sm.end() : sm.end() + int(lm.group(1))]
    else:
        # no direct /Length: strip exactly ONE optional EOL before
        # endstream — compressed data may legitimately END in 0x0a/0x0d
        # bytes, so rstrip would corrupt the zlib payload
        end = body.rfind(b"endstream")
        raw = body[sm.end():end]
        if raw.endswith(b"\r\n"):
            raw = raw[:-2]
        elif raw.endswith((b"\n", b"\r")):
            raw = raw[:-1]
    if b"/FlateDecode" in body[: sm.start()]:
        try:
            raw = zlib.decompress(raw)
        except zlib.error as e:
            raise PdfError(f"FlateDecode failed: {e}") from None
        raw = _apply_predictor(raw, body[: sm.start()])
    return raw


_PARMS_OPEN_RE = re.compile(rb"/(?:DecodeParms|DP)\s*<<")


def _extract_parms(stream_dict: bytes) -> bytes | None:
    """Extract the /DecodeParms (or /DP) inline dictionary body with
    balanced ``<< >>`` scanning — a non-greedy regex truncates at the
    first ``>>`` of any *nested* dict, silently dropping predictor keys
    that follow it (ADVICE r3). Returns None when the stream has no
    inline DecodeParms dict; raises PdfError on an unterminated one."""
    m = _PARMS_OPEN_RE.search(stream_dict)
    if m is None:
        return None
    depth, i, n = 1, m.end(), len(stream_dict)
    start = i
    while i < n and depth:
        two = stream_dict[i : i + 2]
        if two == b"<<":
            depth += 1
            i += 2
        elif two == b">>":
            depth -= 1
            i += 2
        else:
            i += 1
    if depth:
        raise PdfError("unterminated DecodeParms dictionary")
    return stream_dict[start : i - 2]


def _dict_int(d: bytes, key: bytes, default: int) -> int:
    m = re.search(rb"/" + key + rb"\s+(\d+)", d)
    return int(m.group(1)) if m else default


def _apply_predictor(raw: bytes, stream_dict: bytes) -> bytes:
    """Undo the /DecodeParms predictor after inflate: PNG filters 10-15
    (None/Sub/Up/Average/Paeth per row, ISO 32000-1 §7.4.4.4 via PNG
    spec §9) and TIFF horizontal differencing (predictor 2, 8-bit
    components only). Truncated rows / unknown filter bytes raise
    PdfError (row-level error, never a silent wrong answer)."""
    parms = _extract_parms(stream_dict)
    if parms is None:
        return raw
    predictor = _dict_int(parms, b"Predictor", 1)
    if predictor <= 1:
        return raw
    colors = _dict_int(parms, b"Colors", 1)
    bpc = _dict_int(parms, b"BitsPerComponent", 8)
    columns = _dict_int(parms, b"Columns", 1)
    if predictor == 2:
        if bpc != 8:
            raise PdfError(f"TIFF predictor with BitsPerComponent={bpc}")
        rowlen = columns * colors
        out = bytearray(raw)
        for r0 in range(0, len(out), rowlen):
            row_end = min(r0 + rowlen, len(out))
            for i in range(r0 + colors, row_end):
                out[i] = (out[i] + out[i - colors]) & 0xFF
        return bytes(out)
    if predictor < 10:
        raise PdfError(f"unsupported predictor {predictor}")
    bpp = max(1, (colors * bpc + 7) // 8)
    rowlen = (columns * colors * bpc + 7) // 8
    out = bytearray()
    prev = bytearray(rowlen)
    i, n = 0, len(raw)
    while i < n:
        ft = raw[i]
        i += 1
        if i + rowlen > n:
            raise PdfError("truncated predictor row")
        row = bytearray(raw[i : i + rowlen])
        i += rowlen
        if ft == 1:  # Sub
            for j in range(bpp, rowlen):
                row[j] = (row[j] + row[j - bpp]) & 0xFF
        elif ft == 2:  # Up
            for j in range(rowlen):
                row[j] = (row[j] + prev[j]) & 0xFF
        elif ft == 3:  # Average
            for j in range(rowlen):
                left = row[j - bpp] if j >= bpp else 0
                row[j] = (row[j] + (left + prev[j]) // 2) & 0xFF
        elif ft == 4:  # Paeth
            for j in range(rowlen):
                a = row[j - bpp] if j >= bpp else 0
                b = prev[j]
                c = prev[j - bpp] if j >= bpp else 0
                pp = a + b - c
                pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                row[j] = (row[j] + pred) & 0xFF
        elif ft != 0:
            raise PdfError(f"unknown PNG filter byte {ft}")
        out += row
        prev = row
    return bytes(out)


_TYPE_RE = re.compile(rb"/Type\s*/(Pages|Page)\b")


def _page_content_ids(objs: dict[int, bytes]) -> list[int]:
    """Content-stream object ids in document page order (catalog →
    pages tree → /Contents). Falls back to every stream-bearing object
    in id order when the page tree is missing/broken. The walk is
    iterative with a visited set — a corrupt/malicious /Kids cycle must
    become an error row, never a hung executor task."""
    catalog = next(
        (b for b in objs.values() if b"/Type" in b and b"/Catalog" in b), None
    )
    page_ids: list[int] = []
    visited: set[int] = set()

    def walk(node_id: int):
        stack = [node_id]
        while stack:
            nid = stack.pop()
            if nid in visited or nid not in objs:
                continue
            visited.add(nid)
            body = objs[nid]
            tm = _TYPE_RE.search(body)
            node_type = tm.group(1) if tm else None
            km = _KIDS_RE.search(body)
            if node_type == b"Pages" or (node_type is None and km):
                if km:
                    kids = [
                        int(rm.group(1))
                        for rm in re.finditer(rb"(\d+)\s+\d+\s+R", km.group(1))
                    ]
                    stack.extend(reversed(kids))  # preserve document order
            elif node_type == b"Page":
                # /Contents is a single ref or an array of refs
                am = re.search(rb"/Contents\s*\[([^\]]*)\]", body)
                if am:
                    for rm in re.finditer(rb"(\d+)\s+\d+\s+R", am.group(1)):
                        page_ids.append(int(rm.group(1)))
                else:
                    for name, ref in _REF_RE.findall(body):
                        if name == b"Contents":
                            page_ids.append(int(ref))

    if catalog is not None:
        for name, ref in _REF_RE.findall(catalog):
            if name == b"Pages":
                walk(int(ref))
    if not page_ids:
        # heuristic salvage: every stream-bearing object EXCEPT
        # structural streams (xref / object streams are never page
        # content, and a corrupt one must not fail the salvage)
        page_ids = [
            oid
            for oid in sorted(objs)
            if (sm := _STREAM_RE.search(objs[oid])) is not None
            and b"/XRef" not in objs[oid][: sm.start()]
            and b"/ObjStm" not in objs[oid][: sm.start()]
        ]
    return page_ids


_TOKEN_RE = re.compile(
    rb"\(|<[0-9A-Fa-f\s]*>|\[|\]|/[^\s/\[\]()<>]*|[-+.0-9]+|[A-Za-z'\"*]+"
)


def _parse_literal_string(data: bytes, p: int) -> tuple[str, int]:
    """data[p] is just past '('; returns (decoded, pos past ')')."""
    out = []
    depth = 1
    n = len(data)
    while p < n:
        c = data[p]
        if c == 0x5C:  # backslash
            p += 1
            if p >= n:
                break
            e = data[p]
            if e in b"nrtbf":
                out.append({0x6E: "\n", 0x72: "\r", 0x74: "\t",
                            0x62: "\b", 0x66: "\f"}[e])
                p += 1
            elif e in b"()\\":
                out.append(chr(e))
                p += 1
            elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
                oct_digits = ""
                while p < n and len(oct_digits) < 3 and 0x30 <= data[p] <= 0x37:
                    oct_digits += chr(data[p])
                    p += 1
                out.append(chr(int(oct_digits, 8)))
            elif e in (0x0A, 0x0D):  # line continuation (spec 7.3.4.2):
                # backslash-EOL drops BOTH the backslash and the EOL
                p += 1
                if e == 0x0D and p < n and data[p] == 0x0A:
                    p += 1
            else:  # stray backslash: drop it (spec)
                pass
        elif c == 0x28:  # (
            depth += 1
            out.append("(")
            p += 1
        elif c == 0x29:  # )
            depth -= 1
            if depth == 0:
                return "".join(out), p + 1
            out.append(")")
            p += 1
        else:
            out.append(chr(c))
            p += 1
    raise PdfError("unterminated literal string")


def _extract_stream_text(content: bytes) -> list[str]:
    """Text lines from one content stream's BT/ET blocks."""
    lines: list[str] = []
    cur: list[str] = []
    in_text = False
    pending_strings: list[str] = []
    p = 0
    n = len(content)

    def break_line():
        if cur:
            lines.append("".join(cur))
            cur.clear()

    while p < n:
        m = _TOKEN_RE.search(content, p)
        if m is None:
            break
        tok = m.group(0)
        p = m.end()
        if tok == b"(":
            s, p = _parse_literal_string(content, p)
            pending_strings.append(s)
            continue
        if tok.startswith(b"<") and tok.endswith(b">"):
            hexs = re.sub(rb"\s", b"", tok[1:-1])
            if len(hexs) % 2:
                hexs += b"0"
            raw = bytes.fromhex(hexs.decode())
            if raw.startswith(b"\xfe\xff"):  # UTF-16BE BOM
                # errors='replace': a corrupt hex string (lone
                # surrogate) must degrade to U+FFFD, not escape as a
                # non-PdfError exception from the extraction contract
                pending_strings.append(
                    raw[2:].decode("utf-16-be", errors="replace")
                )
            else:
                pending_strings.append(raw.decode("latin-1"))
            continue
        if tok == b"BT":
            in_text = True
            pending_strings.clear()
            continue
        if tok == b"ET":
            break_line()
            in_text = False
            continue
        if not in_text:
            continue
        if tok in (b"Tj", b"TJ"):
            cur.extend(pending_strings)
            pending_strings.clear()
        elif tok in (b"'", b'"'):  # move-to-next-line + show
            break_line()
            cur.extend(pending_strings)
            pending_strings.clear()
        elif tok in (b"Td", b"TD", b"T*", b"Tm"):
            break_line()
            pending_strings.clear()
        elif tok in (b"[", b"]"):
            continue  # TJ array brackets; numbers are kerning, ignored
    break_line()
    return lines


def extract_pdf_text(data: bytes) -> tuple[str, int]:
    """(extracted_text, n_pages) for a simple-profile PDF; raises
    :class:`PdfError` on anything out of scope (caller maps it to the
    row-level error column)."""
    if not isinstance(data, (bytes, bytearray, memoryview)):
        raise PdfError("binary input required")
    data = bytes(data)
    if not data.startswith(b"%PDF-"):
        raise PdfError("missing %PDF header")
    if b"/Encrypt" in data:
        raise PdfError("encrypted PDF not supported")
    objs = _objects(data)
    content_ids = _page_content_ids(objs)
    if not content_ids:
        raise PdfError("no page content streams")
    lines: list[str] = []
    for cid in content_ids:
        if cid not in objs:
            raise PdfError(f"dangling /Contents ref {cid}")
        lines.extend(_extract_stream_text(_content_stream(objs[cid])))
    return "\n".join(lines), len(content_ids)
