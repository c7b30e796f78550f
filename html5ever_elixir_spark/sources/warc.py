"""WARC container source — the format crawl corpora actually arrive in
(ISO 28500; Common Crawl ships WARC/1.0 response records, usually as
per-record gzip members). The reference repo has no container layer
(it parses bytes you already have); this is north-rule "Common-Crawl-
style pages" source surface.

Reader design for 100 TB: a WARC file is a *byte stream* of records —
one `mapInArrow` call per Arrow batch of (warc_id, content) blobs,
each blob walked iteratively record-by-record (no regex over the whole
payload, no recursion); malformed records become row-level error rows,
never job failures — the same error contract as the HTML/PDF parsers.
Per-record gzip members (the Common Crawl layout) are detected by the
gzip magic and inflated one member at a time via ``zlib``'s
``unused_data`` chaining.

The writer exists for deterministic synthesis (tests/driver gates —
no external data): records sorted by url, WARC-Date from ``warc_ts``,
payload is a minimal HTTP/1.1 response. Writer→reader roundtrip feeds
the SAME extraction oracle as the plain pages path, which makes the
driver's `warc_extract` query an end-to-end crawl-container gate.
"""

from __future__ import annotations

import zlib
from typing import Iterator

from pyspark.sql import DataFrame

PAGES_FIELDS = (
    "url string, warc_ts string, html binary, warc_id bigint, error string"
)


class WarcError(ValueError):
    """Malformed WARC record (row-level error, never job-fatal)."""


def make_warc_record(
    url: str,
    date: str,
    html: bytes,
    rec_type: str = "response",
    http_status: str = "200 OK",
) -> bytes:
    """One WARC/1.0 record with an HTTP response payload."""
    http = (
        f"HTTP/1.1 {http_status}\r\n"
        "Content-Type: text/html; charset=utf-8\r\n"
        f"Content-Length: {len(html)}\r\n\r\n"
    ).encode("ascii") + html
    headers = (
        "WARC/1.0\r\n"
        f"WARC-Type: {rec_type}\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {date}\r\n"
        "Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(http)}\r\n\r\n"
    ).encode("ascii")
    return headers + http + b"\r\n\r\n"


def make_warc(
    records: list[tuple[str, str, bytes]], gzip_records: bool = False
) -> bytes:
    """Concatenated WARC records (optionally per-record gzip members —
    the Common Crawl layout), preceded by a warcinfo record the reader
    must skip."""
    info_body = b"software: html5ever_elixir_spark\r\n"
    info = (
        "WARC/1.0\r\n"
        "WARC-Type: warcinfo\r\n"
        "Content-Type: application/warc-fields\r\n"
        f"Content-Length: {len(info_body)}\r\n\r\n"
    ).encode("ascii") + info_body + b"\r\n\r\n"
    out = [info] + [make_warc_record(u, d, h) for u, d, h in records]
    if gzip_records:
        # per-record gzip members, concatenated (wb9 deterministic)
        def gz(b: bytes) -> bytes:
            co = zlib.compressobj(9, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
            return co.compress(b) + co.flush()

        return b"".join(gz(r) for r in out)
    return b"".join(out)


# Per-blob inflate budget: a hostile tiny gzip member must not expand to
# executor-OOM scale (same bomb discipline as the raster pixel caps).
# Ratio-based with an absolute floor — legitimate crawled text inflates
# ~5-20×, so 128× compressed size is generous; the floor keeps small
# test/driver blobs unconstrained.
_INFLATE_RATIO_CAP = 128
_INFLATE_FLOOR = 256 * 1024 * 1024


def _split_members(data: bytes) -> bytes:
    """Inflate concatenated gzip members into one plain byte stream;
    pass non-gzip data through untouched. Output is budget-capped
    (``max(_INFLATE_FLOOR, _INFLATE_RATIO_CAP × len(data))``) so a
    gzip bomb is a row-level WarcError, not a job failure (ADVICE r5)."""
    if data[:2] != b"\x1f\x8b":
        return data
    budget = max(_INFLATE_FLOOR, _INFLATE_RATIO_CAP * len(data))
    out = bytearray()
    rest = data
    while rest[:2] == b"\x1f\x8b":
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        try:
            # +1 so exceeding the budget is detectable without ever
            # materializing more than budget+1 bytes
            chunk = d.decompress(rest, budget - len(out) + 1)
            while d.unconsumed_tail and not d.eof:
                out += chunk
                if len(out) > budget:
                    raise WarcError("gzip inflate budget exceeded")
                chunk = d.decompress(
                    d.unconsumed_tail, budget - len(out) + 1
                )
        except zlib.error as e:
            raise WarcError(f"gzip member inflate failed: {e}") from None
        out += chunk
        out += d.flush()
        if len(out) > budget:
            raise WarcError("gzip inflate budget exceeded")
        rest = d.unused_data
    if rest:
        raise WarcError("trailing garbage after gzip members")
    return bytes(out)


def parse_warc_records(data: bytes) -> Iterator[dict]:
    """Iterate response records of a (possibly gzipped) WARC byte blob:
    yields {url, date, html} per response record; warcinfo/request/
    metadata records are skipped. Raises WarcError on a structurally
    broken stream (caller maps it to a row-level error)."""
    data = _split_members(bytes(data))
    pos, n = 0, len(data)
    while pos < n:
        # tolerate inter-record padding newlines
        while pos < n and data[pos : pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            return
        if data[pos : pos + 5] != b"WARC/":
            raise WarcError(f"expected WARC/ version line at offset {pos}")
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end == -1:
            raise WarcError("unterminated WARC header block")
        headers: dict[str, str] = {}
        for line in data[pos:hdr_end].split(b"\r\n")[1:]:
            k, sep, v = line.partition(b":")
            if sep:
                headers[k.strip().lower().decode("latin-1")] = (
                    v.strip().decode("latin-1")
                )
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            raise WarcError("missing/invalid WARC Content-Length") from None
        if clen < 0:
            # int('-N') parses; without this guard pos would move
            # BACKWARD and a hostile record could loop the walk forever
            # (ADVICE r5 medium — executor hang, not a row error)
            raise WarcError("negative WARC Content-Length")
        body = data[hdr_end + 4 : hdr_end + 4 + clen]
        if len(body) < clen:
            raise WarcError("truncated WARC record body")
        assert hdr_end + 4 + clen > pos  # the walk strictly advances
        pos = hdr_end + 4 + clen
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri", "")
        date = headers.get("warc-date", "")
        # HTTP payload: status line + headers, then the entity body
        split = body.find(b"\r\n\r\n")
        if split == -1 or not body.startswith(b"HTTP/"):
            raise WarcError(f"record for {url!r}: malformed HTTP payload")
        yield {"url": url, "date": date, "html": body[split + 4 :]}


def warc_to_pages(
    df: DataFrame, id_col: str = "warc_id", content_col: str = "content"
) -> DataFrame:
    """(warc_id, content binary) → one row per response record
    (url, warc_ts string, html binary, warc_id, error). A broken WARC
    blob yields ONE error row carrying its warc_id (error contract of
    the parse/pdf operators); request/warcinfo records are skipped
    silently. mapInArrow: binary end-to-end, 2-column pruned input."""
    import pyarrow as pa
    from pyspark.sql import functions as F

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column(0).to_pylist()
            blobs = batch.column(1).to_pylist()
            out = {"url": [], "warc_ts": [], "html": [], "warc_id": [],
                   "error": []}
            for wid, blob in zip(ids, blobs):
                try:
                    if blob is None:
                        raise WarcError("null payload")
                    for rec in parse_warc_records(blob):
                        out["url"].append(rec["url"])
                        out["warc_ts"].append(rec["date"])
                        out["html"].append(rec["html"])
                        out["warc_id"].append(wid)
                        out["error"].append(None)
                except WarcError as e:
                    out["url"].append(None)
                    out["warc_ts"].append(None)
                    out["html"].append(None)
                    out["warc_id"].append(wid)
                    out["error"].append(str(e))
            yield pa.RecordBatch.from_pydict(
                out,
                schema=pa.schema([
                    ("url", pa.string()), ("warc_ts", pa.string()),
                    ("html", pa.binary()), ("warc_id", pa.int64()),
                    ("error", pa.string()),
                ]),
            )

    pruned = df.select(
        F.col(id_col).cast("bigint").alias("warc_id"),
        F.col(content_col).alias("content"),
    )
    return pruned.mapInArrow(fn, PAGES_FIELDS)
