"""Round-4 regression tests for the r3 ADVICE items and verdict asks:
NULL-safe incremental-dedup oracle (NOT EXISTS), PNM whitespace-after-
maxval validation, balanced DecodeParms extraction with nested dicts,
and the size-gated decontaminate broadcast (AQE still broadcasts small
manifests without the forced hint)."""

import zlib

import duckdb
import pytest


# -- incremental dedup: NULL-text rows must not poison the oracle -----------

def test_incremental_oracle_null_text_matches_spark(spark):
    from html5ever_elixir_spark.operators.dedup import (
        incremental_dedup,
        oracle_incremental_dedup_sql,
    )

    # seen = doc_id % 5 == 0 (includes a NULL text); new = the rest
    # (includes two NULL-text rows and one text already seen)
    rows = [
        (0, None, "en", "web", 0),          # seen, NULL
        (5, "alpha beta", "en", "web", 10),  # seen
        (1, "alpha beta", "en", "web", 10),  # new, dup of seen → dropped
        (2, "gamma delta", "en", "web", 11),  # new, fresh → kept
        (3, None, "en", "web", 0),           # new, NULL → kept (min id)
        (4, None, "en", "web", 0),           # new, NULL dup-in-batch → dropped
        (6, "gamma delta", "en", "web", 11),  # new, dup-in-batch → dropped
    ]
    schema = "doc_id bigint, text string, lang string, source string, n_chars bigint"
    docs = spark.createDataFrame(rows, schema)
    got = {
        r.doc_id
        for r in incremental_dedup(
            docs.where("doc_id % 5 <> 0"), docs.where("doc_id % 5 = 0")
        ).collect()
    }
    assert got == {2, 3}

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents (doc_id BIGINT, text VARCHAR, lang VARCHAR,"
        " source VARCHAR, n_chars BIGINT)"
    )
    con.executemany("INSERT INTO documents VALUES (?, ?, ?, ?, ?)", rows)
    oracle = {
        r[0] for r in con.execute(oracle_incremental_dedup_sql()).fetchall()
    }
    assert oracle == got  # NOT IN would have returned set() here


# -- PNM: byte after maxval must be whitespace; CRLF writers tolerated ------

def _p5(header_sep: bytes, w: int = 2, h: int = 2, trailing: bytes = b"") -> bytes:
    return b"P5 " + f"{w} {h} 255".encode() + header_sep + bytes(range(w * h)) + trailing


def test_pnm_lf_after_maxval_decodes(spark=None):
    from html5ever_elixir_spark.operators.multimodal import _decode_raster

    w, h, px = _decode_raster(_p5(b"\n"))
    assert (w, h) == (2, 2) and px == [0, 1, 2, 3]


def test_pnm_crlf_after_maxval_decodes_unshifted():
    # non-spec CRLF writer: consuming both bytes makes the remaining
    # length exactly match the pixel count → unambiguous, decode clean
    from html5ever_elixir_spark.operators.multimodal import _decode_raster

    w, h, px = _decode_raster(_p5(b"\r\n"))
    assert (w, h) == (2, 2) and px == [0, 1, 2, 3]


def test_pnm_cr_only_with_exact_payload_still_decodes():
    from html5ever_elixir_spark.operators.multimodal import _decode_raster

    w, h, px = _decode_raster(_p5(b"\r"))
    assert px == [0, 1, 2, 3]


def test_pnm_header_ending_at_eof_is_corrupt_not_shifted():
    from html5ever_elixir_spark.operators.multimodal import (
        CorruptRasterError,
        _decode_raster,
    )

    with pytest.raises(CorruptRasterError):
        _decode_raster(b"P5 2 2 255")  # nothing after maxval


def test_pnm_ambiguous_crlf_with_trailing_data_not_eaten():
    # CRLF but remaining length does NOT match need after eating the LF:
    # the LF must be treated as the first pixel byte (value 10), spec rules
    from html5ever_elixir_spark.operators.multimodal import _decode_raster

    payload = b"P5 2 2 255\r" + b"\n" + bytes([1, 2, 3]) + b"xx"
    w, h, px = _decode_raster(payload)
    assert px == [10, 1, 2, 3]


# -- PDF: DecodeParms with a nested dict keeps the predictor keys -----------

def _nested_parms_pdf(content: bytes, columns: int) -> bytes:
    from tests.test_pdf import _png_filter

    flate = zlib.compress(_png_filter(content, columns, 2))
    return (
        b"%PDF-1.4\n1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Contents 4 0 R >>\nendobj\n"
        b"4 0 obj\n<< /Length " + str(len(flate)).encode()
        + b" /Filter /FlateDecode /DecodeParms << /Nested << /A 1 >> "
        b"/Predictor 12 /Columns " + str(columns).encode()
        + b" >> >>\nstream\n" + flate + b"\nendstream\nendobj\n%%EOF"
    )


def test_decodeparms_nested_dict_predictor_still_applied():
    # the old non-greedy regex stopped at the nested dict's ">>" and
    # silently skipped the predictor → garbled text; balanced scan fixes it
    from html5ever_elixir_spark.parser.pdf import extract_pdf_text

    text, n_pages = extract_pdf_text(
        _nested_parms_pdf(b"BT (nested parms ok) Tj ET", 10)
    )
    assert text == "nested parms ok" and n_pages == 1


def test_decodeparms_unterminated_raises_typed_error():
    from html5ever_elixir_spark.parser.pdf import PdfError, _extract_parms

    with pytest.raises(PdfError):
        _extract_parms(b"/DecodeParms << /Predictor 12 /Columns 4 ")


def test_extract_parms_balances_nested():
    from html5ever_elixir_spark.parser.pdf import _extract_parms

    parms = _extract_parms(
        b"/Filter /FlateDecode /DecodeParms << /N << /A 1 >> /Predictor 12 >>"
    )
    assert b"/Predictor 12" in parms and b"/A 1" in parms


# -- decontaminate: un-hinted plan still broadcasts small manifests via AQE --

def test_decontaminate_unhinted_aqe_broadcasts_small_manifest(spark):
    from html5ever_elixir_spark.operators.dedup import decontaminate

    words = "the quick brown fox jumps over the lazy dog again and again ok"
    docs = spark.createDataFrame(
        [(i, words + f" doc {i}") for i in range(40)], "doc_id bigint, text string"
    )
    bench = spark.createDataFrame([(0, words)], "doc_id bigint, text string")
    out = decontaminate(docs, bench)  # broadcast_manifest defaults to None
    rows = out.collect()
    assert len(rows) == 40 and all(r.contaminated for r in rows)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan


def test_decontaminate_forced_hint_still_available(spark):
    from html5ever_elixir_spark.operators.dedup import decontaminate

    docs = spark.createDataFrame(
        [(i, "completely unrelated fresh text " + "x " * 20 + str(i))
         for i in range(10)],
        "doc_id bigint, text string",
    )
    bench = spark.createDataFrame(
        [(0, "the shared benchmark sentence " * 4)], "doc_id bigint, text string"
    )
    out = decontaminate(docs, bench, broadcast_manifest=True)
    rows = out.collect()
    assert len(rows) == 10 and not any(r.contaminated for r in rows)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan


# -- pack_sequences strict mode: hard seq_len budget ------------------------

def test_pack_strict_opens_new_sequence_on_overflow(spark):
    from html5ever_elixir_spark.operators.textstats import pack_sequences

    chunks = spark.createDataFrame(
        [(0, i, f"c{i}", 30) for i in range(3)],
        "doc_id bigint, chunk_idx bigint, chunk_text string, n_chunk_words bigint",
    )
    greedy = {(r.seq_id, r.n_chunks, r.n_words)
              for r in pack_sequences(chunks, seq_len=40).collect()}
    strict = {(r.seq_id, r.n_chunks, r.n_words)
              for r in pack_sequences(chunks, seq_len=40, strict=True).collect()}
    # greedy floor(prev/40): chunk1 lands in seq 0 → 60-word overflow
    assert greedy == {(0, 2, 60), (1, 1, 30)}
    # strict: every chunk would overflow → one sequence per chunk
    assert strict == {(0, 1, 30), (1, 1, 30), (2, 1, 30)}


def test_pack_strict_oversized_chunk_gets_own_sequence(spark):
    from html5ever_elixir_spark.operators.textstats import pack_sequences

    chunks = spark.createDataFrame(
        [(7, 0, "big", 50), (7, 1, "small", 10), (7, 2, "small2", 20)],
        "doc_id bigint, chunk_idx bigint, chunk_text string, n_chunk_words bigint",
    )
    strict = {(r.seq_id, r.n_chunks, r.n_words)
              for r in pack_sequences(chunks, seq_len=40, strict=True).collect()}
    assert strict == {(0, 1, 50), (1, 2, 30)}


def test_pack_strict_budget_holds_on_corpus(spark):
    # property over real sf data: no multi-chunk sequence exceeds seq_len
    from html5ever_elixir_spark.operators.textstats import (
        chunk_documents,
        pack_sequences,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    chunks = chunk_documents(docs, chunk_words=20, overlap=5)
    out = pack_sequences(chunks, seq_len=40, strict=True)
    bad = out.where("n_words > 40 AND n_chunks > 1").count()
    assert bad == 0
