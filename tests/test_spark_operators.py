"""Spark-side operator tests at sf0.001 (fast gate; the full
query-vs-DuckDB-oracle sweep lives in tools/oracle_check.py and runs
per-round via the driver at sf0.01)."""

import pyspark.sql.functions as F
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def pages(spark):
    from html5ever_elixir_spark.sources.pages import pages_from_documents

    return pages_from_documents(spark, SF).cache()


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.limit(5).collect()
    assert len(rows) > 0
    assert set(df.columns) >= {"url", "error", "text", "title", "n_nodes"}
    assert set(e.queries()) >= set(e.oracle_sql())


def test_extraction_parity_vs_fixture_column(spark, pages):
    from html5ever_elixir_spark.operators.parse import parse_and_extract

    parsed = parse_and_extract(pages)
    mism = (
        parsed.join(pages.select("url", F.col("text").alias("expected")), "url")
        .where("text <> expected OR text IS NULL")
        .count()
    )
    assert mism == 0


def test_flat_nodes_structure(spark, pages):
    from html5ever_elixir_spark.operators.parse import flat_parse_nodes

    nodes = flat_parse_nodes(pages.limit(50)).cache()
    assert nodes.where("node_id = 0").where("type <> 'document'").count() == 0
    assert nodes.where("parent_id IS NULL AND node_id <> 0").count() == 0
    # children ids all exist per url
    child = nodes.select("url", F.explode("children").alias("cid"))
    orphan = child.join(
        nodes.select("url", F.col("node_id").alias("cid")), ["url", "cid"],
        "left_anti",
    )
    assert orphan.count() == 0


def test_invalid_utf8_rows_error_not_fail(spark):
    from html5ever_elixir_spark.operators.parse import parse_and_extract
    from html5ever_elixir_spark.parser.api import UTF8_ERROR
    from html5ever_elixir_spark.sources.pages import synth_pages

    parsed = parse_and_extract(synth_pages(spark, 100)).cache()
    errs = parsed.where("error IS NOT NULL")
    assert errs.count() > 0
    assert errs.select("error").first()[0] == UTF8_ERROR
    assert errs.where("text IS NOT NULL").count() == 0
    assert parsed.where("error IS NULL").count() + errs.count() == 100


def test_exact_dedup(spark):
    from html5ever_elixir_spark.operators.dedup import exact_dedup

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "x y")], "doc_id bigint, text string"
    )
    out = {r.text_hash: (r.keep_id, r.group_size) for r in exact_dedup(docs).collect()}
    assert sorted(v for v in out.values()) == [(1, 2), (3, 1)]


def test_minhash_identical_docs_share_all_bands(spark):
    from html5ever_elixir_spark.operators.dedup import lsh_candidate_pairs

    docs = spark.createDataFrame(
        [(1, "w1 w2 w3 w4 w5 w6 w7 w8"), (2, "w1 w2 w3 w4 w5 w6 w7 w8"),
         (3, "z1 z2 z3 z4 z5 z6 z7 z8")],
        "doc_id bigint, text string",
    )
    pairs = [(r.id_a, r.id_b) for r in lsh_candidate_pairs(docs).collect()]
    assert pairs == [(1, 2)]


def test_cosine_topk_self_excluded_and_ranked(spark):
    from html5ever_elixir_spark.operators.similarity import cosine_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    out = cosine_topk(emb, n_queries=3, k=4).collect()
    assert len(out) == 12
    by_q = {}
    for r in out:
        assert r.query_id != r.neighbor_id
        by_q.setdefault(r.query_id, []).append((r.rank, r.sim))
    for q, rs in by_q.items():
        rs.sort()
        sims = [s for _, s in rs]
        assert sims == sorted(sims, reverse=True)


def test_multimodal_plumbing(spark):
    from html5ever_elixir_spark.operators.multimodal import extract_media_features

    media = spark.createDataFrame(
        [(1, "image", bytearray(b"\x01\x02\x03" * 100), (10, 10, "image/fake")),
         (2, "image", None, (0, 0, "image/fake"))],
        "media_id bigint, kind string, payload binary, "
        "meta struct<width:int,height:int,mime:string>",
    )
    out = {r.media_id: r for r in extract_media_features(media).collect()}
    assert out[1].n_bytes == 300
    assert len(out[1].feature) == 8
    assert out[1].decode_error is None
    assert out[2].decode_error is not None
    assert out[2].feature is None


# ---------------------------------------------------------------------------
# WET conversion records (extracted-text WARC): writer + reader


def test_wet_roundtrip_plain_and_gzip(spark):
    from html5ever_elixir_spark.sources.warc import make_wet, wet_to_text

    recs = [
        ("https://a/1", "2024-01-01T00:00:00Z", "hello world"),
        ("https://a/2", "2024-01-01T00:00:01Z", "héllo — unicode ✓"),
        ("https://a/3", "2024-01-01T00:00:02Z", ""),  # empty text survives
    ]
    df = spark.createDataFrame(
        [(0, bytearray(make_wet(recs))),
         (1, bytearray(make_wet(recs, gzip_records=True)))],
        "wet_id long, content binary",
    )
    out = wet_to_text(df).collect()
    assert len(out) == 6 and all(r.error is None for r in out)
    for wid in (0, 1):
        got = sorted(
            (r.url, r.warc_ts, r.text) for r in out if r.wet_id == wid
        )
        assert got == sorted(recs)


def test_wet_reader_skips_response_records_and_flags_bad_blobs(spark):
    from html5ever_elixir_spark.sources.warc import (
        make_warc,
        make_wet,
        wet_to_text,
    )

    mixed = make_warc(
        [("https://a/raw", "2024-01-01T00:00:00Z", b"<html>x</html>")]
    ) + make_wet([("https://a/wet", "2024-01-01T00:00:01Z", "clean text")])
    df = spark.createDataFrame(
        [(0, bytearray(mixed)), (1, bytearray(b"not a warc at all"))],
        "wet_id long, content binary",
    )
    out = wet_to_text(df).collect()
    ok = [r for r in out if r.wet_id == 0]
    bad = [r for r in out if r.wet_id == 1]
    # response record skipped silently; only the conversion row emerges
    assert [(r.url, r.text) for r in ok] == [("https://a/wet", "clean text")]
    assert len(bad) == 1 and bad[0].error is not None and bad[0].url is None
