"""Pipeline tests: dedup window, resumability (checkpoint skip), lineage
records, salted host metrics."""

import json
import os

import pyspark.sql.functions as F
import pytest


@pytest.fixture()
def corpus(spark):
    from html5ever_elixir_spark.sources.pages import synth_pages

    base = synth_pages(spark, 120)
    # add stale duplicate captures for 1/3 of urls (older warc_ts)
    stale = (
        base.where(F.expr("pmod(xxhash64(url), 3) = 0"))
        .withColumn("warc_ts", F.expr("warc_ts - interval 1 hour"))
        .withColumn("html", F.lit(bytearray(b"<p>stale capture</p>")))
    )
    return base.unionByName(stale)


def test_dedup_latest_capture(spark, corpus):
    from html5ever_elixir_spark.plans.pipeline import dedup_latest_capture

    deduped = dedup_latest_capture(corpus)
    assert deduped.count() == 120
    assert deduped.groupBy("url").count().where("count > 1").count() == 0
    # the stale capture never survives
    kept = deduped.withColumn("h", F.col("html").cast("string"))
    assert kept.where(F.col("h").contains("stale capture")).count() == 0


def test_pipeline_run_and_resume(spark, corpus, tmp_path):
    from html5ever_elixir_spark.plans.pipeline import run_extraction_pipeline

    out = str(tmp_path / "pipe")
    r1 = run_extraction_pipeline(spark, corpus, out, n_buckets=8, n_groups=4)
    assert r1["groups_run"] == [0, 1, 2, 3]
    assert r1["total_docs"] == 120

    # lineage records exist and are complete
    lineage_dir = os.path.join(out, "_lineage")
    recs = sorted(os.listdir(lineage_dir))
    assert len(recs) == 4
    rec = json.load(open(os.path.join(lineage_dir, recs[0])))
    assert rec["status"] == "complete"
    assert rec["n_docs"] > 0

    # resume: everything skipped, nothing recomputed
    r2 = run_extraction_pipeline(spark, corpus, out, n_buckets=8, n_groups=4)
    assert r2["groups_run"] == []
    assert r2["groups_skipped"] == [0, 1, 2, 3]
    assert r2["total_docs"] == 120

    # partial resume: drop one group's lineage → only that group re-runs
    os.remove(os.path.join(lineage_dir, "group-2.json"))
    r3 = run_extraction_pipeline(spark, corpus, out, n_buckets=8, n_groups=4)
    assert r3["groups_run"] == [2]
    assert r3["total_docs"] == 120


def test_host_metrics_salted(spark, corpus, tmp_path):
    from html5ever_elixir_spark.plans.pipeline import run_extraction_pipeline

    out = str(tmp_path / "pipe2")
    run_extraction_pipeline(spark, corpus, out, n_buckets=8, n_groups=2)
    hm = spark.read.parquet(os.path.join(out, "metrics", "host_metrics"))
    rows = {r.host: r for r in hm.collect()}
    # skew tail: host0 owns ~30% of synth rows
    assert rows["host0.example"].n_docs >= 25
    assert sum(r.n_docs for r in rows.values()) == 120
    # invalid-utf8 docs appear as errors, never dropped
    assert sum(r.n_errors for r in rows.values()) > 0


def test_catalog_source_abstraction(spark, tmp_path):
    # path branch reads parquet; unresolvable identifier falls back to
    # a relative path; other catalog errors propagate
    import pytest
    from pyspark.errors import AnalysisException

    from html5ever_elixir_spark.sources.catalog import read_pages, write_pages

    p = str(tmp_path / "cat_pages")
    df = spark.createDataFrame([("u", "h")], "url string, html string")
    write_pages(df, p, mode="overwrite")
    assert read_pages(spark, p).count() == 1
    with pytest.raises(AnalysisException):
        # relative fallback also fails -> surfaced, not swallowed
        read_pages(spark, "no_such_catalog.db.pages").count()


def test_lineage_metadata_table(spark, tmp_path):
    # the lineage manifest is ALSO written as a queryable table, kept
    # consistent across resume
    import json
    import os

    from html5ever_elixir_spark.plans.pipeline import run_extraction_pipeline
    from html5ever_elixir_spark.sources.pages import synth_pages

    out = str(tmp_path / "lineage_out")
    pages = synth_pages(spark, 40).drop("case_name")
    summary = run_extraction_pipeline(spark, pages, out, n_buckets=8, n_groups=2)
    tbl = {r.group: r for r in
           spark.read.parquet(os.path.join(out, "metrics", "lineage")).collect()}
    assert sorted(tbl) == [0, 1]
    for g in (0, 1):
        with open(os.path.join(out, "_lineage", f"group-{g}.json")) as f:
            rec = json.load(f)
        assert tbl[g].n_docs == rec["n_docs"]
        assert (tbl[g].bucket_lo, tbl[g].bucket_hi) == tuple(rec["buckets"])
    assert sum(r.n_docs for r in tbl.values()) == summary["total_docs"]

    # resume run rewrites the same consistent table
    summary2 = run_extraction_pipeline(spark, pages, out, n_buckets=8, n_groups=2)
    assert summary2["groups_run"] == []
    tbl2 = spark.read.parquet(os.path.join(out, "metrics", "lineage"))
    assert tbl2.count() == 2
