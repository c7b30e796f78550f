"""Isolation benchmarks (guide §1.4): time individual sub-stages of the
expensive bench queries with the noop sink so optimization targets the
right stage. NOT the driver bench — bench.py stays frozen.

Usage: python bench_extra.py [group ...]
Groups: ivfpq dhash warc lsh curation parse markdown codecs
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from html5ever_elixir_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PASSES = int(os.environ.get("BENCH_PASSES", "3"))


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    groups = sys.argv[1:] or ["ivfpq"]
    spark = get_spark(app_name="bench_extra")
    spark.sparkContext.setLogLevel("ERROR")
    par = spark.sparkContext.defaultParallelism * 2
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").repartition(par)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").repartition(par)
    timings = {}

    def timed(name, thunk):
        best = None
        for _ in range(PASSES):
            spark.sparkContext.setJobDescription(name)
            t0 = time.perf_counter()
            thunk()
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        timings[name] = round(best, 3)
        print(f"  {name}: {best:.3f}s", flush=True)

    if "ivfpq" in groups:
        from html5ever_elixir_spark.operators import similarity as sim

        # warm python workers
        _noop(emb.limit(8))
        timed("ivfpq/full", lambda: _noop(
            sim.ivf_pq_topk(emb, n_queries=20, k_top=10)))

        def assign_only():
            a, c = sim.ivf_assign(emb, 8, 2)
            _noop(a)
        timed("ivfpq/ivf_assign", assign_only)

        def assign_and_ckpt():
            a, c = sim.ivf_assign(emb, 8, 2)
            c = c.localCheckpoint(eager=True)
            a = a.localCheckpoint(eager=True)
        timed("ivfpq/assign_ckpt", assign_and_ckpt)

    if "dhash" in groups:
        from html5ever_elixir_spark.operators import multimodal as mm

        _noop(docs.limit(8))
        pnms = mm.docs_to_dhash_pnms(docs)
        timed("dhash/pnms_only", lambda: _noop(pnms))
        timed("dhash/hash_only", lambda: _noop(mm.image_dhash(pnms)))
        timed("dhash/pairs_full", lambda: _noop(mm.image_dhash_pairs(pnms)))

    if "warc" in groups:
        import pandas as pd

        from html5ever_elixir_spark.operators.parse import parse_and_extract
        from html5ever_elixir_spark.sources.warc import make_warc, warc_to_pages
        from bench import replicated_pages

        pages = replicated_pages(spark, SF_DIR, 8)
        _noop(parse_and_extract(pages.limit(64)))
        wpages = pages.selectExpr(
            "url", "'2024-01-01T00:00:00Z' AS ts",
            "cast(html as binary) AS html",
            f"pmod(xxhash64(url), {par}) AS grp",
        )

        def _build_warc(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values("url")
            recs = [(u, t, bytes(h))
                    for u, t, h in zip(pdf["url"], pdf["ts"], pdf["html"])]
            return pd.DataFrame({
                "warc_id": [int(pdf["grp"].iloc[0])],
                "content": [make_warc(recs, gzip_records=True)],
            })

        blobs = wpages.groupBy("grp").applyInPandas(
            _build_warc, "warc_id bigint, content binary")
        timed("warc/pages_only", lambda: _noop(pages))
        timed("warc/blobs_only", lambda: _noop(blobs))
        timed("warc/walk_only", lambda: _noop(warc_to_pages(blobs)))
        timed("warc/full", lambda: _noop(parse_and_extract(warc_to_pages(blobs))))

    if "lsh" in groups:
        from html5ever_elixir_spark.operators import dedup

        _noop(docs.limit(8))
        timed("lsh/minhash_sigs", lambda: _noop(
            dedup.minhash_signatures(docs)))
        timed("lsh/banded", lambda: _noop(
            dedup._lsh_banded(docs, "text", "doc_id", 16, 4, 5)))
        timed("lsh/pairs_full", lambda: _noop(dedup.lsh_candidate_pairs(docs)))
        timed("lsh/clusters_full", lambda: _noop(dedup.lsh_clusters(docs)))

    if "curation" in groups:
        from html5ever_elixir_spark.operators.dedup import keep_longest
        from html5ever_elixir_spark.operators.sampling import stratified_sample
        from html5ever_elixir_spark.operators.textstats import (
            chunk_documents, quality_filter)
        from html5ever_elixir_spark.plans.curation import run_curation

        _noop(docs.limit(8))
        timed("curation/gates_only", lambda: _noop(stratified_sample(
            quality_filter(docs, "text", "doc_id", project=False),
            {"en": 0.9}, id_col="doc_id")))
        timed("curation/keep_longest", lambda: _noop(
            keep_longest(docs, "text", "doc_id")))
        timed("curation/chunks_only", lambda: _noop(
            chunk_documents(docs, 200, 20, "text", "doc_id")))
        timed("curation/full", lambda: _noop(run_curation(docs)))

    if "parse" in groups:
        from html5ever_elixir_spark.operators.parse import (
            flat_parse_nodes, parse_and_extract)
        from bench import replicated_pages

        pages = replicated_pages(spark, SF_DIR, 8)
        n_docs = pages.count()
        _noop(parse_and_extract(pages.limit(64)))
        timed("parse/pages_only", lambda: _noop(pages))
        timed("parse/pages_repart", lambda: _noop(
            pages.repartition(par, F.xxhash64("url"))))
        timed("parse/extract_full", lambda: _noop(parse_and_extract(
            pages.repartition(par, F.xxhash64("url")))))
        timed("parse/flat_quarter", lambda: _noop(
            flat_parse_nodes(pages.limit(n_docs // 4).repartition(par))))

    if "markdown" in groups:
        from html5ever_elixir_spark.operators.markdown import (
            docs_to_md_html_expr, to_markdown)
        from html5ever_elixir_spark.operators.tables import (
            docs_to_table_html_expr, extract_table_cells)

        _noop(docs.limit(8))
        n_docs = docs.count()
        md_in = (docs.limit(n_docs // 4 * 8 // 8)
                 .selectExpr("doc_id", docs_to_md_html_expr() + " AS html")
                 .repartition(par))
        timed("markdown/input_only", lambda: _noop(md_in))
        timed("markdown/full", lambda: _noop(to_markdown(md_in, id_col="doc_id")))
        tc_in = (docs.limit(n_docs // 4 * 8 // 8)
                 .selectExpr("doc_id", docs_to_table_html_expr() + " AS html")
                 .repartition(par))
        timed("tables/full", lambda: _noop(
            extract_table_cells(tc_in, id_col="doc_id")))

    print({"timings": timings, "sf": SF_DIR})
    spark.stop()


if __name__ == "__main__":
    main()
