"""spark-submit entrypoint for the extraction pipeline.

Cluster usage (north rule: multi-executor, --py-files deployment):

    python tools/package.py   # builds dist/html5ever_elixir_spark.zip
    spark-submit \
      --master <cluster> \
      --py-files dist/html5ever_elixir_spark.zip \
      jobs/run_extraction.py \
      --input  <pages parquet/iceberg path, or WARC dir with --input-format warc> \
      --output <output dir> \
      --buckets 4096 --groups 64

Resumable: re-submitting with the same --output skips completed bucket
groups (lineage manifest). Sandbox smoke: --master local[8].
"""

from __future__ import annotations

import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--input-format", choices=["pages", "warc"],
                    default="pages",
                    help="'pages' = parquet/Iceberg pages table; "
                         "'warc' = directory of .warc/.warc.gz files "
                         "(binaryFile scan -> WARC record walk)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--groups", type=int, default=4)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--encoding", choices=["strict", "sniff"],
                    default="strict",
                    help="'sniff' = WHATWG BOM/meta-prescan/cp1252 "
                         "crawl decode instead of strict-UTF-8 errors")
    ap.add_argument("--emit-markdown", action="store_true",
                    help="populate the markdown output column (pinned "
                         "v1 HTML→Markdown) from the same single parse")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from html5ever_elixir_spark.plans.pipeline import run_extraction_pipeline
    from html5ever_elixir_spark.sources.catalog import read_pages

    spark = SparkSession.builder.appName("h5s-extraction").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    # path → parquet; table identifier → configured catalog (Iceberg in
    # production)
    warc_obs = None
    if args.input_format == "warc":
        from pyspark.sql import Observation
        from pyspark.sql import functions as F

        from html5ever_elixir_spark.sources.warc import warc_to_pages

        # binaryFile partitions are packed by SIZE (maxPartitionBytes;
        # a big non-splittable .warc.gz gets its own partition), so one
        # Arrow batch never carries more than ~max(maxPartitionBytes,
        # one file) of blob bytes; per-file ceiling is binaryFile's
        # 2 GiB (int32 Arrow offsets). The record walk itself streams
        # member-by-member (sources/warc.py), so worker memory is
        # compressed blob + one inflated member, not the whole corpus.
        blobs = (
            spark.read.format("binaryFile")
            .option("pathGlobFilter", "*.warc*")
            .load(args.input)
            .select(
                F.xxhash64("path").alias("warc_id"), F.col("content")
            )
        )
        # error metrics ride the pipeline's own actions via observe()
        # (plans/pipeline.py pattern) — the r5 version ran a .count()
        # probe here that re-parsed every blob a second time
        warc_obs = Observation("warc-ingest")
        recs = warc_to_pages(blobs).observe(
            warc_obs,
            F.count(F.lit(1)).alias("warc_rows"),
            F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0))
            .alias("warc_error_rows"),
        )
        # keep 200s (and records whose status line didn't parse): 3xx/
        # 4xx/5xx bodies are redirect stubs / error pages, not training
        # text — the standard crawl-curation filter
        pages = recs.where(
            "error IS NULL AND (http_status IS NULL OR http_status = 200)"
        ).select(
            "url",
            F.to_timestamp(
                F.replace(F.replace("warc_ts", F.lit("T"), F.lit(" ")),
                          F.lit("Z"), F.lit(""))
            ).alias("warc_ts"),
            "html",
        )
    else:
        pages = read_pages(spark, args.input)
    summary = run_extraction_pipeline(
        spark,
        pages,
        args.output,
        n_buckets=args.buckets,
        n_groups=args.groups,
        resume=not args.no_resume,
        encoding=args.encoding,
        emit_markdown=args.emit_markdown,
    )
    if warc_obs is not None and summary["groups_run"]:
        # safe to fetch only when an action actually ran the lineage
        # (resume-complete jobs never execute the WARC scan)
        stats = warc_obs.get
        summary["warc_rows"] = int(stats["warc_rows"] or 0)
        summary["warc_error_rows"] = int(stats["warc_error_rows"] or 0)
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
