"""End-to-end extraction pipeline (the north-rule job):

pages → html-not-null filter → latest-capture-per-url dedup (window on
warc_ts) → url-hash bucketing → per-bucket-group parse+extract →
extracted/nodes parquet + per-group lineage rows + per-host metrics —
**resumable**: completed bucket groups are recorded in a lineage
manifest and skipped on restart.

Scale notes (how this behaves at 10^12 docs / 1000 executors):

* Resume granularity is a *bucket group* (contiguous range of url-hash
  buckets). Each group is one Spark job whose output commit is atomic
  (parquet _SUCCESS); a killed run restarts at the first incomplete
  group. On a real crawl the input is partition-pruned per group
  (crawl-date / warc file), so a group re-scan touches only its slice.
* The latest-capture window shuffles on url — the same key the buckets
  use, so AQE can reuse/align exchanges. Parse itself is a narrow map.
* Per-host metrics use **two-phase salted aggregation**: hot hosts (a
  CDN owning 30% of the crawl) would otherwise funnel into one reducer;
  the salt splits each host into SALT partial groups which are then
  re-aggregated — bounded skew at any corpus shape.
* Oversized documents are bounded by the Arrow batch cap
  (maxRecordsPerBatch, session.py), not by salting: parse cost is
  row-local so a 100×-median doc only lengthens its own batch.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, Observation, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.url import host_of
from ..operators.parse import parse_and_extract

SALT = 16


def dedup_latest_capture(pages: DataFrame) -> DataFrame:
    """Keep the newest warc_ts capture per url. md5(html) breaks
    equal-timestamp ties so a resumed/re-run pipeline always keeps the
    SAME capture (byte-identical-per-url output guarantee)."""
    w = Window.partitionBy("url").orderBy(
        F.desc("warc_ts"), F.desc(F.md5(F.col("html").cast("binary")))
    )
    return (
        pages.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def with_bucket(pages: DataFrame, n_buckets: int) -> DataFrame:
    return pages.withColumn(
        "bucket", F.pmod(F.xxhash64("url"), F.lit(n_buckets)).cast("int")
    )


def host_metrics(parsed_with_host: DataFrame) -> DataFrame:
    """Per-host doc/byte/error counts via two-phase salted aggregation
    (skew-safe: a host owning 30% of rows spreads over SALT reducers)."""
    salted = parsed_with_host.withColumn(
        "_salt", F.pmod(F.xxhash64("url"), F.lit(SALT))
    )
    partial = salted.groupBy("host", "_salt").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias("n_errors"),
        F.sum(F.coalesce(F.col("n_text_chars"), F.lit(0))).alias("text_chars"),
        F.sum(F.coalesce(F.col("n_nodes"), F.lit(0))).alias("nodes"),
    )
    return (
        partial.groupBy("host")
        .agg(
            F.sum("n_docs").alias("n_docs"),
            F.sum("n_errors").alias("n_errors"),
            F.sum("text_chars").alias("text_chars"),
            F.sum("nodes").alias("nodes"),
        )
    )


def _lineage_path(output_dir: str) -> str:
    return os.path.join(output_dir, "_lineage")


def completed_groups(output_dir: str) -> set[int]:
    path = _lineage_path(output_dir)
    done = set()
    if os.path.isdir(path):
        for name in os.listdir(path):
            if name.startswith("group-") and name.endswith(".json"):
                try:
                    with open(os.path.join(path, name)) as f:
                        rec = json.load(f)
                except (OSError, json.JSONDecodeError):
                    # unreadable record (crash mid-write, disk fault) —
                    # treat the group as incomplete and re-run it
                    continue
                if rec.get("status") == "complete":
                    done.add(rec["group"])
    return done


def run_extraction_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    output_dir: str,
    n_buckets: int = 64,
    n_groups: int = 4,
    resume: bool = True,
    encoding: str = "strict",
    emit_markdown: bool = False,
) -> dict:
    """Run (or resume) the full pipeline. Returns a summary dict.
    ``encoding="sniff"`` enables the WHATWG crawl decode chain
    (parser/encoding.py) instead of the strict-UTF-8 typed error.
    ``emit_markdown=True`` populates the ``markdown`` output column
    from the same single parse (a second in-memory tree walk, never a
    second parse — the r5 double-scan lesson).

    Output layout:
      {output_dir}/extracted/group=G/   parquet (url, error, text, …)
      {output_dir}/metrics/host_metrics parquet
      {output_dir}/_lineage/group-G.json  per-group lineage record
    """
    os.makedirs(_lineage_path(output_dir), exist_ok=True)
    assert n_buckets % n_groups == 0
    per_group = n_buckets // n_groups

    deduped = with_bucket(
        dedup_latest_capture(pages.where(F.col("html").isNotNull())), n_buckets
    )
    done = completed_groups(output_dir) if resume else set()
    remaining = n_groups - len(done)
    cached = False
    if remaining > 1:
        # each group job would otherwise re-scan + re-dedup the full
        # input (one window shuffle per group). Locally we persist the
        # deduped/bucketed frame once; at warehouse scale the equivalent
        # is a bucketed staging write (or input partitioning that lets
        # each group's scan prune to its own slice).
        deduped = deduped.persist()
        cached = True
    ran = []
    for g in range(n_groups):
        if g in done:
            continue
        lo, hi = g * per_group, (g + 1) * per_group
        t0 = time.time()
        slice_df = deduped.where((F.col("bucket") >= lo) & (F.col("bucket") < hi))
        parsed = parse_and_extract(
            slice_df, encoding=encoding, with_markdown=emit_markdown
        ).withColumn("host", host_of(F.col("url")))
        out_path = os.path.join(output_dir, "extracted", f"group={g}")
        # lineage via observe(): metrics ride the write job itself (the
        # rows observed ARE the rows committed) — the r2 version
        # re-read each group's just-written parquet, one extra scan of
        # every group's own output
        obs = Observation(f"lineage-group-{g}")
        parsed.observe(
            obs,
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias(
                "n_errors"
            ),
            F.sum(F.coalesce(F.col("n_nodes"), F.lit(0))).alias("n_nodes"),
        ).write.mode("overwrite").parquet(out_path)
        stats = obs.get  # available once the write action finished
        rec = {
            "group": g,
            "buckets": [lo, hi],
            "status": "complete",
            "n_docs": stats["n_docs"],
            "n_errors": stats["n_errors"] if stats["n_errors"] is not None else 0,
            "n_nodes": stats["n_nodes"] if stats["n_nodes"] is not None else 0,
            "wall_sec": round(time.time() - t0, 2),
            "extract_version": "1",
        }
        tmp = os.path.join(_lineage_path(output_dir), f"group-{g}.json.tmp")
        with open(tmp, "w") as f:
            json.dump(rec, f)
        os.replace(tmp, os.path.join(_lineage_path(output_dir), f"group-{g}.json"))
        ran.append(g)

    if cached:
        deduped.unpersist()
    # per-host metrics over everything extracted so far (salted agg)
    all_extracted = spark.read.parquet(os.path.join(output_dir, "extracted"))
    host_metrics(all_extracted).write.mode("overwrite").parquet(
        os.path.join(output_dir, "metrics", "host_metrics")
    )
    # total from the lineage records (each counts exactly what its group
    # committed) — no extra full scan of the output. Tolerate unreadable
    # records (same as completed_groups) and ignore stale records from a
    # previous run with a different n_groups.
    total = 0
    records = []
    for name in os.listdir(_lineage_path(output_dir)):
        if name.startswith("group-") and name.endswith(".json"):
            try:
                with open(os.path.join(_lineage_path(output_dir), name)) as f:
                    rec = json.load(f)
            except (OSError, json.JSONDecodeError):
                continue
            if rec.get("status") == "complete" and rec.get("group", -1) < n_groups:
                total += rec.get("n_docs", 0)
                records.append(rec)
    # lineage as a queryable metadata TABLE (Iceberg identifier on a
    # real cluster via the catalog shim; parquet path here) alongside
    # the per-group JSON manifests the resume logic reads
    if records:
        from ..sources.catalog import write_table

        lineage_df = spark.createDataFrame(
            [
                (
                    r["group"], r["buckets"][0], r["buckets"][1],
                    r.get("n_docs", 0), r.get("n_errors", 0),
                    r.get("n_nodes", 0), float(r.get("wall_sec", 0.0)),
                    str(r.get("extract_version", "")),
                )
                for r in sorted(records, key=lambda x: x["group"])
            ],
            "group int, bucket_lo int, bucket_hi int, n_docs bigint, "
            "n_errors bigint, n_nodes bigint, wall_sec double, "
            "extract_version string",
        )
        write_table(
            lineage_df,
            os.path.join(output_dir, "metrics", "lineage"),
            mode="overwrite",
        )
    return {
        "groups_run": ran,
        "groups_skipped": sorted(done),
        "total_docs": total,
    }
