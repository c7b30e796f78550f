"""Curation pipeline at scale under spark-submit (r4 evidence run):
sf0.1 documents × REPLICATE (default 4 → 160k docs) through
``run_curation`` (quality gate → stratified sample → canonical dedup →
chunk explode) to a noop sink, min of 2 passes.

    python tools/package.py
    spark-submit --master local[32] \
      --py-files dist/html5ever_elixir_spark.zip \
      tools/curation_scale_run.py

Prints ONE JSON line: wall sec, docs/s, shuffle read/write bytes
(summed over completed stages via the UI REST API) and loadavg, and
saves the AQE final plan of the timed run to
``/tmp/h5s_curation_final_plan.txt`` for PLANS.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPLICATE = int(os.environ.get("BENCH_REPLICATE", "4"))
CORPUS = os.environ.get("CURATION_CORPUS", "/tmp/h5s_curation_docs.parquet")
PLAN_OUT = "/tmp/h5s_curation_final_plan.txt"


def _rest(spark, path):
    ui = spark.sparkContext.uiWebUrl
    with urllib.request.urlopen(f"{ui}/api/v1/{path}") as r:
        return json.loads(r.read())


def main():
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from html5ever_elixir_spark.plans.curation import (
        run_curation,
        run_curation_v2,
    )

    loadavg_start = round(os.getloadavg()[0], 2)
    spark = (
        SparkSession.builder.appName("h5s-curation-scale")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", "64")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.exists(CORPUS):
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        (
            docs.withColumn(
                "rep", F.explode(F.sequence(F.lit(0), F.lit(REPLICATE - 1)))
            )
            # distinct ids, interleaved so per-lang/source strata scale
            .withColumn(
                "doc_id", F.col("doc_id") * REPLICATE + F.col("rep")
            )
            .drop("rep")
            .repartition(64)
            .write.mode("overwrite")
            .parquet(CORPUS)
        )
    docs = spark.read.parquet(CORPUS)
    n_docs = docs.count()

    # CURATION_V2=1: the full GPT-3-style flow (+13-gram decontaminate
    # + PII scrub of survivors). The benchmark is an EXTERNAL eval set
    # (sf0.01 documents ≈ the first 10% of the originals): on a
    # REPLICATE-fold corpus an id-split benchmark would share text with
    # every training doc by construction (each original's replicas
    # cover all id residues) and decontamination would correctly drop
    # 100% — measured; the external-suite shape drops ~10% instead,
    # which is the realistic contamination profile
    v2 = os.environ.get("CURATION_V2") == "1"
    bench_dir = os.environ.get("SF_BENCH_DIR", "/root/testdata/sf0.01")

    def run(d):
        if v2:
            bench = spark.read.parquet(f"{bench_dir}/documents.parquet")
            return run_curation_v2(d, bench)
        return run_curation(d)

    # warmup (codegen + python workers)
    run(docs.limit(256)).write.format("noop").mode("overwrite").save()

    best = None
    for _ in range(2):
        chunks = run(docs)
        t0 = time.perf_counter()
        chunks.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best

    app = spark.sparkContext.applicationId
    stages = _rest(spark, f"applications/{app}/stages?status=complete")
    shuffle_write = sum(s.get("shuffleWriteBytes", 0) for s in stages)
    shuffle_read = sum(s.get("shuffleReadBytes", 0) for s in stages)
    try:
        sqls = _rest(
            spark,
            f"applications/{app}/sql?details=true&planDescription=true"
            "&length=1000",
        )
        # the last completed execution is the timed noop write
        plan = sqls[-1].get("planDescription", "")
        with open(PLAN_OUT, "w") as f:
            f.write(plan)
    except Exception as e:  # plan capture is best-effort evidence
        plan = f"(plan capture failed: {e})"

    out_rows = run(docs).count()
    print(
        json.dumps(
            {
                "n_docs": n_docs,
                "replicate": REPLICATE,
                "wall_sec_min_of_2": round(best, 3),
                "docs_per_sec": round(n_docs / best, 1),
                "v2": v2,
                "n_chunks_out": out_rows,
                "shuffle_write_bytes": shuffle_write,
                "shuffle_read_bytes": shuffle_read,
                "loadavg_start": loadavg_start,
                "loadavg_end": round(os.getloadavg()[0], 2),
                "plan_file": PLAN_OUT,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
