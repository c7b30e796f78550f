"""spark-submit entrypoint for the training-data curation pipeline
(quality gate → stratified sample → canonical dedup → chunking; with
``--benchmark`` the v2 flow adds 13-gram decontamination against that
eval set and PII scrubbing of the survivors before chunking).

    python tools/package.py
    spark-submit --master <cluster> \
      --py-files dist/html5ever_elixir_spark.zip \
      jobs/run_curation.py \
      --input <documents parquet path> --output <chunks dir> \
      [--benchmark <eval-set parquet path>] \
      [--rates en=0.9,de=1.0] [--chunk-words 200] [--overlap 20]

Sandbox smoke: --master local[8].
"""

from __future__ import annotations

import argparse
import json


def _parse_rates(s: str) -> dict[str, float]:
    return {k: float(v) for k, v in (kv.split("=") for kv in s.split(","))}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--benchmark", default=None,
                    help="eval-set parquet; enables the v2 flow "
                         "(decontaminate + PII scrub)")
    ap.add_argument("--rates", default="en=0.9")
    ap.add_argument("--chunk-words", type=int, default=200)
    ap.add_argument("--overlap", type=int, default=20)
    args = ap.parse_args()

    from pyspark.sql import Observation, SparkSession
    from pyspark.sql import functions as F

    from html5ever_elixir_spark.plans.curation import (
        run_curation,
        run_curation_v2,
    )

    spark = SparkSession.builder.appName("h5s-curation").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    docs = spark.read.parquet(args.input)
    if args.benchmark:
        chunks = run_curation_v2(
            docs, spark.read.parquet(args.benchmark),
            _parse_rates(args.rates), args.chunk_words, args.overlap,
        )
    else:
        chunks = run_curation(
            docs, _parse_rates(args.rates), args.chunk_words, args.overlap
        )
    obs = Observation("curation")
    chunks.observe(
        obs,
        F.count(F.lit(1)).alias("n_chunks"),
        # DISTINCT aggregates are invalid in observed metrics
        F.approx_count_distinct("doc_id").alias("n_docs_approx"),
        F.sum("n_chunk_words").alias("n_words"),
    ).write.mode("overwrite").parquet(args.output)
    stats = obs.get
    print(json.dumps({
        "n_chunks": stats["n_chunks"],
        "n_docs_approx": stats["n_docs_approx"],
        "n_words": stats["n_words"],
        "output": args.output,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
