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
      [--rates en=0.9,de=1.0] [--chunk-words 200] [--overlap 20] \
      [--long-spans [15]]   # v3: ExactSubstr long-span scrub + BPE ledger

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
    ap.add_argument("--long-spans", nargs="?", const=15, default=None,
                    type=int, metavar="MIN_TOKENS",
                    help="v3 flow (requires --benchmark): remove "
                         "corpus-wide duplicated >=MIN_TOKENS-token "
                         "spans and emit a per-chunk n_bpe_tokens "
                         "ledger column")
    ap.add_argument("--chunk-words", type=int, default=200)
    ap.add_argument("--overlap", type=int, default=20)
    args = ap.parse_args()

    from pyspark.sql import Observation, SparkSession
    from pyspark.sql import functions as F

    from html5ever_elixir_spark.plans.curation import (
        run_curation,
        run_curation_v2,
        run_curation_v3,
    )

    spark = SparkSession.builder.appName("h5s-curation").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    docs = spark.read.parquet(args.input)
    if args.long_spans is not None and not args.benchmark:
        ap.error("--long-spans requires --benchmark (the v3 flow)")
    if args.benchmark and args.long_spans is not None:
        chunks = run_curation_v3(
            docs, spark.read.parquet(args.benchmark),
            _parse_rates(args.rates), args.chunk_words, args.overlap,
            span_tokens=args.long_spans,
        )
    elif args.benchmark:
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
        *( [F.sum("n_bpe_tokens").alias("n_bpe_tokens")]
           if args.long_spans is not None else [] ),
    ).write.mode("overwrite").parquet(args.output)
    stats = obs.get
    out = {
        "n_chunks": stats["n_chunks"],
        "n_docs_approx": stats["n_docs_approx"],
        "n_words": stats["n_words"],
        "output": args.output,
    }
    if args.long_spans is not None:
        out["n_bpe_tokens"] = stats["n_bpe_tokens"]
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
