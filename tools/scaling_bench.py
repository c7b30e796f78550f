"""Scaling-efficiency evidence for the north rule: the same extraction
job on the same input at two parallelism levels (local[8] = N,
local[32] = 4N cores — the sandbox proxy for N vs 4N executors).

Protocol (BASELINE.md): the corpus is materialized ONCE as a 256-file
parquet (the local stand-in for a multi-split Iceberg pages table —
exactly how the job consumes data on a real cluster), then each level
runs the identical scan → UTF-8 gate → WHATWG parse → extract → noop
job; 5 timed runs, median throughput, efficiency = (thr_4N/thr_N)/4.
Target ≥ 0.8 (BASELINE.json:2,:14).

Writes BENCH.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from html5ever_elixir_spark.operators.parse import parse_and_extract  # noqa: E402
from html5ever_elixir_spark.session import get_spark  # noqa: E402
from html5ever_elixir_spark.sources.pages import pages_select_sql  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_SMALL = int(os.environ.get("SCALING_N", "8"))      # N cores
N_BIG = 4 * N_SMALL                                   # 4N cores
RUNS = int(os.environ.get("SCALING_RUNS", "5"))
REPLICATE = int(os.environ.get("BENCH_REPLICATE", "8"))
# sf0.1 template docs are ~800 B; real web pages average tens of KB
# (reference sizing note, lib.rs:32-35). HEAVY inflates each page so a
# doc costs a realistic few ms of parse and the job is compute-bound.
HEAVY = int(os.environ.get("SCALING_HEAVY", "8"))
CORPUS = os.environ.get("SCALING_CORPUS", "/tmp/h5s_scaling_pages.parquet")
N_FILES = 256


def prepare_corpus(spark) -> None:
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").repartition(64)
    docs.createOrReplaceTempView("_scaling_docs")
    pages = spark.sql(pages_select_sql("_scaling_docs", "spark"))
    inflated = (
        pages.withColumn(
            "rep", F.explode(F.sequence(F.lit(0), F.lit(REPLICATE - 1)))
        )
        .withColumn("url", F.concat_ws("#", "url", "rep"))
        .withColumn("html", F.expr(f"repeat(html, {HEAVY})"))
        .select("url", "warc_ts", "html", "lang")
        .repartition(N_FILES)
    )
    inflated.write.mode("overwrite").parquet(CORPUS)


def run_level(cores: int) -> tuple[int, list[float]]:
    spark = get_spark(
        app_name=f"scaling-{cores}", master=f"local[{cores}]",
        shuffle_partitions=max(cores * 2, 16),
        extra_conf={"spark.sql.files.maxPartitionBytes": os.environ.get("SCALING_MPB", "300k")},
    )
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet(CORPUS)
    n_docs = pages.count()
    # warmup: fork + import every python worker once
    parse_and_extract(pages.sample(0.02)).write.format("noop").mode(
        "overwrite"
    ).save()
    times = []
    for _ in range(RUNS):
        job = parse_and_extract(spark.read.parquet(CORPUS))
        t0 = time.perf_counter()
        job.write.format("noop").mode("overwrite").save()
        times.append(time.perf_counter() - t0)
    spark.stop()
    return n_docs, times


def _spawn_level(cores: int) -> tuple[int, list[float]]:
    """Run one level in a subprocess pinned to exactly ``cores`` CPUs.

    In local mode the JVM's scan/Arrow/sink threads otherwise spill onto
    idle cores, so an unpinned local[8] really uses ~2× the CPUs and the
    N-vs-4N comparison is meaningless. ``taskset -c 0-{cores-1}``
    confines JVM + python workers to the cluster-size budget, which is
    what an N-core executor allocation enforces via cgroups."""
    import subprocess

    out = subprocess.run(
        ["taskset", "-c", f"0-{cores - 1}", sys.executable, __file__,
         "--level", str(cores)],
        capture_output=True, text=True, check=True,
    )
    payload = json.loads(out.stdout.strip().splitlines()[-1])
    return payload["n_docs"], payload["times"]


def main():
    if len(sys.argv) > 2 and sys.argv[1] == "--level":
        cores = int(sys.argv[2])
        n_docs, times = run_level(cores)
        print(json.dumps({"n_docs": n_docs, "times": times}))
        return
    if not os.path.exists(CORPUS) or os.environ.get("SCALING_REBUILD"):
        shutil.rmtree(CORPUS, ignore_errors=True)
        spark = get_spark(app_name="scaling-prep", master="local[32]")
        spark.sparkContext.setLogLevel("ERROR")
        prepare_corpus(spark)
        spark.stop()
    # interleaved pairs: this sandbox is a shared host with ~2× wall-time
    # noise between minutes; running N and 4N back-to-back inside each
    # round cancels slow-hour bias, then efficiency = median over rounds
    rounds = int(os.environ.get("SCALING_ROUNDS", "3"))
    t8: list[float] = []
    t32: list[float] = []
    effs: list[float] = []
    loadavgs: list[float] = []
    n_docs = 0
    for _ in range(rounds):
        # 1-min loadavg at pair start: the machine-checkable calm/loaded
        # marker (>~2 ⇒ co-tenant drag, treat the pair as contaminated)
        loadavgs.append(round(os.getloadavg()[0], 2))
        n_docs, a = _spawn_level(N_SMALL)
        _, b = _spawn_level(N_BIG)
        m8_r = statistics.median(a)
        m32_r = statistics.median(b)
        t8.extend(a)
        t32.extend(b)
        effs.append((m8_r / m32_r) / 4)
    m8 = statistics.median(t8)
    m32 = statistics.median(t32)
    thr8 = n_docs / m8
    thr32 = n_docs / m32
    eff = statistics.median(effs)
    result = {
        "n_docs": n_docs,
        "sf": SF_DIR,
        "runs": RUNS,
        "median_sec_local8": round(m8, 3),
        "median_sec_local32": round(m32, 3),
        "docs_per_sec_local8": round(thr8, 1),
        "docs_per_sec_local32": round(thr32, 1),
        "scaling_efficiency_8_to_32": round(eff, 3),
        "per_round_efficiency": [round(e, 3) for e in effs],
        "all_times_local8": [round(t, 3) for t in t8],
        "all_times_local32": [round(t, 3) for t in t32],
        "loadavg_at_pair_start": loadavgs,
    }
    print(json.dumps(result))
    if os.environ.get("SCALING_APPEND", "1") == "1" and os.path.exists("BENCH.md"):
        # BENCH.md is a curated multi-run record: append this run's row
        # under the protocol-runs table instead of rewriting the file
        la = "/".join(f"{v:.1f}" for v in loadavgs)
        stamp = (
            f"| run ({rounds} pairs, loadavg {la}) | see JSON "
            f"| {thr8:,.0f} | {thr32:,.0f} "
            f"| {eff:.3f} | {', '.join(f'{e:.2f}' for e in effs)} |\n"
        )
        with open("BENCH.md") as f:
            content = f.read()
        marker = "## Measurement context"
        if marker in content:
            head, tail = content.split(marker, 1)
            with open("BENCH.md", "w") as f:
                f.write(head.rstrip("\n") + "\n" + stamp + "\n" + marker + tail)
            return
    md = f"""# BENCH — measured throughput & scaling efficiency

End-to-end extraction job (UTF-8 gate → from-scratch WHATWG HTML5
parse → DOM metrics → main-content extraction → noop sink) over a
{N_FILES}-file parquet pages corpus ({n_docs:,} docs ≈
{REPLICATE}×documents, html ×{HEAVY} ≈ several KB/doc), the local
stand-in for a multi-split Iceberg pages table. Same input at two
parallelism levels per the north rule's two-cluster-size criterion
(sandbox proxy: local[8] = N, local[32] = 4N cores;
BASELINE.json:14). {RUNS} timed runs per level, median.

| level | docs | median sec | docs/sec |
|---|---|---|---|
| local[8]  (N)  | {n_docs:,} | {m8:.2f} | {thr8:,.0f} |
| local[32] (4N) | {n_docs:,} | {m32:.2f} | {thr32:,.0f} |

**Scaling efficiency (N → 4N) = (thr_4N / thr_N) / 4 = {eff:.3f}**
(target ≥ 0.8, BASELINE.json:2)

Machine ceiling context (pure-CPU multiprocessing on this box):
arithmetic loop scales 8→32 at ~0.87 efficiency; the identical parse
workload under multiprocessing scales at ~0.84 — hyperthread /
shared-host effects, not Spark overhead, set the ceiling.

Raw times: local[8] {result['all_times_local8']}, local[32]
{result['all_times_local32']}. Generated by `tools/scaling_bench.py`.
"""
    with open("BENCH.md", "w") as f:
        f.write(md)


if __name__ == "__main__":
    main()
