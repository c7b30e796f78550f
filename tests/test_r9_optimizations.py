"""r9 optimization-round regression tests: the restructured operators
must keep their values AND their new plan shapes (guide §2/§3 — the
self-join-free bucketed pair generation, the map-side keeper argmax,
the balanced WARC walk)."""

from pyspark.sql import functions as F

from html5ever_elixir_spark.operators import dedup


def _texts_df(spark, n=60):
    rows = []
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
             "eta", "theta", "iota", "kappa"]
    for i in range(n):
        # overlapping shingles so LSH actually buckets; some dup pairs
        base = words[i % 3 :] + words[: i % 3]
        rows.append((i, " ".join(base * 2)))
    rows.append((n, None))  # null text
    rows.append((n + 1, "too short"))  # < shingle words
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_lsh_pairs_join_free_and_values(spark):
    docs = _texts_df(spark)
    pairs = dedup.lsh_candidate_pairs(docs)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    # r9: in-bucket pair generation — no join operator anywhere
    assert "Join" not in plan
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    # reference: the pre-r9 self-join formulation
    banded = dedup._lsh_banded(docs, "text", "doc_id", 16, 4, 5)
    from pyspark.sql import Window

    w = Window.partitionBy("band", "bh")
    capped = (
        banded.withColumn("_bsz", F.count("*").over(w))
        .where(F.col("_bsz") <= dedup.DEFAULT_MAX_BUCKET)
        .drop("_bsz")
    )
    a, b = capped.alias("a"), capped.alias("b")
    want = {
        (r.id_a, r.id_b)
        for r in a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
        .collect()
    }
    assert got == want and got  # non-empty: the corpus really buckets


def test_hamming_pairs_join_free_and_values(spark):
    rows = [(i, (i * 37) % 4096, (i * 91) % 4096) for i in range(50)]
    rows += [(50, 5, 5), (51, 5, 5), (52, 5, 7)]  # identical + 1-bit
    hashes = spark.createDataFrame(
        rows, "doc_id long, hash_hi long, hash_lo long"
    )
    pairs = dedup.hamming_pairs_64(hashes, max_hamming=3)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    got = {(r.id_a, r.id_b): r.hamming for r in pairs.collect()}
    # brute force
    import itertools

    want = {}
    for (ia, ha, la), (ib, hb, lb) in itertools.combinations(rows, 2):
        d = bin(ha ^ hb).count("1") + bin(la ^ lb).count("1")
        shares = any(
            ((ha >> s) & 0xFFFF) == ((hb >> s) & 0xFFFF)
            for s in (16, 0)
        ) or any(
            ((la >> s) & 0xFFFF) == ((lb >> s) & 0xFFFF)
            for s in (16, 0)
        )
        if d <= 3 and shares:
            want[(min(ia, ib), max(ia, ib))] = d
    assert got == want and (50, 51) in got and got[(50, 51)] == 0


def test_lsh_keepers_matches_keep_longest(spark):
    docs = _texts_df(spark)
    keepers = {r.doc_id for r in dedup.lsh_keepers(docs).collect()}
    want = {
        r.doc_id
        for r in dedup.keep_longest(docs).where("keep").collect()
    }
    assert keepers == want and keepers


def test_warc_to_pages_spread_plan(spark):
    from html5ever_elixir_spark.sources.warc import make_warc, warc_to_pages

    blob = make_warc(
        [("https://x.example/a", "2024-01-01T00:00:00Z", b"<p>hi</p>")],
        gzip_records=True,
    )
    df = spark.createDataFrame([(0, bytearray(blob))],
                               "warc_id long, content binary")
    plan = warc_to_pages(df)._jdf.queryExecution().executedPlan().toString()
    # spread=True (default): round-robin repartition before the walk
    assert "RoundRobinPartitioning" in plan or "roundrobin" in plan.lower()
    plan_off = warc_to_pages(df, spread=False)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "RoundRobinPartitioning" not in plan_off
    # values unchanged by spreading
    rows = warc_to_pages(df).collect()
    assert len(rows) == 1 and bytes(rows[0].html) == b"<p>hi</p>"


def test_crawl_frontier_precap_exact_and_planned(spark):
    """r8 VERDICT weakness #1: the per-host budget window now runs
    behind a salted local top-k (the cap_per_group pre_cap fix) —
    result provably identical, mega-host window state bounded at
    per_host x P."""
    from html5ever_elixir_spark.operators.graph import crawl_frontier

    n = 120
    urls = spark.createDataFrame(
        [
            (i, f"https://h{i % 4}.example/p{i}", f"h{i % 4}.example",
             i % 7 != 0)
            for i in range(n)
        ],
        "doc_id long, url string, host string, allowed boolean",
    ).repartition(6)
    ranks = spark.createDataFrame(
        [(i, (i * 13) % 50) for i in range(n)], "node long, rank long"
    )
    out = crawl_frontier(ranks, urls, per_host=5)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Window") >= 2 and "SPARK_PARTITION_ID" in plan.upper()
    got = {(r.doc_id, r.host_rank) for r in out.collect()}
    # reference: the single-window formulation
    from pyspark.sql import Window

    ranked = urls.where(F.col("allowed")).join(
        ranks.select(F.col("node").alias("doc_id"), "rank"), "doc_id"
    )
    w = Window.partitionBy("host").orderBy(F.desc("rank"), F.asc("doc_id"))
    want = {
        (r.doc_id, r.host_rank)
        for r in ranked.withColumn(
            "host_rank", F.row_number().over(w).cast("bigint")
        ).where(F.col("host_rank") <= 5).collect()
    }
    assert got == want and got
