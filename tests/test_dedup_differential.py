"""Differential guard for hash-based dedup operators on text the
ASCII-only driver corpus never exercises (unicode words, empty
strings, repeated whitespace): pure-Python reimplementations of the
md5-derived definitions vs the Spark SQL expressions."""

import hashlib

TEXTS = [
    "héllo wörld ünïcode wörds répeated héllo wörld ünïcode wörds again",
    "中文 文本 处理 测试 中文 文本 处理 测试 中文 文本 处理 测试",
    "mixed ascii and 日本語 and émojis 🙂 in one line of words here",
    "",
    "   ",
    "double  space  between  every  word  pair  here  now  ok  fine",
    "a b c d e f g h i j k l m n o p q r s t",
]


def _py_minhash(text, k=16, shingle=5):
    words = text.split(" ")
    if len(words) < shingle:
        return [None] * k
    shingles = [
        " ".join(words[i : i + shingle])
        for i in range(len(words) - shingle + 1)
    ]
    return [
        min(hashlib.md5(f"{i}:{s}".encode()).hexdigest() for s in shingles)
        for i in range(k)
    ]


def _py_simhash64(text):
    words = list(dict.fromkeys(text.split(" ")))
    out = []
    for start in (0, 8):
        hashes = [
            int(hashlib.md5(w.encode()).hexdigest()[start : start + 8], 16)
            for w in words
        ]
        v = 0
        for i in range(32):
            if 2 * sum((h >> i) & 1 for h in hashes) > len(hashes):
                v |= 1 << i
        out.append(v)
    return tuple(out)


def test_minhash_differential_unicode(spark):
    from html5ever_elixir_spark.operators.dedup import minhash_signatures

    docs = spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: list(r["sig"])
        for r in minhash_signatures(docs).collect()
    }
    for i, t in enumerate(TEXTS):
        assert got[i] == _py_minhash(t), f"doc {i}: {t!r}"


def test_simhash64_differential_unicode(spark):
    from html5ever_elixir_spark.operators.dedup import simhash64

    docs = spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["simhash_hi"], r["simhash_lo"])
        for r in simhash64(docs).collect()
    }
    for i, t in enumerate(TEXTS):
        assert got[i] == _py_simhash64(t), f"doc {i}: {t!r}"


def test_fingerprint_differential_unicode(spark):
    import re

    from html5ever_elixir_spark.operators.textstats import fingerprint

    docs = spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id long, text string"
    )
    got = {r["doc_id"]: r["fp"] for r in fingerprint(docs).collect()}
    for i, t in enumerate(TEXTS):
        norm = re.sub("[ \t\n\r\f]+", " ", t).strip()
        assert got[i] == hashlib.md5(norm.encode()).hexdigest()[:16], repr(t)


# ---------------------------------------------------------------------------
# snapshot_delta: the incremental-recrawl diff


def test_snapshot_delta_statuses(spark):
    from html5ever_elixir_spark.operators.dedup import snapshot_delta

    old = spark.createDataFrame(
        [("u1", "same"), ("u2", "before"), ("u3", "going away")],
        "url string, text string",
    )
    new = spark.createDataFrame(
        [("u1", "same"), ("u2", "after"), ("u4", "brand new")],
        "url string, text string",
    )
    got = {r.url: r for r in snapshot_delta(old, new).collect()}
    assert {u: r.status for u, r in got.items()} == {
        "u1": "unchanged", "u2": "changed", "u3": "gone", "u4": "new",
    }
    assert got["u3"].fp_new is None and got["u4"].fp_old is None
    assert got["u1"].fp_old == got["u1"].fp_new
    assert got["u2"].fp_old != got["u2"].fp_new
