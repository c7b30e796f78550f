"""Deterministic BPE token counting: Spark replace-chain vs a serial
Python reference (Sennrich-order merge application), DuckDB oracle
parity, boundary/overlap behavior, and the token_budget bpe mode."""

import re

import duckdb
import pytest

from html5ever_elixir_spark.operators.textstats import (
    DEFAULT_BPE_MERGES,
    bpe_token_count,
    oracle_bpe_token_count_sql,
    token_budget,
)


def ref_bpe(text, merges=DEFAULT_BPE_MERGES):
    """Serial reference: sanitize; per word, apply each merge in order,
    merging occurrences left-to-right without overlap."""
    san = re.sub("[^a-z0-9]+", " ", text.lower()).strip()
    out = []
    for word in san.split(" ") if san else []:
        toks = list(word)
        for x, y in merges:
            new, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == x and toks[i + 1] == y:
                    new.append(x + y)
                    i += 2
                else:
                    new.append(toks[i])
                    i += 1
            toks = new
        out.extend(toks)
    return out


TEXTS = [
    "The theory of everything",
    "thththth",                      # overlap: left-to-right th th th th
    "banana bandana",                # an-chains
    "attention is all you need",
    "",                              # empty
    "    ",                          # whitespace only
    "...!!!",                        # punctuation only -> empty
    "2000 1999 a00 x20",             # digit merges
    "llll lll ll l",                 # (l,l): no overlap reuse
    "nation station information",    # tion/ation chain
    "esters esterest",               # er/ers/est interactions
    "Mixed CASE and punct-u-ation, 100%",
]


def _spark_rows(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return {
        r.doc_id: (r.n_bpe_tokens, r.n_word_tokens, r.bpe_preview)
        for r in bpe_token_count(df).collect()
    }


def test_matches_serial_reference(spark):
    got = _spark_rows(spark, TEXTS)
    for i, t in enumerate(TEXTS):
        toks = ref_bpe(t)
        san = re.sub("[^a-z0-9]+", " ", t.lower()).strip()
        exp = (
            len(toks),
            len(san.split(" ")) if san else 0,
            "|".join(toks[:8]),
        )
        assert got[i] == exp, f"doc {i}: {t!r}: {got[i]} != {exp}"


def test_merge_actually_compresses(spark):
    got = _spark_rows(spark, ["the the the"])
    n_bpe, n_words, preview = got[0]
    assert preview == "the|the|the"      # t,h->th then th,e->the
    assert n_bpe == 3 and n_words == 3


def test_no_overlap_reuse(spark):
    # [l,l,l,l] -> [ll,ll]; [l,l,l] -> [ll,l] (left-to-right, no reuse)
    got = _spark_rows(spark, ["llll lll"])
    assert got[0][2] == "ll|ll|ll|l"
    assert got[0][0] == 4


def test_duckdb_oracle_parity(spark):
    got = _spark_rows(spark, TEXTS)
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)", list(enumerate(TEXTS))
    )
    ora = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(oracle_bpe_token_count_sql()).fetchall()
    }
    assert got == ora


def test_token_budget_bpe_mode(spark):
    rows = [(i, f"s{i % 2}", t) for i, t in enumerate(TEXTS) if t.strip()]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        r.grp: (r.n_docs, r.n_tokens)
        for r in token_budget(df, mode="bpe").collect()
    }
    exp = {}
    for _, src, t in rows:
        n, c = exp.get(src, (0, 0))
        exp[src] = (n + 1, c + len(ref_bpe(t)))
    assert got == exp


def test_invalid_merge_token_rejected(spark):
    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        bpe_token_count(df, merges=[("a_b", "c")])


# ---------------------------------------------------------------------------
# bpe_train: distributed merge learning (Sennrich training)


def ref_train(texts, n):
    """Serial reference: per round, count adjacent pairs corpus-wide
    (word-internal), take (count DESC, (x,y) ASC), merge everywhere
    left-to-right without overlap."""
    from collections import Counter

    segs = []
    for t in texts:
        san = re.sub("[^a-z0-9]+", " ", t.lower()).strip()
        segs.append(list(san))
    merges = []
    for _ in range(n):
        cnt = Counter()
        for toks in segs:
            for a, b in zip(toks, toks[1:]):
                if a != " " and b != " ":
                    cnt[(a, b)] += 1
        if not cnt:
            break
        mx = max(cnt.values())
        x, y = min(k for k, v in cnt.items() if v == mx)
        merges.append((x, y, mx))
        for si, toks in enumerate(segs):
            new, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == x and toks[i + 1] == y:
                    new.append(x + y)
                    i += 2
                else:
                    new.append(toks[i])
                    i += 1
            segs[si] = new
    return merges


TRAIN_TEXTS = [
    "the theory of the thing",
    "then there is the thin theme",
    "banana and bandana",
    "attention is all you need the end",
    "Punct, CASE and 100% digits 2020!",
]


def test_train_matches_serial_reference(spark):
    from html5ever_elixir_spark.operators.textstats import bpe_train

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TRAIN_TEXTS)],
        "doc_id long, text string",
    )
    got = [
        (r.x, r.y, r.pair_count)
        for r in bpe_train(df, n_merges=6).orderBy("merge_idx").collect()
    ]
    assert got == ref_train(TRAIN_TEXTS, 6)


def test_train_parallelism_invariant(spark):
    from html5ever_elixir_spark.operators.textstats import bpe_train

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TRAIN_TEXTS * 3)],
        "doc_id long, text string",
    )
    outs = []
    for parts in (1, 7):
        rows = bpe_train(df.repartition(parts), n_merges=4).collect()
        outs.append(sorted((r.merge_idx, r.x, r.y, r.pair_count)
                           for r in rows))
    assert outs[0] == outs[1]


def test_train_duckdb_oracle_parity(spark):
    from html5ever_elixir_spark.operators.textstats import (
        bpe_train,
        oracle_bpe_train_sql,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TRAIN_TEXTS)],
        "doc_id long, text string",
    )
    got = [
        (r.merge_idx, r.x, r.y, r.pair_count)
        for r in bpe_train(df, n_merges=5).orderBy("merge_idx").collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)", list(enumerate(TRAIN_TEXTS))
    )
    ora = con.execute(oracle_bpe_train_sql(n_merges=5)).fetchall()
    assert got == [tuple(r) for r in ora]


def test_train_then_encode_roundtrip(spark):
    # the learned table plugs straight into the encoder
    from html5ever_elixir_spark.operators.textstats import (
        bpe_token_count,
        bpe_train,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TRAIN_TEXTS)],
        "doc_id long, text string",
    )
    learned = [
        (r.x, r.y)
        for r in bpe_train(df, n_merges=6).orderBy("merge_idx").collect()
    ]
    got = {
        r.doc_id: (r.n_bpe_tokens, r.bpe_preview)
        for r in bpe_token_count(df, merges=learned).collect()
    }
    for i, t in enumerate(TRAIN_TEXTS):
        toks = ref_bpe(t, learned)
        assert got[i] == (len(toks), "|".join(toks[:8]))
