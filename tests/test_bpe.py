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
