"""long_dup_spans: exact-substring (>= L tokens) duplicate-span
removal — brute-force reference parity, within-doc repeats, interval
merging, and DuckDB-oracle cross-engine parity on the same rows."""

import duckdb
import pytest

from html5ever_elixir_spark.operators.dedup import (
    long_dup_spans,
    oracle_long_dup_spans_sql,
)


def _brute(rows, ln, min_count=2):
    """Reference: union of extents of L-grams occurring >= min_count
    times corpus-wide, merged to maximal intervals per doc."""
    from collections import Counter

    grams = Counter()
    toks = {}
    for did, text in rows:
        ws = text.split(" ")
        toks[did] = ws
        for i in range(len(ws) - ln + 1):
            grams[tuple(ws[i : i + ln])] += 1
    out = {}
    for did, ws in toks.items():
        covered = set()
        for i in range(len(ws) - ln + 1):
            if grams[tuple(ws[i : i + ln])] >= min_count:
                covered.update(range(i, i + ln))
        ivs = []
        for p in sorted(covered):
            if ivs and p <= ivs[-1][1]:
                ivs[-1][1] = p + 1
            else:
                ivs.append([p, p + 1])
        spans = ",".join(f"{s}-{e}" for s, e in ivs)
        clean = " ".join(w for i, w in enumerate(ws) if i not in covered)
        out[did] = (len(ivs), len(covered), spans, clean)
    return out


def _collect(df):
    return {
        r.doc_id: (r.n_spans, r.dup_tokens, r.spans, r.clean_text)
        for r in df.collect()
    }


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


WORDS = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()


def _text(seed, n):
    # seed-tagged tokens: cross-doc gram collisions are impossible, so
    # only the blocks each test plants are duplicated
    return " ".join(
        WORDS[(seed * 7 + i * 3) % 10] + str((seed + i) % 13) + "s"
        + str(seed)
        for i in range(n)
    )


def test_brute_force_parity(spark):
    common = " ".join(f"c{i}" for i in range(8))  # 8-token shared block
    rows = [
        (0, common + " " + _text(0, 12)),
        (1, _text(1, 5) + " " + common + " " + _text(11, 9)),
        (2, _text(2, 20)),                      # no duplication
        (3, common + " " + _text(3, 2) + " " + common),  # within-doc too
    ]
    ln = 6
    got = _collect(long_dup_spans(_mk(spark, rows), min_tokens=ln))
    assert got == _brute(rows, ln)


def test_no_duplicates_roundtrip(spark):
    rows = [(0, _text(0, 30)), (1, _text(5, 25))]
    got = _collect(long_dup_spans(_mk(spark, rows), min_tokens=10))
    for did, (n, d, s, clean) in got.items():
        assert (n, d, s) == (0, 0, "")
        assert clean == dict(rows)[did]


def test_within_doc_repeat_counts(spark):
    # the duplicated block occurs twice in ONE doc only — both extents
    # must be covered (occurrence count, not distinct-doc count)
    block = " ".join(f"b{i}" for i in range(6))
    rows = [(0, block + " mid1x mid2x " + block), (1, _text(9, 15))]
    got = _collect(long_dup_spans(_mk(spark, rows), min_tokens=6))
    assert got[0][0] == 2 and got[0][1] == 12
    assert got[0][3] == "mid1x mid2x"
    assert got == _brute(rows, 6)


def test_adjacent_extents_merge(spark):
    # a 2L-token shared run must come out as ONE maximal span, not two
    block = " ".join(f"m{i}" for i in range(12))
    rows = [
        (0, block + " " + _text(0, 6)),
        (1, _text(4, 7) + " " + block),
    ]
    got = _collect(long_dup_spans(_mk(spark, rows), min_tokens=6))
    assert got[0][:3] == (1, 12, "0-12")
    assert got[1][:3] == (1, 12, "7-19")
    assert got == _brute(rows, 6)


def test_short_docs_no_grams(spark):
    rows = [(0, "one two"), (1, "one two")]  # < L tokens: never spans
    got = _collect(long_dup_spans(_mk(spark, rows), min_tokens=5))
    assert got[0] == (0, 0, "", "one two")


@pytest.mark.parametrize("ln", [5, 9])
def test_duckdb_oracle_parity(spark, ln):
    common = " ".join(f"x{i}" for i in range(ln + 4))
    rows = [
        (i, (common + " " if i % 2 == 0 else "") + _text(i, 14)
         + (" " + common if i % 3 == 0 else ""))
        for i in range(12)
    ]
    got = _collect(long_dup_spans(_mk(spark, rows), min_tokens=ln))
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents (doc_id BIGINT, text VARCHAR)"
    )
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    ora = {
        r[0]: (r[1], r[2], r[3], r[4])
        for r in con.execute(
            oracle_long_dup_spans_sql("text", min_tokens=ln)
        ).fetchall()
    }
    assert got == ora == _brute(rows, ln)
