"""curation v3: long-duplicate-span scrub + per-chunk BPE token ledger
composed into the v2 flow."""

import re

from html5ever_elixir_spark.operators.textstats import DEFAULT_BPE_MERGES
from html5ever_elixir_spark.plans.curation import run_curation_v3


def _ref_bpe_count(text, merges=DEFAULT_BPE_MERGES):
    san = re.sub("[^a-z0-9]+", " ", text.lower()).strip()
    n = 0
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
        n += len(toks)
    return n


BASE1 = ("the quick brown fox jumps over the lazy dog and then runs "
         "far away home again with contact me at bob@example.com now "
         "please and thank you very much indeed friend")
BASE4 = ("a small cat sat on the warm mat and the old dog slept in "
         "the sun for hours while the birds sang in the trees and "
         "children played outside in the garden with a red ball")
SPAN = " ".join(f"boiler{i}" for i in range(16))  # 16-token shared block


def test_v3_long_span_scrubbed_and_bpe_ledger(spark):
    docs = spark.createDataFrame(
        [(1, BASE1 + " " + SPAN, "en", "s"),
         # doc 4 shares ONLY the boilerplate block with doc 1 (low
         # minhash similarity -> different LSH cluster, both survive
         # keep-longest) — ExactSubstr must remove the block from BOTH
         (4, SPAN + " " + BASE4, "en", "s")],
        "doc_id bigint, text string, lang string, source string",
    )
    bench = spark.createDataFrame(
        [(100, "totally unrelated benchmark words only", "en", "s")],
        "doc_id bigint, text string, lang string, source string",
    )
    out = run_curation_v3(
        docs, bench, rates={"en": 1.0}, chunk_words=80, overlap=0,
        span_tokens=15,
    ).collect()
    ids = {r.doc_id for r in out}
    assert ids == {1, 4}
    joined = {
        did: " ".join(r.chunk_text for r in sorted(out, key=lambda r:
                      (r.doc_id, r.chunk_idx)) if r.doc_id == did)
        for did in ids
    }
    # the duplicated block is gone from EVERY occurrence
    assert "boiler0" not in joined[1] and "boiler0" not in joined[4]
    # PII scrub still ran (after span removal)
    assert "[EMAIL]" in joined[1] and "@" not in joined[1]
    # the unique text survived
    assert "quick brown fox" in joined[1]
    assert "small cat sat" in joined[4]
    # the BPE ledger column matches the serial encoder on each chunk
    for r in out:
        assert r.n_bpe_tokens == _ref_bpe_count(r.chunk_text), r
        assert r.n_bpe_tokens >= r.n_chunk_words  # >=1 token per word


def test_v3_without_spans_matches_v2_plus_ledger(spark):
    # corpus with no duplicated >=15-token span: v3 == v2 + the ledger
    from html5ever_elixir_spark.plans.curation import run_curation_v2

    docs = spark.createDataFrame(
        [(1, BASE1, "en", "s"), (4, BASE4, "en", "s")],
        "doc_id bigint, text string, lang string, source string",
    )
    bench = spark.createDataFrame(
        [(100, "totally unrelated benchmark words only", "en", "s")],
        "doc_id bigint, text string, lang string, source string",
    )
    v2 = {(r.doc_id, r.chunk_idx): (r.chunk_text, r.n_chunk_words)
          for r in run_curation_v2(docs, bench, rates={"en": 1.0},
                                   chunk_words=60, overlap=0).collect()}
    v3rows = run_curation_v3(docs, bench, rates={"en": 1.0},
                             chunk_words=60, overlap=0).collect()
    v3 = {(r.doc_id, r.chunk_idx): (r.chunk_text, r.n_chunk_words)
          for r in v3rows}
    assert v2 == v3
    assert all(r.n_bpe_tokens == _ref_bpe_count(r.chunk_text)
               for r in v3rows)
