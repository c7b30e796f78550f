"""The end-to-end training-data curation pipeline: the composition the
round's operators exist for.

    quality gate (1 scan, row-local)                 keeps natural-language docs
      → stratified sample (row-local hash gate)      mixture weighting
      → canonical dedup (LSH clusters, keep-longest) one copy per near-dup cluster
      → chunking (row-local explode)                 model-context-sized pieces

Scale shape: the quality+sample gates fuse into the SAME single scan
(both are row-local predicates); the LSH/keep-longest chain is the only
shuffle lineage (it must see the FULL corpus — clustering the gated
subset would miss duplicates that straddle the gate); one semi join
marries the two lineages; chunking is a row-local explode. Every stage
is individually oracle-gated, and the whole composition is gated too
(`curation_chunks`) by chaining the per-stage DuckDB CTEs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.dedup import keep_longest, oracle_keep_longest_sql
from ..operators.sampling import (
    oracle_stratified_sample_sql,
    stratified_sample,
)
from ..operators.textstats import (
    chunk_documents,
    oracle_chunk_sql,
    oracle_quality_filter_sql,
    quality_filter,
)

DEFAULT_RATES = {"en": 0.9}


def run_curation(
    docs: DataFrame,
    rates: dict[str, float] = None,
    chunk_words: int = 200,
    overlap: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """docs → curated training chunks (doc_id, chunk_idx, chunk_text,
    n_chunk_words). See the module docstring for the plan shape."""
    rates = DEFAULT_RATES if rates is None else rates
    gated = stratified_sample(
        quality_filter(docs, text_col, id_col, project=False),
        rates,
        id_col=id_col,
    )
    canon = (
        keep_longest(docs, text_col, id_col)
        .where("keep")
        .select(id_col)
    )
    kept = gated.join(canon, id_col, "semi")
    return chunk_documents(kept, chunk_words, overlap, text_col, id_col)


def oracle_curation_sql(
    table: str = "documents",
    rates: dict[str, float] = None,
    chunk_words: int = 200,
    overlap: int = 20,
) -> str:
    """DuckDB mirror: each stage's oracle embedded as a subquery CTE —
    the composition is exactly the conjunction of the stage gates."""
    rates = DEFAULT_RATES if rates is None else rates
    step = chunk_words - overlap
    qf = oracle_quality_filter_sql(table)
    sm = oracle_stratified_sample_sql(rates, table, select="doc_id")
    kl = oracle_keep_longest_sql(table)
    return f"""
WITH kept AS (
  SELECT d.* FROM {table} d
  WHERE d.doc_id IN (SELECT doc_id FROM ({qf}) _qf)
    AND d.doc_id IN ({sm})
    AND d.doc_id IN (SELECT doc_id FROM ({kl}) _kl WHERE keep)
),
w AS (
  SELECT doc_id, str_split(text, ' ') AS ws FROM kept
  WHERE text IS NOT NULL
),
e AS (
  SELECT doc_id, ws, unnest(generate_series(0,
           greatest(1, ceil((len(ws) - {overlap}) / {step})::INT) - 1)) AS i
  FROM w
)
SELECT doc_id, i::BIGINT AS chunk_idx,
       array_to_string(ws[i * {step} + 1 : i * {step} + {chunk_words}], ' ')
         AS chunk_text,
       len(ws[i * {step} + 1 : i * {step} + {chunk_words}])::BIGINT
         AS n_chunk_words
FROM e
"""
