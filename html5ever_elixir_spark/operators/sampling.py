"""Deterministic sampling for training-data curation: hash-gated
stratified sampling (per-language / per-source keep rates) that is
reproducible across runs, engines, and cluster sizes.

Why hash-gated rather than ``df.sample()``: Bernoulli sampling with a
seed is tied to partition layout (same seed + different partitioning =
different sample), which breaks resume/audit at corpus scale. A pure
function of the row key is layout-independent, join-stable (the same
doc is in or out everywhere it appears), and exactly mirrorable in the
DuckDB oracle. Row-local projection + filter: zero shuffle, fully
codegen'd, scan-pushdown-friendly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 16^8: first 8 md5 hex digits as a uniform draw from [0, 1)
_DENOM = float(1 << 32)


def _uniform_expr(id_col: str, salt: str) -> str:
    """SQL expr: deterministic uniform [0,1) from the row key.
    Spark `conv(hex,16,10)` == DuckDB `('0x'||hex)::BIGINT` (same trick
    as the SimHash word hashes)."""
    return (
        f"cast(conv(substring(md5(concat('{salt}', cast({id_col} as string))), "
        f"1, 8), 16, 10) as double) / {_DENOM}"
    )


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
    salt: str = "h5s",
) -> DataFrame:
    """Keep each row iff u(id) < rate(stratum), where u is the first 8
    md5 hex digits of salt||id scaled to [0,1). E.g. rates
    ``{"en": 0.5, "de": 1.0}`` downsamples English to ~50% and keeps
    all German; strata not listed get ``default_rate``. Changing
    ``salt`` draws an independent sample. Output = input columns."""
    u = _uniform_expr(id_col, salt)
    branches = " ".join(
        f"when {strata_col} = '{k}' then cast({v} as double)"
        for k, v in sorted(rates.items())
    )
    rate = f"case {branches} else cast({default_rate} as double) end"
    return docs.where(F.expr(f"({u}) < ({rate})"))


def oracle_stratified_sample_sql(
    rates: dict[str, float],
    table: str = "documents",
    strata_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
    salt: str = "h5s",
    select: str = "*",
) -> str:
    u = (
        f"cast(('0x' || substr(md5('{salt}' || {id_col}::VARCHAR), 1, 8))"
        f"::BIGINT as double) / {_DENOM}"
    )
    branches = " ".join(
        f"when {strata_col} = '{k}' then cast({v} as double)"
        for k, v in sorted(rates.items())
    )
    rate = f"case {branches} else cast({default_rate} as double) end"
    return f"SELECT {select} FROM {table} WHERE ({u}) < ({rate})"


def cap_per_group(
    docs: DataFrame,
    k: int,
    group_col: str = "source",
    order_col: str = "n_chars",
    id_col: str = "doc_id",
) -> DataFrame:
    """Bound any one group's contribution (the host-bias control of a
    crawl pipeline): keep at most ``k`` rows per group, preferring the
    largest ``order_col`` (ties → smallest id, fully deterministic).
    One shuffle on the group key; the window is O(group size) per
    group — hot hosts cost their own size, never a cross-group sort.
    Output = input columns of the surviving rows."""
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        F.desc_nulls_last(order_col), F.asc(id_col)
    )
    return (
        docs.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def oracle_cap_per_group_sql(
    k: int,
    table: str = "documents",
    group_col: str = "source",
    order_col: str = "n_chars",
    select: str = "doc_id, text, lang, source, n_chars",
) -> str:
    return f"""
SELECT {select} FROM (
  SELECT *, row_number() OVER (PARTITION BY {group_col}
            ORDER BY {order_col} DESC NULLS LAST, doc_id) AS _rn
  FROM {table}
) WHERE _rn <= {k}
"""
