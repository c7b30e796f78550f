"""Local mirror of the driver's correctness gate: run every
``__spark_entry__.queries()`` entry on Spark AND its ``oracle_sql()``
on DuckDB over the same sf dir, then compare the way the DRIVER does:
both sides to pandas, columns sorted by name, ``sort_values`` over all
columns, dtype-kind strict (int64 vs float64 is a FAIL — DuckDB
HUGEINT sums come back float64), exact values (floats not rounded).

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")

import __spark_entry__ as entry  # noqa: E402
from html5ever_elixir_spark.session import get_spark  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """The driver's canonicalization: columns sorted by name, rows
    sorted by every column (raises TypeError on array columns, exactly
    like the driver's pandas hasher)."""
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def compare(name: str, sdf_pd: pd.DataFrame, ddf_pd: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    try:
        s = canon(sdf_pd)
        d = canon(ddf_pd)
    except TypeError as e:  # unhashable column type → driver err
        return [f"canonicalize error (driver would err): {e}"]
    if list(s.columns) != list(d.columns):
        return [f"cols {list(s.columns)} vs {list(d.columns)}"]
    if len(s) != len(d):
        problems.append(f"rows {len(s)} vs {len(d)}")
    for c in s.columns:
        sk, dk = s[c].dtype.kind, d[c].dtype.kind
        # object-vs-object is fine; int-vs-float is the driver killer
        if sk != dk and {sk, dk} != {"O"}:
            problems.append(f"dtype[{c}] {s[c].dtype} vs {d[c].dtype}")
    if problems:
        return problems
    if len(s) and not s.equals(d):
        for c in s.columns:
            if not s[c].equals(d[c]):
                neq = s[c] != d[c]
                i = int(neq.idxmax())
                problems.append(
                    f"values[{c}] differ, e.g. row {i}: "
                    f"{s[c].iloc[i]!r} vs {d[c].iloc[i]!r}"
                )
                break
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark(master="local[8]")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            sdf_pd = sdf.toPandas()
        except Exception as e:
            print(f"{name:24s} SPARK-ERR {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"{name:24s} rows-only: {len(sdf_pd)} rows")
            continue
        try:
            ddf_pd = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"{name:24s} DUCK-ERR {type(e).__name__}: {e}")
            failures += 1
            continue
        problems = compare(name, sdf_pd, ddf_pd)
        if problems:
            failures += 1
            print(f"{name:24s} FAIL  " + "; ".join(problems))
        else:
            print(f"{name:24s} OK    rows {len(sdf_pd)}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
