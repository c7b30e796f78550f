"""Pages-table source abstraction: Iceberg catalog table when available
(the production target per the north rule), parquet path otherwise.

The sandbox has no Iceberg runtime jars, so the fallback is what tests
exercise; on a real cluster pass ``--conf`` for the catalog and a
``catalog.db.pages`` identifier and the same job runs against Iceberg
with snapshot isolation + partition pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.errors import AnalysisException

PAGES_COLUMNS = ["url", "warc_ts", "html", "text", "lang"]


def read_pages(spark: SparkSession, source: str) -> DataFrame:
    """``source`` is either a table identifier (``catalog.db.pages``,
    read via the configured catalog — Iceberg in production) or a
    filesystem path (parquet)."""
    if "://" in source or source.startswith("/"):
        return spark.read.parquet(source)
    try:
        return spark.read.table(source)
    except AnalysisException:
        # unresolvable identifier: treat as a relative path (tests);
        # anything else (auth, catalog config) must propagate
        return spark.read.parquet(source)


def write_table(df: DataFrame, target: str, mode: str = "append") -> None:
    """Write any frame to an Iceberg table identifier (``writeTo`` v2
    API) or a parquet path — used for the pages sink AND the
    lineage/metrics metadata tables the north rule names."""
    if "://" in target or target.startswith("/"):
        df.write.mode(mode).parquet(target)
    elif mode == "append":
        df.writeTo(target).append()
    else:
        df.writeTo(target).createOrReplace()


# pages-specific alias kept for callers/readability
write_pages = write_table
