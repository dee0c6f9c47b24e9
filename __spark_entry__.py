"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship: catalog extraction over sf0.001 (the engine's
                 core workload — parquet_catalog source → asset DataFrame).
queries()     -> every implemented operator from SURVEY.md §2 plus the
                 beyond-reference training-data operators (dedup incl.
                 clustering + incremental, similarity search, text
                 hygiene/quality/chunking, sampling, range join,
                 streaming incl. session windows, stream-static and
                 stream-stream joins, drift/contamination/sketch ops) —
                 98 entries, 91 with exact DuckDB oracles.
oracle_sql()  -> DuckDB-equivalent SQL per query (see meteor_spark.queries;
                 the 7 approximate/iterative operators are rows-only and
                 have no oracle).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import meteor_spark.sources  # noqa: F401 — registers extractors
import meteor_spark.processors  # noqa: F401
import meteor_spark.sinks  # noqa: F401
from meteor_spark.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: extract the full catalog of sf0.001 as asset records."""
    from meteor_spark.registry import extractors
    from pyspark.sql import functions as F

    ex = extractors.get("parquet_catalog")
    ex.init({"path": "/root/testdata/sf0.001", "include_row_count": True})
    assets = ex.extract(spark)
    return assets.select(
        F.col("resource.urn").alias("urn"),
        F.col("resource.name").alias("table_name"),
        F.col("asset_type"),
        F.size("schema").alias("n_columns"),
        F.col("profile.total_rows").alias("total_rows"),
    ).orderBy("table_name")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
