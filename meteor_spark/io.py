"""Fixture-tolerant parquet reading shared by queries and sources."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_parquet_table(spark: SparkSession, path: str, ts_cols: tuple[str, ...] = ("ts",)) -> DataFrame:
    """Read parquet, tolerating TIMESTAMP(NANOS) columns (Spark has no
    nanos type): enable spark.sql.legacy.parquet.nanosAsLong, then
    truncate nanos-long columns back to microsecond timestamps — the
    same truncation DuckDB applies reading the identical file."""
    try:
        # proactive: avoids a failed-then-retried job when the footer has
        # nanos columns (PARQUET_TYPE_ILLEGAL); harmless for normal files
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:  # noqa: BLE001 — conf may be restricted; fall through
        pass
    df = spark.read.parquet(path)
    for c in ts_cols:
        if c in df.columns and isinstance(df.schema[c].dataType, T.LongType):
            # the conf may have been pre-set, so detect nanos-long here
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"{c} div 1000")))
    return df
