"""Shared column-expression helpers (JVM-side, codegen-friendly)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def unix_us(col: str | Column) -> Column:
    """Epoch microseconds for ANY timestamp flavor the fixtures have
    shipped (TIMESTAMP_LTZ, TIMESTAMP_NTZ aka parquet timestamp[us],
    or nanos-as-long already converted by io.read_parquet_table).

    `F.unix_micros` only accepts TIMESTAMP (with-tz); the driver's
    fixtures currently store timestamp[us] which Spark reads as
    TIMESTAMP_NTZ, so cast first. The session time zone is pinned UTC
    (session.py), making the NTZ->LTZ cast deterministic and the
    result identical to DuckDB's epoch_us() on the same file.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))
