"""The driver's fixtures have shipped events.ts as TIMESTAMP(NANOS)
(nanos-as-long, round 1) and as timestamp[us]/TIMESTAMP_NTZ (round 2).
These tests pin that every ts entry point normalizes BOTH vintages to
identical values, so a future fixture regeneration cannot silently
change time units under the engine again."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

ROWS = [
    (1, 1_700_000_000_000_000, 10, "click", 1.5),
    (2, 1_700_000_123_456_789, 10, "purchase", 2.5),
    (3, 1_700_003_600_000_000, 11, "view", 0.5),
]


@pytest.fixture(scope="module", params=["us", "ns"])
def events_path(request, tmp_path_factory):
    """The same logical events table written with micros timestamps
    (current fixtures) or nanos stored-as-int64 with the TIMESTAMP(NANOS)
    logical type unavailable to pyarrow -> plain int64 column the way
    Spark surfaces it under nanosAsLong (legacy fixtures)."""
    d = tmp_path_factory.mktemp(f"events_{request.param}")
    path = str(d / "events.parquet")
    if request.param == "us":
        tbl = pa.table(
            {
                "event_id": pa.array([r[0] for r in ROWS], pa.int64()),
                "ts": pa.array([r[1] for r in ROWS], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in ROWS], pa.int64()),
                "event_type": pa.array([r[3] for r in ROWS]),
                "value": pa.array([r[4] for r in ROWS], pa.float64()),
            }
        )
    else:
        tbl = pa.table(
            {
                "event_id": pa.array([r[0] for r in ROWS], pa.int64()),
                "ts": pa.array([r[1] * 1000 for r in ROWS], pa.int64()),
                "user_id": pa.array([r[2] for r in ROWS], pa.int64()),
                "event_type": pa.array([r[3] for r in ROWS]),
                "value": pa.array([r[4] for r in ROWS], pa.float64()),
            }
        )
    pq.write_table(tbl, path)
    return path


def test_batch_read_normalizes_ts(spark, events_path):
    from meteor_spark.io import read_parquet_table

    df = read_parquet_table(spark, events_path)
    assert isinstance(df.schema["ts"].dataType, (T.TimestampType, T.TimestampNTZType))
    from meteor_spark.functions import unix_us

    got = sorted(r[0] for r in df.select(unix_us("ts")).collect())
    assert got == sorted(r[1] for r in ROWS)


def test_streaming_normalize_ts(spark, events_path):
    from meteor_spark.streaming.pipeline import normalize_ts

    raw = spark.read.parquet(events_path)
    out = normalize_ts(raw)
    assert isinstance(out.schema["ts"].dataType, T.TimestampType)
    got = sorted(r[0] for r in out.select(F.unix_micros("ts")).collect())
    assert got == sorted(r[1] for r in ROWS)
