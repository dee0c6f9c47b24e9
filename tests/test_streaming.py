"""Structured Streaming: windowed rollup, streaming dedup, watermark
semantics on bounded input (must equal batch)."""

from __future__ import annotations

from pyspark.sql import functions as F

from meteor_spark.streaming.pipeline import (
    run_stream_to_batch,
    stream_events,
    streaming_dedup,
    windowed_rollup,
)


def test_windowed_rollup_equals_batch(spark, sf_dir):
    out = run_stream_to_batch(windowed_rollup(stream_events(spark, sf_dir)))
    from meteor_spark.queries import events_hourly_rollup

    batch = events_hourly_rollup(spark, sf_dir)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, batch.collect()))


def test_streaming_dedup(spark, sf_dir):
    events = stream_events(spark, sf_dir)
    out = run_stream_to_batch(streaming_dedup(events), output_mode="append")
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    # fixture event_ids are unique -> dedup is a no-op on counts
    assert out.count() == n_events
    assert out.select(F.count_distinct("event_id")).first()[0] == n_events


def test_windowed_rollup_window_alignment(spark, sf_dir):
    out = run_stream_to_batch(windowed_rollup(stream_events(spark, sf_dir), window="1 hour"))
    hours = [r["hour"] for r in out.select("hour").distinct().collect()]
    assert all(h.endswith(":00:00") for h in hours)


def test_incremental_dedup_stream_cross_batch(spark, tmp_path):
    """A duplicate spanning two microbatches must be caught by the
    fingerprint store (batch 2's copy dropped), and corpus re-crawls
    must never survive."""
    import os

    from meteor_spark.streaming.pipeline import incremental_dedup_stream

    corpus = spark.createDataFrame([(1, "alpha text")], "doc_id long, text string")
    b1 = spark.createDataFrame([(10, "bravo text"), (11, "charlie text")], "doc_id long, text string")
    b2 = spark.createDataFrame(
        [(20, "BRAVO   text"), (21, "delta text"), (22, "alpha text")], "doc_id long, text string"
    )
    watch = tmp_path / "in"
    watch.mkdir()
    for i, part in enumerate((b1, b2)):
        d = str(tmp_path / f"b{i}")
        part.coalesce(1).write.parquet(d)
        src = next(p for p in os.listdir(d) if p.startswith("part-") and p.endswith(".parquet"))
        dst = watch / f"batch_{i}.parquet"
        (dst).write_bytes((tmp_path / f"b{i}" / src).read_bytes())
        os.utime(dst, (1_700_000_000 + i * 1000,) * 2)
    out = incremental_dedup_stream(
        spark, str(watch), corpus, str(tmp_path / "store"), str(tmp_path / "ckpt")
    )
    # 20 is a normalized dup of 10 (case/whitespace), 22 re-crawls corpus
    assert sorted(r["doc_id"] for r in out.collect()) == [10, 11, 21]


def test_stream_stream_join_is_stateful_symmetric_hash(spark, sf_dir):
    from meteor_spark.streaming.pipeline import stream_stream_attribution

    events = stream_events(spark, sf_dir)
    joined = stream_stream_attribution(events)
    # the logical plan must be a genuine stream-stream join (both sides
    # streaming, event-time bound), not a degenerate stream-static join
    assert joined.isStreaming
    plan = joined._jdf.queryExecution().analyzed().toString()
    assert plan.count("EventTimeWatermark") == 2

    out = run_stream_to_batch(joined, output_mode="append")
    from meteor_spark.io import read_parquet_table

    b = read_parquet_table(spark, f"{sf_dir}/events.parquet")
    p = b.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("pts"), "value"
    )
    c = b.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("ts").alias("cts"), F.col("event_id").alias("click_id")
    )
    expected = (
        p.join(c, (F.col("user_id") == F.col("cu"))
               & (F.col("cts") >= F.col("pts") - F.expr("INTERVAL 1 HOUR"))
               & (F.col("cts") <= F.col("pts")))
        .select("purchase_id", "click_id", "user_id", F.round("value", 2).alias("purchase_value"))
    )
    assert {tuple(r) for r in out.collect()} == {tuple(r) for r in expected.collect()}
