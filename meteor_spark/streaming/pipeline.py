"""Structured Streaming surface.

The reference has NO true streaming (its 'stream' is an in-process
channel, agent/stream.go — see SURVEY.md §2.8), so this module is the
forward-looking translation: the same pipeline algebra
(source -> transforms -> fan-out sinks) over unbounded input.

Components:
- stream_events: file-based streaming read of the events table (the
  fixture stand-in for a Kafka topic; swap `format("parquet")` for
  `format("kafka")` + from_json in production).
- windowed_rollup: watermarked tumbling-window aggregation.
- run_stream_to_batch: drives a streaming query to completion with the
  availableNow trigger into an in-memory sink and returns the result as
  a plain DataFrame — this is how the oracle checks streaming semantics
  against batch SQL (they must agree on bounded input).
- streaming dedup: dropDuplicates within the watermark horizon.

Scale notes: watermark + window state lives in the state store keyed by
(window, event_type) — bounded cardinality; shuffle partitions sized by
spark.sql.shuffle.partitions as usual. availableNow processes a bounded
backlog in rate-limited batches without keeping the driver loop alive.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

def normalize_ts(raw: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize whatever timestamp flavor the fixture shipped with —
    nanos-as-long (r1), timestamp[us]/TIMESTAMP_NTZ (r2), or a true
    TIMESTAMP — to TIMESTAMP under the pinned-UTC session TZ, so
    watermarks/windows behave identically regardless of fixture vintage."""
    ts_type = raw.schema[col].dataType
    if isinstance(ts_type, T.LongType):
        # legacy nanos-as-long: truncate to micros (DuckDB does the same)
        return raw.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    return raw.withColumn(col, F.col(col).cast("timestamp"))


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming read of the events fixture with the schema taken from
    the file footer itself (a batch read of the same path), so the
    driver regenerating the fixture with a different timestamp physical
    type can never desynchronize this reader from reality."""
    schema = spark.read.option("pathGlobFilter", "events.parquet").parquet(sf_dir).schema
    # the streaming file source wants a directory; glob-filter to the table
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return normalize_ts(raw)


def windowed_rollup(events: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window count/sum per event_type with late-data watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("w.start").cast("string").alias("hour"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def streaming_dedup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Exactly-once event stream by event_id within the watermark horizon
    (the streaming twin of dedup_exact)."""
    return events.withWatermark("ts", watermark).dropDuplicates(["event_id"])


def run_stream_to_batch(
    stream_df: DataFrame, output_mode: str = "complete", state_partitions: int | None = 4
) -> DataFrame:
    """Drive a (bounded) streaming query to completion; return results.

    Uses trigger(availableNow) + the in-memory sink. Complete mode emits
    every window, so on bounded input the result must equal the batch
    aggregation — the property the oracle asserts.
    """
    spark = stream_df.sparkSession
    name = f"stream_out_{uuid.uuid4().hex[:8]}"
    # state-store partition count is frozen at query start from
    # spark.sql.shuffle.partitions; windowed-agg state cardinality is tiny
    # (windows x event_type), so 32 partitions means 32 state-store commits
    # per microbatch for mostly-empty stores. Pin the stream to a few
    # partitions and restore the session default after.
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    if state_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    out = spark.table(name)
    return out


def stream_static_enrich(stream_df: DataFrame, dim_df: DataFrame, on: list) -> DataFrame:
    """Stream-static join: enrich a stream against a batch dimension.

    Spark plans this as a broadcast of the static side into every
    microbatch (no state store involvement) — the standard pattern for
    joining events to a slowly-changing dimension at 100 TB/day stream
    volume. The dim is re-read per batch, so an updated dim table is
    picked up without restarting the query.
    """
    return stream_df.join(dim_df, on)


def stream_stream_attribution(
    events: DataFrame, horizon: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Stream-stream interval self-join: attribute each purchase to every
    click by the same user within the trailing `horizon`.

    Both sides carry watermarks and the join condition bounds event time
    (click_ts in [purchase_ts - horizon, purchase_ts]), so Spark's
    symmetric hash join can EVICT state older than watermark + horizon —
    bounded memory on an unbounded stream, the property a batch range
    join can't give you. Append mode; on bounded input the result equals
    the batch interval join (the oracle's assertion).
    """
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("ts").alias("purchase_ts"),
            F.col("event_id").alias("purchase_id"),
            "value",
        )
        .withWatermark("purchase_ts", watermark)
    )
    return purchases.join(
        clicks,
        F.expr(
            f"user_id = c_user AND click_ts >= purchase_ts - INTERVAL {horizon}"
            " AND click_ts <= purchase_ts"
        ),
    ).select("purchase_id", "click_id", "user_id", F.round("value", 2).alias("purchase_value"))


def incremental_dedup_stream(
    spark,
    watch_dir: str,
    corpus: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Streaming incremental exact-dedup: foreachBatch + a fingerprint
    store table — the streaming twin of operators.dedup.dedup_incremental.

    The store is seeded with the corpus's distinct content fingerprints;
    each microbatch anti-joins its fingerprints against the store, keeps
    min-id survivors within the batch, and appends the new fingerprints
    back to the store. This is the production shape for deduping a crawl
    stream against a 100 TB historical corpus: the store is a table of
    32-char keys (here parquet-append; Delta/Iceberg MERGE in a real
    deployment), the stream never holds dedup state in the state store,
    and each batch's anti-join is a broadcast when the batch is small.

    Returns the surviving (id_col) rows across the whole bounded stream.
    """
    from meteor_spark.operators.text import normalize_text

    fp = F.md5(normalize_text(F.col(text_col)))
    (
        corpus.select(fp.alias("fp"))
        .distinct()
        .withColumn(id_col, F.lit(None).cast("long"))
        .write.mode("overwrite")
        .parquet(store_dir)
    )

    def _merge(batch_df: DataFrame, _batch_id: int) -> None:
        seen = batch_df.sparkSession.read.parquet(store_dir).select("fp")
        bf = batch_df.select(F.col(id_col), fp.alias("fp"))
        fresh = bf.join(seen, "fp", "left_anti")
        survivors = fresh.groupBy("fp").agg(F.min(id_col).alias(id_col))
        survivors.select("fp", id_col).write.mode("append").parquet(store_dir)

    stream = (
        spark.readStream.schema(f"{id_col} long, {text_col} string")
        .option("maxFilesPerTrigger", "1")
        .parquet(watch_dir)
    )
    q = (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(store_dir).filter(F.col(id_col).isNotNull()).select(id_col)
