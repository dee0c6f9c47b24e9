"""Kafka sink — publish records to a topic.

Reference (plugins/sinks/kafka/sink.go:74-197): protobuf-serialized
value; optional message key from a 1-level field path (e.g. `.Urn`)
resolved by reflection (:121-188); LeastBytes balancer (:190-197).

Spark-first translation: the idiomatic path is

    df.select(to_json(struct("*")).alias("value"),
              col(key_path).cast("string").alias("key"))
      .write.format("kafka").option("kafka.bootstrap.servers", ...)

which serializes and partitions entirely JVM-side (Spark's Kafka
partitioner plays the balancer role; `to_protobuf` can replace to_json
where the registry-compatible binary encoding is required and the
spark-protobuf package is on the classpath). The payload builder
`kafka_rows` is a pure transformation (tested); the actual write needs
the spark-sql-kafka connector jar, absent in this container, so sink()
raises a clear error without it.

Wire format: JSON by design — the reference publishes the compiled
protobuf message instead; see docs/ADR-0001-kafka-wire-format.md for
why, what differs on the wire (value encoding only; the record key and
partition routing are identical), and the to_protobuf migration path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from meteor_spark.plugins_base import Field, Sink
from meteor_spark.registry import register_sink


def kafka_rows(df: DataFrame, key_path: str | None = None) -> DataFrame:
    """(key, value) frame ready for the kafka writer.

    key_path mirrors the reference's `.Urn`-style 1-level path
    (kafka/sink.go:121-188); here it is a column path into the asset
    struct, e.g. 'resource.urn'."""
    value = F.to_json(F.struct(*df.columns)).alias("value")
    if key_path:
        return df.select(F.col(key_path).cast("string").alias("key"), value)
    return df.select(F.lit(None).cast("string").alias("key"), value)


@register_sink("kafka", "Publish records to a Kafka topic")
class KafkaSink(Sink):
    CONFIG = {
        "brokers": Field(required=True, type=str),
        "topic": Field(required=True, type=str),
        "key_path": Field(default=None, type=str),  # e.g. resource.urn
    }

    def sink(self, df: DataFrame) -> int:
        out = kafka_rows(df, self.config["key_path"])
        try:
            (
                out.write.format("kafka")
                .option("kafka.bootstrap.servers", self.config["brokers"])
                .option("topic", self.config["topic"])
                .save()
            )
        except Exception as e:  # noqa: BLE001
            raise RuntimeError(
                "kafka write requires the spark-sql-kafka connector on the classpath"
            ) from e
        return df.count()
