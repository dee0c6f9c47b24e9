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

Wire format: protobuf by default (reference parity, kafka/sink.go:
112-118), JSON opt-in (value_format config) — the protobuf path
encodes the reference's exact message shape via the pure-Python wire
encoder (functions/protowire.py, field numbers pinned from the
reference generated code) in ONE Arrow-batched mapInPandas pass; see
docs/ADR-0001-kafka-wire-format.md (v3) for the default flip, the
interop matrix, and the map-field byte-ordering caveat.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from meteor_spark.plugins_base import Field, Sink
from meteor_spark.registry import register_sink


def _resolve_session_tz(tz_name: str):
    """Resolve a Spark session timezone string to a tzinfo, at PLAN
    time (driver side) so a bad zone fails with a clear message instead
    of inside a mapInPandas task on every executor.

    Spark accepts java.time.ZoneId forms the IANA database does not:
    fixed offsets ('+08:00', '-0330', '+8') and prefixed offsets
    ('UTC+2', 'GMT-08:00', 'UT+05:30') raise ZoneInfoNotFoundError in
    zoneinfo. Parse those into a datetime.timezone; everything else
    goes through ZoneInfo."""
    import re
    from datetime import timedelta, timezone
    from zoneinfo import ZoneInfo

    s = (tz_name or "UTC").strip()
    if s in ("Z", "z"):
        return timezone.utc
    m = re.fullmatch(
        r"(?:UTC|GMT|UT)?([+-])(\d{1,2})(?::?(\d{2}))?(?::?(\d{2}))?", s
    )
    if m:
        sign = 1 if m.group(1) == "+" else -1
        delta = timedelta(
            hours=int(m.group(2)),
            minutes=int(m.group(3) or 0),
            seconds=int(m.group(4) or 0),
        )
        return timezone(sign * delta)
    if s in ("UTC", "GMT", "UT"):
        return timezone.utc
    try:
        return ZoneInfo(s)
    except Exception as exc:  # noqa: BLE001 - re-raise with plan-time context
        raise ValueError(
            f"protobuf kafka sink: cannot resolve session timezone {tz_name!r} "
            "(spark.sql.session.timeZone) to a tzinfo for timestamp encoding"
        ) from exc


def _schema_has_timestamp(dt) -> bool:
    from pyspark.sql import types as T

    if isinstance(dt, T.TimestampType):
        return True
    if isinstance(dt, T.StructType):
        return any(_schema_has_timestamp(f.dataType) for f in dt.fields)
    if isinstance(dt, T.ArrayType):
        return _schema_has_timestamp(dt.elementType)
    if isinstance(dt, T.MapType):
        return _schema_has_timestamp(dt.keyType) or _schema_has_timestamp(dt.valueType)
    return False


def _check_pandas_tz(tz_name: str, schema) -> None:
    """PySpark's Arrow->pandas serializer localizes TimestampType
    columns with pandas/pytz, which rejects some ZoneId forms Spark
    itself accepts ('GMT+08:00', 'UTC+2') — the task would then die in
    every executor with an opaque UnknownTimeZoneError. Probe the exact
    operation at PLAN time and fail with an actionable message."""
    if not _schema_has_timestamp(schema):
        return
    import pandas as pd

    try:
        pd.Timestamp(0).tz_localize(tz_name or "UTC")
    except Exception as exc:  # noqa: BLE001
        raise ValueError(
            f"protobuf kafka sink: session timezone {tz_name!r} "
            "(spark.sql.session.timeZone) is not understood by the "
            "Arrow-to-pandas serializer that feeds the protobuf encoder; "
            "set an equivalent IANA zone (e.g. 'Etc/GMT-8' for +08:00 — "
            "note Etc/GMT signs are inverted) or a bare offset like "
            "'+08:00' before writing"
        ) from exc


def _key_message(key_path: str, key: str, asset_type: str) -> bytes:
    """Protobuf record key per reference kafka/sink.go:121-150: a message
    of the SAME descriptor with only the key field populated, marshaled.
    The reference supports only top-level string fields (`.Urn`); this
    model's key fields live one level down (e.g. resource.urn), so the
    dynamic message nests the path — the natural generalization."""
    from meteor_spark.functions import protowire

    parts = key_path.split(".")
    shell: dict = {parts[-1]: key}
    for p in reversed(parts[:-1]):
        shell = {p: shell}
    return protowire.encode_asset(shell, asset_type=asset_type)


_JVM_PROBE_CACHE: dict[int, bool] = {}


def jvm_protobuf_available(spark) -> bool:
    """Probe whether the spark-protobuf connector is loadable: build and
    run a one-row to_protobuf plan against the pinned descriptor set.
    The jar ships separately from the Spark distribution (absent in
    this container — docs/ADR-0001 v4), so the JVM encode path is
    opt-in with this probe as the gate. Cached per SparkContext — the
    classpath cannot change within one JVM, and engine='auto' calls
    this on every kafka_rows build."""
    key = id(spark.sparkContext)
    if key in _JVM_PROBE_CACHE:
        return _JVM_PROBE_CACHE[key]
    _JVM_PROBE_CACHE[key] = _probe_jvm_protobuf(spark)
    return _JVM_PROBE_CACHE[key]


def _probe_jvm_protobuf(spark) -> bool:
    try:
        from pyspark.sql.protobuf.functions import to_protobuf

        from meteor_spark.functions import protodesc

        probe = spark.range(1).select(
            F.struct(F.lit("u").alias("urn")).alias("s")
        )
        probe.select(
            to_protobuf(
                "s",
                f"{protodesc.PKG}.Resource",
                binaryDescriptorSet=protodesc.file_descriptor_set(),
            )
        ).collect()
        return True
    except Exception:  # noqa: BLE001 - any failure means "not usable"
        return False


def _jvm_asset_struct(asset_type: str, columns: list[str]):
    """(message_struct, unsupported_cond) — protowire.asset_plain's
    model->message mapping re-expressed as Column expressions.

    The open-JSON fields (Column.properties, Preview.rows,
    Properties.attributes) hold arbitrary-keyed JSON the model stores
    as strings; the Python wire encoder converts them to
    google.protobuf.Struct at runtime, which no STATIC to_protobuf
    input schema can express — so they are omitted from the struct and
    `unsupported_cond` flags any row that actually carries one (the
    caller raises instead of silently dropping data)."""
    def has(c):
        return c in columns

    bad = F.lit(False)
    parts = [F.col("resource").alias("resource")]
    if asset_type == "Topic":
        if has("topic_profile"):
            parts.append(F.col("topic_profile").alias("profile"))
        if has("topic_schema"):
            parts.append(F.col("topic_schema").alias("schema"))
    else:
        if has("profile"):
            parts.append(F.col("profile").alias("profile"))
        if has("schema"):
            parts.append(
                F.when(
                    F.col("schema").isNotNull(),
                    F.struct(
                        F.transform(
                            "schema",
                            lambda c: F.struct(
                                c["name"].alias("name"),
                                c["description"].alias("description"),
                                c["data_type"].alias("data_type"),
                                c["is_nullable"].alias("is_nullable"),
                                c["length"].alias("length"),
                                c["profile"].alias("profile"),
                            ),
                        ).alias("columns")
                    ),
                ).alias("schema")
            )
            bad = bad | F.coalesce(
                F.exists("schema", lambda c: c["properties"].isNotNull()),
                F.lit(False),
            )
        if has("preview"):
            parts.append(
                F.when(
                    F.col("preview").isNotNull(),
                    F.struct(F.col("preview.fields").alias("fields")),
                ).alias("preview")
            )
            bad = bad | F.coalesce(
                F.col("preview.rows").isNotNull(), F.lit(False)
            )
    if has("ownership"):
        parts.append(
            F.when(
                F.col("ownership").isNotNull(),
                F.struct(F.col("ownership").alias("owners")),
            ).alias("ownership")
        )
    if has("lineage"):
        parts.append(F.col("lineage").alias("lineage"))
    if has("properties"):
        parts.append(
            F.when(
                F.col("properties").isNotNull(),
                F.struct(
                    F.col("properties.tags").alias("tags"),
                    F.col("properties.labels").alias("labels"),
                ),
            ).alias("properties")
        )
        bad = bad | F.coalesce(
            F.col("properties.attributes").isNotNull(), F.lit(False)
        )
    if has("timestamps"):
        parts.append(F.col("timestamps").alias("timestamps"))
    if has("event"):
        parts.append(F.col("event").alias("event"))
    return F.struct(*parts), bad


def _kafka_rows_jvm(df: DataFrame, key_path: str | None, asset_type: str) -> DataFrame:
    """JVM-native protobuf encode via spark-protobuf's to_protobuf and
    the pinned binary FileDescriptorSet (functions/protodesc.py) — no
    Python stage in the encode at all. Requires a homogeneous
    asset_type (the reference sink always knows its message type,
    kafka/sink.go:112-118). google.protobuf.Timestamp fields ride as
    Catalyst TimestampType (the connector's documented mapping)."""
    from pyspark.sql.protobuf.functions import to_protobuf

    from meteor_spark.functions import protodesc

    fds = protodesc.file_descriptor_set()
    name = protodesc.message_full_name(asset_type)
    msg, bad = _jvm_asset_struct(asset_type, df.columns)
    value = F.when(
        bad,
        F.raise_error(F.lit(
            "jvm protobuf path cannot encode open-JSON Struct fields "
            "(Column.properties / preview.rows / properties.attributes); "
            "null them upstream or use engine='python'"
        )).cast("binary"),
    ).otherwise(to_protobuf(msg, name, binaryDescriptorSet=fds))
    if key_path:
        parts = key_path.split(".")
        shell = F.struct(F.col(key_path).alias(parts[-1]))
        for p in reversed(parts[:-1]):
            shell = F.struct(shell.alias(p))
        key = F.when(
            F.col(key_path).isNotNull(),
            to_protobuf(shell, name, binaryDescriptorSet=fds),
        )
    else:
        key = F.lit(None).cast("binary")
    return df.select(key.alias("key"), value.alias("value"))


def kafka_rows(
    df: DataFrame,
    key_path: str | None = None,
    value_format: str = "protobuf",
    engine: str = "auto",
    asset_type: str = "Table",
) -> DataFrame:
    """(key, value) frame ready for the kafka writer.

    key_path mirrors the reference's `.Urn`-style 1-level path
    (kafka/sink.go:121-188); here it is a column path into the asset
    struct, e.g. 'resource.urn'.

    value_format="json": to_json(struct(*)) value, string key — pure
    JVM. value_format="protobuf": the reference wire format
    (kafka/sink.go:112-118) — value is the marshaled asset message,
    key is the same-descriptor message carrying only the key field
    (sink.go:121-150).

    engine (protobuf only): "python" = the Arrow-batched mapInPandas
    wire encoder (works everywhere, handles the open-JSON Struct
    fields); "jvm" = spark-protobuf's to_protobuf against the pinned
    descriptor set (no Python stage — the 100-TB path; requires the
    spark-protobuf jar on the classpath and a homogeneous asset_type);
    "auto" = jvm when the probe succeeds, python otherwise. See
    docs/ADR-0001 v4 for the interop matrix.
    """
    if value_format == "protobuf" and engine in ("jvm", "auto"):
        if jvm_protobuf_available(df.sparkSession):
            return _kafka_rows_jvm(df, key_path, asset_type)
        if engine == "jvm":
            raise RuntimeError(
                "engine='jvm' requires the spark-protobuf connector on the "
                "classpath (org.apache.spark:spark-protobuf); the probe "
                "failed — use engine='auto' to fall back to the Python "
                "wire encoder"
            )
    if value_format == "protobuf":
        import pandas as pd

        from meteor_spark.functions import protowire

        # Spark hands TimestampType to pandas as session-timezone-LOCAL
        # naive datetimes; capture the session zone at plan time so the
        # executors encode the correct absolute instant (a non-UTC
        # session would otherwise shift every encoded Timestamp).
        tz_name = df.sparkSession.conf.get("spark.sql.session.timeZone") or "UTC"
        # resolved on the DRIVER: offset-style zones Spark accepts
        # ('GMT+08:00', '+08:00', 'UTC+2') are not IANA names and would
        # crash ZoneInfo inside every executor task; tzinfo objects
        # pickle cleanly into the closure
        naive_tz = _resolve_session_tz(tz_name)
        _check_pandas_tz(tz_name, df.schema)
        single_desc = len(protowire._ASSET_DESCS) == 1

        def encode(batches):
            for pdf in batches:
                keys, values = [], []
                for rec in pdf.to_dict("records"):
                    at = rec.get("asset_type")
                    if not at or at != at:
                        # reference sink.go always knows its message
                        # type; guessing between descriptors would emit
                        # wrong-typed bytes silently — fail instead
                        if not single_desc:
                            raise ValueError(
                                "protobuf kafka sink: row has no asset_type "
                                "and multiple descriptors are registered "
                                f"({sorted(protowire._ASSET_DESCS)}); cannot "
                                "pick a message type safely"
                            )
                        at = next(iter(protowire._ASSET_DESCS))
                    values.append(
                        protowire.encode_asset(rec, asset_type=at, naive_tz=naive_tz)
                    )
                    if key_path:
                        k = rec
                        for part in key_path.split("."):
                            k = k.get(part) if isinstance(k, dict) else None
                            if k is None:
                                break
                        keys.append(
                            _key_message(key_path, str(k), at) if k is not None else None
                        )
                    else:
                        keys.append(None)
                yield pd.DataFrame({"key": keys, "value": values})

        return df.mapInPandas(encode, "key binary, value binary")
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
        "value_format": Field(default="protobuf", type=str, oneof=("json", "protobuf")),
        # protobuf encode engine: jvm (spark-protobuf + pinned descriptor
        # set, no Python stage), python (Arrow-batched wire encoder,
        # works everywhere), auto (jvm when the classpath allows)
        "engine": Field(default="auto", type=str, oneof=("auto", "jvm", "python")),
        "asset_type": Field(default="Table", type=str),  # jvm path message type
    }

    def sink(self, df: DataFrame) -> int:
        out = kafka_rows(
            df,
            self.config["key_path"],
            self.config["value_format"],
            engine=self.config["engine"],
            asset_type=self.config["asset_type"],
        )
        try:
            (
                out.write.format("kafka")
                .option("kafka.bootstrap.servers", self.config["brokers"])
                .option("topic", self.config["topic"])
                .save()
            )
        except Exception as e:  # noqa: BLE001
            # only the missing-connector case gets the classpath hint; a
            # blanket rewrite here masked broker/auth/topic failures
            # behind a misleading message and made them non-retryable
            msg = str(e)
            if "ClassNotFoundException" in msg or "Failed to find data source" in msg:
                raise RuntimeError(
                    "kafka write requires the spark-sql-kafka connector on the classpath"
                ) from e
            raise
        return df.count()
