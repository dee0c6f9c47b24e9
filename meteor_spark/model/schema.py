"""The unified asset schema — one StructType for every asset type.

Mirrors the reference's protobuf model (reference:
models/odpf/assets/v1beta1/table.pb.go:27, topic.pb.go:27,
dashboard.pb.go:26, user.pb.go:28, bucket.pb.go:26, job.pb.go:26;
common header models/odpf/assets/common/v1beta1/resource.pb.go:25;
facets models/odpf/assets/facets/v1beta1/*.pb.go).

Design decisions (SURVEY.md §1.5):
- One wide nullable schema with an `asset_type` discriminator instead of
  per-type DataFrames: lets every processor/sink operate on a single
  contract, and Catalyst prunes unused struct fields at the parquet scan.
- `structpb.Struct` open JSON objects (properties.attributes, preview.rows)
  are stored as JSON **strings** (`to_json`/`from_json`/`get_json_object`) —
  Spark of this vintage has no variant type.
- proto repeated -> ArrayType, proto map -> MapType, google Timestamp ->
  TimestampType.
"""

from __future__ import annotations

from pyspark.sql import types as T

# reference: models/odpf/assets/common/v1beta1/resource.pb.go:25
RESOURCE_SCHEMA = T.StructType(
    [
        T.StructField("urn", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("service", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("description", T.StringType()),
    ]
)

# reference: models/odpf/assets/facets/v1beta1/schema.pb.go:180 (ColumnProfile)
COLUMN_PROFILE_SCHEMA = T.StructType(
    [
        T.StructField("min", T.StringType()),
        T.StructField("max", T.StringType()),
        T.StructField("avg", T.DoubleType()),
        T.StructField("med", T.DoubleType()),
        T.StructField("unique", T.LongType()),
        T.StructField("count", T.LongType()),
        T.StructField("top", T.StringType()),
    ]
)

# reference: models/odpf/assets/facets/v1beta1/schema.pb.go:74 (Column)
COLUMN_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("data_type", T.StringType()),
        T.StructField("is_nullable", T.BooleanType()),
        T.StructField("length", T.LongType()),
        T.StructField("profile", COLUMN_PROFILE_SCHEMA),
        T.StructField("properties", T.StringType()),  # JSON
    ]
)

# reference: models/odpf/assets/v1beta1/table.pb.go:156,251 (TableProfile, Join)
JOIN_SCHEMA = T.StructType(
    [
        T.StructField("urn", T.StringType()),
        T.StructField("count", T.LongType()),
        T.StructField("conditions", T.ArrayType(T.StringType())),
    ]
)

TABLE_PROFILE_SCHEMA = T.StructType(
    [
        T.StructField("total_rows", T.LongType()),
        T.StructField("partition_key", T.StringType()),
        T.StructField("partition_value", T.StringType()),
        T.StructField("usage_count", T.LongType()),
        T.StructField("joins", T.ArrayType(JOIN_SCHEMA)),
        T.StructField("filters", T.ArrayType(T.StringType())),
    ]
)

# reference: models/odpf/assets/facets/v1beta1/ownership.pb.go:24,74
OWNER_SCHEMA = T.StructType(
    [
        T.StructField("urn", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("role", T.StringType()),
        T.StructField("email", T.StringType()),
    ]
)

# reference: models/odpf/assets/facets/v1beta1/lineage.pb.go:26 — edge list on nodes
LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("upstreams", T.ArrayType(RESOURCE_SCHEMA)),
        T.StructField("downstreams", T.ArrayType(RESOURCE_SCHEMA)),
    ]
)

# reference: models/odpf/assets/facets/v1beta1/properties.pb.go:24
PROPERTIES_SCHEMA = T.StructType(
    [
        T.StructField("tags", T.ArrayType(T.StringType())),
        T.StructField("labels", T.MapType(T.StringType(), T.StringType())),
        T.StructField("attributes", T.StringType()),  # open JSON object
    ]
)

# reference: models/odpf/assets/facets/v1beta1/preview.pb.go:25
PREVIEW_SCHEMA = T.StructType(
    [
        T.StructField("fields", T.ArrayType(T.StringType())),
        T.StructField("rows", T.StringType()),  # row-major JSON
    ]
)

# reference: models/odpf/assets/common/v1beta1/timestamp.pb.go:25
TIMESTAMPS_SCHEMA = T.StructType(
    [
        T.StructField("create_time", T.TimestampType()),
        T.StructField("update_time", T.TimestampType()),
    ]
)

# reference: models/odpf/assets/v1beta1/dashboard.pb.go:134 (Chart)
CHART_SCHEMA = T.StructType(
    [
        T.StructField("urn", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("raw_query", T.StringType()),
        T.StructField("data_source", T.StringType()),
        T.StructField("dashboard_urn", T.StringType()),
        T.StructField("dashboard_source", T.StringType()),
    ]
)

# reference: models/odpf/assets/v1beta1/bucket.pb.go:153 (Blob)
BLOB_SCHEMA = T.StructType(
    [
        T.StructField("urn", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("size", T.LongType()),
        T.StructField("delete_time", T.TimestampType()),
        T.StructField("expire_time", T.TimestampType()),
    ]
)

# reference: models/odpf/assets/v1beta1/user.pb.go:217 (Membership)
MEMBERSHIP_SCHEMA = T.StructType(
    [
        T.StructField("group_urn", T.StringType()),
        T.StructField("role", T.ArrayType(T.StringType())),
    ]
)

# reference: models/odpf/assets/v1beta1/topic.pb.go:146 (TopicProfile) +
# facets/v1beta1/schema.pb.go:277 (TopicSchema)
TOPIC_PROFILE_SCHEMA = T.StructType(
    [
        T.StructField("throughput", T.StringType()),
        T.StructField("number_of_partitions", T.LongType()),
    ]
)

TOPIC_SCHEMA_FACET = T.StructType(
    [
        T.StructField("schema_url", T.StringType()),
        T.StructField("format", T.StringType()),
    ]
)

# reference: models/odpf/assets/v1beta1/user.pb.go:28 (User own fields)
USER_INFO_SCHEMA = T.StructType(
    [
        T.StructField("email", T.StringType()),
        T.StructField("username", T.StringType()),
        T.StructField("first_name", T.StringType()),
        T.StructField("last_name", T.StringType()),
        T.StructField("full_name", T.StringType()),
        T.StructField("display_name", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("manager_email", T.StringType()),
    ]
)

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("resource", RESOURCE_SCHEMA),
        T.StructField("asset_type", T.StringType()),  # Table|Topic|Dashboard|Job|User|Bucket|Group
        T.StructField("schema", T.ArrayType(COLUMN_SCHEMA)),
        T.StructField("profile", TABLE_PROFILE_SCHEMA),
        T.StructField("topic_profile", TOPIC_PROFILE_SCHEMA),
        T.StructField("topic_schema", TOPIC_SCHEMA_FACET),
        T.StructField("lineage", LINEAGE_SCHEMA),
        T.StructField("ownership", T.ArrayType(OWNER_SCHEMA)),
        T.StructField("properties", PROPERTIES_SCHEMA),
        T.StructField("preview", PREVIEW_SCHEMA),
        T.StructField("timestamps", TIMESTAMPS_SCHEMA),
        T.StructField("charts", T.ArrayType(CHART_SCHEMA)),
        T.StructField("blobs", T.ArrayType(BLOB_SCHEMA)),
        T.StructField("memberships", T.ArrayType(MEMBERSHIP_SCHEMA)),
        T.StructField("user_info", USER_INFO_SCHEMA),
        T.StructField("event", T.StructType(
            [
                T.StructField("timestamp", T.TimestampType()),
                T.StructField("action", T.StringType()),
                T.StructField("description", T.StringType()),
            ]
        )),
    ]
)


def empty_asset() -> dict:
    """A dict with every top-level ASSET_SCHEMA key set to None — the
    starting point for source functions building asset rows."""
    return {f.name: None for f in ASSET_SCHEMA.fields}
