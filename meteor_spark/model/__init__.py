from meteor_spark.model.schema import ASSET_SCHEMA, COLUMN_SCHEMA, RESOURCE_SCHEMA
from meteor_spark.model.urn import dashboard_urn, job_urn, table_urn, topic_urn, user_urn

__all__ = [
    "ASSET_SCHEMA",
    "COLUMN_SCHEMA",
    "RESOURCE_SCHEMA",
    "table_urn",
    "topic_urn",
    "dashboard_urn",
    "job_urn",
    "user_urn",
]
