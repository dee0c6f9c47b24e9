"""Source plugins (extractors). Importing this package registers the
built-ins, the analogue of the reference's blank-import registration
(reference: plugins/extractors/populate.go)."""

from meteor_spark.sources import (  # noqa: F401
    api_sources,
    csv_source,
    jdbc,
    lakehouse,
    parquet_catalog,
    table_source,
)
