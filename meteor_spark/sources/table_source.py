"""parquet_table extractor — rows of a parquet table as the record
stream, making the recipe engine drive DATA pipelines, not just
metadata catalogs.

The reference's extractors emit metadata assets; its pipeline frame
(source -> processors -> sinks, agent/agent.go:116-192) is
content-agnostic, and so is this engine's (everything is a DataFrame).
This extractor closes the loop: a YAML recipe can source a raw corpus
table and run the training-data processors (curate, chunk) over it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from meteor_spark.plugins_base import Extractor, Field
from meteor_spark.registry import register_extractor


@register_extractor(
    "parquet_table",
    "Rows of a parquet table/directory as records",
    sample_config="path: /data/documents.parquet",
)
class ParquetTableExtractor(Extractor):
    CONFIG = {
        "path": Field(required=True, type=str),
        # optional projection: prune at the scan, not after
        "columns": Field(default=None),
        # optional SQL predicate pushed into the scan (e.g. "lang = 'en'")
        "where": Field(default=None, type=str),
    }

    def extract(self, spark: SparkSession) -> DataFrame:
        from meteor_spark.io import read_parquet_table

        df = read_parquet_table(spark, self.config["path"])
        if self.config["where"]:
            df = df.filter(self.config["where"])
        cols = self.config["columns"]
        if cols:
            df = df.select(*[str(c) for c in cols])
        return df
