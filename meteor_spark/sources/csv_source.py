"""CSV extractor — emits one Table asset per CSV file.

Reference semantics (plugins/extractors/csv/csv.go:85-176): the path may
be a single file or a directory of *.csv; only the HEADER row is read,
producing columns with names and no types; URN is the file name.

Spark translation: `spark.read.option("header", true).csv(path)` gives us
the header columns from the scan schema without materializing data — the
same "header only" contract, but it would also scale to a directory of
millions of files because listing/inference is distributed.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from meteor_spark.plugins_base import Extractor, Field
from meteor_spark.registry import register_extractor
from meteor_spark.sources.base import assets_df, column_dict


@register_extractor("csv", "Comma separated file", sample_config="path: ./path-to-file.csv")
class CsvExtractor(Extractor):
    CONFIG = {
        "path": Field(required=True, type=str),
        "format": Field(default="csv"),
    }

    def extract(self, spark: SparkSession) -> DataFrame:
        path = Path(self.config["path"])
        files = sorted(path.glob("*.csv")) if path.is_dir() else [path]
        rows = []
        for f in files:
            df = spark.read.option("header", "true").csv(str(f))
            columns = [column_dict(name=c) for c in sorted(df.columns)]
            rows.append(
                {
                    "resource": {
                        "urn": f.name,
                        "name": f.name,
                        "service": "csv",
                        "type": "table",
                        "url": None,
                        "description": None,
                    },
                    "asset_type": "Table",
                    "schema": columns,
                }
            )
        return assets_df(spark, rows)
