"""Relational recipe processors: filter and project.

The reference ships exactly one processor (enrich,
plugins/processors/enrich/processor.go) — its per-record map chain can't
express row filtering or column projection without custom plugins. On a
DataFrame engine both are one-liners that Catalyst pushes into the scan
(PushedFilters / ReadSchema), so recipes gain declarative row/column
selection for free:

    processors:
      - name: filter
        config: {where: "asset_type = 'table' AND profile.total_rows > 0"}
      - name: project
        config: {columns: "resource,asset_type,schema"}

`where` is a SQL boolean expression over the asset schema; `columns` is
a comma-separated list of top-level columns to keep.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from meteor_spark.plugins_base import Field, Processor
from meteor_spark.registry import register_processor


@register_processor("filter", "Keep only records matching a SQL predicate")
class FilterProcessor(Processor):
    CONFIG = {"where": Field(required=True, type=str)}

    def process(self, df: DataFrame) -> DataFrame:
        return df.filter(F.expr(self.config["where"]))


@register_processor("project", "Keep only the listed top-level columns")
class ProjectProcessor(Processor):
    CONFIG = {"columns": Field(required=True, type=str)}

    def process(self, df: DataFrame) -> DataFrame:
        cols = [c.strip() for c in self.config["columns"].split(",") if c.strip()]
        return df.select(*cols)


@register_processor(
    "fd_profile",
    "Functional-dependency discovery over the listed columns",
    sample_config="columns: n_nationkey,n_name,n_regionkey",
)
class FdProfileProcessor(Processor):
    """Turns a row-level table into its dependency profile
    (operators.profile.functional_dependencies): one row per ordered
    column pair with (n_det, n_pairs, holds). The recipe surface for
    the catalog's metadata-inference layer — source any table, sink
    the report."""

    CONFIG = {"columns": Field(required=True, type=str)}

    def process(self, df: DataFrame) -> DataFrame:
        from meteor_spark.operators.profile import functional_dependencies

        cols = [c.strip() for c in self.config["columns"].split(",") if c.strip()]
        return functional_dependencies(df, cols)
