"""Enrich processor — merge recipe-config key/values into every record's
properties.attributes.

Reference (plugins/processors/enrich/processor.go:57-86 +
utils/custom_properties.go:12-49): the config map is set key-by-key onto
the record's custom properties (existing keys overwritten, others kept).

Spark translation: attributes is a JSON-string column; the merge is a
single JVM-side expression — parse to map, concat with the literal
config map (map_concat with the literal LAST so config wins), re-serialize.
No UDF, no per-record Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from meteor_spark.plugins_base import Processor
from meteor_spark.registry import register_processor


def merge_attributes(df: DataFrame, attrs: dict[str, str]) -> DataFrame:
    if not attrs:
        return df
    lit_map = F.create_map(*[F.lit(x) for kv in attrs.items() for x in kv])
    # the OUTER coalesce guards parse failures, not just NULL columns:
    # from_json returns NULL for malformed JSON (PERMISSIVE), and a NULL
    # map would propagate through map_filter/map_concat and null out the
    # whole facet — the reference sets config keys regardless
    # (processor.go:57-86), so fall back to an empty map
    existing = F.coalesce(
        F.from_json(F.coalesce(F.col("properties.attributes"), F.lit("{}")), "map<string,string>"),
        F.from_json(F.lit("{}"), "map<string,string>"),
    )
    merged = F.to_json(F.map_concat(F.map_filter(existing, lambda k, v: ~k.isin(*attrs)), lit_map))
    new_props = F.struct(
        F.col("properties.tags").alias("tags"),
        F.col("properties.labels").alias("labels"),
        merged.alias("attributes"),
    )
    return df.withColumn("properties", new_props)


@register_processor("enrich", "Append custom fields to records")
class EnrichProcessor(Processor):
    # the whole config map becomes attributes (reference: processor.go:57-86)
    def process(self, df: DataFrame) -> DataFrame:
        attrs = {str(k): str(v) for k, v in (self.config or {}).items()}
        return merge_attributes(df, attrs)
