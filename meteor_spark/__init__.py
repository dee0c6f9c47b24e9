"""meteor_spark — a PySpark-native metadata-collection & data-processing engine.

A ground-up Spark reimplementation of the capabilities of odpf/meteor
(reference at /root/reference, a Go plugin-driven metadata agent):

- recipes (YAML) -> source -> processors -> sinks pipelines, expressed as
  DataFrame transformations on one SparkSession (reference: agent/agent.go).
- the unified asset data model (reference: models/odpf/assets/v1beta1/*)
  as a single StructType schema.
- the analytic operators: column profiling (reference:
  plugins/extractors/bigquery/bigquery.go:386-411), usage/lineage stats
  (reference: plugins/extractors/bigquery/auditlog/), SQL condition mining
  (reference: plugins/extractors/bigquery/sqlparser/parser.go).
- beyond-reference, 100TB-scale data-pipeline operators: dedup (exact,
  MinHash-LSH, SimHash, n-gram Jaccard), similarity search, text analysis,
  multimodal column plumbing.

Everything is DataFrame-first: declare the logical plan, let Catalyst pick
the physical strategy. Python UDFs only where built-ins genuinely cannot
express the semantics (and then Arrow-vectorized).
"""

__version__ = "0.1.0"
