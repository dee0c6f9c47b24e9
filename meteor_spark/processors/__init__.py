"""Processor plugins. Importing registers built-ins."""

from meteor_spark.processors import enrich  # noqa: F401
