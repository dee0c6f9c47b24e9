"""Processor plugins. Importing registers built-ins."""

from meteor_spark.processors import curate, enrich, relational  # noqa: F401
