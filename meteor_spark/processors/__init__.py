"""Processor plugins. Importing registers built-ins."""

from meteor_spark.processors import curate, enrich, mix, relational  # noqa: F401
