"""Processor plugins. Importing registers built-ins."""

from meteor_spark.processors import enrich, relational  # noqa: F401
