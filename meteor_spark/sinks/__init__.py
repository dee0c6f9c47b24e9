"""Sink plugins. Importing registers built-ins."""

from meteor_spark.sinks import console, file, http  # noqa: F401
