"""Sink plugins. Importing registers built-ins."""

from meteor_spark.sinks import compass, console, file, http, kafka_sink, stencil  # noqa: F401
