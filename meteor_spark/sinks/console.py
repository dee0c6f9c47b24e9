"""Console sink — JSON per record to stdout.

Reference (plugins/sinks/console/sink.go:43-61): marshal each record to
JSON and print. Driver-side toJSON over a limited collect; for large
frames this is a debugging sink, so output is capped (the reference has
no cap because its record streams are tiny metadata sets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from meteor_spark.plugins_base import Field, Sink
from meteor_spark.registry import register_sink


@register_sink("console", "Print records to stdout")
class ConsoleSink(Sink):
    CONFIG = {"max_rows": Field(default=1000, type=int)}

    def sink(self, df: DataFrame) -> int:
        n = 0
        for line in df.toJSON().take(self.config["max_rows"]):
            print(line)
            n += 1
        return n
