"""Measure the salting crossover on a HOLISTIC aggregate (exact
distinct count per key) — the aggregation class map-side combine
cannot absorb, unlike the sum/count gates where salting measurably
loses (docs/SCALING.md SKEW).

plain : events.groupBy(user_id).agg(countDistinct(value))
salted: operators.skew.salted_agg with salt_on="value" — distinct
        values partition cleanly by value-hash, so per-(user, salt)
        countDistinct partials SUM exactly to the unsalted answer.

Equality is asserted on every run (full collect compare of the two
frames' sorted rows), so each timing row is also a correctness row.

Usage: python tools/probe_salting_crossover.py <fixture_dir> [salt]
Prints one line: fixture, n_rows, hottest-user share, plain sec,
salted sec (min-of-2 each, noop sink).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    fixture = sys.argv[1] if len(sys.argv) > 1 else "/tmp/skew1000ev"
    salt = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    from meteor_spark.session import get_spark
    from meteor_spark.operators.skew import salted_agg
    from pyspark.sql import functions as F

    spark = get_spark("salt_probe")
    spark.sparkContext.setLogLevel("ERROR")
    ev = spark.read.parquet(f"{fixture}/events.parquet").select("user_id", "value")
    ev.count()  # warm footers/codegen

    plain = ev.groupBy("user_id").agg(F.countDistinct("value").alias("nd"))
    salted = salted_agg(
        ev,
        ["user_id"],
        {"nd": ("sum", F.countDistinct("value"))},
        salt_buckets=salt,
        salt_on="value",
    )

    def run(df) -> float:
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        return round(best, 2)

    t_plain = run(plain)
    t_salted = run(salted)

    # equality: every probe run is also an oracle run
    a = sorted(tuple(r) for r in plain.collect())
    b = sorted(tuple(r) for r in salted.collect())
    assert a == b, "salted exact-distinct diverged from plain"

    stats = ev.groupBy("user_id").count()
    top, total = (
        stats.agg(F.max("count"), F.sum("count")).first()
    )
    print(
        f"fixture={fixture} rows={total} hottest_share={top/total:.3f} "
        f"plain={t_plain}s salted({salt})={t_salted}s equal=True"
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
