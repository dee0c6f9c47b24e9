"""Runtime bloom-filter join reduction — the lever for the
selective-dim shuffle join that is too big to broadcast.

At 100 TB the painful join shape is: fact JOIN dim WHERE dim is filtered
down to (say) 1% — but the surviving dim rows are still hundreds of MB,
so no broadcast, and a plain shuffle join moves the ENTIRE fact table
across the network only to discard 99% of it at the probe. Catalyst's
InjectRuntimeFilter (Spark 3.3+) fixes exactly this: it builds a bloom
filter over the creation (dim) side's join keys as a tiny extra
aggregate, and injects `BloomFilterMightContain` as a predicate on the
application (fact) side BELOW the exchange — so non-matching fact rows
are dropped before they are ever shuffled. False positives only cost
wasted shuffle bytes, never correctness.

This module doesn't reimplement any of that machinery (reimplementing a
driver-collected bloom filter in Python would be strictly worse); it
pins the configuration that makes Catalyst do it, because two of the
four knobs default to values that silently disable injection on
mid-size inputs:

- `spark.sql.optimizer.runtime.bloomFilter.enabled` — master switch
  (default true on 3.4+, but explicit here).
- `...applicationSideScanSizeThreshold` (default 10GB) — the fact side
  must scan at least this much before injection is considered. 10GB is
  right on a cluster; for tests/smaller facts it must come down.
- `...creationSideThreshold` (default 10MB) — the filtered dim side's
  estimated size must be below this. Raise it when the selective dim is
  bigger (the bloom agg itself stays small: bits, not rows).
- `spark.sql.autoBroadcastJoinThreshold` — if the dim fits a broadcast,
  Spark broadcasts and no bloom is needed; the bloom path is for the
  middle ground, so tests disable broadcast to exercise it.

No reference analogue (odpf/meteor has no distributed joins at all —
SURVEY.md §2.8); this is a beyond-reference scale operator.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import SparkSession

_BLOOM_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
}


@contextmanager
def runtime_bloom(spark: SparkSession, disable_broadcast: bool = False):
    """Enable runtime bloom-filter injection for plans built inside the
    context, restoring prior values on exit.

    `disable_broadcast=True` additionally sets
    autoBroadcastJoinThreshold=-1, forcing the shuffle-join shape the
    bloom filter exists for (used by tests; on a real cluster leave
    broadcast on and let size estimates pick).
    """
    confs = dict(_BLOOM_CONFS)
    if disable_broadcast:
        confs["spark.sql.autoBroadcastJoinThreshold"] = "-1"
    saved: dict[str, str | None] = {}
    for k, v in confs.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        yield spark
    finally:
        for k, old in saved.items():
            if old is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, old)
