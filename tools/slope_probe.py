"""Attribute the two steepest 10x time ratios (VERDICT r6 #3).

streaming_sliding_distinct (3.8x at 10x) and leakage_free_split (4.1x)
report one end-to-end number; this probe splits each into its phases
at two fixture scales so the slope lands on the right component:

- streaming_sliding_distinct: the events fixture is ONE parquet file
  and the stream runs trigger(availableNow) with no maxFilesPerTrigger,
  so the microbatch count is pinned at 1 AT BOTH SCALES by
  construction — the slope cannot be per-microbatch fixed cost
  multiplied by more microbatches. Phases: (a) register-partials
  aggregation through the state store (run_stream_to_batch), (b) the
  sliding window-explode readout over the finished state. State row
  count is printed for both scales: (event_type x hour x register) is
  time-range-sized, and the 10x construction copies timestamps, so it
  must be IDENTICAL across scales — proving state growth contributes
  nothing.
- leakage_free_split: (a) shared near-dup CC label materialization
  (cluster_components), (b) the split assignment + readout on top.

Usage: python tools/slope_probe.py [sf_dir_1x] [sf_dir_10x]
Defaults: /root/testdata/sf0.1 /tmp/scale10
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def probe_sliding(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from meteor_spark.operators import sketches
    from meteor_spark.queries import _HLL64_LGK
    from meteor_spark.streaming.pipeline import run_stream_to_batch, stream_events

    ev = stream_events(spark, sf_dir).withColumn(
        "hr", F.expr("CAST(unix_timestamp(ts) AS BIGINT) div 3600")
    )
    partials = sketches.hll64_partials(ev, ["event_type", "hr"], "user_id", lg_k=_HLL64_LGK)
    t0 = time.time()
    state = run_stream_to_batch(partials, output_mode="complete")
    n_state = state.count()
    t_state = time.time() - t0
    t1 = time.time()
    out = sketches.sliding_hll64(state, ["event_type"], "hr", window=3, lg_k=_HLL64_LGK)
    n_out = out.count()
    t_read = time.time() - t1
    return {
        "state_sec": round(t_state, 2),
        "state_rows": n_state,
        "readout_sec": round(t_read, 2),
        "out_rows": n_out,
    }


def probe_split(spark, sf_dir: str) -> dict:
    from meteor_spark.queries import QUERIES, _SHARED

    _SHARED.clear()
    spark.catalog.clearCache()
    t0 = time.time()
    df = QUERIES["leakage_free_split"](spark, sf_dir)
    t_build = time.time() - t0  # query construction materializes the CC labels
    t1 = time.time()
    n = df.count()
    t_read = time.time() - t1
    return {
        "cc_build_sec": round(t_build, 2),
        "assign_readout_sec": round(t_read, 2),
        "out_rows": n,
    }


def main() -> int:
    one = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    ten = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale10"
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from meteor_spark.session import get_spark

    spark = get_spark("slope_probe")
    spark.sparkContext.setLogLevel("ERROR")
    for label, sf in (("1x", one), ("10x", ten)):
        # min-of-2 per scale: the first run pays streaming class-load
        r = min(
            (probe_sliding(spark, sf) for _ in range(2)),
            key=lambda d: d["state_sec"] + d["readout_sec"],
        )
        print(f"sliding_distinct {label}: {r}")
    for label, sf in (("1x", one), ("10x", ten)):
        r = probe_split(spark, sf)
        print(f"leakage_free_split {label}: {r}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
