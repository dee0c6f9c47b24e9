"""Measure per-PARTITION stream-stream join state for the attribution
twins — the streaming-crossover probe the r10 verdict asked for.

Why this measurement and not an induced OOM: the batch salting sweep
(docs/SCALING.md CROSSOVER) could induce its regime because a batch
task's budget is its own; a STREAMING state budget is per executor
store, and local[N] has ONE shared JVM heap — constraining it starves
every partition equally, so the "one hot partition blows its store"
break simply cannot be staged in-container. What can be measured
honestly is the quantity that produces the break on a real cluster:
how many state bytes/rows the symmetric hash join pins to the ONE
partition that owns the hot user, versus the salted twin's spread.
Extrapolation from those bytes to any given per-executor store budget
is then arithmetic, recorded in SCALING.md STREAMING CROSSOVER.

Method: run each twin over $SPARK_GRAFT_SF_DIR (default /tmp/skew10,
Zipf 1.2) with an EXPLICIT checkpoint dir and state partitions pinned,
then walk state/<op>/<partition>/ and sum the HDFSBackedStateStore
delta/snapshot bytes per partition. Prints one JSON line per twin:
{"twin", "rows", "state_rows_total", "partitions",
 "max_partition_bytes", "total_state_bytes", "top4": [...]}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _state_bytes_by_partition(ckpt: str) -> dict[int, int]:
    sizes: dict[int, int] = {}
    root = os.path.join(ckpt, "state")
    for dirpath, _dirs, files in os.walk(root):
        rel = os.path.relpath(dirpath, root).split(os.sep)
        # state/<operatorId>/<partitionId>/...
        if len(rel) < 2:
            continue
        try:
            pid = int(rel[1])
        except ValueError:
            continue
        for f in files:
            sizes[pid] = sizes.get(pid, 0) + os.path.getsize(os.path.join(dirpath, f))
    return sizes


def run_twin(spark, sf_dir: str, salted: bool, parts: int) -> dict:
    from meteor_spark.streaming.pipeline import (
        stream_events,
        stream_stream_attribution,
        stream_stream_attribution_salted,
    )

    events = stream_events(spark, sf_dir)
    stream = (
        stream_stream_attribution_salted(events)
        if salted
        else stream_stream_attribution(events)
    )
    name = f"probe_{uuid.uuid4().hex[:8]}"
    ckpt = tempfile.mkdtemp(prefix="msk_state_probe_")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    try:
        q = (
            stream.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        prog = q.lastProgress or {}
        state_rows = sum(
            op.get("numRowsTotal", 0) for op in prog.get("stateOperators", [])
        )
        n_out = spark.table(name).count()
        sizes = _state_bytes_by_partition(ckpt)
        top = sorted(sizes.values(), reverse=True)
        return {
            "twin": "salted" if salted else "plain",
            "rows": n_out,
            "state_rows_total": state_rows,
            "partitions": len(sizes),
            "max_partition_bytes": top[0] if top else 0,
            "total_state_bytes": sum(top),
            "top4": top[:4],
        }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        shutil.rmtree(ckpt, ignore_errors=True)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/skew10")
    parts = int(os.environ.get("PROBE_STATE_PARTITIONS", "16"))
    from meteor_spark.session import get_spark

    spark = get_spark("stateprobe")
    spark.sparkContext.setLogLevel("ERROR")
    for salted in (False, True):
        print(json.dumps(run_twin(spark, sf_dir, salted, parts)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
