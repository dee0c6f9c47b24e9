"""Stage the streaming state-BUDGET break the salted attribution twin
exists for — on REAL separate executor heaps via local-cluster mode.

docs/SCALING.md "STREAMING CROSSOVER" (r11) measured per-partition
state bytes but could not stage the break itself: local[N] is one
shared JVM heap, so constraining it starves all partitions equally.
local-cluster[W, C, MB] (the r11 verdict's untried avenue) launches W
separate WORKER JVMs with their own MB-bounded heaps — the symmetric
hash join's HDFSBackedStateStore lives in executor heap, so the
partition that owns a mega-hot key's click state can now exhaust ITS
executor while the others idle, exactly the real-cluster failure mode.

Fixture (purpose-built, written to /tmp): one hot user with HOT_CLICKS
clicks inside a single hour, BG_USERS background users with ~100
clicks + 2 purchases each. The hot user's single purchase is placed
BEFORE its clicks, so the hot key contributes ~zero OUTPUT rows while
still pinning its full click state — output stays driver-collectable
while state carries the skew (the regime of SCALING.md's crossover
condition: hot_key_click_state > store_budget, purchase_state x salt /
partitions < store_budget; clicks dominate purchases here, unlike the
Zipf fixture where purchase replication dominated and salting honestly
LOST on state).

Per twin: run under local-cluster[4, 1, EXEC_MB] with an explicit
checkpoint; record completed/failed, wall seconds, output rows, state
rows, per-partition state bytes. The PLAIN twin is expected to die on
the hot partition's executor (task OOM -> 4 retries -> query abort);
the SALTED twin spreads the same state across 16 shards / 4 workers
and must complete with the output row count the DuckDB interval join
predicts. A control run at CONTROL_MB (comfortably large) must show
BOTH twins completing with identical counts, pinning the failure on
the budget rather than the mode.

Usage: python tools/probe_streaming_state_budget.py [--control-only]
Env: HOT_CLICKS (default 2_000_000), BG_USERS (2000),
     EXEC_MB (700), CONTROL_MB (4096), PROBE_STATE_PARTITIONS (16).
Prints one JSON line per (config, twin) run.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HOT_CLICKS = int(os.environ.get("HOT_CLICKS", "2000000"))
BG_USERS = int(os.environ.get("BG_USERS", "2000"))
EXEC_MB = int(os.environ.get("EXEC_MB", "700"))
CONTROL_MB = int(os.environ.get("CONTROL_MB", "4096"))
PARTS = int(os.environ.get("PROBE_STATE_PARTITIONS", "16"))
# parameter-keyed path: a re-run with different knobs must never
# silently reuse the previous fixture
FIXTURE = f"/tmp/hotclick_{HOT_CLICKS}_{BG_USERS}"


def build_fixture() -> None:
    """events.parquet with the standard schema, built by a short-lived
    local[8] session (the probe sessions are memory-capped)."""
    if os.path.exists(os.path.join(FIXTURE, "events.parquet")):
        return
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("hotclick_build")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    t0 = "TIMESTAMP '2024-01-01 06:00:00'"
    # hot user 0: HOT_CLICKS clicks spread across [t0, t0+1h)
    hot = spark.range(HOT_CLICKS).selectExpr(
        "id AS event_id",
        f"{t0} + make_interval(0,0,0,0,0,0, id * 3600.0 / {HOT_CLICKS}) AS ts",
        "CAST(0 AS BIGINT) AS user_id",
        "'click' AS event_type",
        "CAST(1.0 AS DOUBLE) AS value",
        "'{}' AS props",
    )
    # hot user's one purchase BEFORE its clicks: joins nothing, stores one row
    hotp = spark.range(1).selectExpr(
        f"{HOT_CLICKS} + id AS event_id",
        f"{t0} - INTERVAL 10 MINUTES AS ts",
        "CAST(0 AS BIGINT) AS user_id",
        "'purchase' AS event_type",
        "CAST(9.99 AS DOUBLE) AS value",
        "'{}' AS props",
    )
    base = HOT_CLICKS + 1
    # background: 100 clicks per user in [t0, t0+50min), 2 purchases at
    # t0+55min and t0+59min -> each purchase attributes all 100 clicks
    bgc = spark.range(BG_USERS * 100).selectExpr(
        f"{base} + id AS event_id",
        f"{t0} + make_interval(0,0,0,0,0,0, (id % 100) * 30.0) AS ts",
        "CAST(1 + id DIV 100 AS BIGINT) AS user_id",
        "'click' AS event_type",
        "CAST(1.0 AS DOUBLE) AS value",
        "'{}' AS props",
    )
    bgp = spark.range(BG_USERS * 2).selectExpr(
        f"{base + BG_USERS * 100} + id AS event_id",
        f"{t0} + INTERVAL 55 MINUTES + make_interval(0,0,0,0,0,0, (id % 2) * 240.0) AS ts",
        "CAST(1 + id DIV 2 AS BIGINT) AS user_id",
        "'purchase' AS event_type",
        "CAST(5.0 AS DOUBLE) AS value",
        "'{}' AS props",
    )
    df = hot.unionByName(hotp).unionByName(bgc).unionByName(bgp)
    tmp = FIXTURE + ".build"
    shutil.rmtree(tmp, ignore_errors=True)
    # ONE part file renamed to events.parquet: stream_events glob-filters
    # on the exact file name (the fixture convention is file-per-table)
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = next(
        f for f in os.listdir(tmp) if f.startswith("part-") and f.endswith(".parquet")
    )
    os.makedirs(FIXTURE, exist_ok=True)
    dest = os.path.join(FIXTURE, "events.parquet")
    if os.path.exists(dest):
        os.remove(dest)
    os.rename(os.path.join(tmp, part), dest)
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


def expected_pairs() -> int:
    import duckdb

    return duckdb.sql(f"""
        SELECT count(*) FROM
          (SELECT user_id, ts FROM '{FIXTURE}/events.parquet'
           WHERE event_type = 'purchase') p
        JOIN
          (SELECT user_id, ts FROM '{FIXTURE}/events.parquet'
           WHERE event_type = 'click') c
        ON p.user_id = c.user_id
          AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
    """).fetchone()[0]


def _state_bytes_by_partition(ckpt: str) -> dict[int, int]:
    sizes: dict[int, int] = {}
    root = os.path.join(ckpt, "state")
    for dirpath, _dirs, files in os.walk(root):
        rel = os.path.relpath(dirpath, root).split(os.sep)
        if len(rel) < 2:
            continue
        try:
            pid = int(rel[1])
        except ValueError:
            continue
        for f in files:
            sizes[pid] = sizes.get(pid, 0) + os.path.getsize(os.path.join(dirpath, f))
    return sizes


def run_twin(exec_mb: int, salted: bool) -> dict:
    """Fresh local-cluster session per run: an executor the previous
    twin OOMed must not pollute this one."""
    from pyspark.sql import SparkSession

    from meteor_spark.streaming.pipeline import (
        stream_events,
        stream_stream_attribution,
        stream_stream_attribution_salted,
    )

    spark = (
        SparkSession.builder.master(f"local-cluster[4,1,{exec_mb}]")
        .appName(f"budget_{'salted' if salted else 'plain'}_{exec_mb}")
        .config("spark.executor.memory", f"{max(exec_mb - 50, 450)}m")
        .config("spark.driver.memory", "4g")
        .config("spark.sql.shuffle.partitions", str(PARTS))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        # fail fast once the hot executor dies instead of cycling retries
        .config("spark.task.maxFailures", "4")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    events = stream_events(spark, FIXTURE)
    stream = (
        stream_stream_attribution_salted(events)
        if salted
        else stream_stream_attribution(events)
    )
    name = f"budget_{uuid.uuid4().hex[:8]}"
    ckpt = tempfile.mkdtemp(prefix="msk_budget_")
    t0 = time.time()
    out: dict = {
        "config_mb": exec_mb,
        "twin": "salted" if salted else "plain",
        "partitions_cfg": PARTS,
        "hot_clicks": HOT_CLICKS,
    }
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
        out["status"] = "completed"
        out["rows"] = spark.table(name).count()
        out["state_rows_total"] = sum(
            op.get("numRowsTotal", 0) for op in prog.get("stateOperators", [])
        )
        sizes = _state_bytes_by_partition(ckpt)
        top = sorted(sizes.values(), reverse=True)
        out["max_partition_bytes"] = top[0] if top else 0
        out["total_state_bytes"] = sum(top)
        out["top4"] = top[:4]
    except Exception as e:  # noqa: BLE001 — the break IS the measurement
        out["status"] = "failed"
        out["error_head"] = " ".join(str(e).split())[:400]
    finally:
        out["wall_sec"] = round(time.time() - t0, 1)
        spark.stop()
        shutil.rmtree(ckpt, ignore_errors=True)
    return out


def main() -> int:
    build_fixture()
    exp = expected_pairs()
    print(json.dumps({"fixture": FIXTURE, "expected_pairs": exp,
                      "hot_clicks": HOT_CLICKS, "bg_users": BG_USERS}))
    configs = [CONTROL_MB] if "--control-only" in sys.argv else [CONTROL_MB, EXEC_MB]
    for mb in configs:
        for salted in (False, True):
            r = run_twin(mb, salted)
            r["expected_pairs"] = exp
            r["rows_match_expected"] = r.get("rows") == exp
            print(json.dumps(r))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
