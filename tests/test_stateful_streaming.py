"""Cross-batch stateful sessionization must equal the batch window
computation once the stream is drained."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from meteor_spark.streaming.pipeline import normalize_ts
from meteor_spark.streaming.stateful import sessionize_stateful


def test_update_late_event_does_not_regress_session_clock():
    """regression: last_us = ts let a late cross-batch event move the
    session clock backwards, so the next on-time event opened a phantom
    session. Drive _update directly with a fake GroupState."""
    import pandas as pd

    from meteor_spark.streaming.stateful import GAP_US, _update

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

    st = FakeState()
    h = 3_600_000_000  # 1h in us
    batches = [
        [9 * h, 10 * h],          # 2 sessions (gap 1h > 30min)
        [9 * h + GAP_US // 2],    # late event inside session 1's window
        [10 * h + 5 * 60_000_000],  # 10:05 — same session as 10:00
    ]
    for ts_list in batches:
        list(_update((1,), iter([pd.DataFrame({"ts_us": ts_list})]), st))
    last_us, n_events, n_sessions = st.get
    assert n_events == 4
    assert n_sessions == 2  # the late event must not split session 2
    assert last_us == 10 * h + 5 * 60_000_000


def test_stateful_sessionize_matches_batch(spark, sf_dir, tmp_path):
    # split events into 4 time-ordered chunks staged with increasing
    # mtimes (the file source orders by modification time) -> 4
    # micro-batches in event-time order, so state genuinely carries
    # across batches
    import glob
    import os
    import time

    # normalize whatever timestamp flavor the fixture has (nanos-long or
    # timestamp[us]) so the quantile math is unit-agnostic
    raw = normalize_ts(spark.read.parquet(f"{sf_dir}/events.parquet")).withColumn(
        "__us", F.unix_micros("ts")
    )
    chunks = str(tmp_path / "chunks")
    bounds = raw.approxQuantile("__us", [0.25, 0.5, 0.75], 0.0)
    edges = [float("-inf"), *bounds, float("inf")]
    base = time.time() - 1000
    seen: set[str] = set()
    for i in range(4):
        part = (
            raw.filter((raw.__us >= edges[i]) & (raw.__us < edges[i + 1]))
            if i
            else raw.filter(raw.__us < edges[1])
        ).drop("__us")
        part.coalesce(1).write.mode("append").parquet(chunks)
        for f in glob.glob(f"{chunks}/part-*"):
            if f not in seen:
                os.utime(f, (base + i * 10, base + i * 10))
                seen.add(f)

    stream = normalize_ts(
        spark.readStream.schema(spark.read.parquet(chunks).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(chunks)
    )
    name = f"sess_{uuid.uuid4().hex[:8]}"
    q = (
        sessionize_stateful(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update mode emits one row per (user, batch); the final totals are
    # the row with the max n_events per user
    out = (
        spark.table(name)
        .groupBy("user_id")
        .agg(F.max(F.struct("n_events", "n_sessions")).alias("s"))
        .select("user_id", "s.n_events", "s.n_sessions")
    )
    got = {r["user_id"]: (r["n_events"], r["n_sessions"]) for r in out.collect()}

    from meteor_spark.queries import user_sessions

    expected = {r["user_id"]: (r["n_events"], r["n_sessions"]) for r in user_sessions(spark, sf_dir).collect()}
    assert got == expected


def test_transform_with_state_matches_batch(spark, sf_dir, tmp_path):
    """state-v2 per-user activity totals over a 3-batch stream must equal
    the one-shot batch aggregate once drained."""
    import pytest

    # the state-v2 python client speaks protobuf to the state server;
    # containers without google.protobuf can't run it (the operator is
    # still exercised for plan construction below on real clusters)
    pytest.importorskip("google.protobuf.descriptor")
    import uuid as _uuid

    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    chunks = str(tmp_path / "tws_chunks")
    # 3 chunks by event_id stripe — state must merge users seen in
    # multiple batches
    for i in range(3):
        raw.filter(F.col("event_id") % 3 == i).coalesce(1).write.mode("append").parquet(chunks)

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        from meteor_spark.streaming.stateful import user_activity_stateful

        stream = (
            spark.readStream.schema(spark.read.parquet(chunks).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(chunks)
        )
        name = f"tws_{_uuid.uuid4().hex[:8]}"
        q = (
            user_activity_stateful(stream)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        out = (
            spark.table(name)
            .groupBy("user_id")
            .agg(F.max(F.struct("n_events", "total_value", "n_types")).alias("s"))
            .select("user_id", "s.n_events", "s.total_value", "s.n_types")
        )
        got = {r["user_id"]: (r["n_events"], r["total_value"], r["n_types"]) for r in out.collect()}
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)

    batch = (
        raw.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.countDistinct("event_type").alias("n_types"),
        )
    )
    expected = {
        r["user_id"]: (r["n_events"], r["total_value"], r["n_types"]) for r in batch.collect()
    }
    assert got == expected


def test_transform_with_state_plan_builds(spark, sf_dir):
    """Plan construction for the state-v2 operator is protobuf-free: the
    unresolved streaming plan and output schema must be right even where
    the runtime client can't execute."""
    from meteor_spark.streaming.stateful import user_activity_stateful

    schema = spark.read.option("pathGlobFilter", "events.parquet").parquet(sf_dir).schema
    stream = spark.readStream.schema(schema).option("pathGlobFilter", "events.parquet").parquet(sf_dir)
    out = user_activity_stateful(stream)
    assert out.isStreaming
    assert [f.name for f in out.schema.fields] == ["user_id", "n_events", "total_value", "n_types"]


def test_stateful_restart_recovers_from_checkpoint(spark, tmp_path):
    """Stop after batch 1, restart the same query from its checkpoint
    with new input: per-user state must carry across the restart (the
    driver-failure story on a real cluster)."""
    import glob
    import os

    ckpt = str(tmp_path / "ckpt")
    watch = tmp_path / "in"
    watch.mkdir()
    b1 = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 7, "click", 1.0, "{}"),
         (2, "2024-01-01 00:05:00", 7, "view", 2.0, "{}")],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    b2 = spark.createDataFrame(
        # > 30 min after b1's last event -> a SECOND session for user 7
        [(3, "2024-01-01 02:00:00", 7, "click", 3.0, "{}")],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    def stage(df, name, mtime):
        d = str(tmp_path / name)
        df.coalesce(1).write.mode("overwrite").parquet(d)
        src = next(p for p in glob.glob(f"{d}/part-*.parquet"))
        dst = watch / f"{name}.parquet"
        dst.write_bytes(open(src, "rb").read())
        os.utime(dst, (mtime, mtime))

    def run_once():
        # the memory sink cannot recover from a checkpoint; foreachBatch
        # is the fault-tolerant sink path (same as production)
        got: list = []

        def collect_batch(df, _epoch):
            got.extend(df.collect())

        stream = spark.readStream.schema(b1.schema).parquet(str(watch))
        q = (
            sessionize_stateful(stream)
            .writeStream.foreachBatch(collect_batch)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return got

    stage(b1, "b1", 1_700_000_000)
    first = {r["user_id"]: (r["n_events"], r["n_sessions"]) for r in run_once()}
    assert first[7] == (2, 1)

    stage(b2, "b2", 1_700_000_900)
    second = run_once()  # RESTART: must resume from ckpt and only read b2
    # state carried: 3 total events, and the 2h gap opened session #2
    assert {r["user_id"]: (r["n_events"], r["n_sessions"]) for r in second}[7] == (3, 2)


# ---------------------------------------------------------------------------
# Kill-and-resume equality: for each stateful streaming family member,
# process the first half of the microbatches, STOP the query, restart
# from the checkpoint over the remaining files, and assert the union of
# published output equals the uninterrupted single run. Batch
# boundaries are pinned identical in both runs (maxFilesPerTrigger=1,
# mtime order), so any divergence is recovery state, not batching.
# ---------------------------------------------------------------------------


def _stage_parquet(df, build_dir, watch_dir, name: str, mtime: int) -> None:
    import glob
    import os

    d = str(build_dir / name)
    df.coalesce(1).write.mode("overwrite").parquet(d)
    src = glob.glob(f"{d}/part-*.parquet")[0]
    dst = watch_dir / f"{name}.parquet"
    dst.write_bytes(open(src, "rb").read())
    os.utime(dst, (mtime, mtime))


def _ttl_batches(spark):
    """The streaming_ttl_dedup gate's exact four-microbatch fixture:
    fresh keys, live-state drops, and post-eviction re-admission
    (queries.py streaming_ttl_dedup)."""
    t0 = 1_700_000_000
    return (
        spark.range(100).selectExpr("id AS k", f"timestamp_seconds({t0} + id) AS ts"),
        spark.range(20).selectExpr(
            "200 + id AS k", f"timestamp_seconds({t0} + 14400 + id) AS ts"
        ),
        spark.range(10).selectExpr(
            "300 + id AS k", f"timestamp_seconds({t0} + 14500 + id) AS ts"
        ),
        spark.range(25)
        .selectExpr("id AS k", f"timestamp_seconds({t0} + 13000) AS ts")
        .union(
            spark.range(5).selectExpr(
                "210 + id AS k", f"timestamp_seconds({t0} + 15000) AS ts"
            )
        ),
    )


def _run_ttl_foreach(spark, watch, ckpt) -> list:
    """Drive the TTL dedup over whatever files currently sit in watch,
    from (or creating) the given checkpoint; foreachBatch is the
    fault-tolerant sink path (the memory sink cannot recover)."""
    got: list = []

    def collect_batch(df, _epoch):
        got.extend((r["k"], r["ts_s"]) for r in df.collect())

    s = (
        spark.readStream.schema("k long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(watch))
    )
    out = (
        s.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["k"])
        .select("k", F.expr("CAST(unix_timestamp(ts) AS BIGINT)").alias("ts_s"))
    )
    q = (
        out.writeStream.foreachBatch(collect_batch)
        .outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return got


def test_ttl_dedup_kill_and_resume_equals_uninterrupted(spark, tmp_path):
    """dropDuplicatesWithinWatermark state (live keys + watermark) must
    survive a stop/restart: a key first seen before the stop must still
    be dropped after the restart while its TTL state lives, and the
    split run's total output must equal the uninterrupted run row for
    row."""
    batches = _ttl_batches(spark)

    # uninterrupted reference: all four files visible from the start
    w_all = tmp_path / "all"
    w_all.mkdir()
    for i, b in enumerate(batches):
        _stage_parquet(b, tmp_path, w_all, f"batch_{i}", 1_700_000_000 + i * 1000)
    ref = _run_ttl_foreach(spark, w_all, tmp_path / "ckpt_all")

    # split run: two files, stop, stage the rest, resume from checkpoint
    w = tmp_path / "split"
    w.mkdir()
    for i in (0, 1):
        _stage_parquet(batches[i], tmp_path, w, f"batch_{i}", 1_700_000_000 + i * 1000)
    first = _run_ttl_foreach(spark, w, tmp_path / "ckpt_split")
    for i in (2, 3):
        _stage_parquet(batches[i], tmp_path, w, f"batch_{i}", 1_700_000_000 + i * 1000)
    second = _run_ttl_foreach(spark, w, tmp_path / "ckpt_split")

    assert sorted(first + second) == sorted(ref)
    # the resumed run must have processed only the new files (state
    # carried, input offsets honored): batch_0's 100 keys belong to run 1
    assert len(first) == 120  # b0's 100 fresh + b1's 20 fresh
    # b3 re-admissions/drops land in run 2 exactly as uninterrupted
    assert len(second) == len(ref) - 120


def test_incremental_dedup_kill_and_resume_equals_uninterrupted(spark, tmp_path):
    """The fingerprint-store continuation path (seed=False + the same
    checkpoint) must resume mid-stream: fingerprints appended before the
    stop still dedup later batches, and the final survivor set equals
    the uninterrupted run's."""
    import os

    from meteor_spark.streaming.pipeline import incremental_dedup_stream

    corpus = spark.createDataFrame([(1, "alpha text")], "doc_id long, text string")
    batches = [
        spark.createDataFrame(
            [(10, "bravo text"), (11, "charlie text")], "doc_id long, text string"
        ),
        spark.createDataFrame(
            [(20, "BRAVO   text"), (21, "delta text")], "doc_id long, text string"
        ),
        # 30 dups batch-1's survivor 11 ACROSS the stop boundary; 31 dups
        # the corpus; 32 is novel
        spark.createDataFrame(
            [(30, "  CHARLIE text"), (31, "alpha  TEXT"), (32, "echo text")],
            "doc_id long, text string",
        ),
        spark.createDataFrame(
            [(40, "delta   TEXT"), (41, "foxtrot text")], "doc_id long, text string"
        ),
    ]

    def stage_all(watch, idxs):
        for i in idxs:
            _stage_parquet(
                batches[i], tmp_path, watch, f"batch_{i}", 1_700_000_000 + i * 1000
            )

    # uninterrupted reference
    w_all = tmp_path / "d_all"
    w_all.mkdir()
    stage_all(w_all, range(4))
    ref = incremental_dedup_stream(
        spark, str(w_all), corpus, str(tmp_path / "d_store_all"), str(tmp_path / "d_ck_all")
    )
    ref_ids = sorted(r["doc_id"] for r in ref.collect())
    assert ref_ids == [10, 11, 21, 32, 41]

    # split run
    w = tmp_path / "d_split"
    w.mkdir()
    stage_all(w, (0, 1))
    incremental_dedup_stream(
        spark, str(w), corpus, str(tmp_path / "d_store"), str(tmp_path / "d_ck")
    )
    stage_all(w, (2, 3))
    out = incremental_dedup_stream(
        spark,
        str(w),
        corpus,
        str(tmp_path / "d_store"),
        str(tmp_path / "d_ck"),
        seed=False,  # continue on the existing store — do NOT rebuild it
    )
    assert sorted(r["doc_id"] for r in out.collect()) == ref_ids


def test_incremental_neardup_kill_and_resume_equals_uninterrupted(spark, tmp_path):
    """The LSH band store's continuation path: a post-restart batch doc
    that is a near-dup of a PRE-restart survivor must still be dropped
    (band + shingle state persisted through the store, offsets through
    the checkpoint), and the final survivor set equals the uninterrupted
    run's."""
    from meteor_spark.streaming.pipeline import incremental_neardup_stream

    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    corpus = spark.createDataFrame([(1, base)], "doc_id long, text string")
    novel_a = "completely different content about spark structured streaming state stores and dedup"
    novel_b = "unrelated text on partition pruning bucketing and broadcast joins in catalyst"
    batches = [
        spark.createDataFrame(
            [(10, base.replace("today", "tonight")), (11, novel_a)],
            "doc_id long, text string",
        ),
        # 20 near-dups pre-restart survivor 11 ACROSS the stop boundary;
        # 21 is novel
        spark.createDataFrame(
            [(20, novel_a + " pipelines"), (21, novel_b)], "doc_id long, text string"
        ),
        spark.createDataFrame(
            # " pipelines" (not " again"): the suffix must actually
            # band-collide with novel_b under the deterministic minhash
            # (verified by direct band-key comparison; " again" misses
            # every band and would test nothing)
            [(30, novel_b + " pipelines"), (31, "fresh words about watermark eviction and quantile sketches entirely")],
            "doc_id long, text string",
        ),
    ]

    def stage_all(watch, idxs):
        for i in idxs:
            _stage_parquet(
                batches[i], tmp_path, watch, f"batch_{i}", 1_700_000_000 + i * 1000
            )

    w_all = tmp_path / "n_all"
    w_all.mkdir()
    stage_all(w_all, range(3))
    ref = incremental_neardup_stream(
        spark, str(w_all), corpus, str(tmp_path / "n_store_all"), str(tmp_path / "n_ck_all"),
        threshold=0.5,
    )
    ref_ids = sorted(r["doc_id"] for r in ref.collect())
    assert ref_ids == [11, 21, 31]

    w = tmp_path / "n_split"
    w.mkdir()
    stage_all(w, (0,))
    incremental_neardup_stream(
        spark, str(w), corpus, str(tmp_path / "n_store"), str(tmp_path / "n_ck"),
        threshold=0.5,
    )
    stage_all(w, (1, 2))
    out = incremental_neardup_stream(
        spark, str(w), corpus, str(tmp_path / "n_store"), str(tmp_path / "n_ck"),
        threshold=0.5, seed=False,
    )
    assert sorted(r["doc_id"] for r in out.collect()) == ref_ids


def test_sliding_distinct_state_kill_and_resume(spark, tmp_path):
    """The HLL-register partials behind streaming_sliding_distinct are a
    streaming groupBy-max: in update mode each microbatch emits the keys
    it changed. After a stop/restart the state store must restore the
    max-rho registers, so replaying the LAST update per key from the
    split run must equal the uninterrupted run AND the batch registers
    over the full data."""
    from meteor_spark.operators import sketches

    t0 = 1_700_000_000
    batches = [
        spark.range(500).selectExpr(
            "id AS user_id", "'click' AS event_type",
            f"timestamp_seconds({t0} + id) AS ts",
        ),
        # overlapping users: must NOT raise registers twice
        spark.range(400).selectExpr(
            "id AS user_id", "'click' AS event_type",
            f"timestamp_seconds({t0} + 3600 + id) AS ts",
        ),
        spark.range(300, 900).selectExpr(
            "id AS user_id", "'view' AS event_type",
            f"timestamp_seconds({t0} + 7200 + id) AS ts",
        ),
    ]

    def run(watch, ckpt) -> dict:
        latest: dict = {}

        def collect_batch(df, epoch):
            for r in df.collect():
                latest[(r["event_type"], r["hr"], r["reg"])] = (epoch, r["rho"])

        s = (
            spark.readStream.schema("user_id long, event_type string, ts timestamp")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(watch))
        )
        partials = sketches.hll64_partials(
            s.withColumn("hr", F.expr("CAST(unix_timestamp(ts) AS BIGINT) div 3600")),
            ["event_type", "hr"],
            "user_id",
            lg_k=6,
        )
        q = (
            partials.writeStream.foreachBatch(collect_batch)
            .outputMode("update")
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return latest

    w_all = tmp_path / "s_all"
    w_all.mkdir()
    for i, b in enumerate(batches):
        _stage_parquet(b, tmp_path, w_all, f"batch_{i}", 1_700_000_000 + i * 1000)
    ref = run(w_all, tmp_path / "s_ck_all")

    w = tmp_path / "s_split"
    w.mkdir()
    _stage_parquet(batches[0], tmp_path, w, "batch_0", 1_700_000_000)
    first = run(w, tmp_path / "s_ck")
    for i in (1, 2):
        _stage_parquet(batches[i], tmp_path, w, f"batch_{i}", 1_700_000_000 + i * 1000)
    second = run(w, tmp_path / "s_ck")

    merged = dict(first)
    merged.update(second)  # later run's updates win per key
    final = {k: v[1] for k, v in merged.items()}
    assert final == {k: v[1] for k, v in ref.items()}

    # ... and both equal the BATCH registers over the full data — the
    # same equality the gate's oracle asserts
    full = batches[0].unionByName(batches[1]).unionByName(batches[2]).withColumn(
        "hr", F.expr("CAST(unix_timestamp(ts) AS BIGINT) div 3600")
    )
    batch_regs = {
        (r["event_type"], r["hr"], r["reg"]): r["rho"]
        for r in sketches.hll64_partials(full, ["event_type", "hr"], "user_id", lg_k=6).collect()
    }
    assert final == batch_regs
