"""Lakehouse catalog extractors: Delta log replay and Iceberg
metadata.json walks over fabricated on-disk layouts (the formats' public
specs; no format runtime needed)."""

from __future__ import annotations

import json

import meteor_spark.sources  # noqa: F401 — registers the extractor plugins
from meteor_spark.registry import extractors


def _delta_table(root, name):
    """v0: metaData + 2 adds; v1: remove one file, add another.
    Live set after replay: part-0 (10 rows) + part-2 (7 rows)."""
    log = root / name / "_delta_log"
    log.mkdir(parents=True)
    schema = {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": False, "metadata": {}},
            {"name": "ds", "type": "string", "nullable": True, "metadata": {}},
            {"name": "amount", "type": "double", "nullable": True, "metadata": {}},
        ],
    }
    v0 = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {
            "metaData": {
                "id": "tbl-1",
                "schemaString": json.dumps(schema),
                "partitionColumns": ["ds"],
                "format": {"provider": "parquet"},
            }
        },
        {"add": {"path": "part-0.parquet", "size": 100, "stats": json.dumps({"numRecords": 10}), "dataChange": True}},
        {"add": {"path": "part-1.parquet", "size": 50, "stats": json.dumps({"numRecords": 5}), "dataChange": True}},
    ]
    v1 = [
        {"remove": {"path": "part-1.parquet", "dataChange": True}},
        {"add": {"path": "part-2.parquet", "size": 70, "stats": json.dumps({"numRecords": 7}), "dataChange": True}},
    ]
    (log / "00000000000000000000.json").write_text("\n".join(json.dumps(a) for a in v0))
    (log / "00000000000000000001.json").write_text("\n".join(json.dumps(a) for a in v1))


def _iceberg_table(root, name):
    """two metadata versions; the latest carries schemas[] (v2 layout)
    with a current snapshot summary."""
    meta = root / name / "metadata"
    meta.mkdir(parents=True)
    old = {"format-version": 1, "schema": {"fields": []}, "snapshots": []}
    (meta / "v1.metadata.json").write_text(json.dumps(old))
    new = {
        "format-version": 2,
        "current-schema-id": 1,
        "schemas": [
            {"schema-id": 0, "fields": []},
            {
                "schema-id": 1,
                "fields": [
                    {"id": 1, "name": "event_id", "type": "long", "required": True},
                    {"id": 2, "name": "payload", "type": "string", "required": False},
                    {"id": 3, "name": "amount", "type": "decimal(10, 2)", "required": False},
                ],
            },
        ],
        "current-snapshot-id": 99,
        "snapshots": [
            {"snapshot-id": 1, "summary": {"total-records": "3"}},
            {"snapshot-id": 99, "summary": {"total-records": "42", "total-files-size": "12345"}},
        ],
    }
    (meta / "v2.metadata.json").write_text(json.dumps(new))


def test_delta_log_replay_row_counts(spark, tmp_path):
    _delta_table(tmp_path, "sales")
    ex = extractors.get("delta_catalog")
    ex.init({"path": str(tmp_path)})
    rows = ex.extract(spark).collect()
    assert len(rows) == 1
    a = rows[0]
    assert a["resource"]["name"] == "sales"
    assert a["resource"]["service"] == "delta"
    # live = part-0 (10) + part-2 (7); removed part-1 excluded
    assert a["profile"]["total_rows"] == 17
    attrs = json.loads(a["properties"]["attributes"])
    assert attrs["partition_columns"] == "ds"
    assert attrs["num_files"] == "2"
    assert attrs["size_bytes"] == "170"
    # columns sorted by name, spark simpleString types
    assert [(c["name"], c["data_type"], c["is_nullable"]) for c in a["schema"]] == [
        ("amount", "double", True),
        ("ds", "string", True),
        ("id", "bigint", False),
    ]


def test_delta_live_files_frame(spark, tmp_path):
    from meteor_spark.sources.lakehouse import delta_live_files

    _delta_table(tmp_path, "sales")
    live = delta_live_files(spark, str(tmp_path / "sales" / "_delta_log"))
    got = {r["path"]: r["num_records"] for r in live.collect()}
    assert got == {"part-0.parquet": 10, "part-2.parquet": 7}


def test_iceberg_metadata_walk(spark, tmp_path):
    _iceberg_table(tmp_path, "clicks")
    ex = extractors.get("iceberg_catalog")
    ex.init({"path": str(tmp_path)})
    rows = ex.extract(spark).collect()
    assert len(rows) == 1
    a = rows[0]
    assert a["resource"]["service"] == "iceberg"
    # current-schema-id=1 selected (not schema-id 0), fields sorted,
    # iceberg types mapped, required -> not nullable
    assert [(c["name"], c["data_type"], c["is_nullable"]) for c in a["schema"]] == [
        ("amount", "decimal(10, 2)", True),
        ("event_id", "bigint", False),
        ("payload", "string", True),
    ]
    # current snapshot (99), not the older one
    assert a["profile"]["total_rows"] == 42
    attrs = json.loads(a["properties"]["attributes"])
    assert attrs["snapshot_id"] == "99"
    assert attrs["size_bytes"] == "12345"


def test_iceberg_picks_v10_over_v9(spark, tmp_path):
    # regression: lexicographic sort of v<N>.metadata.json picked
    # 'v9' over 'v10' once a table passed version 9
    meta = tmp_path / "t" / "metadata"
    meta.mkdir(parents=True)
    for ver, snap in (("v9", 9), ("v10", 10)):
        (meta / f"{ver}.metadata.json").write_text(
            json.dumps(
                {
                    "format-version": 1,
                    "schema": {"fields": []},
                    "current-snapshot-id": snap,
                    "snapshots": [{"snapshot-id": snap, "summary": {"total-records": str(snap)}}],
                }
            )
        )
    ex = extractors.get("iceberg_catalog")
    ex.init({"path": str(tmp_path)})
    a = ex.extract(spark).collect()[0]
    assert json.loads(a["properties"]["attributes"])["snapshot_id"] == "10"


def test_both_registered_and_listed():
    names = {p.name for p in extractors.list()}
    assert {"delta_catalog", "iceberg_catalog"} <= names


def test_avro_catalog_skip_not_fail(spark, tmp_path):
    """Avro is an external Spark module: where deployed, the avro
    catalog walk must behave exactly like the other five formats;
    where absent (this container), the extractor raises its clear
    plan-time error and the test SKIPS."""
    import pytest

    from meteor_spark.registry import extractors
    from meteor_spark.sources.parquet_catalog import AvroCatalogExtractor

    ex = extractors.get("avro_catalog")
    if not AvroCatalogExtractor.avro_available(spark):
        ex.init({"path": str(tmp_path)})
        with pytest.raises(RuntimeError, match="spark-avro"):
            ex._read(spark, str(tmp_path / "x.avro"))
        pytest.skip("spark-avro not on the classpath")
    df = spark.range(5).selectExpr("id", "cast(id as string) AS s")
    df.write.mode("overwrite").format("avro").save(str(tmp_path / "t.avro"))
    ex.init({"path": str(tmp_path), "include_row_count": True})
    assets = ex.extract(spark).collect()
    assert len(assets) == 1
    assert assets[0]["resource"]["name"] == "t"
    assert len(assets[0]["schema"]) == 2
    assert assets[0]["profile"]["total_rows"] == 5
