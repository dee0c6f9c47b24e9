"""Sources: csv header scan, parquet catalog walk, jdbc catalog assembly."""

from __future__ import annotations

import pytest

from meteor_spark import registry
from meteor_spark.plugins_base import InvalidConfigError
from meteor_spark.sources.jdbc import DIALECTS, catalog_assets_from_columns


def test_csv_requires_path():
    ex = registry.extractors.get("csv")
    with pytest.raises(InvalidConfigError):
        ex.init({})


def test_csv_single_file(spark, tmp_path):
    f = tmp_path / "t.csv"
    f.write_text("b_col,a_col\n1,2\n")
    ex = registry.extractors.get("csv")
    ex.init({"path": str(f)})
    rows = ex.extract(spark).collect()
    assert len(rows) == 1
    assert rows[0]["resource"]["urn"] == "t.csv"
    # columns sorted by name, header-only (no types)
    assert [c["name"] for c in rows[0]["schema"]] == ["a_col", "b_col"]


def test_parquet_catalog(spark, sf_dir):
    ex = registry.extractors.get("parquet_catalog")
    ex.init({"path": sf_dir, "exclude": ["events"], "include_preview": True, "max_preview_rows": 2})
    rows = {r["resource"]["name"]: r for r in ex.extract(spark).collect()}
    assert "events" not in rows and "lineitem" in rows
    li = rows["lineitem"]
    assert li["asset_type"] == "Table"
    assert li["profile"]["total_rows"] > 0
    cols = [c["name"] for c in li["schema"]]
    assert cols == sorted(cols)
    assert li["preview"]["fields"][0] == "l_orderkey"
    import json

    assert len(json.loads(li["preview"]["rows"])) == 2


def test_parquet_catalog_with_profiles(spark, sf_dir):
    ex = registry.extractors.get("parquet_catalog")
    ex.init({"path": sf_dir, "include_column_profile": True, "exclude": [t for t in
             ["customer", "documents", "embeddings", "events", "lineitem", "orders", "part", "supplier"]]})
    rows = {r["resource"]["name"]: r for r in ex.extract(spark).collect()}
    nation = rows["nation"]
    prof = {c["name"]: c["profile"] for c in nation["schema"]}
    assert prof["n_nationkey"]["count"] == 25
    assert prof["n_nationkey"]["min"] == "0"


def test_jdbc_catalog_assembly(spark):
    # the shared information-schema -> assets computation, tested against
    # a fixture frame (no live DB in the container)
    cols = spark.createDataFrame(
        [
            ("db1", "applicant", "last_name", "varchar", "YES", 255, ""),
            ("db1", "applicant", "applicant_id", "int", "NO", 0, ""),
            ("db1", "jobs", "job", "varchar", "YES", 255, ""),
        ],
        "table_schema string, table_name string, column_name string, "
        "data_type string, is_nullable string, length long, description string",
    )
    out = {r["resource"]["name"]: r for r in
           catalog_assets_from_columns(cols, service="mysql", host="my-mysql").collect()}
    assert set(out) == {"applicant", "jobs"}
    app = out["applicant"]
    # URN format mysql::my-mysql/db1/applicant (models/urn.go:5-8)
    assert app["resource"]["urn"] == "mysql::my-mysql/db1/applicant"
    # columns sorted by name; YES/NO -> bool (mysql.go:201-203)
    assert [c["name"] for c in app["schema"]] == ["applicant_id", "last_name"]
    assert app["schema"][0]["is_nullable"] is False
    assert app["schema"][1]["is_nullable"] is True
    assert app["schema"][1]["length"] == 255


def test_all_jdbc_dialects_registered():
    for d in DIALECTS:
        assert registry.extractors.has(d)
    ex = registry.extractors.get("mysql")
    with pytest.raises(InvalidConfigError):
        ex.init({})  # url/user/password required


def test_orc_catalog(spark, sf_dir, tmp_path):
    """ORC sibling shares the full walk/asset path through the format
    seam: same exclude, schema sort, preview, and count behavior, with
    service/urn marked orc."""
    spark.read.parquet(f"{sf_dir}/nation.parquet").write.orc(str(tmp_path / "nation.orc"))
    spark.read.parquet(f"{sf_dir}/region.parquet").write.orc(str(tmp_path / "region.orc"))
    ex = registry.extractors.get("orc_catalog")
    ex.init({"path": str(tmp_path), "exclude": ["region"], "include_preview": True,
             "max_preview_rows": 2})
    rows = {r["resource"]["name"]: r for r in ex.extract(spark).collect()}
    assert set(rows) == {"nation"}
    n = rows["nation"]
    assert n["resource"]["service"] == "orc"
    assert n["resource"]["urn"].startswith("orc::")
    assert n["profile"]["total_rows"] == 25
    cols = [c["name"] for c in n["schema"]]
    assert cols == sorted(cols) and len(cols) == 3
    import json

    assert len(json.loads(n["preview"]["rows"])) == 2
