"""Asset model: URN construction + schema shape.

Mirrors reference semantics at models/urn.go:5-15 and the proto model
(SURVEY.md §1)."""

from __future__ import annotations

from meteor_spark.model import ASSET_SCHEMA, urn
from meteor_spark.model import schema as m


def test_table_urn():
    # models/urn.go:5-8
    assert urn.table_urn("mysql", "my-mysql", "db1", "applicant") == "mysql::my-mysql/db1/applicant"


def test_topic_dashboard_job_urns():
    assert urn.topic_urn("kafka", "my-kafka-cluster", "t1") == "kafka::my-kafka-cluster/t1"
    assert urn.dashboard_urn("grafana", "host", "d1") == "grafana::host/d1"
    assert urn.job_urn("optimus", "host", "j1") == "optimus::host/j1"


def test_asset_schema_facets():
    names = {f.name for f in ASSET_SCHEMA.fields}
    # every facet of the reference model is representable (SURVEY.md §1.3)
    assert {"resource", "asset_type", "schema", "profile", "lineage", "ownership",
            "properties", "preview", "timestamps", "charts", "blobs", "memberships"} <= names


def test_column_profile_fields():
    # ColumnProfile = min,max,avg,med,unique,count,top (schema.pb.go:180)
    assert [f.name for f in m.COLUMN_PROFILE_SCHEMA.fields] == [
        "min", "max", "avg", "med", "unique", "count", "top"]


def test_empty_asset_covers_all_fields():
    assert set(m.empty_asset()) == {f.name for f in ASSET_SCHEMA.fields}
