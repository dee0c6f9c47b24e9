"""Compass/Stencil payload builders + kafka row shaping (pure functions,
asserted against reference payload semantics — sink_test.go goldens
shape, SURVEY.md §2.5)."""

from __future__ import annotations

import json

from meteor_spark.sinks.compass import build_compass_payload, resolve_label_template
from meteor_spark.sinks.kafka_sink import kafka_rows
from meteor_spark.sinks.stencil import build_avro_schema, build_json_schema

RECORD = {
    "resource": {
        "urn": "bigquery::p/d/t",
        "name": "t",
        "service": "bigquery",
        "type": "Table",
        "url": None,
        "description": "tbl",
    },
    "asset_type": "Table",
    "schema": [
        {"name": "c1", "data_type": "INT64", "is_nullable": True, "description": "col1"},
        {"name": "c2", "data_type": "STRING", "is_nullable": False, "description": ""},
    ],
    "ownership": [{"urn": "u1", "name": "o", "role": "owner", "email": "o@x.io"}],
    "lineage": {
        "upstreams": [{"urn": "up1", "type": "Table", "service": "mysql"}],
        "downstreams": [{"urn": "down1", "type": "Table", "service": "kafka"}],
    },
    "properties": {"tags": None, "labels": {"team": "core"}, "attributes": json.dumps({"env": "prod"})},
}


def test_compass_payload_shape():
    p = build_compass_payload(RECORD)
    assert p["asset"]["urn"] == "bigquery::p/d/t"
    assert p["asset"]["type"] == "table"  # lowercased (compass/sink.go:152-165)
    assert p["asset"]["owners"][0]["email"] == "o@x.io"
    # lineage split into upstreams/downstreams (compass/sink.go:143-220)
    assert p["upstreams"] == [{"urn": "up1", "type": "table", "service": "mysql"}]
    assert p["downstreams"] == [{"urn": "down1", "type": "table", "service": "kafka"}]
    assert p["asset"]["data"]["schema"][0]["name"] == "c1"


def test_compass_label_templating():
    # compass/sink.go:222-300
    assert resolve_label_template("$properties.attributes.env", RECORD) == "prod"
    assert resolve_label_template("$properties.labels.team", RECORD) == "core"
    assert resolve_label_template("literal", RECORD) == "literal"
    assert resolve_label_template("$properties.attributes.missing", RECORD) is None
    p = build_compass_payload(RECORD, {"env": "$properties.attributes.env", "x": "$properties.attributes.nope"})
    assert p["asset"]["labels"] == {"env": "prod"}  # unresolved keys dropped


def test_stencil_json_schema():
    s = build_json_schema(RECORD)
    # typeToJsonSchemaType: INT64 -> number, nullable appends null
    assert s["properties"]["c1"] == {"type": ["number", "null"], "description": "col1"}
    assert s["properties"]["c2"]["type"] == ["string"]
    assert s["title"] == "t" and s["type"] == "object"


def test_stencil_avro_schema():
    s = build_avro_schema(RECORD)
    assert s == {
        "type": "record",
        "namespace": "bigquery",
        "name": "t",
        "fields": [
            {"name": "c1", "type": ["int", "null"]},
            {"name": "c2", "type": ["string"]},
        ],
    }


def test_kafka_rows_key_path(spark):
    from meteor_spark.sources.base import assets_df

    df = assets_df(spark, [RECORD | {"lineage": None, "ownership": None, "properties": None, "schema": None}])
    out = kafka_rows(df, "resource.urn", value_format="json").collect()
    assert out[0]["key"] == "bigquery::p/d/t"
    assert json.loads(out[0]["value"])["resource"]["name"] == "t"
    # no key path -> null key (balancer distributes)
    out2 = kafka_rows(df, value_format="json").collect()
    assert out2[0]["key"] is None
