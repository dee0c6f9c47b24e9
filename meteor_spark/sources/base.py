"""Shared helpers for sources that build asset DataFrames."""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

from meteor_spark.model.schema import ASSET_SCHEMA, empty_asset


def assets_df(spark: SparkSession, rows: list[dict[str, Any]]) -> DataFrame:
    """Build an asset DataFrame from plain dicts, filling absent fields.

    Sources constructing small asset sets driver-side (catalog walks, API
    scans) go through here; the result always conforms to ASSET_SCHEMA so
    every downstream processor/sink sees one contract.
    """
    full = []
    for r in rows:
        base = empty_asset()
        base.update(r)
        full.append(base)
    return spark.createDataFrame(full, schema=ASSET_SCHEMA)


def column_dict(
    name: str,
    data_type: str | None = None,
    description: str | None = None,
    is_nullable: bool | None = None,
    length: int | None = None,
    profile: dict | None = None,
    properties: str | None = None,
) -> dict:
    return {
        "name": name,
        "description": description,
        "data_type": data_type,
        "is_nullable": is_nullable,
        "length": length,
        "profile": profile,
        "properties": properties,
    }
