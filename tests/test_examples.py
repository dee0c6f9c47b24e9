"""Keep examples/ recipes valid: lint them all, run the catalog one e2e.

The examples are user-facing documentation of the recipe language
(reference: recipe/reader.go, cmd/run.go); this test pins them to the
actual plugin config schemas so a config rename can't silently break
the docs.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import pytest

from meteor_spark.cli import main

EXAMPLES = Path(__file__).resolve().parent.parent / "examples"
SF_DIR = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")


def test_examples_dir_lints_clean(tmp_path, capsys, monkeypatch):
    # every templated var must resolve for lint to see real configs
    monkeypatch.setenv("METEOR_DATA_DIR", SF_DIR)
    monkeypatch.setenv("METEOR_OUT_DIR", str(tmp_path))
    monkeypatch.setenv("METEOR_CSV_PATH", str(tmp_path / "x.csv"))
    assert main(["lint", str(EXAMPLES)]) == 0
    out = capsys.readouterr().out
    assert "catalog_to_file: OK" in out
    assert "csv_console: OK" in out


@pytest.mark.skipif(not Path(SF_DIR).exists(), reason="no test data")
def test_catalog_example_runs_end_to_end(tmp_path, capsys, monkeypatch):
    monkeypatch.setenv("METEOR_DATA_DIR", SF_DIR)
    monkeypatch.setenv("METEOR_OUT_DIR", str(tmp_path))
    assert main(["run", str(EXAMPLES / "catalog_to_file.yaml")]) == 0
    assert "OK" in capsys.readouterr().out

    records = [json.loads(line) for line in (tmp_path / "catalog.ndjson").read_text().splitlines()]
    assert len(records) == 10  # every sf0.001 table has rows
    by_name = {r["resource"]["name"]: r for r in records}
    assert "lineitem" in by_name and "documents" in by_name
    # enrich processor merged the recipe attributes into every record
    for r in records:
        attrs = json.loads(r["properties"]["attributes"])
        assert attrs["team"] == "data-platform"
        assert attrs["tier"] == "gold"


def test_lakehouse_example_runs_end_to_end(tmp_path, capsys, monkeypatch):
    # fabricate one delta table, then drive the example recipe over it
    from tests.test_lakehouse import _delta_table

    _delta_table(tmp_path, "sales")
    monkeypatch.setenv("METEOR_DATA_DIR", str(tmp_path))
    monkeypatch.setenv("METEOR_OUT_DIR", str(tmp_path))
    assert main(["run", str(EXAMPLES / "lakehouse_to_console.yaml")]) == 0
    out = capsys.readouterr().out
    assert "OK" in out and "sales" in out


def test_curate_example_runs_end_to_end(tmp_path, capsys, monkeypatch, spark):
    """Raw documents -> curate (quality/PII/dedup) -> chunk -> parquet:
    the recipe engine driving the training-data operators."""
    monkeypatch.setenv("METEOR_DATA_DIR", SF_DIR)
    monkeypatch.setenv("METEOR_OUT_DIR", str(tmp_path))
    assert main(["run", str(EXAMPLES / "curate_documents.yaml")]) == 0
    assert "OK" in capsys.readouterr().out

    out = spark.read.parquet(str(tmp_path / "curated_chunks"))
    assert set(out.columns) == {"doc_id", "chunk_start", "n_tokens", "chunk"}
    n = out.count()
    assert n > 0
    # curation can only remove chunks (the sf0.001 fixture happens to be
    # clean enough that nothing is cut; each individual cut is exercised
    # on synthetic data in test_runner.py::test_curate_processor_cuts)
    from meteor_spark.operators.text import chunk_documents

    raw = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    raw_chunks = chunk_documents(raw, chunk_size=64, overlap=16).count()
    assert n <= raw_chunks
    # scrub happened: no raw emails survive in any chunk
    from pyspark.sql import functions as F

    assert (
        out.filter(F.col("chunk").rlike(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")).count()
        == 0
    )


def test_pack_example_runs_end_to_end(tmp_path, capsys, monkeypatch, spark):
    """Raw documents -> curate -> next-fit pack -> parquet: the packing
    manifest recipe a trainer's loader would consume."""
    monkeypatch.setenv("METEOR_DATA_DIR", SF_DIR)
    monkeypatch.setenv("METEOR_OUT_DIR", str(tmp_path))
    assert main(["run", str(EXAMPLES / "pack_training_bins.yaml")]) == 0
    assert "OK" in capsys.readouterr().out

    out = spark.read.parquet(str(tmp_path / "packed_bins"))
    rows = out.collect()
    assert rows and {"doc_id", "bin_id", "bin_offset", "n_tokens"} <= set(out.columns)
    # bins respect capacity for every doc that fits at all
    assert all(r.bin_offset + r.n_tokens <= 512 for r in rows if r.n_tokens <= 512)


def test_dependency_profile_example(capsys, monkeypatch, spark):
    from meteor_spark.cli import main

    monkeypatch.setenv("METEOR_TABLE_PATH", "/root/testdata/sf0.001/nation.parquet")
    monkeypatch.setenv("METEOR_COLUMNS", "n_nationkey,n_name,n_regionkey")
    rc = main(["run", str(EXAMPLES / "dependency_profile.yaml")])
    assert rc == 0
    out = capsys.readouterr().out
    # the key column determines everything; the group column does not
    assert '"det":"n_nationkey"' in out and '"holds":true' in out
    assert '"holds":false' in out
