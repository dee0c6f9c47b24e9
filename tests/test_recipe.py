"""Recipe loading: templating, vars, version gate, directory reads.

Mirrors reference recipe/reader_test.go cases (SURVEY.md §5 layer 1)."""

from __future__ import annotations

import pytest

from meteor_spark.recipe import RecipeError, load_recipe, load_recipes, vars_from_env
from meteor_spark.recipe.loader import parse_recipe, render_template

VALID = """
name: sample
version: v1beta1
source:
  name: csv
  config:
    path: {{ path }}
sinks:
  - name: console
"""


def test_parse_valid_with_template():
    r = parse_recipe(VALID, default_name="x", variables={"path": "/tmp/a.csv"})
    assert r.name == "sample"
    assert r.source.name == "csv"
    assert r.source.config["path"] == "/tmp/a.csv"
    assert [s.name for s in r.sinks] == ["console"]


def test_default_name_from_filename(tmp_path):
    # reference: reader.go:74-78
    p = tmp_path / "my-recipe.yaml"
    p.write_text(VALID.replace("name: sample\n", ""))
    r = load_recipe(p, {"path": "x"})
    assert r.name == "my-recipe"


def test_version_gate():
    # reference: reader.go:80-84 — only v1beta1 accepted
    with pytest.raises(RecipeError, match="version"):
        parse_recipe(VALID.replace("v1beta1", "v1"), default_name="x")
    with pytest.raises(RecipeError, match="version"):
        parse_recipe(VALID.replace("version: v1beta1\n", ""), default_name="x")


def test_source_type_alias():
    # reference: node.go:42-77 — source.type accepted as alias of name
    txt = VALID.replace("name: csv", "type: csv")
    r = parse_recipe(txt, default_name="x")
    assert r.source.name == "csv"


def test_sink_required():
    with pytest.raises(RecipeError, match="sink"):
        parse_recipe(VALID.replace("sinks:\n  - name: console\n", ""), default_name="x")


def test_env_vars():
    # reference: envs.go:37-69 — METEOR_ prefix stripped + lowercased
    assert vars_from_env({"METEOR_FOO_BAR": "1", "OTHER": "2"}) == {"foo_bar": "1"}


def test_template_go_style_dot():
    assert render_template("a: {{ .val }}", {"val": "x"}) == "a: x"
    assert render_template("a: {{ missing }}", {}) == "a: "


def test_directory_read_skips_bad(tmp_path):
    # reference: reader.go:94-112 — bad files skipped with warning
    (tmp_path / "good.yaml").write_text(VALID)
    (tmp_path / "bad.txt").write_text("not: [valid")
    (tmp_path / "wrong_version.yaml").write_text(VALID.replace("v1beta1", "v9"))
    # a stray binary file (editor swap, .DS_Store) must also skip, not
    # abort the whole directory load with UnicodeDecodeError
    (tmp_path / ".binary.swp").write_bytes(b"\x80\x81\xfe\xff\x00")
    rs = load_recipes(tmp_path, {"path": "x"})
    assert [r.name for r in rs] == ["sample"]
