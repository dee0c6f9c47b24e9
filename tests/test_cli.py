"""CLI surface: lint, list, info, new (run covered by e2e pipeline test)."""

from __future__ import annotations

from meteor_spark.cli import main

RECIPE = """
name: ok
version: v1beta1
source:
  name: csv
  config:
    path: /tmp/x.csv
sinks:
  - name: console
"""


def test_lint_ok(tmp_path, capsys):
    p = tmp_path / "r.yaml"
    p.write_text(RECIPE)
    assert main(["lint", str(p)]) == 0
    assert "ok: OK" in capsys.readouterr().out


def test_lint_bad_plugin(tmp_path, capsys):
    p = tmp_path / "r.yaml"
    p.write_text(RECIPE.replace("name: csv", "name: nope"))
    assert main(["lint", str(p)]) == 1
    out = capsys.readouterr().out
    assert "could not find extractor" in out


def test_lint_missing_config(tmp_path, capsys):
    p = tmp_path / "r.yaml"
    p.write_text(RECIPE.replace("  config:\n    path: /tmp/x.csv\n", ""))
    assert main(["lint", str(p)]) == 1
    assert "required" in capsys.readouterr().out


def test_list_extractors(capsys):
    assert main(["list", "extractors"]) == 0
    out = capsys.readouterr().out
    for name in ("csv", "mysql", "postgres", "kafka", "bigquery", "parquet_catalog"):
        assert name in out


def test_info(capsys):
    assert main(["info", "extractor", "csv"]) == 0
    assert "csv" in capsys.readouterr().out
    assert main(["info", "extractor", "nope"]) == 1


def test_new_recipe_is_parseable(capsys):
    assert main(["new", "recipe", "gen", "-s", "csv", "-p", "enrich", "-k", "console", "file"]) == 0
    text = capsys.readouterr().out
    from meteor_spark.recipe.loader import parse_recipe

    r = parse_recipe(text, default_name="gen")
    assert r.source.name == "csv"
    assert [s.name for s in r.sinks] == ["console", "file"]
    assert [p.name for p in r.processors] == ["enrich"]


def test_lint_reports_yaml_lines(tmp_path, capsys):
    """Errors point at the offending entry's YAML line (reference keeps
    yaml.Node positions through decode — recipe/node.go:10-24,
    cmd/lint.go:144-177)."""
    p = tmp_path / "r.yaml"
    # line numbers are 1-based over the file as written:
    #  1: name: located
    #  2: version: v1beta1
    #  3: source:          <- bad extractor name
    #  6: sinks:
    #  7:   - name: console (ok)
    #  8:   - name: nosink  <- bad sink name
    p.write_text(
        "name: located\n"
        "version: v1beta1\n"
        "source:\n"
        "  name: not_an_extractor\n"
        "  config: {}\n"
        "sinks:\n"
        "  - name: console\n"
        "  - name: nosink\n"
    )
    assert main(["lint", str(p)]) == 1
    out = capsys.readouterr().out
    assert "source (line 3):" in out
    assert "sinks[1] (line 8):" in out


def test_parse_errors_carry_lines(tmp_path):
    from meteor_spark.recipe.loader import RecipeError, parse_recipe

    try:
        parse_recipe("name: x\nversion: v0\nsource:\n  name: csv\nsinks:\n  - name: console\n", default_name="x")
        raise AssertionError("expected RecipeError")
    except RecipeError as e:
        assert e.line == 2
        assert "(line 2)" in str(e)

    try:
        parse_recipe(
            "name: x\nversion: v1beta1\nsource:\n  name: csv\nsinks:\n  - config: {}\n",
            default_name="x",
        )
        raise AssertionError("expected RecipeError")
    except RecipeError as e:
        assert e.line == 6


_GEN_TEMPLATE = """\
name: {{ .Data.name }}
version: v1beta1
source:
  type: kafka
  config:
    broker: "{{ .Data.broker }}"
sinks:
  - name: console
"""


def test_gen_renders_recipe_per_data_entry(tmp_path, capsys):
    """Mirror of recipe/generator_test.go: one rendered recipe per data
    entry; Data.name defaults to FileName when absent."""
    tpl = tmp_path / "template.yaml"
    tpl.write_text(_GEN_TEMPLATE)
    data = tmp_path / "data.yaml"
    data.write_text(
        "- FileName: recipe-one\n"
        "  Data:\n"
        "    name: recipe-1\n"
        "    broker: main-broker.com:9092\n"
        "- FileName: recipe-two\n"
        "  Data:\n"
        "    broker: secondary-broker.com:9092\n"
    )
    out = tmp_path / "out"
    assert main(["gen", str(tpl), "-o", str(out), "-d", str(data)]) == 0
    one = (out / "recipe-one.yaml").read_text()
    assert "name: recipe-1" in one and 'broker: "main-broker.com:9092"' in one
    # no explicit name -> FileName (generator.go:50-52)
    two = (out / "recipe-two.yaml").read_text()
    assert "name: recipe-two" in two
    # generated recipes must themselves parse and lint clean
    assert main(["lint", str(out)]) == 0


def test_version(capsys):
    assert main(["version"]) == 0
    assert "meteor-spark" in capsys.readouterr().out
