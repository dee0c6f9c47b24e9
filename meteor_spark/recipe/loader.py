"""Recipe loading: template interpolation -> YAML -> typed Recipe.

Mirrors the reference's reader semantics (reference: recipe/reader.go):
  - path may be a file or a directory; for a directory every file is
    parsed and unparseable files are skipped with a warning
    (reader.go:35-54,94-112).
  - the recipe text is template-interpolated against a variable map
    BEFORE YAML parsing (reader.go:57-63). Variables come from
    METEOR_-prefixed env vars (stripped + lowercased, envs.go:12,37-69)
    merged with an optional --var YAML file, file winning (envs.go:26-33).
  - a missing `name:` defaults to the filename stem (reader.go:74-78).
  - `version` must equal the latest version or the recipe is rejected
    (reader.go:80-84,114-119; latest = v1beta1, generator/recipe.go:29).
  - `source.type` is accepted as an alias of `source.name`
    (node.go:42-77).
"""

from __future__ import annotations

import logging
import os
import re
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any

import yaml

log = logging.getLogger(__name__)

LATEST_VERSION = "v1beta1"
ENV_PREFIX = "METEOR_"

_TEMPLATE_RE = re.compile(r"\{\{\s*\.?([A-Za-z_][A-Za-z0-9_]*(?:\.[A-Za-z_][A-Za-z0-9_]*)*)\s*\}\}")


class RecipeError(ValueError):
    """Parse/validation failure; carries the 1-based YAML line when the
    offending node is known (reference keeps the yaml.Node per field —
    recipe/node.go:10-24 — so lint can point at the typo's line)."""

    def __init__(self, message: str, line: int | None = None):
        super().__init__(f"{message} (line {line})" if line else message)
        self.line = line


@dataclass
class PluginRecipe:
    name: str
    config: dict[str, Any] = field(default_factory=dict)
    scope: str | None = None
    # YAML location of this entry: its path key ("source", "sinks[2]")
    # and 1-based line in the recipe file. None for recipes built in code.
    key: str | None = None
    line: int | None = None


@dataclass
class Recipe:
    name: str
    version: str
    source: PluginRecipe
    sinks: list[PluginRecipe] = field(default_factory=list)
    processors: list[PluginRecipe] = field(default_factory=list)
    # path -> 1-based line for every YAML node ("version", "sinks[0].name")
    lines: dict[str, int] = field(default_factory=dict)


def yaml_line_index(text: str) -> dict[str, int]:
    """path -> 1-based line for every key/element in the YAML document,
    via the composer's node marks ("version" -> 2, "sinks[0].name" -> 7).
    The PyYAML twin of the reference keeping yaml.Node positions through
    decode (recipe/node.go:10-24)."""
    try:
        root = yaml.compose(text)
    except yaml.YAMLError:
        return {}
    idx: dict[str, int] = {}

    def walk(node: yaml.Node, path: str) -> None:
        if isinstance(node, yaml.MappingNode):
            for k, v in node.value:
                p = f"{path}.{k.value}" if path else str(k.value)
                idx[p] = k.start_mark.line + 1
                walk(v, p)
        elif isinstance(node, yaml.SequenceNode):
            for i, item in enumerate(node.value):
                p = f"{path}[{i}]"
                idx[p] = item.start_mark.line + 1
                walk(item, p)

    if root is not None:
        walk(root, "")
    return idx


def vars_from_env(environ: dict[str, str] | None = None) -> dict[str, str]:
    """METEOR_FOO_BAR=x -> {"foo_bar": "x"} (reference: recipe/envs.go:37-69)."""
    environ = dict(os.environ) if environ is None else environ
    return {k[len(ENV_PREFIX):].lower(): v for k, v in environ.items() if k.startswith(ENV_PREFIX)}


def load_var_file(path: str | Path | None) -> dict[str, Any]:
    if not path:
        return {}
    data = yaml.safe_load(Path(path).read_text()) or {}
    if not isinstance(data, dict):
        raise RecipeError(f"var file {path} must contain a mapping")
    return data


def render_template(text: str, variables: dict[str, Any]) -> str:
    """Interpolate {{ var }} / {{ .var }} / {{ .Data.field }} placeholders
    (reference: reader.go:57-63 runs Go text/template before YAML parse;
    generator templates address nested fields, recipe/generator.go:42-58).
    Unknown variables render as empty string, matching text/template's
    default for missing map keys."""

    def sub(m: re.Match) -> str:
        cur: Any = variables
        for part in m.group(1).split("."):
            if not isinstance(cur, dict) or part not in cur:
                return ""
            cur = cur[part]
        return str(cur)

    return _TEMPLATE_RE.sub(sub, text)


def generate_from_template(
    template_path: str | Path, data: list[dict[str, Any]], output_dir: str | Path
) -> list[Path]:
    """The `gen` command's engine (reference: recipe/generator.go:22-58):
    render one recipe per data entry — context is {FileName, Data}, so
    templates address {{ .FileName }} and {{ .Data.field }} — into
    <output_dir>/<FileName>.yaml. Data.name defaults to FileName."""
    text = Path(template_path).read_text()
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    written: list[Path] = []
    for entry in data:
        if not isinstance(entry, dict) or not entry.get("FileName"):
            raise RecipeError("gen data entry must be a mapping with 'FileName'")
        d = dict(entry.get("Data") or {})
        d.setdefault("name", entry["FileName"])
        target = out / f"{entry['FileName']}.yaml"
        target.write_text(render_template(text, {"FileName": entry["FileName"], "Data": d}))
        written.append(target)
    return written


def _parse_plugin(
    node: Any,
    *,
    key: str | None = None,
    lines: dict[str, int] | None = None,
    allow_type_alias: bool = False,
) -> PluginRecipe:
    lines = lines or {}
    line = lines.get(key) if key else None
    if not isinstance(node, dict):
        raise RecipeError(f"plugin entry must be a mapping, got {type(node).__name__}", line)
    name = node.get("name")
    if not name and allow_type_alias:
        name = node.get("type")  # legacy alias (reference: recipe/node.go:42-77)
    if not name:
        raise RecipeError(f"plugin entry {key or ''} missing 'name'".replace("  ", " "), line)
    return PluginRecipe(
        name=str(name),
        config=dict(node.get("config") or {}),
        scope=node.get("scope"),
        key=key,
        line=line,
    )


def parse_recipe(text: str, *, default_name: str, variables: dict[str, Any] | None = None) -> Recipe:
    rendered = render_template(text, variables or {})
    data = yaml.safe_load(rendered)
    if not isinstance(data, dict):
        raise RecipeError("recipe must be a YAML mapping")
    lines = yaml_line_index(rendered)
    version = data.get("version")
    if version != LATEST_VERSION:
        raise RecipeError(
            f"recipe version {version!r} is not supported; latest version is {LATEST_VERSION!r}",
            lines.get("version", 1),
        )
    if "source" not in data:
        raise RecipeError("recipe missing 'source'", 1)
    source = _parse_plugin(data["source"], key="source", lines=lines, allow_type_alias=True)
    sinks = [
        _parse_plugin(s, key=f"sinks[{i}]", lines=lines)
        for i, s in enumerate(data.get("sinks") or [])
    ]
    processors = [
        _parse_plugin(p, key=f"processors[{i}]", lines=lines)
        for i, p in enumerate(data.get("processors") or [])
    ]
    if not sinks:
        raise RecipeError("recipe must declare at least one sink", 1)
    return Recipe(
        name=str(data.get("name") or default_name),
        version=version,
        source=source,
        sinks=sinks,
        processors=processors,
        lines=lines,
    )


def load_recipe(path: str | Path, variables: dict[str, Any] | None = None) -> Recipe:
    p = Path(path)
    merged = {**vars_from_env(), **(variables or {})}
    return parse_recipe(p.read_text(), default_name=p.stem, variables=merged)


def load_recipes(path: str | Path, variables: dict[str, Any] | None = None) -> list[Recipe]:
    """File -> [recipe]; directory -> recipe per parseable file, bad files
    skipped with a warning (reference: recipe/reader.go:94-112)."""
    p = Path(path)
    if p.is_file():
        return [load_recipe(p, variables)]
    recipes = []
    for child in sorted(p.iterdir()):
        if not child.is_file():
            continue
        try:
            recipes.append(load_recipe(child, variables))
        except (RecipeError, yaml.YAMLError, OSError, UnicodeDecodeError) as e:
            # OSError/UnicodeDecodeError: a stray unreadable or binary
            # file (editor swap, .DS_Store) must skip-with-warning like
            # any other bad file, not abort the whole directory load
            log.warning("skipping %s: %s", child, e)
    return recipes
