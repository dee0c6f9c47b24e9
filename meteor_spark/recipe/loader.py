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

_TEMPLATE_RE = re.compile(r"\{\{\s*\.?([A-Za-z_][A-Za-z0-9_]*)\s*\}\}")


class RecipeError(ValueError):
    pass


@dataclass
class PluginRecipe:
    name: str
    config: dict[str, Any] = field(default_factory=dict)
    scope: str | None = None


@dataclass
class Recipe:
    name: str
    version: str
    source: PluginRecipe
    sinks: list[PluginRecipe] = field(default_factory=list)
    processors: list[PluginRecipe] = field(default_factory=list)


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
    """Interpolate {{ var }} / {{ .var }} placeholders (reference:
    reader.go:57-63 runs Go text/template before YAML parse). Unknown
    variables render as empty string, matching text/template's default."""

    def sub(m: re.Match) -> str:
        return str(variables.get(m.group(1), ""))

    return _TEMPLATE_RE.sub(sub, text)


def _parse_plugin(node: Any, *, allow_type_alias: bool = False) -> PluginRecipe:
    if not isinstance(node, dict):
        raise RecipeError(f"plugin entry must be a mapping, got {type(node).__name__}")
    name = node.get("name")
    if not name and allow_type_alias:
        name = node.get("type")  # legacy alias (reference: recipe/node.go:42-77)
    if not name:
        raise RecipeError("plugin entry missing 'name'")
    return PluginRecipe(name=str(name), config=dict(node.get("config") or {}), scope=node.get("scope"))


def parse_recipe(text: str, *, default_name: str, variables: dict[str, Any] | None = None) -> Recipe:
    rendered = render_template(text, variables or {})
    data = yaml.safe_load(rendered)
    if not isinstance(data, dict):
        raise RecipeError("recipe must be a YAML mapping")
    version = data.get("version")
    if version != LATEST_VERSION:
        raise RecipeError(
            f"recipe version {version!r} is not supported; latest version is {LATEST_VERSION!r}"
        )
    if "source" not in data:
        raise RecipeError("recipe missing 'source'")
    source = _parse_plugin(data["source"], allow_type_alias=True)
    sinks = [_parse_plugin(s) for s in data.get("sinks") or []]
    processors = [_parse_plugin(p) for p in data.get("processors") or []]
    if not sinks:
        raise RecipeError("recipe must declare at least one sink")
    return Recipe(
        name=str(data.get("name") or default_name),
        version=version,
        source=source,
        sinks=sinks,
        processors=processors,
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
        except (RecipeError, yaml.YAMLError) as e:
            log.warning("skipping %s: %s", child, e)
    return recipes
