"""CLI: run, lint, list, info, new — the reference's command surface
(cmd/run.go:26, cmd/lint.go:23, cmd/list.go:20, cmd/info.go:18,
cmd/new.go:18, SURVEY.md §2.2).

    python -m meteor_spark.cli run recipe.yaml [--var vars.yaml]
    python -m meteor_spark.cli lint recipe.yaml
    python -m meteor_spark.cli list extractors|processors|sinks
    python -m meteor_spark.cli info extractor csv
    python -m meteor_spark.cli new recipe my-recipe -s csv -p enrich -k console
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path


def _registries():
    import meteor_spark.processors  # noqa: F401
    import meteor_spark.sinks  # noqa: F401
    import meteor_spark.sources  # noqa: F401
    from meteor_spark import registry

    return {"extractors": registry.extractors, "processors": registry.processors, "sinks": registry.sinks}


def cmd_run(args) -> int:
    from meteor_spark.recipe import load_recipes
    from meteor_spark.recipe.loader import load_var_file
    from meteor_spark.runner import Agent
    from meteor_spark.session import get_spark

    _registries()
    variables = load_var_file(args.var)
    recipes = load_recipes(args.path, variables)
    if not recipes:
        print("no recipes found", file=sys.stderr)
        return 1
    agent = Agent(
        get_spark("meteor-run"),
        stop_on_sink_error=os.environ.get("STOP_ON_SINK_ERROR", "").lower() == "true",
    )
    # SIGINT/SIGTERM -> cancel in-flight jobs (reference: cmd/run.go:81-82)
    import signal

    for sig in (signal.SIGINT, signal.SIGTERM):
        signal.signal(sig, lambda *_: agent.cancel())
    runs = agent.run_multiple(recipes)
    # reference renders a per-recipe result table (cmd/run.go:94-128)
    width = max(len(r.recipe.name) for r in runs)
    failed = 0
    for r in runs:
        status = "OK" if r.success else "FAIL"
        print(f"{r.recipe.name:<{width}}  {status:<4} records={r.record_count:<8} {r.duration_ms}ms {r.error or ''}")
        failed += 0 if r.success else 1
    return 1 if failed else 0


def cmd_lint(args) -> int:
    from meteor_spark.recipe import RecipeError, load_recipes
    from meteor_spark.recipe.loader import load_var_file
    from meteor_spark.runner import Agent

    _registries()
    try:
        recipes = load_recipes(args.path, load_var_file(args.var))
    except RecipeError as e:
        print(f"parse error: {e}", file=sys.stderr)
        return 1
    agent = Agent(spark=None)
    bad = 0
    for r in recipes:
        errors = agent.validate_located(r)
        if errors:
            bad += 1
            print(f"{r.name}: {len(errors)} error(s)")
            for plug, e in errors:
                where = f"{plug.key} (line {plug.line}): " if plug.key and plug.line else ""
                print(f"  - {where}{e}")
        else:
            print(f"{r.name}: OK")
    return 1 if bad else 0


def cmd_list(args) -> int:
    regs = _registries()
    reg = regs.get(args.kind)
    if reg is None:
        print(f"unknown kind {args.kind!r}; choose from {sorted(regs)}", file=sys.stderr)
        return 1
    for info in reg.list():
        print(f"{info.name:<18} {info.description}")
    return 0


def cmd_info(args) -> int:
    regs = _registries()
    reg = regs.get(args.kind + "s")
    if reg is None:
        print(f"unknown kind {args.kind!r}", file=sys.stderr)
        return 1
    try:
        info = reg.info(args.name)
    except KeyError as e:
        print(str(e), file=sys.stderr)
        return 1
    print(f"name: {info.name}\ndescription: {info.description}")
    if info.sample_config:
        print(f"sample config:\n{info.sample_config}")
    return 0


def cmd_new(args) -> int:
    # reference: generator/recipe.go:32-74 — render a sample recipe
    regs = _registries()
    lines = [f"name: {args.name}", "version: v1beta1", "source:", f"  name: {args.source}", "  config:"]
    sample = regs["extractors"].info(args.source).sample_config if regs["extractors"].has(args.source) else ""
    lines += [f"    {line}" for line in (sample.splitlines() or ["{}"])]
    if args.processors:
        lines.append("processors:")
        lines += [f"  - name: {p}" for p in args.processors]
    lines.append("sinks:")
    lines += [f"  - name: {s}" for s in args.sinks]
    print("\n".join(lines))
    return 0


def cmd_gen(args) -> int:
    # reference: cmd/gen.go:15-60 + recipe/generator.go:22-58 — render a
    # recipe per data entry from a template into the output directory
    import yaml

    from meteor_spark.recipe.loader import RecipeError, generate_from_template

    try:
        data = yaml.safe_load(Path(args.data).read_text()) or []
        if not isinstance(data, list):
            print("gen data file must contain a list", file=sys.stderr)
            return 1
        written = generate_from_template(args.template, data, args.output)
    except (OSError, RecipeError, yaml.YAMLError) as e:
        print(f"gen error: {e}", file=sys.stderr)
        return 1
    for p in written:
        print(p)
    return 0


VERSION = "0.3.0"


def cmd_version(args) -> int:
    # reference: cmd/version.go:21-40
    print(f"meteor-spark {VERSION} (pyspark)")
    return 0


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="meteor-spark")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("run", help="run recipes from a file or directory")
    p.add_argument("path")
    p.add_argument("--var", default=None, help="YAML file of template variables")
    p.set_defaults(fn=cmd_run)

    p = sub.add_parser("lint", help="validate recipes without running")
    p.add_argument("path")
    p.add_argument("--var", default=None)
    p.set_defaults(fn=cmd_lint)

    p = sub.add_parser("list", help="list plugins")
    p.add_argument("kind", choices=["extractors", "processors", "sinks"])
    p.set_defaults(fn=cmd_list)

    p = sub.add_parser("info", help="show plugin info")
    p.add_argument("kind", choices=["extractor", "processor", "sink"])
    p.add_argument("name")
    p.set_defaults(fn=cmd_info)

    p = sub.add_parser("new", help="generate a sample recipe")
    p.add_argument("what", choices=["recipe"])
    p.add_argument("name")
    p.add_argument("-s", "--source", required=True)
    p.add_argument("-p", "--processors", nargs="*", default=[])
    p.add_argument("-k", "--sinks", nargs="*", default=["console"])
    p.set_defaults(fn=cmd_new)

    p = sub.add_parser("gen", help="generate recipes from a template + data list")
    p.add_argument("template")
    p.add_argument("-o", "--output", required=True, help="output directory")
    p.add_argument("-d", "--data", required=True, help="YAML list of {FileName, Data}")
    p.set_defaults(fn=cmd_gen)

    p = sub.add_parser("version", aliases=["v"], help="print version information")
    p.set_defaults(fn=cmd_version)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
