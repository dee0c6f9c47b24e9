"""Property-based tests (hypothesis) for the pure-Python kernels —
robustness beyond the reference's golden-only strategy (SURVEY.md §5)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from meteor_spark.functions.sqlparser import (
    normalize_query,
    parse_filter_conditions,
    parse_join_conditions,
)
from meteor_spark.functions.tables import extract_table_names, substitute_template_tags
from meteor_spark.model.urn import table_urn
from meteor_spark.plugins_base import Field, InvalidConfigError, build_config

_RESERVED = {
    "select", "from", "join", "on", "where", "having", "group", "order",
    "limit", "union", "and", "or", "in", "is", "like", "between", "as",
    "by", "window", "lateral", "unnest", "values", "dual",
}
ident = st.from_regex(r"[A-Za-z_][A-Za-z0-9_]{0,10}", fullmatch=True).filter(
    lambda s: s.lower() not in _RESERVED
)


@given(st.text(max_size=200))
@settings(max_examples=200, deadline=None)
def test_normalize_never_raises_and_is_idempotent(q):
    n = normalize_query(q)
    assert normalize_query(n) == n
    assert "\n" not in n and "  " not in n


@given(ident, ident, ident, ident)
def test_join_condition_extraction(a, b, c, d):
    q = f"SELECT * FROM {a} JOIN {b} ON {a}.{c} = {b}.{d}"
    conds = parse_join_conditions(q)
    assert conds == [f"{a}.{c} = {b}.{d}"]


@given(ident, ident, st.integers(min_value=0, max_value=10**6))
def test_filter_condition_extraction(t, col, v):
    q = f"SELECT * FROM {t} WHERE {t}.{col} > {v} ORDER BY 1"
    conds = parse_filter_conditions(q)
    assert conds == [f"{t}.{col} > {v}"]


@given(st.lists(ident, min_size=1, max_size=5, unique=True))
def test_table_extraction_finds_all_joined(tables):
    q = "SELECT * FROM " + tables[0] + "".join(f" JOIN {t} ON 1=1" for t in tables[1:])
    assert sorted(extract_table_names(q)) == sorted(tables)


@given(ident, st.dictionaries(ident, ident, max_size=3))
def test_template_substitution_removes_all_tags(var, defaults):
    q = f"SELECT * FROM t WHERE {{{{{var}}}}}"
    out = substitute_template_tags(q, defaults)
    assert "{{" not in out
    if var in defaults:
        assert defaults[var] in out


@given(ident, ident, ident, ident)
def test_table_urn_shape(service, host, db, name):
    urn = table_urn(service, host, db, name)
    assert urn == f"{service}::{host}/{db}/{name}"
    assert urn.split("::")[0] == service


@given(st.dictionaries(st.sampled_from(["a", "b", "c"]), st.text(max_size=5)))
def test_build_config_unknown_keys_preserved(raw):
    spec = {"x": Field(default="d")}
    out = build_config(dict(raw), spec)
    assert out["x"] == "d"
    for k, v in raw.items():
        assert out[k] == v


@given(st.one_of(st.none(), st.sampled_from(["json", "yaml", "xml"])))
def test_build_config_oneof(value):
    spec = {"fmt": Field(default="json", oneof=("json", "yaml"))}
    raw = {} if value is None else {"fmt": value}
    if value == "xml":
        try:
            build_config(raw, spec)
            raise AssertionError("expected InvalidConfigError")
        except InvalidConfigError:
            pass
    else:
        assert build_config(raw, spec)["fmt"] == (value or "json")
