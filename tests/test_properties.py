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


# -- round-4 pure-Python kernels -------------------------------------------


def _decode_varint(b: bytes, i: int = 0) -> tuple[int, int]:
    n = shift = 0
    while True:
        n |= (b[i] & 0x7F) << shift
        shift += 7
        i += 1
        if not b[i - 1] & 0x80:
            return n, i


@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
@settings(max_examples=300, deadline=None)
def test_varint_round_trips_int64(n):
    from meteor_spark.functions.protowire import varint

    got, used = _decode_varint(varint(n))
    assert used == len(varint(n))
    # negatives encode as two's complement (the protobuf int64 rule)
    assert got == (n if n >= 0 else n + (1 << 64))


@given(
    st.datetimes(
        min_value=__import__("datetime").datetime(1900, 1, 1),
        max_value=__import__("datetime").datetime(2200, 1, 1),
    )
)
@settings(max_examples=200, deadline=None)
def test_enc_timestamp_fields_reconstruct_exact_micros(dt):
    from datetime import datetime, timezone

    from meteor_spark.functions.protowire import enc_timestamp

    b = enc_timestamp(dt)
    seconds = nanos = 0
    i = 0
    while i < len(b):
        tag, i = _decode_varint(b, i)
        val, i = _decode_varint(b, i)
        if tag >> 3 == 1:
            seconds = val - (1 << 64) if val >= 1 << 63 else val
        elif tag >> 3 == 2:
            nanos = val
    assert 0 <= nanos < 1_000_000_000
    assert nanos % 1000 == 0  # datetime carries micros, never sub-micro
    want = dt.replace(tzinfo=timezone.utc) - datetime(1970, 1, 1, tzinfo=timezone.utc)
    total_us = (want.days * 86_400 + want.seconds) * 1_000_000 + want.microseconds
    assert seconds * 1_000_000 + nanos // 1000 == total_us


@given(st.binary(max_size=600))
@settings(max_examples=150, deadline=None)
def test_cdc_boundaries_tile_the_payload(data):
    from meteor_spark.operators.multimodal import _gear_table, cdc_boundaries

    min_size, max_size = 16, 256
    chunks = cdc_boundaries(data, _gear_table(), min_size, 6, max_size)
    # chunks partition [0, len) contiguously
    pos = 0
    for off, ln in chunks:
        assert off == pos and ln >= 1
        pos += ln
    assert pos == len(data)
    # every chunk except the tail respects [min_size, max_size]
    for off, ln in chunks[:-1]:
        assert min_size <= ln <= max_size
    if chunks:
        assert chunks[-1][1] <= max_size


@given(
    st.lists(st.sampled_from("ab c".split() + ["ab", "a", "b", "c"]), min_size=0, max_size=12),
    st.sampled_from([("a", "b"), ("a", "a"), ("ab", "c")]),
)
@settings(max_examples=200, deadline=None)
def test_bpe_merge_preserves_concatenation(toks, pair):
    from meteor_spark.operators.bpe import _merge_word

    a, b = pair
    out = _merge_word(tuple(toks), a, b)
    assert "".join(out) == "".join(toks)
    assert len(out) <= len(toks)
    # greedy left-to-right: a merged token never sits immediately before
    # an identical merge opportunity it should have consumed
    for i in range(len(out) - 1):
        if out[i] == a and out[i + 1] == b:
            # allowed only when the a came from an overlap skip (a == b
            # run of odd length) — re-merging must then make progress
            assert a == b or _merge_word(out, a, b) != out


def _py_ppm(expr_builder, x, n):
    """Evaluate ppm_expr's expansion with Python ints standing in for
    int64 (asserting no intermediate leaves the int64 range)."""
    q, r = divmod(x, n)
    terms = [q * 1_000_000, (r * 1000 // n) * 1000, ((r * 1000) % n) * 1000 // n]
    for t in (q * 1_000_000, r * 1000, ((r * 1000) % n) * 1000):
        assert -(2**63) <= t < 2**63, "intermediate leaves int64"
    return sum(terms)


@given(st.integers(min_value=1, max_value=9_200_000_000_000_000), st.data())
@settings(max_examples=300, deadline=None)
def test_ppm_expr_identity_and_int64_bounds(n, data):
    # quotient bound: ratio metrics bound x/n by construction (padding
    # per doc <= bucket_cap, subwords per word <= word length)
    x = data.draw(st.integers(min_value=0, max_value=min(n * (2**20), 2**63 - 1)))
    from meteor_spark.functions.exactmath import ppm_expr

    assert _py_ppm(ppm_expr, x, n) == (x * 1_000_000) // n
    # and the generated SQL references each operand verbatim
    s = ppm_expr("x_col", "n_col", "div")
    assert "x_col" in s and "n_col" in s and " div " in s


def test_fixed_div_expr_matches_exact_rational():
    # property: fixed_div_expr == floor(x * 10^digits / n) for values
    # where the naive product would overflow int64, on BOTH engines
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from meteor_spark.functions.exactmath import fixed_div_expr

    @settings(max_examples=200, deadline=None)
    @given(
        x=st.integers(min_value=0, max_value=9_000_000_000_000_000_000 // 10),
        n=st.integers(min_value=1, max_value=9_000_000_000_000_000_000 // 10),
        digits=st.integers(min_value=1, max_value=6),
    )
    def check(x, n, digits):
        want = (x * 10**digits) // n
        if want >= 2**63:  # quotient itself must fit int64
            return
        got = duckdb.sql(
            "SELECT "
            + fixed_div_expr(
                f"CAST({x} AS BIGINT)", f"CAST({n} AS BIGINT)", digits, "//"
            )
        ).fetchone()[0]
        assert got == want, (x, n, digits)

    check()


def test_fixed_div_expr_spark_duckdb_agree(spark):
    import duckdb

    from meteor_spark.functions.exactmath import fixed_div_expr

    cases = [
        (1_300_000_000_000_000_0, 9_200_000_000_000_000, 4),
        (7, 3, 6),
        (0, 5, 4),
        (8_999_999_999_999_999_99, 9_000_000_000_000_000_00, 4),
    ]
    for x, n, d in cases:
        s = spark.sql(
            f"SELECT {fixed_div_expr(f'CAST({x} AS BIGINT)', f'CAST({n} AS BIGINT)', d, 'div')} AS q"
        ).collect()[0]["q"]
        k = duckdb.sql(
            f"SELECT {fixed_div_expr(f'CAST({x} AS BIGINT)', f'CAST({n} AS BIGINT)', d, '//')}"
        ).fetchone()[0]
        assert s == k == (x * 10**d) // n, (x, n, d)


def test_ks_drift_matches_python_reference(spark):
    # property: ks_ppm == floor(D * 1e6) for the exact two-sample KS
    # computed by a python reference on the same integers
    import random

    from meteor_spark.operators.drift import ks_drift

    rng = random.Random(11)
    rows = []
    for _ in range(300):
        rows.append(
            ("k", float(rng.choice([1, 2, 3, 5, 8]) + rng.randint(0, 3)), rng.randint(0, 99))
        )
    df = spark.createDataFrame(rows, "k string, value double, t long")
    got = ks_drift(df, "k", "value", "t").collect()[0]

    mid = (0 + 99) // 2  # min/max of t in the fixture span the full range
    ts = sorted({t for _, _, t in rows})
    mid = (min(ts) + max(ts)) // 2
    early = sorted(v for _, v, t in rows if t <= mid)
    late = sorted(v for _, v, t in rows if t > mid)
    n1, n2 = len(early), len(late)
    values = sorted(set(early) | set(late))
    best = 0
    for v in values:
        c1 = sum(1 for x in early if x <= v)
        c2 = sum(1 for x in late if x <= v)
        best = max(best, abs(c1 * n2 - c2 * n1))
    assert got["n_early"] == n1 and got["n_late"] == n2
    assert got["ks_ppm"] == (best * 10**6) // (n1 * n2)
