"""The bench stdout line is the driver's ONLY timing channel — a
malformed or overlong line nulls the whole round's BENCH record, so the
compaction logic gets its own tests."""

from __future__ import annotations

import json

from bench import compact_line


def _fake(n):
    return {f"query_{i:03d}": round(0.1 * i, 3) for i in range(n)}


def test_line_is_valid_json_and_under_limit_even_with_many_queries():
    timings = _fake(300)
    headline = sorted(timings)
    out = compact_line(timings, headline, [], 123.4, 0.1)
    assert len(out) <= 1800
    d = json.loads(out)
    assert d["value"] == 123.4 and d["n_queries"] == 300
    # degraded by dropping entries, NOT by blanking: a meaningful prefix
    # of the headline survives
    assert len(d["queries"]) > 20
    assert "query_000" in d["queries"]


def test_failed_names_listed_not_negative_timings():
    timings = {"a": 1.0, "b": -1.0}
    out = json.loads(compact_line(timings, ["a", "b"], ["b"], 1.0, 0.01))
    assert out["failed"] == ["b"]
    assert "b" not in out["queries"] and out["queries"]["a"] == 1.0


def test_short_line_keeps_every_headline_entry():
    timings = _fake(10)
    out = json.loads(compact_line(timings, sorted(timings), [], 4.5, 0.001))
    assert len(out["queries"]) == 10


def test_pathological_failed_list_is_truncated():
    failed = [f"very_long_failed_query_name_number_{i}" for i in range(100)]
    out = compact_line({}, [], failed, 0.0, 0.1)
    assert len(out) <= 1800
    d = json.loads(out)
    assert d["failed"][-1] == "..." and len(d["failed"]) == 11


def test_write_bench_full_preserves_isolated_block(tmp_path):
    # a driver full-sweep overwrite must carry the prior --isolate
    # medians forward (the committed record lost them at d70031a)
    import json

    from bench import write_bench_full

    p = str(tmp_path / "BENCH_FULL.json")
    with open(p, "w") as f:
        json.dump({"queries": {"a": 1.0}, "isolated": {"a": 0.9}}, f)
    write_bench_full(p, {"queries": {"a": 1.1}, "value": 1.1})
    d = json.load(open(p))
    assert d["queries"] == {"a": 1.1}
    assert d["isolated"] == {"a": 0.9}
    # an isolate run that writes its own block is NOT clobbered by prior
    write_bench_full(p, {"queries": {"a": 1.2}, "isolated": {"a": 1.05}})
    assert json.load(open(p))["isolated"] == {"a": 1.05}
    # and a missing/corrupt prior file is fine
    p2 = str(tmp_path / "new.json")
    write_bench_full(p2, {"queries": {}})
    assert "isolated" not in json.load(open(p2))


def test_merge_isolated_updates_without_wiping():
    # a single-gate --isolate run must not drop the other gates' medians
    from bench import merge_isolated

    full = {"isolated": {"a": 1.0, "b": 2.0}, "isolated_sf": 0.1}
    merge_isolated(full, {"b": 1.8}, 0.1)
    assert full["isolated"] == {"a": 1.0, "b": 1.8}
    # a different sf replaces (medians across scales are not comparable)
    merge_isolated(full, {"c": 0.5}, 0.01)
    assert full["isolated"] == {"c": 0.5} and full["isolated_sf"] == 0.01
    # no prior block: just take the new one
    empty = {}
    merge_isolated(empty, {"a": 1.0}, 0.1)
    assert empty["isolated"] == {"a": 1.0} and empty["isolated_sf"] == 0.1
