"""Seeded-random cross-checks: each distributed operator replayed by an
INDEPENDENT pure-Python reference implementation on the same data —
catches formula drift that hand-worked examples can't (the strategy
test_bigram_lm_perplexity_randomized_cross_check established)."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F


def test_weighted_percentiles_match_python_reference(spark):
    from meteor_spark.operators.profile import weighted_percentiles

    rng = random.Random(42)
    rows = [
        (f"g{i % 3}", round(rng.uniform(0, 100), 2), float(rng.randint(1, 9)))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "k string, v double, w double")
    got = {r["k"]: r for r in weighted_percentiles(df, "v", "w", ["k"]).collect()}

    by_k: dict[str, list[tuple[float, float]]] = {}
    for k, v, w in rows:
        by_k.setdefault(k, []).append((v, w))
    for k, vw in by_k.items():
        vw.sort()
        tot = sum(w for _, w in vw)
        for q in (0.25, 0.5, 0.75, 0.95):
            cum = 0.0
            want = None
            for v, w in vw:
                cum += w
                if cum >= q * tot:
                    want = v
                    break
            assert got[k][f"wp{int(q * 100)}"] == round(want, 2), (k, q)
        assert got[k]["total_weight"] == round(tot, 2)


def test_token_gini_matches_python_reference(spark):
    from meteor_spark.operators.text import token_gini_by_group

    rng = random.Random(7)
    rows = [
        (i, " ".join("tok" for _ in range(rng.randint(1, 50))), f"s{i % 4}")
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r["source"]: r["gini"] for r in token_gini_by_group(df).collect()}

    by_s: dict[str, list[int]] = {}
    for _, t, s in rows:
        by_s.setdefault(s, []).append(len(t.split()))
    for s, xs in by_s.items():
        xs.sort()
        n, tot = len(xs), sum(xs)
        want = 2 * sum((i + 1) * x for i, x in enumerate(xs)) / (n * tot) - (n + 1) / n
        assert abs(got[s] - round(want, 4)) <= 1e-9, s


def test_heavy_hitters_match_counter_across_partitionings(spark):
    from collections import Counter

    from meteor_spark.operators.sketches import heavy_hitters_exact

    rng = random.Random(11)
    # zipf-ish: key j drawn with weight 1/(j+1)
    keys = [f"k{j}" for j in range(200)]
    weights = [1.0 / (j + 1) for j in range(200)]
    stream = rng.choices(keys, weights=weights, k=5000)
    want_counter = Counter(stream)
    k = 20
    want = {
        (key, c) for key, c in want_counter.items() if c > len(stream) / k
    }
    for parts in (2, 7, 16):
        df = spark.createDataFrame([(s,) for s in stream], "k string").repartition(parts)
        got = {
            (r["k"], r["n_occurrences"])
            for r in heavy_hitters_exact(df, "k", k).collect()
        }
        assert got == want, parts


def test_kcenter_matches_python_greedy(spark):
    from meteor_spark.operators.similarity import kcenter_select

    rng = random.Random(5)
    pts = [(i, [round(rng.uniform(-5, 5), 3) for _ in range(6)]) for i in range(80)]
    df = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
    got = [(r["rank"], r["vec_id"], r["dist2"]) for r in kcenter_select(df, k=5).collect()]

    # independent greedy replay with the operator's determinism contract
    def n2(v):
        return round(sum(x * x for x in v), 6)

    vecs = {i: v for i, v in pts}
    seed = min(vecs, key=lambda i: (-n2(vecs[i]), i))
    sel = [(1, seed, 0.0)]
    mind = {}
    cur = seed
    for rank in range(2, 6):
        cv, cn = vecs[cur], n2(vecs[cur])
        for i, v in vecs.items():
            d = round(n2(v) + cn - 2 * sum(a * b for a, b in zip(v, cv)), 6)
            mind[i] = min(mind.get(i, float("inf")), d)
        chosen = max(
            (i for i in vecs if i not in {s[1] for s in sel}),
            key=lambda i: (mind[i], -i),
        )
        sel.append((rank, chosen, mind[chosen]))
        cur = chosen
    assert got == sel


def test_triangle_counts_match_python_reference(spark):
    from meteor_spark.operators.graph import triangle_counts

    rng = random.Random(13)
    nodes = list(range(30))
    edges = set()
    for _ in range(120):
        a, b = rng.sample(nodes, 2)
        edges.add((min(a, b), max(a, b)))
    df = spark.createDataFrame(sorted(edges), "src int, dst int")
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()}

    adj = {n: set() for n in nodes}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    want: dict[int, int] = {}
    for x, y in edges:
        for z in adj[x] & adj[y]:
            for n in (x, y, z):
                want[n] = want.get(n, 0) + 1
    # each triangle seen via 3 of its edges per corner
    want = {n: c // 3 for n, c in want.items() if c}
    assert got == want


def test_char_entropy_bounded_by_log_distinct(spark):
    from meteor_spark.operators.text import char_entropy_profile

    rng = random.Random(3)
    rows = [
        (i, "".join(rng.choice("abcdefg h") for _ in range(rng.randint(5, 60))))
        for i in range(100)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for r in char_entropy_profile(df).collect():
        # entropy is rounded to 4dp, so allow half-ulp of that rounding
        assert -5e-5 <= r["char_entropy"] <= math.log2(r["distinct_chars"]) + 5e-5


def test_portable_hll_matches_python_reference(spark):
    # the engine-portable HLL (md5-register sketch) replayed by an
    # independent Python implementation of the same hash family
    import hashlib
    import math

    from meteor_spark.operators.sketches import hll64_partials, merge_hll64

    rng = random.Random(11)
    rows = [(f"k{i % 2}", rng.randint(0, 5000)) for i in range(4000)]
    df = spark.createDataFrame(rows, "k string, v long")
    got = {
        r["k"]: (r["approx_distinct"], r["n_rows"])
        for r in merge_hll64(hll64_partials(df, ["k"], "v"), ["k"]).collect()
    }

    m = 1 << 10
    alpha = 0.7213 / (1 + 1.079 / m)
    by_k: dict[str, dict[int, int]] = {}
    n_rows: dict[str, int] = {}
    for k, v in rows:
        h = hashlib.md5(str(v).encode()).hexdigest()
        h1, h2 = int(h[:8], 16), int(h[8:16], 16)
        rho = 33 if h2 == 0 else 33 - h2.bit_length()
        regs = by_k.setdefault(k, {})
        regs[h1 % m] = max(regs.get(h1 % m, 0), rho)
        n_rows[k] = n_rows.get(k, 0) + 1
    for k, regs in by_k.items():
        s = sum(1 << (50 - r) for r in regs.values()) + (m - len(regs)) * (1 << 50)
        v_empty = m - len(regs)
        raw = alpha * m * m * float(1 << 50) / s
        if raw <= 2.5 * m and v_empty > 0:
            want = m * math.log(m / v_empty)
        else:
            want = raw
        assert got[k][0] == round(want, 4), k
        assert got[k][1] == n_rows[k]


def test_dsir_log_weights_match_python_reference(spark):
    import hashlib
    import math

    from meteor_spark.operators.sampling import dsir_log_weights

    rng = random.Random(5)
    vocab = [f"w{i}" for i in range(60)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 20))),
         "en" if i % 3 == 0 else "de")
        for i in range(150)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    buckets = 64
    got = {
        r["doc_id"]: (r["n_tokens"], r["log_weight"])
        for r in dsir_log_weights(df, F.col("lang") == "en", buckets=buckets).collect()
    }

    def bkt(w: str) -> int:
        return int(hashlib.md5(w.encode()).hexdigest()[:4], 16) % buckets

    cr: dict[int, int] = {}
    ct: dict[int, int] = {}
    toks = {}
    for i, text, lang in rows:
        ws = text.split()
        toks[i] = ws
        for w in ws:
            b = bkt(w)
            cr[b] = cr.get(b, 0) + 1
            if lang == "en":
                ct[b] = ct.get(b, 0) + 1
    tot_r = float(sum(cr.values()))
    tot_t = float(sum(ct.values()))
    lp = {
        b: math.log((ct.get(b, 0) + 1.0) / (tot_t + buckets))
        - math.log((cr[b] + 1.0) / (tot_r + buckets))
        for b in cr
    }
    for i, ws in toks.items():
        want = sum(lp[bkt(w)] for w in ws)
        assert got[i][0] == len(ws)
        assert abs(got[i][1] - round(want, 4)) <= 1e-4, i


def test_activity_gini_matches_python_reference(spark):
    from meteor_spark.operators.usage import activity_gini

    rng = random.Random(3)
    rows = [(i, rng.randint(0, 40)) for i in range(500)]
    ev = [(u, e) for u, n in rows for e in range(n + 1)]
    df = spark.createDataFrame(ev, "user_id long, event_id long")
    got = activity_gini(df).collect()[0]

    xs = sorted(n + 1 for _, n in rows)
    n, tot = len(xs), sum(xs)
    want = 2 * sum((i + 1) * x for i, x in enumerate(xs)) / (n * tot) - (n + 1) / n
    assert got["n_users"] == n and got["n_events"] == tot
    assert abs(got["gini"] - round(want, 4)) <= 1e-4
