"""Digest-tier validation (tools/check_parity.py DIGEST_SPEC).

The digest tier certifies the pair-output gates at 100x by comparing an
engine-side row-hash digest instead of collecting 26M-1B rows through
Python. Its safety rests on two claims these tests pin:

  1. AGREEMENT: spark_digest and duck_digest produce byte-identical
     results for every supported type (ints, strings, NULLs, booleans,
     round(x,4) doubles) — i.e. the canonical rendering really is
     cross-engine stable, including the two risky primitives (the
     15-hex-char md5 prefix parse and the x1e8 double render).
  2. SENSITIVITY (the fail direction): a single changed cell, a
     dropped row, a duplicated row, or a sub-1e-4 metric drift flips
     the digest. Without this, a "pass" would be vacuous.

The end-to-end digest-vs-full verdict agreement on the real pair gates
is exercised at sf0.01/10x by the certification sweeps themselves
(docs/SCALING.md digest-tier validation table).
"""

from __future__ import annotations

import duckdb
import pytest

from tools.check_parity import duck_digest, spark_digest


_CONS = []  # keep helper connections alive (a relation does not)


def _duck_rel(rows, cols, types):
    con = duckdb.connect()
    _CONS.append(con)
    decls = ", ".join(f'"{c}" {t}' for c, t in zip(cols, types))
    con.execute(f"CREATE TABLE t ({decls})")
    if rows:
        con.executemany(
            f"INSERT INTO t VALUES ({', '.join('?' for _ in cols)})", rows
        )
    return con.sql("SELECT * FROM t")


def _spark_df(spark, rows, cols, spark_types):
    schema = ", ".join(f"{c} {t}" for c, t in zip(cols, spark_types))
    return spark.createDataFrame(rows, schema=schema)


PAIR_ROWS = [
    (1, 2, 0.5, "en", True),
    (1, 3, 0.8333, "de", False),
    (4, 5, 1.0, None, True),
    (-6, 7, 0.0001, "fr", None),
    (8, None, 0.9999, "x|y", False),  # '|' inside a cell must not alias
]
COLS = ["a", "b", "jaccard", "lang", "kept"]
DUCK_T = ["BIGINT", "BIGINT", "DOUBLE", "VARCHAR", "BOOLEAN"]
SPARK_T = ["long", "long", "double", "string", "boolean"]


def test_digest_agreement_all_types(spark):
    scols, sn, sdig, smax = spark_digest(_spark_df(spark, PAIR_ROWS, COLS, SPARK_T))
    dcols, dn, ddig, dmax = duck_digest(_duck_rel(PAIR_ROWS, COLS, DUCK_T))
    assert scols == dcols == sorted(COLS)
    assert sn == dn == len(PAIR_ROWS)
    assert sdig == ddig
    assert smax == dmax == pytest.approx(1.0)


def test_digest_agreement_round4_grid(spark):
    # every representable round(x, 4) value in [0, 1] renders to the
    # same scaled int in both engines (the whole domain the pair gates
    # publish) — 10,001 rows, exhaustive, not sampled
    rows = [(i, round(i / 10000.0, 4)) for i in range(10001)]
    sres = spark_digest(_spark_df(spark, rows, ["k", "m"], ["long", "double"]))
    dres = duck_digest(_duck_rel(rows, ["k", "m"], ["BIGINT", "DOUBLE"]))
    assert sres == dres


def test_digest_column_order_insensitive(spark):
    # rendering sorts by column NAME: a Spark frame selecting (b, a)
    # digests identically to the oracle publishing (a, b)
    rows = [(1, 2, 0.5)]
    s = spark_digest(
        _spark_df(spark, [(2, 0.5, 1)], ["b", "jaccard", "a"],
                  ["long", "double", "long"])
    )
    d = duck_digest(_duck_rel(rows, ["a", "b", "jaccard"],
                              ["BIGINT", "BIGINT", "DOUBLE"]))
    assert s == d


def test_digest_fail_direction(spark):
    base = duck_digest(_duck_rel(PAIR_ROWS, COLS, DUCK_T))[2]

    def duck(rows):
        return duck_digest(_duck_rel(rows, COLS, DUCK_T))[2]

    # one changed id
    rows = [r if r[0] != 4 else (400, *r[1:]) for r in PAIR_ROWS]
    assert duck(rows) != base
    # one metric moved by exactly one round(x,4) step
    rows = [r if r[2] != 0.5 else (r[0], r[1], 0.5001, *r[3:]) for r in PAIR_ROWS]
    assert duck(rows) != base
    # a dropped row
    assert duck(PAIR_ROWS[1:]) != base
    # a duplicated row (count-per-bucket catches it even though the
    # hash SET is unchanged)
    assert duck(PAIR_ROWS + [PAIR_ROWS[0]]) != base
    # NULL and the string 'NULL' alias — deliberately, because the full
    # tier's normalize_cell has the identical collision (None -> "NULL"
    # == str("NULL")): the digest must agree with the full comparison's
    # verdict, not be stricter in one spot and looser in another
    rows = [r if r[3] is not None else (*r[:3], "NULL", r[4]) for r in PAIR_ROWS]
    assert duck(rows) == base


def test_digest_empty_and_unsupported(spark):
    scols, sn, sdig, smax = spark_digest(
        _spark_df(spark, [], ["a", "m"], ["long", "double"]))
    dcols, dn, ddig, dmax = duck_digest(
        _duck_rel([], ["a", "m"], ["BIGINT", "DOUBLE"]))
    assert (scols, sn, sdig, smax) == (dcols, dn, ddig, dmax)
    assert sn == 0 and sdig == []
    # unsupported types refuse loudly instead of rendering differently
    with pytest.raises(ValueError, match="unsupported"):
        duck_digest(_duck_rel([], ["d"], ["DATE"]))
    with pytest.raises(ValueError, match="unsupported"):
        spark_digest(_spark_df(spark, [], ["d"], ["date"]))


def test_digest_hash_primitive_cross_engine(spark):
    # the 60-bit md5-prefix parse agrees bit-for-bit: Spark
    # conv(substr(md5,1,15),16,10) == DuckDB ('0x'||substr)::BIGINT
    from pyspark.sql import functions as F

    words = ["hello", "", "a|b", "0", "élève"]
    svals = [
        int(r[0])
        for r in spark.createDataFrame([(w,) for w in words], "w string")
        .select(F.conv(F.substring(F.md5("w"), 1, 15), 16, 10).cast("decimal(38,0)"))
        .collect()
    ]
    con = duckdb.connect()
    dvals = [
        con.execute(
            "SELECT ('0x' || substr(md5(?), 1, 15))::BIGINT", [w]
        ).fetchone()[0]
        for w in words
    ]
    assert svals == dvals
