"""Local replica of the driver's correctness gate.

Runs every __spark_entry__.queries() entry on Spark and its
oracle_sql() twin on DuckDB at the given sf dir, then compares
row count, sorted column names, and an order-insensitive value hash.

Usage: python tools/check_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events", "documents", "embeddings"]


def normalize_cell(v) -> str:
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0 and math.copysign(1.0, v) < 0:
            # IEEE -0.0 == 0 but repr/pandas render it "-0.0" — keep it
            # visible here too (caught the parquet-footer-min case)
            return "-0.0"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        # FULL precision, deliberately stricter than the driver's hash:
        # a %.6g fallback hid r3's one red row (last-ulp PSI); the whole
        # catalog passes bit-exact (round-4 strict sweeps, both SFs), so
        # keep it locked in — any future sum-order float leak fails here
        # first
        return repr(v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(normalize_cell(x) for x in v) + "]"
    return str(v)


def frame_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(normalize_cell(r[i]) for i in order) for r in rows)
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


# DuckDB result types that round-trip identically through every fetch
# path (fetchall, .df(), .arrow()).  Anything else — HUGEINT (int128 ->
# float64 via pandas), DECIMAL, FLOAT (float32 repr drift), UHUGEINT —
# renders differently depending on how the harness fetches, producing
# hash-only mismatches that fetchall-based checks cannot see.  The six
# r04 driver-red rows were exactly the six oracles with HUGEINT output
# columns; every sampled-green oracle used only types from this set.
_SAFE_DUCK_TYPES = {
    "BIGINT", "INTEGER", "SMALLINT", "TINYINT", "DOUBLE", "VARCHAR",
    "DATE", "TIMESTAMP", "BOOLEAN",
}


def unsafe_oracle_types(rel) -> dict[str, str]:
    return {
        c: str(t)
        for c, t in zip(rel.columns, rel.types)
        if str(t) not in _SAFE_DUCK_TYPES
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and os.path.isdir(sys.argv[1]) else "/root/testdata/sf0.001"
    only = set(a for a in sys.argv[1:] if not os.path.isdir(a))

    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from meteor_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("parity")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            if len(srows) == 0:
                print(f"     WARNING: {name} returned 0 rows")
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = [c for c in rel.columns]
            unsafe = unsafe_oracle_types(rel)
            drows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            continue
        ok = True
        if unsafe:
            print(f"FAIL {name}: fetch-path-unsafe oracle types {unsafe} "
                  f"(CAST to BIGINT/DOUBLE — HUGEINT et al. hash differently via pandas)")
            ok = False
        if len(srows) != len(drows):
            print(f"FAIL {name}: rowcount spark={len(srows)} duckdb={len(drows)}")
            ok = False
        if sorted(scols) != sorted(dcols):
            print(f"FAIL {name}: columns spark={sorted(scols)} duckdb={sorted(dcols)}")
            ok = False
        if ok:
            sh, dh = frame_hash(scols, srows), frame_hash(dcols, drows)
            if sh != dh:
                print(f"FAIL {name}: value hash mismatch ({len(srows)} rows)")
                # show first differing rows for debugging
                order_s = sorted(range(len(scols)), key=lambda i: scols[i])
                order_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
                aset = sorted("|".join(normalize_cell(r[i]) for i in order_s) for r in srows)
                bset = sorted("|".join(normalize_cell(r[i]) for i in order_d) for r in drows)
                for a, b in zip(aset, bset):
                    if a != b:
                        print(f"  spark : {a[:200]}\n  duckdb: {b[:200]}")
                        break
                only_a = set(aset) - set(bset)
                only_b = set(bset) - set(aset)
                for x in list(only_a)[:2]:
                    print(f"  only-spark : {x[:200]}")
                for x in list(only_b)[:2]:
                    print(f"  only-duckdb: {x[:200]}")
                ok = False
        if ok:
            print(f"PASS {name} ({len(srows)} rows, {time.time()-t0:.1f}s)")
            if len(srows) == 0:
                print(f"     WARNING: {name} returned 0 rows")
        else:
            failures.append(name)

    n_run = len([n for n in qs if not only or n in only])
    print(f"\n{n_run - len(failures)}/{n_run} ok ({len(qs)} registered); failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
