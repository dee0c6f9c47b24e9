"""Pandas-fetch-path replica of the driver's correctness hash.

tools/check_parity.py fetches DuckDB results with fetchall(), which
converts HUGEINT to Python int and hides fetch-path type divergence —
the class behind all six r04 driver-red rows (HUGEINT -> float64 via
pandas while Spark publishes bigint). This tool closes that blind
spot: it fetches BOTH engines through pandas (Spark toPandas, DuckDB
.df()) and hashes with a TYPE-SENSITIVE rendering (123 != 123.0), so
any column whose dtype differs between the engines' pandas frames
fails here even when the values agree.

Usage: python tools/check_pandas_path.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def render(v) -> str:
    """Type-sensitive cell rendering: int and float never collide."""
    import datetime

    import numpy as np

    if v is None:
        return "NULL"
    if isinstance(v, (np.integer,)):
        return repr(int(v))
    if isinstance(v, (np.floating,)):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"  # pandas conflates NULL and NaN; accept both
        return repr(v)
    if isinstance(v, np.bool_):
        return repr(bool(v))
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if hasattr(v, "isoformat"):  # pandas Timestamp
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(render(x) for x in v) + "]"
    return repr(v)


def pdf_hash(pdf) -> str:
    pdf = pdf[sorted(pdf.columns)]
    lines = sorted(
        "|".join(render(v) for v in row) for row in pdf.itertuples(index=False)
    )
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def main() -> int:
    sf_dir = (
        sys.argv[1]
        if len(sys.argv) > 1 and os.path.isdir(sys.argv[1])
        else "/root/testdata/sf0.01"
    )
    only = set(a for a in sys.argv[1:] if not os.path.isdir(a))

    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from meteor_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("pandas_parity")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    n_run = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            continue
        n_run += 1
        t0 = time.time()
        try:
            sp = fn(spark, sf_dir).toPandas()
            dp = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {e}")
            failures.append(name)
            continue
        sh, dh = pdf_hash(sp), pdf_hash(dp)
        if sh != dh:
            print(f"FAIL {name}: pandas-path hash mismatch ({len(sp)} rows)")
            a = sorted(
                "|".join(render(v) for v in r)
                for r in sp[sorted(sp.columns)].itertuples(index=False)
            )
            b = sorted(
                "|".join(render(v) for v in r)
                for r in dp[sorted(dp.columns)].itertuples(index=False)
            )
            for x, y in zip(a, b):
                if x != y:
                    print(f"  spark : {x[:200]}\n  duckdb: {y[:200]}")
                    break
            failures.append(name)
        else:
            print(f"PASS {name} ({len(sp)} rows, {time.time()-t0:.1f}s)")
    print(f"\n{n_run - len(failures)}/{n_run} ok; failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
