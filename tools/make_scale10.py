"""Build the 10x synthetic scale-up of an sf fixture dir to SCRATCH —
the construction docs/SCALING.md has used since round 3, now a tool so
the strict parity sweep (tools/check_parity.py) can run AT 10x, not
just the timing harness. sf0.1-only bugs were caught twice (the
preview tie cut, the q2 rounding boundary); a 10x correctness sweep is
the next rung of the same ladder and the closest in-container proxy
for the 100-TB claim.

Construction (key-shifted copies — FK-consistent, so the TPC-H joins
stay meaningful and every oracle remains well-defined):

- documents x10: distinct doc_id range per copy; one unique suffix
  token appended to text per copy (per-doc stats shift only marginally
  while exact-duplicate collapse is prevented).
- events x10: distinct event_id and user_id ranges per copy (10x
  users, not 10x rows per user — the realistic axis).
- embeddings x10: distinct vec_id range per copy, vectors unchanged
  (gates break ties by id, so duplicated vectors stay total-ordered).
- customer/supplier/part/orders/lineitem x10: every PK and FK shifted
  by copy * stride with one stride per key family, so copy k is a
  self-contained TPC-H universe joined to the shared nation/region.
- region/nation: copied as-is (FK targets; dimension tables don't
  scale with fact data).

Usage: python tools/make_scale10.py [base_sf_dir] [out_dir]
       [--copies N] [--scale-tables t1,t2,...]
Defaults: /root/testdata/sf0.1 -> /tmp/scale10, 10 copies, all tables.

--copies 100 builds the 100x-direction probe (the next rung of the
ladder that caught q9 and winsorized-stats at 10x). --scale-tables
keeps the fixture sparse: only the named fact tables are multiplied;
everything else is copied 1x from the base dir so BOTH engines' view
contracts still resolve every table. Key strides are sized for up to
100 copies of sf0.1 (largest base key ~6e6 x stride-multiplier 100
stays far below int64).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

COPIES = 10
# strides: one per key family, far above any sf0.1 key
S_CUST = 1_000_000
S_ORDER = 10_000_000
S_PART = 1_000_000
S_SUPP = 100_000
S_EVENT = 10_000_000
S_USER = 1_000_000
S_DOC = 1_000_000
S_VEC = 1_000_000


def build(spark, base: str, out: str, copies: int = COPIES,
          scale_tables: set[str] | None = None) -> None:
    from pyspark.sql import functions as F

    os.makedirs(out, exist_ok=True)

    def src(t):
        return spark.read.parquet(f"{base}/{t}.parquet")

    def write(df, t):
        # one parquet FILE per table, mirroring the fixture layout both
        # readers expect (duckdb views point at '<dir>/<t>.parquet')
        import glob
        import shutil

        tmp = f"{out}/__{t}_tmp"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(f"{tmp}/part-*.parquet")[0]
        shutil.move(part, f"{out}/{t}.parquet")
        shutil.rmtree(tmp)

    def expand(df, shifts: dict[str, int], extra=None):
        k = F.col("__copy")
        exprs = []
        for c in df.columns:
            if c in shifts:
                exprs.append((F.col(c) + k * shifts[c]).alias(c))
            elif extra and c in extra:
                exprs.append(extra[c](k).alias(c))
            else:
                exprs.append(F.col(c))
        return (
            df.crossJoin(
                spark.range(copies).select(F.col("id").cast("int").alias("__copy"))
            )
            .select(*exprs)
        )

    recipes = {
        "customer": ({"c_custkey": S_CUST}, None),
        "supplier": ({"s_suppkey": S_SUPP}, None),
        "part": ({"p_partkey": S_PART}, None),
        "orders": ({"o_orderkey": S_ORDER, "o_custkey": S_CUST}, None),
        "lineitem": (
            {"l_orderkey": S_ORDER, "l_partkey": S_PART, "l_suppkey": S_SUPP},
            None,
        ),
        "events": ({"event_id": S_EVENT, "user_id": S_USER}, None),
        "documents": (
            {"doc_id": S_DOC},
            {
                "text": lambda k: F.concat(
                    F.col("text"), F.lit(" zz"), k.cast("string"), F.lit("tok")
                )
            },
        ),
        "embeddings": ({"vec_id": S_VEC}, None),
    }

    for t in ("region", "nation"):
        write(src(t), t)
    for t, (shifts, extra) in recipes.items():
        if scale_tables is None or t in scale_tables:
            write(expand(src(t), shifts, extra), t)
        else:
            write(src(t), t)  # 1x copy keeps both engines' views resolving


def main() -> int:
    argv = list(sys.argv[1:])
    copies, scale_tables = COPIES, None
    if "--copies" in argv:
        i = argv.index("--copies")
        copies = int(argv[i + 1])
        del argv[i : i + 2]
    if "--scale-tables" in argv:
        i = argv.index("--scale-tables")
        scale_tables = set(argv[i + 1].split(","))
        del argv[i : i + 2]
    base = argv[0] if len(argv) > 0 else "/root/testdata/sf0.1"
    out = argv[1] if len(argv) > 1 else "/tmp/scale10"
    from meteor_spark.session import get_spark

    spark = get_spark("scale10")
    spark.sparkContext.setLogLevel("ERROR")
    build(spark, base, out, copies=copies, scale_tables=scale_tables)
    import duckdb

    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        n = duckdb.sql(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(t, n)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
