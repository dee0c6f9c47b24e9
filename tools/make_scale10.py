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
       [--copies N] [--scale-tables t1,t2,...] [--zipf-keys S]
Defaults: /root/testdata/sf0.1 -> /tmp/scale10, 10 copies, all tables.

--zipf-keys S remaps the hot join keys to a deterministic Zipf(S)
draw (events.user_id globally; lineitem.l_partkey/l_suppkey within
each copy's own FK universe) — the skew fixture the uniform clones
can never be: with S=1.2 the hottest key draws ~15% of all rows.
Certification on it exercises AQE skew splits and the salted-join
twins on the distribution they were built for.

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


def _zipf_rank(u_expr, k: int, s: float):
    """Deterministic Zipf(s)-approximate rank in [1, k] from a uniform
    [0,1) column, via the continuous inverse CDF of the power law
    (F(x) = (x^(1-s)-1)/(k^(1-s)-1)). Close enough to discrete Zipf for
    skew-stress purposes: with s=1.2, k=20000 the hottest rank draws
    ~15% of ALL rows — the hot-key profile AQE skew joins and the
    salted-join twins exist for, which the uniform key-shifted clones
    never produce. Pure column arithmetic: reproducible builds, no RNG
    state."""
    from pyspark.sql import functions as F

    t = 1.0 - s  # < 0
    span = float(k) ** t - 1.0
    x = F.pow(F.lit(1.0) + u_expr * F.lit(span), F.lit(1.0 / t))
    return F.least(F.lit(k), F.greatest(F.lit(1), F.ceil(x).cast("long")))


def _u01(col):
    """Uniform [0,1) from a column, deterministically (xxhash64)."""
    from pyspark.sql import functions as F

    return F.pmod(F.xxhash64(col), F.lit(1_000_000)).cast("double") / 1e6


def build(spark, base: str, out: str, copies: int = COPIES,
          scale_tables: set[str] | None = None,
          zipf_s: float | None = None) -> None:
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
                # long, not int: copy * stride overflows int32 past
                # ~214 copies of the 10M-stride key families (ANSI
                # mode raises; pre-ANSI it would silently wrap)
                spark.range(copies).select(F.col("id").alias("__copy"))
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

    def skew(df, t):
        """--zipf-keys: remap the hot-join keys to a Zipf(s) draw.

        - events.user_id: GLOBAL Zipf over the base user range (no
          copy shift, no FK table exists for users) — one mega-hot
          user across the whole fixture, the worst case for
          user-keyed joins/windows (events_usage_salted,
          user_sessions, the attribution joins).
        - lineitem.l_partkey / l_suppkey: Zipf WITHIN each copy's own
          part/supplier universe (rank + copy * stride), so every FK
          still resolves and the star joins stay real while each
          copy's hottest part draws ~15% of its rows (q9/q21 skew).
        Draw seeds differ per column (hash of different id exprs) so
        the remapped keys are not correlated."""
        if zipf_s is None:
            return df
        if t == "events":
            n_users = src("events").agg(F.max("user_id")).first()[0]
            return df.withColumn(
                "user_id", _zipf_rank(_u01(F.col("event_id")), int(n_users), zipf_s)
            )
        if t == "lineitem":
            n_part = src("part").agg(F.max("p_partkey")).first()[0]
            n_supp = src("supplier").agg(F.max("s_suppkey")).first()[0]
            rid = F.col("l_orderkey") * 10 + F.col("l_linenumber")
            cp_part = F.expr(f"l_partkey div {S_PART}") * S_PART
            cp_supp = F.expr(f"l_suppkey div {S_SUPP}") * S_SUPP
            return df.withColumn(
                "l_partkey", cp_part + _zipf_rank(_u01(rid), int(n_part), zipf_s)
            ).withColumn(
                "l_suppkey",
                cp_supp + _zipf_rank(_u01(rid + 1), int(n_supp), zipf_s),
            )
        return df

    for t in ("region", "nation"):
        write(src(t), t)
    for t, (shifts, extra) in recipes.items():
        if scale_tables is None or t in scale_tables:
            write(skew(expand(src(t), shifts, extra), t), t)
        else:
            write(skew(src(t), t), t)  # 1x copy keeps views resolving


def main() -> int:
    argv = list(sys.argv[1:])
    copies, scale_tables, zipf_s = COPIES, None, None
    if "--copies" in argv:
        i = argv.index("--copies")
        copies = int(argv[i + 1])
        del argv[i : i + 2]
    if "--scale-tables" in argv:
        i = argv.index("--scale-tables")
        scale_tables = set(argv[i + 1].split(","))
        del argv[i : i + 2]
    if "--zipf-keys" in argv:
        i = argv.index("--zipf-keys")
        zipf_s = float(argv[i + 1])
        del argv[i : i + 2]
    base = argv[0] if len(argv) > 0 else "/root/testdata/sf0.1"
    out = argv[1] if len(argv) > 1 else "/tmp/scale10"
    # byte-reproducible builds at copies<=10 require a pinned
    # parallelism (spark.range partitioning feeds the output row order);
    # 8 matches the committed CERT10X fixture digests
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from meteor_spark.session import get_spark

    spark = get_spark("scale10")
    spark.sparkContext.setLogLevel("ERROR")
    build(spark, base, out, copies=copies, scale_tables=scale_tables,
          zipf_s=zipf_s)
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
