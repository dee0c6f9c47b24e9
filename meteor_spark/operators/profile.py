"""Column profiling — the reference's most analytic operator.

Reference computation (plugins/extractors/bigquery/bigquery.go:386-411,
one SQL query PER COLUMN, goroutine per column at :237-254):

    MIN(col), MAX(col) cast to string
    AVG(SAFE_CAST(col AS FLOAT64))
    APPROX_QUANTILES(col, 2)[OFFSET(1)]      -- approx median
    APPROX_COUNT_DISTINCT(col)
    COUNT(col)
    APPROX_TOP_COUNT(col, 1)[OFFSET(0)].value -- mode / top-1

Spark design: ALL columns profiled in ONE aggregation pass —
`df.agg(*flat_list_of_aggregates)` — instead of N queries. On a 100 TB
table that is one scan (with column pruning to the profiled columns)
and one partial-aggregate shuffle of a single row per partition, vs the
reference's N full scans. Skips binary/array/struct/map columns, the
same gate as the reference (bigquery.go:340-343 skips
bytes/repeated/record).

`exact=True` swaps the approximate aggregates (percentile_approx,
approx_count_distinct) for exact ones (median via percentile, exact
count distinct) — used by the correctness oracle where DuckDB and Spark
approximate sketches would legitimately differ.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_PROFILE_FIELDS = ("min", "max", "avg", "med", "unique", "count", "top")

_NUMERIC = (T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.FloatType, T.DoubleType, T.DecimalType)
_SKIP = (T.BinaryType, T.ArrayType, T.MapType, T.StructType)  # bigquery.go:340-343


def profilable_columns(df: DataFrame) -> list[str]:
    return [f.name for f in df.schema.fields if not isinstance(f.dataType, _SKIP)]


def _aggs_for(col: str, dtype: T.DataType, exact: bool) -> list[Column]:
    c = F.col(col)
    numeric = isinstance(dtype, _NUMERIC)
    double = c.cast("double")
    if exact:
        unique = F.count_distinct(c)
        med = F.expr(f"percentile(`{col}`, 0.5)") if numeric else F.lit(None).cast("double")
    else:
        unique = F.approx_count_distinct(c)
        med = F.percentile_approx(double, 0.5) if numeric else F.lit(None).cast("double")
    return [
        F.min(c).cast("string").alias(f"{col}__min"),
        F.max(c).cast("string").alias(f"{col}__max"),
        (F.avg(double) if numeric else F.lit(None).cast("double")).alias(f"{col}__avg"),
        med.alias(f"{col}__med"),
        unique.alias(f"{col}__unique"),
        F.count(c).alias(f"{col}__count"),
        F.mode(c).cast("string").alias(f"{col}__top"),
    ]


def profile_columns(df: DataFrame, columns: list[str] | None = None, exact: bool = False) -> dict[str, dict]:
    """Profile every (profilable) column in one aggregation pass.

    Returns {column: {min,max,avg,med,unique,count,top}} matching the
    ColumnProfile facet (models/odpf/assets/facets/v1beta1/schema.pb.go:180).
    """
    cols = columns or profilable_columns(df)
    types = dict(zip(df.schema.names, [f.dataType for f in df.schema.fields]))
    aggs: list[Column] = []
    for c in cols:
        aggs.extend(_aggs_for(c, types[c], exact))
    row = df.agg(*aggs).collect()[0].asDict()
    return {
        c: {f: row[f"{c}__{f}"] for f in _PROFILE_FIELDS}
        for c in cols
    }


def profile_df(df: DataFrame, columns: list[str] | None = None, exact: bool = True, round_to: int = 4) -> DataFrame:
    """DataFrame-shaped profile: one output row per column, columns
    (column, min, max, avg, med, unique, count, top). Still one scan:
    the single wide agg row is unpivoted with a stack() expression —
    no per-column jobs, no driver loop over data.
    """
    cols = columns or profilable_columns(df)
    types = dict(zip(df.schema.names, [f.dataType for f in df.schema.fields]))
    aggs: list[Column] = []
    for c in cols:
        aggs.extend(_aggs_for(c, types[c], exact))
    wide = df.agg(*aggs)
    # unpivot: stack(n, 'col1', col1__min, ..., 'coln', ...) -> rows
    parts = []
    for c in cols:
        fields = ", ".join(
            f"cast(`{c}__{f}` as {'double' if f in ('avg', 'med') else 'string' if f in ('min', 'max', 'top') else 'bigint'})"
            for f in _PROFILE_FIELDS
        )
        parts.append(f"('{c}', {fields})")
    struct_rows = f"array({', '.join('struct' + p for p in parts)})"
    out = wide.select(F.explode(F.expr(struct_rows)).alias("p")).select(
        F.col("p.col1").alias("column"),
        F.col("p.col2").alias("min"),
        F.col("p.col3").alias("max"),
        F.round(F.col("p.col4"), round_to).alias("avg"),
        F.round(F.col("p.col5"), round_to).alias("med"),
        F.col("p.col6").cast("long").alias("unique"),
        F.col("p.col7").cast("long").alias("count"),
        F.col("p.col8").alias("top"),
    )
    return out
