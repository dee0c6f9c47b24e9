"""As-of join — "latest right-side row at or before each left timestamp".

Spark has no native ASOF JOIN (DuckDB/kdb do), so this is the canonical
custom-operator composition (option (a) of the build rules: built-in ops
only, no UDF):

    union the two sides with a side marker
    -> one window sort per (by-key, ts)
    -> last_value(right_payload, ignoreNulls) over rows-unbounded-preceding
    -> keep left rows

Cost model: ONE shuffle of |L|+|R| rows keyed by the by-column and a
per-partition sort — versus the naive range-join (|L| x |R| per key) or a
per-key collect. Skewed by-keys can be salted upstream; at 100 TB this is
the only formulation that stays a single exchange.

Tie semantics: a right row at exactly left.ts matches (<=); among right
rows sharing (by, ts) the one with the LARGEST value struct wins — the
window's tertiary sort key orders the payload struct ascending, so
last() deterministically picks the greatest, on any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    by_col: str,
    value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach value_cols from the most recent right row
    with right.ts <= left.ts and matching by_col. Right-only columns are
    null when no prior right row exists."""
    lcols = left.columns
    l = left.select(
        *lcols,
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[v].dataType).alias(f"__r_{v}") for v in value_cols],
    )
    r = right.select(
        F.col(by_col),
        F.col(ts_col),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in (by_col, ts_col)],
        F.lit(0).alias("__side"),
        *[F.col(v).alias(f"__r_{v}") for v in value_cols],
    )
    u = l.unionByName(r)
    # right rows sort before left rows at equal ts (__side 0 < 1) so an
    # exactly-coincident right row is visible to the left row; the
    # value-struct tertiary key makes right-right ties at the same
    # (by, ts) deterministic — ascending sort puts the largest value
    # struct last, and last() picks it, fulfilling the module's stated
    # tie contract under ANY partitioning (without it the winner was
    # whichever duplicate the partition sort happened to order later)
    w = (
        Window.partitionBy(by_col)
        .orderBy(
            F.col(ts_col),
            F.col("__side"),
            F.struct(*[F.col(f"__r_{v}") for v in value_cols]),
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for v in value_cols:
        u = u.withColumn(f"{v}{suffix}", F.last(f"__r_{v}", ignorenulls=True).over(w))
    return u.filter(F.col("__side") == 1).select(*lcols, *[f"{v}{suffix}" for v in value_cols])
