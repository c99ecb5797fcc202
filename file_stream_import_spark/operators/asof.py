"""As-of join — for each left row, the most recent right row at or before
its timestamp, per key. Spark has no native asof join; this is the
union+window formulation (composition of built-ins, option (a) in the
project's custom-operator preference order).

Algorithm: union both sides tagged left/right, sort within each key by
(ts, side) — right-before-left at equal ts so ties match the "at or
before" contract — and carry the last right payload forward with
``last(ignorenulls=True)``. One shuffle on the key, no join at all; this
is strictly cheaper than a range join and scales to 100 TB (the window
never materializes more than a partition).

Alternative for pandas users: ``applyInPandas`` + ``pd.merge_asof`` per
key group — same semantics, Python in the loop; we keep the JVM form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType


def _qc(name: str) -> F.Column:
    """Column reference by EXACT name: F.col()/df[] parse dots as struct
    paths, so names like "price.usd" need backtick quoting (with embedded
    backticks escaped by doubling)."""
    return F.col("`" + name.replace("`", "``") + "`")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str | list[str] = "user_id",
    right_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Left as-of join: latest right row with right.on <= left.on per key.

    Left rows with no prior right row keep nulls (left-join semantics).
    ``right_cols``: right payload columns to carry (default: all except
    key/time columns).
    """
    by_cols = [by] if isinstance(by, str) else list(by)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (*by_cols, on)]

    # Carry the right payload as ONE struct so the matched right row is
    # atomic: per-column last(ignorenulls=True) could stitch together
    # values from different right rows when a payload column holds NULL.
    # Built as a DataType object (not a DDL string) so payload column
    # names with dots/backticks and nested types round-trip exactly.
    struct_type = StructType(
        [StructField(c, right.schema[c].dataType) for c in right_cols]
    )
    l_tagged = left.select(
        *by_cols,
        F.col(on),
        F.lit(1).alias("__side"),
        *[_qc(c) for c in left.columns if c not in (*by_cols, on)],
        F.lit(None).cast(struct_type).alias("__rpay"),
    )
    r_tagged = right.select(
        *by_cols,
        F.col(on),
        F.lit(0).alias("__side"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
            if c not in (*by_cols, on)
        ],
        F.struct(
            *[_qc(c).alias(c) for c in right_cols]
        ).alias("__rpay"),
    )
    u = l_tagged.unionByName(r_tagged)
    w = (
        W.partitionBy(*by_cols)
        .orderBy(F.col(on), F.col("__side"))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    carried = u.select(
        *by_cols,
        on,
        "__side",
        *[_qc(c) for c in left.columns if c not in (*by_cols, on)],
        F.last("__rpay", ignorenulls=True).over(w).alias("__rpay"),
    )
    return (
        carried.filter(F.col("__side") == 1)
        .select(
            "*",
            *[
                F.col("__rpay").getField(c).alias(f"{c}{suffix}")
                for c in right_cols
            ],
        )
        .drop("__side", "__rpay")
    )
