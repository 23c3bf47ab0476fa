"""Column-expression library — the Spark analog of the reference's dbt macros.

Everything here returns Column expressions (JVM-side, whole-stage-codegen
eligible). No Python UDFs: at 100 TB a row-at-a-time UDF in these hot paths
would dominate the runtime.

Numeric determinism convention (critical for oracle parity and for
reproducibility under Spark's nondeterministic row order):
  * raw money/qty columns are exact 2dp values stored as doubles — cast them
    to DECIMAL(18,2) per row (recovers the exact decimal; no round() needed,
    and round() on doubles is NOT portable across engines);
  * a product of k such columns has an exact ≤2k-dp expansion — cast to
    DECIMAL(18,2k). SUMs over decimals are exact and order-independent;
  * final outputs are cast back to DOUBLE (values << 2^53, conversion exact);
  * date-grain outputs are formatted as 'yyyy-MM-dd' strings (engine-portable).
"""

from __future__ import annotations

from pyspark.sql import Column, Window
from pyspark.sql import functions as F


def dec(col: Column, scale: int = 2) -> Column:
    """Fix a per-row money expression as an exact decimal so downstream
    SUM/AVG are exact and order-independent. ``scale`` = 2 for raw columns,
    4 for two-factor products, 6 for three-factor products."""
    return col.cast(f"decimal(18,{scale})")


def money2(col: Column) -> Column:
    return dec(col, 2)


def out_double(col: Column) -> Column:
    """Final-output cast: exact decimal → double for a stable wire type."""
    return col.cast("double")


def ratio(num: Column, den: Column, scale: int = 6) -> Column:
    """Null-safe division rounded to a fixed scale (reference F18:
    NULLIF(d,0) guards, fct_products.sql:42-52)."""
    return F.round(num.cast("double") / F.nullif(den.cast("double"), F.lit(0)), scale)


def surrogate_key(*cols: Column | str) -> Column:
    """dbt_utils.generate_surrogate_key parity (reference F8:
    md5 of coalesce(cast(col as string),'') joined by '-';
    dim_customer_contacts.sql:145-147). Byte-for-byte identical in any
    engine with md5 + utf8 strings."""
    parts = [
        F.coalesce(F.col(c).cast("string") if isinstance(c, str) else c.cast("string"), F.lit(""))
        for c in cols
    ]
    return F.md5(F.concat_ws("-", *parts))


def string_agg_sorted(col: Column | str, sep: str = " | ") -> Column:
    """Deterministic STRING_AGG(DISTINCT x) (reference A5:
    int_quickbooks__company_consolidation.sql:104-111). Postgres leaves the
    order unspecified; we canonicalize: distinct → sort ascending → join.
    Aggregate expression: use inside .agg().

    SQL STRING_AGG over zero non-NULL inputs is NULL, not '' — collect_set
    drops NULLs, so an all-NULL group yields an empty array, which must
    surface as NULL (array_join alone would emit '')."""
    c = F.col(col) if isinstance(col, str) else col
    arr = F.array_sort(F.collect_set(c))
    return F.when(F.size(arr) > 0, F.array_join(arr, sep))


def mode_det(df, group_cols: list[str], value_col: str, out_name: str):
    """Deterministic MODE() WITHIN GROUP (reference A6:
    int_quickbooks__company_consolidation.sql:125-133). Spark 3.4's mode()
    breaks ties arbitrarily; this canonical form ties-breaks on the smallest
    value: count per (group, value) → row_number by (count desc, value asc).
    Returns a DataFrame keyed by group_cols. Two shuffles on the same keys —
    AQE coalesces; at scale the first agg does map-side partial aggregation.
    """
    # SQL MODE() semantics: NULL is never a candidate value (and the two
    # engines disagree on where NULL sorts in the tie-break window, so
    # admitting it would also be non-portable). Groups whose values are all
    # NULL produce no row.
    counts = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*group_cols, value_col)
        .count()
    )
    w = Window.partitionBy(*group_cols).orderBy(F.col("count").desc(), F.col(value_col).asc())
    return (
        counts.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(*group_cols, F.col(value_col).alias(out_name))
    )


def growth_pct(current: Column, previous: Column, scale: int = 6) -> Column:
    """Null/zero-safe growth percentage (reference F-macro
    macros/calculate_growth_percentage.sql:6-12): (cur-prev)/prev*100."""
    return F.round(
        (current.cast("double") - previous.cast("double"))
        / F.nullif(previous.cast("double"), F.lit(0))
        * 100.0,
        scale,
    )


def bucket(col: Column, edges: list[float], labels: list[str]) -> Column:
    """Tiering CASE generator (reference F22 revenue/size tiers,
    fct_company_orders.sql:162-175): edges [e0,e1,...] with len(labels) =
    len(edges)+1; value < e0 → labels[0], ... else labels[-1]. A NULL
    value yields a NULL tier — the final else must not promote missing
    data to the top label."""
    assert len(labels) == len(edges) + 1
    expr = F.when(col.isNull(), F.lit(None).cast("string")).when(
        col < F.lit(edges[0]), labels[0]
    )
    for i in range(1, len(edges)):
        expr = expr.when(col < F.lit(edges[i]), labels[i])
    return expr.otherwise(labels[-1])
