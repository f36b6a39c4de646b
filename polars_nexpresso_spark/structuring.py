"""Structuring utilities: schema→dict conversion and recursive unnesting.

Port of the reference's ``nexpresso/structuring_utils.py`` (SURVEY §2.B) to
Spark ``StructType`` / ``ArrayType``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import ArrayType, DataType, StructType

from polars_nexpresso_spark.columns import qcol


def convert_spark_schema(schema: StructType | DataType):
    """Convert a Spark schema/dtype into a nested plain-dict representation.

    Structs become ``{field: ...}``, arrays become ``[inner]``, scalars become
    their ``simpleString`` name (reference ``structuring_utils.py:6-40``).
    """
    if isinstance(schema, StructType):
        return {f.name: convert_spark_schema(f.dataType) for f in schema.fields}
    if isinstance(schema, ArrayType):
        return [convert_spark_schema(schema.elementType)]
    return schema.simpleString()


def unnest_rename(df: DataFrame, column: str, separator: str = ".") -> DataFrame:
    """Unnest ONE struct column, prefixing its fields ``col{sep}field``."""
    dtype = {f.name: f.dataType for f in df.schema.fields}[column]
    if not isinstance(dtype, StructType):
        raise ValueError(
            f"Column '{column}' is not a struct (got {dtype.simpleString()})."
        )
    others = [c for c in df.columns if c != column]
    fields = [
        qcol(column)[f.name].alias(f"{column}{separator}{f.name}")
        for f in dtype.fields
    ]
    return df.select(*[qcol(c) for c in others], *fields)


def unnest_all(df: DataFrame, separator: str = ".") -> DataFrame:
    """Recursively flatten ALL struct columns to dotted scalar columns.

    Fixpoint loop over :func:`unnest_rename`; arrays are left intact (matching
    the reference, which only unnests structs)."""
    while True:
        struct_cols = [
            f.name for f in df.schema.fields if isinstance(f.dataType, StructType)
        ]
        if not struct_cols:
            return df
        for col in struct_cols:
            df = unnest_rename(df, col, separator)


def validate_array_widths(
    df: DataFrame,
    widths: dict[str, int],
    *,
    raise_on_violation: bool = True,
) -> dict[str, int]:
    """Enforce fixed-size-array widths (``pl.Array(T, n)`` parity).

    Spark has no fixed-width array dtype — the reference's ``pl.Array``
    fields map to plain ``ArrayType`` (SURVEY §1.2), making width a DATA
    property rather than a schema property. This closes that loop: one
    map-side aggregation pass counts, per column, the non-null rows whose
    ``size()`` differs from the declared width. NULL arrays are not
    violations (Polars fixed-size arrays are nullable as wholes too).

    Returns ``{column: violation_count}`` for every checked column.
    ``raise_on_violation`` (default) raises ``ValueError`` naming the
    offending columns/counts when any count is nonzero.

    Scale: single aggregation with partial (map-side) combine — one job,
    no shuffle of row data, constant-size result.
    """
    from pyspark.sql import functions as F

    missing = [c for c in widths if c not in df.columns]
    if missing:
        raise ValueError(f"Columns not in frame: {missing}")
    by_name = {f.name: f.dataType for f in df.schema.fields}
    not_arrays = [
        c for c in widths if not isinstance(by_name[c], ArrayType)
    ]
    if not_arrays:
        raise ValueError(
            f"Columns are not arrays: "
            f"{[(c, by_name[c].simpleString()) for c in not_arrays]}"
        )
    exprs = [
        F.sum(
            F.when(
                qcol(col).isNotNull() & (F.size(qcol(col)) != width), 1
            ).otherwise(0)
        ).alias(col)
        for col, width in widths.items()
    ]
    row = df.agg(*exprs).collect()[0]
    counts = {col: int(row[col] or 0) for col in widths}
    if raise_on_violation and any(counts.values()):
        bad = {c: n for c, n in counts.items() if n}
        raise ValueError(
            f"Fixed-width array violations (column -> offending rows): {bad}"
        )
    return counts
