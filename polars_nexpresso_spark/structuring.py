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
