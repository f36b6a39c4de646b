"""Nested expression builder — declarative dict specs → Spark Column trees.

Port of the reference's expression builder (``nexpresso/expressions.py``,
SURVEY §2.A) to the Spark Column algebra. A nested dict spec compiles into a
list of Column expressions that select/transform/create fields inside deeply
nested struct/array columns; no Python executes per row — everything stays in
Catalyst/Tungsten (``F.transform`` for array elements, ``withField`` /
``F.struct`` for structs).

Spec language (reference ``expressions.py:33-35``):

- ``None`` — keep the column/field as-is.
- ``Column`` — use the expression (aliased to the key); creates new
  columns/fields.
- ``Callable[[Column], Column]`` — applied to the existing column/field
  (a plan-build-time expression builder, NOT a row UDF).
- ``dict`` — recurse into a struct / array-of-struct.
- ``StructFunction`` (Spark-specific) — callable applied to the *parent
  struct*; the analog of the reference's ``pl.field(...)`` references to
  original sibling fields, which Spark cannot express as a free-standing
  Column inside a ``transform`` lambda.

``struct_mode`` semantics (reference ``docs/concepts/struct-modes.md``):
``"select"`` keeps ONLY the specified fields in spec order; ``"with_fields"``
adds/replaces specified fields and keeps all others. Sibling references see
the ORIGINAL struct, not transformed siblings (reference
``expressions.py:270-274``) — ``withField`` chains built from the original
column reference naturally match this.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Literal, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DataType, StructType

from polars_nexpresso_spark.columns import qcol, quote_name

StructMode = Literal["select", "with_fields"]


class StructFunction:
    """A field spec whose callable receives the PARENT struct column.

    Lets a new/replaced field reference original sibling fields::

        {"c": {"y": {"z_doubled": struct_fn(lambda s: s["z"] * 2)}}}

    Spark analog of the reference's ``pl.field(...)`` expressions inside a
    struct spec (which reference the original struct, reference
    ``expressions.py:270-274``).
    """

    def __init__(self, fn: Callable[[Column], Column]) -> None:
        self.fn = fn


def struct_fn(fn: Callable[[Column], Column]) -> StructFunction:
    """Convenience constructor for :class:`StructFunction`."""
    return StructFunction(fn)


FieldValue = Union[
    None,
    dict,
    Callable[[Column], Column],
    Column,
    StructFunction,
]


def _field(base: Column, name: str) -> Column:
    """Struct-field access with the name treated literally."""
    return base.getField(name)


def _with_field(base: Column, name: str, value: Column) -> Column:
    if "." in name or "`" in name:
        return base.withField(quote_name(name), value)
    return base.withField(name, value)


class NestedExpressionBuilder:
    """Compile a nested dict spec into Spark Column expressions.

    Args:
        schema: ``StructType`` of the DataFrame the expressions target.
        struct_mode: ``"select"`` (keep only specified fields) or
            ``"with_fields"`` (keep all, add/modify specified).
    """

    def __init__(self, schema: StructType, struct_mode: StructMode = "select") -> None:
        if struct_mode not in ("select", "with_fields"):
            raise ValueError(
                f"Invalid struct_mode: {struct_mode}. Must be 'select' or 'with_fields'."
            )
        if not isinstance(schema, StructType):
            raise TypeError(f"schema must be a StructType, got {type(schema)}")
        self._schema = {f.name: f.dataType for f in schema.fields}
        self._struct_mode = struct_mode

    def build(self, fields: dict[str, FieldValue]) -> list[Column]:
        """Build a list of Column expressions from the field specification.

        Raises:
            ValueError: If a column doesn't exist or operations are invalid.
            TypeError: If a field value type is invalid.
        """
        return [
            self._process_top_level_field(col_name, field_spec)
            for col_name, field_spec in fields.items()
        ]

    def _process_top_level_field(self, col_name: str, field_spec: FieldValue) -> Column:
        base_expr = qcol(col_name)

        if col_name not in self._schema:
            if not isinstance(field_spec, Column):
                raise ValueError(
                    f"Column '{col_name}' not found in schema. "
                    "To create a new column, provide a Column expression."
                )
            return field_spec.alias(col_name)

        if field_spec is None:
            return base_expr
        if isinstance(field_spec, Column):
            return field_spec.alias(col_name)
        if isinstance(field_spec, StructFunction):
            raise TypeError(
                f"StructFunction is only valid inside a struct spec, not at the "
                f"top level (column '{col_name}'). Use a Callable or Column."
            )
        if callable(field_spec):
            return field_spec(base_expr).alias(col_name)
        if isinstance(field_spec, dict):
            col_type = self._schema[col_name]
            return self._process_nested_field(col_type, field_spec, base_expr).alias(
                col_name
            )
        raise TypeError(
            f"Invalid field specification type for '{col_name}': "
            f"{type(field_spec)}. Expected None, dict, Callable, or Column."
        )

    def _process_nested_field(
        self, dtype: DataType, field_spec: dict, base_expr: Column
    ) -> Column:
        """Dispatch a dict spec by dtype: arrays map element-wise via
        ``F.transform``; structs recurse field-by-field; scalars error."""
        if isinstance(dtype, ArrayType):
            # Covers both variable-length lists and the reference's fixed-size
            # pl.Array payloads — Spark has a single ArrayType (SURVEY §1.2).
            return F.transform(
                base_expr,
                lambda e: self._process_nested_field(dtype.elementType, field_spec, e),
            )
        if isinstance(dtype, StructType):
            return self._process_struct_field(dtype, field_spec, base_expr)
        raise ValueError(
            f"Cannot recurse into field with type {dtype.simpleString()}. "
            "Only struct and array types support nested operations."
        )

    def _process_struct_field(
        self, struct_dtype: StructType, field_spec: dict, base_expr: Column
    ) -> Column:
        schema_map = {f.name: f.dataType for f in struct_dtype.fields}

        transformed: dict[str, Column] = {}
        for field_name, sub_spec in field_spec.items():
            if sub_spec is None:
                if field_name not in schema_map:
                    raise ValueError(
                        f"Cannot select non-existent struct field '{field_name}'."
                    )
                continue  # keep existing field unchanged
            expr = self._build_field_expression(
                field_name, sub_spec, schema_map, base_expr
            )
            transformed[field_name] = expr

        if self._struct_mode == "select":
            # Keep ONLY the specified fields, in spec order.
            if not field_spec:
                raise ValueError(
                    "Empty field specification in 'select' mode would produce an "
                    "empty struct. Use 'with_fields' mode to keep the struct "
                    "unchanged."
                )
            selected: list[Column] = []
            for name in field_spec.keys():
                expr = transformed.get(name)
                if expr is None:
                    expr = _field(base_expr, name)
                selected.append(expr.alias(name))
            return F.struct(*selected)

        # with_fields mode: add/replace specified, keep all others.
        result = base_expr
        for name, expr in transformed.items():
            result = _with_field(result, name, expr)
        return result

    def _build_field_expression(
        self,
        field_name: str,
        field_spec: FieldValue,
        schema_map: dict[str, DataType],
        base_expr: Column,
    ) -> Column:
        field_base = _field(base_expr, field_name)

        if isinstance(field_spec, Column):
            # Used as-is; may reference outer columns or literals. Sibling
            # references require StructFunction (see module docstring).
            return field_spec
        if isinstance(field_spec, StructFunction):
            return field_spec.fn(base_expr)
        if callable(field_spec):
            if field_name not in schema_map:
                raise ValueError(
                    f"Cannot apply function to non-existent field '{field_name}'. "
                    "Use a Column expression to create a new field."
                )
            return field_spec(field_base)
        if isinstance(field_spec, dict):
            if field_name not in schema_map:
                raise ValueError(
                    f"Cannot recurse into non-existent struct field '{field_name}'."
                )
            return self._process_nested_field(
                schema_map[field_name], field_spec, field_base
            )
        raise TypeError(
            f"Invalid field specification for '{field_name}': {type(field_spec)}"
        )


def generate_nested_exprs(
    fields: dict[str, FieldValue],
    schema: StructType | DataFrame,
    struct_mode: StructMode = "select",
) -> list[Column]:
    """Generate Column expressions for nested operations (convenience wrapper).

    ``schema`` may be a ``StructType`` or a DataFrame (whose ``.schema`` is
    used — metadata-only, no job runs).
    """
    if isinstance(schema, DataFrame):
        schema = schema.schema
    return NestedExpressionBuilder(schema, struct_mode).build(fields)


def apply_nested_operations(
    df: DataFrame,
    fields: dict[str, FieldValue],
    struct_mode: StructMode = "select",
    use_with_columns: bool = False,
) -> DataFrame:
    """Apply nested operations directly to a DataFrame.

    ``use_with_columns=True`` applies via ``withColumns`` (keeping
    unspecified columns); otherwise via ``select``.
    """
    exprs = generate_nested_exprs(fields, df.schema, struct_mode)
    if use_with_columns:
        named = dict(zip(fields.keys(), exprs))
        return df.withColumns(named)
    return df.select(*exprs)
