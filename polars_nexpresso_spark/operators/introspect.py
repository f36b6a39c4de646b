"""Introspection, discovery, and validation over Spark schemas.

Mixin for :class:`~polars_nexpresso_spark.operators.packer.HierarchicalPacker`
porting the reference's schema-walk operators (E1-E11 in SURVEY §2.E;
reference ``nexpresso/hierarchical_packer.py:421-936``, ``1667-1843``).
All methods here are metadata-only except :meth:`validate`, which runs one
aggregation job.
"""

from __future__ import annotations

from typing import Literal, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DataType, MapType, StructType

from polars_nexpresso_spark.columns import (
    DEFAULT_ESCAPE_CHAR,
    DEFAULT_SEPARATOR,
    qcol,
    split_path,
)
from polars_nexpresso_spark.plans.spec import (
    DiscoveredLevel,
    HierarchyValidationError,
    SchemaValidationResult,
)

SchemaInput = Union[StructType, DataFrame]


def _extract_schema(schema_or_frame: SchemaInput) -> StructType:
    """Extract a StructType from a DataFrame or pass a StructType through."""
    if isinstance(schema_or_frame, DataFrame):
        return schema_or_frame.schema
    return schema_or_frame


def _schema_names(schema: StructType) -> list[str]:
    return [f.name for f in schema.fields]


def _schema_map(schema: StructType) -> dict[str, DataType]:
    return {f.name: f.dataType for f in schema.fields}


def _unwrap_list(dtype: DataType) -> DataType:
    """Unwrap one ArrayType wrapper (Spark analog of unwrapping pl.List)."""
    return dtype.elementType if isinstance(dtype, ArrayType) else dtype


def _is_nested(dtype: DataType) -> bool:
    return isinstance(dtype, (ArrayType, StructType, MapType))


class IntrospectionMixin:
    """Hierarchy navigation + schema discovery/validation (SURVEY §2.E)."""

    # ------------------------------------------------------------------
    # Metadata accessors (E1-E3)
    # ------------------------------------------------------------------

    @property
    def level_names(self) -> list[str]:
        """All level names ordered root (coarsest) → leaf (finest)."""
        return [m.name for m in self._levels_meta]

    @property
    def root_level(self) -> str:
        """Name of the coarsest (root) level."""
        return self._levels_meta[0].name

    @property
    def leaf_level(self) -> str:
        """Name of the finest (leaf) level."""
        return self._levels_meta[-1].name

    def get_ancestor_levels(self, level: str) -> list[str]:
        """Ancestor level names above ``level``, ordered root → parent."""
        idx = self.spec.index_of(level)
        return [m.name for m in self._levels_meta[:idx]]

    def get_descendant_levels(self, level: str) -> list[str]:
        """Descendant level names below ``level``, ordered child → leaf."""
        idx = self.spec.index_of(level)
        return [m.name for m in self._levels_meta[idx + 1 :]]

    def get_level_keys(
        self,
        level: str,
        *,
        include_ancestors: bool = False,
        form: Literal["short", "long"] = "short",
    ) -> list[str]:
        """Identifying key column names for ``level``.

        ``include_ancestors=True`` forces long (qualified) form to avoid
        ambiguity between same-named keys at different levels.
        """
        meta = self._levels_meta[self.spec.index_of(level)]
        if include_ancestors:
            return list(meta.ancestor_keys) + list(meta.id_columns)
        if form == "long":
            return list(meta.id_columns)
        return [col[len(meta.prefix) :] for col in meta.id_columns]

    # ------------------------------------------------------------------
    # Schema-aware field extraction (E4-E6)
    # ------------------------------------------------------------------

    def get_level_fields(
        self,
        level: str,
        schema_or_frame: SchemaInput,
        *,
        form: Literal["short", "long"] = "short",
    ) -> list[str]:
        """All column/field names belonging to ``level`` in a schema.

        Handles both packed schemas (fields inside the level's
        ``array<struct>`` / ``struct`` column, excluding child-level fields)
        and flat schemas (prefix-matched top-level columns, excluding child
        prefixes).
        """
        schema = _extract_schema(schema_or_frame)
        meta = self._levels_meta[self.spec.index_of(level)]
        child_level_names = {m.name for m in self._levels_meta[meta.index + 1 :]}
        names = _schema_names(schema)
        types = _schema_map(schema)

        if meta.path in types:
            inner = _unwrap_list(types[meta.path])
            if isinstance(inner, StructType):
                fields: list[str] = []
                for f in inner.fields:
                    if f.name in child_level_names:
                        continue
                    fields.append(f"{meta.prefix}{f.name}" if form == "long" else f.name)
                return fields

        if not meta.prefix:
            return []

        result: list[str] = []
        for col in names:
            if not col.startswith(meta.prefix):
                continue
            remainder = col[len(meta.prefix) :]
            if any(
                remainder == n or remainder.startswith(n + self.separator)
                for n in child_level_names
            ):
                continue
            result.append(col if form == "long" else remainder)
        return result

    def infer_current_level(self, schema_or_frame: SchemaInput) -> str:
        """Infer which hierarchy level each row currently represents.

        The first level whose path column is array/struct means rows are at
        its parent level (or itself when root); otherwise the deepest level
        with flat prefix columns; otherwise ValueError.
        """
        schema = _extract_schema(schema_or_frame)
        types = _schema_map(schema)
        names = _schema_names(schema)

        for meta in self._levels_meta:
            dtype = types.get(meta.path)
            if dtype is None:
                continue
            if isinstance(dtype, (ArrayType, StructType)):
                if meta.index == 0:
                    return meta.name
                return self._levels_meta[meta.index - 1].name

        leaf_meta = self._levels_meta[-1]
        if leaf_meta.prefix and any(c.startswith(leaf_meta.prefix) for c in names):
            return leaf_meta.name

        for meta in reversed(self._levels_meta):
            if meta.prefix and any(c.startswith(meta.prefix) for c in names):
                return meta.name

        raise ValueError(
            "Cannot infer current level: the schema does not match any recognisable "
            f"hierarchy state. Schema columns: {names}"
        )

    def get_level_schema(
        self,
        level: str,
        schema_or_frame: SchemaInput,
    ) -> dict[str, DataType]:
        """Mapping of short field name → Spark DataType for ``level``."""
        schema = _extract_schema(schema_or_frame)
        meta = self._levels_meta[self.spec.index_of(level)]
        child_level_names = {m.name for m in self._levels_meta[meta.index + 1 :]}
        types = _schema_map(schema)

        if meta.path in types:
            inner = _unwrap_list(types[meta.path])
            if isinstance(inner, StructType):
                return {
                    f.name: f.dataType
                    for f in inner.fields
                    if f.name not in child_level_names
                }

        if not meta.prefix:
            return {}

        result: dict[str, DataType] = {}
        for f in schema.fields:
            if not f.name.startswith(meta.prefix):
                continue
            remainder = f.name[len(meta.prefix) :]
            if any(
                remainder == n or remainder.startswith(n + self.separator)
                for n in child_level_names
            ):
                continue
            result[remainder] = f.dataType
        return result

    def describe(self) -> str:
        """Human-readable summary of the hierarchy structure."""
        n = len(self._levels_meta)
        lines = [f'HierarchicalPacker (separator="{self.separator}")', f"  Levels ({n}):"]
        for meta in self._levels_meta:
            tags = []
            if meta.index == 0:
                tags.append("root")
            if meta.index == n - 1:
                tags.append("leaf")
            tag_str = f"  ({', '.join(tags)})" if tags else ""
            lines.append(f"    {meta.index}. {meta.name}{tag_str}")
            lines.append(f'       Path: "{meta.path}"')
            keys = (
                ", ".join(c[len(meta.prefix) :] for c in meta.id_columns)
                if meta.id_columns
                else "(none)"
            )
            lines.append(f"       Keys: {keys}")
            if meta.ancestor_keys:
                lines.append(f"       Ancestor keys: {', '.join(meta.ancestor_keys)}")
        return "\n".join(lines)

    # ------------------------------------------------------------------
    # Hierarchy discovery (E8)
    # ------------------------------------------------------------------

    @staticmethod
    def _discover_from_struct(
        dtype: StructType,
        parent_path: tuple[str, ...],
        levels: dict[tuple[str, ...], set[str]],
        packed_paths: set[tuple[str, ...]],
    ) -> None:
        for f in dtype.fields:
            inner = _unwrap_list(f.dataType)
            if isinstance(inner, StructType) and inner.fields:
                child_path = parent_path + (f.name,)
                levels.setdefault(child_path, set())
                packed_paths.add(child_path)
                IntrospectionMixin._discover_from_struct(
                    inner, child_path, levels, packed_paths
                )
            else:
                levels[parent_path].add(f.name)

    @staticmethod
    def discover_levels(
        schema_or_frame: SchemaInput,
        *,
        separator: str = DEFAULT_SEPARATOR,
        escape_char: str = DEFAULT_ESCAPE_CHAR,
    ) -> list[DiscoveredLevel]:
        """Infer hierarchy levels from a schema without a spec.

        Splits dotted column names (escape-aware) and recurses into
        ``array<struct>`` / ``struct`` columns; implied intermediate levels
        are created. Sorted by depth then name.
        """
        schema = _extract_schema(schema_or_frame)
        levels: dict[tuple[str, ...], set[str]] = {}
        packed_paths: set[tuple[str, ...]] = set()

        for f in schema.fields:
            parts = split_path(f.name, separator, escape_char)
            inner = _unwrap_list(f.dataType)
            if isinstance(inner, StructType) and inner.fields:
                level_path = tuple(parts)
                levels.setdefault(level_path, set())
                packed_paths.add(level_path)
                IntrospectionMixin._discover_from_struct(
                    inner, level_path, levels, packed_paths
                )
            elif len(parts) >= 2:
                level_path = tuple(parts[:-1])
                levels.setdefault(level_path, set()).add(parts[-1])
            # single-component scalar column — not hierarchical, skip

        for path in list(levels.keys()):
            for i in range(1, len(path)):
                levels.setdefault(path[:i], set())

        if not levels:
            return []

        result: list[DiscoveredLevel] = []
        for path_tuple in sorted(levels.keys(), key=lambda p: (len(p), p)):
            result.append(
                DiscoveredLevel(
                    name=path_tuple[-1],
                    depth=len(path_tuple) - 1,
                    path=separator.join(path_tuple),
                    fields=tuple(sorted(levels[path_tuple])),
                    parent=path_tuple[-2] if len(path_tuple) > 1 else None,
                    is_packed=path_tuple in packed_paths,
                )
            )
        return result

    # ------------------------------------------------------------------
    # Validation (E9-E11)
    # ------------------------------------------------------------------

    def validate(
        self,
        frame: DataFrame,
        *,
        level: str | None = None,
        raise_on_error: bool = True,
    ) -> list[HierarchyValidationError]:
        """Data validation: key columns must not contain nulls.

        Unlike the reference (one job per key column, reference
        ``hierarchical_packer.py:1704``), all null counts are computed in a
        single aggregation pass — one job regardless of hierarchy width,
        which matters at scale.
        """
        errors: list[HierarchyValidationError] = []
        schema_names = set(frame.columns)

        levels_to_check = self._levels_meta
        if level:
            levels_to_check = [self._levels_meta[self.spec.index_of(level)]]

        checks: list[tuple[str, str]] = []  # (level_name, key_col)
        for meta in levels_to_check:
            for key_col in meta.id_columns:
                if key_col in schema_names:
                    checks.append((meta.name, key_col))

        if not checks:
            return errors

        agg_exprs = [
            F.sum(qcol(col).isNull().cast("long")).alias(f"__nulls_{i}")
            for i, (_, col) in enumerate(checks)
        ]
        row = frame.agg(*agg_exprs).collect()[0]

        for i, (level_name, key_col) in enumerate(checks):
            null_count = row[f"__nulls_{i}"] or 0
            if null_count > 0:
                error = HierarchyValidationError(
                    f"Key column '{key_col}' contains {null_count} null values. "
                    "Key columns must not be null unless the entire entity is null.",
                    level=level_name,
                    details={"column": key_col, "null_count": null_count},
                )
                if raise_on_error:
                    raise error
                errors.append(error)
        return errors

    def validate_schema(
        self,
        schema_or_frame: SchemaInput,
        *,
        expected_level: str | None = None,
    ) -> SchemaValidationResult:
        """Structural validation of a schema against this packer's spec.

        No data is inspected; see :meth:`validate` for data checks.
        """
        schema = _extract_schema(schema_or_frame)
        types = _schema_map(schema)
        errors: list[str] = []
        warnings: list[str] = []
        present: list[str] = []
        missing: list[str] = []

        inferred_level: str | None = None
        try:
            inferred_level = self.infer_current_level(schema)
        except ValueError:
            warnings.append(
                "Could not infer current packing level from schema. "
                f"Schema columns: {list(types.keys())}"
            )

        if expected_level is not None and inferred_level is not None:
            if expected_level != inferred_level:
                errors.append(
                    f"Expected data at level '{expected_level}' but inferred "
                    f"level is '{inferred_level}'."
                )

        for meta in self._levels_meta:
            level_found = False

            flat_id_found: list[str] = []
            flat_id_missing: list[str] = []
            for id_col in meta.id_columns:
                if id_col in types:
                    flat_id_found.append(id_col)
                    if _is_nested(types[id_col]):
                        errors.append(
                            f"[Level: {meta.name}] Key column '{id_col}' has "
                            f"type {types[id_col].simpleString()} but expected a "
                            "scalar type."
                        )
                else:
                    flat_id_missing.append(id_col)

            if flat_id_found:
                level_found = True
                if flat_id_missing:
                    warnings.append(
                        f"[Level: {meta.name}] Some key columns missing from flat "
                        f"schema: {flat_id_missing}. Found: {flat_id_found}."
                    )

            if meta.path in types:
                dtype = types[meta.path]
                inner = _unwrap_list(dtype)
                if isinstance(inner, StructType) and inner.fields:
                    level_found = True
                    struct_field_names = {f.name for f in inner.fields}
                    short_ids = [c[len(meta.prefix) :] for c in meta.id_columns]
                    missing_ids = [s for s in short_ids if s not in struct_field_names]
                    if missing_ids:
                        errors.append(
                            f"[Level: {meta.name}] Packed column '{meta.path}' "
                            f"is missing expected key fields: {missing_ids}. "
                            f"Struct fields: {sorted(struct_field_names)}."
                        )
                elif not flat_id_found:
                    warnings.append(
                        f"[Level: {meta.name}] Column '{meta.path}' exists but "
                        f"has type {dtype.simpleString()}, expected array<struct> "
                        "or struct."
                    )

            if level_found:
                present.append(meta.name)
            else:
                missing.append(meta.name)

        if not present:
            errors.append(
                "No hierarchy levels found in schema. Expected columns with prefix "
                f"patterns like: {[m.prefix for m in self._levels_meta[:3]]}..."
            )

        return SchemaValidationResult(
            is_compatible=len(errors) == 0,
            inferred_level=inferred_level,
            present_levels=present,
            missing_levels=missing,
            errors=errors,
            warnings=warnings,
        )

    def get_level_columns(self, level: str) -> list[str]:
        """Qualified id + required columns of a level."""
        meta = self._levels_meta[self.spec.index_of(level)]
        return list(meta.id_columns) + list(meta.required_columns)
