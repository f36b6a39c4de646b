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

    # ===== Metadata accessors (E1-E3) =====

    @property
    def level_names(self) -> list[str]:
        """Every level name, coarsest first, finest last."""
        return [lvl.name for lvl in self._levels_meta]

    @property
    def root_level(self) -> str:
        """The coarsest level's name."""
        return self.level_names[0]

    @property
    def leaf_level(self) -> str:
        """The finest level's name."""
        return self.level_names[-1]

    def get_ancestor_levels(self, level: str) -> list[str]:
        """Level names strictly above ``level`` (root first)."""
        return self.level_names[: self.spec.index_of(level)]

    def get_descendant_levels(self, level: str) -> list[str]:
        """Level names strictly below ``level`` (nearest child first)."""
        return self.level_names[self.spec.index_of(level) + 1 :]

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
        own = list(meta.id_columns)
        if include_ancestors:
            return [*meta.ancestor_keys, *own]
        if form == "long":
            return own
        return [c[len(meta.prefix) :] for c in own]

    # ===== Schema-aware field extraction (E4-E6) =====

    def _level_members(
        self, level: str, schema: StructType
    ) -> tuple[list[tuple[str, DataType]], "object"]:
        """Shared walker behind :meth:`get_level_fields` /
        :meth:`get_level_schema`: the (short name, dtype) pairs owned by
        ``level``, from whichever representation the schema is in.

        Packed form (the level's path column is ``array<struct>`` or
        ``struct``) wins; child-level struct fields / child-prefixed flat
        columns are never part of the parent level.
        """
        meta = self._levels_meta[self.spec.index_of(level)]
        children = {m.name for m in self._levels_meta[meta.index + 1 :]}
        by_name = _schema_map(schema)

        packed = by_name.get(meta.path)
        if packed is not None:
            inner = _unwrap_list(packed)
            if isinstance(inner, StructType):
                pairs = [
                    (f.name, f.dataType)
                    for f in inner.fields
                    if f.name not in children
                ]
                return pairs, meta

        pairs = []
        if meta.prefix:
            child_prefixes = tuple(c + self.separator for c in children)
            for f in schema.fields:
                if not f.name.startswith(meta.prefix):
                    continue
                short = f.name[len(meta.prefix) :]
                if short in children or short.startswith(child_prefixes):
                    continue
                pairs.append((short, f.dataType))
        return pairs, meta

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
        pairs, meta = self._level_members(level, _extract_schema(schema_or_frame))
        if form == "long":
            return [f"{meta.prefix}{short}" for short, _ in pairs]
        return [short for short, _ in pairs]

    def get_level_schema(
        self,
        level: str,
        schema_or_frame: SchemaInput,
    ) -> dict[str, DataType]:
        """Mapping of short field name → Spark DataType for ``level``."""
        pairs, _ = self._level_members(level, _extract_schema(schema_or_frame))
        return dict(pairs)

    def infer_current_level(self, schema_or_frame: SchemaInput) -> str:
        """Infer which hierarchy level each row currently represents.

        The first level whose path column is array/struct means rows are at
        its parent level (or itself when root); otherwise the deepest level
        with flat prefix columns; otherwise ValueError.
        """
        schema = _extract_schema(schema_or_frame)
        by_name = _schema_map(schema)

        # Packed evidence wins: the shallowest struct-like path column
        # says rows sit one level above it (at itself when root).
        for meta in self._levels_meta:
            if isinstance(by_name.get(meta.path), (ArrayType, StructType)):
                return self._levels_meta[max(meta.index - 1, 0)].name

        # Flat evidence: the deepest level with any prefixed column.
        flat_hits = [
            m
            for m in self._levels_meta
            if m.prefix and any(c.startswith(m.prefix) for c in by_name)
        ]
        if flat_hits:
            return flat_hits[-1].name

        raise ValueError(
            "Cannot infer current level: the schema does not match any recognisable "
            f"hierarchy state. Schema columns: {list(by_name)}"
        )

    def describe(self) -> str:
        """Human-readable summary of the hierarchy structure."""
        last = len(self._levels_meta) - 1

        def block(meta) -> list[str]:
            tags = [t for t, hit in (("root", meta.index == 0), ("leaf", meta.index == last)) if hit]
            shorts = [c[len(meta.prefix) :] for c in meta.id_columns]
            out = [
                f"    {meta.index}. {meta.name}"
                + (f"  ({', '.join(tags)})" if tags else ""),
                f'       Path: "{meta.path}"',
                f"       Keys: {', '.join(shorts) if shorts else '(none)'}",
            ]
            if meta.ancestor_keys:
                out.append(
                    f"       Ancestor keys: {', '.join(meta.ancestor_keys)}"
                )
            return out

        header = [
            f'HierarchicalPacker (separator="{self.separator}")',
            f"  Levels ({last + 1}):",
        ]
        return "\n".join(
            header + [ln for m in self._levels_meta for ln in block(m)]
        )

    # ===== Hierarchy discovery (E8) =====

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
        fields_at: dict[tuple[str, ...], set[str]] = {}
        packed_at: set[tuple[str, ...]] = set()

        def note(path: tuple[str, ...], field: str | None = None) -> None:
            bucket = fields_at.setdefault(path, set())
            if field is not None:
                bucket.add(field)

        def walk(struct: StructType, at: tuple[str, ...]) -> None:
            note(at)
            packed_at.add(at)
            for f in struct.fields:
                body = _unwrap_list(f.dataType)
                if isinstance(body, StructType) and body.fields:
                    walk(body, at + (f.name,))
                else:
                    note(at, f.name)

        for f in schema.fields:
            head = tuple(split_path(f.name, separator, escape_char))
            body = _unwrap_list(f.dataType)
            if isinstance(body, StructType) and body.fields:
                walk(body, head)
            elif len(head) > 1:
                note(head[:-1], head[-1])
            # single-component scalar column — not hierarchical, skip

        # Materialize implied intermediate levels (a.b.c implies a and a.b)
        for path in list(fields_at):
            for depth in range(1, len(path)):
                note(path[:depth])

        def entry(path: tuple[str, ...]) -> DiscoveredLevel:
            return DiscoveredLevel(
                name=path[-1],
                depth=len(path) - 1,
                path=separator.join(path),
                fields=tuple(sorted(fields_at[path])),
                parent=path[-2] if len(path) > 1 else None,
                is_packed=path in packed_at,
            )

        ordered = sorted(fields_at, key=lambda p: (len(p), p))
        return [entry(p) for p in ordered]

    # ===== Validation (E9-E11) =====

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
        scope = (
            [self._levels_meta[self.spec.index_of(level)]]
            if level
            else list(self._levels_meta)
        )
        available = set(frame.columns)
        checks = [
            (m.name, key)
            for m in scope
            for key in m.id_columns
            if key in available
        ]
        if not checks:
            return []

        counts = frame.agg(
            *(
                F.sum(qcol(key).isNull().cast("long")).alias(f"__nulls_{i}")
                for i, (_, key) in enumerate(checks)
            )
        ).collect()[0]

        errors: list[HierarchyValidationError] = []
        for i, (level_name, key) in enumerate(checks):
            n_null = counts[f"__nulls_{i}"] or 0
            if not n_null:
                continue
            problem = HierarchyValidationError(
                f"Key column '{key}' contains {n_null} null values. "
                "Key columns must not be null unless the entire entity is null.",
                level=level_name,
                details={"column": key, "null_count": n_null},
            )
            if raise_on_error:
                raise problem
            errors.append(problem)
        return errors

    @staticmethod
    def _flat_key_findings(
        meta, by_name: dict[str, DataType]
    ) -> tuple[bool, list[str], list[str]]:
        """Flat-form evidence for one level: (found?, errors, warnings)."""
        hit = [c for c in meta.id_columns if c in by_name]
        errs = [
            f"[Level: {meta.name}] Key column '{c}' has "
            f"type {by_name[c].simpleString()} but expected a scalar type."
            for c in hit
            if _is_nested(by_name[c])
        ]
        warns: list[str] = []
        absent = [c for c in meta.id_columns if c not in by_name]
        if hit and absent:
            warns.append(
                f"[Level: {meta.name}] Some key columns missing from flat "
                f"schema: {absent}. Found: {hit}."
            )
        return bool(hit), errs, warns

    @staticmethod
    def _packed_findings(
        meta, by_name: dict[str, DataType], flat_found: bool
    ) -> tuple[bool, list[str], list[str]]:
        """Packed-form evidence for one level: (found?, errors, warnings)."""
        dtype = by_name.get(meta.path)
        if dtype is None:
            return False, [], []
        inner = _unwrap_list(dtype)
        if not (isinstance(inner, StructType) and inner.fields):
            warns = (
                []
                if flat_found
                else [
                    f"[Level: {meta.name}] Column '{meta.path}' exists but "
                    f"has type {dtype.simpleString()}, expected array<struct> "
                    "or struct."
                ]
            )
            return False, [], warns
        have = {f.name for f in inner.fields}
        want = [c[len(meta.prefix) :] for c in meta.id_columns]
        lost = [s for s in want if s not in have]
        errs = (
            [
                f"[Level: {meta.name}] Packed column '{meta.path}' "
                f"is missing expected key fields: {lost}. "
                f"Struct fields: {sorted(have)}."
            ]
            if lost
            else []
        )
        return True, errs, []

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
        by_name = _schema_map(schema)
        errors: list[str] = []
        warnings: list[str] = []

        inferred_level: str | None = None
        try:
            inferred_level = self.infer_current_level(schema)
        except ValueError:
            warnings.append(
                "Could not infer current packing level from schema. "
                f"Schema columns: {list(by_name)}"
            )
        if expected_level and inferred_level and expected_level != inferred_level:
            errors.append(
                f"Expected data at level '{expected_level}' but inferred "
                f"level is '{inferred_level}'."
            )

        present: list[str] = []
        missing: list[str] = []
        for meta in self._levels_meta:
            flat_ok, errs, warns = self._flat_key_findings(meta, by_name)
            packed_ok, p_errs, p_warns = self._packed_findings(
                meta, by_name, flat_ok
            )
            errors += errs + p_errs
            warnings += warns + p_warns
            (present if flat_ok or packed_ok else missing).append(meta.name)

        if not present:
            sample_prefixes = [lvl.prefix for lvl in self._levels_meta[:3]]
            errors.append(
                "No hierarchy levels found in schema. Expected columns with prefix "
                f"patterns like: {sample_prefixes}..."
            )

        return SchemaValidationResult(
            inferred_level=inferred_level,
            present_levels=present,
            missing_levels=missing,
            errors=errors,
            warnings=warnings,
            is_compatible=not errors,
        )

    def get_level_columns(self, level: str) -> list[str]:
        """Qualified id + required columns of a level."""
        meta = self._levels_meta[self.spec.index_of(level)]
        return list(meta.id_columns) + list(meta.required_columns)
