"""Hierarchy specification: levels, metadata, errors, result types.

Pure-Python (no SparkSession required) port of the declarative layer of the
reference (``nexpresso/hierarchical_packer.py:97-352``): ``LevelSpec``,
``HierarchySpec``, ``LevelMetadata``, ``LevelAttribute``, ``DiscoveredLevel``,
``SchemaValidationResult``, and ``HierarchyValidationError``. The hierarchy is
a strict tree of levels ordered coarse → fine; all engine behavior is driven
by these specs.

Differences from the reference, driven by Spark:

- ``id_fields`` / ``required_fields`` entries may be plain strings
  (level-relative names), ``(alias, Column)`` tuples, or aliased
  ``pyspark.sql.Column`` expressions. Spark does not expose an expression's
  output name through a stable public API, so the tuple form is the
  recommended way to declare computed key columns; a bare aliased Column is
  accepted on a best-effort basis (the alias is parsed from the column's
  string representation).
- ``order_by`` entries are ``pyspark.sql.Column`` expressions over the
  qualified (dotted) flat column names.
"""

from __future__ import annotations

import re
from collections.abc import Mapping, Sequence
from dataclasses import dataclass, field
from typing import Literal, Union

from pyspark.sql import Column

from polars_nexpresso_spark.columns import (
    DEFAULT_ESCAPE_CHAR,
    DEFAULT_SEPARATOR,
    escape_field,
)

ColumnSelector = Union[str, Column, tuple[str, Column]]
ExtraColumnsMode = Literal["preserve", "drop", "error"]
ParentStrategy = Literal["aggregate", "split_join", "auto"]
PromoteAggregation = Literal[
    "list", "set", "sum", "mean", "min", "max", "first", "last", "count", "single"
]

_ALIAS_RE = re.compile(r"\sAS\s`?([^'`]+?)`?'?>?$")


def column_alias(col: Column) -> str | None:
    """Best-effort extraction of the output name of an aliased Column.

    ``str(Column)`` renders like ``Column<'(x * 2) AS pop2'>``; we parse the
    trailing alias. Returns None when no alias is present.
    """
    m = _ALIAS_RE.search(str(col))
    return m.group(1) if m else None


class HierarchyValidationError(Exception):
    """Raised when hierarchy validation fails.

    Attributes:
        level: The hierarchy level where the error occurred (or None).
        details: Additional context about the error.
    """

    def __init__(
        self, message: str, level: str | None = None, details: dict | None = None
    ) -> None:
        self.level = level
        self.details = details or {}
        prefix = f"[Level: {level}] " if level else ""
        super().__init__(f"{prefix}{message}")


@dataclass(frozen=True)
class LevelSpec:
    """Declarative description of one hierarchy level.

    Args:
        name: Logical identifier (e.g. ``"country"``); the column path follows
            the coarse→fine ordering of levels in :class:`HierarchySpec`.
        id_fields: Columns (level-relative names) or computed expressions that
            uniquely identify records at this level. Computed entries must be
            ``(alias, Column)`` tuples or aliased Columns.
        required_fields: Columns that must be non-null when emitting standalone
            tables via ``split_levels``.
        order_by: Column expressions (or qualified column-name strings,
            resolved lazily at pack time) enforcing deterministic child
            ordering inside the parent's list column.
        parent_keys: FK column names in this level's raw table linking to the
            parent's ``id_fields`` (positionally matched); used by
            ``build_from_tables``.
    """

    name: str
    id_fields: Sequence[ColumnSelector] = ()
    required_fields: Sequence[ColumnSelector] | None = None
    order_by: Sequence[Column] | None = None
    parent_keys: Sequence[str] | None = None


@dataclass(frozen=True)
class LevelMetadata:
    """Derived per-level metadata, computed once per packer instance."""

    index: int
    name: str
    path: str
    prefix: str
    ancestor_keys: tuple[str, ...]
    id_columns: tuple[str, ...]
    id_exprs: tuple[Column, ...]
    required_columns: tuple[str, ...]
    required_exprs: tuple[Column, ...]
    order_by: tuple[Column, ...]


@dataclass(frozen=True)
class LevelAttribute:
    """Spec of an attribute derived from a level, for ``enrich``.

    Args:
        attribute: Field name at ``from_level`` (unqualified).
        from_level: Level where the attribute lives (target level or a
            descendant).
        agg: Aggregation applied when rolling up; defaults to ``"list"``.
        alias: Output column name (unqualified); defaults to ``attribute``.
    """

    attribute: str
    from_level: str
    agg: PromoteAggregation = "list"
    alias: str | None = None


@dataclass(frozen=True)
class DiscoveredLevel:
    """A hierarchy level inferred from schema inspection (``discover_levels``)."""

    name: str
    depth: int
    path: str
    fields: tuple[str, ...]
    parent: str | None
    is_packed: bool = False


@dataclass(frozen=True)
class SchemaValidationResult:
    """Result of structural schema validation (``validate_schema``)."""

    is_compatible: bool
    inferred_level: str | None
    present_levels: list[str]
    missing_levels: list[str]
    errors: list[str]
    warnings: list[str]


@dataclass(frozen=True)
class HierarchySpec:
    """Ordered collection of levels, coarse → fine.

    Args:
        levels: LevelSpec objects from root to leaf.
        key_aliases: ``{target_column: source_column}`` — missing target key
            columns are cloned from source columns before packing.
    """

    levels: Sequence[LevelSpec]
    key_aliases: Mapping[str, str] = field(default_factory=dict)

    def __post_init__(self) -> None:
        names = [lvl.name for lvl in self.levels]
        if len(names) != len(set(names)):
            raise ValueError("Level names must be unique inside a HierarchySpec.")

    @classmethod
    def from_levels(
        cls, *levels: LevelSpec, key_aliases: Mapping[str, str] | None = None
    ) -> HierarchySpec:
        """Build a spec, validating parent_keys arity against parent id_fields."""
        for i, level in enumerate(levels):
            if i == 0:
                if level.parent_keys:
                    raise ValueError(
                        f"Root level '{level.name}' should not have parent_keys defined."
                    )
            else:
                parent = levels[i - 1]
                if level.parent_keys and len(level.parent_keys) != len(parent.id_fields):
                    raise ValueError(
                        f"Level '{level.name}' has {len(level.parent_keys)} parent_keys "
                        f"but parent '{parent.name}' has {len(parent.id_fields)} "
                        "id_fields. These must match."
                    )
        return cls(levels=list(levels), key_aliases=key_aliases or {})

    @property
    def levels_by_name(self) -> Mapping[str, LevelSpec]:
        return {level.name: level for level in self.levels}

    def index_of(self, level_name: str) -> int:
        for idx, level in enumerate(self.levels):
            if level.name == level_name:
                return idx
        raise KeyError(f"Level '{level_name}' not found in hierarchy.")

    def level(self, level_name: str) -> LevelSpec:
        return self.levels[self.index_of(level_name)]

    def next_level(self, level_name: str) -> LevelSpec | None:
        idx = self.index_of(level_name)
        if idx + 1 >= len(self.levels):
            return None
        return self.levels[idx + 1]


def resolve_selector(
    selector: ColumnSelector,
    level_name: str,
    qualify: "callable",
) -> tuple[str, Column | None]:
    """Resolve one id/required field selector into (qualified_name, expr|None).

    Strings are qualified with the level path; ``(alias, Column)`` tuples and
    aliased Columns yield computed columns materialized before packing.
    """
    if isinstance(selector, tuple):
        alias, expr = selector
        return alias, expr.alias(alias)
    if isinstance(selector, Column):
        alias = column_alias(selector)
        if alias is None:
            raise ValueError(
                f"Expression provided for level '{level_name}' must have an alias: "
                "use (name, Column) or Column.alias(name)."
            )
        return alias, selector
    return qualify(selector), None


def build_metadata(
    spec: HierarchySpec,
    separator: str = DEFAULT_SEPARATOR,
    escape_char: str = DEFAULT_ESCAPE_CHAR,
) -> list[LevelMetadata]:
    """Compute per-level metadata (paths, prefixes, ancestor keys).

    ``ancestor_keys`` for a level is the concatenation of all coarser levels'
    qualified id columns — it is the pack group-by key (reference
    ``hierarchical_packer.py:2571-2603``).
    """
    metas: list[LevelMetadata] = []
    path_components: list[str] = []
    ancestor_keys: list[str] = []

    for index, level in enumerate(spec.levels):
        # Escape level names so a name containing the separator cannot
        # produce a path that splits differently than it was built
        # (keeps build_metadata consistent with join_path/_qualify_field).
        path_components.append(escape_field(level.name, separator, escape_char))
        path = separator.join(path_components)
        prefix = f"{path}{separator}" if path else ""

        def qualify(fname: str, _prefix: str = prefix) -> str:
            return f"{_prefix}{escape_field(fname, separator, escape_char)}"

        id_columns: list[str] = []
        id_exprs: list[Column] = []
        for sel in level.id_fields:
            name, expr = resolve_selector(sel, level.name, qualify)
            id_columns.append(name)
            if expr is not None:
                id_exprs.append(expr)

        required_columns: list[str] = []
        required_exprs: list[Column] = []
        for sel in level.required_fields or ():
            name, expr = resolve_selector(sel, level.name, qualify)
            required_columns.append(name)
            if expr is not None:
                required_exprs.append(expr)

        metas.append(
            LevelMetadata(
                index=index,
                name=level.name,
                path=path,
                prefix=prefix,
                ancestor_keys=tuple(ancestor_keys),
                id_columns=tuple(id_columns),
                id_exprs=tuple(id_exprs),
                required_columns=tuple(required_columns),
                required_exprs=tuple(required_exprs),
                order_by=tuple(level.order_by or ()),
            )
        )
        ancestor_keys.extend(id_columns)

    return metas
