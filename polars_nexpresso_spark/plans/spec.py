"""Hierarchy specification: levels, metadata, errors, result types.

Pure-Python (no SparkSession required) declarative layer matching the
reference's spec surface (``nexpresso/hierarchical_packer.py:97-352``):
``LevelSpec``, ``HierarchySpec``, ``LevelMetadata``, ``LevelAttribute``,
``DiscoveredLevel``, ``SchemaValidationResult``, and
``HierarchyValidationError``. A hierarchy is a strict tree of levels
ordered coarse → fine; every engine behavior is driven by these specs.

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
# Alphabetical; the engine's dispatch tables (operators/crosslevel.py)
# define the semantics of each entry.
PromoteAggregation = Literal[
    "count", "first", "last", "list", "max", "mean", "min", "set", "single", "sum"
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
    """Validation failure anywhere in the hierarchy engine.

    Carries the offending ``level`` (when known) and a free-form
    ``details`` dict for programmatic inspection; the rendered message
    gains a ``[Level: <name>]`` prefix whenever a level is attached.
    """

    def __init__(
        self, message: str, level: str | None = None, details: dict | None = None
    ) -> None:
        tag = f"[Level: {level}] " if level else ""
        super().__init__(tag + message)
        self.level = level
        self.details = {} if details is None else details


@dataclass(frozen=True)
class LevelSpec:
    """Declarative description of one hierarchy level.

    Strings in ``id_fields`` / ``required_fields`` are level-relative
    column names (qualified with the level path at metadata-build time);
    computed entries must be ``(alias, Column)`` tuples or aliased
    Columns. ``order_by`` pins deterministic child ordering inside the
    parent's list column. ``parent_keys`` are this level's FK columns
    linking to the parent's ``id_fields`` (positionally matched) — only
    ``build_from_tables`` reads them.
    """

    # logical identifier, e.g. "country"; its slot in HierarchySpec
    # (coarse → fine) determines the dotted column path
    name: str
    # what uniquely identifies a record at this level
    id_fields: Sequence[ColumnSelector] = ()
    # must be non-null when split_levels emits standalone tables
    required_fields: Sequence[ColumnSelector] | None = None
    # child-sort expressions over qualified flat names (resolved lazily)
    order_by: Sequence[Column] | None = None
    # FKs to the parent level, for build_from_tables
    parent_keys: Sequence[str] | None = None


@dataclass(frozen=True)
class LevelMetadata:
    """Derived per-level facts, computed once per packer instance."""

    # position in the coarse → fine ordering
    index: int
    # the LevelSpec name
    name: str
    # dotted path from the root, e.g. "country.city"
    path: str
    # path + separator — what this level's flat columns start with
    prefix: str
    # qualified id columns of every coarser level: the pack group key
    ancestor_keys: tuple[str, ...]
    # qualified names of this level's own id columns
    id_columns: tuple[str, ...]
    # computed-key expressions to materialize before packing
    id_exprs: tuple[Column, ...]
    # qualified names of the split_levels non-null columns
    required_columns: tuple[str, ...]
    # computed required-field expressions
    required_exprs: tuple[Column, ...]
    # child ordering inside the parent's list column
    order_by: tuple[Column, ...]


@dataclass(frozen=True)
class LevelAttribute:
    """Spec of an attribute derived from a level, for ``enrich``."""

    # field name at from_level (unqualified)
    attribute: str
    # where the attribute lives: the target level or a descendant
    from_level: str
    # roll-up aggregation
    agg: PromoteAggregation = "list"
    # output column name (unqualified); attribute when None
    alias: str | None = None


@dataclass(frozen=True)
class DiscoveredLevel:
    """A hierarchy level inferred by ``discover_levels`` schema inspection."""

    # inferred level name (the last path component)
    name: str
    # zero-based tree depth, 0 = root
    depth: int
    # full separator-joined path from the root
    path: str
    # non-level scalar field names found at this level
    fields: tuple[str, ...]
    # parent level name; None at the root
    parent: str | None
    # True when found inside array<struct>/struct rather than flat names
    is_packed: bool = False


@dataclass(frozen=True)
class SchemaValidationResult:
    """Outcome of structural schema validation (``validate_schema``)."""

    # usable with this packer at all?
    is_compatible: bool
    # packing level inferred from the schema; None if inference failed
    inferred_level: str | None
    # level names whose columns/fields were found
    present_levels: list[str]
    # level names whose expected columns are absent
    missing_levels: list[str]
    # fatal incompatibilities, human-readable
    errors: list[str]
    # non-fatal notes (e.g. missing optional fields)
    warnings: list[str]


@dataclass(frozen=True)
class HierarchySpec:
    """Ordered collection of levels, coarse → fine.

    ``key_aliases`` maps ``{target_column: source_column}``: missing
    target key columns are cloned from source columns before packing.
    """

    levels: Sequence[LevelSpec]
    key_aliases: Mapping[str, str] = field(default_factory=dict)

    def __post_init__(self) -> None:
        # Name → index lookup, built once; doubles as the uniqueness check.
        slots: dict[str, int] = {}
        for pos, lvl in enumerate(self.levels):
            if lvl.name in slots:
                raise ValueError(
                    "Level names must be unique inside a HierarchySpec."
                )
            slots[lvl.name] = pos
        object.__setattr__(self, "_slots", slots)

    @classmethod
    def from_levels(
        cls, *levels: LevelSpec, key_aliases: Mapping[str, str] | None = None
    ) -> HierarchySpec:
        """Build a spec, validating parent_keys arity against parent id_fields."""
        if levels and levels[0].parent_keys:
            raise ValueError(
                f"Root level '{levels[0].name}' should not have "
                "parent_keys defined."
            )
        for parent, child in zip(levels, levels[1:]):
            fks = child.parent_keys
            if fks and len(fks) != len(parent.id_fields):
                raise ValueError(
                    f"Level '{child.name}' has {len(fks)} parent_keys but "
                    f"parent '{parent.name}' has {len(parent.id_fields)} "
                    "id_fields. These must match."
                )
        return cls(list(levels), dict(key_aliases or {}))

    @property
    def levels_by_name(self) -> Mapping[str, LevelSpec]:
        return {lvl.name: lvl for lvl in self.levels}

    def index_of(self, level_name: str) -> int:
        try:
            return self._slots[level_name]  # type: ignore[attr-defined]
        except KeyError:
            raise KeyError(
                f"Level '{level_name}' not found in hierarchy."
            ) from None

    def level(self, level_name: str) -> LevelSpec:
        return self.levels[self.index_of(level_name)]

    def next_level(self, level_name: str) -> LevelSpec | None:
        below = self.index_of(level_name) + 1
        return self.levels[below] if below < len(self.levels) else None


def resolve_selector(
    selector: ColumnSelector,
    level_name: str,
    qualify: "callable",
) -> tuple[str, Column | None]:
    """Resolve one id/required field selector into (qualified_name, expr|None).

    Strings are qualified with the level path; ``(alias, Column)`` tuples and
    aliased Columns yield computed columns materialized before packing.
    """
    if isinstance(selector, str):
        return qualify(selector), None
    if isinstance(selector, tuple):
        alias, expr = selector
    else:
        alias = column_alias(selector)
        if alias is None:
            raise ValueError(
                f"Expression provided for level '{level_name}' must have "
                "an alias: use (name, Column) or Column.alias(name)."
            )
        return alias, selector
    return alias, expr.alias(alias)


def _resolved(
    selectors: Sequence[ColumnSelector],
    level_name: str,
    qualify: "callable",
) -> tuple[tuple[str, ...], tuple[Column, ...]]:
    """Split selectors into (qualified names, computed expressions)."""
    names: list[str] = []
    computed: list[Column] = []
    for sel in selectors:
        name, expr = resolve_selector(sel, level_name, qualify)
        names.append(name)
        if expr is not None:
            computed.append(expr)
    return tuple(names), tuple(computed)


def build_metadata(
    spec: HierarchySpec,
    separator: str = DEFAULT_SEPARATOR,
    escape_char: str = DEFAULT_ESCAPE_CHAR,
) -> list[LevelMetadata]:
    """Compute per-level metadata (paths, prefixes, ancestor keys).

    ``ancestor_keys`` for a level is the concatenation of all coarser levels'
    qualified id columns — it is the pack group-by key (reference
    ``hierarchical_packer.py:2571-2603``). Level names are escaped into the
    path so a name containing the separator cannot produce a path that
    splits differently than it was built (keeps this consistent with
    ``join_path`` / ``_qualify_field``).
    """
    out: list[LevelMetadata] = []
    trail: list[str] = []  # escaped level names, root → current
    group_keys: list[str] = []  # qualified ids of all coarser levels

    for pos, lvl in enumerate(spec.levels):
        trail.append(escape_field(lvl.name, separator, escape_char))
        path = separator.join(trail)
        prefix = f"{path}{separator}" if path else ""

        def qualify(fname: str, _p: str = prefix) -> str:
            return _p + escape_field(fname, separator, escape_char)

        ids, id_exprs = _resolved(lvl.id_fields, lvl.name, qualify)
        req, req_exprs = _resolved(lvl.required_fields or (), lvl.name, qualify)

        out.append(
            LevelMetadata(
                pos,
                lvl.name,
                path,
                prefix,
                tuple(group_keys),
                ids,
                id_exprs,
                req,
                req_exprs,
                tuple(lvl.order_by or ()),
            )
        )
        group_keys.extend(ids)

    return out
