"""Cross-level query operators: attribute promotion, enrichment, existentials.

Mixin for :class:`~polars_nexpresso_spark.operators.packer.HierarchicalPacker`
re-expressing the reference's ``PromoteAggregation`` algebra (SURVEY §2.D;
reference ``nexpresso/hierarchical_packer.py:1860-2259``) over Spark
``ArrayType`` columns using higher-order functions — everything stays JVM-side
inside whole-stage codegen; no Python UDFs.

The aggregation tables mirror the reference exactly, including the two
semantic subtleties called out in SURVEY §7.3:

- intermediate-hop ``count`` SUMS the inner counts instead of re-counting
  (reference ``:1885``);
- multi-hop ``mean`` is a mean-of-means approximation *by design*
  (reference ``:1920-1921``) — do not "fix" it.

Known deviation: the reference's ``list.sum`` of an *empty* list yields 0;
here ``sum`` of an empty array yields null (the null-seeded fold keeps the
element type without requiring schema plumbing). Empty child lists cannot be
produced by ``pack`` (groups only exist where rows exist), so this only
matters for hand-built arrays.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StructType

from polars_nexpresso_spark.columns import qcol, quote_name
from polars_nexpresso_spark.plans.spec import (
    LevelAttribute,
    PromoteAggregation,
)

AggFn = Callable[[Column], Column]


def _not_null(x: Column) -> Column:
    return x.isNotNull()


def _agg_list(a: Column) -> Column:
    return a


def _agg_set(a: Column) -> Column:
    return F.array_distinct(F.filter(a, _not_null))


def _agg_sum(a: Column) -> Column:
    # Head+tail fold: the zero is the first non-null element, so the result
    # keeps the element type without any schema plumbing or explicit cast
    # (F.aggregate requires the zero's type to match the fold's result type
    # at analysis time, which rules out a bare null seed).
    nn = F.filter(a, _not_null)
    tail = F.slice(nn, 2, F.greatest(F.size(nn) - 1, F.lit(0)))
    return F.aggregate(tail, F.get(nn, 0), lambda acc, x: acc + x)


def _agg_mean(a: Column) -> Column:
    non_null = F.filter(a, _not_null)
    total = F.aggregate(non_null, F.lit(0.0), lambda acc, x: acc + x)
    return F.try_divide(total, F.size(non_null))


def _agg_min(a: Column) -> Column:
    return F.array_min(a)


def _agg_max(a: Column) -> Column:
    return F.array_max(a)


def _agg_first(a: Column) -> Column:
    # F.get is 0-based and null-safe on out-of-bounds (unlike element_at
    # under ANSI mode, which raises).
    return F.get(a, 0)


def _agg_last(a: Column) -> Column:
    return F.get(a, F.size(a) - 1)


def _agg_count(a: Column) -> Column:
    return F.size(a)


def _agg_single(a: Column) -> Column:
    return F.get(_agg_set(a), 0)


# Innermost-hop aggregations (reference _LIST_AGGREGATIONS :1860-1871).
_LIST_AGGREGATIONS: dict[str, AggFn] = {
    "list": _agg_list,
    "set": _agg_set,
    "sum": _agg_sum,
    "mean": _agg_mean,
    "min": _agg_min,
    "max": _agg_max,
    "first": _agg_first,
    "last": _agg_last,
    "count": _agg_count,
    "single": _agg_single,
}

# Outer-hop aggregations: identical except count, which sums the inner
# per-child counts rather than re-counting (reference :1876-1887).
_INTERMEDIATE_AGGREGATIONS: dict[str, AggFn] = {
    **_LIST_AGGREGATIONS,
    "count": _agg_sum,
}


class CrossLevelMixin:
    """Cross-level attribute algebra over packed frames (SURVEY §2.D)."""

    def _packed_ref(self, frame: DataFrame | None, dotted: str) -> Column:
        """Reference a packed column in either physical representation.

        A frame packed to a non-root level carries ``dotted`` as a literal
        top-level column name; a frame packed to the ROOT level collapses
        everything into one struct column named after the root, so the same
        logical path becomes struct-field access. Without a frame to
        inspect, assume the dotted-flat form (the pure-expression contract
        of ``attribute_expr``).
        """
        if frame is None or dotted in frame.columns:
            return qcol(dotted)
        root = self._levels_meta[0]
        if root.path in frame.columns and dotted.startswith(root.prefix):
            return F.col(quote_name(root.path)).getField(
                dotted[len(root.prefix) :]
            )
        return qcol(dotted)

    def attribute_expr(
        self,
        attribute: str,
        from_level: str,
        to_level: str,
        agg: PromoteAggregation = "list",
        *,
        frame: DataFrame | None = None,
    ) -> Column:
        """Pure Column expression computing a finer-level attribute aggregated
        up to ``to_level`` on a frame already packed at that granularity.

        Composable into ``filter`` / ``withColumn`` / ``orderBy`` / arithmetic
        like any other Column. Same-level access returns the plain column;
        multi-hop access cascades aggregations through nested ``transform``
        calls (count sums inner counts; mean is mean-of-means).

        Pass ``frame`` when the frame may be packed to the ROOT level (one
        collapsed struct column): the child reference is then resolved
        against the frame's actual representation.

        KeyError on an unknown level name; ValueError when ``from_level``
        sits above ``to_level`` (attributes never flow down the tree).
        """
        lo = self.spec.index_of(to_level)  # coarser: where the value lands
        hi = self.spec.index_of(from_level)  # finer: where it comes from

        if hi < lo:
            raise ValueError(
                f"from_level '{from_level}' (index {hi}) must be at the "
                f"same or finer granularity as to_level '{to_level}' "
                f"(index {lo}) — a coarser level cannot be a source."
            )

        target = self._levels_meta[lo]
        if hi == lo:
            return self._packed_ref(
                frame, target.prefix + self._escape_field(attribute)
            )

        if agg not in _LIST_AGGREGATIONS:
            raise ValueError(
                f"Unknown aggregation '{agg}'. "
                f"Expected one of: {sorted(_LIST_AGGREGATIONS)}"
            )

        # Metas strictly below the target, down to (and including)
        # from_level — hops[0] is the target's immediate child.
        hops = self._levels_meta[lo + 1 : hi + 1]
        deepest = _LIST_AGGREGATIONS[agg]
        midway = _INTERMEDIATE_AGGREGATIONS[agg]

        # NB: the lambdas handed to F.transform must take exactly one
        # positional parameter — PySpark inspects arity to decide between
        # (element) and (element, index) forms — so closures are built with
        # factory functions, never default arguments.
        def make_extract(attr: str) -> Callable[[Column], Column]:
            return lambda e: e[attr]

        def make_hop(
            field: str, agg_fn: AggFn, prev: Callable[[Column], Column]
        ) -> Callable[[Column], Column]:
            return lambda e: agg_fn(F.transform(e[field], prev))

        # Compose inside-out: extract the attribute at from_level, then
        # wrap one (parent, child) aggregation per hop. The innermost
        # wrap applies the caller's agg; every outer one the intermediate
        # variant (count→sum etc.).
        fn = make_extract(attribute)
        steps = list(zip(hops, hops[1:]))
        for depth in range(len(steps) - 1, -1, -1):
            parent, child = steps[depth]
            chosen = deepest if depth == len(steps) - 1 else midway
            fn = make_hop(child.path[len(parent.prefix) :], chosen, fn)

        outermost = deepest if not steps else midway
        return outermost(
            F.transform(self._packed_ref(frame, hops[0].path), fn)
        )

    def enrich(
        self,
        frame: DataFrame,
        *specs: LevelAttribute,
        at_level: str,
    ) -> DataFrame:
        """Add multiple cross-level attribute columns in one ``withColumns``.

        The frame must already be packed at ``at_level`` granularity. Output
        columns are qualified with the ``at_level`` prefix.
        """
        target = self._levels_meta[self.spec.index_of(at_level)]
        added = {
            target.prefix
            + self._escape_field(s.alias or s.attribute): self.attribute_expr(
                s.attribute, s.from_level, at_level, s.agg, frame=frame
            )
            for s in specs
        }
        return frame.withColumns(added)

    def any_child_satisfies(
        self,
        frame: DataFrame,
        *,
        from_level: str,
        to_level: str,
        condition: Callable[[Column], Column],
    ) -> DataFrame:
        """Filter to rows where at least one child matches ``condition``.

        ``from_level`` must be the immediate child of ``to_level`` and the
        frame packed at ``to_level``. ``condition`` receives the child struct
        element Column (Spark analog of the reference's ``pl.element()``
        predicate). Implemented with ``F.exists`` — JVM-side, codegen'd.
        """
        from_meta = self._immediate_child_meta(from_level, to_level)
        return frame.filter(
            F.exists(self._packed_ref(frame, from_meta.path), condition)
        )

    def all_children_satisfy(
        self,
        frame: DataFrame,
        *,
        from_level: str,
        to_level: str,
        condition: Callable[[Column], Column],
    ) -> DataFrame:
        """Filter to rows where every child matches ``condition``.

        Entities with no children pass (vacuous truth — ``F.forall`` on an
        empty array is true, exactly matching the reference ``:2115``).
        """
        from_meta = self._immediate_child_meta(from_level, to_level)
        return frame.filter(
            F.forall(self._packed_ref(frame, from_meta.path), condition)
        )

    def _immediate_child_meta(
        self, from_level: str, to_level: str, why: str = "existential predicates"
    ):
        child = self.spec.index_of(from_level)
        parent = self.spec.index_of(to_level)
        if child - parent != 1:
            raise ValueError(
                f"from_level '{from_level}' must be the immediate child of "
                f"to_level '{to_level}' for {why} — got indices "
                f"{child} and {parent}."
            )
        return self._levels_meta[child]

    def promote_attribute(
        self,
        frame: DataFrame,
        attribute: str,
        *,
        from_level: str,
        to_level: str,
        agg: PromoteAggregation = "list",
        alias: str | None = None,
    ) -> DataFrame:
        """Promote an attribute from an immediate child level to its parent.

        Packs the frame so ``from_level`` becomes an ``array<struct>`` column,
        then aggregates the attribute with array expressions — no extra
        explode/groupBy round-trips beyond the pack shuffle itself.
        """
        child = self._immediate_child_meta(
            from_level, to_level, why="attribute promotion"
        )
        target = self._levels_meta[self.spec.index_of(to_level)]

        packed = self.pack(frame, from_level)
        self._validate_list_struct_field(
            packed.schema, child.path, attribute, from_level
        )

        return packed.withColumn(
            target.prefix + self._escape_field(alias or attribute),
            self.attribute_expr(attribute, from_level, to_level, agg),
        )

    @staticmethod
    def _validate_list_struct_field(
        schema: StructType, list_col: str, attribute: str, level_name: str
    ) -> None:
        """Raise ValueError if ``attribute`` is not a struct field of ``list_col``."""
        try:
            dtype = schema[list_col].dataType
        except KeyError:
            raise ValueError(
                f"Expected packed column '{list_col}' not found in schema. "
                f"Available columns: {schema.fieldNames()}"
            ) from None
        inner = dtype.elementType if isinstance(dtype, ArrayType) else dtype
        if not isinstance(inner, StructType):
            raise ValueError(
                f"Expected struct inside list column '{list_col}', got "
                f"{inner.simpleString()}."
            )
        if attribute not in inner.fieldNames():
            raise ValueError(
                f"Attribute '{attribute}' not found at level '{level_name}'. "
                f"Available fields: {inner.fieldNames()}"
            )
