"""polars_nexpresso_spark — a PySpark-native hierarchical analytics engine.

Brand-new engine with the query/data-processing capabilities of the reference
``heshamdar/polars-nexpresso`` (nested expression builder + hierarchical
packer), re-expressed Spark-first: declarative DataFrame plans optimized by
Catalyst, shuffled hash aggregation for packing, higher-order array functions
for cross-level algebra — plus large-scale data-pipeline extensions (dedup,
similarity search, text analysis, multimodal column plumbing).
"""

from polars_nexpresso_spark.columns import (
    DEFAULT_ESCAPE_CHAR,
    DEFAULT_SEPARATOR,
    escape_field,
    join_path,
    qcol,
    quote_name,
    split_path,
    unescape_field,
)
from polars_nexpresso_spark.expressions import (
    NestedExpressionBuilder,
    StructFunction,
    apply_nested_operations,
    generate_nested_exprs,
    struct_fn,
)
from polars_nexpresso_spark.operators.asof import asof_join
from polars_nexpresso_spark.operators.fuzzyjoin import fuzzy_join
from polars_nexpresso_spark.operators.packer import HierarchicalPacker
from polars_nexpresso_spark.operators.rangejoin import interval_join
from polars_nexpresso_spark.plans.spec import (
    DiscoveredLevel,
    ExtraColumnsMode,
    HierarchySpec,
    HierarchyValidationError,
    LevelAttribute,
    LevelSpec,
    ParentStrategy,
    PromoteAggregation,
    SchemaValidationResult,
)
from polars_nexpresso_spark.structuring import (
    convert_spark_schema,
    unnest_all,
    unnest_rename,
    validate_array_widths,
)

__version__ = "0.1.0"

__all__ = [
    "__version__",
    # Column utilities
    "qcol",
    "quote_name",
    "escape_field",
    "unescape_field",
    "split_path",
    "join_path",
    "DEFAULT_SEPARATOR",
    "DEFAULT_ESCAPE_CHAR",
    # Nested expression builder
    "NestedExpressionBuilder",
    "generate_nested_exprs",
    "apply_nested_operations",
    "StructFunction",
    "struct_fn",
    # Relational operators Spark lacks
    "asof_join",
    "fuzzy_join",
    "interval_join",
    # Hierarchical packer
    "DiscoveredLevel",
    "HierarchicalPacker",
    "HierarchySpec",
    "HierarchyValidationError",
    "LevelAttribute",
    "LevelSpec",
    "ExtraColumnsMode",
    "ParentStrategy",
    "PromoteAggregation",
    "SchemaValidationResult",
    # Structuring utilities
    "convert_spark_schema",
    "unnest_all",
    "unnest_rename",
    "validate_array_widths",
]
