"""PySpark version / capability gates.

The reference runs its test suite against an engine version matrix
(``reference/tests/test_matrix.py:23-36``) and feature-gates APIs that
appeared mid-line. The Spark analog: detect once, at import, which
version-sensitive APIs the running PySpark provides, and let call sites
fail with a versioned message instead of an AttributeError.

Capabilities used by this package and when they appeared:

- ``Column.withField``                 — 3.1 (nested struct updates)
- ``session_window``                   — 3.2 (gap sessionization)
- ``applyInPandasWithState``           — 3.4 (cross-batch dedup)
- ``bit_count`` / ``array_insert``     — 3.5 (simhash verify)
- ``transformWithStateInPandas``       — 4.0 (streaming top-k; ALSO needs
  the ``protobuf`` pip package at query start — a runtime dependency, not
  a version gate; see ``streaming/stateful.py``)
"""

from __future__ import annotations

import pyspark
from pyspark.sql import functions as F
from pyspark.sql.group import GroupedData

PYSPARK_VERSION: tuple[int, int] = tuple(
    int(x) for x in pyspark.__version__.split(".")[:2]
)  # type: ignore[assignment]

HAS_WITH_FIELD = hasattr(pyspark.sql.Column, "withField")
HAS_SESSION_WINDOW = hasattr(F, "session_window")
HAS_BIT_COUNT = hasattr(F, "bit_count")
HAS_APPLY_IN_PANDAS_WITH_STATE = hasattr(GroupedData, "applyInPandasWithState")
HAS_TRANSFORM_WITH_STATE = hasattr(GroupedData, "transformWithStateInPandas")

try:  # transformWithState's state-server wire protocol needs protobuf
    import google.protobuf  # noqa: F401

    HAS_PROTOBUF = True
except ImportError:
    HAS_PROTOBUF = False


def require(capability: str, present: bool, since: str) -> None:
    """Raise a versioned error when a capability gate fails."""
    if not present:
        raise RuntimeError(
            f"{capability} requires PySpark >= {since} "
            f"(running {pyspark.__version__})"
        )
