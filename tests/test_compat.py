"""Capability-gate tests — the analog of the reference's version-matrix
suite (``reference/tests/test_matrix.py:23-36``): one engine per container
here, so instead of running N engines we pin that (a) detection matches the
running PySpark and (b) a failed gate raises the versioned message rather
than an AttributeError deep inside Spark."""

from __future__ import annotations

import pytest

from polars_nexpresso_spark import compat


def test_detection_matches_running_pyspark():
    import pyspark

    major, minor = compat.PYSPARK_VERSION
    assert (major, minor) == tuple(
        int(x) for x in pyspark.__version__.split(".")[:2]
    )
    # This package targets PySpark 4.x; every gated capability exists there.
    if (major, minor) >= (4, 0):
        assert compat.HAS_WITH_FIELD
        assert compat.HAS_SESSION_WINDOW
        assert compat.HAS_BIT_COUNT
        assert compat.HAS_APPLY_IN_PANDAS_WITH_STATE
        assert compat.HAS_TRANSFORM_WITH_STATE


def test_require_passes_and_raises():
    compat.require("anything", True, "0.0")  # no-op when present
    with pytest.raises(RuntimeError, match="requires PySpark >= 9.9"):
        compat.require("future_feature", False, "9.9")
