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


# --- version-matrix simulation (round 8) -------------------------------------
# The reference's test_matrix.py runs its suite against N engine versions
# in isolated envs; this container has exactly one PySpark and no network,
# so the matrix is SIMULATED: each downlevel profile patches the compat
# capability flags and drives the REAL operator entry points, proving the
# versioned-error paths (dead code on 4.x) actually fire — and that the
# engine-selection fallbacks pick the downlevel engine instead of dying.
# scripts/version_matrix.py runs the same profiles standalone.

DOWNLEVEL_PROFILES = {
    "3.1": {
        "HAS_SESSION_WINDOW": False,
        "HAS_APPLY_IN_PANDAS_WITH_STATE": False,
        "HAS_TRANSFORM_WITH_STATE": False,
    },
    "3.3": {
        "HAS_SESSION_WINDOW": True,
        "HAS_APPLY_IN_PANDAS_WITH_STATE": False,
        "HAS_TRANSFORM_WITH_STATE": False,
    },
    "3.5": {
        "HAS_SESSION_WINDOW": True,
        "HAS_APPLY_IN_PANDAS_WITH_STATE": True,
        "HAS_TRANSFORM_WITH_STATE": False,
    },
}


def _events(spark):
    return spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 1.0, "a")],
        "user_id long, ts string, value double, fp string",
    ).selectExpr("user_id", "cast(ts as timestamp) ts", "value", "fp")


def _patch(monkeypatch, profile: dict) -> None:
    for flag, val in profile.items():
        monkeypatch.setattr(compat, flag, val)


def test_matrix_31_every_streaming_gate_fires(spark, monkeypatch):
    from polars_nexpresso_spark.streaming.pack_stream import session_pack
    from polars_nexpresso_spark.streaming.stateful import (
        streaming_exact_dedup,
        streaming_topk,
    )

    _patch(monkeypatch, DOWNLEVEL_PROFILES["3.1"])
    df = _events(spark)
    with pytest.raises(RuntimeError, match=r"requires PySpark >= 3\.2"):
        session_pack(
            df, event_time="ts", gap="10 minutes", watermark="1 hour",
            keys=["user_id"], payload_cols=["value"],
        )
    with pytest.raises(RuntimeError, match=r"requires PySpark >= 3\.4"):
        streaming_exact_dedup(df, fingerprint_col="fp")
    # auto engine falls back to pandas_state, whose own gate then fires
    with pytest.raises(RuntimeError, match=r"requires PySpark >= 3\.4"):
        streaming_topk(
            df, keys=["user_id"], score_col="value", k=2,
            payload_cols=["value", "fp"],
        )
    with pytest.raises(RuntimeError, match=r"requires PySpark >= 4\.0"):
        streaming_topk(
            df, keys=["user_id"], score_col="value", k=2,
            payload_cols=["value", "fp"], engine="tws",
        )


def test_matrix_33_session_window_present_state_absent(spark, monkeypatch):
    from polars_nexpresso_spark.streaming.pack_stream import session_pack
    from polars_nexpresso_spark.streaming.stateful import (
        streaming_exact_dedup,
    )

    _patch(monkeypatch, DOWNLEVEL_PROFILES["3.3"])
    df = _events(spark)
    # session_window exists at 3.3 -> session_pack constructs a plan
    out = session_pack(
        df, event_time="ts", gap="10 minutes", watermark="1 hour",
        keys=["user_id"], payload_cols=["value"],
    )
    assert "user_id" in out.columns
    with pytest.raises(RuntimeError, match=r"requires PySpark >= 3\.4"):
        streaming_exact_dedup(df, fingerprint_col="fp")


def test_matrix_35_auto_topk_selects_downlevel_engine(spark, monkeypatch):
    """At the 3.5 profile transformWithState is absent: engine='auto'
    must select pandas_state and construct the plan (not raise), while
    an explicit engine='tws' fails with the 4.0 message."""
    from polars_nexpresso_spark.streaming.stateful import streaming_topk

    _patch(monkeypatch, DOWNLEVEL_PROFILES["3.5"])
    df = _events(spark)
    out = streaming_topk(
        df, keys=["user_id"], score_col="value", k=2,
        payload_cols=["value", "fp"],
    )
    assert set(out.columns) == {"user_id", "value", "fp"}
    with pytest.raises(RuntimeError, match=r"requires PySpark >= 4\.0"):
        streaming_topk(
            df, keys=["user_id"], score_col="value", k=2,
            payload_cols=["value", "fp"], engine="tws",
        )
