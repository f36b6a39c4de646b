#!/usr/bin/env python
"""PySpark version-matrix runner — the analog of the reference's
``tests/test_matrix.py`` (which executes its suite against N engine
versions in isolated virtualenvs).

Two modes:

- ``--simulate`` (default, works offline): for each downlevel profile,
  patch the ``compat`` capability flags in-process and drive the real
  gated operator entry points, asserting every versioned error fires
  and every engine-selection fallback picks the downlevel engine.
  This executes the exact call-site code an older PySpark would take;
  the only thing it cannot prove is that the flag DETECTION is right
  on an old install (that detection is three hasattr calls).
- ``--install X.Y.Z [X.Y.Z ...]``: create one venv per requested
  PySpark, ``pip install`` it, and run the compat-gated pytest subset
  there (``tests/test_compat.py``). Needs network + pip; this
  container has neither, so CI is where this mode runs.

    python scripts/version_matrix.py                 # simulate (offline)
    python scripts/version_matrix.py --install 3.5.1 4.0.0
"""

from __future__ import annotations

import json
import subprocess
import sys
import tempfile
import venv
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def simulate() -> int:
    from polars_nexpresso_spark import compat
    from polars_nexpresso_spark.session import get_spark

    spark = get_spark(app_name="pns-version-matrix")
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 1.0, "a")],
        "user_id long, ts string, value double, fp string",
    ).selectExpr("user_id", "cast(ts as timestamp) ts", "value", "fp")

    from polars_nexpresso_spark.streaming.pack_stream import session_pack
    from polars_nexpresso_spark.streaming.stateful import (
        streaming_exact_dedup,
        streaming_topk,
    )

    def expect_raises(fn, fragment: str) -> str:
        try:
            fn()
        except RuntimeError as e:
            if fragment in str(e):
                return f"versioned error fired: {e}"
            return f"WRONG ERROR: {e}"
        return "NO ERROR (gate did not fire)"

    profiles = {
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
    saved = {
        k: getattr(compat, k)
        for k in (
            "HAS_SESSION_WINDOW",
            "HAS_APPLY_IN_PANDAS_WITH_STATE",
            "HAS_TRANSFORM_WITH_STATE",
        )
    }
    results: dict[str, dict[str, str]] = {}
    failures = 0
    try:
        for name, flags in profiles.items():
            for k, v in flags.items():
                setattr(compat, k, v)
            rows: dict[str, str] = {}

            def _session():
                session_pack(
                    df, event_time="ts", gap="10 minutes",
                    watermark="1 hour", keys=["user_id"],
                    payload_cols=["value"],
                )

            def _dedup():
                streaming_exact_dedup(df, fingerprint_col="fp")

            def _topk(engine="auto"):
                return streaming_topk(
                    df, keys=["user_id"], score_col="value", k=2,
                    payload_cols=["value", "fp"], engine=engine,
                )

            if not flags["HAS_SESSION_WINDOW"]:
                rows["session_pack"] = expect_raises(_session, ">= 3.2")
            else:
                _session()
                rows["session_pack"] = "constructs (capability present)"
            if not flags["HAS_APPLY_IN_PANDAS_WITH_STATE"]:
                rows["streaming_exact_dedup"] = expect_raises(
                    _dedup, ">= 3.4"
                )
                rows["streaming_topk[auto]"] = expect_raises(
                    _topk, ">= 3.4"
                )
            else:
                _dedup()
                rows["streaming_exact_dedup"] = "constructs"
                _topk()
                rows["streaming_topk[auto]"] = (
                    "constructs via pandas_state fallback"
                )
            rows["streaming_topk[tws]"] = expect_raises(
                lambda: _topk("tws"), ">= 4.0"
            )
            failures += sum(
                1
                for v in rows.values()
                if v.startswith(("WRONG", "NO ERROR"))
            )
            results[name] = rows
    finally:
        for k, v in saved.items():
            setattr(compat, k, v)
    print(json.dumps({"mode": "simulate", "profiles": results}, indent=2))
    print("MATRIX OK" if failures == 0 else f"{failures} FAILURES")
    return 1 if failures else 0


def install_and_run(versions: list[str]) -> int:
    rc = 0
    for ver in versions:
        env_dir = Path(tempfile.mkdtemp(prefix=f"pns-pyspark-{ver}-"))
        print(f"== pyspark {ver} -> {env_dir}")
        venv.create(env_dir, with_pip=True)
        pip = env_dir / "bin" / "pip"
        py = env_dir / "bin" / "python"
        steps = [
            [str(pip), "install", f"pyspark=={ver}", "pandas", "pyarrow",
             "pytest"],
            [str(py), "-m", "pytest", str(REPO / "tests/test_compat.py"),
             "-q"],
        ]
        for cmd in steps:
            proc = subprocess.run(cmd, cwd=str(REPO))
            if proc.returncode != 0:
                rc = proc.returncode
                break
    return rc


if __name__ == "__main__":
    if "--install" in sys.argv:
        i = sys.argv.index("--install")
        sys.exit(install_and_run(sys.argv[i + 1 :]))
    sys.exit(simulate())
