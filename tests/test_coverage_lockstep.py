"""COVERAGE.md must track the query registry mechanically.

The judge diffs operator coverage against the registry; a query that
ships without its COVERAGE.md row (or a row left behind after a rename)
silently breaks that audit. This test pins the two in lockstep — it
needs no SparkSession.
"""

from __future__ import annotations

import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _registry_keys() -> set[str]:
    from polars_nexpresso_spark.queries import ORACLE_SQL, QUERIES

    # every query is oracle-paired or explicitly rows-only; both dicts
    # must agree on the key set (ORACLE_SQL ⊆ QUERIES is the driver
    # contract asserted in __spark_entry__)
    assert set(ORACLE_SQL) <= set(QUERIES)
    return set(QUERIES)


def test_every_registry_query_appears_in_coverage_md():
    cov = (REPO / "COVERAGE.md").read_text()
    missing = sorted(k for k in _registry_keys() if k not in cov)
    assert not missing, (
        f"queries missing from COVERAGE.md: {missing} — add a row per "
        "operator (the round protocol's new-operator checklist)"
    )


def test_coverage_md_oracle_mentions_are_not_stale():
    """Names cited as 'oracle: X' / 'oracles: X AND Y' in COVERAGE.md
    must still exist in the registry (catches renames that orphan a
    row)."""
    cov = (REPO / "COVERAGE.md").read_text()
    keys = _registry_keys()
    cited = set()
    for m in re.finditer(r"oracles?:\s*([a-z0-9_]+(?:\s+AND\s+[a-z0-9_]+)*)", cov):
        for name in re.split(r"\s+AND\s+", m.group(1)):
            cited.add(name)
    stale = sorted(c for c in cited if c not in keys)
    assert not stale, f"COVERAGE.md cites unknown queries: {stale}"
