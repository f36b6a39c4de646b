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


def test_driver_window_rotation_covers_every_query():
    """Every registered query must hold a driver CORRECTNESS row in some
    past round OR sit inside the driver's first-50 window.

    The driver verifies only the first 50 entries of ``queries()`` per
    round; three rounds running, late-registered queries sat just
    outside that window and the judge had to re-verify them by hand
    (VERDICT r11 item 1). This test makes under-rotation a CI failure:
    a new query must be registered in-window (before the
    _MULTIPLY_PROVEN_TAIL reordering), and a rotation that evicts a
    row-less query from the window fails here.
    """
    import json

    from polars_nexpresso_spark.queries import QUERIES

    order = list(QUERIES)
    window = set(order[:50])
    rows: set[str] = set()
    for path in sorted(REPO.glob("CORRECTNESS_r*.json")):
        data = json.loads(path.read_text())
        rows.update(k for k, v in data.items() if isinstance(v, dict))
    debt = [q for q in order if q not in rows and q not in window]
    assert not debt, (
        f"queries with no driver CORRECTNESS row sitting outside the "
        f"first-50 driver window: {debt} — rotate multiply-proven "
        "entries into _MULTIPLY_PROVEN_TAIL (queries.py) until these "
        "hold a window slot"
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
