"""Registry-wide sweep of the HOF re-evaluation tripwire.

Builds every ``queries()`` entry's plan at the given sf and runs
:func:`polars_nexpresso_spark.plans.audit.hof_reeval_risks` over it —
the round protocol's cheap check that no operator re-evaluates a
per-row-expensive expression inside a higher-order-function lambda
(the char_entropy rake, round 10: 83 s for 1.5 MB of text). Exit 1 if
anything is flagged.

The plan-budget tests pin the known-risky operators in CI; this sweep
covers the WHOLE registry (including queries added since) and is meant
to run once per round alongside scripts/check_oracle.py. Plan
construction only — the only jobs that run are the bounded trainer
collects some ANN queries perform while building their plans.

Usage: python scripts/hof_sweep.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    import __spark_entry__ as entrymod
    from polars_nexpresso_spark.plans.audit import hof_reeval_risks
    from polars_nexpresso_spark.session import get_spark

    spark = get_spark(app_name="hof-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    flagged = 0
    for name, fn in entrymod.queries().items():
        try:
            risks = hof_reeval_risks(fn(spark, sf_dir))
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            print(f"ERROR {name}: {type(e).__name__}: {e}")
            flagged += 1
            continue
        if risks:
            flagged += 1
            print(f"FLAG {name}")
            for r in risks:
                print(f"    {r}")
    print(f"\n{'CLEAN' if flagged == 0 else f'{flagged} FLAGGED'}")
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
