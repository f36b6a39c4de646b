"""Local replica of the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` counterpart
on DuckDB over the same parquet tables, then compares row count, column
names, and order-insensitive canonical values.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import math
import sys
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(value):
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        return round(value, 6)
    if isinstance(value, (list, tuple)):
        return [canon(v) for v in value]
    if isinstance(value, dict):
        return {k: canon(v) for k, v in value.items()}
    if hasattr(value, "isoformat"):
        return value.isoformat()
    return value


def canonical(rows, cols):
    out = []
    for r in rows:
        out.append(json.dumps({c: canon(v) for c, v in zip(cols, r)}, sort_keys=True))
    return sorted(out)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    # Data-derived oracles (ivf_ann_topk's centroid literals) are generated
    # at import time against this directory.
    import os

    os.environ.setdefault("PNS_ORACLE_SF_DIR", sf_dir)
    import __spark_entry__ as entrymod
    from polars_nexpresso_spark.session import get_spark

    spark = get_spark(app_name="oracle-check")

    con = duckdb.connect()
    for t in TABLES:
        path = Path(sf_dir) / f"{t}.parquet"
        if path.exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0

    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue

        if name not in oracles:
            print(f"PASS (rows-only) {name}: {len(s_rows)} rows")
            continue

        try:
            cur = con.execute(oracles[name])
            d_cols = [d[0] for d in cur.description]
            d_rows = cur.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue

        ok = True
        if sorted(s_cols) != sorted(d_cols):
            print(f"FAIL {name}: columns differ: {sorted(s_cols)} vs {sorted(d_cols)}")
            ok = False
        elif len(s_rows) != len(d_rows):
            print(f"FAIL {name}: row counts differ: {len(s_rows)} vs {len(d_rows)}")
            ok = False
        else:
            s_canon = canonical(s_rows, s_cols)
            d_canon = canonical(d_rows, d_cols)
            if s_canon != d_canon:
                diff = [
                    (a, b) for a, b in zip(s_canon, d_canon) if a != b
                ][:3]
                print(f"FAIL {name}: values differ; first diffs: {diff}")
                ok = False
        if ok:
            print(f"PASS {name}: {len(s_rows)} rows")
        else:
            failures += 1

    print(f"\n{'ALL PASS' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
