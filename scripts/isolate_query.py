#!/usr/bin/env python
"""Fresh-JVM isolation probe for registered queries.

The shared-session bench runs ~90 queries back-to-back, so individual
timings inherit cache-pressure / JIT-warmth ordering effects; when a
round-over-round delta appears on a query whose code did not change,
this script is the established protocol to separate code regressions
from session noise: ONE python+JVM per query, 1 warmup + median of N
timed runs, same sf as the bench.

    python scripts/isolate_query.py multimodal_video corpus_report
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/isolate_query.py ...

Prints one JSON line per query plus a summary dict suitable for
BENCH_DETAILS.json's ``regression_isolation.isolated_sec``.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_CHILD = """
import json, os, sys, time
sys.path.insert(0, {repo!r})
from polars_nexpresso_spark.session import get_spark
import __spark_entry__ as em

name = {name!r}
sf_dir = {sf_dir!r}
q = em.queries()[name]
spark = get_spark(app_name=f"pns-isolate-{{name}}")
spark.sparkContext.setLogLevel("ERROR")

def run():
    df = q(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()

run()  # warmup: codegen + shuffle-file warm
runs = []
for _ in range({repeat}):
    t0 = time.perf_counter()
    run()
    runs.append(round(time.perf_counter() - t0, 3))
print(json.dumps({{"query": name, "runs": runs}}))
"""


def isolate(name: str, sf_dir: str, repeat: int = 3) -> dict:
    code = _CHILD.format(repo=str(REPO), name=name, sf_dir=sf_dir, repeat=repeat)
    t0 = time.perf_counter()
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=900,
        cwd=str(REPO),
    )
    wall = round(time.perf_counter() - t0, 1)
    for line in reversed(proc.stdout.strip().splitlines()):
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            continue
        if rec.get("query") == name:
            rec["median"] = round(statistics.median(rec["runs"]), 3)
            rec["process_wall_sec"] = wall
            return rec
    return {
        "query": name,
        "error": (proc.stderr or "no output").strip()[-400:],
        "process_wall_sec": wall,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:]
    if not names:
        raise SystemExit("usage: isolate_query.py QUERY [QUERY...]")
    summary: dict[str, float] = {}
    for name in names:
        rec = isolate(name, sf_dir)
        print(json.dumps(rec))
        if "median" in rec:
            summary[name] = rec["median"]
    print(json.dumps({"isolated_sec": summary, "sf_dir": sf_dir}))


if __name__ == "__main__":
    main()
