#!/usr/bin/env python
"""Interleaved fresh-JVM A/B of the r13 optimization headliners against
the pre-optimization tree (the pack_ab_probe protocol, generalized).

    python scripts/ab_probe_r13.py [base_worktree] [query ...]

For each query, alternates ONE fresh python+JVM per (tree, round) in
A/B/A/B order within the same host window, 1 warmup + median of 3 timed
runs per process, `noop` sink. Prints one JSON line per (tree, query)
and a final summary of new/old medians-of-medians.
"""

from __future__ import annotations

import json
import statistics
import subprocess
import sys
import time
from pathlib import Path

NEW = Path(__file__).resolve().parent.parent
_CHILD = """
import json, time, sys
sys.path.insert(0, {repo!r})
from polars_nexpresso_spark.session import get_spark
import __spark_entry__ as em
q = em.queries()[{name!r}]
spark = get_spark(app_name="pns-ab-{label}")
spark.sparkContext.setLogLevel("ERROR")
def run():
    q(spark, {sf!r}).write.format("noop").mode("overwrite").save()
run()
runs = []
for _ in range(3):
    t0 = time.perf_counter(); run(); runs.append(round(time.perf_counter()-t0, 3))
print(json.dumps({{"runs": runs}}))
"""


def one(repo: str, name: str, label: str, sf: str) -> list[float]:
    code = _CHILD.format(repo=repo, name=name, label=label, sf=sf)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=600,
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)["runs"]


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else "/tmp/pns_r13_base"
    names = sys.argv[2:] or [
        "ivfpq_rerank", "ivf_ann_topk", "lsh_ann_topk",
        "mmr_retrieval_eval", "distill_pairs", "quality_buckets",
    ]
    sf = "/root/testdata/sf0.1"
    summary = {}
    for name in names:
        meds = {"old": [], "new": []}
        for rep in range(2):  # A/B interleave, 2 rounds each
            for label, repo in (("old", base), ("new", str(NEW))):
                t0 = time.time()
                runs = one(repo, name, label, sf)
                med = statistics.median(runs)
                meds[label].append(med)
                print(json.dumps({
                    "query": name, "tree": label, "rep": rep,
                    "runs": runs, "median": med,
                    "wall": round(time.time() - t0, 1),
                }), flush=True)
        summary[name] = {
            "old": statistics.median(meds["old"]),
            "old_min": min(meds["old"]),
            "new": statistics.median(meds["new"]),
            "new_min": min(meds["new"]),
            "ratio": round(
                statistics.median(meds["new"])
                / statistics.median(meds["old"]), 3
            ),
        }
    print(json.dumps({"ab_summary": summary}, indent=1))


if __name__ == "__main__":
    main()
