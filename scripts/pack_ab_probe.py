#!/usr/bin/env python
"""Interleaved A/B probe for the pack headline drift (VERDICT r11 #3).

The pack-vs-baseline ratio crept 1.23x (r9) -> 1.76x (r10) -> 1.88x
(r11) on a kernel untouched since r9; each step was adjudicated as
host-level shift, but two more rounds of the same drift breach the 2x
gate. This script settles host-vs-code: it runs the EXACT bench pack
shape (flat_orders_lineitem at the bench sf, cache+count, 1 warmup +
1 timed run) in a fresh python+JVM per run, INTERLEAVING the current
tree with a second checkout (e.g. a `git worktree` of the r9 commit
8a371ad) so any host drift during the probe hits both sides equally.

    git worktree add /tmp/pns_r9 8a371ad
    python scripts/pack_ab_probe.py /tmp/pns_r9 [n_rounds=3]

Prints one JSON line per run and a final summary with per-side medians
and the B/A ratio. A ratio ~1.0 => host; a ratio matching the drift
=> code/config, bisect between the two trees.
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
import sys, time
sys.path.insert(0, {repo!r})
from polars_nexpresso_spark.session import get_spark
from polars_nexpresso_spark.queries import OL_SPEC
from polars_nexpresso_spark.operators.packer import HierarchicalPacker
from polars_nexpresso_spark.sources.io import flat_orders_lineitem

spark = get_spark(app_name="pns-pack-ab")
spark.sparkContext.setLogLevel("ERROR")
packer = HierarchicalPacker(OL_SPEC)
flat = flat_orders_lineitem(spark, {sf_dir!r})
flat.cache()
flat.count()

def run():
    packer.pack(flat, "orders").write.format("noop").mode(
        "overwrite"
    ).save()

run()  # warmup: codegen + shuffle-file warm, same as the bench child
t0 = time.perf_counter()
run()
print("PACK_AB_SEC", round(time.perf_counter() - t0, 4), flush=True)
"""


def _one_run(repo: str, sf_dir: str) -> float:
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    out = subprocess.run(
        [sys.executable, "-c", _CHILD.format(repo=repo, sf_dir=sf_dir)],
        capture_output=True,
        text=True,
        env=env,
        cwd=repo,
        timeout=900,
        check=True,
    )
    for line in out.stdout.splitlines():
        if line.startswith("PACK_AB_SEC"):
            return float(line.split()[1])
    raise RuntimeError(f"no timing line in child stdout: {out.stdout[-500:]}")


def main() -> None:
    if len(sys.argv) < 2:
        raise SystemExit(__doc__)
    other = str(Path(sys.argv[1]).resolve())
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sides = {"A_current": str(REPO), "B_other": other}
    runs: dict[str, list[float]] = {k: [] for k in sides}
    for i in range(n):
        for side, repo in sides.items():
            t = _one_run(repo, sf_dir)
            runs[side].append(t)
            print(
                json.dumps(
                    {"round": i, "side": side, "repo": repo, "sec": t}
                ),
                flush=True,
            )
    med = {k: round(statistics.median(v), 3) for k, v in runs.items()}
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "runs": runs,
                "median": med,
                "ratio_current_over_other": round(
                    med["A_current"] / med["B_other"], 3
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
