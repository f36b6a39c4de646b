#!/usr/bin/env python
"""Record dedup_clusters' PER-ITERATION plans in edge-bounded mode.

The adaptive gate keeps the classic full loop at bench scale, so the
committed query plans never show the 100 TB shape; this probe forces the
edge loop (the same env knobs a cluster deploy would use) on the sf
corpus and records the optimized plan of every frame the loop pins —
the evidence that from the second round on, iterations derive ONLY from
checkpointed bounded blocks (never the corpus scan), i.e. per-iteration
exchanges are bounded by the pairs table.

    PNS_DEDUP_EDGE_MIN_NODES_BYTES=0 PNS_DEDUP_EDGE_MAX_FRAC=1e18 \
        python scripts/dump_dedup_edge_plans.py plans/r14/dedup_clusters_edges_probe.txt
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    out_path = Path(
        sys.argv[1] if len(sys.argv) > 1
        else "plans/r14/dedup_clusters_edges_probe.txt"
    )
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F  # noqa: F401

    from polars_nexpresso_spark.functions.dedup import (
        dedup_clusters,
        minhash_lsh_pairs,
    )
    from polars_nexpresso_spark.session import get_spark
    from polars_nexpresso_spark.sources.io import read_table, spread

    spark = get_spark(app_name="pns-dedup-edge-plan-probe")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spread(read_table(spark, sf_dir, "documents"))
    pairs = minhash_lsh_pairs(
        docs, "text", "doc_id", n=3, num_hashes=32, bands=8, threshold=0.8
    )

    plans: list[str] = []
    cls = type(docs)
    orig = cls.localCheckpoint

    def recording(self, eager=True):
        plans.append(self._jdf.queryExecution().optimizedPlan().toString())
        return orig(self, eager=eager)

    cls.localCheckpoint = recording
    try:
        result = dedup_clusters(docs, pairs, "doc_id", propagate="edges")
        n_rows = result.count()
    finally:
        cls.localCheckpoint = orig

    lines = [
        f"# dedup_clusters propagate='edges' probe — sf_dir={sf_dir}",
        f"# result rows: {n_rows}; {len(plans)} checkpointed frames below.",
        "# Frames tagged [iteration] are the per-round label frames; from",
        "# the SECOND iteration on they must read only LogicalRDD leaves",
        "# (pinned bounded blocks) — no parquet scan, no corpus exchange.",
        "",
    ]
    for i, plan in enumerate(plans):
        tag = "iteration" if "__old" in plan else "setup"
        lines.append(f"=== checkpointed frame {i} [{tag}] ===")
        lines.append(plan.rstrip())
        lines.append("")
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_text("\n".join(lines))
    print(f"wrote {out_path} ({len(plans)} plans, result rows={n_rows})")


if __name__ == "__main__":
    main()
