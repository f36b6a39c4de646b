"""Profile the parent-dominant split_join scenario component by component.

Reproduces bench.py's pack_parent_dominant setup (supplier → lineitem,
256-double parent payload on every leaf row) and times: plain pack,
split_join pack, the structural pack alone, the dim branch alone, and the
final join — so the ratio gap vs the reference (0.11x) is attributable.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from polars_nexpresso_spark import (  # noqa: E402
    HierarchicalPacker,
    HierarchySpec,
    LevelSpec,
)
from polars_nexpresso_spark.session import get_spark  # noqa: E402
from polars_nexpresso_spark.sources.io import read_table  # noqa: E402


def force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def timeit(name, fn, repeat=3):
    fn()  # warm
    runs = []
    for _ in range(repeat):
        t0 = time.perf_counter()
        fn()
        runs.append(time.perf_counter() - t0)
    runs.sort()
    print(f"{name:40s} {runs[len(runs) // 2]:.3f}s  (min {runs[0]:.3f})")
    return runs[len(runs) // 2]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="profile-split-join")
    spark.sparkContext.setLogLevel("ERROR")

    sl_spec = HierarchySpec.from_levels(
        LevelSpec(name="supplier", id_fields=["s_suppkey"]),
        LevelSpec(name="lineitem", id_fields=["l_orderkey", "l_linenumber"]),
    )
    packer = HierarchicalPacker(sl_spec)
    li = read_table(spark, sf_dir, "lineitem")
    parent_dom = li.select(
        li["l_suppkey"].alias("supplier.s_suppkey"),
        F.array_repeat(li["l_suppkey"].cast("double"), 256).alias(
            "supplier.s_payload"
        ),
        li["l_orderkey"].alias("supplier.lineitem.l_orderkey"),
        li["l_linenumber"].alias("supplier.lineitem.l_linenumber"),
        li["l_quantity"].alias("supplier.lineitem.l_quantity"),
    )
    parent_dom.cache()
    n = parent_dom.count()
    print(f"rows={n}")

    t_plain = timeit("pack (aggregate)", lambda: force(packer.pack(parent_dom, "lineitem")))
    t_split = timeit(
        "pack (split_join)",
        lambda: force(
            packer.pack(parent_dom, "lineitem", parent_strategy="split_join")
        ),
    )

    # Components
    df, added = packer._prepare_frame(parent_dom)
    attr_cols = packer._root_attribute_columns(df.columns)
    root_keys = list(packer._levels_meta[0].id_columns)
    structural = df.drop(*attr_cols)
    timeit(
        "  structural pack alone",
        lambda: force(
            packer._pack_prepared(
                structural,
                "lineitem",
                extra_columns="preserve",
                skew_salt=None,
                added_cols=added,
            )
        ),
    )
    from polars_nexpresso_spark.columns import qcol

    dim = df.select(*[qcol(c) for c in (*root_keys, *attr_cols)]).dropDuplicates(
        root_keys
    )
    timeit("  dim branch alone", lambda: force(dim))

    print(f"\nratio split/plain = {t_split / t_plain:.2f}x")

    packer.pack(
        parent_dom, "lineitem", parent_strategy="split_join"
    ).explain("formatted")


if __name__ == "__main__":
    main()
