"""Memory-bounding story, in BASELINE terms.

The reference's ``pack_streaming`` exists because Polars' ``group_by`` held
every group in RAM — it buys 0.42× peak RSS with 5.8× time
(``reference/benchmarks/README.md:126``). On Spark that trade is mostly
unnecessary: the hash aggregation behind ``pack`` is SPILL-AWARE, so peak
memory is a configuration bound (executor/driver memory), not a function
of data size. This test pins that claim executably: the one-shot pack over
the sf0.01 tables completes correctly inside a 512 MB heap — a budget far
below what holding the dataset's groups would need headroom for — in a
fresh JVM (subprocess, because one process can hold only one JVM/conf).

``pack_streaming(bounded=True)`` (see test_properties.py) remains for the
one case config can't cover: a single sink that must never hold more than
one bucket of output at a time.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

SF_DIR = "/root/testdata/sf0.01"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="sf0.01 testdata not present"
)

_CHILD = """
import json, sys
sys.path.insert(0, {repo!r})
from polars_nexpresso_spark.session import get_spark
from polars_nexpresso_spark import HierarchicalPacker
from polars_nexpresso_spark.queries import OL_SPEC
from polars_nexpresso_spark.sources.io import flat_orders_lineitem

spark = get_spark(
    app_name="capped-pack-test",
    master="local[4]",
    shuffle_partitions=4,
    extra_conf={{"spark.driver.memory": "512m"}},
)
spark.sparkContext.setLogLevel("ERROR")
packer = HierarchicalPacker(OL_SPEC)
flat = flat_orders_lineitem(spark, {sf_dir!r})
packed = packer.pack(flat, "orders")
n = packed.count()
n_orders = flat.select("`orders.o_orderkey`").distinct().count()
print(json.dumps({{"rows": n, "expected": n_orders}}))
"""


def test_pack_completes_inside_capped_heap():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-c", _CHILD.format(repo=repo, sf_dir=SF_DIR)],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, f"capped-heap pack failed:\n{proc.stderr[-2000:]}"
    rec = json.loads(proc.stdout.strip().splitlines()[-1])
    assert rec["rows"] == rec["expected"] > 0
